"""LoRaWAN codec/crypto pandas-UDF function surface."""
