"""Compiled protobuf descriptor (FileDescriptorSet) for the
ChirpStack ``gw.UplinkFrame`` subset, generated WITHOUT protoc.

A FileDescriptorSet is itself a protobuf message
(google/protobuf/descriptor.proto — public), so the wire codec in
``protobuf_codec`` can serialize one directly. The output is what
``protoc --descriptor_set_out=gw.desc gw.proto`` would produce for the
schema below, and is what ``pyspark.sql.protobuf.functions
.from_protobuf(..., descFilePath=...)`` consumes (sources/control.py
``from_protobuf_uplink``, reference LoraServerIOCollector.py:253-263).

Schema (public chirpstack-api v3 gw.proto subset — the fields the
reference's handler reads):

    syntax = "proto3"; package gw;
    message UplinkFrame   { bytes phy_payload = 1;
                            UplinkTXInfo tx_info = 2;
                            UplinkRXInfo rx_info = 3; }
    message UplinkTXInfo  { uint32 frequency = 1;
                            LoRaModulationInfo lora_modulation_info = 3; }
    message LoRaModulationInfo { uint32 bandwidth = 1;
                            uint32 spreading_factor = 2;
                            string code_rate = 3; }
    message UplinkRXInfo  { bytes gateway_id = 1; int32 rssi = 5;
                            double lora_snr = 6; uint32 channel = 7;
                            uint32 rf_chain = 8; uint32 crc_status = 17; }

The spark-protobuf connector jar is not in this container, so the
descriptor is exercised by round-tripping it through the wire PARSER
(tests/test_protobuf_codec.py) rather than through from_protobuf; the
artifact itself is byte-correct descriptor.proto encoding either way.
"""

from __future__ import annotations

import os

from .protobuf_codec import _field, _len_field, _write_varint

# FieldDescriptorProto.type values (descriptor.proto, public)
TYPE_DOUBLE = 1
TYPE_INT32 = 5
TYPE_STRING = 9
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_UINT32 = 13
LABEL_OPTIONAL = 1


def _field_desc(name: str, number: int, ftype: int, type_name: str | None = None) -> bytes:
    """FieldDescriptorProto: 1 name | 3 number | 4 label | 5 type
    | 6 type_name."""
    out = (
        _len_field(1, name.encode())
        + _field(3, 0) + _write_varint(number)
        + _field(4, 0) + _write_varint(LABEL_OPTIONAL)
        + _field(5, 0) + _write_varint(ftype)
    )
    if type_name is not None:
        out += _len_field(6, type_name.encode())
    return out


def _message_desc(name: str, fields: list[bytes]) -> bytes:
    """DescriptorProto: 1 name | 2 field (repeated)."""
    out = _len_field(1, name.encode())
    for f in fields:
        out += _len_field(2, f)
    return out


def build_descriptor_set() -> bytes:
    """FileDescriptorSet{ file: [FileDescriptorProto{ name, package,
    message_type[], syntax }] } for the gw subset above."""
    messages = [
        _message_desc("UplinkFrame", [
            _field_desc("phy_payload", 1, TYPE_BYTES),
            _field_desc("tx_info", 2, TYPE_MESSAGE, ".gw.UplinkTXInfo"),
            _field_desc("rx_info", 3, TYPE_MESSAGE, ".gw.UplinkRXInfo"),
        ]),
        _message_desc("UplinkTXInfo", [
            _field_desc("frequency", 1, TYPE_UINT32),
            _field_desc("lora_modulation_info", 3, TYPE_MESSAGE,
                        ".gw.LoRaModulationInfo"),
        ]),
        _message_desc("LoRaModulationInfo", [
            _field_desc("bandwidth", 1, TYPE_UINT32),
            _field_desc("spreading_factor", 2, TYPE_UINT32),
            _field_desc("code_rate", 3, TYPE_STRING),
        ]),
        _message_desc("UplinkRXInfo", [
            _field_desc("gateway_id", 1, TYPE_BYTES),
            _field_desc("rssi", 5, TYPE_INT32),
            _field_desc("lora_snr", 6, TYPE_DOUBLE),
            _field_desc("channel", 7, TYPE_UINT32),
            _field_desc("rf_chain", 8, TYPE_UINT32),
            _field_desc("crc_status", 17, TYPE_UINT32),
        ]),
    ]
    # FileDescriptorProto: 1 name | 2 package | 4 message_type | 12 syntax
    fdp = _len_field(1, b"gw.proto") + _len_field(2, b"gw")
    for m in messages:
        fdp += _len_field(4, m)
    fdp += _len_field(12, b"proto3")
    return _len_field(1, fdp)  # FileDescriptorSet.file = 1


def write_descriptor(path: str) -> str:
    """Write gw.desc; returns the path (for from_protobuf_uplink)."""
    data = build_descriptor_set()
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)
    return path
