"""Streaming sources (SURVEY.md §2A ops 1-6).

The reference ingests LoRaWAN traffic through four transports — MQTT
(generic packet-forwarder + ChirpStack), TTN v2 WebSocket, TTN v3 SSE
— each a thread pushing per-message callbacks. Here each transport is
a PySpark 4 Python ``DataSource``:

- ``lorawan_replay``: a partitioned, offset-tracked replayable reader
  over JSONL capture files (one file per collector — the test/bench
  transport, and the pattern a Kafka-bridged production deploy uses).
- ``lorawan_live``: a driver-prefetch reader wrapping a non-replayable
  network transport (MQTT/WS/SSE), giving the same at-least-once
  guarantee the reference's RabbitMQ publisher had.
"""

from .datasource import (
    RAW_MESSAGE_SCHEMA,
    LorawanLiveDataSource,
    LorawanReplayDataSource,
    register_sources,
)
from .transports import (
    FakeTransport,
    MqttTransport,
    ReplayTransport,
    Transport,
    TTNv2WebSocketTransport,
    TTNv3SseTransport,
    make_transport,
)

__all__ = [
    "RAW_MESSAGE_SCHEMA",
    "LorawanReplayDataSource",
    "LorawanLiveDataSource",
    "register_sources",
    "Transport",
    "FakeTransport",
    "ReplayTransport",
    "MqttTransport",
    "TTNv2WebSocketTransport",
    "TTNv3SseTransport",
    "make_transport",
]
