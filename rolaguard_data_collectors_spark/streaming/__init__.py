"""Streaming layer: normalization pipelines, stateful operators,
sinks, and the control-plane orchestrator (SURVEY.md §2A ops 7-9,
34-38; §3 EP1/EP2).

Everything here is expressed so the same code runs on a batch frame
(DuckDB-oracle checkable) and an unbounded readStream frame — the
pipelines are pure column expressions + Arrow UDFs, the stateful ops
are ``applyInPandasWithState`` with explicit per-collector sequence
numbers restoring arrival order inside micro-batches.
"""

from .enrich import attach_location_by_gateway, enrich_per_collector
from .normalize import (
    normalize_chirpstack,
    normalize_mqtt_forwarder,
    normalize_ttn_v2,
    normalize_ttn_v3,
)
from .sink import QueueFileSink, to_envelope_json
from .stateful import (
    device_map_enrich_stream,
    location_propagation_stream,
    prev_packet_correlation_stream,
    status_change_detection_stream,
    verification_gate_stream,
)

__all__ = [
    "enrich_per_collector",
    "attach_location_by_gateway",
    "normalize_mqtt_forwarder",
    "normalize_chirpstack",
    "normalize_ttn_v2",
    "normalize_ttn_v3",
    "to_envelope_json",
    "QueueFileSink",
    "prev_packet_correlation_stream",
    "device_map_enrich_stream",
    "location_propagation_stream",
    "verification_gate_stream",
    "status_change_detection_stream",
]
