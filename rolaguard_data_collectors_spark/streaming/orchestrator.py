"""Control plane (SURVEY.md §3 EP2): collector lifecycle management.

The reference's Orchestrator consumes CREATED/DELETED/ENABLED/
DISABLED/UPDATED/TEST events from a control queue and starts/stops
collector connections (Orchestrator.py:73-231). Here each enabled
collector config becomes one named ``StreamingQuery``:

    source (lorawan_replay / lorawan_live) -> per-type normalize
    pipeline -> envelope queue sink

and the control events map to StreamingQueryManager operations —
start, stop, stop+rebuild. Status changes are emitted change-only
(op 38's driver-side analog, Orchestrator.py:88-135).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..sources.datasource import register_sources
from .normalize import (
    normalize_chirpstack,
    normalize_mqtt_forwarder,
    normalize_ttn_v2,
    normalize_ttn_v3,
)
from .sink import start_envelope_queue_sink

# Collector type -> normalize pipeline (Orchestrator.py:246-306 type
# dispatch: chirpstack_collector / ttn_collector / ttn_v3_collector,
# plus the generic packet-forwarder CLI collector).
PIPELINES: dict[str, Callable[[DataFrame], DataFrame]] = {
    "generic_mqtt_collector": normalize_mqtt_forwarder,
    "chirpstack_collector": normalize_chirpstack,
    "ttn_collector": normalize_ttn_v2,
    "ttn_v3_collector": normalize_ttn_v3,
}


@dataclass
class CollectorConfig:
    """F6 config subset that drives a streaming query."""

    id: int
    type: str  # key into PIPELINES
    organization_id: int = 0
    source_format: str = "lorawan_live"  # or lorawan_replay
    source_options: dict[str, str] = field(default_factory=dict)
    enabled: bool = True


@dataclass
class StatusEvent:
    data_collector_id: int
    status: str  # CONNECTED / DISCONNECTED
    type: str | None = None
    message: str | None = None


class QueryStatusListener:
    """StreamingQueryListener emitting change-only lifecycle events —
    the listener-based analog of op 38 / the orchestrator's 5 s status
    poll (Orchestrator.py:88-135). Attach with
    ``spark.streams.addListener(QueryStatusListener(manager))``."""

    def __new__(cls, manager: "CollectorManager"):
        from pyspark.sql.streaming import StreamingQueryListener

        class _Impl(StreamingQueryListener):
            def onQueryStarted(self, event):
                manager.on_query_status(event.name or str(event.id), "CONNECTED")

            def onQueryProgress(self, event):
                pass  # progress is throughput telemetry, not status

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                manager.on_query_status(str(event.id), "DISCONNECTED")

        return _Impl()


class CollectorManager:
    """EP2 control loop over named StreamingQuery instances."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out_dir = out_dir
        self.queries: dict[int, Any] = {}
        self.configs: dict[int, CollectorConfig] = {}
        self._last_status: dict[int, str] = {}
        self.status_events: list[StatusEvent] = []
        register_sources(spark)

    # -- wiring ------------------------------------------------------------

    def _build(self, cfg: CollectorConfig):
        pipeline = PIPELINES[cfg.type]
        reader = self.spark.readStream.format(cfg.source_format)
        for k, v in cfg.source_options.items():
            reader = reader.option(k, v)
        reader = reader.option("dataCollectorId", str(cfg.id)).option(
            "organizationId", str(cfg.organization_id)
        )
        if cfg.source_format == "lorawan_replay" and "cursorPath" not in cfg.source_options:
            # Restart-safe rate-limit cursor, co-located with the sink
            # checkpoint for this collector.
            reader = reader.option(
                "cursorPath", f"{self.out_dir}/cursor_{cfg.id}.json"
            )
        raw = reader.load()
        packets = pipeline(raw)
        return start_envelope_queue_sink(
            packets,
            out_path=f"{self.out_dir}/queue_{cfg.id}.jsonl",
            checkpoint=f"{self.out_dir}/ckpt_{cfg.id}",
        )

    def _start(self, cfg: CollectorConfig) -> None:
        if cfg.id in self.queries:
            return
        self.queries[cfg.id] = self._build(cfg)
        self._emit_status(cfg.id, "CONNECTED")

    def _stop(self, collector_id: int) -> None:
        q = self.queries.pop(collector_id, None)
        if q is not None:
            q.stop()
            self._emit_status(collector_id, "DISCONNECTED")

    # -- op 38 driver-side analog -----------------------------------------

    def _emit_status(self, collector_id: int, status: str) -> None:
        if self._last_status.get(collector_id) != status:
            self._last_status[collector_id] = status
            self.status_events.append(StatusEvent(collector_id, status))

    def on_query_status(self, query_key: str, status: str) -> None:
        """Listener hook (QueryStatusListener): change-only tracking
        keyed by query name/id for queries not started by this manager."""
        prev = self._last_status.get(query_key)
        if prev != status:
            self._last_status[query_key] = status
            self.status_events.append(StatusEvent(-1, status, type=query_key))

    # -- EP2 event dispatch (Orchestrator.py:138-231) ----------------------

    def handle_event(self, event: dict) -> None:
        etype = event["type"]
        cfg: CollectorConfig | None = event.get("config")
        cid = cfg.id if cfg is not None else event.get("id")
        if etype == "CREATED":
            assert cfg is not None
            self.configs[cfg.id] = cfg
            if cfg.enabled:
                self._start(cfg)
        elif etype in ("DELETED", "DISABLED"):
            self._stop(cid)
            if etype == "DELETED":
                self.configs.pop(cid, None)
            elif cid in self.configs:
                self.configs[cid].enabled = False
            else:
                # DISABLED for an id never created (or already deleted)
                # — out-of-order control traffic, not a crash
                # (round-8 fuzz; Orchestrator.py logs and carries on).
                self._emit_error(cid, etype, "unknown collector id")
        elif etype == "ENABLED":
            if cid not in self.configs:
                self._emit_error(cid, etype, "unknown collector id")
                return
            self.configs[cid].enabled = True
            self._start(self.configs[cid])
        elif etype == "UPDATED":
            # Disconnect, emit DISCONNECTED, rebuild (:185-219).
            assert cfg is not None
            self._stop(cfg.id)
            self.configs[cfg.id] = cfg
            if cfg.enabled:
                self._start(cfg)
        elif etype == "TEST":
            # 30 s connection probe (BaseCollector.py:65-83): start,
            # verify the source produces progress, stop.
            assert cfg is not None
            ok = self.test_collector(cfg)
            self.status_events.append(
                StatusEvent(cfg.id, "TEST", "SUCCESS" if ok else "ERROR")
            )
        else:
            raise ValueError(f"unknown control event {etype!r}")

    def test_collector(self, cfg: CollectorConfig, timeout_s: int = 30) -> bool:
        q = None
        try:
            q = self._build(cfg)
            q.processAllAvailable()
            return q.exception() is None
        except Exception:
            return False
        finally:
            if q is not None:
                q.stop()
                self._last_status.pop(cfg.id, None)

    def _emit_error(self, collector_id, etype: str, message: str) -> None:
        self.status_events.append(
            StatusEvent(
                collector_id if isinstance(collector_id, int) else -1,
                "ERROR", type=etype, message=message,
            )
        )

    def handle_event_rows(self, rows) -> None:
        """Dispatch parsed control events (sources.control
        .control_event_stream rows): the EP2 loop fed from a queue.

        Fault isolation (round-8 fuzz): one malformed row — NULL/unknown
        type, config-less CREATED, unknown-id references — must never
        kill the control loop and strand every healthy collector; each
        row dispatches under its own guard and failures surface as
        ERROR status events (the reference's Orchestrator wraps its
        dispatch the same way, Orchestrator.py:138-231)."""
        for r in rows:
            try:
                cfg_row = r["config"]
                event: dict[str, Any] = {"type": r["type"]}
                if cfg_row is not None and cfg_row["id"] is not None:
                    # File-backed deployment: config.ip carries the feed
                    # location (the reference's ip/port point at brokers).
                    event["config"] = CollectorConfig(
                        id=cfg_row["id"],
                        type=cfg_row["type"]["type"],
                        organization_id=cfg_row["organization_id"] or 0,
                        source_format="lorawan_replay",
                        source_options={"path": cfg_row["ip"]},
                        enabled=cfg_row["status"] != "DISABLED",
                    )
                    event["id"] = cfg_row["id"]
                self.handle_event(event)
            except Exception as exc:  # noqa: BLE001 — control-loop isolation
                try:
                    cid = r["config"]["id"] if r["config"] is not None else None
                except Exception:
                    cid = None
                self._emit_error(cid if cid is not None else -1,
                                 str(r["type"]), repr(exc))

    # -- lifecycle ---------------------------------------------------------

    def process_all(self) -> None:
        for q in self.queries.values():
            q.processAllAvailable()

    def stop_all(self) -> None:
        for cid in list(self.queries):
            self._stop(cid)
