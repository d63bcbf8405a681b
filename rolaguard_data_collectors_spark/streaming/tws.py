"""Spark 4 ``transformWithStateInPandas`` twins of the
``applyInPandasWithState`` stateful operators (SURVEY.md §2A ops
34-38, ``streaming/stateful.py``).

transformWithState is the successor stateful API (SPARK-45939): typed
state variables (value/list/map), native timers instead of the single
per-key timeout, initial-state bootstrap, and the RocksDB state store
with changelog checkpointing — the production path for large state at
100 TB (state no longer bound by executor heap).

Design: the per-key semantics live ONCE, in the ``_*_fn`` logic
functions of ``streaming/stateful.py`` (whose column-level behavior is
pinned by the oracle-checked batch shadows in
``operators/stateful.py``). This module adapts those functions through
a ``GroupState``-compatible shim over a ``ValueState`` variable plus
handle timers, so the two streaming APIs cannot drift: one body, two
engines. ``tests/test_tws.py`` runs both paths over the same replay
feed and asserts row-set equality (and equality with the batch
shadow).

Timer mapping: ``GroupState.setTimeoutDuration(ms)`` re-arms a single
processing-time timeout per key; the shim reproduces that on the
timer API by dropping existing timers and registering
``now + ms`` — ``handleExpiredTimer`` then invokes the same logic
function with ``hasTimedOut=True`` (reference 600 s FAILED_VERIFY,
BaseCollector.py:43-53).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from . import stateful as _aip

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _install_protobuf_shim() -> bool:
    """Make ``google.protobuf`` importable. A real installation always
    wins; when absent, fall back to the vendored minimal runtime
    (``_vendor/pbshim`` — original implementation of the public wire
    format, scoped to what StateMessage_pb2 uses).

    The state-protocol client runs inside Spark's PYTHON WORKER
    processes (and the streaming driver worker), not just this
    process, so the shim directory also goes on ``PYTHONPATH``: in
    local mode every worker factory merges the JVM's inherited
    PYTHONPATH into worker sys.path. That only reaches workers if it
    happens BEFORE the JVM launches — tests trigger this at import/
    collection time, ahead of the first SparkSession."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    import importlib
    import os
    import sys

    vendor = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_vendor",
        "pbshim",
    )
    if not os.path.isdir(os.path.join(vendor, "google", "protobuf")):
        return False
    if vendor not in sys.path:
        sys.path.append(vendor)  # append: a real install stays ahead
    prev = os.environ.get("PYTHONPATH", "")
    if vendor not in prev.split(os.pathsep):
        # Local-mode assumption (documented): driver and workers share
        # this environment, so "no real protobuf here" implies none in
        # the children either; on a heterogeneous cluster, ship the
        # real wheel instead of relying on this export.
        os.environ["PYTHONPATH"] = f"{prev}{os.pathsep}{vendor}" if prev else vendor
    importlib.invalidate_caches()
    # If a `google` namespace package is already imported (e.g.
    # google-auth without protobuf), CPython's _NamespacePath only
    # re-merges portions with namespace specs — the vendored REGULAR
    # package appended later is never picked up. Graft its directory
    # onto the live package's __path__ explicitly.
    g = sys.modules.get("google")
    vendored_google = os.path.join(vendor, "google")
    if g is not None and vendored_google not in list(getattr(g, "__path__", [])):
        # _NamespacePath has no append; a plain list works for the
        # path-based finder (frozen namespace auto-recalculation is
        # traded away knowingly).
        g.__path__ = list(getattr(g, "__path__", [])) + [vendored_google]
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def tws_available() -> bool:
    """The transformWithState Python workers speak a protobuf-framed
    state protocol (pyspark's transform_with_state_driver_worker
    imports ``google.protobuf``), so the API needs a protobuf runtime.
    Probe for one (installing the vendored shim as a fallback) rather
    than crash — like the other optional-dependency paths
    (spark-protobuf connector, JDBC drivers). ``tests/test_tws.py``
    exercises the full engine path when a runtime exists and always
    unit-drives the processor + shim in-process against the
    oracle-checked batch shadows."""
    return _install_protobuf_shim()


def ensure_tws_state_store(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB state store provider;
    set it on the session (read per streaming query at start). Also the
    right provider at scale regardless: state lives off-heap on local
    SSD with changelog checkpointing, not in executor memory."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


class _GroupStateShim:
    """Duck-types the ``GroupState`` surface the logic functions use
    (exists / get / update / remove / hasTimedOut /
    setTimeoutDuration) on top of a ``ValueState``."""

    def __init__(self, vstate, timed_out: bool = False) -> None:
        self._v = vstate
        self.hasTimedOut = timed_out
        self.timeout_ms: int | None = None

    @property
    def exists(self) -> bool:
        return self._v.exists()

    @property
    def get(self) -> tuple:
        return tuple(self._v.get())

    def update(self, value: tuple) -> None:
        self._v.update(tuple(value))

    def remove(self) -> None:
        self._v.clear()

    def setTimeoutDuration(self, ms: int) -> None:
        self.timeout_ms = ms


class FnStatefulProcessor(StatefulProcessor):
    """Runs an ``applyInPandasWithState``-style logic function
    ``fn(key, pdfs, state)`` under the transformWithState API."""

    def __init__(self, fn, state_schema, use_timers: bool = False) -> None:
        self._fn = fn
        self._state_schema = state_schema
        self._use_timers = use_timers

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("s", self._state_schema)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        shim = _GroupStateShim(self._state)
        out = list(self._fn(key, rows, shim))
        if self._use_timers and shim.timeout_ms is not None:
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + shim.timeout_ms
            )
        yield from out

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        shim = _GroupStateShim(self._state, timed_out=True)
        yield from self._fn(key, iter(()), shim)

    def close(self) -> None:
        pass


def _tws(events: DataFrame, fn, out_schema, state_schema, mode: str,
         use_timers: bool = False) -> DataFrame:
    return (
        _aip.prepare_events_stream(events)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=FnStatefulProcessor(fn, state_schema, use_timers),
            outputStructType=out_schema,
            outputMode=mode,
            timeMode="ProcessingTime" if use_timers else "None",
        )
    )


def prev_packet_correlation_tws(events: DataFrame) -> DataFrame:
    """Op 34 (LoraServerIOCollector.py:368-448) on transformWithState."""
    return _tws(events, _aip._prev_packet_fn, _aip._PREV_OUT, _aip._PREV_STATE,
                "Append")


def device_map_enrich_tws(events: DataFrame) -> DataFrame:
    """Op 35 (LoraServerIOCollector.py:285-304,380-387)."""
    return _tws(events, _aip._device_map_fn, _aip._DEVMAP_OUT, _aip._DEVMAP_STATE,
                "Append")


def location_propagation_tws(events: DataFrame) -> DataFrame:
    """Op 36 (TTNCollector.py:202-211,241-247)."""
    return _tws(events, _aip._location_fn, _aip._LOC_OUT, _aip._LOC_STATE, "Append")


def verification_gate_tws(events: DataFrame, with_timeout: bool = False) -> DataFrame:
    """Op 37 (BaseCollector.py:85-110; 600 s timer :43-53). With
    ``with_timeout`` the FAILED_VERIFY emission rides a real
    per-key timer via ``handleExpiredTimer`` (off by default for the
    same processAllAvailable-never-settles reason as the
    applyInPandasWithState variant)."""
    return _tws(events, _aip._verify_fn, _aip._VERIFY_OUT, _aip._VERIFY_STATE,
                "Update", use_timers=with_timeout)


def status_change_detection_tws(events: DataFrame) -> DataFrame:
    """Op 38 (Orchestrator.py:88-135)."""
    return _tws(events, _aip._status_fn, _aip._STATUS_OUT, _aip._STATUS_STATE,
                "Update")
