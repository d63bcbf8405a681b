"""transformWithState twins (streaming/tws.py) against the
oracle-checked batch shadows.

Two layers:
- in-process: drive ``FnStatefulProcessor`` + the GroupState shim by
  hand (fake handle / value state / timers) over the real events
  table, chunked into micro-batch-sized pieces, and assert the
  concatenated output equals the oracle-checked batch shadow. This
  runs everywhere and pins the adapter's state plumbing.
- engine: run the actual streaming queries through
  ``transformWithStateInPandas``. The Python side of that API speaks
  a protobuf-framed protocol, so these skip when ``google.protobuf``
  is absent (this container); they are the same assertions as the
  applyInPandasWithState suite in test_streaming.py.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rolaguard_data_collectors_spark.catalog import load_table
from rolaguard_data_collectors_spark.operators import stateful as batch_shadows
from rolaguard_data_collectors_spark.sources import register_sources
from rolaguard_data_collectors_spark.streaming import stateful as aip
from rolaguard_data_collectors_spark.streaming import tws

needs_protobuf = pytest.mark.skipif(
    not tws.tws_available(),
    reason="google.protobuf not installed: transformWithState protocol unavailable",
)


# --- in-process adapter drive ---------------------------------------------


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        self.timers.remove(ts)

    def listTimers(self):
        return list(self.timers)


class _FakeTimerValues:
    def __init__(self, now_ms=1_000):
        self._now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now

    def getCurrentWatermarkInMs(self):
        return -1


def _events_pdf(spark, sf_dir):
    """The prepared events feed as pandas, in (ts, event_id) arrival
    order — what prepare_events_stream emits."""
    return (
        aip.prepare_events_stream(load_table(spark, sf_dir, "events"))
        .orderBy("ts", "event_id")
        .toPandas()
    )


def _drive(fn, state_schema, events, use_timers=False, n_chunks=4):
    """Run a logic function through FnStatefulProcessor per key, the
    input split into several chunks to force state round-trips."""
    outs = []
    for uid, grp in events.groupby("user_id", sort=True):
        proc = tws.FnStatefulProcessor(fn, state_schema, use_timers)
        proc.init(_FakeHandle())
        n = max(1, min(n_chunks, len(grp)))
        for i in range(n):
            chunk = grp.iloc[len(grp) * i // n : len(grp) * (i + 1) // n]
            if len(chunk):
                outs.extend(
                    proc.handleInputRows((uid,), iter([chunk]), _FakeTimerValues())
                )
    kept = [o for o in outs if len(o)]
    if not kept:
        return pd.DataFrame()
    # object-dtype the chunks before concat: all-NA columns would otherwise
    # trip pandas' future dtype-exclusion change; _norm() re-types by the
    # declared Spark schema on both sides anyway.
    return pd.concat([o.astype(object) for o in kept], ignore_index=True)


def _norm(v, kind):
    """Engine-path outputs get Arrow-cast to the declared schema; the
    in-process drive doesn't, so normalize BOTH sides by the shadow's
    Spark type before comparing (37.0 vs 37, NaN vs None)."""
    if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
        return None
    if kind in ("bigint", "int"):
        return int(v)
    if kind == "double":
        return float(v)
    if kind == "boolean":
        return bool(v)
    return str(v)


def _as_set(df, cols, kinds):
    if isinstance(df, pd.DataFrame):
        recs = df.to_dict("records")
    else:
        recs = [r.asDict() for r in df.collect()]
    return {tuple(_norm(r[c], kinds[c]) for c in cols) for r in recs}


@pytest.mark.parametrize(
    "fn,state_schema,shadow_fn,cols",
    [
        (aip._prev_packet_fn, aip._PREV_STATE, batch_shadows.prev_packet_correlation,
         ["event_id", "user_id", "f_count", "gw_value", "merged"]),
        (aip._device_map_fn, aip._DEVMAP_STATE, batch_shadows.device_map_enrich,
         ["event_id", "user_id", "dev_registration"]),
        (aip._location_fn, aip._LOC_STATE, batch_shadows.location_propagation,
         ["event_id", "user_id", "latitude"]),
        (aip._status_fn, aip._STATUS_STATE, batch_shadows.status_change_detection,
         ["event_id", "user_id", "status", "prev_status"]),
    ],
)
def test_processor_shim_matches_batch_shadow(spark, sf_dir, fn, state_schema,
                                             shadow_fn, cols):
    events = _events_pdf(spark, sf_dir)
    shadow = shadow_fn(spark, sf_dir)
    kinds = {f.name: f.dataType.simpleString() for f in shadow.schema.fields}
    got = _as_set(_drive(fn, state_schema, events), cols, kinds)
    want = _as_set(shadow, cols, kinds)
    assert got == want


def test_processor_shim_verify_counters_and_timer(spark, sf_dir):
    """Op 37 through the shim: final per-key counters equal the batch
    aggregate; setTimeoutDuration maps onto exactly one live
    re-armed timer; expiry emits the FAILED row and clears state."""
    events = _events_pdf(spark, sf_dir)
    finals = {}
    for uid, grp in events.groupby("user_id", sort=True):
        proc = tws.FnStatefulProcessor(aip._verify_fn, aip._VERIFY_STATE,
                                       use_timers=True)
        handle = _FakeHandle()
        proc.init(handle)
        for i in range(3):
            chunk = grp.iloc[len(grp) * i // 3 : len(grp) * (i + 1) // 3]
            if len(chunk):
                for out in proc.handleInputRows((uid,), iter([chunk]),
                                                _FakeTimerValues(now_ms=5_000)):
                    for r in out.to_dict("records"):
                        finals[uid] = r
        assert handle.timers == [5_000 + aip.VERIFY_TIMEOUT_MS]  # re-armed, not stacked
        expired = list(proc.handleExpiredTimer((uid,), _FakeTimerValues(),
                                               tws.ExpiredTimerInfo(9)))
        assert len(expired) == 1 and bool(expired[0]["timed_out"].iloc[0])
        assert not handle.states["s"].exists()  # state removed on timeout
    want = {
        r["user_id"]: r
        for r in batch_shadows.verification_gate(spark, sf_dir).collect()
    }
    assert set(finals) == set(want)
    for uid, r in finals.items():
        w = want[uid]
        assert (r["total_packets"], r["verified_packets"], r["verified"]) == (
            w["total_packets"], w["verified_packets"], w["verified"],
        )


# --- engine path (needs google.protobuf) ----------------------------------

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def events_feed(spark, sf_dir, tmp_path_factory):
    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id").collect()
    d = tmp_path_factory.mktemp("tws_feed")
    with open(d / "collector_1.jsonl", "w") as fh:
        for r in ev:
            fh.write(
                json.dumps(
                    {
                        "topic": "events",
                        "value": json.dumps(
                            {
                                "event_id": r["event_id"],
                                "user_id": r["user_id"],
                                "ts": None if pd.isna(r["ts"]) else r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                                "event_type": r["event_type"],
                                "value": r["value"],
                                "props": r["props"],
                            }
                        ),
                        "ts": int(r["ts"].timestamp()),
                    }
                )
                + "\n"
            )
    return str(d)


def _events_stream(spark, feed_dir, batch_size=150):
    register_sources(spark)
    raw = (
        spark.readStream.format("lorawan_replay")
        .option("path", feed_dir)
        .option("batchSize", batch_size)
        .load()
    )
    j = F.from_json("value", EVENT_SCHEMA)
    return raw.select(
        j["event_id"].alias("event_id"),
        j["user_id"].alias("user_id"),
        F.to_timestamp(j["ts"]).alias("ts"),
        j["event_type"].alias("event_type"),
        j["value"].alias("value"),
        j["props"].alias("props"),
    )


def _run_to_memory(spark, df, name, mode):
    tws.ensure_tws_state_store(spark)
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(120)


@needs_protobuf
@pytest.mark.parametrize(
    "tws_fn,shadow_fn,cols,mode",
    [
        (tws.prev_packet_correlation_tws, batch_shadows.prev_packet_correlation,
         ["event_id", "user_id", "f_count", "gw_value", "merged"], "append"),
        (tws.device_map_enrich_tws, batch_shadows.device_map_enrich,
         ["event_id", "user_id", "dev_registration"], "append"),
        (tws.location_propagation_tws, batch_shadows.location_propagation,
         ["event_id", "user_id", "latitude"], "append"),
        (tws.status_change_detection_tws, batch_shadows.status_change_detection,
         ["event_id", "user_id", "status", "prev_status"], "update"),
    ],
)
def test_tws_stream_matches_batch_shadow(
    spark, sf_dir, events_feed, tws_fn, shadow_fn, cols, mode
):
    name = f"tws_{tws_fn.__name__}"
    _run_to_memory(spark, tws_fn(_events_stream(spark, events_feed)), name, mode)
    shadow = shadow_fn(spark, sf_dir)
    kinds = {f.name: f.dataType.simpleString() for f in shadow.schema.fields}
    got = _as_set(spark.sql(f"select * from {name}"), cols, kinds)
    want = _as_set(shadow, cols, kinds)
    assert got == want


@needs_protobuf
def test_tws_verification_gate_final_state(spark, sf_dir, events_feed):
    _run_to_memory(
        spark,
        tws.verification_gate_tws(_events_stream(spark, events_feed)),
        "tws_verify",
        "update",
    )
    final = spark.sql(
        """
        select user_id, total_packets, verified_packets, verified
        from (select *, row_number() over (partition by user_id
                                           order by total_packets desc) rn
              from tws_verify) where rn = 1
        """
    )
    want = batch_shadows.verification_gate(spark, sf_dir).select(
        "user_id", "total_packets", "verified_packets", "verified"
    )
    cols = ["user_id", "total_packets", "verified_packets", "verified"]
    kinds = {f.name: f.dataType.simpleString() for f in want.schema.fields}
    assert _as_set(final, cols, kinds) == _as_set(want, cols, kinds)


@needs_protobuf
def test_tws_engine_state_survives_restart(spark, sf_dir, tmp_path_factory):
    """Engine-level recovery: run prev_packet_correlation_tws as a REAL
    transformWithStateInPandas streaming query over the replay source
    with RocksDB state + a file checkpoint, stop it halfway, append
    the rest of the feed, and RESTART from the same checkpoint. The
    combined sink must equal the oracle-checked batch shadow over the
    whole table — rows after the boundary are only correct if each
    user's (f_count, value) state written before the stop is read back
    after the restart, and any offset-replay duplicate would break the
    multiset equality."""
    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id").collect()
    cut = len(ev) // 2
    work = tmp_path_factory.mktemp("tws_restart")
    feed, sink, ckpt = work / "feed", work / "sink", work / "ckpt"
    feed.mkdir()

    def _lines(rows):
        return "".join(
            json.dumps(
                {
                    "topic": "events",
                    "value": json.dumps(
                        {
                            "event_id": r["event_id"],
                            "user_id": r["user_id"],
                            "ts": None if pd.isna(r["ts"]) else r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                            "event_type": r["event_type"],
                            "value": r["value"],
                            "props": r["props"],
                        }
                    ),
                    "ts": int(r["ts"].timestamp()),
                }
            )
            + "\n"
            for r in rows
        )

    def _run_once():
        tws.ensure_tws_state_store(spark)
        df = tws.prev_packet_correlation_tws(
            _events_stream(spark, str(feed), batch_size=100)
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(120)

    (feed / "collector_1.jsonl").write_text(_lines(ev[:cut]))
    _run_once()
    # the "crash": the first query object is gone; extend the feed
    # in-place (offsets are per-file line cursors) and restart from
    # the checkpoint.
    with open(feed / "collector_1.jsonl", "a") as fh:
        fh.write(_lines(ev[cut:]))
    _run_once()

    got_df = spark.read.parquet(str(sink))
    shadow = batch_shadows.prev_packet_correlation(spark, sf_dir)
    cols = ["event_id", "user_id", "f_count", "gw_value", "merged"]
    kinds = {f.name: f.dataType.simpleString() for f in shadow.schema.fields}
    got = _as_set(got_df, cols, kinds)
    want = _as_set(shadow, cols, kinds)
    # state continuity must actually be exercised: some user's packets
    # must straddle the cut
    first_users = {r["user_id"] for r in ev[:cut]}
    assert any(r["user_id"] in first_users for r in ev[cut:])
    assert got == want


_ADV_EVENTS = [
    # mirrors test_streaming's adversarial corpus: NULL user_id through
    # the transformWithState grouping key, NULL value/props, identical
    # timestamps, gap boundaries
    (0, 0, 1, "signup", 1.0, '{"k": 1}'),
    (1, 0, 1, "purchase", 2.0, '{"k": 2}'),
    (2, 0, 1, "error", 3.0, '{"k": 3}'),
    (3, 1800, 1, "purchase", 4.0, '{"k": 4}'),
    (4, 3601, 1, "view", 5.0, None),
    (5, 300, None, "view", 6.0, '{"k": 6}'),
    (6, 360, 2, "purchase", None, '{"k": 7}'),
    (7, 7200, 3, "signup", 8.0, '{"k": 8}'),
    (8, 10800, 4, "error", 9.0, '{"k": 9}'),
    (9, 10860, 4, "purchase", 10.0, '{"k": 10}'),
    (10, 10920, 4, "error", 11.0, '{"k": 11}'),
    # round 7: NULL event timestamps (NULLS FIRST arrival spec;
    # mirrors test_streaming) — all-NULL-ts user, NULL user+ts, and a
    # mixed NULL/stamped user so the order changes which row is
    # "previous" in the engine's state
    (11, 14400, 5, "view", 12.0, '{"k": 12}'),
    (12, None, 5, "view", 13.0, '{"k": 13}'),
    (13, None, 6, "view", 14.0, '{"k": 14}'),
    (14, None, None, "purchase", 15.0, '{"k": 15}'),
    # pre-1970 (negative-epoch) and sub-second timestamps through the
    # engine's state ordering (mirrors the oracle-fuzz corpus)
    (15, -1728000000, 7, "purchase", 18.0, '{"k": 18}'),
    (16, -1728001801, 7, "view", 19.5, '{"k": 19}'),
    (17, 1.999999, 7, "purchase", 20.0, '{"k": 20}'),
]


@pytest.fixture(scope="module")
def adv_env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("tws_adv")
    pq_dir, feed_dir = d / "pq", d / "feed"
    pq_dir.mkdir(), feed_dir.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        {"event_id": i,
         "ts": pd.NaT if off is None else base + pd.Timedelta(seconds=off),
         "user_id": u, "event_type": et, "value": v, "props": pr}
        for i, off, u, et, v, pr in _ADV_EVENTS
    ]
    pdf = pd.DataFrame(rows)
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    pdf.to_parquet(pq_dir / "events.parquet", index=False)
    with open(feed_dir / "collector_1.jsonl", "w") as fh:
        for r in sorted(
            rows,
            key=lambda r: (pd.notna(r["ts"]),
                           r["ts"].timestamp() if pd.notna(r["ts"]) else 0,
                           r["event_id"]),
        ):
            fh.write(json.dumps({
                "topic": "events",
                "value": json.dumps({
                    "event_id": r["event_id"],
                    "user_id": None if pd.isna(r["user_id"]) else int(r["user_id"]),
                    "ts": None if pd.isna(r["ts"]) else r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                    "event_type": r["event_type"],
                    "value": None if pd.isna(r["value"]) else r["value"],
                    "props": r["props"],
                }),
                "ts": 0 if pd.isna(r["ts"]) else int(r["ts"].timestamp()),
            }) + "\n")
    return str(pq_dir), str(feed_dir)


@needs_protobuf
@pytest.mark.parametrize(
    "tws_fn,shadow_fn,cols,mode",
    [
        (tws.prev_packet_correlation_tws, batch_shadows.prev_packet_correlation,
         ["event_id", "user_id", "f_count", "gw_value", "merged"], "append"),
        (tws.status_change_detection_tws, batch_shadows.status_change_detection,
         ["event_id", "user_id", "status", "prev_status"], "update"),
    ],
)
def test_tws_engine_adversarial_matches_batch_shadow(
    spark, adv_env, tws_fn, shadow_fn, cols, mode
):
    """The transformWithState ENGINE over the adversarial corpus —
    NULL grouping keys through the typed-state key path being the
    shape the real protocol must round-trip (the shadows are
    DuckDB-oracled on this corpus shape in tests/test_parity_fuzz.py)."""
    pq_dir, feed_dir = adv_env
    name = f"tws_adv_{tws_fn.__name__}"
    _run_to_memory(
        spark, tws_fn(_events_stream(spark, feed_dir, batch_size=3)), name, mode
    )
    shadow = shadow_fn(spark, pq_dir)
    kinds = {f.name: f.dataType.simpleString() for f in shadow.schema.fields}
    got = _as_set(spark.sql(f"select * from {name}"), cols, kinds)
    want = _as_set(shadow, cols, kinds)
    assert got == want
