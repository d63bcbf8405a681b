"""Bucketed range join (operators/rangejoin.py): oracle parity,
no-nested-loop plan invariant, bucket-completeness property, and the
NULL/boundary edges a naive bucketing gets wrong."""

from __future__ import annotations

import datetime
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.operators.rangejoin import (
    RANGE_JOIN_ERROR_WINDOWS_ORACLE,
    bucketed_range_join,
    range_join_error_windows,
)
from rolaguard_data_collectors_spark.oracle import compare


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return con


@pytest.mark.parametrize("sfd", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_range_join_matches_oracle(spark, sfd):
    r = compare("range_join_error_windows",
                range_join_error_windows(spark, sfd),
                RANGE_JOIN_ERROR_WINDOWS_ORACLE, _con(sfd))
    assert r.ok and r.exact_match and r.dtypes_match, (r.detail, r.dtype_skews)


def test_range_join_adversarial_corpus(spark, tmp_path):
    """NULL ts probe rows (match nothing), a NULL-ts error event (an
    empty window that must survive the left join), events exactly ON
    the half-open boundaries, an interval straddling a bucket edge,
    and duplicate timestamps."""
    t0 = datetime.datetime(2023, 5, 1, 12, 0, 0)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    rows = [
        # error events open windows: one mid-bucket, one straddling a
        # 1800 s bucket edge (12:20 + 30 min crosses 12:30)
        (1, 1, "error", 5.0, ts(0)),
        (2, 2, "error", 6.0, ts(20)),
        (3, 3, "error", 7.0, None),          # NULL-ts window: empty, kept
        # probes
        (10, 1, "purchase", 1.0, ts(0)),     # == w_start: inside (closed start)
        (11, 1, "purchase", 2.0, ts(30)),    # == w_end of win 1: OUT (open end)
        (12, 2, "view", 3.0, ts(49)),        # inside win 2 only
        (13, 2, "purchase", 4.0, ts(50)),    # == w_end of win 2: OUT
        (14, 1, "view", 8.0, ts(29)),        # inside both windows
        (15, 9, "purchase", 9.0, None),      # NULL ts: matches nothing
        (16, 9, "purchase", 9.5, ts(29)),    # duplicate timestamp
        (None, 9, "purchase", 1.5, ts(1)),   # NULL event id inside win 1
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value", "ts"]
    )
    pdf["event_id"] = pdf["event_id"].astype("Int64")
    d = str(tmp_path)
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    r = compare("range_join_adversarial",
                range_join_error_windows(spark, d),
                RANGE_JOIN_ERROR_WINDOWS_ORACLE, _con(d))
    assert r.ok and r.exact_match and r.dtypes_match, (r.detail, r.dtype_skews)
    got = {row["window_id"]: row.asDict()
           for row in range_join_error_windows(spark, d).collect()}
    # window 1 [12:00, 12:30): events 1,2 (errors are probes too),
    # 10, 14, 16 + the NULL-id purchase (uncounted)
    assert got[1]["n_events"] == 5 and got[1]["n_purchases"] == 2
    # window 2 [12:20, 12:50): events 2, 11 (12:30 — outside win 1's
    # open end, inside win 2), 12, 14, 16 — not 13 (50')
    assert got[2]["n_events"] == 5 and got[2]["n_purchases"] == 2
    # NULL-ts window: kept, empty
    assert got[3]["n_events"] == 0 and got[3]["max_value"] is None


def test_range_join_plan_is_equi_never_nested_loop(spark):
    """The whole point: an unkeyed interval join must compile to an
    equi-join on the bucket, never the O(N x M) nested loop the naive
    inequality join produces."""
    plan = range_join_error_windows(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rangejoin_property_random_shapes(spark):
    """Property fuzz: random probe/interval offsets — including
    zero-length and INVERTED (end < start) intervals — must always
    match the brute-force condition join exactly. Inverted intervals
    explode into descending bucket sequences (Spark's sequence()
    auto-steps -1); they must contribute zero matches, exactly like
    the empty brute-force predicate, never crash or invent rows."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base_epoch = 1_700_000_000

    @settings(max_examples=4, deadline=None)
    @given(
        probe_offs=st.lists(st.integers(min_value=-4000, max_value=4000),
                            min_size=5, max_size=40),
        ivls=st.lists(
            st.tuples(st.integers(min_value=-4000, max_value=4000),
                      st.integers(min_value=-2000, max_value=2000)),
            min_size=2, max_size=8,
        ),
        width=st.sampled_from([30, 300, 1800]),
    )
    def check(probe_offs, ivls, width):
        probe = spark.createDataFrame(
            [(i, base_epoch + o) for i, o in enumerate(probe_offs)],
            "p_id long, _e long",
        ).select("p_id", F.timestamp_seconds("_e").alias("p_ts"))
        intervals = spark.createDataFrame(
            [(i, base_epoch + s, base_epoch + s + dur)
             for i, (s, dur) in enumerate(ivls)],
            "w_id long, _s long, _t long",
        ).select(
            "w_id",
            F.timestamp_seconds("_s").alias("s"),
            F.timestamp_seconds("_t").alias("e"),
        )
        got = sorted(
            (r["w_id"], r["p_id"])
            for r in bucketed_range_join(probe, intervals, "p_ts", "s", "e",
                                         width)
            .where("_in_range").select("w_id", "p_id").collect()
        )
        want = sorted(
            (r["w_id"], r["p_id"])
            for r in intervals.join(
                probe,
                (F.col("p_ts") >= F.col("s")) & (F.col("p_ts") < F.col("e")),
            ).select("w_id", "p_id").collect()
        )
        assert got == want

    check()


def test_bucket_completeness_under_width_mismatch(spark):
    """Property: results are identical for ANY bucket width — including
    widths much smaller and larger than the interval length — because
    bucketing only co-locates candidates; the exact predicate decides.
    A width bug (incomplete bucket coverage) shows up as lost matches."""
    base = spark.range(200).select(
        F.col("id").alias("p_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 137).alias("p_ts"),
    )
    ivls = spark.range(20).select(
        F.col("id").alias("w_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 1300).alias("s"),
        F.timestamp_seconds(
            1_700_000_000 + F.col("id") * 1300 + 900 + (F.col("id") % 3) * 700
        ).alias("e"),
    )

    def matched(width):
        j = bucketed_range_join(base, ivls, "p_ts", "s", "e", width)
        return sorted(
            (r["w_id"], r["p_id"])
            for r in j.where("_in_range").select("w_id", "p_id").collect()
        )

    want = sorted(
        (r["w_id"], r["p_id"])
        for r in ivls.join(
            base,
            (F.col("p_ts") >= F.col("s")) & (F.col("p_ts") < F.col("e")),
        ).select("w_id", "p_id").collect()
    )
    assert want  # non-degenerate
    for width in (60, 900, 1800, 86_400):
        assert matched(width) == want, f"width={width} lost/invented matches"
