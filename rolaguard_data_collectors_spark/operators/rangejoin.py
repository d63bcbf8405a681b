"""Bucketed range join: probe rows against intervals with NO equi key.

The reference never joins on a pure range (its correlation is keyed —
op 34's per-device as-of merge), but a large-scale event pipeline
constantly needs the unkeyed form: "every event inside any maintenance
window / incident window / campaign window". The naive expression is
an inequality-only join, which Spark can only execute as
BroadcastNestedLoopJoin or CartesianProduct — O(|probe| x |intervals|)
and the exact plan shape tests/test_plans.py bans.

The scale-safe expansion is standard interval bucketing:

1. pick a bucket width W (≈ the typical interval length);
2. each interval explodes into the buckets it overlaps
   (``sequence(floor(start/W), floor(end/W))`` — ceil(len/W)+1 rows,
   a constant for bounded intervals, never data-sized);
3. each probe row hashes to exactly ONE bucket (``floor(ts/W)``);
4. equi-join on the bucket co-locates every possible match —
   completeness: p in [s, e) implies floor(p/W) in
   [floor(s/W), floor(e/W)] — then the exact half-open range
   predicate filters in-stage.

Each probe row appears in one bucket, so a multi-bucket interval can
never double-match it; shuffle volume is |probe| + replicated
intervals, and the join is an ordinary equi-join (bucketable,
AQE-skew-handled, broadcastable when the interval side is small).
DuckDB executes the same semantics natively as an IEJoin, which is
exactly what makes it oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec


def bucketed_range_join(
    probe: DataFrame,
    intervals: DataFrame,
    probe_ts: str,
    ivl_start: str,
    ivl_end: str,
    bucket_width_s: int,
    how: str = "left",
) -> DataFrame:
    """Join ``probe`` rows whose ``probe_ts`` falls in
    [``ivl_start``, ``ivl_end``) of any ``intervals`` row, via the
    bucket expansion above. ``how='left'`` keeps empty intervals (the
    interval side is the left side). Column names must not collide
    across the two frames (callers prefix). NULL-timestamp probe rows
    match nothing; NULL-start intervals survive a left join with zero
    matches (their bucket list coalesces to a single NULL bucket,
    which no probe bucket equals)."""
    w = F.lit(float(bucket_width_s))
    seq = F.sequence(
        F.floor(F.unix_timestamp(F.col(ivl_start)) / w),
        F.floor(F.unix_timestamp(F.col(ivl_end)) / w),
    )
    ivl_b = intervals.withColumn(
        "_bucket",
        F.explode(
            F.coalesce(seq, F.array(F.lit(None).cast("long")))
        ),
    )
    probe_b = probe.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(probe_ts)) / w)
    )
    cond = (
        (F.col(ivl_start).isNotNull())
        & (F.col(probe_ts) >= F.col(ivl_start))
        & (F.col(probe_ts) < F.col(ivl_end))
    )
    return ivl_b.join(probe_b, ["_bucket"], how).withColumn(
        "_in_range", F.coalesce(cond, F.lit(False))
    )


# Maintenance-window sweep over the events stream: every 'error' event
# opens a 30-minute window; profile the traffic inside each window.
WINDOW_SECONDS = 1800


def range_join_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(window_id, w_start, n_events, n_purchases, max_value) per
    error-opened half-open 30 min window — empty windows kept with
    zero counts. Bucket width = window length, so each interval
    explodes into at most 2 bucket rows."""
    ev = load_table(spark, sf_dir, "events")
    wins = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    probe = ev.select(
        F.col("event_id").alias("p_event_id"),
        F.col("event_type").alias("p_type"),
        F.col("value").alias("p_value"),
        F.col("ts").alias("p_ts"),
    )
    j = bucketed_range_join(
        probe=probe, intervals=wins, probe_ts="p_ts",
        ivl_start="w_start", ivl_end="w_end",
        bucket_width_s=WINDOW_SECONDS,
    )
    hit = F.col("_in_range")
    return (
        j.groupBy("window_id", "w_start")
        .agg(
            F.count(F.when(hit, F.col("p_event_id"))).alias("n_events"),
            # count the EVENT ID (not a literal) so NULL-id rows are
            # skipped exactly like the oracle's count(e.event_id)
            F.count(
                F.when(hit & (F.col("p_type") == "purchase"),
                       F.col("p_event_id"))
            ).alias("n_purchases"),
            F.max(F.when(hit, F.col("p_value"))).alias("max_value"),
        )
    )


RANGE_JOIN_ERROR_WINDOWS_ORACLE = """
WITH wins AS (
  SELECT event_id AS window_id, ts AS w_start,
         ts + INTERVAL 30 MINUTE AS w_end
  FROM events WHERE event_type = 'error'
)
SELECT w.window_id, w.w_start,
       count(e.event_id) AS n_events,
       count(e.event_id) FILTER (e.event_type = 'purchase') AS n_purchases,
       max(e.value) AS max_value
FROM wins w LEFT JOIN events e
  ON w.w_start IS NOT NULL
 AND e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY 1, 2
"""


def error_window_event_pairs(events: DataFrame,
                             watermark: str = "2 hours") -> DataFrame:
    """(window_id, w_start, p_event_id, p_ts) pairs — every event
    inside any error-opened window — from ONE frame that may be batch
    or streaming. The bucket expansion is what makes the UNKEYED
    interval join STREAMABLE: a stream-stream join needs an equi key
    for StreamingSymmetricHashJoin, and the bucket provides one, while
    the [w_start, w_start+30min) range condition between the two
    event-time columns (plus the watermarks) gives the engine the
    state-cleanup bound — old window state is dropped once the probe
    watermark passes w_end. Inner join: NULL-timestamp windows and
    probes match nothing on both paths, so the batch twin (the same
    code on a batch frame) is the exact oracle for the stream
    (tests/test_streaming.py)."""
    w = F.lit(float(WINDOW_SECONDS))
    wins = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    probe = events.select(
        F.col("event_id").alias("p_event_id"), F.col("ts").alias("p_ts")
    )
    if events.isStreaming:
        wins = wins.withWatermark("w_start", watermark)
        probe = probe.withWatermark("p_ts", watermark)
    wins = wins.withColumn(
        "w_bucket",
        F.explode(F.sequence(
            F.floor(F.unix_timestamp("w_start") / w),
            F.floor(F.unix_timestamp("w_end") / w),
        )),
    )
    probe = probe.withColumn(
        "p_bucket", F.floor(F.unix_timestamp("p_ts") / w)
    )
    return wins.join(
        probe,
        (F.col("w_bucket") == F.col("p_bucket"))
        & (F.col("p_ts") >= F.col("w_start"))
        & (F.col("p_ts") < F.col("w_end")),
        "inner",
    ).select("window_id", "w_start", "p_event_id", "p_ts")


QUERIES: list[QuerySpec] = []
