"""Cascaded time-grain rollup (the hypertable "continuous aggregate"
pattern): minute aggregates computed from raw events ONCE, hour
aggregates re-aggregated FROM the minute table, day from hour.

At 100 TB this is the difference between reading the raw table three
times and reading it once: every coarser grain is derived from the
~1/60-sized previous grain, which is also exactly how a lake deployment
maintains materialized rollups (each grain is a table; the next grain's
job reads it, not the events). Correctness rests on aggregate
decomposability — count and sum re-aggregate losslessly.

Value sums run in DECIMAL(28,6), not double (round 9): a double sum
re-associates differently between the cascaded and the direct
computation, and round(_, 2) does not absorb a ULP difference when a
sum lands on a rounding boundary — the decimal path quantizes each
input once (both engines recover the same 6-dp decimal from the
2-dp-generated doubles) and is then exact integer arithmetic, so
re-aggregation at every grain is bit-identical to direct aggregation
in BOTH engines (the r8 ADVICE boundary-flakiness fix). Rounding to 2
happens in decimal (Spark HALF_UP == DuckDB half-away-from-zero for
decimals) and only the final cast emits double.

The whole cascade is ONE events scan: the minute frame is staged with
the repo's lazy-localCheckpoint discipline and both coarser grains
re-aggregate it (hour) / its derivative (day) — without the stage the
declarative plan would re-derive minute aggregates from raw once per
grain (3 scans).

Driver visibility (round 9): registered as the minute/hour/day legs of
the ``time_windows`` tagged union (operators/stateful.py) — the same
zero-slot consolidation that registered SemDeDup, BM25, PQ and DSIR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec

# One quantization of the input, shared by every grain and mirrored in
# the oracle. 28,6 leaves 22 integer digits — a 100 TB event count at
# max |value| stays far inside it, and Spark widens sums to (38,6).
VALUE_DECIMAL = "decimal(28,6)"


def cascade_grains(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The three grain frames, each with (window_start, event_type,
    n_events, _sv DECIMAL) — hour derived from minute, day from hour,
    never from raw. Exposed separately so callers (the registered leg,
    a lake maintenance job) can persist each grain as its own table."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    minute = (
        ev.groupBy(
            F.date_trunc("minute", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(VALUE_DECIMAL)).alias("_sv"),
        )
        .localCheckpoint(eager=False)
    )
    hour = (
        minute.groupBy(
            F.date_trunc("hour", "window_start").alias("window_start"),
            "event_type",
        )
        .agg(F.sum("n_events").alias("n_events"), F.sum("_sv").alias("_sv"))
        .localCheckpoint(eager=False)
    )
    day = hour.groupBy(
        F.date_trunc("day", "window_start").alias("window_start"),
        "event_type",
    ).agg(F.sum("n_events").alias("n_events"), F.sum("_sv").alias("_sv"))
    return {"minute": minute, "hour": hour, "day": day}


def cascade_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(grain, window_start, event_type, n_events, total_value) for
    minute/hour/day grains; hour and day are derived from the minute
    aggregates, never from raw events. Internal sums stay unrounded
    decimals — rounding only at emit, so re-aggregation cannot compound
    rounding error. NULL timestamps form their own (NULL-bucket) group
    at every grain, mirroring the oracle's GROUP BY semantics."""
    grains = cascade_grains(spark, sf_dir)

    def emit(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "window_start",
            "event_type",
            "n_events",
            F.round("_sv", 2).cast("double").alias("total_value"),
        )

    return (
        emit(grains["minute"], "minute")
        .unionByName(emit(grains["hour"], "hour"))
        .unionByName(emit(grains["day"], "day"))
    )


# Direct (non-cascaded) aggregation at every grain — equality proves
# the re-aggregation is lossless. Same DECIMAL(28,6) quantization as
# the Spark side; CAST to DOUBLE at emit (DuckDB would otherwise
# materialize DECIMAL through pandas as object dtype).
CASCADE_ROLLUP_ORACLE = """
SELECT 'minute' AS grain, date_trunc('minute', ts) AS window_start,
       event_type, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'hour', date_trunc('hour', ts), event_type,
       count(*), CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', date_trunc('day', ts), event_type,
       count(*), CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
FROM events GROUP BY 2, 3
"""


# Registered through the time_windows tagged union (stateful.py), not
# as a standalone slot — the driver window is full at 50.
QUERIES: list[QuerySpec] = []
