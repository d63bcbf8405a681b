"""Cascaded time-grain rollup (the hypertable "continuous aggregate"
pattern): minute aggregates computed from raw events ONCE, hour
aggregates re-aggregated FROM the minute table, day from hour.

At 100 TB this is the difference between reading the raw table three
times and reading it once: every coarser grain is derived from the
~1/60-sized previous grain, which is also exactly how a lake deployment
maintains materialized rollups (each grain is a table; the next grain's
job reads it, not the events). Correctness rests on aggregate
decomposability — count and sum re-aggregate losslessly
(sum-of-partial-sums); the float-sum reorder between the cascaded and
the direct computation is absorbed by the same round(2) emit contract
every oracle-checked aggregate in this repo uses.

The whole cascade is ONE events scan: the minute frame is staged with
the repo's lazy-localCheckpoint discipline and both coarser grains
re-aggregate it (hour) / its derivative (day) — without the stage the
declarative plan would re-derive minute aggregates from raw once per
grain (3 scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec


def cascade_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(grain, window_start, event_type, n_events, total_value) for
    minute/hour/day grains; hour and day are derived from the minute
    aggregates, never from raw events. Internal sums stay unrounded —
    rounding only at emit, so re-aggregation cannot compound rounding
    error. NULL timestamps form their own (NULL-bucket) group at every
    grain, mirroring the oracle's GROUP BY semantics."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    minute = (
        ev.groupBy(
            F.date_trunc("minute", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("_sv"))
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

    def emit(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "window_start",
            "event_type",
            "n_events",
            F.round("_sv", 2).alias("total_value"),
        )

    return (
        emit(minute, "minute")
        .unionByName(emit(hour, "hour"))
        .unionByName(emit(day, "day"))
    )


# Direct (non-cascaded) aggregation at every grain — equality proves
# the re-aggregation is lossless. CAST around sum(BIGINT): DuckDB
# widens to HUGEINT, the known pandas-float64 hash trap.
CASCADE_ROLLUP_ORACLE = """
SELECT 'minute' AS grain, date_trunc('minute', ts) AS window_start,
       event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'hour', date_trunc('hour', ts), event_type,
       count(*), round(sum(value), 2)
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', date_trunc('day', ts), event_type,
       count(*), round(sum(value), 2)
FROM events GROUP BY 2, 3
"""


QUERIES: list[QuerySpec] = []
