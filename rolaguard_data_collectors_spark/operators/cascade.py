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

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..commitlog import append_commit_line
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


# --- persisted continuous-aggregate maintenance (round 9) ----------------
#
# The operational flow behind cascade_rollup: each grain lives as a
# parquet table partitioned by DAY, and a micro-batch append rewrites
# ONLY the day partitions it touches — merge the batch's minute
# partials into the touched minute partitions, then re-derive the same
# days' hour and day partitions from the UPDATED minute/hour tables.
# Day-partition locality holds at every grain because UTC date_trunc
# windows never span a day boundary. Decimal sums make the incremental
# result BIT-IDENTICAL to a full recompute (no float reassociation
# drift across merge generations) — proven in tests/test_cascade.py,
# along with untouched partitions keeping their exact files.

# Partition column: day of window_start; NULL-timestamp buckets get an
# explicit sentinel so they live in a normal readable partition rather
# than Hive's default-partition spelling.
_NULL_DAY = "__null__"


def _with_day(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "_d",
        F.coalesce(
            F.date_format(F.date_trunc("day", "window_start"), "yyyy-MM-dd"),
            F.lit(_NULL_DAY),
        ),
    )


def persist_cascade(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Write the three grain tables as day-partitioned parquet — the
    lake artifact cascade_append maintains."""
    for grain, df in cascade_grains(spark, sf_dir).items():
        _with_day(df).write.mode("overwrite").partitionBy("_d").parquet(
            f"{path}/{grain}"
        )


def read_grain(spark: SparkSession, path: str, grain: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{grain}").drop("_d")


def _stage_batch(spark: SparkSession, batch_df: DataFrame, edir: str,
                 live_root: str) -> list[str]:
    """Compute the complete POST-state of every day partition the
    batch touches, at all three grains, into ``edir``: minute merged
    from the LIVE minute table + the batch partials, hour re-derived
    from the STAGED minute, day from the staged hour. Returns the
    touched day keys, sorted. O(batch) + O(touched days), never
    O(table): the live read is a PartitionFilters scan of the touched
    directories only (verified against the plan), and the one eager
    checkpoint is bounded by the batch's minute-group count."""
    ev = batch_df.select("ts", "event_type", "value")
    batch_minute = _with_day(
        ev.groupBy(
            F.date_trunc("minute", "ts").alias("window_start"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(VALUE_DECIMAL)).alias("_sv"),
        )
    ).localCheckpoint()
    touched = sorted(
        r["_d"] for r in batch_minute.select("_d").distinct().collect()
    )
    if not touched:
        return touched
    live_minute = os.path.join(live_root, "minute")
    merged = batch_minute
    # content check, not isdir (round-9 review fix): expire_partitions
    # can legitimately empty the table, leaving a partition-less
    # directory that spark.read.parquet cannot infer a schema from —
    # which would wedge every replay of the next epoch.
    has_live = os.path.isdir(live_minute) and any(
        x.startswith("_d=") for x in os.listdir(live_minute)
    )
    if has_live:
        merged = spark.read.parquet(live_minute).where(
            F.col("_d").isin(touched)
        ).unionByName(batch_minute)
    merged = merged.groupBy("window_start", "event_type", "_d").agg(
        F.sum("n_events").alias("n_events"), F.sum("_sv").alias("_sv")
    )
    merged.write.mode("overwrite").partitionBy("_d").parquet(
        os.path.join(edir, "minute")
    )
    for src, dst, trunc in (("minute", "hour", "hour"), ("hour", "day", "day")):
        upd = (
            spark.read.parquet(os.path.join(edir, src))
            .groupBy(
                F.date_trunc(trunc, "window_start").alias("window_start"),
                "event_type",
                "_d",
            )
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("_sv").alias("_sv"))
        )
        upd.write.mode("overwrite").partitionBy("_d").parquet(
            os.path.join(edir, dst)
        )
    return touched


def _swap_staged(edir: str, live_root: str,
                 grains: tuple[str, ...] = ("minute", "hour", "day")) -> None:
    """Move each staged ``_d=`` directory over its live counterpart.
    Idempotent: re-running after a crash mid-swap finishes the
    partitions still present in the scratch (already-swapped ones are
    gone from it), and the staged content is the correct post-state
    regardless of which swaps already happened."""
    for grain in grains:
        gdir = os.path.join(edir, grain)
        if not os.path.isdir(gdir):
            continue
        live = os.path.join(live_root, grain)
        os.makedirs(live, exist_ok=True)
        for part in os.listdir(gdir):
            if not part.startswith("_d="):
                continue
            target = os.path.join(live, part)
            shutil.rmtree(target, ignore_errors=True)
            os.rename(os.path.join(gdir, part), target)


def cascade_append(spark: SparkSession, path: str,
                   new_events: DataFrame) -> list[str]:
    """Merge a micro-batch of events into the persisted cascade —
    the one-shot batch-backfill flow (for exactly-once streaming
    maintenance use CascadeMaintenanceSink, which adds the epoch
    commit log on the same stage/swap). Stages the touched partitions'
    post-state into a scratch dir first, then swaps — a crash before
    the swap leaves the live tables untouched; untouched partitions
    keep their exact files. Returns the touched day keys, sorted."""
    edir = os.path.join(path, "_stage_tmp")
    shutil.rmtree(edir, ignore_errors=True)
    touched = _stage_batch(spark, new_events, edir, path)
    _swap_staged(edir, path)
    shutil.rmtree(edir, ignore_errors=True)
    return touched


class CascadeMaintenanceSink:
    """foreachBatch target: EXACTLY-ONCE continuous-aggregate
    maintenance over the persisted grain tables, on plain parquet.

    cascade_append's merge is not idempotent (replaying a micro-batch
    double-counts), and Structured Streaming replays the last epoch
    after any restart — so the sink uses a stage/swap/commit protocol
    (the merge-sink analogue of QueueFileSink's truncate-to-offset):

    1. STAGE: compute the complete POST-state of every touched day
       partition at all three grains into ``<path>/_epochs/epoch=N/``
       — minute merged from the LIVE minute table + the batch, hour
       re-derived from the STAGED minute, day from the staged hour —
       then publish a ``_STAGED`` marker (temp+rename). The live
       tables are never read after the marker exists, and never
       written before it does.
    2. SWAP: move each staged ``_d=`` directory over its live
       counterpart (rmtree+rename per partition). Idempotent: a
       replay after a crash mid-swap finishes the remaining staged
       partitions (already-swapped ones are simply gone from scratch).
    3. COMMIT: append the epoch id to ``<path>/_commits`` (fsync),
       then clear the scratch. A committed epoch is skipped on
       replay; a torn commit line parses as absent and the epoch
       re-swaps idempotently.

    Crash-window audit: before the marker -> live untouched, replay
    recomputes the stage from live; mid-swap -> marker present, replay
    redoes the swap from the surviving staged partitions (their
    content is the correct post-state regardless of which swaps
    already happened); between commit and scratch-clear -> epoch
    skipped, stale scratch cleared at the next epoch's entry (the
    round-8 queue-sink lesson)."""

    GRAINS = ("minute", "hour", "day")

    def __init__(self, path: str):
        self.path = path
        self.commit_path = os.path.join(path, "_commits")
        self.epoch_root = os.path.join(path, "_epochs")

    def _commits(self) -> set[int]:
        done: set[int] = set()
        if not os.path.exists(self.commit_path):
            return done
        with open(self.commit_path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    done.add(int(line))
                except ValueError:
                    continue  # torn write: treat as uncommitted
        return done

    def _stage(self, spark: SparkSession, batch_df: DataFrame,
               edir: str) -> None:
        _stage_batch(spark, batch_df, edir, self.path)

    def _swap(self, edir: str) -> None:
        _swap_staged(edir, self.path, self.GRAINS)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        epoch = int(epoch_id)
        if epoch in self._commits():
            return
        os.makedirs(self.epoch_root, exist_ok=True)
        edir = os.path.join(self.epoch_root, f"epoch={epoch}")
        for d in os.listdir(self.epoch_root):  # stale crashed attempts
            if d != f"epoch={epoch}":
                shutil.rmtree(os.path.join(self.epoch_root, d),
                              ignore_errors=True)
        marker = os.path.join(edir, "_STAGED")
        if not os.path.exists(marker):
            shutil.rmtree(edir, ignore_errors=True)
            self._stage(batch_df.sparkSession, batch_df, edir)
            os.makedirs(edir, exist_ok=True)
            tmp = marker + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write("staged\n")
            os.replace(tmp, marker)
        self._swap(edir)
        # torn-previous-line self-healing append (see commitlog.py):
        # a bare append after a torn commit would concatenate epochs
        # ('7' + '8\n' -> '78\n') and later silently SKIP real epoch 78.
        # A torn line that parses as a bare int is safe to accept as
        # committed: epochs are monotone, the commit is written only
        # after the swap completed, and any torn prefix of epoch N
        # parses as some already-committed earlier epoch.
        append_commit_line(self.commit_path, str(epoch))
        shutil.rmtree(edir, ignore_errors=True)


def start_cascade_maintenance(events: DataFrame, path: str,
                              checkpoint: str, trigger_seconds: int = 1):
    """writeStream wiring: a (ts, event_type, value) event stream
    maintains the persisted grain tables exactly-once per micro-batch."""
    return (
        events.writeStream.outputMode("append")
        .foreachBatch(CascadeMaintenanceSink(path))
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
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
