"""Scale toolkit (SURVEY.md §4, §6): the three layout levers that decide
whether the engine's joins and scans survive 100 TB.

The reference never needed any of this — it holds its whole state in one
process's dicts (DeviceMap, LoraServerIOCollector.py:83-90) and its
"table" is a RabbitMQ queue. On a cluster the equivalents are data
layout decisions, made once at write time and repaid on every query:

* **Bucketing** (`write_bucketed`): persist both sides of a recurring
  equi-join pre-hashed into the same number of buckets on the join key.
  Spark's scan then reports the bucket spec as its output partitioning
  and the sort-merge join runs with NO Exchange — the single biggest
  shuffle saving available for a fact-to-fact join (e.g. packets joined
  to devices_map snapshots on dev_eui, orders to lineitem on orderkey).

* **Skew salting** (`salted_join`): one hot key (a chatty gateway, a
  null dev_addr) puts an entire cluster behind one reducer. Salting
  fans the hot side's rows over N sub-keys and replicates the other
  side N times, bounding any reducer at 1/N of the hot key. AQE's
  skew-join handles moderate skew adaptively; explicit salting is for
  the pathological case AQE can't split (a single key larger than an
  executor).

* **Partitioned layout** (`write_partitioned`): time/tenant-partitioned
  parquet so predicates become PartitionFilters — a scan that touches
  the partitions the query names and nothing else. This is the batch
  analog of the reference's per-collector topic subscription.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on ``keys``.

    Two tables written with the same keys and bucket count join
    shuffle-free: each scan task reads exactly one bucket pair, already
    co-partitioned and (if ``sort_cols`` covers the keys) already
    sorted, so the SMJ needs neither Exchange nor Sort. Bucket count is
    a capacity decision: at 100 TB pick buckets so one bucket of the
    larger table fits an executor's memory (e.g. 4096), not the row
    count of the test fixture.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted over
    ``salts`` sub-keys and the right side replicated once per salt.

    Output equals ``left.join(right, on, how)`` row-for-row: every left
    row carries exactly one salt value and the replicated right side
    contains all of them, so each (key, salt) pair matches precisely the
    right rows the unsalted join would match. Cost: right side scanned
    into ``salts``x rows — use on dimension-sized right sides that are
    over the broadcast threshold but far below the fact table.

    The salt comes from monotonically_increasing_id, which embeds the
    runtime partition id — stable across a TASK retry of a
    deterministic-order source, but not across a re-plan that changes
    upstream partitioning. That is fine HERE because correctness never
    depends on which salt a row gets (the right side carries every
    salt; see the row-for-row argument above) — the salt only spreads
    a hot key across reducers. Do not copy this construct into logic
    whose OUTPUT depends on the partition-derived value (see
    llm/curate.pack_token_shards for that lesson: bucket by a
    value-derived hash instead).
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    salted_left = left.withColumn(SALT_COL, salt.cast("int"))
    replicated_right = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return salted_left.join(replicated_right, keys + [SALT_COL], how).drop(SALT_COL)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet (one dir level per column value).

    Queries filtering on ``partition_cols`` scan only the matching
    directories (PartitionFilters), so a day query over a years-deep
    packet archive reads one day. Keep partition cardinality bounded
    (date, collector id — never dev_eui): each value is a directory,
    and millions of tiny files cost more than they prune.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def detect_skew(df, key: str, top: int = 10, counters: int = 500):
    """Pre-join skew diagnosis: the share of rows held by each of the
    hottest join keys, computed with the bounded-memory heavy-hitter
    operator (llm/text.heavy_hitters — O(counters) executor memory, so
    it is safe to run on the 100 TB fact table you are ABOUT to join,
    unlike a full groupBy on the key). Returns (key, freq, rank,
    share, skewed) where ``skewed`` flags keys holding more than
    2x a fair partition's share under the session's shuffle
    partitioning — the keys to route through salted_join (or AQE's
    skew-join splitting)."""
    from pyspark.sql import functions as F

    from ..llm.text import heavy_hitters

    spark = df.sparkSession
    n = df.count()
    from ..catalog import compute_parallelism

    n_part = compute_parallelism(spark)
    hh = heavy_hitters(
        df.select(F.col(key).cast("string").alias("k")), "k", k=top,
        counters=counters,
    )
    fair = 1.0 / max(n_part, 1)
    return hh.select(
        F.col("k").alias(key),
        "freq",
        "rank",
        F.round(F.col("freq") / F.lit(float(n)), 6).alias("share"),
        (F.col("freq") / F.lit(float(n)) > 2 * fair).alias("skewed"),
    )
