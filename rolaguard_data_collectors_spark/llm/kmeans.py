"""K-means (Lloyd) training over the embeddings table and the IVF
top-k search it powers — the iterative-algorithm pattern on Spark.

Shape per iteration: the k x dim centroid matrix is DRIVER data
(k*dim floats — the only thing collected), broadcast into the plan as
literal arrays; assignment is a JVM-side argmin over k squared-distance
expressions (``array_min`` on (dist, cid) structs — lexicographic
struct ordering gives min-dist, min-cid tiebreak, fully
deterministic); the re-estimation is one posexplode + groupBy
(cluster, dim) average — a single shuffle per iteration, map-side
partial aggregation, nothing quadratic. This is the standard
large-scale k-means recipe (same data flow as spark.ml's, kept
explicit and dependency-free).

Everything is deterministic: seeds are the hash-smallest vectors, all
arithmetic is fixed-order within aggregates at fixed partitioning...
floating sums across partitions can reorder, so centroid components
are rounded to 9 decimals after each collect — enough to absorb
reorder noise, fine for cluster geometry. ``ivf_topk`` with
``n_probe=k`` degenerates to exact search: tests pin equality with
the brute-force oracle-checked query.

Iterative algorithms are not expressible as one SQL statement, so this
stays driver-unregistered (like the reference's non-SQL surfaces);
tests/test_kmeans.py is its gate (inertia monotonicity, determinism,
exact-search degeneracy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..portable_sql import hex32


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy, like the quantizer import below: keeps this module free of
    # a module-level dependency on similarity
    from .similarity import finite_embeddings

    return finite_embeddings(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _assign(df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """vec rows + (cluster, sqdist) of the nearest centroid."""
    entries = []
    for cid, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with("v", lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        entries.append(F.struct(d.alias("d"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*entries))
    return df.select(
        "vec_id", "v",
        best.getField("cid").alias("cluster"),
        best.getField("d").alias("sqdist"),
    )


def kmeans_fit(spark: SparkSession, sf_dir: str, k: int = 8,
               iters: int = 5) -> tuple[list[list[float]], list[float]]:
    """Lloyd iterations; returns (centroids, inertia history). Seeds =
    embeddings of the k hash-smallest vec_ids (deterministic, spread
    by the uniform hash). Empty clusters keep their previous centroid."""
    df = _emb(spark, sf_dir)
    seeds = (
        df.withColumn("_h", F.expr(hex32("cast(vec_id as string)")))
        .orderBy("_h", "vec_id")
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in seeds]
    history: list[float] = []
    for _ in range(iters):
        assigned = _assign(df, centroids)
        stats = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        )
        # two actions per iteration over the same assign subplan
        # (re-estimation + inertia); a cluster run would cache assigned
        inertia = assigned.agg(F.sum("sqdist")).collect()[0][0]
        history.append(round(float(inertia), 6))
        rows = stats.collect()
        new_c = [list(c) for c in centroids]  # empty cluster -> keep old
        acc: dict[int, dict[int, tuple[float, int]]] = {}
        for r in rows:
            acc.setdefault(r["cluster"], {})[r["dim"]] = (r["s"], r["n"])
        for cid, dims in acc.items():
            new_c[cid] = [
                round(dims[d][0] / dims[d][1], 9) for d in sorted(dims)
            ]
        centroids = new_c
    return centroids, history


def assign_clusters(spark: SparkSession, sf_dir: str,
                    centroids: list[list[float]]) -> DataFrame:
    """(vec_id, cluster, sqdist) for every vector — the IVF posting
    lists. At scale this is written bucketed by cluster."""
    return _assign(_emb(spark, sf_dir), centroids).drop("v")


def persist_ivf_index(spark: SparkSession, sf_dir: str, path: str,
                      k: int = 8, iters: int = 5,
                      quantize: bool = False) -> list[list[float]]:
    """Train and WRITE the IVF index as a lake artifact:

    - ``<path>/centroids.parquet``: the k x dim codebook;
    - ``<path>/postings/cluster=N/``: per-cluster posting lists
      (vec_id, embedding), partitioned by cluster;
    - with ``quantize=True``: postings carry int8-range codes instead
      of float vectors plus ``<path>/scales.parquet`` (the per-dim
      max|x| codebook) — the IVF-PQ-lite shape, 4x fewer bytes per
      probed vector.

    The directory layout IS the index: ``partitionBy(cluster)`` turns
    an n_probe search into a PartitionFilter scan of n_probe
    directories — the reader never opens the other k - n_probe
    partitions (proven in tests/test_kmeans.py). This is the same
    write-time lever as plans/scale.write_partitioned, applied to
    ANN."""
    centroids = kmeans_fit(spark, sf_dir, k, iters)[0]
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(path + "/centroids.parquet")
    assigned = _assign(_emb(spark, sf_dir), centroids)
    if quantize:
        from .similarity import _quant_expr, embedding_scales

        scales = embedding_scales(spark, sf_dir)
        spark.createDataFrame(
            [(scales,)], "scales array<double>"
        ).write.mode("overwrite").parquet(path + "/scales.parquet")
        payload = assigned.select(
            "vec_id", _quant_expr("v", scales).alias("codes"), "cluster"
        )
    else:
        payload = assigned.select("vec_id", "v", "cluster")
    payload.write.mode("overwrite").partitionBy("cluster").parquet(
        path + "/postings"
    )
    return centroids


def ivf_index_topk(spark: SparkSession, path: str, query: list[float],
                   top_k: int = 10, n_probe: int = 2,
                   exclude_vec_id: int | None = None) -> DataFrame:
    """Search a persisted IVF index: rank the codebook driver-side
    (k x dim floats), then scan ONLY the n_probe nearest posting
    partitions (PartitionFilters at the reader). Float postings score
    exact cosine (matches ``ivf_topk`` over the same centroids
    exactly); quantized postings score the rescaled integer dot
    (matches ``similarity.cosine_topk_int8``'s ranking at
    n_probe=k)."""
    import math
    import os

    cent = {
        r["cluster"]: [float(x) for x in r["centroid"]]
        for r in spark.read.parquet(path + "/centroids.parquet").collect()
    }

    def sq(c):
        return sum((a - b) * (a - b) for a, b in zip(c, query))

    probe = sorted(cent, key=lambda i: (sq(cent[i]), i))[:n_probe]
    posts = spark.read.parquet(path + "/postings").filter(
        F.col("cluster").isin(probe)
    )
    if exclude_vec_id is not None:
        posts = posts.filter(F.col("vec_id") != exclude_vec_id)
    if os.path.exists(path + "/scales.parquet"):
        scales = [
            float(s)
            for s in spark.read.parquet(path + "/scales.parquet")
            .collect()[0]["scales"]
        ]
        q_codes = [
            0 if s == 0 else math.copysign(
                math.floor(abs(x) / s * 127 + 0.5), x
            )
            for x, s in zip(query, scales)
        ]
        arr = ", ".join(f"{(s / 127.0) * (s / 127.0)!r}D" for s in scales)
        qarr = ", ".join(str(int(c)) for c in q_codes)
        dot = F.expr(
            f"aggregate(zip_with(zip_with(codes, array({qarr}),"
            " (x, y) -> CAST(x AS DOUBLE) * y),"
            f" array({arr}), (p, w) -> p * w), 0D, (acc, v) -> acc + v)"
        )
        score = F.round(dot, 6).alias("cosine")
    else:
        qlit = F.array(*[F.lit(float(x)) for x in query])
        dot = F.aggregate(F.zip_with("v", qlit, lambda x, y: x * y),
                          F.lit(0.0), lambda a, z: a + z)
        nrm = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x),
                                 F.lit(0.0), lambda a, z: a + z))
        qn = math.sqrt(sum(x * x for x in query))
        score = F.round(dot / (nrm * F.lit(qn)), 6).alias("cosine")
    return (
        posts.select("vec_id", "cluster", score)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(top_k)
    )


def ivf_topk(spark: SparkSession, sf_dir: str, centroids: list[list[float]],
             query_vec_id: int = 0, top_k: int = 10,
             n_probe: int = 2) -> DataFrame:
    """IVF search with learned centroids: probe the ``n_probe``
    clusters nearest to the query, exact cosine inside them. With
    n_probe = k this is exactly brute force (tests pin it)."""
    df = _emb(spark, sf_dir)
    q = df.filter(F.col("vec_id") == query_vec_id).collect()[0]["v"]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    # driver-side probe selection: distances of k centroids to q
    import math

    def sq(c):
        return sum((a - b) * (a - b) for a, b in zip(c, q))

    probe = sorted(range(len(centroids)), key=lambda i: (sq(centroids[i]), i))
    probe = set(probe[:n_probe])
    assigned = _assign(df, centroids)
    dot = F.aggregate(F.zip_with("v", qlit, lambda x, y: x * y),
                      F.lit(0.0), lambda a, z: a + z)
    nrm = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x),
                             F.lit(0.0), lambda a, z: a + z))
    qn = math.sqrt(sum(x * x for x in q))
    cos = F.round(dot / (nrm * F.lit(qn)), 6)
    return (
        assigned.filter(F.col("cluster").isin(list(probe)))
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "cluster", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(top_k)
    )
