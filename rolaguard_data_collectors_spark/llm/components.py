"""Transitive near-dup clustering: connected components over the LSH
candidate graph — the step between pair generation and corpus dedup.

``ngram_jaccard_dedup`` points each doc at its smallest bucket
representative, but transitive chains (A~B in band 0, B~C in band 2)
stay split across two rows with different reps. Corpus-level dedup
needs the CONNECTED COMPONENT: one cluster id per transitively-linked
group, one survivor per cluster.

Scale shape (the part that must survive 100 TB):

- Edges are STAR edges, never pairs: per (band, bucket) every member
  links to the bucket's min doc_id — O(members) edges per bucket where
  all-pairs is O(members²). Same spanning connectivity.
- Labels converge by min-label propagation ("hash-to-min", Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14): each
  round every vertex takes the min label over itself and its
  neighbors, propagated BOTH directions along each edge. Star-shaped
  buckets converge in O(log d) rounds (d = component diameter in
  buckets); real dup clusters are shallow, so 3-5 rounds.
- Per round: one groupBy shuffle over the edge list + one join back —
  both partitioned by vertex id, map-side combine on the min. The
  driver sees only the converged/changed COUNT (one scalar), never
  labels.
- ``localCheckpoint`` each round cuts the lineage: without it the plan
  doubles per iteration and Catalyst analysis time dominates by round
  8 (the classic iterative-DataFrame trap).

Iterative fixpoints are not one SQL statement, so this module is
driver-unregistered like kmeans; tests/test_components.py pins it
against a driver-side union-find oracle on the same edges.

(Round 5 measured the registration alternative and rejected it: a
recursive-CTE transitive-closure oracle DOES hash-match this operator
exactly at every SF, but closure is O(sum of component^2) rows and the
dup-heavy corpus makes DuckDB pay ~38 s per run at sf0.1 — 90 s of
bench wall for coverage the union-find pytest oracle already provides.
The contracted rep-graph closure would fix the oracle cost; not worth
the complexity while the driver gate is already 50/50.)

Reference parity note: the reference engine has no graph surface —
this is part of the LLM-corpus extension (brief: dedup as first-class
components), not a ported operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _band_assignments, minhash_signatures


def candidate_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) star edges from the LSH band buckets: every bucket
    member -> the bucket's min doc_id. src > dst always; singleton
    buckets contribute nothing. Deduplicated across bands."""
    assign = _band_assignments(minhash_signatures(spark, sf_dir))
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    return (
        assign.withColumn("dst", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("dst"))
        .select(F.col("doc_id").alias("src"), "dst")
        .distinct()
    )


def connected_components(
    edges: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Min-label propagation to a fixpoint. Input: (src, dst) edges.
    Output: (doc_id, cluster_id) for every vertex that appears in an
    edge, cluster_id = min doc_id of its component.

    Each round: half-edges in both directions, min neighbor label per
    vertex, take it if smaller. Stops when no label changed (checked
    with ONE aggregate — the only driver-visible value per round)."""
    spark = edges.sparkSession
    edges = edges.select("src", "dst").localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .union(edges.select(F.col("dst").alias("doc_id")))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    half = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    for _ in range(max_iters):
        # min label among neighbors, per vertex
        neigh = (
            half.join(labels, half.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neigh, labels.doc_id == neigh.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.coalesce("nbr_min", F.col("cluster_id")) < F.col("cluster_id"))
                .cast("int")
                .alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.agg(F.sum("_chg")).collect()[0][0] or 0
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels


def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every doc in a multi-doc near-dup
    component; cluster_id = the component's min doc_id (its survivor).
    Docs in no candidate bucket are implicitly their own cluster and
    are omitted (at 100 TB you anti-join the drop list, never
    materialize the identity rows)."""
    return connected_components(candidate_edges(spark, sf_dir))


def cluster_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per component: size and survivor — the dedup ledger."""
    return (
        near_dup_clusters(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_docs"))
        .withColumnRenamed("cluster_id", "survivor_doc_id")
    )
