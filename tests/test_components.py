"""Connected-components near-dup clustering (llm/components.py):
pinned against a driver-side union-find over the SAME edge list, plus
structural invariants (cluster_id is the component min, star edges are
src>dst, convergence under permuted edge order)."""

from __future__ import annotations

from rolaguard_data_collectors_spark.llm.components import (
    candidate_edges,
    cluster_summary,
    connected_components,
    near_dup_clusters,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the true min root
    return {x: find(x) for x in parent}


def test_star_edges_shape(spark, sf_dir):
    e = candidate_edges(spark, sf_dir)
    rows = e.collect()
    assert len(rows) > 0
    assert all(r.src > r.dst for r in rows)  # always point at the bucket min
    assert len(rows) == len({(r.src, r.dst) for r in rows})  # distinct


def test_clusters_match_union_find(spark, sf_dir):
    edges = [(r.src, r.dst) for r in candidate_edges(spark, sf_dir).collect()]
    want = _union_find(edges)
    got = {
        r.doc_id: r.cluster_id for r in near_dup_clusters(spark, sf_dir).collect()
    }
    assert got == want


def test_cluster_id_is_component_min(spark, sf_dir):
    labels = near_dup_clusters(spark, sf_dir).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in labels:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members)
        assert len(members) >= 2  # singletons are omitted by design


def test_propagation_handles_chains(spark):
    # A path graph is the worst case for one-hop propagation:
    # 5-4-3-2-1-0 must all collapse to 0 (requires multiple rounds).
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(5)], "src long, dst long"
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(edges).collect()
    }
    assert got == {i: 0 for i in range(6)}


def test_unconverged_fixpoint_raises_named_error(spark):
    """Round-10 ADVICE fix: exhausting max_iters with labels still
    moving must raise, not return unconverged labels that downstream
    consumers would mistake for a correct dedup ledger."""
    import pytest

    # Path graph of diameter 8 needs ~8 propagation rounds; cap at 3.
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(8)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="still changing"):
        connected_components(edges, max_iters=3)


def test_oracle_depth_guard_raises_named_error(spark):
    """Round-10 verdict fix: a corpus whose component diameter needs
    more propagation rounds than the fixed-K SQL oracle runs must fail
    with a NAMED error at query build, not a bare driver hash mismatch.
    Chain of diameter 15 > ORACLE_ROUNDS=10 but < max_iters=20."""
    import pytest

    from rolaguard_data_collectors_spark.llm.components import (
        ORACLE_ROUNDS,
        _clusters_within_oracle_depth,
    )

    depth = ORACLE_ROUNDS + 5
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(depth)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="ORACLE_ROUNDS"):
        _clusters_within_oracle_depth(edges)
    # Sanity: same chain converges fine without the oracle bound.
    got = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(depth + 1)}


def test_convergence_depth_within_oracle_rounds(spark, sf_dir):
    """The driver oracle runs a FIXED ORACLE_ROUNDS of propagation;
    equality with the converged Spark fixpoint requires convergence in
    <= ORACLE_ROUNDS. Assert the measured depth stays under HALF of it
    so data drift has margin before the oracle would silently lag."""
    from rolaguard_data_collectors_spark.llm.components import ORACLE_ROUNDS

    stats: dict = {}
    connected_components(candidate_edges(spark, sf_dir), stats=stats).count()
    assert 1 <= stats["rounds"] <= ORACLE_ROUNDS // 2, stats


def test_oracle_rounds_parity_sf001(spark):
    """Full tagged-union parity (verify + member + cluster legs)
    against the fixed-K SQL oracle at sf0.001 — the same compare the
    driver runs at sf0.01."""
    import duckdb

    from rolaguard_data_collectors_spark.llm.components import (
        NGRAM_JACCARD_CLUSTERS_ORACLE,
        ngram_jaccard_with_clusters,
    )
    from rolaguard_data_collectors_spark.oracle import compare

    sfd = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sfd}/documents.parquet'"
    )
    r = compare(
        "ngram_jaccard_clusters",
        ngram_jaccard_with_clusters(spark, sfd),
        NGRAM_JACCARD_CLUSTERS_ORACLE,
        con,
    )
    assert r.ok and r.exact_match and r.dtypes_match, (r.detail, r.dtype_skews)


def test_fixpoint_under_reliable_checkpoint(spark, sf_dir, tmp_path):
    """With a reliable checkpoint directory configured (the standard
    iterative-job deployment step on a real cluster), the loop stages
    through true checkpoints instead of executor-pinned
    localCheckpoint — same labels, and the checkpoint dir actually
    received data (the mode switch engaged)."""
    import os

    ckpt = str(tmp_path / "reliable_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        got = {
            r.doc_id: r.cluster_id
            for r in near_dup_clusters(spark, sf_dir).collect()
        }
    finally:
        spark.sparkContext.setCheckpointDir(None)
    edges = [(r.src, r.dst) for r in candidate_edges(spark, sf_dir).collect()]
    assert got == _union_find(edges)
    assert any(files for _, _, files in os.walk(ckpt)), "checkpoint unused"


def test_incremental_components_equal_full_fixpoint(spark, sf_dir):
    """Round-10 verdict item #4: appending a batch of docs and merging
    only the batch's star edges (anchored on the persisted bucket-min
    table) into the previous converged labels must equal the full
    fixpoint over the merged corpus — and the anchor table's own
    incremental update must equal a rebuild."""
    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.llm.components import (
        bucket_mins,
        incremental_candidate_edges,
        incremental_components,
        merge_bucket_mins,
    )
    from rolaguard_data_collectors_spark.llm.dedup import (
        _band_assignments,
        minhash_signatures,
    )

    assign = _band_assignments(
        minhash_signatures(spark, sf_dir)
    ).localCheckpoint()
    old_assign = assign.where(F.col("doc_id") % 4 != 0)
    new_assign = assign.where(F.col("doc_id") % 4 == 0)
    assert new_assign.count() > 0

    prev = connected_components(candidate_edges(spark, sf_dir, assign=old_assign))
    old_mins = bucket_mins(old_assign).localCheckpoint()

    stats: dict = {}
    inc = incremental_components(
        prev,
        incremental_candidate_edges(new_assign, old_mins),
        stats=stats,
    )
    got = {r.doc_id: r.cluster_id for r in inc.collect()}
    full = connected_components(candidate_edges(spark, sf_dir, assign=assign))
    want = {r.doc_id: r.cluster_id for r in full.collect()}
    assert got == want
    assert stats["rounds"] >= 1

    mins_inc = {
        (r["band"], r["bucket"]): r["min_doc"]
        for r in merge_bucket_mins(old_mins, new_assign).collect()
    }
    mins_full = {
        (r["band"], r["bucket"]): r["min_doc"]
        for r in bucket_mins(assign).collect()
    }
    assert mins_inc == mins_full


def test_incremental_components_synthetic_cases(spark):
    """Hand-built merge cases: a new edge BRIDGING two old components,
    a brand-new doc with a smaller id than the old min (labels must
    move to it), a fresh-only component, and an edge internal to an
    old component (no-op)."""
    from rolaguard_data_collectors_spark.llm.components import (
        incremental_components,
    )

    # old graph: {1,5,7} labelled 1; {2,8} labelled 2; {10,11} labelled 10
    prev = spark.createDataFrame(
        [(1, 1), (5, 1), (7, 1), (2, 2), (8, 2), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    new_edges = spark.createDataFrame(
        [
            (7, 2),    # bridges comps 1 and 2 -> all label 1
            (5, 0),    # fresh doc 0, smaller than old min -> label 0
            (21, 20),  # fresh-only component
            (11, 10),  # internal to comp 10: no-op
        ],
        "src long, dst long",
    )
    got = {
        r.doc_id: r.cluster_id
        for r in incremental_components(prev, new_edges).collect()
    }
    assert got == {
        0: 0, 1: 0, 5: 0, 7: 0, 2: 0, 8: 0,   # merged through 7-2 and 5-0
        10: 10, 11: 10,                        # untouched
        20: 20, 21: 20,                        # fresh component
    }


def _split_docs(spark, sf_dir, tmp_path):
    """documents split: old slice written as its own corpus dir (the
    ledger build input), new slice returned as the append batch."""
    import os

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    old_dir = str(tmp_path / "old_corpus")
    os.makedirs(old_dir)
    old.toPandas().to_parquet(
        os.path.join(old_dir, "documents.parquet"), index=False
    )
    return old_dir, new


def _full_ledger_truth(spark, sf_dir):
    from rolaguard_data_collectors_spark.llm.components import bucket_mins
    from rolaguard_data_collectors_spark.llm.dedup import (
        _band_assignments,
        minhash_signatures,
    )

    assign = _band_assignments(
        minhash_signatures(spark, sf_dir)
    ).localCheckpoint()
    labels = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            candidate_edges(spark, sf_dir, assign=assign)
        ).collect()
    }
    mins = {
        (r["band"], r["bucket"]): r["min_doc"]
        for r in bucket_mins(assign).collect()
    }
    return labels, mins


def test_ledger_append_matches_full_rebuild(spark, sf_dir, tmp_path):
    """Round 10: the persisted near-dup ledger (bucket-partitioned
    labels + anchors) merged with a doc batch via ledger_append equals
    a full rebuild over the merged corpus — labels AND anchors."""
    from rolaguard_data_collectors_spark.llm.components import (
        ledger_append,
        persist_near_dup_ledger,
        read_ledger_labels,
        read_ledger_mins,
    )

    old_dir, new = _split_docs(spark, sf_dir, tmp_path)
    path = str(tmp_path / "ledger")
    persist_near_dup_ledger(spark, old_dir, path, n_buckets=8)
    ledger_append(spark, path, new)

    want_labels, want_mins = _full_ledger_truth(spark, sf_dir)
    rows = read_ledger_labels(spark, path).collect()
    got_labels = {r.doc_id: r.cluster_id for r in rows}
    # duplicate doc_ids (a stale bucket surviving next to the
    # re-labelled copy) must fail loudly, not hide in dict overwrite
    assert len(rows) == len(got_labels)
    mrows = read_ledger_mins(spark, path).collect()
    got_mins = {(r["band"], r["bucket"]): r["min_doc"] for r in mrows}
    assert len(mrows) == len(got_mins)
    assert got_labels == want_labels
    assert got_mins == want_mins


def test_ledger_sink_exactly_once_and_crash_replay(spark, sf_dir, tmp_path):
    """NearDupLedgerSink: committed-epoch replay is a no-op; a crash
    MID-SWAP (one staged bucket moved, the rest still in scratch)
    replays to the exact full-rebuild state; two epochs of batches end
    at the merged-corpus fixpoint."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.llm.components import (
        NearDupLedgerSink,
        persist_near_dup_ledger,
        read_ledger_labels,
    )

    old_dir, new = _split_docs(spark, sf_dir, tmp_path)
    path = str(tmp_path / "ledger_sink")
    persist_near_dup_ledger(spark, old_dir, path, n_buckets=8)
    b0 = new.where(F.col("doc_id") % 8 == 0)
    b1 = new.where(F.col("doc_id") % 8 != 0)

    sink = NearDupLedgerSink(path)
    sink(b0, 0)
    snap0 = sorted(
        (r.doc_id, r.cluster_id)
        for r in read_ledger_labels(spark, path).collect()
    )
    sink(b0, 0)  # restart replay of a committed epoch
    assert sorted(
        (r.doc_id, r.cluster_id)
        for r in read_ledger_labels(spark, path).collect()
    ) == snap0

    class Boom(Exception):
        pass

    class CrashMidSwap(NearDupLedgerSink):
        def _swap(self, edir):
            gdir = os.path.join(edir, "labels")
            staged = sorted(
                d for d in os.listdir(gdir) if d.startswith("_cb=")
            )
            if staged:  # move ONE bucket, then die
                live = os.path.join(self.path, "labels", staged[0])
                import shutil as _sh

                _sh.rmtree(live, ignore_errors=True)
                os.rename(os.path.join(gdir, staged[0]), live)
            raise Boom()

    with pytest.raises(Boom):
        CrashMidSwap(path)(b1, 1)
    sink(b1, 1)  # replay finishes the swap from the surviving scratch
    assert sink._commits() == {0, 1}

    want_labels, _ = _full_ledger_truth(spark, sf_dir)
    rows = read_ledger_labels(spark, path).collect()
    got = {r.doc_id: r.cluster_id for r in rows}
    assert len(rows) == len(got)  # no duplicate doc_ids across buckets
    assert got == want_labels


def _ledger_snapshot(spark, path):
    from rolaguard_data_collectors_spark.llm.components import (
        read_ledger_assign,
        read_ledger_labels,
        read_ledger_mins,
    )

    labels = sorted(
        (r.doc_id, r.cluster_id)
        for r in read_ledger_labels(spark, path).collect()
    )
    mins = sorted(
        (r["band"], r["bucket"], r["min_doc"])
        for r in read_ledger_mins(spark, path).collect()
    )
    assign = sorted(
        (r["band"], r["bucket"], r["doc_id"])
        for r in read_ledger_assign(spark, path).collect()
    )
    return labels, mins, assign


def test_ledger_retract_matches_full_rebuild(spark, sf_dir, tmp_path):
    """Round 10: retracting a doc slice from the maintained ledger
    equals a full rebuild over the surviving corpus — labels, anchors
    AND the assignments table (the retraction's own source of truth)."""
    import os

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.catalog import load_table
    from rolaguard_data_collectors_spark.llm.components import (
        ledger_retract,
        persist_near_dup_ledger,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doomed = docs.where(F.col("doc_id") % 7 == 2).select("doc_id")
    assert doomed.count() > 0
    path = str(tmp_path / "ledger")
    persist_near_dup_ledger(spark, sf_dir, path, n_buckets=8)
    ledger_retract(spark, path, doomed)

    surv_dir = str(tmp_path / "surv")
    os.makedirs(surv_dir)
    docs.where(F.col("doc_id") % 7 != 2).toPandas().to_parquet(
        os.path.join(surv_dir, "documents.parquet"), index=False
    )
    truth = str(tmp_path / "truth")
    persist_near_dup_ledger(spark, surv_dir, truth, n_buckets=8)
    got = _ledger_snapshot(spark, path)
    want = _ledger_snapshot(spark, truth)
    assert got[0] == want[0], "labels diverge"
    assert got[1] == want[1], "anchors diverge"
    assert got[2] == want[2], "assignments diverge"
    assert not os.path.exists(os.path.join(path, "_stage_tmp"))


def test_ledger_retract_roundtrip_component_and_unknown(
    spark, sf_dir, tmp_path
):
    """(a) retract(B) then append(B) restores the exact pre-state of
    all three tables (mutation = retract+append is legal); (b)
    retracting an ENTIRE component removes all its label rows; (c)
    retracting unknown ids is a bit-exact no-op."""
    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.catalog import load_table
    from rolaguard_data_collectors_spark.llm.components import (
        ledger_append,
        ledger_retract,
        persist_near_dup_ledger,
        read_ledger_labels,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "ledger_rt")
    persist_near_dup_ledger(spark, sf_dir, path, n_buckets=8)
    before = _ledger_snapshot(spark, path)

    # (c) unknown ids: no-op
    ledger_retract(
        spark, path,
        spark.createDataFrame([(10**12,), (10**12 + 1,)], "doc_id long"),
    )
    assert _ledger_snapshot(spark, path) == before

    # (a) roundtrip a slice
    doomed_ids = [r.doc_id for r in read_ledger_labels(spark, path)
                  .where(F.col("doc_id") % 11 == 3).collect()][:20]
    assert doomed_ids
    ledger_retract(
        spark, path,
        spark.createDataFrame([(i,) for i in doomed_ids], "doc_id long"),
    )
    mid = _ledger_snapshot(spark, path)
    assert mid != before
    assert not any(d in {x for x, _ in mid[0]} for d in doomed_ids)
    ledger_append(spark, path, docs.where(F.col("doc_id").isin(doomed_ids)))
    assert _ledger_snapshot(spark, path) == before

    # (b) an entire component vanishes from the label table
    labels = read_ledger_labels(spark, path).collect()
    by_comp: dict = {}
    for r in labels:
        by_comp.setdefault(r.cluster_id, []).append(r.doc_id)
    comp = min(by_comp, key=lambda c: len(by_comp[c]))
    ledger_retract(
        spark, path,
        spark.createDataFrame([(i,) for i in by_comp[comp]], "doc_id long"),
    )
    left = {r.doc_id for r in read_ledger_labels(spark, path).collect()}
    assert not (left & set(by_comp[comp]))
    # at small SFs the whole corpus can be ONE component — the readers
    # and the append path must survive a fully-drained ledger, and
    # re-appending the retracted docs rebuilds the exact prior state
    ledger_retract(
        spark, path,
        spark.createDataFrame(
            [(i,) for i in sorted(set(by_comp[comp]))], "doc_id long"
        ),
    )  # re-retract of already-gone ids: bit-exact no-op
    ledger_append(
        spark, path, docs.where(F.col("doc_id").isin(by_comp[comp]))
    )
    assert _ledger_snapshot(spark, path) == before


def test_ledger_retract_sink_exactly_once_and_crash_replay(
    spark, sf_dir, tmp_path
):
    """The retraction STREAM: separate commit log from the append
    sink, committed-epoch replay no-op, crash mid-swap replays to the
    full-rebuild state."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.catalog import load_table
    from rolaguard_data_collectors_spark.llm.components import (
        NearDupLedgerSink,
        persist_near_dup_ledger,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "ledger_rsink")
    persist_near_dup_ledger(spark, sf_dir, path, n_buckets=8)
    doomed = docs.where(F.col("doc_id") % 9 == 4).select("doc_id")

    class Boom(Exception):
        pass

    class CrashMidSwap(NearDupLedgerSink):
        def _swap(self, edir):
            gdir = os.path.join(edir, "labels")
            staged = sorted(
                d for d in (os.listdir(gdir) if os.path.isdir(gdir) else [])
                if d.startswith("_cb=")
            )
            if staged:
                import shutil as _sh

                live = os.path.join(self.path, "labels", staged[0])
                _sh.rmtree(live, ignore_errors=True)
                os.rename(os.path.join(gdir, staged[0]), live)
            raise Boom()

    with pytest.raises(Boom):
        CrashMidSwap(path, mode="retract")(doomed, 0)
    sink = NearDupLedgerSink(path, mode="retract")
    sink(doomed, 0)  # replay finishes the swap
    after = _ledger_snapshot(spark, path)
    sink(doomed, 0)  # committed: no double retraction
    assert _ledger_snapshot(spark, path) == after
    # append-direction log untouched by retract epochs
    assert NearDupLedgerSink(path)._commits() == set()

    surv_dir = str(tmp_path / "surv")
    os.makedirs(surv_dir)
    docs.where(F.col("doc_id") % 9 != 4).toPandas().to_parquet(
        os.path.join(surv_dir, "documents.parquet"), index=False
    )
    truth = str(tmp_path / "truth")
    from rolaguard_data_collectors_spark.llm.components import (
        persist_near_dup_ledger as persist2,
    )

    persist2(spark, surv_dir, truth, n_buckets=8)
    assert after == _ledger_snapshot(spark, truth)


import pytest as _pytest


@_pytest.mark.parametrize("layout", ["hive", "snapshot"])
def test_ledger_random_op_sequence_matches_rebuild(spark, sf_dir, tmp_path,
                                                   layout):
    """Seeded random interleaving of appends and retractions (with
    re-appends of previously retracted docs and a sprinkling of
    unknown ids): after every sequence the ledger must equal a fresh
    build over exactly the currently-present docs — the maintained
    artifact can never drift from its declarative definition. Runs on
    BOTH layouts: the snapshot leg additionally proves version-commit
    publishing never drifts under arbitrary op interleavings."""
    import os
    import random

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.catalog import load_table
    from rolaguard_data_collectors_spark.llm.components import (
        ledger_append,
        ledger_retract,
        persist_near_dup_ledger,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    all_ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    rng = random.Random(7)
    present = set(rng.sample(all_ids, len(all_ids) // 2))
    absent = set(all_ids) - present

    start_dir = str(tmp_path / "start")
    os.makedirs(start_dir)
    docs.where(F.col("doc_id").isin(sorted(present))).toPandas().to_parquet(
        os.path.join(start_dir, "documents.parquet"), index=False
    )
    path = str(tmp_path / "ledger")
    persist_near_dup_ledger(spark, start_dir, path, n_buckets=8,
                            layout=layout)

    for step in range(6):
        if (rng.random() < 0.5 and absent) or not present:
            batch = set(rng.sample(sorted(absent), min(40, len(absent))))
            ledger_append(
                spark, path, docs.where(F.col("doc_id").isin(sorted(batch)))
            )
            present |= batch
            absent -= batch
        else:
            batch = set(rng.sample(sorted(present), min(40, len(present))))
            ids = sorted(batch) + [10**12 + step]  # plus an unknown id
            ledger_retract(
                spark, path,
                spark.createDataFrame([(i,) for i in ids], "doc_id long"),
            )
            present -= batch
            absent |= batch

    truth_dir = str(tmp_path / "truth_corpus")
    os.makedirs(truth_dir)
    docs.where(F.col("doc_id").isin(sorted(present))).toPandas().to_parquet(
        os.path.join(truth_dir, "documents.parquet"), index=False
    )
    truth = str(tmp_path / "truth")
    persist_near_dup_ledger(spark, truth_dir, truth, n_buckets=8)
    got = _ledger_snapshot(spark, path)
    want = _ledger_snapshot(spark, truth)
    assert got[0] == want[0], "labels drifted from the declarative build"
    assert got[1] == want[1], "anchors drifted"
    assert got[2] == want[2], "assignments drifted"


def test_ledger_append_empty_and_null_batch(spark, sf_dir, tmp_path):
    """A batch with no rows (or only NULL texts) must stage nothing and
    leave the ledger bit-identical."""
    from rolaguard_data_collectors_spark.llm.components import (
        ledger_append,
        persist_near_dup_ledger,
        read_ledger_labels,
    )

    old_dir, _ = _split_docs(spark, sf_dir, tmp_path)
    path = str(tmp_path / "ledger_empty")
    persist_near_dup_ledger(spark, old_dir, path, n_buckets=8)
    before = sorted(
        (r.doc_id, r.cluster_id)
        for r in read_ledger_labels(spark, path).collect()
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    ledger_append(spark, path, empty)
    nulls = spark.createDataFrame(
        [(10**9, None), (10**9 + 1, None)], "doc_id long, text string"
    )
    ledger_append(spark, path, nulls)
    assert sorted(
        (r.doc_id, r.cluster_id)
        for r in read_ledger_labels(spark, path).collect()
    ) == before


def test_summary_counts(spark, sf_dir):
    total = near_dup_clusters(spark, sf_dir).count()
    summary = cluster_summary(spark, sf_dir).collect()
    assert sum(r.n_docs for r in summary) == total
    assert all(r.n_docs >= 2 for r in summary)


def test_counting_percentiles_matches_percentile_udaf(spark):
    """The bounded-memory counting percentile must agree with Spark's
    value-buffering percentile aggregate on duplicates, 1-row groups,
    2-row interpolation, and null values."""
    import pytest
    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.operators.relational import (
        counting_percentiles,
    )

    rows = (
        [("a", float(v)) for v in [1, 1, 1, 2, 5, 5, 9]]
        + [("b", 42.0)]                       # single row: all fractions = 42
        + [("c", 10.0), ("c", 20.0)]          # pure interpolation
        + [("d", 7.0), ("d", None), ("d", 3.0)]  # nulls ignored
    )
    df = spark.createDataFrame(rows, "g string, v double")
    fr = [0.0, 0.25, 0.5, 0.75, 1.0]
    names = ["p0", "p25", "p50", "p75", "p100"]
    got = {
        r["g"]: [r[n] for n in names]
        for r in counting_percentiles(df, "g", "v", fr, names).collect()
    }
    ref = {
        r["g"]: list(r["p"])
        for r in df.groupBy("g")
        .agg(F.expr("percentile(v, array(0.0D,0.25D,0.5D,0.75D,1.0D))").alias("p"))
        .collect()
    }
    assert got.keys() == ref.keys()
    for g in ref:
        assert got[g] == pytest.approx(ref[g]), (g, got[g], ref[g])


def test_repetition_metrics_hand_computed(spark):
    from rolaguard_data_collectors_spark.llm.text import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),      # 2-grams: ab ba ab ba -> top 2/4
            (2, "x y z"),          # xy yz -> top 1/2
            (3, "solo"),           # degenerate single token -> "solo solo"
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["top_2gram_frac"], r["n_2grams"])
           for r in repetition_metrics(df).collect()}
    assert got[1] == (0.5, 4)
    assert got[2] == (0.5, 2)
    assert got[3] == (1.0, 1)


def test_decontamination_hand_computed(spark):
    from rolaguard_data_collectors_spark.llm.text import decontamination

    # doc 0 is the benchmark slice (0 % 97 == 0). doc 1 shares the
    # 5-gram "a b c d e"; doc 2 shares nothing; doc 3 is too short.
    df = spark.createDataFrame(
        [
            (0, "a b c d e f"),
            (1, "z a b c d e"),
            (2, "p q r s t u"),
            (3, "a b c"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["contam_gram_hits"], r["contaminated"])
           for r in decontamination(df).collect()}
    assert got[0] == (0, False)   # self-matches excluded
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)
