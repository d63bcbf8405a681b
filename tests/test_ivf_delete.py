"""Row-level deletes for the persisted IVF index (round-10 verdict
item #2): tombstone sidecars every reader anti-joins, physical drops
at apply time, crash windows, and frozen-codebook rebuild equivalence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.llm.kmeans import (
    IvfAppendSink,
    _emb,
    _route_for_index,
    apply_ivf_tombstones,
    ivf_index_append,
    ivf_index_delete,
    ivf_index_topk,
    persist_ivf_index,
    read_ivf_postings,
)

K = 4


def _build(spark, sf_dir, path, quantize=False):
    persist_ivf_index(spark, sf_dir, path, k=K, iters=1, quantize=quantize)
    emb = _emb(spark, sf_dir)
    ivf_index_append(
        spark, path,
        emb.limit(40).select((F.col("vec_id") + 10_000_000).alias("vec_id"), "v"),
    )
    return emb


def _rows(spark, path, reader=True):
    src = (read_ivf_postings(spark, path) if reader
           else spark.read.parquet(path + "/postings"))
    payload = "v" if "v" in src.columns else "codes"
    return sorted(
        (r["vec_id"], r["cluster"], tuple(r[payload])) for r in src.collect()
    )


def test_delete_reader_excludes_then_apply_drops(spark, sf_dir, tmp_path):
    """Tombstoned rows vanish from the read path immediately; apply
    physically rewrites only the touched cells, drains the sidecar,
    and changes nothing the reader shows."""
    path = str(tmp_path / "ivf")
    emb = _build(spark, sf_dir, path)
    before = _rows(spark, path)

    doomed = emb.where(F.col("vec_id") % 9 == 1).select("vec_id", "v")
    doomed_ids = {r["vec_id"] for r in doomed.collect()}
    assert doomed_ids
    touched = ivf_index_delete(spark, path, doomed)
    assert touched

    want = [r for r in before if r[0] not in doomed_ids]
    assert _rows(spark, path) == want  # reader anti-joins
    assert len(_rows(spark, path, reader=False)) == len(before)  # no rewrite yet

    q = emb.where(F.col("vec_id") == 0).collect()[0]["v"]
    top_before_apply = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_topk(spark, path, list(q), top_k=8, n_probe=K).collect()
    ]
    assert not ({v for v, _ in top_before_apply} & doomed_ids)

    untouched = [
        d for d in os.listdir(path + "/postings")
        if d.startswith("cluster=") and int(d.split("=")[1]) not in touched
    ]
    before_files = {
        d: sorted(os.listdir(os.path.join(path, "postings", d)))
        for d in untouched
    }
    applied = apply_ivf_tombstones(spark, path)
    assert applied == touched
    assert _rows(spark, path, reader=False) == want  # physically gone
    assert _rows(spark, path) == want
    assert not any(
        d.startswith("cluster=")
        for d in (os.listdir(path + "/tombstones")
                  if os.path.isdir(path + "/tombstones") else [])
    )
    for d in untouched:  # untouched cells keep their exact files
        assert sorted(os.listdir(os.path.join(path, "postings", d))) == \
            before_files[d], d
    top_after = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_topk(spark, path, list(q), top_k=8, n_probe=K).collect()
    ]
    assert top_after == top_before_apply
    assert not os.path.exists(os.path.join(path, "_tombstone_tmp"))


def test_delete_by_ids_only_locates_cells(spark, sf_dir, tmp_path):
    """Without the embedding column the ids are located by joining the
    postings scan — same tombstones, same surviving rows; absent ids
    are dropped."""
    path = str(tmp_path / "ivf")
    emb = _build(spark, sf_dir, path)
    before = _rows(spark, path)
    doomed_ids = {r["vec_id"] for r in emb.where(F.col("vec_id") % 11 == 2)
                  .select("vec_id").collect()}
    ids_df = spark.createDataFrame(
        [(i,) for i in sorted(doomed_ids)] + [(999_999_999,)], "vec_id long"
    )
    touched = ivf_index_delete(spark, path, ids_df)
    assert touched
    want = [r for r in before if r[0] not in doomed_ids]
    assert _rows(spark, path) == want
    apply_ivf_tombstones(spark, path)
    assert _rows(spark, path, reader=False) == want


def test_delete_quantized_index(spark, sf_dir, tmp_path):
    """Quantized postings carry codes, not vectors: routing still uses
    the float embedding, the anti-join still keys on vec_id."""
    path = str(tmp_path / "ivfq")
    emb = _build(spark, sf_dir, path, quantize=True)
    before = _rows(spark, path)
    doomed = emb.where(F.col("vec_id") % 13 == 3).select("vec_id", "v")
    doomed_ids = {r["vec_id"] for r in doomed.collect()}
    ivf_index_delete(spark, path, doomed)
    want = [r for r in before if r[0] not in doomed_ids]
    assert _rows(spark, path) == want
    apply_ivf_tombstones(spark, path)
    assert _rows(spark, path, reader=False) == want


def test_delete_absent_ids_by_vector_then_apply(spark, sf_dir, tmp_path):
    """Routed deletes of ids that were never appended write ghost
    tombstones; readers ignore them and apply drains them — including
    when a touched cell has no live posting directory at all (the
    codebook owns the cell but no vector ever routed there)."""
    import shutil

    path = str(tmp_path / "ivf")
    emb = _build(spark, sf_dir, path)
    ghost = emb.limit(3).select(
        (F.col("vec_id") + 777_000_000).alias("vec_id"), "v"
    )
    touched = ivf_index_delete(spark, path, ghost)
    assert touched
    # empty one touched cell's live dir entirely
    shutil.rmtree(
        os.path.join(path, "postings", f"cluster={touched[0]}"),
        ignore_errors=True,
    )
    expect = [r for r in _rows(spark, path)]  # ghosts match nothing
    applied = apply_ivf_tombstones(spark, path)
    assert set(applied) == set(touched)
    assert _rows(spark, path, reader=False) == expect  # content unchanged
    assert not any(
        d.startswith("cluster=")
        for d in (os.listdir(path + "/tombstones")
                  if os.path.isdir(path + "/tombstones") else [])
    )  # ghost sidecars drained


def test_append_delete_equals_frozen_codebook_rebuild(spark, sf_dir, tmp_path):
    """The done-criterion: after appends + deletes + apply, the posting
    rows equal routing exactly the SURVIVING vectors against the frozen
    codebook — i.e. an index rebuilt from the survivors with the same
    centroids, row for row."""
    path = str(tmp_path / "ivf")
    emb = _build(spark, sf_dir, path)
    appended = emb.limit(40).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "v"
    )
    doomed = emb.where(F.col("vec_id") % 6 == 0).select("vec_id", "v") \
        .unionByName(appended.where(F.col("vec_id") % 2 == 0))
    doomed_ids = {r["vec_id"] for r in doomed.collect()}
    ivf_index_delete(spark, path, doomed)
    apply_ivf_tombstones(spark, path)

    survivors = (
        emb.select("vec_id", "v").unionByName(appended)
        .where(~F.col("vec_id").isin(list(doomed_ids)))
    )
    want = sorted(
        (r["vec_id"], r["cluster"], tuple(r["v"]))
        for r in _route_for_index(spark, path, survivors).collect()
    )
    assert _rows(spark, path, reader=False) == want


def test_apply_crash_windows(spark, sf_dir, tmp_path):
    """(a) crash BEFORE the marker: live index + tombstones untouched,
    the delete is never lost; (b) crash MID-SWAP: the marker lets the
    next apply finish from the surviving scratch and drain the
    sidecars; (c) crash AFTER swap, BEFORE sidecar clear: replay
    anti-joins already-gone rows (no-op) and completes the clear."""
    import shutil

    path = str(tmp_path / "ivf")
    emb = _build(spark, sf_dir, path)
    before = _rows(spark, path)
    doomed = emb.where(F.col("vec_id") % 9 == 1).select("vec_id", "v")
    doomed_ids = {r["vec_id"] for r in doomed.collect()}
    want = [r for r in before if r[0] not in doomed_ids]
    ivf_index_delete(spark, path, doomed)

    scratch = os.path.join(path, "_tombstone_tmp")
    # (a) staged but no marker yet -> dropped on entry, nothing lost
    os.makedirs(os.path.join(scratch, "cluster=0"), exist_ok=True)
    assert _rows(spark, path) == want  # reader still anti-joins

    # (b) construct mid-swap: stage one tombstoned cell for real, write
    # the marker, delete the live cell dir (crash after its rmtree)
    shutil.rmtree(scratch, ignore_errors=True)
    cell = sorted(
        int(d.split("=")[1]) for d in os.listdir(path + "/tombstones")
        if d.startswith("cluster=")
    )[0]
    live = os.path.join(path, "postings", f"cluster={cell}")
    tomb = spark.read.parquet(
        os.path.join(path, "tombstones", f"cluster={cell}")
    ).select("vec_id")
    spark.read.parquet(live).join(
        F.broadcast(tomb), "vec_id", "left_anti"
    ).coalesce(1).write.parquet(os.path.join(scratch, f"cluster={cell}"))
    with open(os.path.join(scratch, "_SWAP"), "w") as fh:
        fh.write(f"{cell}\n")
    shutil.rmtree(live)  # crash was here
    applied = apply_ivf_tombstones(spark, path)
    assert _rows(spark, path, reader=False) == want
    assert set(applied) >= set()  # remaining cells applied in the same call
    assert not any(
        d.startswith("cluster=")
        for d in (os.listdir(path + "/tombstones")
                  if os.path.isdir(path + "/tombstones") else [])
    )

    # (c) swap done, sidecar clear lost: re-create a stale tombstone for
    # rows that are already gone — replay must be a clean no-op rewrite
    spark.createDataFrame(
        [(i,) for i in sorted(doomed_ids)], "vec_id long"
    ).withColumn("cluster", F.lit(cell)).write.mode("append").partitionBy(
        "cluster"
    ).parquet(path + "/tombstones")
    apply_ivf_tombstones(spark, path)
    assert _rows(spark, path, reader=False) == want
    assert not os.path.exists(scratch)


def test_reader_prunes_probed_cells_with_tombstones(spark, sf_dir, tmp_path):
    """The tombstone anti-join must not cost the reader its partition
    pruning: a clusters= read scans only the probed cells on BOTH the
    postings and the tombstone side (PartitionFilters in the plan), and
    the anti-join side is broadcast."""
    path = str(tmp_path / "ivf")
    emb = _build(spark, sf_dir, path)
    ivf_index_delete(spark, path, emb.limit(5).select("vec_id", "v"))
    probed = [0, 1]
    df = read_ivf_postings(spark, path, clusters=probed)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters: [") >= 2, plan  # both scans pruned
    assert "cluster" in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    got = {r["cluster"] for r in df.select("cluster").distinct().collect()}
    assert got <= set(probed)


def test_reappending_tombstoned_id_raises_until_applied(
    spark, sf_dir, tmp_path
):
    """Round-10 review find: appending a vec_id that is currently
    tombstoned would be silently hidden by the reader AND physically
    deleted by the next apply. Both append paths (one-shot + sink)
    must raise a named error; after apply drains the tombstone, the
    same append succeeds and the row is live again."""
    from rolaguard_data_collectors_spark.llm.kmeans import IvfAppendSink

    path = str(tmp_path / "ivf")
    emb = _build(spark, sf_dir, path)
    victim = emb.limit(1).select("vec_id", "v")
    vid = victim.collect()[0]["vec_id"]
    ivf_index_delete(spark, path, victim)

    with pytest.raises(ValueError, match="tombstoned"):
        ivf_index_append(spark, path, victim)
    sink = IvfAppendSink(path)
    with pytest.raises(ValueError, match="tombstoned"):
        sink(victim, 7)
    assert 7 not in sink.committed()  # epoch stays uncommitted (staged)

    apply_ivf_tombstones(spark, path)
    sink(victim, 7)  # stream restart replays the STAGED epoch cleanly
    assert 7 in sink.committed()
    assert vid in {v for v, _, _ in _rows(spark, path)}


def test_streaming_delete_sink_exactly_once_and_crash_replay(
    spark, sf_dir, tmp_path
):
    """IvfDeleteSink: a replayed committed epoch adds no duplicate
    sidecar files; a crash mid-move replays to the same tombstone set;
    the commit log is separate from the append sink's; readers and
    apply see exactly the streamed deletes."""
    from rolaguard_data_collectors_spark.llm.kmeans import IvfDeleteSink

    path = str(tmp_path / "ivf")
    emb = _build(spark, sf_dir, path)
    before = _rows(spark, path)
    doomed = emb.where(F.col("vec_id") % 9 == 1).select("vec_id", "v")
    doomed_ids = {r["vec_id"] for r in doomed.collect()}
    want = [r for r in before if r[0] not in doomed_ids]

    sink = IvfDeleteSink(path)
    sink(doomed, 0)
    assert 0 in sink.committed() and sink.committed()[0]

    def sidecar_files():
        troot = os.path.join(path, "tombstones")
        return sorted(
            os.path.join(d, f)
            for d in os.listdir(troot) if d.startswith("cluster=")
            for f in os.listdir(os.path.join(troot, d))
            if f.startswith("epoch")
        )

    files0 = sidecar_files()
    sink(doomed, 0)  # restart replay: committed -> no new files
    assert sidecar_files() == files0
    assert _rows(spark, path) == want

    # crash mid-move on the NEXT epoch: first cell moved, rest staged
    class Boom(Exception):
        pass

    orig_move = IvfDeleteSink._move
    calls = {"n": 0}

    def dying_move(self, edir, epoch):
        orig_move(self, edir, epoch)
        raise Boom()

    IvfDeleteSink._move = dying_move
    doomed2 = emb.where(F.col("vec_id") % 9 == 4).select("vec_id", "v")
    try:
        with pytest.raises(Boom):
            sink(doomed2, 1)
    finally:
        IvfDeleteSink._move = orig_move
    assert 1 not in sink.committed()
    sink(doomed2, 1)  # replay finishes from the surviving scratch
    assert 1 in sink.committed()
    doomed2_ids = {r["vec_id"] for r in doomed2.collect()}
    want2 = [r for r in before if r[0] not in doomed_ids | doomed2_ids]
    assert _rows(spark, path) == want2
    # the append sink's log is untouched by delete epochs
    from rolaguard_data_collectors_spark.llm.kmeans import IvfAppendSink

    assert 1 not in IvfAppendSink(path).committed()
    applied = apply_ivf_tombstones(spark, path)
    assert applied
    assert _rows(spark, path, reader=False) == want2


def test_delete_sink_interop_with_append_sink(spark, sf_dir, tmp_path):
    """A delete interleaved between exactly-once append epochs: the
    appended rows survive, the deleted rows do not, and the lease
    serializes everything (no torn state)."""
    path = str(tmp_path / "ivf")
    emb = _build(spark, sf_dir, path)
    sink = IvfAppendSink(path)
    b0 = emb.limit(10).select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"), "v"
    )
    sink(b0, 0)
    ivf_index_delete(spark, path, b0.where(F.col("vec_id") % 2 == 0))
    sink(b0, 0)  # replay: must not resurrect rows or double-append
    got = {v for v, _, _ in _rows(spark, path)}
    b0_ids = {r["vec_id"] for r in b0.collect()}
    assert {i for i in b0_ids if i % 2 != 0} <= got
    assert not ({i for i in b0_ids if i % 2 == 0} & got)
