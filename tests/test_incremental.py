"""Bloom-prefiltered incremental dedup (llm/incremental.py).

The operator's contract: result == plain LEFT ANTI join, always — the
sketch only routes rows between the short-circuit path and the
confirmation join. These tests pin that equality, the bloom's
no-false-negative guarantee, the fpp bound, and partition-invariance
of the distributed chunked build.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.catalog import load_table
from rolaguard_data_collectors_spark.llm import incremental as inc


def _hashed_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5("text").alias("content_hash"))


def test_incremental_equals_plain_anti_join(spark, sf_dir):
    hashed = _hashed_docs(spark, sf_dir)
    history = hashed.filter(F.col("doc_id") % 2 == 0)
    batch = hashed.filter(F.col("doc_id") % 2 == 1)

    got = {
        (r.doc_id, r.content_hash)
        for r in inc.incremental_novel(batch, history, "content_hash").collect()
    }
    want = {
        (r.doc_id, r.content_hash)
        for r in batch.join(
            history.select("content_hash"), "content_hash", "left_anti"
        ).collect()
    }
    assert got == want
    assert want, "fixture must exercise the novel path"


def test_incremental_exact_under_aggressive_fpp(spark, sf_dir):
    """With fpp ~ 0.5 most novel rows become false positives and take
    the confirmation join — the result must not change (the two paths
    must agree row-for-row)."""
    hashed = _hashed_docs(spark, sf_dir)
    history = hashed.filter(F.col("doc_id") % 3 == 0)
    batch = hashed.filter(F.col("doc_id") % 3 != 0)

    tight = inc.incremental_novel(batch, history, "content_hash", fpp=0.001)
    loose = inc.incremental_novel(batch, history, "content_hash", fpp=0.5)
    key = lambda r: (r.doc_id, r.content_hash)  # noqa: E731
    assert sorted(map(key, tight.collect())) == sorted(map(key, loose.collect()))


def test_bloom_no_false_negatives_and_fpp_bound(spark):
    n, fpp = 5000, 0.01
    keys = spark.range(n).select(F.md5(F.col("id").cast("string")).alias("k"))
    m, k = inc.bloom_params(n, fpp)
    bits = inc.build_bloom(keys.select(*inc.hash_columns("k")), m, k)
    probe = inc.might_contain_udf(spark, bits, m, k)

    present = keys.select(probe(*[c for c in inc.hash_columns("k")]).alias("hit"))
    assert present.filter(~F.col("hit")).count() == 0, "bloom false negative"

    absent = (
        spark.range(n, 3 * n)
        .select(F.md5(F.col("id").cast("string")).alias("k"))
        .select(probe(*[c for c in inc.hash_columns("k")]).alias("hit"))
    )
    fp = absent.filter(F.col("hit")).count()
    # 2n probes at target fpp=1%: expect ~100; 3x headroom for hash luck
    assert fp / (2 * n) < 3 * fpp, f"false-positive rate {fp / (2 * n):.4f}"


def test_chunked_build_partition_invariant(spark, monkeypatch):
    """The distributed OR-merge must be bit-identical whatever the
    input partitioning, including with chunking forced on (chunk size
    below the bitmap size)."""
    monkeypatch.setattr(inc, "BLOOM_CHUNK_BYTES", 256)
    keys = spark.range(2000).select(F.md5(F.col("id").cast("string")).alias("k"))
    m, k = inc.bloom_params(2000, 0.01)
    assert m // 8 > 256, "fixture must span multiple chunks"
    keyed = keys.select(*inc.hash_columns("k"))
    one = inc.build_bloom(keyed.coalesce(1), m, k)
    many = inc.build_bloom(keyed.repartition(13), m, k)
    assert one == many
    assert np.frombuffer(one, dtype=np.uint8).any()


def test_bloom_params_sizing():
    m, k = inc.bloom_params(1_000_000, 0.01)
    # textbook values: ~9.59 bits/key, k ~ 7
    assert 9.0e6 < m < 1.05e7
    assert k == 7
    # degenerate inputs still produce a usable filter
    m0, k0 = inc.bloom_params(0, 0.01)
    assert m0 >= 1024 and 1 <= k0 <= 16


def test_dedup_exact_plan_budget(spark, sf_dir):
    """The consolidated dedup suite: corpus-agg scan, history (anti
    side) scan, and TWO batch scans — the short-circuit leg and the
    confirm leg of the bloom split each read the (small) increment;
    in the streaming ingest form the probe runs inside the single
    ingest pass, but a stateless registered query pays the re-scan.
    Bounded exchanges; probe UDF enters via Arrow. (Bloom build jobs
    run at build time and are not part of this plan.)"""
    from rolaguard_data_collectors_spark.registry import collect_all

    df = collect_all()["dedup_exact"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert plan.count("FileScan parquet") <= 4, plan
    assert plan.count("Exchange") <= 6, plan
    assert "bloom_might_contain" in plan, plan
    assert "BatchEvalPython" not in plan, plan


# --- streaming ingest dedup (IngestDedupSink) ----------------------------


def _batch(spark, ids):
    return spark.createDataFrame(
        [(i, f"key-{i}", f"payload-{i}") for i in ids],
        "row_id long, k string, payload string",
    )


def test_ingest_sink_cross_batch_dedup(spark, tmp_path):
    sink = inc.IngestDedupSink(str(tmp_path / "s1"), key="k")
    sink(_batch(spark, [1, 2, 3, 3]), 0)   # within-batch dup collapses
    sink(_batch(spark, [2, 3, 4]), 1)      # 2,3 seen in epoch 0
    sink(_batch(spark, [4, 5]), 2)         # 4 seen in epoch 1
    acc = sink.accepted(spark)
    assert sorted(r.k for r in acc.collect()) == [
        "key-1", "key-2", "key-3", "key-4", "key-5"
    ]


def test_ingest_sink_replay_idempotent(spark, tmp_path):
    sink = inc.IngestDedupSink(str(tmp_path / "s2"), key="k")
    sink(_batch(spark, [1, 2]), 0)
    sink(_batch(spark, [1, 2]), 0)  # replayed micro-batch: no-op
    acc = sink.accepted(spark)
    assert acc.count() == 2


def test_ingest_sink_crash_before_commit_readmits_once(spark, tmp_path):
    """Crash window: state dirs + bloom written, commit record absent.
    The replay must re-admit the batch exactly once (the bloom
    overshoots, the exact side reads only committed epochs)."""
    root = str(tmp_path / "s3")
    sink = inc.IngestDedupSink(root, key="k")
    sink(_batch(spark, [1, 2]), 0)

    # simulate the crash: run epoch 1 fully, then delete its commit line
    sink(_batch(spark, [2, 3]), 1)
    with open(sink.commit_path, encoding="utf-8") as fh:
        lines = [l for l in fh if not l.startswith("1,")]
    with open(sink.commit_path, "w", encoding="utf-8") as fh:
        fh.writelines(lines)

    sink2 = inc.IngestDedupSink(root, key="k")
    sink2(_batch(spark, [2, 3]), 1)  # replay
    acc = sink2.accepted(spark)
    assert sorted(r.k for r in acc.collect()) == ["key-1", "key-2", "key-3"]
    # key-3 admitted exactly once despite the bloom already containing it
    assert acc.filter(acc.k == "key-3").count() == 1


def test_ingest_sink_bloom_growth_rebuild(spark, tmp_path):
    """Exceeding capacity must rebuild the filter doubled and keep
    deduplicating correctly (no false negatives after the rebuild)."""
    sink = inc.IngestDedupSink(str(tmp_path / "s4"), key="k", capacity=10)
    sink(_batch(spark, range(30)), 0)       # blows past capacity=10
    assert sink.capacity >= 60
    sink(_batch(spark, range(20, 40)), 1)   # 20-29 must NOT re-admit
    acc = sink.accepted(spark)
    assert acc.count() == 40
    assert acc.select("k").distinct().count() == 40


def test_ingest_sink_under_structured_streaming(spark, tmp_path):
    """End-to-end under a real streaming query: a file source feeding
    foreachBatch(IngestDedupSink) with availableNow, restarted over a
    second overlapping drop — accepted rows stay unique across the two
    query runs."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    root = str(tmp_path / "s5")
    ckpt = str(tmp_path / "ckpt")
    schema = "row_id long, k string, payload string"

    def run_once():
        sink = inc.IngestDedupSink(root, key="k")
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sink

    _batch(spark, [1, 2, 3]).write.mode("append").parquet(src)
    run_once()
    _batch(spark, [3, 4, 5]).write.mode("append").parquet(src)
    sink = run_once()
    acc = sink.accepted(spark)
    assert sorted(r.k for r in acc.collect()) == [
        "key-1", "key-2", "key-3", "key-4", "key-5"
    ]


def test_incremental_null_keys_match_anti_join(spark):
    """Null incoming keys must behave exactly like the plain left-anti
    join (null never matches, row is kept), whatever the bloom says."""
    inc_df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "row_id long, k string"
    )
    hist = spark.createDataFrame([("a",), ("c",)], "k string")
    got = sorted(
        (r.row_id, r.k) for r in inc.incremental_novel(inc_df, hist, "k").collect()
    )
    want = sorted(
        (r.row_id, r.k)
        for r in inc_df.join(hist, "k", "left_anti").collect()
    )
    assert got == want == [(2, None), (3, "b")]


def _measured_fpp(spark, sink, n_probes: int = 2000) -> float:
    """Fraction of guaranteed-non-member keys the persisted filter
    claims to contain (driver-side probe of the on-disk bitmap)."""
    bits, m, k, _ = sink._load_bloom()
    arr = np.frombuffer(bits, dtype=np.uint8)
    pdf = (
        spark.createDataFrame(
            [(f"nonmember-{i}",) for i in range(n_probes)], "k string"
        )
        .select(*inc.hash_columns("k"))
        .toPandas()
    )
    acc = np.ones(len(pdf), dtype=bool)
    for pos in inc._probe_positions(
        pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), m, k
    ):
        byte = arr[(pos >> np.uint64(3)).astype(np.int64)]
        acc &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1) != 0
    return float(acc.mean())


def test_ingest_sink_restart_derives_capacity_from_persisted_bloom(
    spark, tmp_path, monkeypatch
):
    """A sink re-instantiated with the constructor-default capacity
    after a doubled rebuild must derive its effective capacity from
    the persisted bitmap header — not re-trigger a full rebuild from
    the whole key table on every batch."""
    root = str(tmp_path / "s5")
    sink = inc.IngestDedupSink(root, key="k", capacity=10)
    sink(_batch(spark, range(30)), 0)  # forces the doubled rebuild
    _, m_after_growth, _, _ = sink._load_bloom()

    sink2 = inc.IngestDedupSink(root, key="k", capacity=10)  # "restart"
    calls = []
    real_build = inc.build_bloom

    def counting_build(keyed, m, k):
        calls.append(keyed.count())
        return real_build(keyed, m, k)

    monkeypatch.setattr(inc, "build_bloom", counting_build)
    sink2(_batch(spark, range(30, 35)), 1)
    # delta-only build over the 5 new keys — NOT a rebuild over all 35
    assert calls == [5]
    _, m2, _, _ = sink2._load_bloom()
    assert m2 == m_after_growth
    assert sink2.capacity >= inc.bloom_capacity(m_after_growth, sink2.fpp)


def test_ingest_sink_fpp_bounded_across_epoch_growth(spark, tmp_path):
    """Property (VERDICT r5 #8): the persisted filter is OR-updated
    forever, so its fpp must stay bounded as epochs accumulate — the
    doubling policy has to fire BEFORE saturation. Grows a sink far
    past its initial capacity over several epochs and checks the
    measured false-positive rate after every epoch."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=3, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=5, max_value=400),
                       min_size=3, max_size=5)
    )
    def run(sizes):
        import shutil
        import uuid

        root = str(tmp_path / f"fpp-{uuid.uuid4().hex[:8]}")
        sink = inc.IngestDedupSink(root, key="k", capacity=20)
        lo = 0
        for epoch, n in enumerate(sizes):
            sink(_batch(spark, range(lo, lo + n)), epoch)
            lo += n
            _, m, _, n_keys = sink._load_bloom()
            assert n_keys == lo
            # the stored bitmap must always be sized for its content
            assert inc.bloom_capacity(m, sink.fpp) >= n_keys
            fpp = _measured_fpp(spark, sink)
            # target 1%; allow sampling noise on 2000 probes
            assert fpp <= 0.05, (epoch, n_keys, m, fpp)
        shutil.rmtree(root, ignore_errors=True)

    run()
