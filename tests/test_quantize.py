"""int8 scalar quantization (llm/similarity.py): DuckDB parity of the
code arithmetic, recall of the quantized top-k against the float
brute force, and the int8 range invariant. Unregistered (50-query
driver window), so this suite is its correctness gate."""

from __future__ import annotations

import duckdb

from rolaguard_data_collectors_spark.llm import similarity as sim


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return con


def test_quantize_matches_duckdb(spark, sf_dir):
    scales = sim.embedding_scales(spark, sf_dir)
    assert len(scales) == 64 and all(s > 0 for s in scales)
    got = {
        r.vec_id: list(r.codes)
        for r in sim.quantize_embeddings(spark, sf_dir, scales).collect()
    }
    want = {
        v: list(c)
        for v, _l, c in _con(sf_dir)
        .execute(sim.quantize_oracle_sql(scales))
        .fetchall()
    }
    assert got == want


def test_codes_are_int8_range(spark, sf_dir):
    rows = sim.quantize_embeddings(spark, sf_dir).collect()
    for r in rows:
        assert all(-127 <= c <= 127 for c in r.codes)


def test_int8_topk_recall(spark, sf_dir):
    exact = [r.vec_id for r in sim.cosine_topk_bruteforce(spark, sf_dir).collect()]
    approx = [r.vec_id for r in sim.cosine_topk_int8(spark, sf_dir).collect()]
    k = len(exact)
    recall = len(set(exact) & set(approx)) / k
    # int8 with per-dim scales on unit-norm vectors: near-lossless
    # ranking; 0.8 is the contract floor, observed ~1.0.
    assert recall >= 0.8, f"recall@{k} = {recall}"


def test_pq_codes_and_adc_are_exact_integers(spark, sf_dir):
    """Every PQ quantity is integer arithmetic over the int8 codes:
    scores must be exact integral doubles (no float fuzz anywhere),
    and encoding must be self-consistent — a codebook vector must
    encode to ITSELF (zero distance in every subspace)."""
    from pyspark.sql import functions as F

    pq = sim.cosine_topk_pq(spark, sf_dir)
    rows = pq.collect()
    assert rows, "empty pq top-k"
    assert all(float(r.pq_score) == int(r.pq_score) for r in rows)

    # self-encoding: for vec_id 1 (a codebook member, != query), its
    # ADC score equals the exact int8 dot with the query — the lookup
    # resolves to its own subvectors
    scales = sim.embedding_scales(spark, sf_dir)
    q = sim.quantize_embeddings(spark, sf_dir, scales)
    codes = {r.vec_id: list(r.codes) for r in q.filter(F.col("vec_id") < 16).collect()}
    qc = codes[sim.QUERY_VEC_ID]
    want = sum(a * b for a, b in zip(qc, codes[1]))
    got = {r.vec_id: r.pq_score for r in rows}
    if 1 in got:  # only if vec 1 made the top-k
        assert int(got[1]) == want


def test_pq_topk_recall(spark, sf_dir):
    """PQ with a 16-entry sampled codebook per subspace is a coarse
    quantizer — the contract floor is lower than flat int8, but the
    true neighbors must still dominate the PQ top-k."""
    exact = [r.vec_id for r in sim.cosine_topk_bruteforce(spark, sf_dir).collect()]
    approx = [r.vec_id for r in sim.cosine_topk_pq(spark, sf_dir).collect()]
    k = len(exact)
    recall = len(set(exact) & set(approx)) / k
    assert recall >= 0.3, f"recall@{k} = {recall}"


def test_ivf_pq_is_pq_restricted_to_cell(spark, sf_dir):
    """IVF-PQ must equal the plain PQ ranking filtered to the query's
    coarse cell — the composition adds pruning, never different
    scores."""
    from pyspark.sql import functions as F

    scales = sim.embedding_scales(spark, sf_dir)
    q = sim.quantize_embeddings(spark, sf_dir, scales)
    q_label = q.filter(F.col("vec_id") == sim.QUERY_VEC_ID).collect()[0]["label"]
    # full PQ scores restricted to the cell, re-ranked (k = corpus
    # size, NOT a huge literal: TakeOrdered allocates its k-sized
    # priority queue up front)
    n = q.count()
    full = sim.cosine_topk_pq(spark, sf_dir, k=n, scales=scales)
    want = [
        (r.vec_id, r.pq_score)
        for r in sorted(
            (r for r in full.collect() if r.label == q_label),
            key=lambda r: (-r.pq_score, r.vec_id),
        )[: sim.TOP_K]
    ]
    got = [
        (r.vec_id, r.pq_score)
        for r in sim.cosine_topk_ivf_pq(spark, sf_dir, scales=scales).collect()
    ]
    assert got == want
