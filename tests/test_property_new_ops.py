"""Property-based coverage for the round-5 operators: the bloom bit
kernel's no-false-negative guarantee over arbitrary hash values, and
the chunker's tiling contract over arbitrary (including empty and
non-ASCII) texts."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rolaguard_data_collectors_spark.llm import incremental as inc
from rolaguard_data_collectors_spark.llm import curate

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=100, deadline=None)
@given(
    pairs=st.lists(st.tuples(i64, i64), min_size=1, max_size=200),
    n_expected=st.integers(min_value=1, max_value=10_000),
)
def test_bloom_bit_kernel_no_false_negatives(pairs, n_expected):
    """Set bits for arbitrary (h1, h2) pairs with the same position
    kernel the distributed build uses; every inserted pair must probe
    positive — the shift/mask layout must agree between set and test
    for any hash values (negatives, zeros, extremes included)."""
    m, k = inc.bloom_params(n_expected, 0.01)
    bits = np.zeros(m // 8, dtype=np.uint8)
    h1 = np.array([a for a, _ in pairs], dtype=np.int64)
    h2 = np.array([b for _, b in pairs], dtype=np.int64)
    for pos in inc._probe_positions(h1, h2, m, k):
        np.bitwise_or.at(
            bits,
            (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)),
        )
    acc = np.ones(len(pairs), dtype=bool)
    for pos in inc._probe_positions(h1, h2, m, k):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        acc &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1) != 0
    assert acc.all()


# BMP, no surrogates: Spark/DuckDB/Python all agree on code-point
# length there (the chunker's contract is code-point offsets).
_bmp_text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0xFFFD,
                           exclude_categories=("Cs",)),
    max_size=900,
)


def _expected_chunks(text: str, C: int, S: int):
    L = len(text)
    n = max(math.ceil((L - C) / S), 0) + 1
    out = []
    for i in range(n):
        sub = text[i * S : i * S + C]
        out.append((i, i * S, len(sub), hashlib.md5(sub.encode()).hexdigest()))
    return out


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(_bmp_text, min_size=1, max_size=20))
def test_chunker_matches_reference_model(spark, tmp_path_factory, texts):
    """chunk_documents against a direct Python model: same chunk
    count, offsets, lengths, and content md5 for arbitrary texts
    (empty, short, multi-chunk, non-ASCII)."""
    root = str(tmp_path_factory.mktemp("prop") / "corpus")
    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(root + "/documents.parquet")

    C, S = curate.CHUNK_CHARS, curate.CHUNK_CHARS - curate.CHUNK_OVERLAP
    got: dict[int, list] = {}
    for r in curate.chunk_documents(spark, root).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.chunk_start, r.chunk_len, r.chunk_md5)
        )
    for i, t in enumerate(texts):
        assert sorted(got[i]) == _expected_chunks(t, C, S), (i, repr(t))


def test_heavy_hitters_exact_vs_full_aggregation(spark):
    """MG candidates + exact confirm must EQUAL the plain global
    top-k, including on a skew-free adversarial stream where no single
    item dominates, as long as the k-th frequency clears N/(c+1)."""
    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.llm.text import heavy_hitters

    # zipf-ish: item i appears ~ 3000/i times; plus a uniform tail
    rows = []
    for i in range(1, 60):
        rows += [(f"item{i:03d}",)] * (3000 // i)
    rows += [(f"tail{j}",) for j in range(2000)]
    df = spark.createDataFrame(rows, "tok string").repartition(16)

    got = [(r.tok, r.freq, r.rank)
           for r in heavy_hitters(df, "tok", k=10, counters=100).collect()]
    want = [
        (r.tok, r.freq, r.rank)
        for r in df.groupBy("tok").agg(F.count("*").alias("freq"))
        .withColumn(
            "rank",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy(F.desc("freq"), F.asc("tok"))
            ),
        )
        .filter(F.col("rank") <= 10)
        .collect()
    ]
    assert got == want and len(got) == 10


def test_hex32_array_equals_elementwise_hex32(spark):
    """hex32_array (one md5 per element, digit-parse of the bound
    prefix) must equal element-wise hex32 (md5 inlined per digit term)
    for arbitrary strings INCLUDING the md5-relevant edge cases —
    the two spellings back the same oracle values, so any divergence
    is a silent correctness bug in every signature operator."""
    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.portable_sql import hex32, hex32_array

    cases = [
        "", " ", "a", "the quick brown fox", "héllo wörld", "\t\n",
        "0123456789abcdef" * 8, "x" * 300, "é", "日本語テキスト",
        "null", "NaN", "' OR 1=1 --",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = (
        df.select(
            F.expr(hex32_array("array(s)"))[0].alias("via_array"),
            F.expr(hex32("s")).alias("direct"),
        )
        .collect()
    )
    for r, c in zip(got, cases):
        assert r.via_array == r.direct, c


def test_heavy_hitters_strict_guard_rejects_flat_distribution(spark):
    """On a distribution where the k-th frequency cannot clear
    W/(counters+1), the MG candidate set may silently miss true top-k
    items — the strict guard must fail the job loudly instead."""
    import pytest
    from pyspark.sql.utils import CapturedException

    from rolaguard_data_collectors_spark.llm.text import heavy_hitters

    # 5000 distinct singleton items: kth freq = 1, W = 5000,
    # 1 * (counters+1) = 101 <= 5000 -> bound violated
    df = spark.range(5000).selectExpr("concat('u', id) AS tok").repartition(8)
    with pytest.raises(Exception, match="heavy_hitters bound violated"):
        heavy_hitters(df, "tok", k=10, counters=100).collect()
    # strict=False restores the advisory behavior — and demonstrates
    # the silent miss the guard exists for: the flat stream decrements
    # every MG counter away, so fewer than k (here zero) rows survive
    rows = heavy_hitters(df, "tok", k=10, counters=100, strict=False).collect()
    assert len(rows) < 10


def test_histogram_percentiles_equals_sort_window_form(spark):
    """histogram_percentiles must return the exact sort-window answer
    (counting_percentiles) on adversarial shapes: heavy ties, values
    straddling bucket boundaries, outliers beyond the +-1e15 clamp
    (merged into edge buckets but still locally sorted), NULL values,
    NULL group keys, a single-value group, and a group with exactly
    two values (every fraction interpolates)."""
    import math

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.operators.relational import (
        counting_percentiles,
        histogram_percentiles,
    )

    rows = []
    # group a: ties + boundary straddle (bucket width 512)
    rows += [("a", float(v)) for v in [511.9, 512.0, 512.0, 512.1, 1024.0] * 3]
    # group b: outliers beyond the clamp, mixed signs
    rows += [("b", v) for v in [-9e17, -2.5, 0.0, 3.75, 8e16, 9e17, 9e17]]
    # group c: single value; NULL group key: two values; NULLs mixed in
    rows += [("c", 42.0), (None, 1.0), (None, 2.0), ("a", None), (None, None)]
    df = spark.createDataFrame(rows, "g string, v double")
    fr = [0.0, 0.25, 0.49, 0.5, 0.51, 0.75, 1.0]
    names = [f"p{i}" for i in range(len(fr))]
    want = {
        r["g"]: r
        for r in counting_percentiles(df, "g", "v", fr, names).collect()
    }
    got = {
        r["g"]: r
        for r in histogram_percentiles(df, "g", "v", fr, names).collect()
    }
    assert set(want) == set(got)
    for g in want:
        for n in names:
            w, h = want[g][n], got[g][n]
            assert (w is None and h is None) or math.isclose(
                w, h, rel_tol=0, abs_tol=0
            ), (g, n, w, h)


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.one_of(
                st.none(),
                st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                # values quantized to the bucket width -> forced ties
                # and bucket-boundary landings
                st.integers(min_value=-4, max_value=4).map(lambda i: i * 512.0),
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_histogram_percentiles_random_property(spark, rows):
    """Randomized equivalence: histogram_percentiles == the sort-window
    form on arbitrary (group, value) corpora — hypothesis drives group
    skew, NULL mixes, boundary-quantized ties, and tiny groups where
    every fraction interpolates across a bucket edge."""
    import math

    from rolaguard_data_collectors_spark.operators.relational import (
        counting_percentiles,
        histogram_percentiles,
    )

    df = spark.createDataFrame(rows, "g string, v double")
    fr = [0.0, 0.3, 0.5, 0.9, 1.0]
    names = [f"p{i}" for i in range(len(fr))]
    want = {r["g"]: r for r in counting_percentiles(df, "g", "v", fr, names).collect()}
    got = {r["g"]: r for r in histogram_percentiles(df, "g", "v", fr, names).collect()}
    assert set(want) == set(got)
    for g in want:
        for n in names:
            w, h = want[g][n], got[g][n]
            if w is None or h is None:
                assert w is None and h is None, (g, n, w, h)
            else:
                assert math.isclose(w, h, rel_tol=1e-12, abs_tol=1e-12), (g, n, w, h)


# --- round 9: the fixed-K connected-components oracle ---------------------

_edge = st.tuples(
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=30),
)


def _propagate(edges, rounds):
    """Reference min-label propagation: EXACTLY the per-round rule the
    Spark loop and the chained-CTE oracle implement (new label =
    least(own, min over neighbors' PREVIOUS labels), both directions)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        lab = {
            v: min(lab[v], min((lab[u] for u in adj[v]), default=lab[v]))
            for v in adj
        }
    return lab


def _union_find_min(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(max_examples=60, deadline=None)
@given(raw=st.lists(_edge, min_size=1, max_size=40))
def test_cluster_oracle_rounds_semantics(raw):
    """The chained-CTE propagation SQL (the ngram_jaccard_dedup
    cluster-leg oracle) must equal the reference per-round propagation
    at EVERY depth on arbitrary graphs — including paths deeper than
    K, where neither side has converged — and equal union-find
    components exactly when propagation has converged within K. This
    pins the SQL generator's semantics, not just one corpus."""
    import duckdb
    import pandas as pd
    from hypothesis import assume

    from rolaguard_data_collectors_spark.llm.components import (
        ORACLE_ROUNDS,
        _cluster_rounds_sql,
    )

    edges = sorted({(s, d) for s, d in raw if s != d})
    assume(edges)
    K = ORACLE_ROUNDS
    con = duckdb.connect()
    con.register("edges_t", pd.DataFrame(edges, columns=["src", "dst"]))
    sql = f"""
WITH edges AS MATERIALIZED (SELECT src, dst FROM edges_t),
half AS MATERIALIZED (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
),
l0 AS MATERIALIZED (
  SELECT doc_id, doc_id AS cluster_id
  FROM (SELECT src AS doc_id FROM edges UNION SELECT dst FROM edges)
),{_cluster_rounds_sql(K)}
SELECT doc_id, cluster_id FROM l{K}
"""
    got = dict(con.execute(sql).fetchall())
    want = _propagate(edges, K)
    assert got == want
    if _propagate(edges, K + 1) == want:  # converged within K
        assert got == _union_find_min(edges)
