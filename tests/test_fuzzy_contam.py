"""Fuzzy (MinHash-band) decontamination columns of minhash_lsh_buckets:
a training doc that collides with a benchmark doc in an LSH band must
flag, an unrelated doc must not, and a benchmark doc does not
contaminate itself."""

from __future__ import annotations

from rolaguard_data_collectors_spark.llm.dedup import minhash_lsh_buckets
from rolaguard_data_collectors_spark.llm.text import BENCH_MOD


def test_fuzzy_contam_semantics(spark, tmp_path):
    bench_text = "the quick brown fox jumps over the lazy dog again"
    rows = [
        (0, bench_text, "en", "web", len(bench_text)),          # benchmark doc
        (1, bench_text, "en", "web", len(bench_text)),          # identical train doc
        (2, "completely different words entirely here", "en", "web", 40),
        (BENCH_MOD, "unrelated benchmark content zzz qqq", "en", "web", 35),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    root = str(tmp_path / "corpus")
    docs.write.mode("overwrite").parquet(root + "/documents.parquet")

    out = minhash_lsh_buckets(spark, root).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)

    # identical text -> identical signature -> every band collides with
    # the benchmark doc 0
    assert all(r.fuzzy_contam_band for r in by_doc[1])
    assert all(r.n_bench_docs >= 1 for r in by_doc[1])
    # the benchmark doc itself: its own presence doesn't self-flag
    # (doc 0 only shares buckets with train doc 1, not another bench doc)
    assert not any(r.fuzzy_contam_band for r in by_doc[0])
    # unrelated text in its own buckets: clean
    assert not any(r.fuzzy_contam_band for r in by_doc[2])
    # bench-vs-bench: doc 97 shares no bucket with doc 0, stays clean
    assert not any(r.fuzzy_contam_band for r in by_doc[BENCH_MOD])
