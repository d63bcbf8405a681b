"""Adversarial-corpus parity fuzzing: the driver-facing oracle
harness only exercises the generated testdata, which contains no NULL
text, no empty strings, and no window-boundary document lengths — the
exact inputs where a Spark build and its DuckDB oracle drift apart
(round-6 review: the substring-dup oracle emitted NULL arithmetic for
NULL text while Spark rejoined those rows as zeros).

This suite materializes tiny hand-adversarial `documents` corpora to a
temp directory and runs build-vs-oracle through the SAME comparator
the parity suite uses (oracle.compare: pandas-materialized, strict
stringified cells, dtype pinning), for the operators whose oracles
contain length/NULL-sensitive arithmetic."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import rolaguard_data_collectors_spark.llm.dsir as dsir_mod
import rolaguard_data_collectors_spark.llm.text as text_mod
from rolaguard_data_collectors_spark.oracle import compare

# doc_id, text, lang, source, n_chars — the documents schema.
# Adversarial axes: NULL text, empty, whitespace-only, below/at/above
# the 40-char substring window, exactly one window, stride-boundary
# lengths, unicode + regex metacharacters, exact cross-doc duplicates,
# and a shared 60-char span embedded in different documents.
_SHARED = "the quick brown fox jumps over the lazy dog again and again"  # 60
_DOCS = [
    (0, None, "en", "s0"),
    (1, "", "en", "s0"),
    (2, "   ", "de", "s1"),
    (3, "short text", "en", "s1"),
    (4, "x" * 39, "fr", "s1"),
    (5, "y" * 40, "fr", "s1"),
    (6, "z" * 41, "es", "s2"),
    (7, "a" * 50, "es", "s2"),
    (8, "b" * 51, "zh", "s2"),
    (9, f"prefix one {_SHARED} suffix alpha", "en", "s3"),
    (10, f"prefix two {_SHARED} suffix beta", "en", "s3"),
    (11, "unicode héllo wörld 你好 émoji ™ () [] .* \\ $ ^ end", "und", "s4"),
    (12, "dup dup dup dup dup dup dup dup dup dup dup dup", "en", "s5"),
    (13, "dup dup dup dup dup dup dup dup dup dup dup dup", "en", "s5"),
    (14, "the of and to in is a " * 6, "en", "s6"),
]


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_sf")
    pdf = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t) if t is not None else 0,
            }
            for i, t, lang, src in _DOCS
        ]
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def fuzz_con(fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(fuzz_dir, 'documents.parquet')}'"
    )
    return con


def _check(name, spark_df, oracle_sql, con):
    r = compare(name, spark_df, oracle_sql, con)
    assert r.ok, f"{name}: {r.detail}"
    assert r.exact_match, f"{name}: {r.detail}"
    assert r.dtypes_match, f"{name}: {r.dtype_skews}"


def test_substring_dup_profile_fuzz(spark, fuzz_dir, fuzz_con):
    from rolaguard_data_collectors_spark.catalog import load_table

    docs = load_table(spark, fuzz_dir, "documents")
    _check(
        "substring_dup_profile",
        text_mod.substring_dup_profile(docs),
        text_mod.SUBSTRING_DUP_SQL,
        fuzz_con,
    )


def test_dsir_importance_fuzz(spark, fuzz_dir, fuzz_con):
    _check(
        "dsir_importance",
        dsir_mod.dsir_importance(spark, fuzz_dir),
        dsir_mod.DSIR_ORACLE,
        fuzz_con,
    )


def test_text_profile_fuzz(spark, fuzz_dir, fuzz_con):
    """The full 23-column profile over the adversarial corpus — this
    is the widest oracle in the repo and the one that has drifted
    before (HUGEINT skew r5, NULL-window arithmetic r6)."""
    _check(
        "text_profile",
        text_mod.text_profile(spark, fuzz_dir),
        text_mod.TEXT_PROFILE_ORACLE,
        fuzz_con,
    )


@pytest.mark.parametrize(
    "qname",
    ["dedup_exact", "ngram_jaccard_dedup", "minhash_lsh_buckets",
     "simhash_profile", "tfidf_top_terms", "clean_corpus",
     "pii_redaction_profile"],
)
def test_documents_query_fuzz(spark, fuzz_dir, fuzz_con, qname):
    """Registered documents-only queries over the adversarial corpus:
    the dedup family's oracles are the most hash-arithmetic-dense in
    the repo, and none of them has ever seen a NULL or boundary-length
    document before this suite."""
    from rolaguard_data_collectors_spark.registry import collect_all

    spec = collect_all()[qname]
    _check(qname, spec.build(spark, fuzz_dir), spec.oracle, fuzz_con)
