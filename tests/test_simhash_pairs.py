"""SimHash pigeonhole near-dup pairs vs a brute-force DuckDB oracle:
the banded candidate join must find EXACTLY the pairs an all-pairs
hamming scan finds (pigeonhole guarantees no recall loss at
hamming <= bands - 1)."""

from __future__ import annotations

import duckdb

from rolaguard_data_collectors_spark.llm.dedup import (
    SIMHASH_ORACLE,
    simhash_dedup,
    simhash_near_dup_pairs,
)


def test_simhash_pairs_match_bruteforce_oracle(spark, sf_dir):
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup_pairs(spark, sf_dir, max_hamming=3).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
                WITH fp AS ({SIMHASH_ORACLE})
                SELECT a.doc_id, b.doc_id,
                       bit_count(xor(a.simhash, b.simhash)) AS hamming
                FROM fp a JOIN fp b ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
                """
            ).fetchall(),
        )
    )
    assert got == want
    assert len(got) > 0  # the dup-heavy testdata must produce pairs


def test_simhash_dedup_drops_are_sound(spark, sf_dir):
    """Every (doc, rep) drop edge the O(N)-output dedup op emits must
    be a genuine near-dup pair from the exact pair inventory, with the
    same hamming distance, and reps must never themselves be dropped
    (the survivor set is well-defined)."""
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup_pairs(spark, sf_dir, max_hamming=3).collect()
    }
    drops = simhash_dedup(spark, sf_dir, max_hamming=3).collect()
    assert len(drops) > 0
    dropped = {r.doc_id for r in drops}
    # O(N) output contract: at most one drop edge per document, however
    # dup-heavy the corpus (the pair inventory above is quadratic here)
    assert len(drops) == len(dropped)
    for r in drops:
        key = (min(r.doc_id, r.rep_id), max(r.doc_id, r.rep_id))
        assert pairs.get(key) == r.hamming
    # every doc points at a strictly smaller rep, so drop chains
    # terminate and the corpus-global minimum doc_id always survives
    for r in drops:
        assert r.rep_id < r.doc_id
    assert min(r.rep_id for r in drops) not in dropped
