"""The composed corpus-cleaning pipeline (llm/pipeline.py) against a
DuckDB oracle of the SAME composition, built from the stage oracles."""

from __future__ import annotations

import duckdb

from rolaguard_data_collectors_spark.llm.dedup import NGRAM_JACCARD_ORACLE
from rolaguard_data_collectors_spark.llm.pipeline import (
    clean_corpus,
    clean_corpus_stats,
)
from rolaguard_data_collectors_spark.llm.text import STOPWORDS

_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

_KEEP_SQL = f"""
(CASE WHEN len(string_split(text, ' ')) < 5 THEN 0.0 ELSE
   floor((0.5 * least(len(string_split(text, ' ')) / 100.0, 1.0)
       + 0.3 * (len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_IN})))
                / CAST(len(string_split(text, ' ')) AS DOUBLE))
       + 0.2 * least(((length(text) - (len(string_split(text, ' ')) - 1))
                      / len(string_split(text, ' '))) / 10.0, 1.0)) * 1000000.0 + 0.5)
     / 1000000.0
 END) >= 0.2
"""


def _oracle_retained_ids(sf_dir: str) -> list[int]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rows = con.execute(
        f"""
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
          AND d.doc_id NOT IN (SELECT doc_id FROM ({NGRAM_JACCARD_ORACLE}))
          AND {_KEEP_SQL}
        ORDER BY d.doc_id
        """
    ).fetchall()
    return [r[0] for r in rows]


def test_clean_corpus_matches_composed_oracle(spark, sf_dir):
    got = sorted(
        r[0] for r in clean_corpus(spark, sf_dir).select("doc_id").collect()
    )
    want = _oracle_retained_ids(sf_dir)
    assert got == want
    assert len(got) > 0


def test_clean_corpus_stats_are_monotone_and_consistent(spark, sf_dir):
    row = clean_corpus_stats(spark, sf_dir).collect()[0]
    assert (
        row.n_raw
        >= row.n_after_exact_dedup
        >= row.n_after_near_dup
        >= row.n_retained
    )
    assert row.n_retained == clean_corpus(spark, sf_dir).count()
