"""DSIR importance resampling (llm/dsir.py): selection semantics the
oracle's value-hash cannot express — the point of the operator is that
the selected slice looks like the target distribution."""

import rolaguard_data_collectors_spark.llm.dsir as dsir


def test_selected_slice_is_target_enriched(spark, sf_dir):
    """Top-K by importance weight must over-represent the target
    language relative to the raw corpus — otherwise the weights are
    noise and the operator is decorative."""
    rows = dsir.dsir_importance(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    base_en = sum(r.lang == dsir.DSIR_TARGET_LANG for r in rows) / n
    sel = [r for r in rows if r.selected]
    assert len(sel) == min(dsir.DSIR_SELECT_K, n)
    sel_en = sum(r.lang == dsir.DSIR_TARGET_LANG for r in sel) / len(sel)
    assert sel_en > base_en, (sel_en, base_en)


def test_ranking_is_total_and_deterministic(spark, sf_dir):
    a = dsir.dsir_importance(spark, sf_dir).collect()
    b = dsir.dsir_importance(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    ranks = sorted(r.rank for r in a)
    assert ranks == list(range(1, len(a) + 1))  # dense total order
