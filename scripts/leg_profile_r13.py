#!/usr/bin/env python
"""Round-13 leg profiler: time the component legs of the heaviest
queries with the noop sink (guide §1.4), round-robin min-of-3 like
bench.py, inside one bench-identical session. Prints a JSON dict."""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.bootstrap import (
        ensure_executor_pythonpath,
    )
    from rolaguard_data_collectors_spark.session import get_spark

    spark = get_spark(app_name="leg_profile")
    ensure_executor_pythonpath(spark)

    # bench-identical warm-up
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        1000
    ).write.format("noop").mode("overwrite").save()
    from rolaguard_data_collectors_spark.catalog import (
        compute_parallelism,
        load_table,
    )
    from rolaguard_data_collectors_spark.functions.lorawan_udfs import (
        decode_phypayload,
    )

    n_workers = compute_parallelism(spark)
    spark.range(256).repartition(n_workers).select(
        decode_phypayload(
            F.lit("QMTBfwEAEQBd6f1YJ+K7NmuNmy/JpHTFQKI="), F.lit(None), F.lit(None)
        )
    ).write.format("noop").mode("overwrite").save()

    legs: dict[str, object] = {}

    def add(name, thunk):
        legs[name] = thunk

    # ---- floor probes -------------------------------------------------
    add("floor_range1", lambda: spark.range(1))
    add("floor_scan_lineitem_1col",
        lambda: load_table(spark, sf_dir, "lineitem").select("l_orderkey"))
    add("floor_scan_agg",
        lambda: load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag").agg(F.count("*")))

    # ---- clean_corpus_semantic legs ------------------------------------
    from rolaguard_data_collectors_spark.llm.dedup import (
        dedup_exact_survivors,
        ngram_jaccard_dedup,
    )
    from rolaguard_data_collectors_spark.llm.kmeans import semantic_dedup
    from rolaguard_data_collectors_spark.llm.pipeline import (
        _seed_codebook_memo,
        clean_corpus,
        clean_corpus_semantic_seeded,
    )

    add("ccs_full", lambda: clean_corpus_semantic_seeded(spark, sf_dir))
    add("ccs_clean_corpus_textonly", lambda: clean_corpus(spark, sf_dir))
    add("ccs_dedup_exact", lambda: dedup_exact_survivors(spark, sf_dir))
    add("ccs_ngram_jaccard", lambda: ngram_jaccard_dedup(spark, sf_dir))
    add("ccs_semantic_dedup",
        lambda: semantic_dedup(
            spark, sf_dir, _seed_codebook_memo(spark, sf_dir, 8), 0.4))

    # ---- multimodal_decode_features legs -------------------------------
    from rolaguard_data_collectors_spark.llm import multimodal as mm

    add("mm_full", lambda: mm.multimodal_decode_features_flat(spark, sf_dir))
    add("mm_decode_features",
        lambda: mm.multimodal_decode_features(spark, sf_dir))
    add("mm_perceptual_dedup",
        lambda: mm.perceptual_dedup_table(spark, sf_dir))

    def mm_golden():
        ppm, _, _ = mm._golden_media()
        return (
            spark.createDataFrame([(0, ppm)], "doc_id long, payload binary")
            .mapInPandas(mm.make_resize_kernel(2, 2), schema=mm.RESIZE_SCHEMA)
            .select(F.md5("out_payload").alias("golden_resize_md5"))
        )

    def mm_golden_wav():
        return (
            spark.createDataFrame(
                [(0, mm._golden_wav())], "doc_id long, payload binary"
            )
            .mapInPandas(mm.media_phash_kernel, schema=mm.PHASH_SCHEMA)
            .select(F.col("dhash").alias("golden_wav_ahash"))
        )

    add("mm_golden_resize", mm_golden)
    add("mm_golden_wav", mm_golden_wav)

    def mm_synth_only():
        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id")
            .repartition(max(2, compute_parallelism(spark) // 4))
        )
        return docs.mapInPandas(
            mm.synthetic_media_kernel, schema="doc_id long, payload binary"
        )

    def mm_synth_phash():
        return mm_synth_only().mapInPandas(
            mm.media_phash_kernel, schema=mm.PHASH_SCHEMA
        )

    add("mm_synth_only", mm_synth_only)
    add("mm_synth_phash", mm_synth_phash)

    # ---- text_profile + tfidf + security suite for reference ----------
    from rolaguard_data_collectors_spark.llm.text import (
        text_profile,
        tfidf_top_terms,
    )

    add("text_profile", lambda: text_profile(spark, sf_dir))
    add("tfidf_top_terms", lambda: tfidf_top_terms(spark, sf_dir))

    timings: dict[str, float] = {}
    built: dict[str, object] = {}
    for _pass in range(3):
        for name, thunk in legs.items():
            try:
                t0 = time.perf_counter()
                df = built.get(name)
                if df is None:
                    df = built[name] = thunk()
                df.write.format("noop").mode("overwrite").save()
                took = time.perf_counter() - t0
                prev = timings.get(name)
                timings[name] = took if prev is None else min(prev, took)
            except Exception as exc:  # noqa: BLE001
                timings[name] = -1.0
                print(f"leg {name} FAILED: {exc}", file=sys.stderr)
    print(json.dumps({k: round(v, 3) for k, v in timings.items()}, indent=1))


if __name__ == "__main__":
    main()
