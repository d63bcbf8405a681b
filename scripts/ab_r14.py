#!/usr/bin/env python
"""Round-14 same-session interleaved A/Bs (guide §1): each pair of
variants is timed with the noop sink, round-robin min-of-N inside ONE
bench-identical session, so host-noise bursts cannot masquerade as a
win. Variants are built FRESH per pass (round-14 bench methodology) so
lazy localCheckpoints recompute.

Pairs:
  ngram_old / ngram_new       — candidate-id broadcast-semi prefilter
                                of the verify tokenization (§3.2)
  minhash_digit / minhash_conv— r13's conv() array-hash swap, measured
                                per VERDICT r13 item 6 (trio leader)
  simhash_digit / simhash_conv
  subwin_digit / subwin_conv  — text_profile substring-window scalar
                                hash: 8-term digit parse vs conv()
"""

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
    passes = int(os.environ.get("AB_PASSES", "5"))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.bootstrap import (
        ensure_executor_pythonpath,
    )
    from rolaguard_data_collectors_spark.catalog import load_table, spread
    from rolaguard_data_collectors_spark.session import get_spark

    spark = get_spark(app_name="ab_r14")
    ensure_executor_pythonpath(spark)
    # bench-identical warm-up
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        1000
    ).write.format("noop").mode("overwrite").save()

    from rolaguard_data_collectors_spark.llm import dedup as dd
    from rolaguard_data_collectors_spark.llm.dedup import (
        MINHASH_PARAMS,
        _band_assignments,
        _staged_token_hashes,
        minhash_signatures,
        ngram_jaccard_dedup,
    )
    from rolaguard_data_collectors_spark.llm.text import (
        SUBSTR_S,
        SUBSTR_W,
        _substring_dup_hits,
        text_profile,
    )
    from rolaguard_data_collectors_spark.portable_sql import (
        HASH_PRIME,
        hex32,
        hex32_array,
        hex32_spark,
    )

    def ngram_old():
        """r13 form: whole-corpus tokenize into both verify sides."""
        docs = spread(load_table(spark, sf_dir, "documents"))
        tok_arrays = docs.select(
            "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
        )
        assign = _band_assignments(minhash_signatures(spark, sf_dir))
        w = Window.partitionBy("band", "bucket")
        cand = (
            assign.withColumn("rep", F.min("doc_id").over(w))
            .filter(F.col("doc_id") != F.col("rep"))
            .groupBy("doc_id")
            .agg(F.min("rep").alias("rep_id"))
        )
        ta = tok_arrays.select(F.col("doc_id"), F.col("toks").alias("toks_doc"))
        tb = tok_arrays.select(
            F.col("doc_id").alias("rep_id"), F.col("toks").alias("toks_rep")
        )
        inter = F.size(F.array_intersect("toks_doc", "toks_rep"))
        jacc = F.round(
            inter
            / (F.size("toks_doc") + F.size("toks_rep") - inter).cast("double"),
            6,
        )
        return (
            cand.join(ta, "doc_id")
            .join(tb, "rep_id")
            .select("doc_id", "rep_id", jacc.alias("jaccard"))
            .filter(F.col("jaccard") >= 0.8)
        )

    def sig_via(arr_hash_sql: str):
        """MinHash signatures with an injected token-hash spelling."""
        from rolaguard_data_collectors_spark.catalog import arrays_barrier

        docs = spread(load_table(spark, sf_dir, "documents")).where(
            F.col("text").isNotNull()
        )
        staged = arrays_barrier(
            docs, ["doc_id"], {"_th": F.expr(arr_hash_sql)}
        )
        return staged.selectExpr(
            "doc_id",
            *[
                f"array_min(transform(_th, h -> ({a} * h + {b}) % {HASH_PRIME}))"
                f" AS mh{i}"
                for i, (a, b) in enumerate(MINHASH_PARAMS)
            ],
        )

    DIGIT_ARR = hex32_array("array_distinct(split(text, ' '))")
    from rolaguard_data_collectors_spark.portable_sql import hex32_array_spark

    CONV_ARR = hex32_array_spark("array_distinct(split(text, ' '))")

    # minhash/simhash A/B at the SIGNATURE level — the subtree the
    # spelling changes; the banding/window layers above are identical.
    def simhash_via(arr_sql):
        docs = spread(load_table(spark, sf_dir, "documents")).where(
            F.col("text").isNotNull()
        )
        from rolaguard_data_collectors_spark.catalog import arrays_barrier

        staged = arrays_barrier(docs, ["doc_id"], {"_th": F.expr(arr_sql)})
        terms = " + ".join(
            f"CAST(IF(2 * size(filter(_th, h -> (shiftright(h, {j}) & 1) = 1))"
            f" > size(_th), {2 ** j}, 0) AS BIGINT)"
            for j in range(32)
        )
        return staged.selectExpr("doc_id", f"({terms}) AS simhash")

    def subwin_via(hash_fn):
        docs = spread(load_table(spark, sf_dir, "documents"))
        win_expr = F.expr(
            f"CASE WHEN length(text) < {SUBSTR_W} THEN array()"
            f" ELSE transform(sequence(1, length(text) - {SUBSTR_W} + 1, {SUBSTR_S}),"
            f" i -> substr(text, i, {SUBSTR_W})) END"
        )
        wins = (
            docs.select("doc_id", F.explode(win_expr).alias("w"))
            .select("doc_id", F.expr(hash_fn("w")).alias("h"))
        )
        dup = (
            wins.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("_nd"))
            .where(F.col("_nd") >= 2)
            .select("h")
        )
        return (
            wins.join(dup, "h")
            .groupBy("doc_id")
            .agg(F.count("*").alias("dup_windows"))
        )

    variants = {
        "ngram_old": ngram_old,
        "ngram_new": lambda: ngram_jaccard_dedup(spark, sf_dir),
        "minhash_sig_digit": lambda: sig_via(DIGIT_ARR),
        "minhash_sig_conv": lambda: sig_via(CONV_ARR),
        "simhash_digit": lambda: simhash_via(DIGIT_ARR),
        "simhash_conv": lambda: simhash_via(CONV_ARR),
        "subwin_digit": lambda: subwin_via(hex32),
        "subwin_conv": lambda: subwin_via(hex32_spark),
    }

    timings: dict[str, float] = {}
    for _pass in range(passes):
        for name, thunk in variants.items():
            try:
                df = thunk()  # fresh build per pass
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                took = time.perf_counter() - t0
                prev = timings.get(name)
                timings[name] = took if prev is None else min(prev, took)
            except Exception as exc:  # noqa: BLE001
                timings[name] = -1.0
                print(f"ab {name} FAILED: {exc}", file=sys.stderr)
    print(json.dumps({k: round(v, 3) for k, v in timings.items()}, indent=1))


if __name__ == "__main__":
    main()
