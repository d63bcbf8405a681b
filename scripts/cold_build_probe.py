#!/usr/bin/env python
"""Cold staged-union build probe (round 14, VERDICT r13 item 7): in a
FRESH session, after the bench-identical warm-ups, time (a) each
per-source pipeline chain's first materialization and (b) the 4-source
staged union's first materialization — attributing the one-time Janino
codegen/JIT bill. Conf overrides via SPARK_GRAFT_PROBE_CONF
("k=v;k=v") to A/B codegen knobs process-by-process (each variant
needs a fresh JVM or the code cache hides the compile).

Usage: [SPARK_GRAFT_PROBE_CONF=...] [PROBE_MODE=union|sources|both]
       python scripts/cold_build_probe.py
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
    mode = os.environ.get("PROBE_MODE", "union")

    conf = {}
    for kv in os.environ.get("SPARK_GRAFT_PROBE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k.strip()] = v.strip()

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.bootstrap import (
        ensure_executor_pythonpath,
    )
    from rolaguard_data_collectors_spark.session import get_spark

    spark = get_spark(app_name="cold_probe", extra_conf=conf or None)
    ensure_executor_pythonpath(spark)

    # bench-identical warm-ups (JVM classloading, Arrow workers, JSON
    # codegen for a TRIVIAL plan — the big per-source units stay cold)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        1000
    ).write.format("noop").mode("overwrite").save()
    from rolaguard_data_collectors_spark.catalog import compute_parallelism
    from rolaguard_data_collectors_spark.functions.lorawan_udfs import (
        decode_phypayload,
    )

    spark.range(256).repartition(compute_parallelism(spark)).select(
        decode_phypayload(
            F.lit("QMTBfwEAEQBd6f1YJ+K7NmuNmy/JpHTFQKI="), F.lit(None), F.lit(None)
        )
    ).write.format("noop").mode("overwrite").save()
    (
        spark.range(100_000)
        .select(
            (F.col("id") % 7).alias("k"),
            F.to_json(F.struct(F.col("id").alias("a"))).alias("j"),
        )
        .select("k", F.from_json("j", "a bigint").alias("s"))
        .groupBy("k")
        .agg(F.count("s.a"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    from rolaguard_data_collectors_spark.streaming.pipeline_queries import (
        _SRC_BUILDERS,
        staged_pipeline_union,
    )

    out: dict[str, float] = {"conf": conf or "default", "mode": mode}

    def clock(name, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)

    if mode in ("sources", "both"):
        for tag, b in _SRC_BUILDERS:
            clock(f"src_{tag}_cold", b(spark, sf_dir))
        clock("union_after_sources", staged_pipeline_union(spark, sf_dir))
    if mode in ("union", "both") and mode != "both":
        clock("union_cold", staged_pipeline_union(spark, sf_dir))
    # steady state: two more fresh builds
    for i in (1, 2):
        clock(f"union_warm{i}", staged_pipeline_union(spark, sf_dir))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
