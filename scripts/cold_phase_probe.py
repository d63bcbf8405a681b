#!/usr/bin/env python
"""Attribute the staged-union cold build (VERDICT r13 item 7): in a
fresh session after bench-identical warm-ups, split the first
materialization's wall into driver-side plan phases (analyze /
optimize / physical-plan+codegen-prep) and the execute wall, then two
steady-state fresh builds. A second cold materialization of the SAME
shape distinguishes Janino-codegen cache hits from JIT ramp.
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

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.bootstrap import (
        ensure_executor_pythonpath,
    )
    from rolaguard_data_collectors_spark.session import get_spark

    spark = get_spark(app_name="cold_phase_probe")
    ensure_executor_pythonpath(spark)
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
        staged_pipeline_union,
    )

    out: dict = {}
    df = staged_pipeline_union(spark, sf_dir)
    qe = df._jdf.queryExecution()
    t0 = time.perf_counter()
    qe.analyzed()
    out["analyze_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    qe.optimizedPlan()
    out["optimize_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    qe.executedPlan()
    out["physical_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    out["first_write_sec"] = round(time.perf_counter() - t0, 2)
    for i in (1, 2):
        fresh = staged_pipeline_union(spark, sf_dir)
        t0 = time.perf_counter()
        fresh.write.format("noop").mode("overwrite").save()
        out[f"warm{i}_sec"] = round(time.perf_counter() - t0, 2)
    # host-speed control (r13 convention): a fixed numpy matmul
    import numpy as np

    a = np.random.default_rng(0).standard_normal((1500, 1500))
    t0 = time.perf_counter()
    for _ in range(20):
        a = a @ a / np.linalg.norm(a)
    out["matmul_control_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
