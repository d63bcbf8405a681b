#!/usr/bin/env python
"""Time a subset of registered queries with the noop sink (guide §1.4),
round-robin min-of-N inside one bench-identical session.

Usage: python scripts/time_queries.py [-nN] name [name ...]
Prints one JSON dict {name: min_sec}.
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
    args = sys.argv[1:]
    runs = 3
    if args and args[0].startswith("-n"):
        runs = int(args[0][2:])
        args = args[1:]
    names = args

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.bootstrap import (
        ensure_executor_pythonpath,
    )
    from rolaguard_data_collectors_spark.registry import collect_all
    from rolaguard_data_collectors_spark.session import get_spark

    spark = get_spark(app_name="time_queries")
    ensure_executor_pythonpath(spark)

    # bench-identical warm-up
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        1000
    ).write.format("noop").mode("overwrite").save()
    from rolaguard_data_collectors_spark.catalog import compute_parallelism
    from rolaguard_data_collectors_spark.functions.lorawan_udfs import (
        decode_phypayload,
    )

    n_workers = compute_parallelism(spark)
    spark.range(256).repartition(n_workers).select(
        decode_phypayload(
            F.lit("QMTBfwEAEQBd6f1YJ+K7NmuNmy/JpHTFQKI="), F.lit(None), F.lit(None)
        )
    ).write.format("noop").mode("overwrite").save()

    specs = collect_all()
    best: dict[str, float] = {n: float("inf") for n in names}
    for r in range(runs):
        for n in names:
            spark.sparkContext.setJobDescription(f"time:{n} run{r}")
            t0 = time.perf_counter()
            specs[n].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best[n] = min(best[n], dt)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({n: round(v, 3) for n, v in best.items()}))


if __name__ == "__main__":
    main()
