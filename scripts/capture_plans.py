#!/usr/bin/env python
"""Capture .explain("formatted") for every registered query.

Usage: python scripts/capture_plans.py <outdir> [query ...]

Writes <outdir>/<query>.txt with the formatted physical plan (the
pre-execution AQE plan — what the optimizer chose before runtime
re-optimization). Used by the optimization rounds to commit
plans/r13/<query>_before.txt / _after.txt evidence.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from rolaguard_data_collectors_spark.registry import collect_all
    from rolaguard_data_collectors_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    for name, spec in collect_all().items():
        if only and name not in only:
            continue
        try:
            df = spec.build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure
            plan = f"PLAN CAPTURE FAILED: {exc}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
