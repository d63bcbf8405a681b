#!/usr/bin/env python
"""Per-leg wall breakdown for `lorawan_security_suite` (VERDICT r12
item 2): the registered query union three legs; this script times each
leg independently (min-of-N noop materializations, bench.py's clock)
plus a NO-OP-KERNEL ladder on the join_workflow leg — the same plan
with `join_workflow_kernel` swapped for a constant-output pandas UDF
of identical signature/schema, so (leg wall − noop wall) isolates the
Python crypto from the Arrow crossing + scan + scheduling floor.

Run on an idle host:  python scripts/security_suite_breakdown.py
Optional: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_BREAKDOWN_RUNS (default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# module level: pandas_udf resolves the kernel's type hints against
# the function's module globals, so `pd` must be importable here
import pandas as pd  # noqa: E402


def _time_noop(df, runs: int) -> float:
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        took = time.perf_counter() - t0
        best = took if best is None else min(best, took)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BREAKDOWN_RUNS", "5"))

    from pyspark.sql import functions as F

    from rolaguard_data_collectors_spark.bootstrap import (
        ensure_executor_pythonpath,
    )
    from rolaguard_data_collectors_spark.functions.lorawan_queries import (
        lorawan_security_suite,
        security_suite_legs,
    )
    from rolaguard_data_collectors_spark.functions.lorawan_udfs import (
        JOIN_WORKFLOW_SCHEMA,
        _JW_FIELDS,
    )
    from rolaguard_data_collectors_spark.session import get_spark

    spark = get_spark(app_name="security_suite_breakdown")
    ensure_executor_pythonpath(spark)

    # Warm-up: JVM + Arrow workers + codegen (bench.py's discipline).
    suite = lorawan_security_suite(spark, sf_dir)
    suite.write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    out["suite_total"] = _time_noop(suite, runs)
    legs = security_suite_legs(spark, sf_dir)
    for name, df in legs.items():
        out[f"leg_{name}"] = _time_noop(df, runs)

    # No-op-kernel ladder for the join_workflow leg: identical plan,
    # constant kernel output — measures scan + JVM expressions + the
    # Arrow struct crossing with ZERO Python crypto.
    @F.pandas_udf(JOIN_WORKFLOW_SCHEMA)
    def noop_kernel(
        app_key: pd.Series, join_eui: pd.Series, dev_eui: pd.Series,
        dev_nonce: pd.Series, dev_addr: pd.Series, f_port: pd.Series,
        payload_text: pd.Series,
    ) -> pd.DataFrame:
        n = len(app_key)
        return pd.DataFrame(
            {
                "m_type": ["JoinRequest"] * n,
                "join_eui": join_eui,
                "dev_eui": dev_eui,
                "dev_nonce": dev_nonce.astype("int64"),
                "mic_ok": [True] * n,
                "keys_distinct_ok": [True] * n,
                "session_roundtrip_ok": [True] * n,
            },
            columns=_JW_FIELDS,
        )

    from rolaguard_data_collectors_spark.functions.lorawan_queries import (
        _events,
    )

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "signup")
    ev = ev.select(
        "event_id",
        "user_id",
        F.md5(F.format_string("app-%d", F.col("user_id") % 8)).alias("app_key"),
        F.format_string("%016x", F.col("user_id")).alias("dev_eui"),
        F.format_string("%016x", F.col("user_id") + 1000000).alias("join_eui"),
        (F.col("event_id") % 65536).alias("dev_nonce"),
        F.format_string("%08x", F.col("user_id")).alias("dev_addr"),
        (F.col("user_id") % 223 + 1).cast("int").alias("f_port"),
        F.coalesce(F.col("props"), F.lit("")).alias("payload_text"),
    )
    w = ev.withColumn(
        "w",
        noop_kernel(
            "app_key", "join_eui", "dev_eui", "dev_nonce",
            "dev_addr", "f_port", "payload_text",
        ),
    )
    jw_noop = w.select(
        "event_id", "user_id",
        F.col("w.m_type").alias("m_type"),
        F.col("w.join_eui").alias("join_eui"),
        F.col("w.dev_eui").alias("dev_eui"),
        F.col("w.dev_nonce").alias("dev_nonce"),
        F.col("w.mic_ok").alias("mic_ok"),
        F.col("w.keys_distinct_ok").alias("keys_distinct_ok"),
        F.col("w.session_roundtrip_ok").alias("session_roundtrip_ok"),
        F.lit("join_workflow").alias("stage"),
    )
    jw_noop.write.format("noop").mode("overwrite").save()  # warm the UDF
    out["ladder_jw_noop_kernel"] = _time_noop(jw_noop, runs)
    out["ladder_jw_python_crypto"] = round(
        out["leg_join_workflow"] - out["ladder_jw_noop_kernel"], 3
    )
    # Scan-only rung: the ev projection with no UDF at all.
    out["ladder_jw_scan_only"] = _time_noop(ev, runs)

    out["sf_dir"] = sf_dir
    out["runs"] = runs
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
