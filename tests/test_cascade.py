"""Cascaded time-grain rollup (operators/cascade.py): oracle parity
(cascaded == direct at every grain), single-scan plan, NULL edges."""

from __future__ import annotations

import datetime
import os

import duckdb
import pandas as pd
import pytest

from rolaguard_data_collectors_spark.operators.cascade import (
    CASCADE_ROLLUP_ORACLE,
    cascade_rollup,
)
from rolaguard_data_collectors_spark.oracle import compare


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return con


@pytest.mark.parametrize("sfd", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_cascade_matches_direct_aggregation(spark, sfd):
    r = compare("cascade_rollup", cascade_rollup(spark, sfd),
                CASCADE_ROLLUP_ORACLE, _con(sfd))
    assert r.ok and r.exact_match and r.dtypes_match, (r.detail, r.dtype_skews)


def test_cascade_single_scan(spark):
    """The point of the cascade: ONE raw scan; hour and day re-aggregate
    the staged minute frame instead of re-reading events."""
    plan = cascade_rollup(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert plan.count("FileScan parquet") <= 1, plan


def test_cascade_null_edges(spark, tmp_path):
    """NULL timestamps form their own bucket at every grain; NULL
    event_type groups; all-NULL value groups stay NULL (not 0.0)
    through the re-aggregation."""
    t = datetime.datetime(2023, 7, 1, 10, 15, 30)
    rows = [
        (1, 1, "click", 1.25, t),
        (2, 1, "click", 2.50, t + datetime.timedelta(seconds=10)),
        (3, 1, "click", 4.00, t + datetime.timedelta(minutes=50)),
        (4, 2, None, 8.00, t),                 # NULL type group
        (5, 2, "view", None, t),               # NULL value in a mixed group
        (6, 3, "view", None, t),               # all-NULL-value group member
        (7, 3, "signup", 16.0, None),          # NULL ts bucket
        (8, 3, "signup", 32.0, None),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value", "ts"]
    )
    d = str(tmp_path)
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    r = compare("cascade_nulls", cascade_rollup(spark, d),
                CASCADE_ROLLUP_ORACLE, _con(d))
    assert r.ok and r.exact_match and r.dtypes_match, (r.detail, r.dtype_skews)
    got = {(x["grain"], x["window_start"], x["event_type"]): x.asDict()
           for x in cascade_rollup(spark, d).collect()}
    # NULL ts: one bucket per grain, both signups aggregated
    assert got[("day", None, "signup")]["n_events"] == 2
    assert got[("day", None, "signup")]["total_value"] == 48.0
    # hour grain merges the two click minutes (15' and 65' -> 10h, 11h)
    assert got[("hour", datetime.datetime(2023, 7, 1, 10), "click")]["n_events"] == 2
    assert got[("day", datetime.datetime(2023, 7, 1), "click")]["n_events"] == 3
    assert got[("day", datetime.datetime(2023, 7, 1), "click")]["total_value"] == 7.75
