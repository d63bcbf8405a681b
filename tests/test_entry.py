"""Driver-contract smoke tests for __spark_entry__.py."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_and_oracles_consistent(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_registry_window_is_exactly_full():
    """The driver checks a bounded window of 50 registry entries; new
    operators must consolidate into existing slots (tagged unions /
    extra columns), never silently push a query out of the window."""
    from rolaguard_data_collectors_spark.registry import collect_all

    specs = collect_all()
    assert len(specs) == 50
    # and every entry except none is oracle-checked (round-5 state:
    # zero rows-only entries)
    assert all(s.oracle is not None for s in specs.values())


def test_queries_md_in_sync():
    """QUERIES.md is generated from the registry; regenerate after
    registry changes (python scripts/gen_queries_md.py)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "QUERIES.md"), encoding="utf-8") as fh:
        before = fh.read()
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "gen_queries_md.py")],
        check=True,
        capture_output=True,
    )
    with open(os.path.join(repo, "QUERIES.md"), encoding="utf-8") as fh:
        after = fh.read()
    assert before == after, "QUERIES.md stale: run scripts/gen_queries_md.py"


def test_first_query_from_foreign_cwd_ships_package():
    """Driver-contract regression (round 6): a query whose build
    creates Python UDFs BEFORE its first load_table call (the golden
    local-relation legs) must still run when it is the FIRST query in
    a fresh session launched from a foreign CWD — Spark snapshots
    sc._python_includes into each UDF at plan-construction time, so
    the registry bootstraps every build before any build code runs."""
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = f"REPO_ROOT = {repo_root!r}\n" + r"""
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, REPO_ROOT)
from rolaguard_data_collectors_spark.registry import collect_all
df = collect_all()["multimodal_decode_features"].build(
    spark, "/root/testdata/sf0.001")
print("ROWS", df.count())
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=300,
        env=None,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ROWS" in out.stdout, out.stdout
