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
