"""Oracle parity at sf1 (~10x the largest driver-generated SF).

VERDICT r10 item 3: everything was proven at <= sf0.1; this sweep runs
the partitioning-sensitive queries (the test_oracle_parity_sf01 list)
against a generated sf1 dataset through the exact driver comparator —
converting "the plans would hold at 10x" from argument to measurement.

The dataset is key-offset replication of sf0.1 (scripts/gen_sf1.py):
distributions and join fan-outs preserved, row counts / distinct keys /
shuffle widths scaled 10x. DuckDB reads the same generated files, so
parity is as real a check as at sf0.1.

Opt-in (the dataset is generated, not driver-shipped):
    python scripts/gen_sf1.py && pytest tests/test_oracle_parity_sf1.py -q
Skips when the directory is absent. Measured scaling numbers recorded
in SURVEY.md §6.
"""

from __future__ import annotations

import os

import pytest

from rolaguard_data_collectors_spark.oracle import compare, duckdb_connection
from rolaguard_data_collectors_spark.registry import collect_all

SF1 = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "testdata_sf1"),
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF1),
    reason="sf1 dataset not generated (run scripts/gen_sf1.py)",
)

from tests.test_oracle_parity_sf01 import _SENSITIVE  # same query class


@pytest.fixture(scope="module")
def sf1_con():
    return duckdb_connection(SF1)


@pytest.mark.parametrize("name", _SENSITIVE)
def test_sf1_parity(spark, sf1_con, name):
    spec = collect_all()[name]
    r = compare(name, spec.build(spark, SF1), spec.oracle, sf1_con)
    assert r.ok, f"{name}@sf1: {r.detail}"
    assert r.exact_match, f"{name}@sf1: {r.detail}"
    assert r.dtypes_match, f"{name}@sf1: {r.dtype_skews}"
