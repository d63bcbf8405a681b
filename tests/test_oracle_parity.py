"""Every registered query must match its DuckDB oracle exactly —
this is the same gate the driver applies (row count + schema +
order-insensitive values), run at sf0.001 for speed."""

import pytest

from rolaguard_data_collectors_spark.oracle import check_all
from rolaguard_data_collectors_spark.registry import collect_all

_NAMES = sorted(collect_all())


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    return {r.name: r for r in check_all(spark, sf_dir)}


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(results, name):
    r = results[name]
    assert r.ok, f"{name}: {r.detail}"
    assert r.exact_match, f"{name}: float-tolerant only — {r.detail}"
    # belt-and-braces for a positional driver hash: build and oracle
    # must emit the same column ORDER, not just the same column set
    assert r.order_match, f"{name}: {r.detail}"
    # dtype pinning: a one-sided pandas dtype (int vs widened float64)
    # is the HUGEINT trap even when today's values stringify equal —
    # fail it locally before a null/value pattern shift exposes it
    assert r.dtypes_match, f"{name}: {r.dtype_skews}"
