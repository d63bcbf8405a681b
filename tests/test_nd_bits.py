"""Near-dup bucket-width parity: Spark's ``_nd_bits`` vs the oracle's
``nd_params`` CTE at every ceil() boundary.

``embedding_near_dup_pairs`` is the one registered query whose PLAN
carries a data-dependent parameter (the sign-bit bucket width). The
r12 spelling computed ``ceil(1.5 * log2(n / 2000))`` in two libms
(Python ``math.log2`` and DuckDB ``log2``); at n = 2000 * 2^(2k/3) a
1-ulp disagreement flips the ceil and the engines silently pick
different bucket widths (ADVICE r12 / VERDICT r12 item 1). Both sides
now evaluate the exact integer inequality ``extra = min e >= 0 with
2000^3 * 4^e >= n^3`` — this suite pins (a) Python == DuckDB at the
exact boundaries and their +-1 neighbours, and (b) the integer form ==
the float formula wherever the float formula is well-conditioned.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from rolaguard_data_collectors_spark.llm.similarity import (
    ND_REF_ROWS,
    NEAR_DUP_BITS,
    _nd_bits,
    _nd_params_sql,
)


def _oracle_bits(con, n_rows: int) -> int:
    """Evaluate the production nd_params CTE with the count driven by a
    synthetic relation of exactly n_rows rows."""
    sql = "WITH " + _nd_params_sql(f"range({n_rows})") + \
        " SELECT bits FROM nd_params"
    return con.execute(sql).fetchone()[0]


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _boundary_counts() -> list[int]:
    """Row counts where 1.5 * log2(n / 2000) lands on (or within one
    integer of) an exact integer k — the ceil cliff — plus +-1
    neighbours. k divisible by 3 gives exact integer n (8000, 32000,
    ...); other k give the two straddling integers."""
    ns: set[int] = set()
    for k in range(1, 25):
        exact = ND_REF_ROWS * 2.0 ** (2.0 * k / 3.0)
        for n in (math.floor(exact), math.ceil(exact)):
            ns.update((n - 1, n, n + 1))
    return sorted(n for n in ns if n >= 1)


@pytest.mark.parametrize("n", _boundary_counts())
def test_bits_equal_at_ceil_boundaries(con, n):
    assert _nd_bits(n) == _oracle_bits(con, n), n


def test_bits_equal_small_and_degenerate(con):
    for n in (0, 1, 2, ND_REF_ROWS - 1, ND_REF_ROWS):
        # n=0: Spark's footer count of an empty table; both sides clamp
        # to the floor width instead of erroring on log/negative cubes
        assert _nd_bits(n) == NEAR_DUP_BITS, n
        assert _oracle_bits(con, n) == NEAR_DUP_BITS, n
    # first row past the reference count buys the first extra bit
    assert _nd_bits(ND_REF_ROWS + 1) == NEAR_DUP_BITS + 1
    assert _oracle_bits(con, ND_REF_ROWS + 1) == NEAR_DUP_BITS + 1


def test_bits_cap_and_monotone():
    prev = 0
    for exp in range(0, 40):
        b = _nd_bits(ND_REF_ROWS * (2 ** exp))
        assert b >= prev  # wider corpora never get narrower buckets
        assert b <= 30
        prev = b
    assert _nd_bits(ND_REF_ROWS * (2 ** 20)) == 30  # cap engaged


def test_integer_form_matches_float_formula_off_boundary():
    """Wherever the float formula is >1e-9 from an integer (i.e. the
    ceil is well-conditioned and any libm agrees), the integer
    inequality must reproduce it exactly — the r12 -> r13 change can
    only differ ON the ill-conditioned boundaries themselves."""
    for n in list(range(1, 4000, 7)) + [10**4, 10**5, 10**6, 10**7]:
        x = 1.5 * math.log2(n / ND_REF_ROWS) if n > ND_REF_ROWS else 0.0
        if abs(x - round(x)) <= 1e-9:
            continue  # ill-conditioned: the float form is undefined-ish
        want = min(NEAR_DUP_BITS + max(0, int(math.ceil(x))), 30)
        assert _nd_bits(n) == want, n
