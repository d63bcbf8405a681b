"""BIGINT micro-unit money sums (round 12): exactness, order
independence, and the runtime overflow guard (operators/relational.py
_micro/_msum/_dollars — the recovery of the round-11 DECIMAL
regression). Value parity vs DuckDB is covered by the registered
oracles; these pin the mechanism itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.operators.relational import (
    _dollars,
    _micro,
    _msum,
)


def test_micro_summand_exact_at_6dp(spark):
    """2dp money x 2dp x 2dp factors are exact at 6dp; _micro must
    recover the exact integer despite double arithmetic."""
    rows = [(104999.91, 0.1, 0.08), (0.01, 0.0, 0.0), (95000.25, 0.05, 0.02)]
    df = spark.createDataFrame(rows, "p double, d double, t double")
    got = df.select(
        _micro(F.col("p") * (F.lit(1.0) - F.col("d"))
               * (F.lit(1.0) + F.col("t"))).alias("m")
    ).collect()
    from decimal import Decimal

    for (p, d, t), r in zip(rows, got):
        exact = (Decimal(str(p)) * (1 - Decimal(str(d)))
                 * (1 + Decimal(str(t)))) * 10**6
        assert r.m == int(exact), (p, d, t)


def test_micro_trunc_form_matches_round_semantics(spark):
    """Round-13 perf change: _micro is ``cast(y + 0.5 as bigint)``
    instead of ``round(y)`` (per-row BigDecimal, measured 2.7x slower
    over q1's aggregate set). Pin the equivalence on the class of
    inputs the design admits — 6dp-exact money values, where y = v*1e6
    sits within ~1e-4 of an integer — including the worst
    accumulated-error cases (max-magnitude prices, chained products)
    and the frac-near-1 side where truncation without the +0.5 would
    be off by one."""
    from decimal import ROUND_HALF_UP, Decimal

    vals = []
    # max-magnitude 2dp prices and 6dp-exact chained products
    for p in (104999.91, 99999.99, 95000.25, 0.01, 88888.49, 77777.51):
        for d in (0.0, 0.01, 0.05, 0.1):
            for t in (0.0, 0.02, 0.08):
                vals.append(float(p) * (1.0 - d) * (1.0 + t))
    # values whose double repr sits just BELOW the integer (frac ~ 1-eps)
    vals += [2.9999999999999996, 0.9999999999999999, 6.6e-7]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r.m for r in df.select(_micro(F.col("v")).alias("m")).collect()]
    for v, m in zip(vals, got):
        # reference: HALF_UP of the shortest-decimal repr, exactly what
        # Spark's Round(double) computed via BigDecimal.valueOf
        ref = int(
            (Decimal(repr(v)) * 10**6).quantize(Decimal(1), ROUND_HALF_UP)
        )
        assert m == ref, (v, m, ref)


def test_msum_order_independent(spark):
    """The same multiset in shuffled order and partitioning sums to
    the identical rounded value (the sf1 one-cent-flake class)."""
    import random

    rng = random.Random(7)
    vals = [round(rng.uniform(0.01, 99999.99), 2) for _ in range(5000)]
    assert len(set(vals)) > 4000  # review find: a re-seeded PRNG made
    # every value identical and the shuffle assertion vacuous
    outs = set()
    for seed, parts in [(1, 2), (2, 32), (3, 7)]:
        shuffled = list(vals)
        random.Random(seed).shuffle(shuffled)
        df = spark.createDataFrame(
            [(v,) for v in shuffled], "v double"
        ).repartition(parts)
        outs.add(df.agg(_msum(F.col("v")).alias("s")).collect()[0].s)
    assert len(outs) == 1, outs


def test_msum_overflow_fails_loudly(spark):
    """A money total past 2^63 micro-units must FAIL THE QUERY, never
    publish a silently wrapped value — ANSI mode's checked cast/add is
    the load-bearing mechanism (relational.py overflow-discipline
    note); this pins that it actually fires in this session config."""
    from pyspark.errors.exceptions.captured import ArithmeticException

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    # per-row micro fits bigint ($5e12 -> 5e18); 10 rows wrap the SUM
    df = spark.createDataFrame([(5.0e12,)] * 10, "v double").coalesce(1)
    with pytest.raises(ArithmeticException, match="OVERFLOW"):
        df.agg(_msum(F.col("v")).alias("s")).collect()


def test_dollars_decimal_rounding_is_half_up_exact(spark):
    """The tie case double-rounding flubs (measured: DuckDB
    DECIMAL/int -> DOUBLE gives .34): micro total ...345000 must round
    half-up to .35 via the decimal division path."""
    df = spark.createDataFrame([(123456789012345000,)], "m bigint")
    got = df.select(
        _dollars(F.col("m").cast("decimal(38,0)")).alias("d")
    ).collect()[0].d
    assert got == 123456789012.35


def test_registered_money_expressions_nonnegative(spark, sf_dir):
    """_micro's trunc form equals HALF_UP only for NON-NEGATIVE
    summands: cast(y + 0.5 as bigint) truncates toward zero, so a
    negative y (e.g. -2.5) gives trunc(-2.0) = -2 where HALF_UP
    (away from zero) gives -3 — a silent one-micro skew on every
    negative row. That contract lived in a docstring (VERDICT r13
    item 8); this test makes it executable — it enumerates the BASE
    COLUMNS feeding every registered _micro/_msum/_mavg call site
    (operators/relational.py: q1, q3, q5, grouping_analytics,
    pivot/rollup bases) and fails if the data admits a negative
    summand or a discount outside [0, 1] (which would make
    p*(1-d) negative). A future registered money expression over a
    signed column must extend _micro first (widen to the two-stage
    DECIMAL form or re-prove trunc==HALF_UP on negatives)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = li.agg(
        F.min("l_quantity").alias("min_q"),
        F.min("l_extendedprice").alias("min_p"),
        F.min("l_discount").alias("min_d"),
        F.max("l_discount").alias("max_d"),
        F.min("l_tax").alias("min_t"),
    ).collect()[0]
    assert row.min_q >= 0, "l_quantity can go negative: _micro contract broken"
    assert row.min_p >= 0, "l_extendedprice can go negative"
    assert 0 <= row.min_d and row.max_d <= 1, "l_discount outside [0,1]"
    assert row.min_t >= 0, "l_tax can go negative"
    min_tp = orders.agg(F.min("o_totalprice").alias("m")).collect()[0].m
    assert min_tp >= 0, "o_totalprice can go negative"
    # The derived forms are products of non-negative factors given the
    # bounds above — spot-check the fully composed worst case anyway.
    worst = li.agg(
        F.min(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("m")
    ).collect()[0].m
    assert worst >= 0
