"""Local oracle harness: replicate the driver's DuckDB comparison so
mismatches are caught before a round's verify.

Compare protocol (per driver contract): row count + schema + an
order-insensitive value comparison with columns sorted by name. Floats
are compared with a small tolerance here and reported as WARN when not
bitwise equal — the real driver hashes values, so any WARN must be
fixed by rounding in BOTH the Spark query and the oracle.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
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
    detail: str = ""
    mismatches: list = field(default_factory=list)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def _canon(v):
    """Canonicalize a cell for multiset comparison."""
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rows_to_multiset(rows, col_order):
    return sorted(
        (tuple(_canon(r[i]) for i in col_order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def _float_close(a, b) -> bool:
    if a is None or b is None:
        return a is b
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
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    rel = con.execute(oracle_sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()

    columns_match = sorted(s_cols) == sorted(d_cols)
    row_count_match = len(s_rows) == len(d_rows)
    if not columns_match:
        return CompareResult(
            name, False, row_count_match, False, False, False,
            f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}",
        )

    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]
    s_ms = _rows_to_multiset(s_rows, s_order)
    d_ms = _rows_to_multiset(d_rows, d_order)

    exact = s_ms == d_ms
    values_match = exact
    mismatches = []
    if not exact and row_count_match:
        # Tolerant pass: pair sorted rows and allow float wiggle.
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

    ok = columns_match and row_count_match and values_match
    detail = ""
    if not row_count_match:
        detail = f"rows spark={len(s_rows)} duckdb={len(d_rows)}"
    elif not values_match:
        detail = f"first mismatches: {mismatches[:2]}"
    elif not exact:
        detail = "WARN float-tolerant only — round in both sides"
    return CompareResult(
        name, ok, row_count_match, columns_match, values_match, exact, detail, mismatches
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
                CompareResult(qname, n >= 0, True, True, True, True, f"rows-only: {n}")
            )
            continue
        try:
            results.append(compare(qname, spec.build(spark, sf_dir), spec.oracle, con))
        except Exception as e:  # surface which query died
            results.append(
                CompareResult(qname, False, False, False, False, False, f"EXC {type(e).__name__}: {e}")
            )
    return results
