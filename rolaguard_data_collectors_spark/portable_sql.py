"""Portable SQL fragments that evaluate identically in Spark SQL and
DuckDB (verified by probe: md5/substr/instr/regexp_extract/printf/
date_trunc/round share semantics across both engines).

These let LSH/minhash/simhash-style operators have exact DuckDB
oracles: the hash function is defined once as a SQL fragment instead
of relying on engine-specific hash() builtins (Spark murmur3 vs DuckDB
xxhash would never match).
"""

from __future__ import annotations

# 32-bit hash from the first 8 hex chars of md5(expr). The explicit
# digit-by-digit hex parse avoids engine-specific hex->int casts
# (Spark `conv` doesn't exist in DuckDB 1.0; DuckDB '0x' casts don't
# exist in Spark). CAST ... AS BIGINT keeps Spark's ANSI mode from
# overflowing on the int32 multiply.
HEX32_TEMPLATE = "(" + " + ".join(
    f"CAST(instr('0123456789abcdef', substr(md5({{e}}), {i + 1}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
) + ")"

# A large prime for modular hashing families: h_i(x) = (a_i*h + b_i) % P.
HASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne)


def hex32(expr: str) -> str:
    """Portable 32-bit hash of a string SQL expression."""
    return HEX32_TEMPLATE.format(e=expr)


# Digit-parse of an ALREADY-COMPUTED 8-hex-char md5 prefix. hex32()
# inlines md5({e}) into each of its 8 digit terms — free under
# whole-stage codegen (subexpression elimination), but inside
# higher-order-function lambdas (interpreted, no CSE) every element
# would pay 8 md5 calls. Hash arrays in two transform steps instead:
# transform(xs, s -> substr(md5(s), 1, 8)) then transform(ms, m ->
# hex32_of_prefix('m')) — the lambda variable is a bound value, so the
# 8 digit terms reference it for free.
HEX32_PREFIX_TEMPLATE = "(" + " + ".join(
    f"CAST(instr('0123456789abcdef', substr({{m}}, {i + 1}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
) + ")"


def hex32_of_prefix(expr: str) -> str:
    """hex32 given an expression that is already substr(md5(x), 1, 8)."""
    return HEX32_PREFIX_TEMPLATE.format(m=expr)


def hex32_array(array_expr: str, lambda_var: str = "s") -> str:
    """Portable-hash every element of a string-array SQL expression
    with ONE md5 per element (see HEX32_PREFIX_TEMPLATE): the
    md5-prefix transform runs first, the digit parse second."""
    return (
        f"transform(transform({array_expr}, {lambda_var} -> "
        f"substr(md5({lambda_var}), 1, 8)), _m -> {hex32_of_prefix('_m')})"
    )


# Spark-ONLY spellings of the same hash (optimization round 13, guide
# §4.1): inside higher-order-function lambdas every expression node is
# INTERPRETED (no codegen, no CSE), so the 8-term digit parse costs
# ~34 node evaluations per element. Spark's `conv(hex, 16, 10)` parses
# the same 8 lowercase hex chars in ONE call — bit-identical value
# (conv is case-insensitive, 8 hex digits < 2^32 cannot overflow, CAST
# of its decimal string to BIGINT is exact). DuckDB 1.x has no conv(),
# which is why the ORACLE strings must keep the digit-parse templates
# above; the two spellings are value-equal, which every oracle parity
# row re-proves per run.


def hex32_spark(expr: str) -> str:
    """hex32() value via conv() — Spark-side expressions only."""
    return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def hex32_array_spark(array_expr: str, lambda_var: str = "s") -> str:
    """hex32_array() value via conv() — Spark-side expressions only.
    One transform (md5 + substr + conv per element) instead of two."""
    return (
        f"transform({array_expr}, {lambda_var} -> "
        f"CAST(conv(substr(md5({lambda_var}), 1, 8), 16, 10) AS BIGINT))"
    )


def minhash_term(expr: str, a: int, b: int) -> str:
    """One member of a universal-ish hash family over hex32(expr)."""
    return f"(({a} * {hex32(expr)} + {b}) % {HASH_PRIME})"


def hex_byte(expr: str) -> str:
    """Parse a 2-hex-char SQL string expression to its 0-255 int value
    (portable byte extraction for wire-format field slicing)."""
    return (
        f"((instr('0123456789abcdef', substr({expr}, 1, 1)) - 1) * 16"
        f" + instr('0123456789abcdef', substr({expr}, 2, 1)) - 1)"
    )
