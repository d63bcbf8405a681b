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
