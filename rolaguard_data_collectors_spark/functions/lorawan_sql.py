"""Pure-Catalyst LoRaWAN PHY decode for the no-key, non-crypto field
subset (optimization round 14, guide §4.1 "prefer built-ins").

``decode_phypayload_expr`` reproduces ``lorawan_codec.
parse_phypayload_b64(data, None, None)`` — byte slicing only, no
FRMPayload decrypt, no MIC, no MAC-command JSON — as a JVM expression
struct, so the normalize pipelines' pruned decode runs inside
whole-stage codegen instead of an ArrowEvalPython crossing (measured:
the crossing cost 0.48 s of the 1.20 s staged-union materialization at
sf0.1 and the saving is row-count-proportional at scale; the crossing
cost is pure Arrow serialization — feeding the same UDF all-NULL input
measured 1.01 vs 0.98 s, so only REMOVING the crossing recovers it).

Exactness contract (pinned by tests/test_decode_expr.py, 600k-case
fuzz during development: 0 diffs):

- Base64 leniency: the Python reference is ``base64.b64decode(data +
  pad)`` with ``validate=False`` (CPython binascii non-strict mode).
  Its observable semantics, reverse-engineered and fuzz-verified:
  (1) any non-ASCII character anywhere -> error;
  (2) non-alphabet ASCII characters are discarded;
  (3) a ``=`` whose preceding alphabet-char count %% 4 is 0 or 1 is
      discarded; at 3 it completes the quad and decoding STOPS; at 2
      it completes the quad iff the next significant character is
      ``=`` (then STOPS), else the ``=`` itself is discarded;
  (4) end of input with alphabet count %% 4 != 0 -> error.
  The expression canonicalizes the input to a strict base64 string (or
  NULL for the error rows) and feeds ONLY that to ``unbase64`` — ANSI
  mode can never throw. The common shape (pure alphabet + optional
  trailing padding) takes a regex fast path; hostile shapes run an
  interpreted ``aggregate`` scan of the ``split``-by-``=`` parts.
- Field semantics: identical partial-population on parse errors
  (m_type/major/mic survive a bad JoinRequest/FHDR length; nothing
  survives a base64 error or a frame under 5 bytes), little-endian
  hex rendering via byte-pair reversal, FCtrl flag splits by uplink
  direction, and the f_opts_len skip for f_port — all mirroring
  ``parse_phypayload`` line by line (error-path order included:
  fields assigned BEFORE the failing length check keep their values).

Fields NOT expressible here (f_opts needs the MAC-command JSON
marshaller, frm_payload/mic_ok need keys, error embeds CPython
exception text): callers fall back to the Arrow UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .lorawan_codec import MTYPES, UPLINK_MTYPES

# Fields decode_phypayload_expr can produce with UDF-identical values.
EXPR_SAFE_FIELDS = frozenset(
    {
        "m_type", "major", "mic", "join_eui", "dev_eui", "dev_nonce",
        "dev_addr", "adr", "ack", "adr_ack_req", "f_pending", "class_b",
        "f_count", "f_port",
    }
)

# Already-canonical base64 (full quads + exact padding, \z not $ —
# Java's $ matches before a trailing newline): the wire shape of every
# well-formed frame — passes through untouched, ONE regex per row on
# the hot path.
_CANONICAL_B64_RE = (
    r"^(?:[A-Za-z0-9+/]{4})*"
    r"(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?\z"
)
_NON_ASCII_RE = r"[^\x00-\x7F]"
_NON_B64_RE = r"[^A-Za-z0-9+/=]"


def _lenient_b64(data: Column) -> Column:
    """The padding scan (docstring rules 2-4) for NON-canonical
    shapes, as an ``aggregate`` fold over the '='-split parts.

    Deliberately a higher-order function: HOFs are CodegenFallback, so
    the whole scan compiles to ONE interpreted-eval call site in the
    generated code instead of inlining its expression tree. Two
    earlier forms were measured slower for exactly that reason
    (same-session A/Bs on the mqtt source at sf0.1): an inline
    anchored-regex scan never executed on a single hot row and still
    cost +0.32 s of generated-code bloat (1.04 vs 0.72 s with the
    branch stubbed out — JIT declines huge generated methods), and an
    unstaged fold inlined per FIELD made every consumer interpreted
    (0.49 s/500k rows, no better than the Arrow UDF it replaced).
    Interpreted evaluation here is fine: only hostile rows — shapes
    that already failed the canonical regex — ever reach this branch.

    Scan semantics over u (alphabet + '=' only): the j-th part is
    followed by a '=' iff it is not the last part; the char AFTER that
    '=' is '=' iff the next part is empty and another '=' follows. A
    '=' at alphabet-count %% 4 == 3 completes the quad and stops; at 2
    it stops iff the next char is '='; else it is discarded. End of
    input with count %% 4 != 0 is an error (NULL)."""
    padded = F.concat(
        data, F.substring(F.lit("==="), 1, (4 - F.length(data) % 4) % 4)
    )
    u = F.regexp_replace(padded, _NON_B64_RE, "")
    parts = F.split(u, "=", -1)
    n_parts = F.size(parts)
    init = F.struct(
        F.lit("").alias("alpha"),
        F.lit(0).alias("pad"),
        F.lit(False).alias("done"),
    )

    def step(acc, j):
        part = F.element_at(parts, j)
        alpha2 = F.concat(acc["alpha"], part)
        qp = F.length(alpha2) % 4
        has_eq = j < n_parts
        next_is_eq = (j + 1 < n_parts) & (F.element_at(parts, j + 1) == "")
        stop3 = has_eq & (qp == 3)
        stop2 = has_eq & (qp == 2) & next_is_eq
        return F.when(acc["done"], acc).otherwise(
            F.struct(
                alpha2.alias("alpha"),
                F.when(stop3, 1).when(stop2, 2).otherwise(0).alias("pad"),
                (stop3 | stop2).alias("done"),
            )
        )

    def finish(acc):
        ok_end = acc["done"] | (F.length(acc["alpha"]) % 4 == 0)
        return F.when(
            ok_end,
            F.concat(acc["alpha"], F.substring(F.lit("=="), 1, acc["pad"])),
        )

    return F.aggregate(F.sequence(F.lit(1), n_parts), init, step, finish)


def _canonical_b64(data: Column) -> Column:
    """NULL (= decode error) or a strict, fully padded base64 string
    whose ``unbase64`` equals the Python reference's decoded bytes."""
    return (
        # Hot path: a well-formed frame is already canonical and
        # passes through after ONE regex evaluation (rlike on NULL
        # data yields NULL -> falls through to the NULL default).
        # Everything else — non-ASCII is an outright error (CPython
        # b64decode ascii-encodes first), the rest runs the lenient
        # scan, whose pad-from-original-length step needs the raw
        # ``data`` (not a cleaned form).
        F.when(data.rlike(_CANONICAL_B64_RE), data)
        .when(
            ~data.rlike(_NON_ASCII_RE) & data.isNotNull(),
            _lenient_b64(data),
        )
    )


def decoded_frame_hex(data: Column) -> Column:
    """The decoded frame as a lowercase hex string (NULL on the
    reference's decode-error rows) — the ONE expensive per-row scalar.
    Callers must stage it behind a projection barrier
    (catalog.arrays_barrier) before fanning out into field
    extractions: CollapseProject + SimplifyExtractValueOps otherwise
    inline this chain into every referencing field (measured: the
    inlined form carried 40 unbase64 / 164 regexp_extract nodes in one
    source plan and ran SLOWER than the Arrow UDF it replaced —
    staged, the chain evaluates once and the per-field work is a
    conv/substr over the attribute)."""
    return F.lower(F.hex(F.unbase64(_canonical_b64(data))))


def decode_phypayload_expr(data: Column, fields: tuple[str, ...]) -> Column:
    """Struct column over ``fields`` (must be within EXPR_SAFE_FIELDS;
    emitted in PARSED_FRAME_SCHEMA order) matching the no-key Arrow UDF
    value-for-value. Convenience form over ``decoded_frame_hex`` +
    ``decode_fields_from_hex`` for tests/one-shot use — hot paths
    stage the hex column first (see decoded_frame_hex)."""
    return decode_fields_from_hex(decoded_frame_hex(data), fields)


def decode_fields_from_hex(h: Column, fields: tuple[str, ...]) -> Column:
    """Field extraction over an already-decoded frame-hex column."""
    unknown = set(fields) - EXPR_SAFE_FIELDS
    if unknown:
        raise ValueError(f"fields not expressible in SQL: {sorted(unknown)}")

    n = (F.length(h) / 2).cast("int")  # byte length

    def byte(i: int) -> Column:
        """0-based byte value at a static offset."""
        return F.conv(F.substring(h, 2 * i + 1, 2), 16, 10).cast("int")

    def le_hex(off: int, nbytes: int) -> Column:
        """Little-endian (reversed byte order) lowercase hex of
        raw[off:off+nbytes] — the codec's ``_le``."""
        return F.concat(
            *[
                F.substring(h, 2 * (off + k) + 1, 2)
                for k in reversed(range(nbytes))
            ]
        )

    b0 = byte(0)
    mtype_i = F.shiftright(b0, 5)
    major_i = b0.bitwiseAND(F.lit(3))
    base_ok = h.isNotNull() & (n >= 5)
    # len(raw) == 23 <=> JoinRequest body is exactly 18 bytes
    jr_ok = base_ok & (mtype_i == 0) & (n == 23)
    # len(raw) >= 12 <=> FHDR's 7 mandatory body bytes are present
    data_ok = base_ok & mtype_i.isin(2, 3, 4, 5) & (n >= 12)
    uplink_idx = [i for i, t in enumerate(MTYPES) if t in UPLINK_MTYPES]
    uplink = mtype_i.isin(*uplink_idx)
    fctrl = byte(5)
    bit = lambda mask: fctrl.bitwiseAND(F.lit(mask)) != 0  # noqa: E731
    fol = fctrl.bitwiseAND(F.lit(0x0F))
    # f_port = body[7 + f_opts_len] when the rest is non-empty
    # (body_len = n - 5 > 7 + fol); 0-based raw offset 8 + fol.
    f_port = F.conv(
        h.substr(F.lit(17) + fol * 2, F.lit(2)), 16, 10
    ).cast("int")

    exprs = {
        "m_type": F.when(
            base_ok, F.element_at(F.array(*[F.lit(t) for t in MTYPES]), mtype_i + 1)
        ),
        "major": F.when(
            base_ok,
            F.when(major_i == 0, F.lit("LoRaWANR1")).otherwise(
                F.concat(F.lit("RFU"), major_i.cast("string"))
            ),
        ),
        "mic": F.when(base_ok, F.substring(h, -8, 8)),
        "join_eui": F.when(jr_ok, le_hex(1, 8)),
        "dev_eui": F.when(jr_ok, le_hex(9, 8)),
        "dev_nonce": F.when(jr_ok, byte(18) * 256 + byte(17)).cast("int"),
        "dev_addr": F.when(data_ok, le_hex(1, 4)),
        "adr": F.when(data_ok, bit(0x80)),
        "ack": F.when(data_ok, bit(0x20)),
        "adr_ack_req": F.when(data_ok & uplink, bit(0x40)).when(
            data_ok, F.lit(False)
        ),
        "class_b": F.when(data_ok & uplink, bit(0x10)).when(
            data_ok, F.lit(False)
        ),
        "f_pending": F.when(data_ok & ~uplink, bit(0x10)).when(
            data_ok, F.lit(False)
        ),
        "f_count": F.when(data_ok, byte(7) * 256 + byte(6)).cast("bigint"),
        "f_port": F.when(data_ok & (n > fol + 12), f_port),
    }
    # PARSED_FRAME_SCHEMA order, filtered — same layout rule as
    # decode_phypayload_for.
    from .lorawan_udfs import _FIELDS

    return F.struct(
        *[exprs[f].alias(f) for f in _FIELDS if f in set(fields)]
    )
