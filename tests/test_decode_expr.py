"""decode_phypayload_expr (pure-Catalyst pruned decode) must be
value-identical to the Arrow UDF (parse_phypayload_b64, no keys) on
every input class: real frames of every m_type (all FCtrl flag
combinations, every f_opts_len 0-15 including lengths that overrun the
body, empty/partial FRMPayload), truncation ladders, and hostile
base64 (padding residues, embedded whitespace/invalid chars, mid-string
'=', non-ASCII, empty, NULL). The JVM path is what the four registered
pipeline queries execute; this test is the exactness contract that
lets it replace the crossing (optimization round 14, guide §4.1)."""

from __future__ import annotations

import base64
import random

import pytest
from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.functions import lorawan_codec as lc
from rolaguard_data_collectors_spark.functions.lorawan_sql import (
    EXPR_SAFE_FIELDS,
    decode_phypayload_expr,
)

FIELDS = tuple(
    f for f in (
        "m_type", "major", "mic", "join_eui", "dev_eui", "dev_nonce",
        "dev_addr", "adr", "ack", "adr_ack_req", "f_pending", "class_b",
        "f_count", "f_port",
    )
)


def _frame_corpus() -> list[str | None]:
    rng = random.Random(1405)
    frames: list[str | None] = [None, "", " ", "="]
    # every MHDR value (all 8 m_types x 4 major bits), minimal bodies
    for mhdr in range(0, 256, 4):
        for body_len in (0, 3, 7, 12, 18, 19, 23):
            raw = bytes([mhdr]) + bytes(
                rng.randrange(256) for _ in range(body_len)
            )
            frames.append(base64.b64encode(raw).decode())
    # data frames: every f_opts_len, with/without rest, boundary overruns
    for mhdr in (0x40, 0x60, 0x80, 0xA0):  # all DATA m_types
        for fol in range(16):
            for extra in (0, 1, 2, 5):
                body = (
                    bytes(rng.randrange(256) for _ in range(4))  # devaddr
                    + bytes([((rng.randrange(16)) << 4) | fol])  # fctrl
                    + bytes(rng.randrange(256) for _ in range(2))  # fcnt
                    + bytes(rng.randrange(256) for _ in range(fol + extra))
                )
                raw = bytes([mhdr]) + body + bytes(4)  # + mic
                frames.append(base64.b64encode(raw).decode())
                # truncated variant: body shorter than 7 + fol
                cut = raw[: max(5, len(raw) - fol - 3)]
                frames.append(base64.b64encode(cut).decode())
    # join requests incl. exact/off-by-one body lengths
    for body_len in (17, 18, 19):
        raw = bytes([0x00]) + bytes(
            rng.randrange(256) for _ in range(body_len)
        ) + bytes(4)
        frames.append(base64.b64encode(raw).decode())
    # hostile base64 shapes (the adversarial-test corpus + fuzz)
    frames += [
        "A", "AB", "ABC", "====", "QQ==extra", "QU JD", "QUJD\n",
        "QMTBfwEAEQBd6f1YJ+K7NmuNmy/JpHTFQKI", "!@#$%^&*", "ééé",
        "QUJD", "Q=UJD", "QQ==", "Zm9vYg=", "QQ=A", "QUJDQ", "QQ==A",
        "QUJDQQ=A", "QQ= =", "hE%kk+i", "QQ==" + "Q" * 8, "\x00\x01\xff",
        "𝄞𝄞𝄞𝄞", "Ж" * 9,
    ]
    mix = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
        "+/= \n\t\x00!@#$%^&*()é"
    )
    for _ in range(400):
        frames.append(
            "".join(rng.choice(mix) for _ in range(rng.randint(0, 40)))
        )
    return frames


def test_expr_decode_matches_udf(spark):
    frames = _frame_corpus()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(frames)], "i int, data string"
    )
    got = {
        r["i"]: r
        for r in df.select(
            "i", decode_phypayload_expr(F.col("data"), FIELDS).alias("p")
        )
        .select("i", "p.*")
        .collect()
    }
    for i, s in enumerate(frames):
        ref = lc.parse_phypayload_b64(s) if s is not None else None
        for f in FIELDS:
            want = getattr(ref, f) if ref is not None else None
            assert got[i][f] == want, (
                f"field {f} diverges for input {s!r}: "
                f"expr={got[i][f]!r} udf={want!r}"
            )


def test_expr_safe_fields_exclude_crypto():
    assert not {"f_opts", "frm_payload", "mic_ok", "error"} & EXPR_SAFE_FIELDS


def test_expr_rejects_unsafe_fields():
    with pytest.raises(ValueError):
        decode_phypayload_expr(F.lit("QQ=="), ("m_type", "f_opts"))
