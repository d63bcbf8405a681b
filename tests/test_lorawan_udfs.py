"""Spark-side LoRaWAN query checks: the UDF pipeline must reproduce
the codec's ground truth through the full plan (encode -> decode ->
MIC), and the brute-force query must crack exactly the planted keys."""

import pytest
from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.functions.lorawan_queries import (
    lorawan_decode_roundtrip,
    lorawan_join_workflow,
    lorawan_key_bruteforce,
)
from rolaguard_data_collectors_spark.functions import lorawan_codec as lc


@pytest.fixture(scope="module")
def roundtrip(spark, sf_dir):
    return lorawan_decode_roundtrip(spark, sf_dir).collect()


def test_decode_roundtrip_all_rows_clean(roundtrip):
    assert len(roundtrip) > 0
    assert all(r.error is None for r in roundtrip)
    assert all(r.mic_ok for r in roundtrip)
    assert all(r.m_type == "UnconfirmedDataUp" for r in roundtrip)


def test_decode_roundtrip_payload_matches_source(roundtrip, spark, sf_dir):
    from rolaguard_data_collectors_spark.catalog import load_table

    ev = {
        r.event_id: r
        for r in load_table(spark, sf_dir, "events").select("event_id", "props", "user_id").collect()
    }
    for r in roundtrip[:50]:
        src = ev[r.event_id]
        assert r.payload_text == (src.props or "")
        assert r.dev_addr == f"{src.user_id:08x}"
        assert r.f_count == r.event_id % 65536


def test_join_workflow_keys_match_codec(spark, sf_dir):
    rows = lorawan_join_workflow(spark, sf_dir).collect()
    assert rows and all(r.mic_ok for r in rows)
    r = rows[0]
    uid = int(r.dev_eui, 16)
    app_key = __import__("hashlib").md5(f"app-{uid % 8}".encode()).hexdigest()
    nwk, app = lc.derive_session_keys(
        bytes.fromhex(app_key), bytes.fromhex("010203"), bytes.fromhex("130000"), r.dev_nonce
    )
    assert r.nwk_s_key == nwk.hex()
    assert r.app_s_key == app.hex()
    assert r.m_type == "JoinRequest"


def test_bruteforce_cracks_only_planted_keys(spark, sf_dir):
    cracked = lorawan_key_bruteforce(spark, sf_dir).collect()
    assert cracked, "expected at least one cracked frame"
    import hashlib

    for r in cracked:
        assert r.cracked_key == hashlib.md5(f"dev-{r.user_id}".encode()).hexdigest()


def _go_keyspaces(n: int):
    """Independent Python transcription of the reference's key loops
    (lorawanWrapper.go:283-306): byte-for-byte ground truth."""
    fams = {1: [], 2: [], 3: []}
    for idx in range(n):
        i, j = idx >> 8, idx & 0xFF
        key1 = bytes([i] + [j] * 15)
        key2 = bytes([i, j] * 8)
        key3 = bytes([0] * 14 + [i, j])
        fams[1].append(key1.hex())
        fams[2].append(key2.hex())
        fams[3].append(key3.hex())
    return fams


def test_reference_keyspaces_byte_parity(spark):
    """The in-plan keyspace generation must equal the Go loops
    byte-for-byte over a ~10k-key prefix of each family (the full
    sweep is the same expressions over a longer range)."""
    from rolaguard_data_collectors_spark.functions.lorawan_queries import (
        reference_keyspaces,
    )

    n = 10000
    got = {1: [], 2: [], 3: []}
    for r in reference_keyspaces(spark, n).collect():
        got[r.family].append(r.cand_key)
    want = _go_keyspaces(n)
    for fam in (1, 2, 3):
        assert len(got[fam]) == n
        assert sorted(got[fam]) == sorted(want[fam]), f"family {fam} diverges"
    # spot-check exact membership at the uint8 boundaries the Go loop
    # special-cases (i/j == 255)
    full = _go_keyspaces(65536)
    assert full[1][-1] == "ff" + "ff" * 15
    assert full[2][-1] == "ffff" * 8
    assert full[3][-1] == "00" * 14 + "ffff"


def test_bruteforce_always_cracks_with_true_key(spark, sf_dir):
    """Self-consistency of the op-46 suite: the planted per-device key
    must authenticate every sampled frame (AES-CMAC is deterministic),
    so each frame row-group contains exactly one is_true_key survivor."""
    from rolaguard_data_collectors_spark.functions.lorawan_queries import (
        lorawan_key_bruteforce,
    )

    rows = lorawan_key_bruteforce(spark, sf_dir).collect()
    assert rows, "bruteforce produced no survivors"
    by_frame: dict[int, int] = {}
    for r in rows:
        if r.is_true_key:
            by_frame[r.event_id] = by_frame.get(r.event_id, 0) + 1
    frames = {r.event_id for r in rows}
    assert set(by_frame) == frames, "some frame was not cracked by its true key"
    assert all(n == 1 for n in by_frame.values())


def test_pruned_decode_matches_full(spark, sf_dir):
    """decode_phypayload_for(fields) must agree with the full UDF on
    every requested field, for real frames, a malformed frame, and a
    null — the pruning is a serialization optimization, never a
    semantic change."""
    from rolaguard_data_collectors_spark.functions.lorawan_udfs import (
        decode_phypayload,
        decode_phypayload_for,
    )

    frames = [
        ("QMTBfwEAEQBd6f1YJ+K7NmuNmy/JpHTFQKI=",),  # golden data-up
        ("AAEBAQEBAQEBAgICAgICAgIwOUr/h8c=",),       # join-request shape
        ("%%%not-base64%%%",),
        (None,),
    ]
    df = spark.createDataFrame(frames, "data string")
    fields = ("m_type", "dev_eui", "dev_addr", "f_count", "mic", "error")
    full = df.select(
        decode_phypayload("data", F.lit(None), F.lit(None)).alias("p")
    ).select(*[F.col("p")[f].alias(f) for f in fields])
    pruned = df.select(
        decode_phypayload_for(fields)("data", F.lit(None), F.lit(None)).alias("p")
    ).select(*[F.col("p")[f].alias(f) for f in fields])
    assert full.schema == pruned.schema
    assert sorted(map(tuple, full.collect()), key=repr) == sorted(
        map(tuple, pruned.collect()), key=repr
    )


def test_pruned_decode_rejects_unknown_field():
    from rolaguard_data_collectors_spark.functions.lorawan_udfs import (
        decode_phypayload_for,
    )

    with pytest.raises(ValueError, match="unknown parse fields"):
        decode_phypayload_for(("m_type", "nope"))


def test_frame_sample_memo_invalidates_on_regeneration(spark, tmp_path):
    """The driver-side artifact memos (frame sample, history bloom, PQ
    prep) key on catalog.content_identity — input files + mtimes — so
    a dataset regenerated IN-PLACE must produce a fresh artifact: a
    stale frame sample would sweep the wrong frames (and a stale bloom
    is the forbidden false-negative state). Proven end-to-end on the
    frame-sample memo."""
    import os
    import shutil
    import time

    import pandas as pd

    from rolaguard_data_collectors_spark.catalog import content_identity
    from rolaguard_data_collectors_spark.functions.lorawan_queries import (
        _frame_sample,
    )

    d = tmp_path / "sf_regen"
    d.mkdir()

    def write_events(n):
        rows = [
            {
                "event_id": i,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
                "user_id": i % 3 + 1,
                "event_type": "purchase",
                "value": float(i),
                "props": '{"k": 1}',
            }
            for i in range(n)
        ]
        pdf = pd.DataFrame(rows)
        pdf["user_id"] = pdf["user_id"].astype("Int64")
        tmp = d / "events.parquet.tmp"
        pdf.to_parquet(tmp, index=False)
        shutil.move(str(tmp), str(d / "events.parquet"))

    write_events(200)  # event_id % 97 == 0 -> frames 0, 97, 194
    s1 = _frame_sample(spark, str(d))
    assert len(s1) == 3
    id1 = content_identity(str(d), spark.read.parquet(str(d / "events.parquet")))

    # regenerate IN-PLACE with different content (and a newer mtime —
    # content_identity keys on mtime_ns, so nudge the clock if the
    # filesystem is coarse)
    time.sleep(0.05)
    write_events(100)  # frames 0, 97 only
    os.utime(d / "events.parquet")
    id2 = content_identity(str(d), spark.read.parquet(str(d / "events.parquet")))
    assert id1 != id2, "content identity must change on in-place regeneration"

    s2 = _frame_sample(spark, str(d))
    assert len(s2) == 2, "stale frame sample served after regeneration"


def test_ja_crack_cracks_only_planted_app_keys(spark, sf_dir):
    """op 46 JoinAccept side: every sampled signup JA is cracked by
    exactly its planted per-app AppKey (md5('app-<uid%8>')) and by
    nothing else in the structured candidate prefix."""
    import hashlib

    from rolaguard_data_collectors_spark.functions.lorawan_queries import (
        lorawan_ja_crack,
    )

    rows = lorawan_ja_crack(spark, sf_dir).collect()
    assert rows, "ja_crack produced no survivors"
    by_frame: dict[int, int] = {}
    for r in rows:
        want = hashlib.md5(b"app-%d" % (r.user_id % 8)).hexdigest()
        assert r.cracked_key == want
        assert r.is_true_key
        by_frame[r.event_id] = by_frame.get(r.event_id, 0) + 1
    assert all(n == 1 for n in by_frame.values())


def test_ja_crack_udf_matches_codec_kernel(spark, sf_dir):
    """The broadcast-sample Arrow UDF returns exactly what the codec
    kernel computes frame-by-frame for the same candidate keys."""
    from rolaguard_data_collectors_spark.functions.lorawan_queries import (
        _ja_frame_sample,
        _true_app_key_bytes,
    )
    from rolaguard_data_collectors_spark.functions.lorawan_udfs import (
        make_ja_crack_udf,
    )

    sample = _ja_frame_sample(spark, sf_dir)
    assert sample, "empty JoinAccept sample"
    cands = [bytes([i] * 16).hex() for i in range(6)] + [
        _true_app_key_bytes(sample[0][1]).hex()
    ]
    udf = make_ja_crack_udf(spark, sample)
    df = spark.createDataFrame([(c,) for c in cands], ["cand_key"])
    got = {
        r.cand_key: sorted((h.event_id, h.user_id) for h in r.hits)
        for r in df.select("cand_key", udf("cand_key").alias("hits")).collect()
    }
    frames = [(r[2], r[3]) for r in sample]
    for c in cands:
        flags = lc.ja_survivors(bytes.fromhex(c), frames)
        want = sorted(
            (sample[i][0], sample[i][1]) for i, ok in enumerate(flags) if ok
        )
        assert got[c] == want
    udf.frames_broadcast.unpersist()


def test_crack_combined_equals_standalone_legs(spark, sf_dir):
    """The fused bruteforce+ja_crack leg (round 13: one candidate
    relation, both kernels in a single Arrow pass) must emit EXACTLY
    the rows of the two standalone legs' union — the fusion is a plan
    change, not a semantics change. The combined candidate set is a
    superset per stage (dev keys visible to the JA kernel and vice
    versa); any cross-family survivor would surface here as an extra
    row."""
    from rolaguard_data_collectors_spark.functions.lorawan_queries import (
        security_suite_legs,
    )

    legs = security_suite_legs(spark, sf_dir)
    key = lambda r: (r.stage, r.event_id, r.user_id, r.cracked_key,
                     r.is_true_key)
    sep = sorted(
        key(r)
        for r in legs["bruteforce"].unionByName(legs["ja_crack"]).collect()
    )
    comb = sorted(key(r) for r in legs["crack_combined"].collect())
    assert comb == sep
    assert comb, "empty crack output"
