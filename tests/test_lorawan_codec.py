"""LoRaWAN codec correctness.

Absolute check: the widely-published LoRaWAN 1.0 example frame (the
`lora-packet` library's documented test vector). Relative checks:
encode∘decode = identity across frame types, JoinAccept
encrypt/decrypt round trip, session-key derivation feeding FRMPayload
decrypt, MIC validation + key testing, field parity with the
reference's golden JSON frames (jsonUnmarshaler.go:12-19 — fixtures
only)."""

import base64
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

# Public test vector (lora-packet README): UnconfirmedDataUp frame.
PUBLIC_FRAME_HEX = "40F17DBE4900020001954378762B11FF0D"
PUBLIC_NWK_S_KEY = bytes.fromhex("44024241ed4ce9a68c6a8bc055233fd3")
PUBLIC_APP_S_KEY = bytes.fromhex("ec925802ae430ca77fd3dd73cb2cc588")


def test_public_vector_parse_fields():
    raw = bytes.fromhex(PUBLIC_FRAME_HEX)
    p = lc.parse_phypayload(raw)
    assert p.error is None
    assert p.m_type == "UnconfirmedDataUp"
    assert p.major == "LoRaWANR1"
    assert p.dev_addr == "49be7df1"
    assert p.f_count == 2
    assert p.f_port == 1
    assert p.mic == "2b11ff0d"


def test_public_vector_mic_and_decrypt():
    raw = bytes.fromhex(PUBLIC_FRAME_HEX)
    assert lc.validate_data_mic(raw, PUBLIC_NWK_S_KEY)
    assert not lc.validate_data_mic(raw, PUBLIC_APP_S_KEY)
    p = lc.parse_phypayload(raw, app_s_key=PUBLIC_APP_S_KEY)
    assert bytes.fromhex(p.frm_payload) == b"test"


def test_key_testing_finds_needle():
    raw = bytes.fromhex(PUBLIC_FRAME_HEX)
    candidates = [bytes([i]) * 16 for i in range(8)] + [PUBLIC_NWK_S_KEY]
    assert lc.test_app_keys(raw, candidates) == [PUBLIC_NWK_S_KEY]


def test_join_request_roundtrip_reference_fields():
    # Field values from the reference's golden JoinRequest JSON
    # (jsonUnmarshaler.go:14) — we re-encode with our own key and check
    # the parse inverts the encode bit-exactly.
    app_key = bytes(range(16))
    raw = lc.encode_join_request(app_key, "55d239ac716f234d", "b827eb891cf50003", 51639)
    assert len(raw) == 23
    p = lc.parse_phypayload(raw)
    assert p.m_type == "JoinRequest"
    assert p.join_eui == "55d239ac716f234d"
    assert p.dev_eui == "b827eb891cf50003"
    assert p.dev_nonce == 51639
    assert lc.validate_join_request_mic(raw, app_key)
    assert not lc.validate_join_request_mic(raw, bytes(16))


def test_join_accept_roundtrip_and_session_keys():
    app_key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    app_nonce, net_id = b"\x01\x02\x03", b"\x13\x00\x00"
    ja = lc.encode_join_accept(app_key, app_nonce, net_id, "017fc1c4")
    assert ja[0] == 0x20
    plain = lc.join_accept_decrypt(app_key, ja[1:])
    body, mic = plain[:-4], plain[-4:]
    assert lc.mic_join_accept(app_key, 0x20, body) == mic
    assert body[0:3] == app_nonce
    assert body[3:6] == net_id
    assert body[6:10][::-1].hex() == "017fc1c4"

    nwk, app = lc.derive_session_keys(app_key, app_nonce, net_id, 51639)
    assert nwk != app and len(nwk) == len(app) == 16
    # session keys must decrypt what they encrypted
    frame = lc.encode_data_frame(
        nwk, "017fc1c4", 17, b"hello lorawan", f_port=93, app_s_key=app
    )
    p = lc.parse_phypayload(frame, app_s_key=app)
    assert bytes.fromhex(p.frm_payload) == b"hello lorawan"
    assert lc.validate_data_mic(frame, nwk)


def test_fopts_mac_commands_reference_shape():
    # Downlink with a LinkADRReq in FOpts (reference golden frame
    # jsonUnmarshaler.go:19 carries cid=LinkADRReq dataRate=2 txPower=4
    # chMask=0xFFFF nbRep=1 -> payload bytes 24 ff ff 01).
    nwk = bytes(range(16))
    fopts = bytes([0x03, 0x24, 0xFF, 0xFF, 0x01])
    frame = lc.encode_data_frame(
        nwk, "017fc1c4", 55, b"", f_port=None, uplink=False, adr=True, f_opts=fopts
    )
    p = lc.parse_phypayload(frame)
    assert p.error is None
    assert p.m_type == "UnconfirmedDataDown"
    assert p.adr is True and p.f_pending is False
    assert p.f_count == 55
    cmds = json.loads(p.f_opts)
    assert cmds == [{"cid": "LinkADRReq", "payload": "24ffff01"}]
    assert p.f_port is None


def test_aes_cmac_rfc4493_vectors_and_library_parity():
    """The cached-context CMAC must equal (a) the published RFC 4493
    vectors and (b) the cryptography library primitive on arbitrary
    lengths (including the 0-block and exact-block edge cases)."""
    from cryptography.hazmat.primitives import cmac as _cmac
    from cryptography.hazmat.primitives.ciphers import algorithms

    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    msg = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411e5fbc1191a0a52ef"
        "f69f2445df4f9b17ad2b417be66c3710"
    )
    vectors = [
        (b"", "bb1d6929e95937287fa37d129b756746"),
        (msg[:16], "070a16b46b4d4144f79bdd9dd04a287c"),
        (msg[:40], "dfa66747de9ae63030ca32611497c827"),
        (msg, "51f0bebf7e3b9d92fc49741779363cfe"),
    ]
    for data, want in vectors:
        assert lc.aes_cmac(key, data).hex() == want
    for n in (1, 15, 16, 17, 31, 32, 33, 48):
        data = bytes(range(n % 256)) * (n // max(n % 256, 1) + 1)
        data = data[:n]
        ref = _cmac.CMAC(algorithms.AES(key))
        ref.update(data)
        assert lc.aes_cmac(key, data) == ref.finalize()


def test_mic_ok_in_parse():
    """MIC validation folded into parse: correct key -> True, wrong
    key -> False, no key -> None."""
    raw = bytes.fromhex(PUBLIC_FRAME_HEX)
    assert lc.parse_phypayload(raw, nwk_s_key=PUBLIC_NWK_S_KEY).mic_ok is True
    assert lc.parse_phypayload(raw, nwk_s_key=b"\x00" * 16).mic_ok is False
    assert lc.parse_phypayload(raw).mic_ok is None
    jr = lc.encode_join_request(b"\x01" * 16, "00" * 8, "11" * 8, 7)
    assert lc.parse_phypayload(jr, app_s_key=b"\x01" * 16).mic_ok is True
    assert lc.parse_phypayload(jr, app_s_key=b"\x02" * 16).mic_ok is False


def test_parse_error_routing():
    p = lc.parse_phypayload(b"\x40\x01")
    assert p.error and "Unmarshal error" in p.error
    p2 = lc.parse_phypayload_b64("!!!notbase64!!!")
    assert p2.error


def test_b64_unpadded_accepted():
    raw = bytes.fromhex(PUBLIC_FRAME_HEX)
    b64 = base64.b64encode(raw).decode().rstrip("=")
    p = lc.parse_phypayload_b64(b64)
    assert p.dev_addr == "49be7df1"


@settings(max_examples=50, deadline=None)
@given(
    dev_addr=st.integers(0, 2**32 - 1),
    f_cnt=st.integers(0, 2**16 - 1),
    payload=st.binary(max_size=64),
    f_port=st.integers(1, 223),
    confirmed=st.booleans(),
    uplink=st.booleans(),
    adr=st.booleans(),
    ack=st.booleans(),
)
def test_encode_decode_identity(dev_addr, f_cnt, payload, f_port, confirmed, uplink, adr, ack):
    nwk = bytes.fromhex("44024241ed4ce9a68c6a8bc055233fd3")
    app = bytes.fromhex("ec925802ae430ca77fd3dd73cb2cc588")
    da = f"{dev_addr:08x}"
    frame = lc.encode_data_frame(
        nwk, da, f_cnt, payload, f_port=f_port, confirmed=confirmed,
        uplink=uplink, adr=adr, ack=ack, app_s_key=app,
    )
    p = lc.parse_phypayload(frame, app_s_key=app)
    assert p.error is None
    assert p.dev_addr == da
    assert p.f_count == f_cnt
    assert p.f_port == f_port
    assert p.adr == adr and p.ack == ack
    assert bytes.fromhex(p.frm_payload or "") == payload
    assert lc.validate_data_mic(frame, nwk)


@settings(max_examples=50, deadline=None)
@given(
    payload=st.binary(min_size=1, max_size=32),
    f_cnt=st.integers(0, 2**16 - 1),
    flip_bit=st.integers(0, 7),
    data=st.data(),
)
def test_mic_rejects_any_bit_flip(payload, f_cnt, flip_bit, data):
    """CMAC property: flipping ANY single bit of the frame (MIC input
    or the MIC itself) must fail validation — corruption can't pass."""
    nwk = bytes.fromhex("44024241ed4ce9a68c6a8bc055233fd3")
    frame = bytearray(lc.encode_data_frame(nwk, "0100da30", f_cnt, payload))
    pos = data.draw(st.integers(0, len(frame) - 1))
    frame[pos] ^= 1 << flip_bit
    assert not lc.validate_data_mic(bytes(frame), nwk)


@settings(max_examples=50, deadline=None)
@given(wrong=st.binary(min_size=16, max_size=16))
def test_mic_rejects_wrong_key(wrong):
    nwk = bytes.fromhex("44024241ed4ce9a68c6a8bc055233fd3")
    frame = lc.encode_data_frame(nwk, "0100da30", 7, b"\x01\x02")
    assert lc.validate_data_mic(frame, wrong) == (wrong == nwk)


@settings(max_examples=25, deadline=None)
@given(
    frames=st.lists(
        st.tuples(st.binary(min_size=0, max_size=24), st.integers(0, 2**16 - 1)),
        min_size=1,
        max_size=8,
    ),
    repeats=st.integers(2, 5),
)
def test_decode_udf_memo_matches_per_row_parse(frames, repeats):
    """The decode UDF's per-batch memo must be semantically invisible:
    a batch full of repeated frames decodes identically to parsing each
    row independently."""
    import pandas as pd

    from rolaguard_data_collectors_spark.functions import lorawan_udfs as lu

    nwk = bytes.fromhex("44024241ed4ce9a68c6a8bc055233fd3")
    b64s = []
    for payload, f_cnt in frames:
        raw = lc.encode_data_frame(nwk, "0100da30", f_cnt, payload)
        b64s.extend([base64.b64encode(raw).decode()] * repeats)
    b64s.append(None)

    fn = lu.decode_phypayload.func
    batch = fn(
        pd.Series(b64s), pd.Series([None] * len(b64s)), pd.Series([None] * len(b64s))
    )
    for i, b64 in enumerate(b64s):
        if b64 is None:
            assert batch.iloc[i]["m_type"] is None
            continue
        p = lc.parse_phypayload_b64(b64)
        for f in ("m_type", "dev_addr", "f_count", "f_port", "mic", "error"):
            assert batch.iloc[i][f] == getattr(p, f), (i, f)


# --- op 47 fOpts marshal leg (jsonUnmarshaler.go:76-182 parity) ----------


def test_marshal_mac_commands_name_to_cid_table():
    """Every command name the reference's JSON unmarshal switch maps
    (CIDs 1-15, both capitalization conventions) must marshal to its
    CID byte + spec-size zero payload in its valid direction."""
    cases = [
        # (name, uplink, cid, size)
        ("ResetInd", True, 0x01, 1), ("ResetConf", False, 0x01, 1),
        ("LinkCheckReq", True, 0x02, 0), ("LinkCheckAns", False, 0x02, 2),
        ("LinkADRAns", True, 0x03, 1), ("LinkADRReq", False, 0x03, 4),
        ("DutyCycleAns", True, 0x04, 0), ("DutyCycleReq", False, 0x04, 1),
        ("RXParamSetupAns", True, 0x05, 1), ("RXParamSetupReq", False, 0x05, 4),
        ("DevStatusAns", True, 0x06, 2), ("DevStatusReq", False, 0x06, 0),
        ("NewChannelAns", True, 0x07, 1), ("NewChannelReq", False, 0x07, 5),
        ("RXTimingSetupAns", True, 0x08, 0), ("RXTimingSetupReq", False, 0x08, 1),
        ("TXParamSetupAns", True, 0x09, 0), ("TXParamSetupReq", False, 0x09, 1),
        ("TxParamSetupAns", True, 0x09, 0),  # 1.0.x spec capitalization
        ("DLChannelAns", True, 0x0A, 1), ("DLChannelReq", False, 0x0A, 4),
        ("DlChannelAns", True, 0x0A, 1),
        ("RekeyInd", True, 0x0B, 1), ("RekeyConf", False, 0x0B, 1),
        ("ADRParamSetupAns", True, 0x0C, 0), ("ADRParamSetupReq", False, 0x0C, 1),
        ("DeviceTimeReq", True, 0x0D, 0), ("DeviceTimeAns", False, 0x0D, 5),
        ("ForceRejoinReq", False, 0x0E, 2),
        ("RejoinParamSetupAns", True, 0x0F, 1),
        ("RejoinParamSetupReq", False, 0x0F, 1),
    ]
    for name, uplink, cid, size in cases:
        raw = lc.marshal_mac_commands([{"cid": name}], uplink)
        assert raw == bytes([cid]) + b"\x00" * size, (name, raw.hex())


def test_marshal_mac_commands_rejects_invalid():
    with pytest.raises(ValueError):
        lc.marshal_mac_commands([{"cid": "NotACommand"}], True)
    with pytest.raises(ValueError):  # wrong direction
        lc.marshal_mac_commands([{"cid": "LinkADRReq"}], True)
    with pytest.raises(ValueError):  # payload exceeds spec size
        lc.marshal_mac_commands([{"cid": "LinkADRAns", "payload": "0102"}], True)
    with pytest.raises(ValueError):  # > 15-byte FOptsLen limit
        lc.marshal_mac_commands(
            [{"cid": "LinkCheckAns", "payload": "0102"}] * 6, False
        )


def test_marshal_parse_inverse_and_frame_roundtrip():
    """marshal∘parse == id on wire bytes; parse∘marshal == id on the
    JSON list; and a full data frame carrying fOpts decodes back to
    the same commands."""
    cmds = [
        {"cid": "DevStatusAns", "payload": "ff1f"},
        {"cid": "LinkADRAns", "payload": "07"},
        {"cid": "LinkCheckReq", "payload": ""},
    ]
    raw = lc.marshal_mac_commands(cmds, uplink=True)
    assert lc.parse_mac_commands(raw, uplink=True) == cmds
    # wire -> json -> wire
    assert lc.marshal_mac_commands(
        lc.parse_mac_commands(raw, uplink=True), uplink=True
    ) == raw

    nwk = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    frame = lc.encode_data_frame(
        nwk, "017fc1c4", 17, b"hello", f_port=5, f_opts=cmds
    )
    p = lc.parse_phypayload(frame, nwk_s_key=nwk)
    assert p.error is None and p.mic_ok
    import json
    assert json.loads(p.f_opts) == cmds


# --- stage-vectorized CMAC batch (must be bit-identical to scalar) -------


@given(
    st.lists(st.binary(min_size=0, max_size=80), min_size=1, max_size=200),
    st.binary(min_size=16, max_size=16),
)
@settings(max_examples=25, deadline=None)
def test_aes_cmac_batch_matches_scalar(msgs, key):
    assert lc.aes_cmac_batch(key, msgs) == [lc.aes_cmac(key, m) for m in msgs]


def test_validate_mic_batch_matches_scalar():
    import os
    import random

    random.seed(3)
    key = bytes(range(16))
    frames = []
    for i in range(300):
        raw = lc.encode_data_frame(
            key, "0100da30", i, os.urandom(random.randrange(0, 24)),
            uplink=bool(i % 2), confirmed=bool(i % 3),
        )
        if i % 4 == 0:  # corrupt some MICs
            raw = raw[:-1] + bytes([raw[-1] ^ 1])
        frames.append(raw)
    frames += [lc.encode_join_request(key, "00" * 8, "11" * 8, 5), b"\x00" * 5]
    want = [
        lc.validate_join_request_mic(r, key)
        if r and (r[0] >> 5) == 0
        else lc.validate_data_mic(r, key)
        for r in frames
    ]
    assert lc.validate_mic_batch(frames, key) == want


def test_derive_session_keys_batch_matches_scalar():
    """derive_session_keys_batch must be bit-identical to the scalar
    form for arbitrary nonce/net/devnonce mixes under one key."""
    from hypothesis import given, settings, strategies as st

    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    @settings(max_examples=30, deadline=None)
    @given(
        key=st.binary(min_size=16, max_size=16),
        rows=st.lists(
            st.tuples(
                st.binary(min_size=3, max_size=3),
                st.binary(min_size=3, max_size=3),
                st.integers(min_value=0, max_value=65535),
            ),
            min_size=1,
            max_size=40,
        ),
    )
    def run(key, rows):
        tails = [
            an + ni + dn.to_bytes(2, "little") + b"\x00" * 7
            for an, ni, dn in rows
        ]
        got = lc.derive_session_keys_batch(key, tails)
        want = [lc.derive_session_keys(key, an, ni, dn) for an, ni, dn in rows]
        assert got == want

    run()


# --- op 46, JoinAccept side (testAppKeysWithJoinAccept) -------------------


def test_ja_survivors_finds_exactly_planted_key():
    """decrypt-candidate -> re-MIC (lorawanWrapper.go:505-531): the
    encoding AppKey must survive; structured wrong keys must not."""
    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    frames = []
    for n in range(5):
        raw = lc.encode_join_accept(
            key, bytes([n, 1, 2]), b"\x13\x00\x00", "%08x" % (n + 1)
        )
        prep = lc.ja_crack_prep(raw)
        assert prep is not None and prep[0] == 0x20 and len(prep[1]) == 16
        frames.append(prep)
    wrong = [bytes([i] + [j] * 15) for i in range(4) for j in range(256)]
    assert lc.test_app_keys_with_join_accept(
        lc.encode_join_accept(key, b"\x09\x08\x07", b"\x13\x00\x00", "0a0b0c0d"),
        wrong + [key],
    ) == [key]
    flags = lc.ja_survivors(key, frames)
    assert flags == [True] * len(frames)
    for w in wrong[:64]:
        assert lc.ja_survivors(w, frames) == [False] * len(frames)


def test_ja_survivors_matches_scalar_decrypt_remic():
    """The batched kernel is bit-identical to the per-frame scalar
    form (decrypt -> mic_join_accept compare)."""
    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    keys = [bytes([k] * 16) for k in range(8)]
    frames = []
    for n in range(6):
        raw = lc.encode_join_accept(
            keys[n % 3], bytes([n, 0, 0]), b"\x01\x02\x03", "%08x" % n
        )
        frames.append(lc.ja_crack_prep(raw))
    for key in keys:
        want = []
        for mhdr, body in frames:
            dec = lc.join_accept_decrypt(key, body)
            want.append(lc.mic_join_accept(key, mhdr, dec[:-4]) == dec[-4:])
        assert lc.ja_survivors(key, frames) == want


def test_ja_crack_prep_rejects_non_joinaccept():
    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    key = bytes(16)
    ja = lc.encode_join_accept(key, b"\x00\x00\x00", b"\x00\x00\x00", "00000001")
    assert lc.ja_crack_prep(ja) is not None
    # wrong m_type (JoinRequest MHDR), wrong length, empty
    jr = lc.encode_join_request(key, "0102030405060708", "1112131415161718", 258)
    assert lc.ja_crack_prep(jr) is None
    assert lc.ja_crack_prep(ja[:-1]) is None
    assert lc.ja_crack_prep(b"") is None
    assert lc.ja_crack_prep(None) is None


def test_ja_reference_comment_vector_shape():
    """The reference repo's own JoinAccept example
    (jsonUnmarshaler.go:15: macPayload 'HWxw2bAlEDfZF8xu', mic
    'fc1ede82') reassembles to a 17-byte wire frame our prep accepts
    with the JoinAccept MHDR — and no structured-prefix key cracks it
    (its AppKey is not in the planted set)."""
    import base64

    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    raw = b"\x20" + base64.b64decode("HWxw2bAlEDfZF8xu") + bytes.fromhex("fc1ede82")
    prep = lc.ja_crack_prep(raw)
    assert prep is not None and prep[0] == 0x20 and len(prep[1]) == 16
    wrong = [bytes([0] * 14 + [i, j]) for i in range(16) for j in range(256)]
    assert lc.test_app_keys_with_join_accept(raw, wrong) == []


# --- key-batched numpy AES kernel (round 12, VERDICT r11 item 6) ----------


def test_np_aes_fips197_vector():
    """FIPS-197 appendix C.1: the public AES-128 known-answer test."""
    import numpy as np

    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = lc.aes128_expand_keys_np(
        np.frombuffer(key, dtype=np.uint8).reshape(1, 16)
    )
    got = lc.aes128_encrypt_blocks_np(
        rk, np.zeros(1, dtype=np.intp),
        np.frombuffer(pt, dtype=np.uint8).reshape(1, 16),
    )[0].tobytes()
    assert got == bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")


@given(st.integers(0, 2**128 - 1), st.integers(0, 2**128 - 1))
@settings(max_examples=50, deadline=None)
def test_np_aes_matches_openssl(key_int, block_int):
    """The T-table kernel is bit-identical to the OpenSSL-backed
    scalar path on arbitrary (key, block) pairs."""
    import numpy as np

    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    key = key_int.to_bytes(16, "big")
    block = block_int.to_bytes(16, "big")
    rk = lc.aes128_expand_keys_np(
        np.frombuffer(key, dtype=np.uint8).reshape(1, 16)
    )
    got = lc.aes128_encrypt_blocks_np(
        rk, np.zeros(1, dtype=np.intp),
        np.frombuffer(block, dtype=np.uint8).reshape(1, 16),
    )[0].tobytes()
    assert got == lc.aes128_encrypt(key, block)


def test_ja_survivors_batch_matches_scalar():
    """ja_survivors_batch (key-batched numpy sweep kernel) returns
    exactly ja_survivors' per-key flags — planted key cracks all
    frames, structured non-keys crack none — across the internal
    cache-chunk boundary (chunk size for 12 frames is 491, so 1200
    keys exercises multi-chunk reassembly)."""
    import hashlib

    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    app_key = hashlib.md5(b"app-3").digest()
    frames = []
    for i in range(12):
        ja = lc.encode_join_accept(
            app_key, i.to_bytes(3, "little"), b"\x13\x00\x00", "%08x" % i
        )
        frames.append(lc.ja_crack_prep(ja))
    cands = [hashlib.md5(b"not-%d" % i).digest() for i in range(1200)]
    cands.insert(777, app_key)
    flags = lc.ja_survivors_batch(cands, frames)
    assert flags.shape == (len(cands), len(frames))
    for row, key in enumerate(cands):
        want = lc.ja_survivors(key, frames)
        assert list(flags[row]) == want, row
    assert flags[777].all()
    assert flags.sum() == len(frames)


def test_ja_survivors_batch_empty_edges():
    import hashlib

    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    key = hashlib.md5(b"app-0").digest()
    ja = lc.encode_join_accept(key, b"\x01\x00\x00", b"\x13\x00\x00", "0000002a")
    frames = [lc.ja_crack_prep(ja)]
    assert lc.ja_survivors_batch([], frames).shape == (0, 1)
    assert lc.ja_survivors_batch([key], []).shape == (1, 0)


def test_ja_survivors_batch_mixed_body_lengths():
    """16- and 32-byte bodies (without/with CFList) in ONE sample:
    the kernel groups by body length; survivors must still be exact
    per (key, frame)."""
    import hashlib

    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    k_a = hashlib.md5(b"app-a").digest()
    k_b = hashlib.md5(b"app-b").digest()
    frames = []
    for i, key in enumerate([k_a, k_b, k_a]):
        ja = lc.encode_join_accept(
            key, i.to_bytes(3, "little"), b"\x13\x00\x00", "%08x" % i,
            cf_list=bytes(16) if i == 1 else None,
        )
        frames.append(lc.ja_crack_prep(ja))
    flags = lc.ja_survivors_batch([k_a, k_b], frames)
    assert [list(r) for r in flags] == [[True, False, True], [False, True, False]]


def test_data_roundtrip_batch_matches_scalar_pair():
    """Round-13 multi-key batch: data_roundtrip_batch must be
    bit-identical to encode_data_frame + parse_phypayload(nwk, nwk)
    per row — frames, MIC verdicts AND decrypted FRMPayload —
    across payload-length edges (empty, exact block multiples,
    multi-block), f_port extremes, and f_cnt >= 2^16 (where the
    scalar parse reconstructs a truncated f_cnt from the FHDR and the
    MIC honestly mismatches; the batch parse must mismatch the same
    way)."""
    import random

    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    rng = random.Random(1302)
    rows = []
    for _ in range(400):
        rows.append((
            rng.randbytes(16),
            "%08x" % rng.getrandbits(32),
            rng.choice([0, 1, 65535, 65536, 70000, rng.getrandbits(16)]),
            rng.choice([1, 223, 255, rng.randint(1, 255)]),
            rng.randbytes(rng.choice([0, 1, 15, 16, 17, 32, rng.randint(0, 80)])),
        ))
    frames, oks, frms = lc.data_roundtrip_batch(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows],
        [r[3] for r in rows], [r[4] for r in rows])
    saw_mic_fail = False
    for (key, addr, fcnt, fport, payload), fr, ok, dec in zip(
        rows, frames, oks, frms
    ):
        sraw = lc.encode_data_frame(key, addr, fcnt, payload, f_port=fport)
        sp = lc.parse_phypayload(sraw, key, key)
        sfrm = bytes.fromhex(sp.frm_payload) if sp.frm_payload else b""
        assert fr == sraw
        assert ok == bool(sp.mic_ok)
        assert dec == sfrm
        saw_mic_fail |= not ok
    assert saw_mic_fail  # the f_cnt >= 2^16 rows must exercise the
    # honest-mismatch path, or this test silently stops covering it


def test_data_roundtrip_batch_rejects_bad_fport():
    import pytest

    from rolaguard_data_collectors_spark.functions import lorawan_codec as lc

    with pytest.raises(ValueError, match="f_port"):
        lc.data_roundtrip_batch([b"k" * 16], ["00000000"], [1], [0], [b""])
