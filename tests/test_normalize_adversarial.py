"""Adversarial-input robustness of the four normalize pipelines: junk,
truncated JSON, schema-shaped-but-wrong-typed bodies, unicode, huge
payloads and nulls must NEVER throw (from_json is the only parser —
its null-on-malformed contract is what the reference's try/except
blocks did, GenericMqttCollector.py:120-176), and whatever survives
the guards must satisfy the packet-schema contract."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from rolaguard_data_collectors_spark.schemas import PACKET_SCHEMA
from rolaguard_data_collectors_spark.streaming import (
    normalize_chirpstack,
    normalize_mqtt_forwarder,
    normalize_ttn_v2,
    normalize_ttn_v3,
)

RAW_SCHEMA = (
    "seq long, ts long, topic string, value string,"
    " data_collector_id long, organization_id long"
)

# Topic families across all four sources + junk.
TOPICS = [
    "gateway/aabbccddeeff0011/rx",
    "gateway/aabbccddeeff0011/tx",
    "gateway/aabbccddeeff0011/up",
    "application/7/device/dev-1/rx",
    "application/7/node/dev-1/rx",
    "lora/dev-eui-1/up/join",
    "+/devices/dev1/up",
    "v3/app@ttn/devices/dev1/up",
    "",
    None,
    "totally/unrelated/topic",
    "gateway//rx",
]

BODIES = [
    None,
    "",
    "{",                                 # truncated
    "not json at all",
    "]" * 1000,
    '{"phyPayload": 12345}',             # wrong type (int for string)
    '{"phyPayload": {"nested": true}}',  # wrong type (object for string)
    '{"rxInfo": "should-be-struct"}',
    '{"payload_raw": ["array", "not", "string"]}',
    '{"uplink_message": {"frm_payload": 7}}',
    json.dumps({"phyPayload": "QA" * 200}),   # oversized frame (>300)
    json.dumps({"phyPayload": "####"}),       # non-base64
    json.dumps({"phyPayload": "QMTBfwEAEQBd6f1YJ+K7NmuNmy/JpHTFQKI="}),  # valid
    '{"unicode": "\\u00e9\\ud83d\\ude00 café \U0001f600"}',
    '{"deep": ' + '{"a": ' * 40 + "1" + "}" * 40 + "}",
    "AAAA" * 5000,                        # huge base64ish blob (pb path)
    '\x00\x01binary\xff',
]


def _raw(spark):
    rows = []
    seq = 0
    for t in TOPICS:
        for b in BODIES:
            rows.append((seq, 1_700_000_000 + seq, t, b, 7, 1))
            seq += 1
    return spark.createDataFrame(rows, RAW_SCHEMA)


@pytest.mark.parametrize(
    "fn", [normalize_mqtt_forwarder, normalize_chirpstack,
           normalize_ttn_v2, normalize_ttn_v3],
    ids=lambda f: f.__name__,
)
def test_normalize_never_throws_and_respects_contract(spark, fn):
    raw = _raw(spark)
    n_in = raw.count()
    out = fn(raw)  # must not raise at plan time
    rows = out.collect()  # ...nor at execution time
    assert len(rows) <= n_in  # pure filter/project: never fabricates rows
    packet_fields = {f.name: f.dataType for f in PACKET_SCHEMA.fields}
    for name, dtype in packet_fields.items():
        assert name in out.columns, f"{fn.__name__} lost packet column {name}"
    # surviving gateway-route rows must carry the decoded golden frame
    # or a parse error, never a half-parsed crash row
    for r in rows:
        if r["data"] is not None and r["m_type"] is not None:
            assert r["m_type"] != ""


def test_guards_drop_oversized_and_junk_but_keep_golden(spark):
    raw = _raw(spark)
    out = normalize_chirpstack(raw).collect()
    # the only bodies carrying a decodable phyPayload are the golden
    # frames; oversized (>300 chars) ones must be gone
    datas = [r["data"] for r in out if r["data"] is not None]
    assert all(len(d) <= 300 for d in datas)
    golden = [r for r in out if r["m_type"] == "UnconfirmedDataUp"]
    assert len(golden) > 0  # the valid frame on the gateway routes survived


# --- round 7: protobuf wire fuzz, base64 padding edges, hostile topics ----

import base64

# Adversarial gw.UplinkFrame candidates for the protobuf fallback path
# (topic gateway/<mac>/up + body not starting with '{'): every byte
# string is base64'd onto the wire like the reference transport does.
_PB_BLOBS = [
    b"",                                   # empty message
    b"\x08",                               # truncated varint (no payload)
    b"\x0a",                               # length-delimited, missing len
    b"\x0a\xff\xff\xff\xff\x7f",           # len = 2^34-ish, no bytes
    b"\x0a\x05ab",                         # len 5, only 2 bytes present
    b"\x0b\x01\x02",                       # wire type 3 (group start) — unsupported
    b"\x07\x01",                           # wire type 7 — invalid
    b"\xf8\xff\xff\xff\x0f\x01",           # huge field number varint
    b"\x0a\x03MAC\x1a\x02\x08\x01",        # plausible nested shape
    b"\x12\x00",                           # empty submessage field 2
    bytes(range(256)),                     # every byte value
    b"\x0a" + b"\x80" * 12,                # varint length that never terminates
]

_PB_TOPIC = "gateway/aabbccddeeff0011/up"


def test_chirpstack_pb_fallback_never_throws_on_wire_garbage(spark):
    """Truncated varints, dangling length prefixes, invalid wire types
    and unterminated-varint lengths through the REAL protobuf fallback
    (op 15): the route must yield a null parse or a dropped row, never
    an executor exception — the reference wraps exactly this in
    try/except (LoraServerIOCollector.py:253-263)."""
    rows = [
        (i, 1_700_000_000 + i, _PB_TOPIC, base64.b64encode(b).decode(), 7, 1)
        for i, b in enumerate(_PB_BLOBS)
    ]
    # raw (non-base64) binary garbage on the same route too
    rows.append((len(rows), 1_700_000_100, _PB_TOPIC, "\x00\x01\xff not b64", 7, 1))
    raw = spark.createDataFrame(rows, RAW_SCHEMA)
    out = normalize_chirpstack(raw).collect()  # must not raise
    assert len(out) <= len(rows)
    for r in out:
        if r["m_type"] is not None:
            assert r["m_type"] != ""


def test_mqtt_forwarder_base64_padding_edges(spark):
    """_b64_pad (op 12) + the codec UDF against every padding residue
    and non-decodable shapes: 1-char, 2-char, 3-char bodies, embedded
    whitespace/newlines (MIME chunking), '=' floods, and a valid frame
    whose padding was stripped (the reference's observed wire shape,
    GenericMqttCollector.py:127-130)."""
    datas = [
        "A", "AB", "ABC", "====", "=", "QQ==extra", "QU JD", "QUJD\\n",
        "QMTBfwEAEQBd6f1YJ+K7NmuNmy/JpHTFQKI",   # golden, padding stripped
        "!@#$%^&*", "\\u00e9\\u00e9\\u00e9", " ",
    ]
    rows = [
        (i, 1_700_000_000 + i, "lora/dev-1/up", json.dumps({"data": d}), 3, 1)
        for i, d in enumerate(datas)
    ]
    raw = spark.createDataFrame(rows, RAW_SCHEMA)
    out = normalize_mqtt_forwarder(raw).collect()  # must not raise
    # the de-padded golden frame must decode end-to-end
    golden = [r for r in out if r["m_type"] == "UnconfirmedDataUp"]
    assert len(golden) == 1
    assert golden[0]["dev_addr"] == "017fc1c4"


_HOSTILE_TOPICS = [
    "lora/\x00\x01\x02/up",                 # control bytes
    "lora/😀�/up",           # astral + replacement char
    "lora/a.*b[&]{2}(c)/up",                # regex metachars in the eui slot
    "lora/" + "x" * 10_000 + "/up",         # pathological length
    "LORA/DEV-1/UP",                        # wrong case (must NOT route)
    "lora//up",                             # empty eui
    "lora/dev-1/up\n",                      # trailing newline
]


def test_mqtt_forwarder_hostile_topics_route_safely(spark):
    """Topic-derived dev_eui extraction (op 19) over hostile topics:
    regex metacharacters must be treated as data, control/astral chars
    must survive the regexp, the empty-eui slot must yield NULL (not
    ''), and no topic shape may throw."""
    body = json.dumps({"data": "QMTBfwEAEQBd6f1YJ+K7NmuNmy/JpHTFQKI="})
    rows = [
        (i, 1_700_000_000 + i, t, body, 3, 1)
        for i, t in enumerate(_HOSTILE_TOPICS)
    ]
    raw = spark.createDataFrame(rows, RAW_SCHEMA)
    out = {r["_seq"]: r for r in normalize_mqtt_forwarder(raw).collect()}
    assert out, "golden bodies must survive"
    # regex metachars: extracted eui is the literal slot text (dashes
    # stripped), never a regex evaluation error
    assert out[2]["dev_eui"] == "a.*b[&]{2}(c)"
    # empty slot -> NULL (nullif guard), not empty string
    assert out[5]["dev_eui"] is None
