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
