"""Vendored protobuf-shim runtime (_vendor/pbshim): wire-format
properties against the real generated StateMessage_pb2 module.

These run under whichever runtime ``tws_available()`` resolved — the
shim in this container, a real protobuf installation elsewhere. Every
assertion here states proto3 semantics both runtimes must share, so
the suite doubles as a conformance check if a genuine wheel ever
lands.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rolaguard_data_collectors_spark.streaming import tws

pytestmark = pytest.mark.skipif(
    not tws.tws_available(), reason="no protobuf runtime"
)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_known_wire_encodings():
    """Hand-computed proto3 encodings (non-default values only — real
    protobuf omits unset/default non-optional scalars, and so must any
    shim claiming compatibility)."""
    sm = _sm()
    # field 1 (statusCode, int32) = 150 -> tag 0x08, varint 0x96 0x01
    assert sm.StateResponse(statusCode=150).SerializeToString() == b"\x08\x96\x01"
    # field 3 (value, bytes) = b'hi' -> tag 0x1a, len 2
    assert sm.StateResponse(value=b"hi").SerializeToString() == b"\x1a\x02hi"
    # nested: StateRequest.statefulProcessorCall (field 2) wrapping
    # SetHandleState(state=CLOSED=5): inner = field1 varint 5
    inner = sm.SetHandleState(state=sm.CLOSED).SerializeToString()
    assert inner == b"\x08\x05"
    call = sm.StatefulProcessorCall(setHandleState=sm.SetHandleState(state=sm.CLOSED))
    req = sm.StateRequest(statefulProcessorCall=call).SerializeToString()
    assert req == b"\x12\x04\x0a\x02\x08\x05"


def test_unknown_fields_are_skipped():
    sm = _sm()
    base = sm.StateResponse(statusCode=7, errorMessage="x").SerializeToString()
    # prepend an unknown field 15 (varint) and an unknown field 14
    # (length-delimited) — parsers must skip both
    noisy = b"\x78\x2a" + b"\x72\x03abc" + base
    msg = sm.StateResponse()
    msg.ParseFromString(noisy)
    assert (msg.statusCode, msg.errorMessage) == (7, "x")


@settings(max_examples=200, deadline=None)
@given(
    status=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    err=st.text(max_size=40),
    val=st.integers(min_value=-(2**63), max_value=2**63 - 1),
)
def test_long_response_roundtrip(status, err, val):
    sm = _sm()
    m = sm.StateResponseWithLongTypeVal(statusCode=status, errorMessage=err, value=val)
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(m.SerializeToString())
    assert (back.statusCode, back.errorMessage, back.value) == (status, err, val)


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(st.binary(max_size=32), max_size=8),
    more=st.booleans(),
)
def test_repeated_bytes_roundtrip(vals, more):
    sm = _sm()
    m = sm.StateResponseWithListGet(statusCode=0, value=vals, requireNextFetch=more)
    back = sm.StateResponseWithListGet()
    back.ParseFromString(m.SerializeToString())
    assert list(back.value) == vals
    assert back.requireNextFetch == more


@settings(max_examples=100, deadline=None)
@given(
    timers=st.lists(
        st.tuples(st.binary(max_size=16), st.integers(0, 2**62)), max_size=6
    )
)
def test_repeated_message_roundtrip(timers):
    sm = _sm()
    m = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[sm.TimerInfo(key=k, timestampMs=t) for k, t in timers],
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(m.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == timers


def test_composite_autovivification_marks_presence():
    """The client writes ``cmd.ttl.durationMs = x`` — the submessage
    must serialize after attribute-path assignment."""
    sm = _sm()
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.ttl.durationMs = 1234
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.stateName == "s"
    assert back.ttl.durationMs == 1234


def test_unset_scalars_read_proto3_defaults():
    sm = _sm()
    m = sm.StateResponse()
    assert m.statusCode == 0
    assert m.errorMessage == ""
    assert m.value == b""
