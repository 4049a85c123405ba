"""Unit tests for the vendored minimal protobuf runtime
(se_data_pipeline_spark/_vendor/protoshim): golden wire bytes checked
against the published encoding spec, roundtrips over every field
shape StateMessage.proto uses, and the generated-module build path.

The end-to-end proof lives in tests/test_streaming.py — the
transformWithStateInPandas twins exchange these bytes with the real
JVM state server, which parses every request the shim encodes."""

from __future__ import annotations

import pytest

from se_data_pipeline_spark.compat import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_golden_wire_bytes_nested_oneof_enum():
    """Hand-derived expected bytes per the protobuf encoding spec:
    field 1 varint 2 -> 08 02; field 2 LEN -> 12 <len>; nested
    SetHandleState(state=INITIALIZED=2) -> 0a 02 08 02."""
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        ),
    )
    assert req.SerializeToString().hex() == "080212040a020802"


def test_scalar_defaults_and_unset_fields_not_serialized():
    resp = sm.StateResponse()
    assert resp.statusCode == 0
    assert resp.errorMessage == ""
    assert resp.value == b""
    assert resp.SerializeToString() == b""


def test_roundtrip_repeated_bytes_and_bool():
    resp = sm.StateResponseWithListGet(
        statusCode=7, value=[b"a", b"bb", b""], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert back.statusCode == 7
    assert list(back.value) == [b"a", b"bb", b""]
    assert back.requireNextFetch is True
    assert back.errorMessage == ""


def test_roundtrip_repeated_message_and_proto3_optional():
    t = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=123),
            sm.TimerInfo(timestampMs=456),  # proto3-optional key unset
        ],
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(t.SerializeToString())
    assert back.timer[0].key == b"k1" and back.timer[0].timestampMs == 123
    assert back.timer[1].timestampMs == 456
    assert back.timer[1].key == b""  # default for unset bytes


def test_negative_int64_two_complement():
    lr = sm.StateResponseWithLongTypeVal(value=-1)
    wire = lr.SerializeToString()
    # -1 as 64-bit two's complement varint: 10 bytes of 0xff... 0x01
    assert wire.hex() == "18ffffffffffffffffff01"
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(wire)
    assert back.value == -1


def test_oneof_exclusivity_on_set_and_parse():
    x = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall())
    x.stateVariableRequest = sm.StateVariableRequest()
    assert not x.HasField("statefulProcessorCall")
    assert x.HasField("stateVariableRequest")


def test_unknown_fields_skipped():
    # field 15 varint (tag 0x78) is not in StateResponse: parser must
    # skip it and still read the known trailing field
    known = sm.StateResponse(statusCode=3).SerializeToString()
    data = bytes.fromhex("7805") + known
    back = sm.StateResponse()
    back.ParseFromString(data)
    assert back.statusCode == 3


def test_utf8_string_roundtrip():
    r = sm.StateResponseWithStringTypeVal(errorMessage="lỗi — ê", value="x")
    back = sm.StateResponseWithStringTypeVal()
    back.ParseFromString(r.SerializeToString())
    assert back.errorMessage == "lỗi — ê" and back.value == "x"


def test_real_protobuf_wins_when_present():
    """ensure_protobuf reports whether the shim serves the import; the
    shim must never shadow a real installation."""
    import google.protobuf as gp

    shim_active = ensure_protobuf()
    assert shim_active == ("protoshim" in (gp.__file__ or ""))
