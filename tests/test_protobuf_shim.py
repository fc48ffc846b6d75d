"""Vendored minimal protobuf runtime (compat.ensure_protobuf /
_vendor/google/protobuf): wire-format golden bytes + round-trips through
the REAL protoc-generated pyspark StateMessage_pb2 module, which the shim
must execute unmodified. The end-to-end conformance check is the JVM's
protobuf parser in test_streaming's transformWithState test; these pin
the wire bytes so a shim regression fails fast without Spark."""

import pytest

from sliding_window_aggregators_spark.compat import ensure_protobuf

MODE = ensure_protobuf()
sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_mode_resolves():
    assert MODE in ("real", "vendored")


def test_golden_request_bytes():
    # hand-derived from the published wire spec:
    #   SetHandleState{state=INITIALIZED(2)} -> 08 02
    #   StatefulProcessorCall{setHandleState=...} -> 0A 02 08 02
    #   StateRequest{version=2, statefulProcessorCall=...} ->
    #     08 02 12 04 0A 02 08 02
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        ),
    )
    assert req.SerializeToString() == bytes.fromhex("080212040a020802")


def test_module_level_enum_exports():
    assert sm.PRE_INIT == 0
    assert sm.CLOSED == 5
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    assert sm.HandleState.Value("TIMER_PROCESSED") == 4


def test_proto3_default_not_serialized_but_oneof_member_is():
    # plain enum field at default value: absent from the wire
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""
    # oneof member: present even when its payload is empty
    req = sm.StateVariableRequest(valueStateCall=sm.ValueStateCall())
    assert req.SerializeToString() == b"\x0a\x00"


def test_oneof_round_trip_and_which_oneof():
    e = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(stateName="s", schema="v int")
        )
    )
    r = sm.StateRequest()
    r.ParseFromString(e.SerializeToString())
    assert r.WhichOneof("method") == "statefulProcessorCall"
    assert r.statefulProcessorCall.WhichOneof("method") == "getValueState"
    assert r.statefulProcessorCall.getValueState.stateName == "s"
    assert r.statefulProcessorCall.getValueState.schema == "v int"


def test_negative_int_and_repeated_bytes_round_trip():
    resp = sm.StateResponseWithListGet(
        statusCode=-3,
        errorMessage="boom",
        value=[b"\x01\x02", b""],
        requireNextFetch=True,
    )
    r = sm.StateResponseWithListGet()
    r.ParseFromString(resp.SerializeToString())
    assert r.statusCode == -3
    assert r.errorMessage == "boom"
    assert list(r.value) == [b"\x01\x02", b""]
    assert bool(r.requireNextFetch) is True


def test_repeated_message_round_trip():
    mi = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
    )
    r = sm.StateResponseWithMapIterator()
    r.ParseFromString(mi.SerializeToString())
    assert [(p.key, p.value) for p in r.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_proto3_optional_synthetic_oneof_presence():
    # TimerInfo.key is `optional bytes` (synthetic oneof): an explicit
    # empty value must still hit the wire and report HasField
    t = sm.TimerInfo(key=b"", timestampMs=9)
    b = t.SerializeToString()
    assert b.startswith(b"\x0a\x00")
    r = sm.TimerInfo()
    r.ParseFromString(b)
    assert r.HasField("key") and r.timestampMs == 9
    # unset: absent from wire and from HasField
    r2 = sm.TimerInfo()
    r2.ParseFromString(sm.TimerInfo(timestampMs=1).SerializeToString())
    assert not r2.HasField("key")


def test_bool_default_vs_set():
    assert (
        sm.ListStatePut(value=[b"a"], fetchWithArrow=False).SerializeToString()
        == b"\x0a\x01a"
    )
    assert (
        sm.ListStatePut(value=[b"a"], fetchWithArrow=True).SerializeToString()
        == b"\x0a\x01a\x10\x01"
    )


def test_parse_clears_previous_state():
    r = sm.StateResponse(statusCode=7, errorMessage="old", value=b"x")
    r.ParseFromString(sm.StateResponse(statusCode=1).SerializeToString())
    assert r.statusCode == 1 and r.errorMessage == "" and r.value == b""


def test_large_varints_round_trip():
    for v in (0, 1, 127, 128, 2**31 - 1, 2**62, -1, -(2**31)):
        m = sm.StateResponseWithLongTypeVal(value=v)
        r = sm.StateResponseWithLongTypeVal()
        r.ParseFromString(m.SerializeToString())
        assert r.value == v, v
