"""Unit tests for the vendored pure-Python protobuf runtime shim.

The end-to-end proof is test_sessionizer_tws.py (the JVM state server runs
REAL protobuf and must parse every byte the shim emits); these tests pin the
wire-format corners directly: varint edges, negative int64, zigzag, packed
repeated decode, unknown-field skipping, and hand-computed encodings from
the public protobuf encoding spec."""

from __future__ import annotations

import pytest

from aetherium_trader_datapipeline_spark._vendor import protoshim

protoshim.activate()

from aetherium_trader_datapipeline_spark._vendor.protoshim.google.protobuf import (  # noqa: E402
    wire,
)


@pytest.fixture(scope="module")
def sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_varint_edges():
    for v in (0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1, -1, -2**63):
        data = wire.encode_varint(v)
        got, pos = wire.decode_varint(data, 0)
        assert pos == len(data)
        want = v & (1 << 64) - 1 if v < 0 else v
        assert got == want
    # spec example: 300 -> 0xAC 0x02
    assert wire.encode_varint(300) == b"\xac\x02"


def test_zigzag():
    for raw, enc in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)]:
        assert wire.zigzag_encode(raw) == enc
        assert wire.zigzag_decode(enc) == raw


def test_negative_int64_roundtrip(sm):
    t = sm.TimerInfo(timestampMs=-5)
    back = sm.TimerInfo()
    back.ParseFromString(t.SerializeToString())
    assert back.timestampMs == -5
    # negative int64 must occupy 10 varint bytes (two's complement)
    assert len(t.SerializeToString()) == 1 + 10


def test_known_encoding_nested_oneof(sm):
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        ),
    )
    # field1 varint 2 = 08 02; field2 LEN(4) = 12 04; nested field1 LEN(2) =
    # 0a 02; SetHandleState field1 varint INITIALIZED(2) = 08 02
    assert req.SerializeToString() == bytes.fromhex("080212040a020802")


def test_string_utf8_and_defaults(sm):
    cmd = sm.StateCallCommand(stateName="sé", schema="value BIGINT")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.stateName == "sé"
    assert back.schema == "value BIGINT"
    assert back.mapStateValueSchema == ""  # unset → proto3 default
    assert back.ttl.durationMs == 0  # unset submessage → default instance


def test_repeated_bytes_and_bool(sm):
    put = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=True)
    back = sm.ListStatePut()
    back.ParseFromString(put.SerializeToString())
    assert back.value == [b"a", b"bb", b""]
    assert back.fetchWithArrow is True


def test_repeated_message(sm):
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=1),
            sm.TimerInfo(key=b"k2", timestampMs=2),
        ],
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [(b"k1", 1), (b"k2", 2)]


def test_unknown_field_skipped(sm):
    # field 15 varint (unknown to StateResponse) + known statusCode=7
    payload = wire.encode_key(15, wire.WT_VARINT) + wire.encode_varint(99)
    payload += wire.encode_key(1, wire.WT_VARINT) + wire.encode_varint(7)
    resp = sm.StateResponse()
    resp.ParseFromString(payload)
    assert resp.statusCode == 7


def test_packed_repeated_scalars_decode():
    """JVM encoders MAY pack repeated varints; the shim must accept both
    packed and unpacked forms (wire-format spec §packed)."""
    from aetherium_trader_datapipeline_spark._vendor.protoshim.google.protobuf import (
        message_factory_shim as mf,
    )

    ms = mf.MessageSchema(".t.M", "M")
    fs = mf.FieldSchema("xs", 1, wire.TYPE_INT64, True, None)
    ms.fields.append(fs)
    ms.by_number[1] = fs
    ms.by_name["xs"] = fs
    cls = type("M", (mf.ShimMessage,), {"_schema": ms, "DESCRIPTOR": ms})
    packed = wire.encode_varint(1) + wire.encode_varint(300) + wire.encode_varint(3)
    data = wire.encode_key(1, wire.WT_LEN) + wire.encode_varint(len(packed)) + packed
    m = cls()
    m.ParseFromString(data)
    assert m.xs == [1, 300, 3]


def test_enum_namespace(sm):
    assert sm.HandleState.INITIALIZED == 2
    assert sm.HandleState.Name(4) == "TIMER_PROCESSED"
    assert sm.HandleState.Value("CLOSED") == 5
    assert sm.PRE_INIT == 0


def test_real_protobuf_wins_if_present():
    """activate() must never shadow a real google.protobuf install."""
    import sys

    shim_dir = protoshim._SHIM_DIR
    assert shim_dir in sys.path  # active in this container (no real protobuf)
    assert protoshim.activate() is True  # idempotent
    assert sys.path.count(shim_dir) == 1
