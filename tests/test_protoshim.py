"""Unit tests for the vendored minimal protobuf runtime
(``vendor/protoshim``) — the wire codec under pyspark's shipped
generated module, independent of any Spark session.

The integration proof (real JVM state server ↔ shim-encoded protocol)
is tests/test_streaming.py::test_transform_with_state_funnel_matches_batch;
these tests pin the codec behaviors that proof relies on.
"""

from __future__ import annotations

import pathlib
import sys

import pytest

_SHIM = str(
    pathlib.Path(__file__).resolve().parent.parent
    / "another_map_reduce_spark"
    / "vendor"
    / "protoshim"
)


@pytest.fixture(scope="module")
def sm():
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        sys.path.insert(0, _SHIM)
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_nested_oneof_roundtrip(sm):
    """The exact construction pattern of pyspark's state clients:
    kwargs nesting, then byte-exact field recovery after a parse."""
    call = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
    )
    blob = sm.StateRequest(version=2, statefulProcessorCall=call).SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(blob)
    assert back.version == 2
    assert back.statefulProcessorCall.setHandleState.state == sm.INITIALIZED


def test_known_wire_bytes(sm):
    """Serialization is the proto3 wire format, not a private one:
    field 1 (int32) = 2 → tag 0x08 payload 0x02; field 2 (message,
    len 4) → tag 0x12."""
    call = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.CREATED)
    )
    blob = sm.StateRequest(version=2, statefulProcessorCall=call).SerializeToString()
    assert blob == bytes.fromhex("080212040a020801")


def test_empty_oneof_arm_is_present_on_wire(sm):
    """Zero-field messages like Exists() must still emit their field
    record (length 0) — that presence IS the oneof selection the JVM
    dispatches on."""
    vsc = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    blob = vsc.SerializeToString()
    # field 2 (exists), wiretype 2, length 0 → bytes 0x12 0x00 present
    assert b"\x12\x00" in blob
    back = sm.ValueStateCall()
    back.ParseFromString(blob)
    assert back.HasField("exists")


def test_lazy_read_does_not_create_presence(sm):
    """READING an unset message field must not serialize it — else
    every inspected request would select a oneof arm it never set."""
    req = sm.StateRequest(version=1)
    _ = req.statefulProcessorCall  # lazy vivification
    assert req.SerializeToString() == b"\x08\x01"


def test_negative_int64_ten_byte_varint(sm):
    """Negative int64 = two's-complement 64-bit varint (10 bytes on
    the wire), recovered signed."""
    blob = sm.TimerInfo(timestampMs=-1).SerializeToString()
    ti = sm.TimerInfo()
    ti.ParseFromString(blob)
    assert ti.timestampMs == -1
    assert len(blob) > 10  # 1 tag + 10 varint bytes


def test_repeated_message_and_scalar_defaults(sm):
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[sm.TimerInfo(key=b"k", timestampMs=5), sm.TimerInfo(timestampMs=9)],
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [(b"k", 5), (b"", 9)]
    # unset proto3 scalars read as defaults
    assert back.requireNextFetch is False
    assert back.errorMessage == ""


def test_unknown_fields_skipped(sm):
    """proto3 forward-compat: unknown field numbers are skipped, known
    ones around them still parse."""
    known = sm.StateResponse(statusCode=7).SerializeToString()
    unknown = b"\xfa\x3f\x03abc"  # field 1023, wiretype 2, len 3
    parsed = sm.StateResponse()
    parsed.ParseFromString(known + unknown)
    assert parsed.statusCode == 7


def test_string_utf8_roundtrip(sm):
    cmd = sm.StateCallCommand(stateName="état—状態", schema="v int")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.stateName == "état—状態"
    assert back.schema == "v int"


def test_enum_wrapper_api(sm):
    assert sm.HandleState.Value("CLOSED") == sm.CLOSED == 5
    assert sm.HandleState.Name(0) == "PRE_INIT"


def test_roundtrip_fuzz(sm):
    """Property: serialize→parse is identity over the protocol's field
    types (int32/int64 full signed ranges, bool, utf-8 strings, bytes,
    repeated messages, nesting)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

    @settings(max_examples=200, deadline=None)
    @given(
        status=i32,
        err=st.text(max_size=60),
        vals=st.lists(st.binary(max_size=40), max_size=6),
        more=st.booleans(),
        timers=st.lists(
            st.tuples(st.binary(max_size=20), i64), max_size=5
        ),
    )
    def check(status, err, vals, more, timers):
        r1 = sm.StateResponseWithListGet(
            statusCode=status, errorMessage=err, value=vals,
            requireNextFetch=more,
        )
        b1 = sm.StateResponseWithListGet()
        b1.ParseFromString(r1.SerializeToString())
        assert b1.statusCode == status
        assert b1.errorMessage == err
        assert list(b1.value) == vals
        assert b1.requireNextFetch == more

        r2 = sm.StateResponseWithTimer(
            statusCode=status,
            timer=[sm.TimerInfo(key=k, timestampMs=t) for k, t in timers],
        )
        b2 = sm.StateResponseWithTimer()
        b2.ParseFromString(r2.SerializeToString())
        assert [(t.key, t.timestampMs) for t in b2.timer] == timers

    check()


def test_whichoneof_scans_only_the_requested_oneof(sm):
    """A set NON-member (version) must not masquerade as the oneof's
    arm, the set arm is reported by name, and an unknown oneof name
    fails loudly — matching the real runtime's contract."""
    req = sm.StateRequest(version=2)
    assert req.WhichOneof("method") is None
    req2 = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    assert req2.WhichOneof("method") == "statefulProcessorCall"
    with pytest.raises(ValueError):
        req2.WhichOneof("no_such_oneof")


def test_split_singular_message_field_merges(sm):
    """Repeated wire occurrences of a singular embedded message MERGE
    (legal proto3 encoding): sub-fields from the first occurrence must
    survive the second, not be silently dropped."""
    # occurrence 1: statefulProcessorCall.setHandleState(state=CREATED)
    b1 = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    ).SerializeToString()
    # occurrence 2: version only — concatenation = field split across
    # two records of the same message (version rides along to prove
    # non-message fields still last-win)
    b2 = sm.StateRequest(
        version=7,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.ValueStateCall(stateName="s")
        ),
    ).SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(b1 + b2)
    assert back.version == 7
    # both sub-arms present: first occurrence's content merged, not replaced
    assert back.statefulProcessorCall.setHandleState.state == sm.CREATED
    assert back.statefulProcessorCall.getValueState.stateName == "s"
