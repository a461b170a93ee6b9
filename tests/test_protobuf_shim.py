"""Vendored protobuf shim (vendor/google/protobuf): golden wire bytes from
the public encoding spec, roundtrips of every response shape the TWS
client reads, and proto3 presence semantics. The END-TO-END conformance
oracle is protobuf-java inside the Spark JVM — tests/test_windows.py::
test_stateful_running_counts_tws round-trips every request/response
through Spark's own parser; these tests pin the wire layer in isolation
so a regression points at the byte, not at a hung streaming query."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "go_pq_cdc_kafka_spark", "vendor",
)


@pytest.fixture(scope="module")
def SM():
    if VENDOR not in sys.path:
        sys.path.append(VENDOR)
    return importlib.import_module(
        "pyspark.sql.streaming.proto.StateMessage_pb2"
    )


@pytest.fixture(scope="module")
def rt():
    if VENDOR not in sys.path:
        sys.path.append(VENDOR)
    return importlib.import_module("google.protobuf._shim_runtime")


def test_varint_golden_vectors(rt):
    """Public encoding-spec vectors: 1 → 01, 150 → 9601, -2 (int64) → ten
    0xff-leading bytes (two's complement)."""
    def enc(v):
        out = bytearray()
        rt.write_varint(out, v)
        return bytes(out)

    assert enc(1) == b"\x01"
    assert enc(150) == b"\x96\x01"
    assert enc(0) == b"\x00"
    assert enc(-2) == b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    for v in (0, 1, 127, 128, 150, 300, 1 << 32, (1 << 63) - 1, -1, -2**31):
        got, pos = rt.read_varint(enc(v), 0)
        if v < 0:
            got = rt._to_signed64(got)
        assert got == v and pos == len(enc(v))


def test_golden_message_bytes(SM):
    """SetHandleState(state=INITIALIZED) nested in the oneof chain must
    produce exactly the spec bytes: field 2 LEN(4) / field 1 LEN(2) /
    field 1 VARINT 2."""
    req = SM.StateRequest(
        statefulProcessorCall=SM.StatefulProcessorCall(
            setHandleState=SM.SetHandleState(state=SM.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_proto3_defaults_are_omitted(SM):
    """statusCode=0 / errorMessage="" / value=b"" serialize to NOTHING —
    the implicit-presence rule the JVM relies on both ways."""
    assert SM.StateResponse(
        statusCode=0, errorMessage="", value=b""
    ).SerializeToString() == b""
    # and an explicitly-set oneof member serializes even when empty
    assert SM.StateRequest(
        implicitGroupingKeyRequest=SM.ImplicitGroupingKeyRequest(
            removeImplicitKey=SM.RemoveImplicitKey()
        )
    ).SerializeToString() == bytes.fromhex("22021200")


def test_every_client_response_shape_roundtrips(SM):
    shapes = [
        (SM.StateResponse, dict(statusCode=3, errorMessage="e", value=b"v")),
        (SM.StateResponseWithLongTypeVal,
         dict(statusCode=0, errorMessage="", value=-7)),
        (SM.StateResponseWithStringTypeVal,
         dict(statusCode=1, value="schema-json")),
        (SM.StateResponseWithListGet,
         dict(statusCode=0, value=[b"a", b"bb", b""], requireNextFetch=True)),
        (SM.StateResponseWithMapKeysOrValues,
         dict(statusCode=0, value=[b"k1", b"k2"], requireNextFetch=False)),
        (SM.StateResponseWithMapIterator,
         dict(statusCode=0,
              kvPair=[SM.KeyAndValuePair(key=b"k", value=b"v")],
              requireNextFetch=True)),
        (SM.StateResponseWithTimer,
         dict(statusCode=0,
              timer=[SM.TimerInfo(key=b"g", timestampMs=12345),
                     SM.TimerInfo(timestampMs=-1)],
              requireNextFetch=False)),
    ]
    for cls, kwargs in shapes:
        src = cls(**kwargs)
        dst = cls()
        dst.ParseFromString(src.SerializeToString())
        assert dst == src, cls.__name__
    # TimerInfo proto3_optional presence survives the roundtrip
    t = SM.StateResponseWithTimer(
        timer=[SM.TimerInfo(key=b"", timestampMs=1),
               SM.TimerInfo(timestampMs=1)]
    )
    back = SM.StateResponseWithTimer()
    back.ParseFromString(t.SerializeToString())
    assert back.timer[0].HasField("key")
    assert not back.timer[1].HasField("key")


def test_oneof_exclusivity_and_whichoneof(SM):
    call = SM.StatefulProcessorCall(
        getValueState=SM.StateCallCommand(stateName="a")
    )
    assert call.WhichOneof("method") == "getValueState"
    call.getListState.stateName = "b"  # auto-vivify switches the oneof
    assert call.WhichOneof("method") == "getListState"
    raw = call.SerializeToString()
    back = SM.StatefulProcessorCall()
    back.ParseFromString(raw)
    assert back.WhichOneof("method") == "getListState"
    assert back.getListState.stateName == "b"


def test_nested_attribute_write_pattern(SM):
    """The generated client's `cmd.ttl.durationMs = n` write-through-read
    pattern (stateful_processor_api_client.py) must mark ttl present."""
    cmd = SM.StateCallCommand()
    cmd.stateName = "s"
    cmd.ttl.durationMs = 60000
    back = SM.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.HasField("ttl") and back.ttl.durationMs == 60000
    bare = SM.StateCallCommand(stateName="s")
    back2 = SM.StateCallCommand()
    back2.ParseFromString(bare.SerializeToString())
    assert not back2.HasField("ttl")


def test_pure_read_does_not_create_presence(SM):
    """Upstream presence semantics: READING an unset submessage must not
    mark it present — HasField stays False, WhichOneof is unchanged, and
    serialization is byte-identical to the untouched message. Only the
    first MUTATION (direct or nested) promotes the staged submessage."""
    cmd = SM.StateCallCommand(stateName="s")
    before = cmd.SerializeToString()
    _ = cmd.ttl.durationMs  # inspect-only read
    assert not cmd.HasField("ttl")
    assert cmd.SerializeToString() == before
    # a read must not switch the selected oneof member either
    call = SM.StatefulProcessorCall(
        getValueState=SM.StateCallCommand(stateName="a")
    )
    _ = call.getListState.stateName
    assert call.WhichOneof("method") == "getValueState"
    # ...but the first write through the staged view still promotes,
    # including the full nested chain
    call.getListState.ttl.durationMs = 5
    assert call.WhichOneof("method") == "getListState"
    assert call.getListState.HasField("ttl")


def test_repeated_append_promotes_staged_submessage(SM):
    """Appending to a repeated field of a read-vivified submessage is a
    mutation: it must promote the submessage to present (upstream's
    write-triggered presence through repeated containers)."""
    resp = SM.StateResponseWithMapIterator()
    resp.kvPair.append(SM.KeyAndValuePair(key=b"k", value=b"v"))
    back = SM.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert back.kvPair[0].key == b"k"


def test_stale_staged_view_cannot_flip_presence(SM):
    """If the staged object is replaced (by a direct set) before its
    first mutation, mutating the STALE view must not mark the field
    present with the new object's value."""
    cmd = SM.StateCallCommand()
    stale = cmd.ttl  # staged, not present
    cmd.Clear()  # drops the staged object (parse does the same)
    stale.durationMs = 99  # stale view: must not resurrect presence
    assert not cmd.HasField("ttl")
    assert cmd.SerializeToString() == b""


def test_vendor_google_is_namespace_portion():
    """vendor/google must be a PEP 420 namespace portion (no
    __init__.py): other installed google.* distributions keep importing
    when the vendor dir is on sys.path."""
    assert not os.path.exists(os.path.join(VENDOR, "google", "__init__.py"))
    import subprocess
    import tempfile

    d = tempfile.mkdtemp()
    os.makedirs(os.path.join(d, "google", "authlike"), exist_ok=True)
    with open(os.path.join(d, "google", "authlike", "__init__.py"), "w") as f:
        f.write("X = 'ok'\n")
    code = (
        "import sys; sys.path.insert(0, %r); sys.path.append(%r); "
        "import google.authlike, google.protobuf; "
        "print(google.authlike.X, len(set(google.__path__)))"
    ) % (d, VENDOR)
    # scrub PYTHONPATH: earlier TWS tests export the vendor dir there,
    # which would add a duplicate namespace portion in the subprocess
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.split() == ["ok", "2"]


def test_unknown_fields_are_skipped(SM):
    """Forward compatibility: bytes with a field number this schema does
    not know parse cleanly (varint, len, fixed32, fixed64 wire types)."""
    known = SM.StateResponse(statusCode=7).SerializeToString()
    unknown = (
        bytes.fromhex("f806 2a".replace(" ", ""))        # field 31 varint 42
        + bytes.fromhex("fa06 03 616263".replace(" ", ""))  # field 31 LEN "abc"
        + bytes.fromhex("fd06 01000000".replace(" ", ""))   # fixed32
        + bytes.fromhex("f906 0100000000000000".replace(" ", ""))  # fixed64
    )
    msg = SM.StateResponse()
    msg.ParseFromString(known + unknown)
    assert msg.statusCode == 7


def test_unsupported_surface_raises_loudly(rt):
    with pytest.raises(ValueError):
        rt.read_varint(b"\xff", 0)  # truncated
    fd = rt.FieldDescriptor()
    fd.type = rt.T_GROUP
    fd.number = 1
    msg_cls = type("X", (rt.ShimMessage,), {
        "DESCRIPTOR": rt.MessageDescriptor("X", "X")
    })
    msg_cls.DESCRIPTOR.fields = [fd]
    fd.name = "g"
    msg_cls.DESCRIPTOR.fields_by_name = {"g": fd}
    msg_cls.DESCRIPTOR.fields_by_number = {1: fd}
    m = msg_cls()
    m.__dict__["_values"]["g"] = 1
    m.__dict__["_present"].add("g")
    with pytest.raises(NotImplementedError):
        m.SerializeToString()


def test_real_protobuf_wins_when_installed(SM):
    """The vendor dir is APPENDED to sys.path — a real installation would
    shadow it. Here (no real package) the shim must be the provider."""
    import google.protobuf as gp

    assert "vendor" in gp.__file__ or "shim" in (
        getattr(gp, "__version__", "")
    )


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(v=st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def test_varint_roundtrip_property(v):
        import importlib
        import sys

        if VENDOR not in sys.path:
            sys.path.append(VENDOR)
        rt = importlib.import_module("google.protobuf._shim_runtime")
        out = bytearray()
        rt.write_varint(out, v)
        got, pos = rt.read_varint(bytes(out), 0)
        assert pos == len(out)
        assert rt._to_signed64(got) == v

    @settings(max_examples=100, deadline=None)
    @given(
        code=st.integers(min_value=0, max_value=2**31 - 1),
        msg=st.text(max_size=40),
        vals=st.lists(st.binary(max_size=32), max_size=8),
        more=st.booleans(),
    )
    def test_list_response_roundtrip_property(code, msg, vals, more):
        import importlib
        import sys

        if VENDOR not in sys.path:
            sys.path.append(VENDOR)
        SM = importlib.import_module(
            "pyspark.sql.streaming.proto.StateMessage_pb2"
        )
        src = SM.StateResponseWithListGet(
            statusCode=code, errorMessage=msg, value=vals,
            requireNextFetch=more,
        )
        dst = SM.StateResponseWithListGet()
        dst.ParseFromString(src.SerializeToString())
        assert dst.statusCode == code
        assert dst.errorMessage == msg
        assert list(dst.value) == [bytes(v) for v in vals]
        assert dst.requireNextFetch == more

except ImportError:  # pragma: no cover
    pass


def test_notify_list_every_mutator_promotes():
    """ALL list mutators count as writes (upstream containers trigger
    presence on any modification): pop/remove/clear/sort/reverse/
    __delitem__/__imul__ must notify the owner, not just the growth ops."""
    from go_pq_cdc_kafka_spark.vendor.google.protobuf._shim_runtime import (
        _NotifyList,
    )

    class Owner:
        hits = 0

        def _mark_mutated(self):
            self.hits += 1

    nl = _NotifyList([3, 1, 2, 1])
    owner = Owner()
    nl._owner = owner
    nl._fd = None
    for mutate in (
        lambda: nl.sort(),
        lambda: nl.reverse(),
        lambda: nl.pop(),
        lambda: nl.remove(1),
        lambda: nl.__delitem__(0),
        lambda: nl.__imul__(2),
        lambda: nl.clear(),
    ):
        before = owner.hits
        mutate()
        assert owner.hits == before + 1, mutate
