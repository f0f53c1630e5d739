"""TBinaryProtocol codec (sources/thrift_py): wire bytes pinned
against the published spec, null-as-absent, list payloads, and
hypothesis round-trips."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive_spark.sources import thrift_py as tp


def test_known_wire_bytes():
    """Field header [type][id:i16 BE] + BE payloads + T_STOP, per
    the public thrift-binary-protocol spec."""
    b = tp.encode_row(["int", "string"], [7, "ab"])
    assert b == (
        b"\x08\x00\x01\x00\x00\x00\x07"      # I32 id=1 value 7
        b"\x0b\x00\x02\x00\x00\x00\x02ab"    # STRING id=2 len 2
        b"\x00"                               # T_STOP
    )
    assert tp.decode_row(b, 2) == [7, "ab"]


def test_null_is_absent_field():
    b = tp.encode_row(["bigint", "string", "double"], [5, None, 2.5])
    row = tp.decode_row(b, 3)
    assert row == [5, None, 2.5]


def test_list_payload_and_bool():
    b = tp.encode_row(
        ["boolean", "array<int>"], [True, [1, 2, 3]]
    )
    assert tp.decode_row(b, 2) == [True, [1, 2, 3]]


@settings(max_examples=150, deadline=None)
@given(
    st.tuples(
        st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        st.one_of(st.none(), st.text(max_size=40)),
        st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
        st.one_of(st.none(), st.floats(allow_nan=False)),
        st.one_of(st.none(), st.booleans()),
    )
)
def test_round_trip_property(vals):
    types = ["bigint", "string", "int", "double", "boolean"]
    b = tp.encode_row(types, list(vals))
    assert tp.decode_row(b, 5) == list(vals)


def test_map_payload_round_trip():
    """T_MAP (13) per TBinaryProtocol: header = key type byte, value
    type byte, i32 size, then alternating key/value payloads. Keys
    are written sorted so files are byte-reproducible."""
    types = ["string", "map<string,bigint>", "map<int,double>"]
    row = ["x", {"b": 2, "a": 1}, {7: 0.5}]
    payload = tp.encode_row(types, row)
    assert tp.decode_row(payload, 3) == ["x", {"a": 1, "b": 2}, {7: 0.5}]
    # sorted-key determinism: same dict, different insertion order
    assert payload == tp.encode_row(types, ["x", {"a": 1, "b": 2}, {7: 0.5}])
    # empty map and null map
    p2 = tp.encode_row(["map<string,int>"], [{}])
    assert tp.decode_row(p2, 1) == [{}]
    p3 = tp.encode_row(["map<string,int>"], [None])
    assert tp.decode_row(p3, 1) == [None]


def test_nested_struct_round_trip():
    """T_STRUCT (12) nests uniformly — fields then T_STOP, exactly
    like the top-level row (the reference's src_thrift fixture is a
    Complex struct of lists/maps/nested structs). Decode is
    schema-less: positional by field id, absent = None."""
    types = ["bigint", "struct<a:int,b:string,c:array<bigint>>"]
    row = [7, {"a": 1, "b": "x", "c": [10, 20]}]
    payload = tp.encode_row(types, row)
    assert tp.decode_row(payload, 2) == [7, [1, "x", [10, 20]]]
    # nested null field: absent on the wire, None on decode
    p2 = tp.encode_row(types, [8, {"a": None, "b": "y", "c": []}])
    assert tp.decode_row(p2, 2) == [8, [None, "y", []]]
    # struct inside struct
    t3 = ["struct<p:struct<q:int>,r:map<string,int>>"]
    p3 = tp.encode_row(t3, [{"p": {"q": 5}, "r": {"k": 9}}])
    assert tp.decode_row(p3, 1) == [[[5], {"k": 9}]]


def test_corrupt_string_length_raises():
    """Regression: a negative string length REWOUND the cursor
    (payload[pos:pos+n] is b'' and pos+n moves backwards), so
    already-consumed bytes re-parsed as field headers — a garbage
    row with no error. Oversized lengths clamped silently and died
    later as an opaque struct.error."""
    import struct

    import pytest

    from hdp2_5_hive_spark.sources.thrift_py import (
        T_STOP,
        T_STRING,
        decode_row,
    )

    # field header: type=T_STRING, id=1, then a NEGATIVE length
    buf = struct.pack(">bh", T_STRING, 1) + struct.pack(">i", -5)
    with pytest.raises(ValueError, match="bad string length"):
        decode_row(buf, 1)
    # oversized length: claims 100 bytes, provides 3
    buf2 = (
        struct.pack(">bh", T_STRING, 1)
        + struct.pack(">i", 100)
        + b"abc"
    )
    with pytest.raises(ValueError, match="bad string length"):
        decode_row(buf2, 1)


def test_thrift_mutation_fuzz_never_leaks_internal_errors():
    """Seeded byte-mutation/truncation fuzz (round-12 contract):
    decode or ValueError/NotImplementedError — never struct.error /
    IndexError; and a negative map size raises instead of silently
    decoding an empty map."""
    import numpy as np
    import pytest
    import struct as _s

    from hdp2_5_hive_spark.sources import thrift_py as th

    types = ["int", "string", "double", "array<int>"]
    payload = th.encode_row(types, [3, "hi", 2.5, [1, 2]])
    rng = np.random.default_rng(13)
    for trial in range(300):
        m = bytearray(payload)
        for _ in range(int(rng.integers(1, 5))):
            m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        if trial % 4 == 0:
            m = m[: max(1, int(rng.integers(1, len(m))))]
        try:
            th.decode_row(bytes(m), 4)
        except (ValueError, NotImplementedError):
            pass

    # negative map size: ValueError, not a silent empty map
    bad = bytes([th.T_MAP]) + _s.pack(">h", 1) + bytes(
        [th.T_I32, th.T_I32]
    ) + _s.pack(">i", -3) + bytes([th.T_STOP])
    with pytest.raises(ValueError, match="negative map"):
        th.decode_row(bad, 1)


def test_decode_deep_nesting_raises_valueerror_not_recursionerror():
    """Corrupt-input contract (r13): a few KB of nested list headers
    drove the recursive decoder past Python's recursion limit —
    RecursionError is an internal error class the contract forbids.
    The decoder now caps nesting at MAX_NEST_DEPTH with ValueError."""
    import struct

    import pytest

    from hdp2_5_hive_spark.sources import thrift_py as tp

    payload = struct.pack(">bh", tp.T_LIST, 1)
    body = b"".join(
        struct.pack(">bi", tp.T_LIST, 1)
        for _ in range(tp.MAX_NEST_DEPTH + 1000)
    )
    body += struct.pack(">bi", tp.T_BOOL, 0)
    with pytest.raises(ValueError, match="nesting deeper"):
        tp.decode_row(payload + body + b"\x00", 1)
    # legit shallow nesting still decodes
    legit = (
        struct.pack(">bh", tp.T_LIST, 1)
        + struct.pack(">bi", tp.T_LIST, 1)
        + struct.pack(">bi", tp.T_I32, 2)
        + struct.pack(">i", 7)
        + struct.pack(">i", 9)
        + b"\x00"
    )
    assert tp.decode_row(legit, 1) == [[[7, 9]]]
