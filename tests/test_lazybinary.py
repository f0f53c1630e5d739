"""LazyBinary SerDe: exact wire-layout pins (bytes hand-derived from
LazyBinarySerDe.java's documented interleaving) plus a hypothesis
round-trip property over nested types."""

from __future__ import annotations

import struct
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive_spark.sources import lazybinary_py as lb


def test_wire_layout_pinned():
    """[bigint 1, string 'ab'] → null byte 0b11, vlong(1)=0x01,
    vint len 2 + bytes. Nine fields force a second null-byte group
    (fields 0-7 then 8). A null field contributes no payload bytes."""
    assert lb.encode_row(["bigint", "string"], [1, "ab"]) == b"\x03\x01\x02ab"
    assert lb.encode_row(["bigint", "string"], [None, "ab"]) == b"\x02\x02ab"
    nine = lb.encode_row(["boolean"] * 9, [True] * 9)
    assert nine == b"\xff" + b"\x01" * 8 + b"\x01" + b"\x01"
    # smallint is 2 bytes BE; double 8 bytes BE
    assert lb.encode_row(["smallint"], [-2]) == b"\x01\xff\xfe"
    assert (
        lb.encode_row(["double"], [1.0]) == b"\x01" + struct.pack(">d", 1.0)
    )


def test_decimal_matches_biginteger_bytes():
    """HiveDecimalWritable = vint scale + vint len + minimal
    two's-complement unscaled bytes (BigInteger.toByteArray): -1.28
    with scale 2 is unscaled -128 = ONE byte 0x80."""
    assert (
        lb.encode_row(["decimal(4,2)"], [Decimal("-1.28")])
        == b"\x01\x02\x01\x80"
    )
    assert lb.decode_row(["decimal(4,2)"], b"\x01\x02\x01\x80") == [
        Decimal("-1.28")
    ]
    # scale read from the wire, not the declared type (Hive strips
    # trailing zeros — a real-Hive file may carry a smaller scale)
    assert lb.decode_row(["decimal(10,4)"], b"\x01\x01\x01\x07") == [
        Decimal("0.7")
    ]


def test_list_and_map_size_prefix_is_skippable_span():
    """Nested complex payloads carry a 4-byte BE byte-size so a lazy
    reader can skip them without decoding — verify the prefix equals
    the actual body length."""
    enc = lb.encode_row(["array<int>"], [[5, None, 7]])
    # null byte 0x01, then 4-byte size, then body
    size = struct.unpack(">i", enc[1:5])[0]
    assert size == len(enc) - 5
    enc = lb.encode_row(["map<string,int>"], [{"a": 1, "b": None}])
    size = struct.unpack(">i", enc[1:5])[0]
    assert size == len(enc) - 5


_prims = [
    ("boolean", st.booleans()),
    ("tinyint", st.integers(-128, 127)),
    ("smallint", st.integers(-(2**15), 2**15 - 1)),
    ("int", st.integers(-(2**31), 2**31 - 1)),
    ("bigint", st.integers(-(2**62), 2**62 - 1)),
    ("double", st.floats(allow_nan=False, width=64)),
    ("string", st.text(max_size=12)),
    (
        "decimal(20,3)",
        st.integers(-(10**15), 10**15).map(
            lambda u: Decimal(u).scaleb(-3)
        ),
    ),
]


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_round_trip_property(data):
    n = data.draw(st.integers(1, 10))
    picks = [
        data.draw(st.sampled_from(range(len(_prims))))
        for _ in range(n)
    ]
    types, values = [], []
    for p in picks:
        t, strat = _prims[p]
        types.append(t)
        values.append(data.draw(st.none() | strat))
    # plus one nested column exercising list/map/struct together
    types.append("struct<xs:array<bigint>,m:map<string,int>>")
    values.append(
        {
            "xs": data.draw(
                st.lists(st.none() | st.integers(-(2**40), 2**40), max_size=5)
            ),
            "m": data.draw(
                st.dictionaries(
                    st.text(max_size=4),
                    st.none() | st.integers(-100, 100),
                    max_size=4,
                )
            ),
        }
    )
    assert lb.decode_row(types, lb.encode_row(types, values)) == values


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_prefix_truncation_fails_loudly(data):
    """Corrupt-input uniformity (r9 hardening): decoding any strict
    prefix of a valid row either raises EOFError/ValueError (truncated
    payload) or returns without reading past the buffer — never a
    bare IndexError or struct.error escape."""
    types = ["bigint", "string", "int", "decimal(12,2)", "boolean"]
    row = [42, "hello world", 7, Decimal("12.34"), True]
    blob = lb.encode_row(types, row)
    cut = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
    try:
        lb.decode_row(types, blob[:cut])
    except (EOFError, ValueError):
        pass  # the loud-failure contract
