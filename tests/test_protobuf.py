"""Proto2 wire-format codec (sources/protobuf_py): bytes pinned
against the published encoding spec (varint/zigzag/packed/LEN),
presence semantics, spec-mandated reader behaviors (packed OR
unpacked repeated, last-one-wins, unknown-field skip), the
reference's Complexpb fixture shape, and hypothesis round-trips."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive_spark.sources import protobuf_py as pb


def test_known_wire_bytes():
    """Spec examples: tag = (field<<3)|wire, varint base-128 LE,
    strings LEN-prefixed. 150 -> ac 02 and field-1 varint tag 0x08
    are the canonical protobuf.dev worked examples."""
    b = pb.encode_row(["int", "string"], [150, "testing"])
    assert b == b"\x08\x96\x01\x12\x07testing"
    assert pb.decode_row(["int", "string"], b) == [150, "testing"]


def test_negative_int_is_ten_byte_varint_and_zigzag_is_short():
    """proto2 rule: plain int32/int64 negatives serialize as the
    64-bit two's complement (10-byte varint); sint* zigzag keeps
    small negatives small (-1 -> 1 -> one byte)."""
    plain = pb.encode_row(["int"], [-1])
    assert len(plain) == 1 + 10
    zz = pb.encode_row(["sint32"], [-1])
    assert zz == b"\x08\x01"
    assert pb.decode_row(["int"], plain) == [-1]
    assert pb.decode_row(["sint32"], zz) == [-1]
    assert pb.decode_row(["sint64"], pb.encode_row(["sint64"], [-2]))[0] == -2


def test_null_is_absent_field():
    b = pb.encode_row(
        ["bigint", "string", "double"], [5, None, 2.5]
    )
    assert pb.decode_row(["bigint", "string", "double"], b) == [
        5,
        None,
        2.5,
    ]
    assert pb.decode_row(["bigint", "string", "double"], b"") == [
        None,
        None,
        None,
    ]


def test_packed_write_unpacked_read_and_mixed_concat():
    """Writer packs numeric repeated fields (single LEN record);
    the reader must accept packed AND unpacked occurrences and
    concatenate them — both spec requirements."""
    types = ["array<int>"]
    packed = pb.encode_row(types, [[3, 270, 86942]])
    # single LEN record for field 1 (tag 0x0a)
    assert packed[0] == 0x0A
    assert pb.decode_row(types, packed) == [[3, 270, 86942]]
    # hand-built unpacked form: one VARINT tag (0x08) per element
    unpacked = b"\x08\x03\x08\x8e\x02"
    assert pb.decode_row(types, unpacked) == [[3, 270]]
    # mixed unpacked-then-packed concatenates in order
    assert pb.decode_row(types, unpacked + packed) == [
        [3, 270, 3, 270, 86942]
    ]


def test_repeated_string_is_one_tag_per_element():
    types = ["array<string>"]
    b = pb.encode_row(types, [["ab", "", "c"]])
    assert pb.decode_row(types, b) == [["ab", "", "c"]]
    # LEN elements never pack: 3 separate field-1 LEN tags
    assert b.count(b"\x0a") >= 3


def test_last_one_wins_for_scalar():
    """Spec: duplicate occurrences of a non-repeated field — the
    last value wins (message-merge semantics)."""
    twice = pb.encode_row(["int"], [1]) + pb.encode_row(["int"], [2])
    assert pb.decode_row(["int"], twice) == [2]


def test_unknown_field_is_skipped_by_wire_type():
    """Forward compatibility: a 2-column reader over 3-column
    writer bytes skips the unknown field for every wire type."""
    w3 = pb.encode_row(
        ["int", "string", "double"], [7, "x", 1.5]
    )
    assert pb.decode_row(["int", "string"], w3) == [7, "x"]
    w_len = pb.encode_row(["int", "string"], [1, "zzz"])
    assert pb.decode_row(["int"], w_len) == [1]
    w_f32 = pb.encode_row(["int", "fixed32"], [1, 9])
    assert pb.decode_row(["int"], w_f32) == [1]


def test_fixed_and_float_widths():
    types = ["fixed32", "fixed64", "float", "double"]
    b = pb.encode_row(types, [7, 2**40, 0.5, -2.25])
    # 4 one-byte tags + 4 + 8 + 4 + 8 payload bytes
    assert len(b) == 4 + 24
    assert pb.decode_row(types, b) == [7, 2**40, 0.5, -2.25]


def test_map_is_repeated_kv_message():
    """protobuf map field == repeated message{key=1,value=2};
    later duplicate keys win, keys written sorted."""
    types = ["map<string,bigint>"]
    b = pb.encode_row(types, [{"b": 2, "a": 1}])
    assert pb.decode_row(types, b) == [{"a": 1, "b": 2}]
    dup = b + pb.encode_row(types, [{"a": 9}])
    assert pb.decode_row(types, dup) == [{"a": 9, "b": 2}]


def test_complexpb_fixture_shape():
    """The reference's PROTOCOL_BUFFERS ObjectInspector fixture
    (serde/src/gen/protobuf/.../Complexpb.java): Complex{aint=1,
    aString=2, repeated lint=3, repeated lString=4, repeated
    IntString lintString=5}, IntString{myint=1, myString=2,
    underscore_int=3}."""
    intstring = "struct<myint:int,mystring:string,underscore_int:int>"
    types = [
        "int",
        "string",
        "array<int>",
        "array<string>",
        f"array<{intstring}>",
    ]
    row = [
        12,
        "sample",
        [1, 2],
        ["a", "b"],
        [[7, "seven", -7], [8, None, 0]],
    ]
    assert pb.decode_row(types, pb.encode_row(types, row)) == row


def test_nested_struct_with_map():
    t = "struct<a:bigint,m:map<string,double>>"
    b = pb.encode_row(["string", t], ["k", [5, {"x": 1.5}]])
    assert pb.decode_row(["string", t], b) == ["k", [5, {"x": 1.5}]]


@settings(max_examples=150, deadline=None)
@given(
    st.tuples(
        st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        st.one_of(st.none(), st.text(max_size=40)),
        st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
        st.one_of(st.none(), st.floats(allow_nan=False)),
        st.one_of(st.none(), st.booleans()),
        st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        st.one_of(
            st.none(), st.lists(st.integers(-(2**31), 2**31 - 1))
        ),
    )
)
def test_round_trip_property(vals):
    types = [
        "bigint",
        "string",
        "int",
        "double",
        "boolean",
        "sint64",
        "array<int>",
    ]
    b = pb.encode_row(types, list(vals))
    assert pb.decode_row(types, b) == list(vals)


@settings(max_examples=75, deadline=None)
@given(
    st.dictionaries(st.text(max_size=8), st.integers(-(2**63), 2**63 - 1), max_size=6),
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
            st.one_of(st.none(), st.text(max_size=12)),
        ),
        max_size=4,
    ),
)
def test_map_and_nested_struct_round_trip_property(m, structs):
    types = [
        "map<string,bigint>",
        "array<struct<a:sint32,b:string>>",
    ]
    row = [m if m else None, [list(t) for t in structs] if structs else None]
    b = pb.encode_row(types, row)
    got = pb.decode_row(types, b)
    assert got[0] == row[0]
    assert got[1] == row[1]


def test_corrupt_varint_raises_valueerror():
    """Corrupt-input uniformity (r9 hardening): a truncated varint
    raises ValueError, never a bare IndexError."""
    import pytest

    from hdp2_5_hive_spark.sources import protobuf_py as pb

    with pytest.raises(ValueError, match="truncated"):
        pb._read_varint(b"\x80", 0)
    with pytest.raises(ValueError, match="truncated"):
        pb._read_varint(b"", 0)


def test_truncated_len_payload_raises():
    """Code-review r9 finding: a LEN field whose declared length
    exceeds the remaining buffer must raise, not silently clamp to
    the bytes present (decode_row(['string'], b'\\x0a\\x05ab')
    previously returned ['ab'])."""
    import pytest

    from hdp2_5_hive_spark.sources import protobuf_py as pb

    with pytest.raises(ValueError, match="LEN payload"):
        pb.decode_row(["string"], b"\x0a\x05ab")
    with pytest.raises(ValueError, match="LEN payload"):
        pb.decode_row(["binary"], b"\x0a\x7fxy")
    # nested struct with truncated body
    with pytest.raises(ValueError, match="LEN payload"):
        pb.decode_row(["struct<a:int>"], b"\x0a\x09\x08")
    # fixed-width field cut short
    with pytest.raises(ValueError, match="truncated"):
        pb.decode_row(["double"], b"\x09\x00\x00")
