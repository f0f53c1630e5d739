"""Pure-Python snappy (sources/snappy_py): wire pins from the public
format description, both-direction interop against an INDEPENDENT
implementation (google snappy, shipped inside pyarrow), Hadoop
BlockCompressorStream framing, and the RCFile+SnappyCodec migration
read it exists for."""

from __future__ import annotations

import struct

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive_spark.sources import snappy_py as sp

REF = pa.Codec("snappy")


def test_wire_vector_pins():
    """Hand-decoded vectors per format_description.txt."""
    # preamble 29, literal 'hello ' (tag 0x14: len-1=5, kind 00),
    # 2-byte-offset copy (tag 0x5a: len (0x5a>>2)+1 = 23, offset 6)
    wire = bytes.fromhex("1d1468656c6c6f205a0600")
    assert sp.uncompress(wire) == b"hello hello hello hello hello"
    assert sp.compress(b"hello hello hello hello hello") == wire
    # empty stream = lone varint-0 preamble
    assert sp.compress(b"") == b"\x00"
    assert sp.uncompress(b"\x00") == b""
    # incompressible short input = preamble + one literal
    assert sp.compress(b"abc") == b"\x03\x08abc"


def test_overlapping_copy_rle():
    """offset < length replays produced bytes (RLE encoding)."""
    # preamble 10, literal 'a', copy len 9 offset 1
    wire = b"\x0a\x00a" + bytes([2 | (8 << 2)]) + b"\x01\x00"
    assert sp.uncompress(wire) == b"a" * 10
    # our encoder must produce something the reference accepts for RLE
    data = b"x" * 100_000
    assert REF.decompress(sp.compress(data), len(data), asbytes=True) == data


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):
        sp.uncompress(b"")  # no preamble
    with pytest.raises(ValueError):
        # copy reaching before the start of output
        sp.uncompress(b"\x04" + bytes([1]) + b"\x09")
    with pytest.raises(ValueError):
        # preamble promises more than the stream produces
        sp.uncompress(b"\x7f\x08abc")


def test_truncated_streams_raise_valueerror():
    """ADVICE r8: truncated input raises ValueError uniformly — never
    a bare IndexError, never a silently-shortened literal run."""
    # varint preamble with continuation bit but no next byte
    with pytest.raises(ValueError, match="truncated"):
        sp.uncompress(b"\x80")
    # literal run shorter than declared (preamble 4, tag says 4 lits)
    with pytest.raises(ValueError, match="truncated"):
        sp.uncompress(b"\x04\x0cab")
    # extended literal length bytes missing (tag 60<<2 needs 1 byte)
    with pytest.raises(ValueError, match="truncated"):
        sp.uncompress(b"\x04\xf0")
    # 1-byte-offset copy with the offset byte missing
    with pytest.raises(ValueError, match="truncated"):
        sp.uncompress(b"\x08\x00a\x05")
    # 2-byte-offset copy cut to one byte
    with pytest.raises(ValueError, match="truncated"):
        sp.uncompress(b"\x08\x00a\x06\x01")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_interop_roundtrip_small(data):
    """Both directions against google snappy on arbitrary bytes."""
    assert sp.uncompress(REF.compress(data, asbytes=True)) == data
    assert REF.decompress(sp.compress(data), len(data), asbytes=True) == data


@settings(max_examples=20, deadline=None)
@given(
    st.binary(min_size=1, max_size=64),
    st.integers(min_value=1, max_value=8192),
)
def test_interop_repetitive(pattern, reps):
    """Repetitive data (the case compression exists for), sized past
    the 64 KiB fragment boundary so cross-fragment independence is
    exercised."""
    data = (pattern * reps)[:200_000]
    assert sp.uncompress(REF.compress(data, asbytes=True)) == data
    assert REF.decompress(sp.compress(data), len(data), asbytes=True) == data


def test_block_framing_layout_and_roundtrip():
    """Hadoop BlockCompressorStream: [i32 BE orig][i32 BE clen][chunk]
    repeated; 256 KiB default blocks; empty input -> empty stream."""
    data = b"snappy block " * 50_000  # 650 KB -> 3 blocks
    framed = sp.block_compress(data)
    (orig,) = struct.unpack_from(">i", framed, 0)
    assert orig == sp.BLOCK_SIZE  # first block is exactly one buffer
    assert sp.block_uncompress(framed) == data
    assert sp.block_compress(b"") == b""
    assert sp.block_uncompress(b"") == b""
    # single short block
    assert sp.block_uncompress(sp.block_compress(b"xy")) == b"xy"


def test_sequencefile_snappy_jvm_roundtrip(spark):
    """SequenceFile+SnappyCodec goes through the JVM (Hadoop 3.3+
    bundles java-snappy, no native lib needed) — pin that the write
    hint and hint-free read both work in this environment, closing
    the other half of the Snappy/LZO residual."""
    from hdp2_5_hive_spark.scratch import scratch_dir

    d = scratch_dir("test_seq_snappy_") + "/seq"
    data = [(f"k{i}", f"v{i}") for i in range(100)]
    spark.sparkContext.parallelize(data, 2).saveAsSequenceFile(
        d, "org.apache.hadoop.io.compress.SnappyCodec"
    )
    back = spark.sparkContext.sequenceFile(d).collect()
    assert sorted(back) == sorted(data)


def test_rcfile_snappy_roundtrip_and_split_read(spark, sf_dir):
    """The migration read this codec exists for: RCFile written with
    SnappyCodec (header names the codec class, every key/column
    buffer an independent block stream), read back with byte-range
    splits forcing sync resynchronization."""
    from hdp2_5_hive_spark.catalog import Tables
    from hdp2_5_hive_spark.scratch import scratch_dir
    from hdp2_5_hive_spark.sources import rcfile_py

    t = Tables(spark, sf_dir)
    src = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    d = scratch_dir("test_rc_snappy_") + "/rc"
    rcfile_py.write_rcfile(src.repartition(2), d, group_rows=8,
                           codec="snappy")
    back = rcfile_py.read_rcfile(spark, d, split_bytes=2048)
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in src.collect())
    assert got == want
    # header carries the full Hadoop codec class name
    import glob

    with open(sorted(glob.glob(d + "/*"))[0], "rb") as fh:
        head = fh.read(200)
    assert b"org.apache.hadoop.io.compress.SnappyCodec" in head


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=512), st.data())
def test_prefix_truncation_never_indexerror(data, draw):
    """Uniform-failure fuzz (ADVICE r8): ANY strict prefix of a valid
    compressed buffer either raises ValueError or decodes to a result
    the preamble-length check validates — never a bare IndexError."""
    blob = sp.compress(data)
    cut = draw.draw(st.integers(min_value=0, max_value=len(blob) - 1))
    try:
        sp.uncompress(blob[:cut])
    except ValueError:
        pass  # the uniform corrupt-stream contract


def test_block_framing_corrupt_inputs_raise_valueerror():
    """Framing-layer corrupt inputs fail uniformly with ValueError —
    truncated headers, zero/negative chunk lengths, and the
    empty-chunk no-progress stream."""
    with pytest.raises(ValueError, match="truncated block header"):
        sp.block_uncompress(b"\x00\x00")
    with pytest.raises(ValueError, match="truncated chunk header"):
        sp.block_uncompress(struct.pack(">i", 5) + b"\x00")
    with pytest.raises(ValueError, match="bad chunk length"):
        sp.block_uncompress(struct.pack(">ii", 5, 0))
    with pytest.raises(ValueError, match="bad chunk length"):
        sp.block_uncompress(struct.pack(">ii", 5, 99) + b"\x00")
    with pytest.raises(ValueError, match="negative block length"):
        sp.block_uncompress(struct.pack(">i", -1))
    # orig=5 with a 1-byte chunk decoding to b"" (preamble 0)
    with pytest.raises(ValueError, match="empty chunk"):
        sp.block_uncompress(struct.pack(">ii", 5, 1) + b"\x00")
