"""Pure-Python LZ4 block codec (sources/lz4_py): wire pins from the
public block-format spec, both-direction interop against the
reference lz4 library (shipped inside pyarrow), Hadoop block framing,
and the RCFile+Lz4Codec migration read."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive_spark.sources import lz4_py as lz

REF = pa.Codec("lz4_raw")


def test_wire_vector_pins():
    """Hand-decoded per lz4_Block_format.md: token high nibble =
    literal run, low nibble = match len - 4, 2-byte LE offset, final
    sequence literals-only."""
    # token 0x6e: 6 literals 'hello ', match len 14+4=18, offset 6;
    # token 0x50: 5 final literals 'hello'
    wire = bytes.fromhex("6e68656c6c6f2006005068656c6c6f")
    assert lz.uncompress(wire) == b"hello hello hello hello hello"
    assert lz.compress(b"hello hello hello hello hello") == wire
    # empty block = lone 0x00 token
    assert lz.compress(b"") == b"\x00"
    assert lz.uncompress(b"\x00") == b""
    # short input stays all-literal (last-5-literals / 12-byte rules)
    assert lz.compress(b"abc") == b"\x30abc"


def test_overlap_and_extended_lengths():
    """offset < length RLE replay, and 15+-extended length bytes."""
    data = b"z" * 100_000  # needs extended match lengths
    enc = lz.compress(data)
    assert lz.uncompress(enc) == data
    assert REF.decompress(enc, len(data), asbytes=True) == data
    # long incompressible literal run exercises extended literals
    import os

    rnd = os.urandom(70_000)
    assert REF.decompress(lz.compress(rnd), len(rnd), asbytes=True) == rnd


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):
        # match offset reaching before output start
        lz.uncompress(b"\x04" + b"ab" + b"\x09\x00")
    with pytest.raises(ValueError):
        lz.uncompress(b"\x10a\x01\x00", expected=99)


def test_truncated_streams_raise_valueerror():
    """ADVICE r8: truncated input must raise ValueError uniformly
    (never a bare IndexError from an extended-length read past the
    buffer, and never a silently-shortened literal run)."""
    # extended literal length cut off mid-read (token says 15+ext)
    with pytest.raises(ValueError, match="truncated"):
        lz.uncompress(b"\xf0")
    # literal run shorter than declared
    with pytest.raises(ValueError, match="truncated"):
        lz.uncompress(b"\x40ab")  # 4 literals declared, 2 present
    # match offset cut to one byte (token 0x14: 1 literal, then a
    # 2-byte offset of which only 1 byte is present)
    with pytest.raises(ValueError, match="truncated"):
        lz.uncompress(b"\x14a\x01")
    # extended match length cut off
    with pytest.raises(ValueError, match="truncated"):
        lz.uncompress(b"\x1fa\x01\x00")  # ml=15 ext byte missing


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_interop_roundtrip_small(data):
    assert lz.uncompress(REF.compress(data, asbytes=True), len(data)) == data
    assert REF.decompress(lz.compress(data), len(data), asbytes=True) == data


@settings(max_examples=20, deadline=None)
@given(
    st.binary(min_size=1, max_size=64),
    st.integers(min_value=1, max_value=8192),
)
def test_interop_repetitive(pattern, reps):
    data = (pattern * reps)[:200_000]
    assert lz.uncompress(REF.compress(data, asbytes=True), len(data)) == data
    assert REF.decompress(lz.compress(data), len(data), asbytes=True) == data


def test_block_framing_roundtrip():
    data = b"lz4 block " * 60_000
    assert lz.block_uncompress(lz.block_compress(data)) == data
    assert lz.block_compress(b"") == b""
    assert lz.block_uncompress(b"") == b""


def test_rcfile_lz4_roundtrip_and_split_read(spark, sf_dir):
    """RCFile written with Lz4Codec (Hadoop-bundled since 2.x, the
    HDP era) read back with byte-range splits — the codec matrix for
    the Python migration reader is now the full Hadoop-bundled set:
    DefaultCodec/gzip/bzip2/snappy/lz4."""
    import glob

    from hdp2_5_hive_spark.catalog import Tables
    from hdp2_5_hive_spark.scratch import scratch_dir
    from hdp2_5_hive_spark.sources import rcfile_py

    t = Tables(spark, sf_dir)
    src = t.region.select("r_regionkey", "r_name")
    d = scratch_dir("test_rc_lz4_") + "/rc"
    rcfile_py.write_rcfile(src.repartition(2), d, group_rows=4, codec="lz4")
    back = rcfile_py.read_rcfile(spark, d, split_bytes=1024)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )
    with open(sorted(glob.glob(d + "/*"))[0], "rb") as fh:
        assert b"org.apache.hadoop.io.compress.Lz4Codec" in fh.read(200)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=512), st.data())
def test_prefix_truncation_never_indexerror(data, draw):
    """Uniform-failure fuzz (ADVICE r8): ANY strict prefix of a valid
    compressed block either raises ValueError (when passed with the
    original expected length) or never escapes with IndexError — the
    decoder's bounds checks must cover every read."""
    blob = lz.compress(data)
    cut = draw.draw(st.integers(min_value=0, max_value=len(blob) - 1))
    try:
        lz.uncompress(blob[:cut], expected=len(data))
    except ValueError:
        pass  # the uniform corrupt-stream contract


def test_block_framing_corrupt_inputs_raise_valueerror():
    """Framing-layer corrupt inputs fail uniformly with ValueError:
    truncated headers (struct.error before), a zero/negative chunk
    length, and the crafted [orig>0][clen=1][empty-block] stream that
    previously looped forever (an empty chunk makes no progress)."""
    import struct as _struct

    with pytest.raises(ValueError, match="truncated block header"):
        lz.block_uncompress(b"\x00\x00")
    with pytest.raises(ValueError, match="truncated chunk header"):
        lz.block_uncompress(_struct.pack(">i", 5) + b"\x00")
    with pytest.raises(ValueError, match="bad chunk length"):
        lz.block_uncompress(_struct.pack(">ii", 5, 0))
    with pytest.raises(ValueError, match="bad chunk length"):
        lz.block_uncompress(_struct.pack(">ii", 5, 99) + b"\x00")
    with pytest.raises(ValueError, match="negative block length"):
        lz.block_uncompress(_struct.pack(">i", -1))
    # the infinite-loop shape: orig=5, one 1-byte chunk decoding to b""
    with pytest.raises(ValueError, match="empty chunk"):
        lz.block_uncompress(_struct.pack(">ii", 5, 1) + b"\x00")
