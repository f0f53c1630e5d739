"""Avro source/sink (sources/avro_py — AvroSerDe analogue,
``serde/.../avro/AvroSerDe.java``). The container-file codec is
written from the public Avro 1.11 spec; these tests pin the binary
format invariants and the distributed mapInPandas plumbing.
"""

from __future__ import annotations

import datetime
import glob
import io

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from hdp2_5_hive_spark.sources import avro_py

SF = "/root/testdata/sf0.001"


def test_roundtrip_all_testdata_types(spark, tmp_path):
    """orders (date), events (timestamp), embeddings (float array),
    documents (text) all survive bit-exact."""
    from hdp2_5_hive_spark.catalog import register_views

    t = register_views(spark, SF)
    for name in ("orders", "events", "documents", "embeddings"):
        df = t[name]
        path = str(tmp_path / name)
        n = avro_py.write_avro(df, path)
        back = avro_py.read_avro(spark, path)
        assert back.schema == df.schema, name
        a = sorted(map(str, df.collect()))
        b = sorted(map(str, back.collect()))
        assert a == b, name
        assert n == df.count()


def test_write_is_one_file_per_partition(spark, tmp_path):
    df = spark.range(1000).repartition(7)
    path = str(tmp_path / "parts")
    avro_py.write_avro(df, path)
    assert len(glob.glob(f"{path}/part-*.avro")) == 7
    assert avro_py.read_avro(spark, path).count() == 1000


def test_nulls_round_trip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("s", T.StringType(), True),
            T.StructField("i", T.IntegerType(), True),
            T.StructField("d", T.DateType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("arr", T.ArrayType(T.LongType(), True), True),
        ]
    )
    rows = [
        Row(
            id=1,
            s="x",
            i=7,
            d=datetime.date(2001, 2, 3),
            ts=datetime.datetime(2026, 8, 13, 1, 2, 3, 456789),
            arr=[1, None, 3],
        ),
        Row(id=2, s=None, i=None, d=None, ts=None, arr=None),
        Row(id=3, s="", i=0, d=datetime.date(1969, 12, 31), ts=None, arr=[]),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "nulls")
    avro_py.write_avro(df, path)
    back = avro_py.read_avro(spark, path)
    assert back.schema == df.schema
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


def test_timestamp_microsecond_exact(spark, tmp_path):
    """timedelta decode path: micros survive exactly even at epochs
    where float-seconds arithmetic rounds."""
    ts = datetime.datetime(2026, 8, 13, 23, 59, 59, 999999)
    df = spark.createDataFrame([(ts,)], "ts timestamp")
    path = str(tmp_path / "micro")
    avro_py.write_avro(df, path)
    assert avro_py.read_avro(spark, path).collect()[0].ts == ts


def test_zigzag_varint_encoding():
    """Spec examples: 0→0x00, -1→0x01, 1→0x02, -64→0x7f, 64→0x80 0x01."""
    for value, expect in [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
    ]:
        buf = io.BytesIO()
        avro_py._write_long(buf, value)
        assert buf.getvalue() == expect, value
        assert avro_py._read_long(io.BytesIO(buf.getvalue())) == value


def test_long_round_trip_extremes():
    for v in (2**62, -(2**62), 2**31, -(2**31), 123456789012345):
        buf = io.BytesIO()
        avro_py._write_long(buf, v)
        assert avro_py._read_long(io.BytesIO(buf.getvalue())) == v


def test_container_magic_and_sync(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    path = str(tmp_path / "magic")
    avro_py.write_avro(df, path)
    fname = glob.glob(f"{path}/part-*.avro")[0]
    raw = open(fname, "rb").read()
    assert raw[:4] == b"Obj\x01"
    # corrupt one data byte → sync/size check must catch it
    bad = bytearray(raw)
    bad[-18] ^= 0xFF
    with pytest.raises(ValueError):
        avro_py.read_container(io.BytesIO(bytes(bad)))


def test_unsupported_type_is_loud(spark):
    df = spark.createDataFrame([({"k": 1},)], "m map<string,int>")
    with pytest.raises(Exception, match="unsupported"):
        avro_py.write_avro(df, "/tmp/avro_unsupported_probe")


def test_codec_property_roundtrip():
    """Hypothesis: arbitrary rows of (long, optional string, optional
    double-array) survive write_container → read_container without a
    Spark session — pins the binary codec itself."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("s", T.StringType(), True),
            T.StructField("arr", T.ArrayType(T.DoubleType(), False), True),
        ]
    )

    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(
                st.none(),
                st.lists(
                    st.floats(allow_nan=False, allow_infinity=True, width=64),
                    max_size=8,
                ),
            ),
        ),
        max_size=30,
    )

    @settings(max_examples=200, deadline=None)
    @given(rows_strategy)
    def check(rows):
        buf = io.BytesIO()
        n = avro_py.write_container(buf, schema, iter([rows]))
        assert n == len(rows)
        buf.seek(0)
        got_schema, got_rows = avro_py.read_container(buf)
        assert got_schema == schema
        assert [tuple(r) for r in got_rows] == [
            (i, s, list(a) if a is not None else None) for i, s, a in rows
        ]

    check()


def test_nullable_bigint_above_2_53_exact(spark, tmp_path):
    """A nullable long column with NULLs must round-trip values above
    2^53 bit-exact — the Arrow->pandas bridge would have coerced the
    column to float64 and silently rounded (mapInArrow keeps int64)."""
    big = 2**62 + 12345  # not representable in float64
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    df = spark.createDataFrame(
        [Row(id=1, v=big), Row(id=2, v=None), Row(id=3, v=-big)], schema
    )
    path = str(tmp_path / "bigints")
    assert avro_py.write_avro(df, path) == 3
    got = {r.id: r.v for r in avro_py.read_avro(spark, path).collect()}
    assert got == {1: big, 2: None, 3: -big}


def test_external_timestamp_millis_decodes_scaled(spark, tmp_path):
    """A container file written externally with logicalType
    timestamp-millis must decode with millis->micros scaling
    (AvroSerDe.java accepts both units; we always WRITE micros)."""
    ts = datetime.datetime(2026, 8, 13, 7, 30, 15, 250000)
    epoch = datetime.datetime(1970, 1, 1)
    millis = (ts - epoch) // datetime.timedelta(milliseconds=1)
    avro_schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "ts",
                "type": ["null", {"type": "long", "logicalType": "timestamp-millis"}],
            },
        ],
    }
    import json as _json

    buf = io.BytesIO()
    buf.write(avro_py.MAGIC)
    meta = io.BytesIO()
    avro_py._write_long(meta, 2)
    avro_py._write_bytes(meta, b"avro.schema")
    avro_py._write_bytes(meta, _json.dumps(avro_schema).encode())
    avro_py._write_bytes(meta, b"avro.codec")
    avro_py._write_bytes(meta, b"null")
    avro_py._write_long(meta, 0)
    buf.write(meta.getvalue())
    buf.write(avro_py.SYNC)
    block = io.BytesIO()
    # row 1: id=7, ts=millis (union branch 1); row 2: id=8, ts=null
    avro_py._write_long(block, 7)
    avro_py._write_long(block, 1)
    avro_py._write_long(block, millis)
    avro_py._write_long(block, 8)
    avro_py._write_long(block, 0)
    head = io.BytesIO()
    avro_py._write_long(head, 2)
    avro_py._write_long(head, block.tell())
    buf.write(head.getvalue())
    buf.write(block.getvalue())
    buf.write(avro_py.SYNC)
    buf.seek(0)
    got_schema, rows = avro_py.read_container(buf)
    assert got_schema["ts"].dataType == T.TimestampType()
    assert rows == [(7, ts), (8, None)]


def test_deflate_codec_round_trip(spark, tmp_path):
    """avro.codec=deflate (per-block raw RFC-1951 — the codec most
    real OCF files ship with): values round-trip exactly, the file
    is smaller than the uncompressed twin on repetitive data, and
    the header records the codec so reads need no hint."""
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("the same prefix again and again "), F.col("id"))
        .alias("s"),
    )
    plain, comp = str(tmp_path / "plain"), str(tmp_path / "comp")
    avro_py.write_avro(df.coalesce(1), plain)
    n = avro_py.write_avro(df.coalesce(1), comp, codec="deflate")
    assert n == 2000
    p = glob.glob(f"{plain}/part-*.avro")[0]
    c = glob.glob(f"{comp}/part-*.avro")[0]
    import os as _os

    assert _os.path.getsize(c) < _os.path.getsize(p)
    with open(c, "rb") as fh:
        assert avro_py.read_header(fh)[2] == "deflate"
    back = avro_py.read_avro(spark, comp)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_snappy_codec_round_trip(spark, tmp_path):
    """avro.codec=snappy (Avro spec optional codec: raw-snappy block
    + 4-byte BE CRC32 of the UNCOMPRESSED data): values round-trip
    exactly, the file shrinks on repetitive data, the header records
    the codec, and a flipped payload byte is caught by the CRC."""
    import os as _os

    import pytest as _pytest
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("the same prefix again and again "), F.col("id"))
        .alias("s"),
    )
    plain, comp = str(tmp_path / "plain"), str(tmp_path / "comp")
    avro_py.write_avro(df.coalesce(1), plain)
    n = avro_py.write_avro(df.coalesce(1), comp, codec="snappy")
    assert n == 2000
    p = glob.glob(f"{plain}/part-*.avro")[0]
    c = glob.glob(f"{comp}/part-*.avro")[0]
    assert _os.path.getsize(c) < _os.path.getsize(p)
    with open(c, "rb") as fh:
        assert avro_py.read_header(fh)[2] == "snappy"
    back = avro_py.read_avro(spark, comp)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    # corrupt the stored CRC -> loud error, not silent garbage
    # (raised inside the executor, so it surfaces Py4J-wrapped)
    blob = bytearray(open(c, "rb").read())
    # flip a bit near the end of the final block's CRC region
    blob[-20] ^= 0x01
    open(c, "wb").write(bytes(blob))
    with _pytest.raises(Exception, match="CRC mismatch"):
        avro_py.read_avro(spark, c).collect()


def test_unsupported_avro_codec_is_loud(spark, tmp_path):
    """A zstandard-coded file must raise the actionable error at
    header parse, not garbage mid-block (snappy moved to the
    supported list)."""
    import pytest as _pytest

    df = spark.range(5)
    path = str(tmp_path / "x")
    avro_py.write_avro(df.coalesce(1), path)
    f = glob.glob(f"{path}/part-*.avro")[0]
    data = open(f, "rb").read()
    assert b"null" in data
    open(f, "wb").write(data.replace(b"\x08null", b"\x12zstandard", 1))
    with _pytest.raises(ValueError, match="zstandard"):
        avro_py.read_avro(spark, f).collect()


def test_corrupt_varint_and_lengths_raise_valueerror():
    """Corrupt-input uniformity (r9 hardening): truncated varints,
    never-terminating varints, and negative byte-lengths (which would
    otherwise become io.read(-n) = read-to-EOF) all raise ValueError."""
    import io

    import pytest

    from hdp2_5_hive_spark.sources import avro_py as av

    with pytest.raises(ValueError, match="truncated"):
        av._read_long(io.BytesIO(b"\x80"))  # continuation, no next byte
    # spec boundary (ADVICE r9): a zig-zag long is AT MOST 10 bytes —
    # the maximal value (10 bytes, final shift 63) parses, an 11-byte
    # varint is rejected as corrupt, not silently accepted
    assert av._read_long(io.BytesIO(b"\xff" * 9 + b"\x01")) == -(2**63)
    with pytest.raises(ValueError, match="varint too long"):
        av._read_long(io.BytesIO(b"\x80" * 10 + b"\x00"))
    # zigzag -3 encodes as 0x05: a negative length must not read-to-EOF
    with pytest.raises(ValueError, match="negative bytes length"):
        av._read_bytes(io.BytesIO(b"\x05rest-of-stream"))
    with pytest.raises(ValueError, match="truncated stream"):
        av._read_bytes(io.BytesIO(b"\x0aab"))  # length 5, 2 present


def test_corrupt_block_header_raises_valueerror(spark, sf_dir):
    """Code-review r9 finding: a corrupt negative block count/size in
    the container block header raises ValueError (not read-to-EOF then
    zlib.error/struct.error)."""
    import glob
    import io

    import pytest

    from hdp2_5_hive_spark.catalog import Tables
    from hdp2_5_hive_spark.scratch import scratch_dir
    from hdp2_5_hive_spark.sources import avro_py as av

    t = Tables(spark, sf_dir)
    d = scratch_dir("test_avro_corrupt_") + "/avro"
    av.write_avro(t.region.select("r_regionkey", "r_name"), d)
    path = sorted(glob.glob(d + "/*.avro"))[0]
    blob = open(path, "rb").read()
    # find the first block header (right after header+sync): flip the
    # block-count varint to zigzag -3 (0x05)
    with open(path, "rb") as fh:
        av.read_header(fh)
        hdr_end = fh.tell()
    corrupt = blob[:hdr_end] + b"\x05" + blob[hdr_end + 1 :]
    with pytest.raises(ValueError, match="corrupt block header"):
        av.read_container(io.BytesIO(corrupt))


def test_varint_64bit_overflow_rejected():
    """Regression: a 10-byte varint whose final byte sets bits above
    bit 63 decoded (via unbounded Python ints) to a value no
    conforming Avro writer can produce — e.g. b'\\xff'*9 + b'\\x7f'
    gave a 70-bit long. The final byte may carry ONLY bit 63; higher
    bits are corrupt and must fail loudly. Long.MIN_VALUE (final
    byte 0x01) remains decodable."""
    from io import BytesIO

    from hdp2_5_hive_spark.sources.avro_py import _read_long

    assert _read_long(BytesIO(b"\xff" * 9 + b"\x01")) == -(1 << 63)
    with pytest.raises(ValueError, match="exceeds 64 bits"):
        _read_long(BytesIO(b"\xff" * 9 + b"\x7f"))
    with pytest.raises(ValueError, match="exceeds 64 bits"):
        _read_long(BytesIO(b"\xff" * 9 + b"\x03"))


def test_avro_container_mutation_fuzz_never_leaks_internal_errors():
    """Seeded byte-mutation/truncation fuzz over the from-scratch OCF
    reader: parse or ValueError/EOFError — never IndexError /
    struct.error / KeyError / OverflowError / a hang (round-12
    decoder contract)."""
    import io
    import signal

    import numpy as np
    from pyspark.sql import types as T

    from hdp2_5_hive_spark.sources import avro_py as av

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    rows = [(i, f"name{i}", i / 3.0) for i in range(40)]
    buf = io.BytesIO()
    av.write_container(buf, schema, iter([rows]), codec="null")
    payload = buf.getvalue()
    rng = np.random.default_rng(11)
    allowed = (ValueError, EOFError)
    signal.alarm(120)
    try:
        for trial in range(150):
            mutated = bytearray(payload)
            for _ in range(int(rng.integers(1, 5))):
                pos = int(rng.integers(0, len(mutated)))
                mutated[pos] = int(rng.integers(0, 256))
            if trial % 4 == 0:
                mutated = mutated[: int(rng.integers(1, len(mutated)))]
            try:
                av.read_container(io.BytesIO(bytes(mutated)))
            except allowed:
                pass
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"{type(exc).__name__} leaked from trial {trial}: {exc}"
                ) from exc
    finally:
        signal.alarm(0)


def test_overwrite_sweeps_orphaned_attempt_tmp_files(spark, tmp_path):
    """A losing speculative/retried attempt leaves a uniquely named
    part-*.inprogress behind (the winner renamed its own tmp away);
    the next overwrite must sweep those orphans, not just the
    committed part-*.avro files."""
    path = str(tmp_path / "out")
    df = spark.range(10).selectExpr("id", "cast(id as string) AS s")
    avro_py.write_avro(df, path)
    orphan = path + "/part-00000.avro.9999.inprogress"
    with open(orphan, "wb") as fh:
        fh.write(b"torn attempt bytes")
    avro_py.write_avro(df, path)
    assert not glob.glob(path + "/*.inprogress")
    back = avro_py.read_avro(spark, path)
    assert back.count() == 10


def test_deep_schema_json_raises_valueerror_not_recursionerror():
    """Corrupt-input contract (r13): json.loads raises RecursionError
    (not JSONDecodeError) on a pathologically nested avro.schema —
    an internal error class a file reader must not leak."""
    import struct as _struct

    def _enc_long(n: int) -> bytes:
        n = (n << 1) ^ (n >> 63)
        out = b""
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    deep = (
        b'{"type":"array","items":' * 3000 + b'"long"' + b"}" * 3000
    )
    buf = b"Obj\x01" + _enc_long(2)
    for k, v in ((b"avro.schema", deep), (b"avro.codec", b"null")):
        buf += _enc_long(len(k)) + k + _enc_long(len(v)) + v
    buf += _enc_long(0) + b"S" * 16
    with pytest.raises(ValueError, match="nests beyond"):
        avro_py.read_header(io.BytesIO(buf))
