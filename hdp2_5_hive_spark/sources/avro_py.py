"""Avro source/sink (AvroSerDe analogue,
``serde/src/java/org/apache/hadoop/hive/serde2/avro/AvroSerDe.java``).

This environment ships Spark without the external ``spark-avro``
datasource jar, so the engine carries its own Object Container File
codec written from the public Apache Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/): magic
``Obj\\x01``, file-metadata map (``avro.schema``/``avro.codec``),
16-byte sync marker, then blocks of ``(row count, byte size, data,
sync)`` with zigzag-varint longs, length-prefixed strings/bytes,
IEEE-754 little-endian floats, and ``[null, T]`` unions for nullable
fields. Logical types: ``date`` (int days) and ``timestamp-micros``
(long) per the spec.

Spark-first plumbing: writes are one container file per partition via
``mapInPandas`` (Arrow-batched transfer, distributed IO — no
driver-side collect of data), reads parallelize the file list and
decode per task. When the native ``spark-avro`` module IS on the
classpath (real clusters), ``write_avro``/``read_avro`` delegate to
it — the Python codec is the jar-less fallback, not a replacement.

Scope: primitive columns, arrays of primitives, and nullable fields —
the full testdata surface. Nested structs/maps/decimal raise a clear
error. A double NULL round-trips as NaN (the Arrow pandas bridge has
a single representation for both).
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct
from collections.abc import Iterator
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes per spec)

_EPOCH = date(1970, 1, 1)

# ---------------------------------------------------------------------------
# Schema mapping: Spark StructType <-> Avro record schema JSON
# ---------------------------------------------------------------------------

_PRIMITIVES: dict[type, object] = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
    T.DateType: {"type": "int", "logicalType": "date"},
    T.TimestampType: {"type": "long", "logicalType": "timestamp-micros"},
    T.TimestampNTZType: {"type": "long", "logicalType": "local-timestamp-micros"},
}


def _avro_type(dt: T.DataType) -> object:
    for cls, avro in _PRIMITIVES.items():
        if isinstance(dt, cls):
            return avro
    if isinstance(dt, T.ArrayType):
        items = _avro_type(dt.elementType)
        if dt.containsNull:
            items = ["null", items]
        return {"type": "array", "items": items}
    raise TypeError(f"avro_py: unsupported Spark type {dt.simpleString()}")


def spark_to_avro_schema(schema: T.StructType, name: str = "row") -> dict:
    fields = []
    for f in schema.fields:
        at = _avro_type(f.dataType)
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": name, "fields": fields}


def _spark_type(avro: object) -> tuple[T.DataType, bool]:
    """Avro type -> (Spark type, nullable)."""
    if isinstance(avro, list):  # union — only [null, T] supported
        branches = [b for b in avro if b != "null"]
        if len(branches) != 1:
            raise TypeError(f"avro_py: unsupported union {avro}")
        dt, _ = _spark_type(branches[0])
        return dt, True
    if isinstance(avro, dict):
        lt = avro.get("logicalType")
        if lt == "date":
            return T.DateType(), False
        if lt == "timestamp-micros":
            return T.TimestampType(), False
        if lt == "timestamp-millis":
            return T.TimestampType(), False
        if lt == "local-timestamp-micros":
            return T.TimestampNTZType(), False
        if avro.get("type") == "array":
            el, el_null = _spark_type(avro["items"])
            return T.ArrayType(el, containsNull=el_null), False
        return _spark_type(avro["type"])
    names = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }
    if avro in names:
        return names[avro], False
    raise TypeError(f"avro_py: unsupported Avro type {avro!r}")


def avro_to_spark_schema(avro: dict) -> T.StructType:
    out = T.StructType()
    for f in avro["fields"]:
        dt, nullable = _spark_type(f["type"])
        out = T.StructType(out.fields + [T.StructField(f["name"], dt, nullable)])
    return out


# ---------------------------------------------------------------------------
# Binary encoding (Avro spec §"Binary Encoding")
# ---------------------------------------------------------------------------


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_long(src) -> int:
    shift, acc = 0, 0
    while True:
        b = src.read(1)
        if not b:
            raise ValueError("avro_py: truncated stream (varint)")
        b = b[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        # a valid zig-zag long is at most 10 bytes: the 10th byte
        # carries bits 63+ (shift 63), so a continuation byte that
        # would start an 11th (shift 70) is already corrupt
        if shift >= 70:
            raise ValueError("avro_py: varint too long (corrupt stream)")
    if acc >> 64:
        # a 10th byte may carry ONLY bit 63 (the zig-zag long's top
        # bit): any higher bit decodes to a value no conforming
        # writer can produce (Java's BinaryDecoder drops the overflow
        # via 64-bit shifts; unbounded Python ints would keep it and
        # emit an impossible bigint instead of failing loudly)
        raise ValueError("avro_py: varint exceeds 64 bits (corrupt stream)")
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _date_from_days(days: int):
    # corrupt day counts overflow date.fromordinal — uniform ValueError
    try:
        return date.fromordinal(_EPOCH.toordinal() + days)
    except (OverflowError, ValueError) as exc:
        raise ValueError(f"avro_py: date out of range ({days} days)") from exc


def _ts_from_micros(epoch, timedelta_cls, micros: int):
    try:
        return epoch + timedelta_cls(microseconds=micros)
    except OverflowError as exc:
        raise ValueError(
            f"avro_py: timestamp out of range ({micros} micros)"
        ) from exc


def _read_exact(src, n: int) -> bytes:
    out = src.read(n)
    if len(out) != n:
        raise ValueError(
            "avro_py: truncated stream (fixed-width value)"
        )
    return out


def _read_bytes(src) -> bytes:
    n = _read_long(src)
    if n < 0:
        # io.read(negative) means read-to-EOF — a corrupt negative
        # length must fail loudly, not swallow the rest of the stream
        raise ValueError(f"avro_py: negative bytes length {n} (corrupt)")
    out = src.read(n)
    if len(out) != n:
        raise ValueError("avro_py: truncated stream (bytes body)")
    return out


class _FieldCodec:
    """Per-field encode/decode closure pair, resolved from the Spark type
    once per file instead of per value."""

    def __init__(self, dt: T.DataType, nullable: bool, ts_millis: bool = False):
        self.nullable = nullable
        self.ts_millis = ts_millis
        self.enc, self.dec = self._resolve(dt)

    def _resolve(self, dt):
        if isinstance(dt, T.BooleanType):
            return (
                lambda buf, v: buf.write(b"\x01" if v else b"\x00"),
                lambda src: _read_exact(src, 1) == b"\x01",
            )
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType, T.LongType)):
            return (lambda buf, v: _write_long(buf, int(v)), _read_long)
        if isinstance(dt, T.FloatType):
            return (
                lambda buf, v: buf.write(struct.pack("<f", float(v))),
                lambda src: struct.unpack("<f", _read_exact(src, 4))[0],
            )
        if isinstance(dt, T.DoubleType):
            return (
                lambda buf, v: buf.write(struct.pack("<d", float(v))),
                lambda src: struct.unpack("<d", _read_exact(src, 8))[0],
            )
        if isinstance(dt, T.StringType):
            return (
                lambda buf, v: _write_bytes(buf, str(v).encode("utf-8")),
                lambda src: _read_bytes(src).decode("utf-8"),
            )
        if isinstance(dt, T.BinaryType):
            return (
                lambda buf, v: _write_bytes(buf, bytes(v)),
                _read_bytes,
            )
        if isinstance(dt, T.DateType):
            return (
                lambda buf, v: _write_long(buf, (_to_date(v) - _EPOCH).days),
                lambda src: _date_from_days(_read_long(src)),
            )
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            from datetime import timedelta

            epoch = datetime(1970, 1, 1)
            # timestamp-millis files store milliseconds; everything we
            # write is micros, but externally-written millis files must
            # scale on decode (Avro spec, logical types).
            scale = 1000 if self.ts_millis else 1
            return (
                lambda buf, v: _write_long(buf, _to_micros(v) // scale),
                # timedelta math, not fromtimestamp(float): float seconds
                # round off sub-microsecond bits at 2026-era epochs.
                lambda src: _ts_from_micros(
                    epoch, timedelta, _read_long(src) * scale
                ),
            )
        if isinstance(dt, T.ArrayType):
            inner = _FieldCodec(dt.elementType, dt.containsNull)

            def enc(buf, v):
                seq = list(v)
                if seq:
                    _write_long(buf, len(seq))
                    for x in seq:
                        inner.encode(buf, x)
                _write_long(buf, 0)

            def dec(src):
                out = []
                while True:
                    n = _read_long(src)
                    if n == 0:
                        return out
                    if n < 0:  # block with byte-size prefix (spec)
                        _read_long(src)
                        n = -n
                    for _ in range(n):
                        out.append(inner.decode(src))

            return enc, dec
        raise TypeError(f"avro_py: unsupported type {dt.simpleString()}")

    def encode(self, buf: io.BytesIO, v: object) -> None:
        if self.nullable:
            if _is_null(v):
                _write_long(buf, 0)  # union branch 0 = null
                return
            _write_long(buf, 1)
        self.enc(buf, v)

    def decode(self, src) -> object:
        if self.nullable:
            if _read_long(src) == 0:
                return None
        return self.dec(src)


def _is_null(v: object) -> bool:
    if v is None:
        return True
    try:
        return bool(v != v)  # NaN / NaT (pandas nulls)
    except ValueError:  # numpy arrays: ambiguous truth — not null
        return False


def _to_micros(v) -> int:
    if hasattr(v, "value"):  # pandas.Timestamp: integer nanoseconds
        return int(v.value) // 1000
    from datetime import timedelta

    return (v.replace(tzinfo=None) - datetime(1970, 1, 1)) // timedelta(
        microseconds=1
    )


def _to_date(v) -> date:
    if isinstance(v, datetime):
        return v.date()
    if isinstance(v, date):
        return v
    return v.date()  # pandas.Timestamp


# ---------------------------------------------------------------------------
# Container files
# ---------------------------------------------------------------------------


def write_container(
    out: io.BufferedIOBase,
    spark_schema: T.StructType,
    row_batches: Iterator[list[tuple]],
    codec: str = "null",
) -> int:
    """Write one Avro Object Container File; one block per batch.
    Returns row count. ``codec``: "null" (uncompressed), "deflate"
    (per-block raw RFC-1951 streams, the Avro 1.11 spec's required
    optional codec — what most real OCF files ship with), or "snappy"
    (spec optional codec: raw-snappy block + 4-byte big-endian CRC32
    of the UNCOMPRESSED data; codec from sources/snappy_py)."""
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"avro_py: unsupported write codec {codec!r}")
    avro_schema = spark_to_avro_schema(spark_schema)
    codecs = [_FieldCodec(f.dataType, f.nullable) for f in spark_schema.fields]
    out.write(MAGIC)
    meta = io.BytesIO()
    _write_long(meta, 2)
    _write_bytes(meta, b"avro.schema")
    _write_bytes(meta, json.dumps(avro_schema).encode())
    _write_bytes(meta, b"avro.codec")
    _write_bytes(meta, codec.encode())
    _write_long(meta, 0)
    out.write(meta.getvalue())
    out.write(SYNC)
    total = 0
    for rows in row_batches:
        if not rows:
            continue
        block = io.BytesIO()
        for row in rows:
            for fc, v in zip(codecs, row):
                fc.encode(block, v)
        data = block.getvalue()
        if codec == "deflate":
            import zlib

            # raw DEFLATE, no zlib wrapper (Avro spec: RFC 1951)
            co = zlib.compressobj(wbits=-15)
            data = co.compress(data) + co.flush()
        elif codec == "snappy":
            import struct as _struct
            import zlib

            from . import snappy_py

            data = snappy_py.compress(data) + _struct.pack(
                ">I", zlib.crc32(data) & 0xFFFFFFFF
            )
        head = io.BytesIO()
        _write_long(head, len(rows))
        _write_long(head, len(data))
        out.write(head.getvalue())
        out.write(data)
        out.write(SYNC)
        total += len(rows)
    return total


def read_header(
    src: io.BufferedIOBase,
) -> tuple[dict, bytes, str]:
    """Parse magic + metadata; returns (avro schema dict, sync
    marker, codec name — "null" or "deflate")."""
    if src.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(src)
        if n == 0:
            break
        if n < 0:
            _read_long(src)  # block byte size (spec'd but unusual here)
            n = -n
        for _ in range(n):
            k = _read_bytes(src).decode()
            meta[k] = _read_bytes(src)
    if meta.get("avro.codec", b"null") not in (
        b"null", b"", b"deflate", b"snappy",
    ):
        raise ValueError(
            f"avro_py: unsupported codec {meta['avro.codec']!r} — "
            "null, deflate and snappy are supported (zstandard needs "
            "an external lib; transcode or use the spark-avro jar)"
        )
    codec = (meta.get("avro.codec") or b"null").decode() or "null"
    if "avro.schema" not in meta:
        raise ValueError(
            "avro_py: header carries no avro.schema entry (corrupt file)"
        )
    sync = src.read(16)
    if len(sync) != 16:
        raise ValueError("avro_py: truncated header sync marker")
    try:
        schema = json.loads(meta["avro.schema"])
    except RecursionError:
        # json.loads raises RecursionError (not JSONDecodeError) on
        # pathologically deep nesting — an internal error class the
        # corrupt-input contract forbids leaking from a file reader
        raise ValueError(
            "avro_py: avro.schema JSON nests beyond the parser limit "
            "(corrupt or hostile header)"
        ) from None
    return schema, sync, codec


def _field_ts_millis(avro_type: object) -> bool:
    """True when an Avro field type (possibly union-wrapped) carries the
    timestamp-millis logical type — its long payload is milliseconds."""
    t = avro_type
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        t = branches[0] if len(branches) == 1 else None
    return isinstance(t, dict) and t.get("logicalType") == "timestamp-millis"


def read_container(src: io.BufferedIOBase) -> tuple[T.StructType, list[tuple]]:
    avro_schema, sync, blk_codec = read_header(src)
    try:
        spark_schema = avro_to_spark_schema(avro_schema)
        codecs = [
            _FieldCodec(
                f.dataType, f.nullable, ts_millis=_field_ts_millis(af["type"])
            )
            for f, af in zip(spark_schema.fields, avro_schema["fields"])
        ]
    except (TypeError, KeyError, AttributeError, IndexError) as exc:
        # a mutated/garbage schema JSON surfaces here as whatever the
        # converter tripped on — uniform corrupt-or-unsupported error
        raise ValueError(
            f"avro_py: unsupported or corrupt schema: {exc}"
        ) from exc
    rows: list[tuple] = []
    buf = io.BytesIO(src.read())  # container files are partition-sized
    while True:
        pos = buf.tell()
        if not buf.read(1):
            break
        buf.seek(pos)
        n = _read_long(buf)
        size = _read_long(buf)
        if n < 0 or size < 0:
            # same hazard class as _read_bytes: a corrupt negative size
            # would make buf.read(size) read-to-EOF and fail later with
            # zlib.error/struct.error instead of this module's ValueError
            raise ValueError(
                f"avro_py: corrupt block header (count {n}, size {size})"
            )
        end = buf.tell() + size
        if blk_codec == "deflate":
            import zlib

            try:
                raw_body = zlib.decompress(buf.read(size), -15)
            except zlib.error as exc:  # uniform corrupt-input error
                raise ValueError(
                    f"avro_py: corrupt deflate block: {exc}"
                ) from exc
            body = io.BytesIO(raw_body)
            for _ in range(n):
                rows.append(tuple(c.decode(body) for c in codecs))
            if body.read(1):
                raise ValueError(
                    "avro_py: deflate block has trailing bytes (corrupt)"
                )
        elif blk_codec == "snappy":
            import struct as _struct
            import zlib

            from . import snappy_py

            comp = buf.read(size)
            if len(comp) < 5:
                raise ValueError(
                    "avro_py: snappy block shorter than its CRC32 suffix"
                )
            # Avro spec: trailing 4-byte BE CRC32 of the UNCOMPRESSED data
            raw = snappy_py.uncompress(comp[:-4])
            (want_crc,) = _struct.unpack(">I", comp[-4:])
            if zlib.crc32(raw) & 0xFFFFFFFF != want_crc:
                raise ValueError(
                    "avro_py: snappy block CRC mismatch (corrupt)"
                )
            body = io.BytesIO(raw)
            for _ in range(n):
                rows.append(tuple(c.decode(body) for c in codecs))
            if body.read(1):
                raise ValueError(
                    "avro_py: snappy block has trailing bytes (corrupt)"
                )
        else:
            for _ in range(n):
                rows.append(tuple(c.decode(buf) for c in codecs))
        if buf.tell() != end:
            raise ValueError("avro_py: block size mismatch (corrupt block)")
        if buf.read(16) != sync:
            raise ValueError("avro_py: sync marker mismatch (corrupt block)")
    return spark_schema, rows


# ---------------------------------------------------------------------------
# Distributed DataFrame API
# ---------------------------------------------------------------------------


def native_avro_available(spark: SparkSession) -> bool:
    """True when the external spark-avro datasource jar is on the
    classpath (real clusters; absent in this container)."""
    try:
        spark.read.format("avro").schema("x int").load(
            "/nonexistent__avro_probe"
        ).schema
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        return "Failed to find" not in msg and "FAILED_TO_LOAD" not in msg


def write_avro(df: DataFrame, path: str, codec: str = "null") -> int:
    """Distributed Avro write: one container file per partition,
    written inside the executors via ``mapInArrow`` (the report — not
    the data — is what reaches the driver). Arrow batches, not pandas:
    the Arrow->pandas bridge turns a nullable int64 column into
    float64, silently corrupting longs above 2^53; ``to_pylist`` on
    the RecordBatch keeps exact ints with None for nulls.
    Delegates to native spark-avro when present. Returns row count.
    ``codec``: "null", "deflate" (per-block raw RFC-1951) or
    "snappy" (raw snappy + CRC32 suffix)."""
    spark = df.sparkSession
    if native_avro_available(spark):
        native_comp = {
            "deflate": "deflate", "snappy": "snappy"
        }.get(codec, "uncompressed")
        (
            df.write.mode("overwrite")
            .format("avro")
            .option("compression", native_comp)
            .save(path)
        )
        return -1  # native path reports via its own committer
    os.makedirs(path, exist_ok=True)
    # sweep committed parts AND orphaned per-attempt tmp files — a
    # losing speculative/retried attempt leaves a uniquely named
    # .inprogress behind that the attempt itself never removes
    for old in glob.glob(os.path.join(path, "part-*.avro")) + glob.glob(
        os.path.join(path, "part-*.inprogress")
    ):
        os.remove(old)
    schema = df.schema

    def write_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")

        def rows():
            for batch in batches:
                cols = [
                    batch.column(i).to_pylist()
                    for i in range(batch.num_columns)
                ]
                yield list(zip(*cols))

        # task-attempt atomicity: PER-ATTEMPT tmp + atomic rename so
        # a retried or speculative attempt never exposes a torn
        # container file NOR keeps writing (via its still-open fd)
        # into the inode the winning attempt already published —
        # a shared tmp path had exactly that corruption window
        tmp = f"{fname}.{ctx.taskAttemptId()}.inprogress"
        with open(tmp, "wb") as fh:
            n = write_container(fh, schema, rows(), codec=codec)
        if n == 0:
            os.remove(tmp)  # empty partition — no file
        else:
            os.replace(tmp, fname)
        yield pa.RecordBatch.from_pydict({"path": [fname], "n_rows": [n]})

    report = df.mapInArrow(write_partition, "path string, n_rows long")
    return sum(r.n_rows for r in report.collect())


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: parallelize the file list, decode each
    container file inside the task it lands on. Delegates to native
    spark-avro when present."""
    if native_avro_available(spark):
        return spark.read.format("avro").load(path)
    files = sorted(glob.glob(os.path.join(path, "*.avro"))) or sorted(
        glob.glob(path)
    )
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        avro_schema, _, _ = read_header(fh)
    spark_schema = avro_to_spark_schema(avro_schema)
    par = min(len(files), spark.sparkContext.defaultParallelism)
    files_df = spark.createDataFrame(
        [(f,) for f in files], "avro_file_path string"
    ).repartition(par)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for fname in pdf["avro_file_path"]:
                with open(fname, "rb") as fh:
                    _, rows = read_container(fh)
                yield pd.DataFrame(
                    list(rows), columns=[f.name for f in spark_schema.fields]
                )

    return files_df.mapInPandas(decode, spark_schema)
