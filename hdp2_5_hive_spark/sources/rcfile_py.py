"""RCFile source/sink — the last §2.2 format a legacy HDP 2.5
warehouse can present (reference ``ql/src/java/org/apache/hadoop/
hive/ql/io/RCFile.java``; layout published in He et al., ICDE 2011,
"RCFile: A Fast and Space-efficient Data Placement Structure").

Spark has no native RCFile reader and the format is long obsolete
(Hive itself recommends ORC/parquet), so the engine carries a
minimal from-scratch codec for MIGRATION reads plus a writer so the
round-trip is testable end-to-end. Scope: the modern ``RCF\\x01``
header, UNCOMPRESSED and COMPRESSED row groups — the full
Hadoop-BUNDLED codec matrix: DefaultCodec / GzipCodec / BZip2Codec
(zlib/gzip/bz2 are stdlib) plus SnappyCodec and Lz4Codec via the
repo's own pure-Python raw codecs + BlockCompressorStream framing
(sources/snappy_py, sources/lz4_py — both interop-pinned against the
reference implementations via pyarrow). Cells are text-serialized as
ColumnarSerDe does over LazySimpleSerDe strings (NULL = ``\\N``).
LZO (GPL, never Hadoop-bundled) raises a clear transcode error.

Compressed layout (RCFile.java flushRecords/writeKey, :1137-1253):
the header gains the codec class name as a Hadoop Text after the
compressed flag; per row group the key buffer is compressed as ONE
codec stream (ints on disk: record length, UNCOMPRESSED key length,
compressed key length, then the compressed key bytes), and each
COLUMN's value bytes are an INDEPENDENT codec stream
(``deflateFilter.resetState()`` per column) whose compressed size is
the colLen recorded in the key and whose uncompressed size is the
plainLen beside it — so a projection can still skip whole columns by
seeking colLen bytes without decompressing them. Sync escapes stay
uncompressed, so byte-range splits resynchronize identically.

Layout written/parsed (RCFile.java:505-640 writer, :1060-1270 reader):

- header: magic ``RCF`` + version byte 1; compressed flag byte;
  metadata (4-byte count, then Hadoop-Text key/value pairs — carries
  ``hive.io.rcfile.column.number``); 16-byte sync marker.
- per row group (one "record"): optional sync escape (int -1 + the
  16-byte sync), record length (int), key length (int), compressed
  key length (int), then the KEY BUFFER: row count (vlong) and per
  column [column value bytes length, uncompressed dito, length of
  the cell-length run buffer, the run buffer itself] — cell lengths
  run-length encoded exactly as ``RCFile.ColumnBuffer``: a
  non-negative vlong is a new length, a following negative vlong m
  repeats it ~m more times. The VALUE BUFFER concatenates each
  column's cell bytes back-to-back — the columnar layout that lets a
  projection skip whole column runs per group.
- ints are 4-byte big-endian; vlong/Text use Hadoop WritableUtils
  encoding (single byte for [-112, 127], else a sign+size prefix).

Distributed plumbing mirrors sources/avro_py: writes emit one file
per partition inside executors via ``mapInArrow`` (only the report
reaches the driver); reads parallelize the file list and decode per
task; schema is carried as Hive type strings in file metadata
(``columns``/``columns.types``, the same keys ColumnarSerDe stores).
"""

from __future__ import annotations

import glob
import io
import os
import struct
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"RCF"
VERSION = 1


def make_sync(seed: str) -> bytes:
    """Per-file sync marker derived from sha256 (deterministic, no
    RNG). Hadoop uses a random UUID per file so that scanning for
    the marker inside arbitrary DATA bytes is collision-safe; a
    fixed ASCII-range marker could legitimately appear inside text
    cells and derail split scanning. The reader always takes the
    sync from the header, so any value works per file."""
    import hashlib

    return hashlib.sha256(f"rcfile-sync:{seed}".encode()).digest()[:16]


SYNC = make_sync("default")  # single-stream writes without a seed
NULL_TEXT = b"\\N"
COLUMN_NUMBER_KEY = "hive.io.rcfile.column.number"
DEFAULT_GROUP_ROWS = 4096

# Hadoop codec class -> stdlib (de)compressors. Each column / key
# buffer is a COMPLETE independent stream of the codec (the writer
# calls resetState + finish per buffer), so whole-buffer
# compress/decompress is exact — no streaming state carries across
# buffers.
CODEC_DEFAULT = "org.apache.hadoop.io.compress.DefaultCodec"
CODEC_GZIP = "org.apache.hadoop.io.compress.GzipCodec"
CODEC_BZIP2 = "org.apache.hadoop.io.compress.BZip2Codec"
CODEC_SNAPPY = "org.apache.hadoop.io.compress.SnappyCodec"
CODEC_LZ4 = "org.apache.hadoop.io.compress.Lz4Codec"


def _codec_funcs(codec_class: str):
    """(compress, decompress) for a Hadoop codec class name."""
    import bz2
    import gzip
    import zlib

    short = codec_class.rsplit(".", 1)[-1].lower()
    if codec_class in (CODEC_DEFAULT,) or short in ("defaultcodec", "deflate"):
        return zlib.compress, zlib.decompress
    if codec_class in (CODEC_GZIP,) or short in ("gzipcodec", "gzip"):
        # mtime=0: gzip's header embeds a timestamp by default, which
        # would make otherwise-identical writes byte-different —
        # deterministic output is part of the repo's write contract
        return (lambda b: gzip.compress(b, mtime=0)), gzip.decompress
    if codec_class in (CODEC_BZIP2,) or short in ("bzip2codec", "bzip2"):
        return bz2.compress, bz2.decompress
    if codec_class in (CODEC_SNAPPY,) or short in ("snappycodec", "snappy"):
        # SnappyCodec has no stream format of its own — Hadoop wraps
        # the raw codec in BlockCompressorStream framing, which is
        # what each independent column/key buffer holds (the common
        # HDP default; pure-Python implementation validated against
        # google snappy via pyarrow)
        from . import snappy_py

        return snappy_py.block_compress, snappy_py.block_uncompress
    if codec_class in (CODEC_LZ4,) or short in ("lz4codec", "lz4"):
        # same BlockCompressorStream framing as snappy around the raw
        # LZ4 block format (pure-Python, validated against the
        # reference lz4 library via pyarrow)
        from . import lz4_py

        return lz4_py.block_compress, lz4_py.block_uncompress
    raise NotImplementedError(
        f"RCFile compression codec {codec_class!r} has no "
        "decompressor here (LZO is the remaining gap) — transcode "
        "with Hive to DefaultCodec/gzip/snappy/lz4, or migrate to "
        "parquet "
        "(queries/formats.py CONCATENATE)"
    )


# ---------------------------------------------------------------------------
# Hadoop writable primitives (WritableUtils.writeVLong / Text)
# ---------------------------------------------------------------------------


def write_vlong(buf: io.BytesIO, i: int) -> None:
    if -112 <= i <= 127:
        buf.write(struct.pack("b", i))
        return
    length = -112
    if i < 0:
        i = ~i
        length = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        length -= 1
    buf.write(struct.pack("b", length))
    length = -(length + 120) if length < -120 else -(length + 112)
    for idx in range(length - 1, -1, -1):
        buf.write(bytes([(i >> (8 * idx)) & 0xFF]))


def read_vlong(src) -> int:
    head = src.read(1)
    if not head:
        raise ValueError("rcfile: truncated stream (vlong prefix)")
    first = struct.unpack("b", head)[0]
    if first >= -112:
        return first
    neg = first < -120
    # Hadoop decodeVIntSize returns TOTAL size incl. the prefix byte
    length = ((-119 - first) if neg else (-111 - first)) - 1
    body = src.read(length)
    if len(body) != length:
        raise ValueError("rcfile: truncated stream (vlong body)")
    i = 0
    for b in body:
        i = (i << 8) | b
    return ~i if neg else i


def _write_text(buf: io.BytesIO, s: str) -> None:
    b = s.encode("utf-8")
    write_vlong(buf, len(b))
    buf.write(b)


def _read_text(src) -> str:
    n = read_vlong(src)
    return src.read(n).decode("utf-8")


# ---------------------------------------------------------------------------
# Schema <-> Hive type strings (the metadata ColumnarSerDe stores)
# ---------------------------------------------------------------------------

_TO_HIVE = {
    T.LongType: "bigint",
    T.IntegerType: "int",
    T.ShortType: "smallint",
    T.ByteType: "tinyint",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.StringType: "string",
    T.DateType: "date",
    T.TimestampType: "timestamp",
}

_FROM_HIVE = {v: k() for k, v in _TO_HIVE.items()}


def _hive_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    try:
        return _TO_HIVE[type(dt)]
    except KeyError:
        raise NotImplementedError(
            f"RCFile codec supports primitive columns only, got {dt}"
        ) from None


def _spark_type(h: str) -> T.DataType:
    if h.startswith("decimal("):
        p, s = h[8:-1].split(",")
        return T.DecimalType(int(p), int(s))
    return _FROM_HIVE[h]


def _cell_bytes(v: object) -> bytes:
    """LazySimpleSerDe text form of one cell (NULL → \\N)."""
    if v is None:
        return NULL_TEXT
    if v is True:
        return b"true"
    if v is False:
        return b"false"
    if isinstance(v, float):
        return repr(v).encode()
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f").encode()
    if isinstance(v, (date, Decimal)):
        return str(v).encode()
    return str(v).encode()


# ---------------------------------------------------------------------------
# single-file writer / reader
# ---------------------------------------------------------------------------


def _write_lengths_rle(lens: list[int]) -> bytes:
    """RCFile.ColumnBuffer cell-length encoding: value, then ~extra
    for a run of equal lengths."""
    buf = io.BytesIO()
    prev, run = None, 0
    for ln in lens:
        if ln == prev:
            run += 1
            continue
        if prev is not None:
            write_vlong(buf, prev)
            if run > 0:
                write_vlong(buf, ~run)
        prev, run = ln, 0
    if prev is not None:
        write_vlong(buf, prev)
        if run > 0:
            write_vlong(buf, ~run)
    return buf.getvalue()


def _read_lengths_rle(raw: bytes, n_rows: int) -> list[int]:
    src = io.BytesIO(raw)
    out: list[int] = []
    while len(out) < n_rows:
        v = read_vlong(src)
        if v < 0:
            # corrupt-input hardening (round-12 fuzz): a LEADING
            # repeat marker indexed out[-1] of an empty list
            # (IndexError), and an oversized run made the length
            # list LONGER than the row count — the group assembler
            # then indexed past group_rows (IndexError). Writer
            # output can do neither; both mean corruption.
            if not out:
                raise ValueError(
                    "corrupt RLE length buffer: leading repeat marker"
                )
            out.extend([out[-1]] * (~v))
        else:
            out.append(v)
    if len(out) != n_rows:
        raise ValueError(
            f"corrupt RLE length buffer: run overshoots row count "
            f"({len(out)} > {n_rows})"
        )
    return out


# Hive RCFile.java: SYNC_INTERVAL = 100 * (4 + SYNC_HASH_SIZE) bytes
SYNC_INTERVAL_DEFAULT = 100 * (4 + 16)


def write_rcfile_stream(
    fh,
    names: list[str],
    types: list[str],
    row_iter,
    group_rows: int,
    sync: bytes = SYNC,
    codec: str | None = None,
    sync_interval_bytes: int = SYNC_INTERVAL_DEFAULT,
) -> int:
    """Write one RCFile to a binary stream; returns rows written.
    ``codec`` = Hadoop codec class name (or short form "gzip" /
    "deflate" / "bzip2" / "snappy" / "lz4") for a compressed file,
    None = uncompressed. ``sync_interval_bytes`` defaults to Hive's
    ~2 KB (RCFile.java SYNC_INTERVAL = 100·(4+16) bytes), emitting a
    sync escape only after that many bytes since the last one — so
    the default on-disk layout has groups WITHOUT their own escape,
    the case the split reader must tolerate (the r11 split bug hid
    behind an every-group default). 0 emits a sync before EVERY
    group (maximally splittable, and the densest split-boundary
    exercise for tests)."""
    if codec is not None:
        codec = {
            "gzip": CODEC_GZIP,
            "deflate": CODEC_DEFAULT,
            "default": CODEC_DEFAULT,
            "bzip2": CODEC_BZIP2,
            "snappy": CODEC_SNAPPY,
            "lz4": CODEC_LZ4,
        }.get(codec.lower(), codec)
        compress, _ = _codec_funcs(codec)
    fh.write(MAGIC + bytes([VERSION]))
    if codec is None:
        fh.write(b"\x00")  # uncompressed
    else:
        fh.write(b"\x01")
        _write_text(fh, codec)
    meta = [
        (COLUMN_NUMBER_KEY, str(len(names))),
        ("columns", ",".join(names)),
        ("columns.types", ":".join(types)),  # colon-sep, as Hive serde props
    ]
    fh.write(struct.pack(">i", len(meta)))
    mb = io.BytesIO()
    for k, v in meta:
        _write_text(mb, k)
        _write_text(mb, v)
    fh.write(mb.getvalue())
    fh.write(sync)

    total = 0
    group: list[tuple] = []

    def flush() -> None:
        nonlocal total
        if not group:
            return
        cols = list(zip(*group))
        col_bytes = [[_cell_bytes(v) for v in col] for col in cols]
        key = io.BytesIO()
        write_vlong(key, len(group))
        values = b""
        for cb in col_bytes:
            data = b"".join(cb)
            lens = _write_lengths_rle([len(c) for c in cb])
            stored = data if codec is None else compress(data)
            write_vlong(key, len(stored))  # on-disk (compressed) size
            write_vlong(key, len(data))  # plain (uncompressed) size
            write_vlong(key, len(lens))
            key.write(lens)
            values += stored
        kb = key.getvalue()
        nonlocal since_sync
        if sync_interval_bytes <= 0 or since_sync >= sync_interval_bytes:
            fh.write(struct.pack(">i", -1))  # sync escape
            fh.write(sync)
            since_sync = 0
        if codec is None:
            fh.write(
                struct.pack(">iii", len(kb) + len(values), len(kb), len(kb))
            )
            fh.write(kb)
        else:
            # record length counts the COMPRESSED key + value bytes;
            # the middle int stays the UNCOMPRESSED key length
            ckb = compress(kb)
            fh.write(
                struct.pack(
                    ">iii", len(kb) + len(values), len(kb), len(ckb)
                )
            )
            fh.write(ckb)
        fh.write(values)
        since_sync += 12 + len(kb) + len(values)
        total += len(group)
        group.clear()

    since_sync = 0
    for row in row_iter:
        group.append(row)
        if len(group) >= group_rows:
            flush()
    flush()
    return total


def read_rcfile_header(
    fh,
    schema: tuple[list[str], list[str]] | None = None,
) -> tuple[list[str], list[str], bytes, str | None]:
    """Parse the RCF header; returns (names, hive types, sync,
    codec class name or None). A compressed file's codec class
    follows the flag byte as a Hadoop Text (RCFile.java header
    grammar ``file-compression-codec-class``); an unsupported codec
    raises from _codec_funcs with migration guidance. ``schema`` =
    (names, hive_types) fallback for genuinely Hive-written files,
    whose metadata carries only the column-number key."""
    if fh.read(3) != MAGIC or fh.read(1) != bytes([VERSION]):
        raise ValueError("not an RCF version-1 file")
    flag = fh.read(1)
    codec: str | None = None
    if flag == b"\x01":
        codec = _read_text(fh)
        _codec_funcs(codec)  # validate up front, loud + actionable
    elif flag != b"\x00":
        raise ValueError(f"bad compression flag byte {flag!r}")
    n_meta = struct.unpack(">i", fh.read(4))[0]
    meta = {}
    for _ in range(n_meta):
        k = _read_text(fh)
        meta[k] = _read_text(fh)
    sync = fh.read(16)
    if "columns" in meta and "columns.types" in meta:
        names = meta["columns"].split(",")
        types = meta["columns.types"].split(":")
    elif schema is not None:
        # genuinely Hive-written files carry ONLY the column-number
        # key in file metadata (columns/columns.types are metastore
        # SerDe table properties RCFileOutputFormat never embeds) —
        # the caller supplies the schema for those
        names, types = list(schema[0]), list(schema[1])
    else:
        raise ValueError(
            "rcfile_py: file metadata has no columns/columns.types "
            "(a Hive-written RCFile keeps the schema in the "
            "metastore, not the file) — pass schema=(names, "
            "hive_types) to read_rcfile/read_rcfile_header"
        )
    if COLUMN_NUMBER_KEY in meta and int(meta[COLUMN_NUMBER_KEY]) != len(
        names
    ):
        raise ValueError("column count metadata mismatch")
    return names, types, sync, codec


def _read_group(
    fh,
    sync: bytes,
    names: list[str],
    codec: str | None = None,
    stop_at: int | None = None,
):
    """Read one row group at the current position (which must be at
    a sync escape or EOF). Returns rows (list of cell-bytes lists)
    or None at EOF. With ``stop_at``, a sync escape found at offset
    >= stop_at ends the read (rewound, so the next split's scan can
    find it) — Hadoop split semantics: a reader owns every group
    from its first sync up to the first sync at-or-after its end,
    NOT up to the raw byte boundary (real Hive emits a sync only
    every ~2 KB, so groups between ``end`` and the next sync belong
    to THIS split; stopping at tell() >= end silently lost them).
    For a compressed file the key buffer and each
    column's value bytes are independent codec streams: the key's
    on-disk size is the third header int, each column's is the first
    vlong of its key entry, and the plain sizes beside them are the
    decompression contracts (checked loudly)."""
    decompress = None if codec is None else _codec_funcs(codec)[1]
    while True:
        cur = fh.tell()
        head = fh.read(4)
        if len(head) < 4:
            return None
        rec_len = struct.unpack(">i", head)[0]
        if rec_len == -1:  # sync escape
            if stop_at is not None and cur >= stop_at:
                fh.seek(cur)  # the next split's territory starts here
                return None
            if fh.read(16) != sync:
                raise ValueError("sync marker mismatch — corrupt file")
            continue
        hdr = fh.read(8)
        if len(hdr) < 8:
            raise ValueError("truncated record header — corrupt file")
        key_len, ckey_len = struct.unpack(">ii", hdr)
        if key_len < 0 or ckey_len < 0:
            # file.read(negative) silently reads to EOF — a corrupt
            # negative length would swallow the rest of the file as
            # the key buffer instead of failing loudly
            raise ValueError("negative key length — corrupt file")
        if decompress is None:
            key = io.BytesIO(fh.read(key_len))
        else:
            kb = decompress(fh.read(ckey_len))
            if len(kb) != key_len:
                raise ValueError(
                    f"key buffer decompressed to {len(kb)} bytes, "
                    f"header says {key_len} — corrupt file"
                )
            key = io.BytesIO(kb)
        n_rows = read_vlong(key)
        if n_rows < 0:
            raise ValueError("negative row count — corrupt file")
        col_lens: list[list[int]] = []
        col_sizes: list[int] = []
        col_plain: list[int] = []
        for _ in range(len(names)):
            size = read_vlong(key)  # on-disk (compressed) bytes
            plain = read_vlong(key)  # uncompressed bytes
            len_buf_len = read_vlong(key)
            if size < 0 or plain < 0 or len_buf_len < 0:
                raise ValueError("negative column size — corrupt file")
            col_lens.append(_read_lengths_rle(key.read(len_buf_len), n_rows))
            col_sizes.append(size)
            col_plain.append(plain)
        group_rows: list[list[bytes]] = [
            [b""] * len(names) for _ in range(n_rows)
        ]
        for ci, (sizes, size, plain) in enumerate(
            zip(col_lens, col_sizes, col_plain)
        ):
            data = fh.read(size)
            if decompress is not None:
                data = decompress(data)
                if len(data) != plain:
                    raise ValueError(
                        f"column {names[ci]}: decompressed to "
                        f"{len(data)} bytes, key says {plain}"
                    )
            off = 0
            for ri, ln in enumerate(sizes):
                group_rows[ri][ci] = data[off : off + ln]
                off += ln
            if off != len(data):
                raise ValueError(f"column {names[ci]}: byte count mismatch")
        return group_rows


def read_rcfile_stream(fh) -> tuple[list[str], list[str], list[list[bytes]]]:
    """Read one RCFile: (column names, hive types, rows of raw cell
    bytes)."""
    names, types, sync, codec = read_rcfile_header(fh)
    rows: list[list[bytes]] = []
    while True:
        g = _read_group(fh, sync, names, codec)
        if g is None:
            break
        rows.extend(g)
    return names, types, rows


def _build_splits(
    files: list[str], split_bytes: int | None
) -> list[tuple[str, int, int]]:
    """Byte-range task list shared by the function API and the
    DataSource (one policy, one place): per file by default, or
    split_bytes-sized ranges re-synced at sync markers."""
    out: list[tuple[str, int, int]] = []
    for f in files:
        size = os.path.getsize(f)
        if split_bytes is None or size <= split_bytes:
            out.append((f, 0, size))
        else:
            for off in range(0, size, split_bytes):
                out.append((f, off, min(off + split_bytes, size)))
    return out


def _write_part_file(
    path: str,
    pid: int,
    names: list[str],
    types: list[str],
    rows_iter,
    group_rows: int,
    codec: str | None,
) -> tuple[str, int]:
    """Shared per-partition write tail (function API + DataSource):
    task-attempt atomicity via PER-ATTEMPT tmp-name + os.replace (a
    retried or speculative attempt can never leave a torn part file
    visible; both attempts produce identical bytes, last completed
    wins), per-part sync seed, empty parts removed.

    The tmp name includes the attempt id: with a SHARED tmp path the
    losing attempt's still-open fd pointed at the inode the winner
    had just published via os.replace, and its remaining writes
    corrupted the visible file."""
    fname = os.path.join(path, f"part-{pid:05d}.rc")
    from pyspark import TaskContext

    ctx = TaskContext.get()
    tag = str(ctx.taskAttemptId()) if ctx is not None else f"pid{os.getpid()}"
    tmp = f"{fname}.{tag}.inprogress"
    with open(tmp, "wb") as fh:
        n = write_rcfile_stream(
            fh, names, types, rows_iter, group_rows,
            sync=make_sync(f"part-{pid}"), codec=codec,
        )
    if n == 0:
        os.remove(tmp)
    else:
        os.replace(tmp, fname)
    return fname, n


def _split_group_iter(
    fh,
    start: int,
    end: int,
    schema: tuple[list[str], list[str]] | None = None,
):
    """(names, types, generator of row groups) for one split —
    the STREAMING form of read_rcfile_split: consumers decode group
    by group, so peak memory is one row group, not the whole split
    (a no-split read of a multi-GB file must not hold every
    decompressed row in a Python list at once)."""
    names, types, sync, codec = read_rcfile_header(fh, schema)
    header_end = fh.tell()
    marker = struct.pack(">i", -1) + sync
    if start <= header_end:
        pos = header_end
    else:
        pos = None
        fh.seek(start)
        window = b""
        base = start
        while pos is None:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            window += chunk
            hit = window.find(marker)
            if hit >= 0:
                pos = base + hit
            else:
                consumed = max(0, len(window) - (len(marker) - 1))
                base += consumed
                window = window[consumed:]
        if pos is None or pos >= end:
            return names, types, iter(())

    def gen():
        fh.seek(pos)
        while True:
            g = _read_group(fh, sync, names, codec, stop_at=end)
            if g is None:
                return
            yield g

    return names, types, gen()


def read_rcfile_split(
    fh,
    start: int,
    end: int,
    schema: tuple[list[str], list[str]] | None = None,
) -> tuple[list[str], list[str], list[list[bytes]]]:
    """Read the row groups of one byte-range SPLIT of an RCFile —
    Hadoop split semantics: a reader owns every group from the first
    sync escape at-or-after ``start`` (or the header, for the first
    split) up to the FIRST SYNC AT-OR-AFTER ``end`` — not up to the
    raw byte boundary. Real Hive emits a sync only every ~2 KB, so
    groups between ``end`` and the next sync have no escape of their
    own and belong to this split; a tell() < end loop silently lost
    them while the next split's forward scan skipped them. Enables
    many tasks per giant file instead of one. Works identically on
    compressed files — sync escapes are never compressed."""
    names, types, groups = _split_group_iter(fh, start, end, schema)
    rows: list[list[bytes]] = []
    for g in groups:
        rows.extend(g)
    return names, types, rows


# ---------------------------------------------------------------------------
# distributed write / read
# ---------------------------------------------------------------------------


def write_rcfile(
    df: DataFrame,
    path: str,
    group_rows: int = DEFAULT_GROUP_ROWS,
    codec: str | None = None,
) -> int:
    """One RCFile per partition, written inside executors; only the
    (path, row-count) report reaches the driver. ``codec``: None =
    uncompressed, or "deflate"/"gzip"/"bzip2" (or a Hadoop codec
    class name) for per-column compressed row groups."""
    names = [f.name for f in df.schema.fields]
    types = [_hive_type(f.dataType) for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)
    # also sweep orphaned per-attempt tmp files a losing speculative
    # or retried attempt left behind (unique .inprogress names are
    # never removed by the attempt itself)
    for old in glob.glob(os.path.join(path, "part-*.rc")) + glob.glob(
        os.path.join(path, "part-*.inprogress")
    ):
        os.remove(old)

    def write_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()

        def rows():
            for batch in batches:
                cols = [
                    batch.column(i).to_pylist()
                    for i in range(batch.num_columns)
                ]
                yield from zip(*cols)

        fname, n = _write_part_file(
            path, pid, names, types, rows(), group_rows, codec
        )
        yield pa.RecordBatch.from_pydict({"path": [fname], "n_rows": [n]})

    report = df.mapInArrow(write_partition, "path string, n_rows long")
    return sum(r.n_rows for r in report.collect())


def read_rcfile(
    spark: SparkSession,
    path: str,
    split_bytes: int | None = None,
    schema: tuple[list[str], list[str]] | None = None,
) -> DataFrame:
    """Parallelize the file list; decode + schema-on-read cast per
    task (ColumnarSerDe deserialization: text bytes → typed columns).

    Parallelism granularity: per FILE by default; pass
    ``split_bytes`` to additionally split each file into byte-range
    tasks at sync markers (read_rcfile_split — Hadoop's split
    semantics), so a warehouse of few giant RCFiles still fans out
    across the cluster. Every split re-reads only the small header
    plus its own byte range."""
    files = sorted(glob.glob(os.path.join(path, "*.rc"))) or sorted(
        glob.glob(path)
    )
    if not files:
        raise FileNotFoundError(f"no .rc files under {path}")
    with open(files[0], "rb") as fh:
        names, types, _, _ = read_rcfile_header(fh, schema)

    splits = _build_splits(files, split_bytes)
    par = min(len(splits), spark.sparkContext.defaultParallelism)
    files_df = spark.createDataFrame(
        splits, "rcfile_path string, split_start long, split_end long"
    ).repartition(par)
    text_schema = T.StructType(
        [T.StructField(n, T.StringType()) for n in names]
    )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for fname, start, end in zip(
                pdf["rcfile_path"], pdf["split_start"], pdf["split_end"]
            ):

                def to_pdf(buf):
                    return pd.DataFrame(
                        [
                            [
                                None if c == NULL_TEXT else c.decode("utf-8")
                                for c in row
                            ]
                            for row in buf
                        ],
                        columns=names,
                    )

                # stream group-by-group (bounded memory even for an
                # unsplit multi-GB file — same discipline as the
                # DataSource read path)
                with open(fname, "rb") as fh:
                    f_names, f_types, groups = _split_group_iter(
                        fh, int(start), int(end), schema
                    )
                    # every file must carry the directory's schema —
                    # a legacy warehouse with a reordered/widened
                    # stray file must fail loudly, not transpose
                    # columns silently
                    if f_names != names or f_types != types:
                        raise ValueError(
                            f"{fname}: schema "
                            f"{list(zip(f_names, f_types))} differs "
                            f"from {files[0]}'s "
                            f"{list(zip(names, types))}"
                        )
                    buf: list[list[bytes]] = []
                    for g in groups:
                        buf.extend(g)
                        if len(buf) >= 8192:
                            yield to_pdf(buf)
                            buf = []
                    if buf:
                        yield to_pdf(buf)

    raw = files_df.mapInPandas(decode, text_schema)
    return raw.select(
        *[
            F.col(n).cast(_spark_type(h)).alias(n)
            for n, h in zip(names, types)
        ]
    )


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: spark.read.format("rcfile_py")
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402 (Spark 4 API)
    DataSource,
    DataSourceReader,
    InputPartition,
)


class RCFileSplitPartition(InputPartition):
    """One byte-range split of one .rc file."""

    def __init__(self, path: str, start: int, end: int):
        self.path, self.start, self.end = path, start, end


def _cell_value(raw: bytes, hive_type: str):
    """ColumnarSerDe text cell → typed Python value (the same lazy
    primitive parse LazyBinaryColumnarSerDe's text mode performs)."""
    if raw == NULL_TEXT:
        return None
    s = raw.decode("utf-8")
    if hive_type in ("int", "smallint", "tinyint", "bigint"):
        return int(s)
    if hive_type in ("double", "float"):
        return float(s)
    if hive_type == "boolean":
        return s == "true"
    if hive_type == "string":
        return s
    if hive_type == "date":
        return date.fromisoformat(s)
    if hive_type == "timestamp":
        return datetime.strptime(
            s, "%Y-%m-%d %H:%M:%S.%f" if "." in s else "%Y-%m-%d %H:%M:%S"
        )
    if hive_type.startswith("decimal("):
        return Decimal(s)
    raise ValueError(f"rcfile_py datasource: unhandled type {hive_type}")


def _pa_cell_type(hive_type: str):
    """Arrow type matching _spark_type's Spark type for a Hive type —
    the RecordBatch schema must line up with the declared read schema
    exactly or the scan fails on type mismatch."""
    import pyarrow as pa

    if hive_type.startswith("decimal("):
        p, s = hive_type[8:-1].split(",")
        return pa.decimal128(int(p), int(s))
    return {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "boolean": pa.bool_(),
        "string": pa.string(),
        "date": pa.date32(),
        # Spark reads TimestampType as timestamp[us] via Arrow
        "timestamp": pa.timestamp("us"),
    }[hive_type]


class RCFilePyReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.split_bytes = (
            int(options["split_bytes"]) if "split_bytes" in options else None
        )
        if not self.path:
            raise ValueError("rcfile_py: .load(path) is required")

    def _files(self) -> list[str]:
        files = sorted(glob.glob(os.path.join(self.path, "*.rc"))) or sorted(
            glob.glob(self.path)
        )
        if not files:
            raise FileNotFoundError(f"no .rc files under {self.path}")
        return files

    def partitions(self):
        return [
            RCFileSplitPartition(f, s, e)
            for f, s, e in _build_splits(self._files(), self.split_bytes)
        ]

    def read(self, partition):
        # yield Arrow RecordBatches, not per-row tuples: the Python
        # DataSource API pickles each yielded row individually, which
        # measured ~6x slower than Arrow-batched transfer on the
        # sf0.1 sweep (the repo-wide rule: Python kernels are always
        # Arrow-batched, never row-at-a-time)
        import pyarrow as pa

        def flush(buf, names, types):
            arrays = [
                pa.array(
                    [_cell_value(row[ci], h) for row in buf],
                    type=_pa_cell_type(h),
                )
                for ci, h in enumerate(types)
            ]
            return pa.RecordBatch.from_arrays(arrays, names=names)

        # stream group-by-group: peak memory is one batch, never the
        # whole (possibly multi-GB, unsplit) decompressed file
        with open(partition.path, "rb") as fh:
            names, types, groups = _split_group_iter(
                fh, partition.start, partition.end
            )
            buf: list[list[bytes]] = []
            for g in groups:
                buf.extend(g)
                if len(buf) >= 8192:
                    yield flush(buf, names, types)
                    buf = []
            if buf:
                yield flush(buf, names, types)


class RCFilePyDataSource(DataSource):
    """``spark.read.format("rcfile_py").load(dir)`` — the from-scratch
    RCFile reader surfaced through Spark 4's Python DataSource API:
    schema inferred from the first file's header, one task per file
    (or per ``split_bytes`` byte range, resynchronized at sync
    markers), columnar-SerDe text cells parsed to typed values.
    Register once per session:
    ``spark.dataSource.register(RCFilePyDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "rcfile_py"

    def schema(self):
        files = sorted(
            glob.glob(os.path.join(self.options.get("path", ""), "*.rc"))
        ) or sorted(glob.glob(self.options.get("path", "")))
        if not files:
            raise FileNotFoundError(
                f"no .rc files under {self.options.get('path')}"
            )
        with open(files[0], "rb") as fh:
            names, types, _, _ = read_rcfile_header(fh)
        return T.StructType(
            [
                T.StructField(n, _spark_type(h))
                for n, h in zip(names, types)
            ]
        )

    def reader(self, schema):
        return RCFilePyReader(self.options)

    def writer(self, schema, overwrite: bool):
        return RCFilePyWriter(self.options, schema, overwrite)


from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class RCFileCommit(WriterCommitMessage):
    path: str
    n_rows: int


class RCFilePyWriter(DataSourceWriter):
    """``df.write.format("rcfile_py").save(dir)``: one .rc file per
    input partition, written inside the executor task (only the
    (path, row-count) commit message reaches the driver — the
    write_rcfile shape, behind the native writer API)."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rcfile_py: .save(path) is required")
        self.names = [f.name for f in schema.fields]
        self.types = [_hive_type(f.dataType) for f in schema.fields]
        self.group_rows = int(options.get("group_rows", DEFAULT_GROUP_ROWS))
        self.codec = options.get("codec")  # e.g. "deflate", "gzip"
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for old in glob.glob(
                os.path.join(self.path, "part-*.rc")
            ) + glob.glob(os.path.join(self.path, "part-*.inprogress")):
                os.remove(old)

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname, n = _write_part_file(
            self.path, pid, self.names, self.types,
            (tuple(r) for r in iterator), self.group_rows, self.codec,
        )
        return RCFileCommit(fname, n)
