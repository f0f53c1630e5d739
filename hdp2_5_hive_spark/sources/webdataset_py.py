"""WebDataset-style tar shard export/import (public convention:
Aizman et al., "High Performance I/O For Large Scale Deep Learning";
the webdataset format spec — a plain POSIX tar whose members are
``<sample-key>.<extension>``, consecutive members with the same key
forming one training sample).

Why this sink exists: the training side of a 100 TB data pipeline
does not read parquet — PyTorch/JAX loaders stream sequential tar
shards. The export is therefore a first-class sink beside the Hive
ones (reference FileSinkOperator writes row-format files the same
way: one file per task, ``ql/exec/FileSinkOperator.java``), with the
three properties a resumable multi-epoch loader needs:

- DETERMINISTIC placement: shard = md5(key) mod n_shards and samples
  sorted by key within a shard — partition-layout-invariant, so a
  re-export of the same table produces byte-identical shards (tar
  headers are pinned: mtime 0, uid/gid 0, empty uname/gname, USTAR).
- BOUNDED memory: shards are written by STREAMING over rows after a
  ``repartition(n_shards, shard) + sortWithinPartitions(shard, key)``
  — one open tar at a time per task, no shard materialized in RAM;
  at warehouse scale n_shards is set to O(corpus / ~1 GiB) exactly as
  webdataset prescribes.
- ATOMIC visibility: tars write to a tmp name and os.replace into
  place (same task-attempt contract as rcfile_py.write_rcfile).

Read path: the shard list parallelizes across the cluster and each
task streams one tar with stdlib tarfile — member bytes never pass
through the driver. String-typed members decode as UTF-8, binary
members stay raw; the caller declares the extension→type map (the
same contract a webdataset loader's ``.decode()`` applies).
"""

from __future__ import annotations

import glob
import hashlib
import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_webdataset", "read_webdataset"]


def _shard_of(key: str, n_shards: int) -> int:
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:8], 16) % n_shards


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name=name)
    ti.size = size
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    members: dict[str, str],
    *,
    n_shards: int = 8,
) -> int:
    """Export ``df`` as ``shard-NNNNNN.tar`` files under ``path``.

    ``members`` maps column name → member extension; string columns
    are written UTF-8, binary columns raw. ``key_col`` values must be
    unique (they are the sample keys; duplicate keys would merge
    samples in any webdataset reader). Returns total samples written.
    """
    cols = list(members.keys())
    key = F.col(key_col).cast("string")
    shard = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % n_shards
    ).cast("int")
    prepared = (
        df.select(key.alias("_key"), shard.alias("_shard"), *cols)
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_key")
    )
    from pyspark.sql.types import BinaryType

    binary_col = {
        c: isinstance(df.schema[c].dataType, BinaryType) for c in cols
    }
    exts = [members[c] for c in cols]
    is_bin = [binary_col[c] for c in cols]
    os.makedirs(path, exist_ok=True)
    for old in glob.glob(os.path.join(path, "shard-*.tar")) + glob.glob(
        os.path.join(path, "shard-*.inprogress")
    ):
        os.remove(old)

    def write_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        ctx = TaskContext.get()
        tag = (
            str(ctx.taskAttemptId())
            if ctx is not None
            else f"pid{os.getpid()}"
        )

        cur_shard, tar, tmp, fname, n = None, None, None, None, 0
        reports: list[tuple[str, int]] = []

        def close_current():
            nonlocal tar
            if tar is not None:
                tar.close()
                os.replace(tmp, fname)
                reports.append((fname, n))
                tar = None

        for batch in batches:
            keys = batch.column(0).to_pylist()
            shards = batch.column(1).to_pylist()
            data = [
                batch.column(i + 2).to_pylist() for i in range(len(cols))
            ]
            for r, (k, s) in enumerate(zip(keys, shards)):
                if s != cur_shard:
                    close_current()
                    cur_shard, n = s, 0
                    fname = os.path.join(path, f"shard-{s:06d}.tar")
                    # per-attempt tmp: a shared tmp path let a losing
                    # speculative attempt's open fd corrupt the inode
                    # the winner had already published via os.replace
                    tmp = f"{fname}.{tag}.inprogress"
                    tar = tarfile.open(
                        tmp, "w", format=tarfile.USTAR_FORMAT
                    )
                for i, ext in enumerate(exts):
                    v = data[i][r]
                    if v is None:
                        continue
                    member = f"{k}.{ext}"
                    if len(member.encode("utf-8")) > 100:
                        # USTAR (pinned for deterministic headers)
                        # caps member names at 100 bytes; tarfile
                        # would otherwise raise a bare 'name is too
                        # long' mid-write inside the executor,
                        # aborting the export without naming the key
                        raise ValueError(
                            "webdataset: sample key too long for the "
                            f"USTAR 100-byte member-name cap: {member!r}"
                            " — shorten key_col (e.g. hash it)"
                        )
                    raw = v if is_bin[i] else str(v).encode("utf-8")
                    tar.addfile(
                        _tarinfo(member, len(raw)),
                        io.BytesIO(raw),
                    )
                n += 1
        close_current()
        yield pa.RecordBatch.from_pydict(
            {
                "path": [p for p, _ in reports],
                "n_samples": [c for _, c in reports],
            }
        )

    report = prepared.mapInArrow(write_partition, "path string, n_samples long")
    return sum(r.n_samples for r in report.collect())


def _parse_shard(
    shard_path: str, exts: dict[str, str]
) -> tuple[list[str], dict[str, dict[str, object]]]:
    """Parse one tar shard into (key order, key → {ext: value}).

    Corrupt-input contract (r13): stdlib tarfile raises
    tarfile.TarError/ReadError on corrupt headers — an internal error
    class a 100 TB scan must not leak (one bad shard = one loud
    actionable ValueError naming the file, not a poisoned job)."""
    rows: dict[str, dict[str, object]] = {}
    order: list[str] = []
    try:
        with tarfile.open(shard_path, "r") as tar:
            for m in tar:
                if not m.isfile():
                    continue
                base, dot, ext = m.name.rpartition(".")
                if not dot or ext not in exts:
                    continue
                member = tar.extractfile(m)
                if member is None:
                    continue  # irregular member the loader skips
                raw = member.read()
                if base not in rows:
                    rows[base] = {}
                    order.append(base)
                rows[base][ext] = (
                    raw
                    if exts[ext] == "binary"
                    else raw.decode("utf-8")
                )
    except tarfile.TarError as exc:
        raise ValueError(
            f"webdataset: corrupt tar shard {shard_path!r}: {exc}"
        ) from None
    return order, rows


def read_webdataset(
    spark: SparkSession, path: str, members: dict[str, str]
) -> DataFrame:
    """Read tar shards back to (key, <ext columns>). ``members`` maps
    member extension → "string" | "binary" (the loader-side decode
    contract). One task per shard; unknown extensions are skipped the
    way webdataset loaders skip undeclared members."""
    shards = sorted(glob.glob(os.path.join(path, "shard-*.tar")))
    if not shards:
        raise FileNotFoundError(f"no shard-*.tar under {path}")
    exts = dict(members)
    fields = ", ".join(
        ["key string"]
        + [f"`{e}` {t}" for e, t in exts.items()]
    )

    def read_shard(batches):
        import pandas as pd

        for pdf in batches:
            for shard_path in pdf["p"]:
                order, rows = _parse_shard(shard_path, exts)
                yield pd.DataFrame(
                    {
                        "key": order,
                        **{
                            e: [rows[k].get(e) for k in order]
                            for e in exts
                        },
                    }
                )

    files = spark.createDataFrame(
        [(p,) for p in shards], "p string"
    ).repartition(len(shards), "p")
    return files.mapInPandas(read_shard, fields)
