"""Arrow IPC (stream-format) export/import — the zero-copy
interchange file every modern loader mmaps (public Apache Arrow IPC
spec; pyarrow is the reference implementation).

Why beside the Hive formats: the reference's interchange story ends
at SequenceFile/RCFile; a 2020s training pipeline hands columnar
batches to data loaders as Arrow IPC files (HuggingFace datasets'
on-disk format is exactly this). The Spark shape mirrors
rcfile_py.write_rcfile: one `part-NNNNN.arrow` per partition written
INSIDE the executors via mapInArrow (the data is already Arrow
batches there — serialization is a pass-through, no row pivot), read
back as one task per file. tmp+os.replace gives the same task-attempt
atomicity contract as the other writers.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_arrow_ipc", "read_arrow_ipc"]


def write_arrow_ipc(df: DataFrame, path: str) -> int:
    """One Arrow IPC stream file per non-empty partition; returns
    total rows written. Batches stream straight from Spark's Arrow
    runtime into the file — bounded memory per task."""
    os.makedirs(path, exist_ok=True)
    for old in glob.glob(os.path.join(path, "part-*.arrow")) + glob.glob(
        os.path.join(path, "part-*.inprogress")
    ):
        os.remove(old)

    def write_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.arrow")
        # tmp is PER-ATTEMPT, not per-partition: a speculative or
        # retried attempt sharing one tmp path would keep writing —
        # through its still-open fd — into the inode the fast
        # attempt just published via os.replace, corrupting the
        # visible file. Unique tmp names make replace last-wins;
        # the loser's tmp is swept by the next write's cleanup.
        tmp = f"{fname}.{ctx.taskAttemptId()}.inprogress"
        writer, n = None, 0
        for batch in batches:
            if writer is None:
                writer = pa.ipc.new_stream(tmp, batch.schema)
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is not None:
            writer.close()
            os.replace(tmp, fname)
            yield pa.RecordBatch.from_pydict(
                {"path": [fname], "n_rows": [n]}
            )

    report = df.mapInArrow(write_partition, "path string, n_rows long")
    return sum(r.n_rows for r in report.collect())


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Parallelize the file list; each task streams one IPC file's
    batches back out — schema taken from the first file (all parts
    share the writer's schema)."""
    import pyarrow as pa

    files = sorted(glob.glob(os.path.join(path, "part-*.arrow")))
    if not files:
        raise FileNotFoundError(f"no part-*.arrow under {path}")
    with pa.ipc.open_stream(files[0]) as rd:
        arrow_schema = rd.schema
    # every part must agree with files[0]: a directory mixing parts
    # from two writes (e.g. stale high-numbered parts after a
    # narrower re-export) would otherwise surface as confusing
    # per-task cast errors — or silently misattributed columns —
    # instead of this one loud check (same guard as read_rcfile)
    for p in files[1:]:
        with pa.ipc.open_stream(p) as rd:
            if rd.schema != arrow_schema:
                raise ValueError(
                    f"arrow_ipc: schema of {p!r} differs from "
                    f"{files[0]!r} — the directory mixes parts from "
                    "different writes; clean it and re-export"
                )
    from pyspark.sql.pandas.types import from_arrow_type
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField(f.name, from_arrow_type(f.type), True)
            for f in arrow_schema
        ]
    )

    def read_file(batches):
        for pdf in batches:
            for p in pdf["p"]:
                with pa.ipc.open_stream(p) as rd:
                    for batch in rd:
                        yield batch.to_pandas()

    fdf = spark.createDataFrame(
        [(p,) for p in files], "p string"
    ).repartition(len(files), "p")
    return fdf.mapInPandas(read_file, schema)
