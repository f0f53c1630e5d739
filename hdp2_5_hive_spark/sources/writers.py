"""Write-side surface: INSERT OVERWRITE/INTO, dynamic partitions,
bucketed tables, multi-insert, small-file compaction.

Reference: ``ql/.../exec/FileSinkOperator.java:91`` (file sinks incl.
dynamic partitions), multi-insert grammar ``parse/HiveParser.g``
(``FROM src INSERT ... INSERT ...``, exercised by
``ql/src/test/queries/clientpositive/groupby1.q:12``), bucketed DDL
``CLUSTERED BY ... SORTED BY ... INTO N BUCKETS``
(``data/scripts/q_test_init.sql:74-76``), file concatenation
``exec/OrcFileMergeOperator.java:41``.

Spark-first mapping: every sink is ``df.write`` with the right mode /
``partitionBy`` / ``bucketBy``; multi-insert is N actions off one
cached DataFrame (the scan runs once, as in Hive's shared TableScan).

Scale notes (100 TB):
- Dynamic-partition INSERT OVERWRITE uses partitionOverwriteMode=
  dynamic so only partitions present in the incoming data are
  replaced — a full-table overwrite at 100 TB would rewrite
  everything.
- Writers repartition by the partition columns before writing so each
  task writes few files into few partitions (Hive's
  SortedDynPartitionOptimizer, ``optimizer/SortedDynPartition
  Optimizer.java``); without it every task can open a file in every
  partition → small-file explosion.
- Bucketed writes give downstream joins/aggs a shuffle-free path
  (SMB join, ``exec/SMBMapJoinOperator.java:60``).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Formats served by Spark's built-in datasources in this environment.
CORE_FORMATS = ("parquet", "orc", "json", "csv")
# Avro rides the engine's own container-file codec (sources/avro_py)
# when the external spark-avro jar is absent, the native source when
# it's present — either way it round-trips.
ALL_FORMATS = CORE_FORMATS + ("avro",)


def insert_overwrite(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """``INSERT OVERWRITE DIRECTORY`` (FileSinkOperator overwrite
    path): replace the target with ``df``'s contents."""
    df.write.mode("overwrite").format(fmt).options(**options).save(path)


def insert_into(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """``INSERT INTO`` append semantics."""
    df.write.mode("append").format(fmt).options(**options).save(path)


def insert_overwrite_dynamic_partitions(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    fmt: str = "parquet",
) -> None:
    """Dynamic-partition INSERT OVERWRITE: replace exactly the
    partitions present in ``df``, leave all others untouched
    (Hive ``hive.exec.dynamic.partition.mode=nonstrict`` +
    FileSinkOperator dynamic-partition path).

    The pre-write ``repartition(partition_cols)`` clusters rows so a
    partition's data lands in few tasks (SortedDynPartitionOptimizer
    equivalent) — at 1000 executors this is the difference between
    N_partitions files and N_partitions × N_tasks files.
    """
    # dynamic overwrite rides the per-writer option, NOT a session-
    # conf set/restore: a concurrent write on another driver thread
    # could observe the leaked session-wide 'dynamic'
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .format(fmt)
        .partitionBy(*partition_cols)
        .save(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """``CLUSTERED BY (cols) [SORTED BY (cols)] INTO n BUCKETS``
    (q_test_init.sql:74-76). Bucket+sort metadata lets Spark plan
    shuffle-free SMB joins and aggregations on the bucket keys."""
    w = df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def multi_insert(
    df: DataFrame, sinks: Sequence[Callable[[DataFrame], None]]
) -> None:
    """``FROM src INSERT OVERWRITE t1 SELECT ... INSERT OVERWRITE t2
    SELECT ...`` (HiveParser.g multi-insert; groupby1.q:12): run the
    source once, feed N sinks. Caching materializes the shared scan
    exactly once — Hive does this with a shared TableScanOperator
    feeding N FileSinks."""
    cached = df.persist()
    try:
        cached.count()  # materialize before the fan-out
        for sink in sinks:
            sink(cached)
    finally:
        cached.unpersist()


def compact_files(
    spark: SparkSession,
    path: str,
    n_files: int,
    fmt: str = "parquet",
) -> None:
    """``ALTER TABLE ... CONCATENATE`` (OrcFileMergeOperator.java:41):
    rewrite a directory into ``n_files`` files. ``coalesce`` avoids a
    shuffle — merge-only, like the reference's stripe-level merge."""
    import os
    import shutil

    # Write to a temp sibling then swap via overwrite of the original:
    # a direct overwrite of the path being read would clobber inputs.
    # NOTE: the final overwrite is not atomic (same constraint as
    # Hive's CONCATENATE on a filesystem without atomic dir rename);
    # a crash between the two writes leaves the tmp copy as the only
    # complete one, which is why the tmp dir is removed only after the
    # final write succeeds.
    #
    # Crash-REPLAY safety (defect hunt r13): a leftover tmp dir means
    # the previous run died mid-swap. Blindly re-compacting would read
    # the (possibly partial, already-cleared-by-overwrite) original and
    # then OVERWRITE tmp — destroying the only complete copy. Spark's
    # _SUCCESS marker discriminates the two crash windows:
    # - tmp has _SUCCESS: tmp is complete; the original may be torn —
    #   resume the swap from tmp instead of re-reading the original.
    # - tmp lacks _SUCCESS: the crash was mid-tmp-write; the original
    #   is untouched — discard tmp and compact normally.
    tmp = path.rstrip("/") + "__compact_tmp"
    if os.path.isdir(tmp):
        if os.path.exists(os.path.join(tmp, "_SUCCESS")):
            out = spark.read.format(fmt).load(tmp)
            out.write.mode("overwrite").format(fmt).save(path)
            shutil.rmtree(tmp, ignore_errors=True)
            return
        shutil.rmtree(tmp)
    df = spark.read.format(fmt).load(path)
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(tmp)
    out = spark.read.format(fmt).load(tmp)
    out.write.mode("overwrite").format(fmt).save(path)
    shutil.rmtree(tmp, ignore_errors=True)


def write_range_layout(
    df: DataFrame,
    path: str,
    order_cols: Sequence[str],
    n_files: int,
    fmt: str = "parquet",
) -> None:
    """Range-clustered data layout: ``repartitionByRange`` +
    ``sortWithinPartitions`` before the sink, so each output file owns
    a disjoint key range and its footer min/max statistics prune
    whole files for range predicates.

    Hive's analogue is ``SORTED BY`` table layout feeding ORC stripe
    stats (``ql/.../io/orc/WriterImpl.java`` row-group index); on a
    100 TB time-series table this turns a one-day scan into reading
    1/365th of the files. The range exchange samples keys to build
    balanced boundaries — skew in ``order_cols`` becomes file-size
    skew, not task failure."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def zvalue_col(cols: Sequence[str], bits: int = 16):
    """Morton (Z-order) interleave of 2+ numeric columns, each first
    rank-compressed into ``bits``-bit integers by the caller or used
    raw if already small. Bit i of every column interleaves into the
    combined z-value — pure JVM bit expressions (shiftleft/or), no
    UDF."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        for ci, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit, b * len(cols) + ci)
            )
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    n_files: int,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Z-order-clustered layout: range-partition + sort on the Morton
    interleave of ``zorder_cols``, so footer min/max statistics stay
    TIGHT on every interleaved column at once — the multi-dimensional
    generalization of ``write_range_layout`` (which clusters
    perfectly on its leading column and not at all on later ones).

    The Delta/Iceberg OPTIMIZE ZORDER recipe re-expressed as plain
    DataFrame ops; Hive's nearest analogue is (SORTED BY a, b) ORC
    stripe stats, which this strictly improves for predicates on the
    second column. At 100 TB: one range exchange on the z-value (key
    sampling builds balanced file boundaries), then per-file sort —
    the same two-step shape as any clustered write."""
    with_z = df.withColumn("_z", zvalue_col(list(zorder_cols), bits))
    (
        with_z.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def round_trip(
    df: DataFrame, path: str, fmt: str, **options
) -> DataFrame:
    """Write ``df`` in ``fmt`` and read it back (schema-on-read check
    for each SerDe equivalent, SURVEY §2.2)."""
    if fmt == "avro":
        from . import avro_py

        avro_py.write_avro(df, path)
        return avro_py.read_avro(df.sparkSession, path)
    df.write.mode("overwrite").format(fmt).options(**options).save(path)
    reader = df.sparkSession.read.format(fmt).options(**options)
    if fmt in ("csv", "json"):
        # Text formats do not carry a schema — pin the writer's schema
        # (metastore-declared schema in Hive; schema-on-read).
        reader = reader.schema(df.schema)
    return reader.load(path)


def avro_available(spark: SparkSession) -> bool:
    """Probe for the external spark-avro module (AvroSerDe analogue,
    ``serde/.../avro/AvroSerDe.java``)."""
    try:
        spark.read.format("avro").load("/nonexistent__probe")
    except Exception as e:  # noqa: BLE001
        return "Failed to find" not in str(e) and "AVRO" not in str(
            getattr(e, "errorClass", "") or ""
        )
    return True
