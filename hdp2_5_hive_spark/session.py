"""SparkSession factory with Hive-1.2-parity configuration.

Reference semantics being pinned (SURVEY.md §2.9, §7):

- Hive casts that fail produce NULL, not errors (reference
  ``ql/.../udf/generic/GenericUDFToInteger.java`` & friends) →
  ``spark.sql.ansi.enabled=false``.
- Hive timestamps are session-local; we fix the session to UTC so
  results compare bit-for-bit against the DuckDB oracle
  (``spark.sql.session.timeZone=UTC``).
- AQE on: Hive's runtime join conversion / skew handling
  (``optimizer/physical/CommonJoinResolver.java``,
  ``exec/SkewJoinHandler.java:74``) maps to Spark adaptive execution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(
    app_name: str = "hdp2_5_hive_spark",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Designed for a multi-executor cluster; in this environment it runs
    ``local[N]``. Every config below is cluster-safe: AQE handles
    runtime partition coalescing and skew joins at any scale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Hive parity: failed casts/arithmetic → NULL, not error.
        .config("spark.sql.ansi.enabled", "false")
        # Deterministic timestamps vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Shuffle parallelism sized to cores locally; AQE coalesces.
        .config(
            "spark.sql.shuffle.partitions",
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS,
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for any pandas-UDF path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: Hive's hive.mapjoin.smalltable.filesize
        # analogue (MapJoinProcessor.java:86). 64 MB handles all dims.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # type — read as long, catalog converts to micros (see
        # catalog.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # Managed-table warehouse (bucketed tables land here; the
        # metastore-warehouse analogue). Static conf — set at build.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
