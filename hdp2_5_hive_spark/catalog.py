"""Catalog facade: load the driver parquet tables and register temp views.

Stand-in for the Hive metastore (reference
``metastore/src/java/org/apache/hadoop/hive/metastore/HiveMetaStore.java:258``):
database→table resolution becomes ``spark.read.parquet`` + temp views, so
``spark.sql`` text and DataFrame chains both see the same catalog.

At cluster scale the same facade points at partitioned/bucketed
warehouse paths; nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (reference TableScanOperator,
    ``ql/.../exec/TableScanOperator.java:58``). Column pruning and
    predicate pushdown into the parquet footer are Catalyst's job —
    callers just ``select``/``filter`` declaratively."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    # NOTE: no blanket re-split here. The testdata's single-row-group
    # files scan on one core, but measurements show a round-robin
    # shuffle of the raw rows costs more than it buys for scan+agg
    # shapes at this size; only CPU-dominant operators (shingling,
    # vector math — see operators/util.ensure_parallelism) re-split.
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS) → read as long nanos
        # (spark.sql.legacy.parquet.nanosAsLong), truncate to micros.
        # DuckDB oracle side does CAST(ts AS TIMESTAMP) for parity.
        from pyspark.sql import functions as F

        # Integer DIV, not floor(double /): nanosecond epochs are
        # ~2^60 and double's 52-bit mantissa silently rounds them
        # (observed ±1 µs drift vs the oracle).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000").cast("long"))
        )
    return df


class Tables:
    """Lazy per-sf_dir table accessor: ``t.lineitem``, ``t['orders']``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return self[name]

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]


def register_views(spark: SparkSession, sf_dir: str) -> Tables:
    """Register every testdata table as a temp view (CREATE VIEW
    equivalent — reference ``exec/DDLTask.java`` create-view path) so
    SQL-text queries resolve the same names the DuckDB oracle uses."""
    tables = Tables(spark, sf_dir)
    for name in TABLES:
        tables[name].createOrReplaceTempView(name)
    return tables
