"""Source/sink round-trip queries — driver-visible coverage for the
SerDe/FileSink surface (SURVEY §2.2).

Each query materializes a write to a scratch directory and returns
the read-back result, so the driver's oracle compare certifies the
full write→read path, not just that a write didn't throw. Reference:
``serde/.../avro/AvroSerDe.java`` (Avro),
``ql/io/orc/OrcSerde.java`` (ORC),
``ql/.../exec/FileSinkOperator.java:91`` (dynamic partitions).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from .registry import register


@register(
    "fmt_avro_round_trip",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
    category="formats",
)
def fmt_avro_round_trip(spark, t):
    """Avro write→read round-trip (AvroSerDe.java analogue) through
    the engine's container-file codec (sources/avro_py, written from
    the public Avro 1.11 spec; delegates to native spark-avro when
    its jar is present). repartition(4) forces a multi-file write —
    one container file per partition, decoded in parallel."""
    from ..sources import avro_py

    d = tempfile.mkdtemp(prefix="fmt_avro_")
    avro_py.write_avro(t.nation.repartition(4), d)
    return avro_py.read_avro(spark, d).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "fmt_orc_round_trip",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_totalprice > 400000
""",
    category="formats",
)
def fmt_orc_round_trip(spark, t):
    """ORC write→read round-trip (OrcSerde.java / OrcInputFormat
    analogue): Spark's built-in vectorized ORC source."""
    d = tempfile.mkdtemp(prefix="fmt_orc_")
    src = t.orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    src.write.mode("overwrite").orc(d)
    return spark.read.orc(d)


@register(
    "fmt_dynamic_partition_sink",
    oracle="""
SELECT o_orderpriority, count(*) AS n, sum(o_orderkey) AS key_sum
FROM orders GROUP BY o_orderpriority
""",
    category="formats",
)
def fmt_dynamic_partition_sink(spark, t):
    """Dynamic-partition INSERT OVERWRITE (FileSinkOperator.java:91
    dynamic-partition path + SortedDynPartitionOptimizer): write
    orders partitioned by o_orderpriority, read the partitioned
    layout back, and aggregate per partition — proves both partition
    pruning metadata and data fidelity survive the sink."""
    from ..sources import writers

    d = tempfile.mkdtemp(prefix="fmt_dynpart_")
    writers.insert_overwrite_dynamic_partitions(
        t.orders.select("o_orderkey", "o_orderpriority"),
        d,
        ["o_orderpriority"],
    )
    back = spark.read.parquet(d)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
    )
