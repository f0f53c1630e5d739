"""Column-level lineage extraction (functions/lineage)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp2_5_hive_spark.functions.lineage import column_lineage


def test_lineage_through_join_and_aggregate(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("o_totalprice").alias("rev"),
            F.count(F.lit(1)).alias("n"),
            (F.sum("o_totalprice") / F.count("o_orderkey")).alias("avg_p"),
        )
    )
    lin = column_lineage(df)
    assert lin["c_mktsegment"] == ["customer.c_mktsegment"]
    assert lin["rev"] == ["orders.o_totalprice"]
    assert lin["n"] == ["<computed>"]  # count(lit) references nothing
    assert lin["avg_p"] == ["orders.o_orderkey", "orders.o_totalprice"]


def test_lineage_through_explode_and_concat(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).select(
        F.concat(
            F.col("w"), F.lit("!"), F.col("doc_id").cast("string")
        ).alias("tagged")
    )
    assert column_lineage(e)["tagged"] == [
        "documents.doc_id",
        "documents.text",
    ]


def test_lineage_self_join_disambiguates_by_expr_id(spark, sf_dir):
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    a, b = n.alias("a"), n.alias("b")
    df = a.join(
        b, F.col("a.n_regionkey") == F.col("b.n_regionkey")
    ).select(
        F.col("a.n_name").alias("left_name"),
        F.col("b.n_nationkey").alias("right_key"),
    )
    lin = column_lineage(df)
    assert lin["left_name"] == ["nation.n_name"]
    assert lin["right_key"] == ["nation.n_nationkey"]


def test_lineage_window_and_union(spark, sf_dir):
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    df = li.select(
        "l_orderkey",
        F.sum("l_quantity").over(w).alias("run_qty"),
    )
    lin = column_lineage(df)
    assert lin["run_qty"] == [
        "lineitem.l_linenumber",
        "lineitem.l_orderkey",
        "lineitem.l_quantity",
    ]
