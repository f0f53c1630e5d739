"""Skew-mitigation operators: salted aggregation equivalence, salted
replicated join equivalence, AQE skew-join engagement."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp2_5_hive_spark.operators.skew import (
    replicated_skew_join,
    salted_sum_count,
)


def test_salted_agg_equals_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        (r.l_returnflag): (round(r.s, 4), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,6)"))
            .cast("double")
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag): (round(r.sum_value, 4), r.n)
        for r in salted_sum_count(
            li, ["l_returnflag"], F.col("l_quantity"), n_salts=16
        ).collect()
    }
    assert salted == direct


def test_replicated_skew_join_equals_plain(spark):
    # 90% of the big side shares one hot key.
    big = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(1000)], "k int, v int"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, name string")
    plain = big.join(small, "k").groupBy("name").count()
    salted = replicated_skew_join(big, small, "k").groupBy("name").count()
    assert {(r.name, r["count"]) for r in salted.collect()} == {
        (r.name, r["count"]) for r in plain.collect()
    }


def test_aqe_skew_join_engages(spark, sf_dir):
    """With thresholds lowered, AQE splits a skewed shuffle join —
    the built-in runtime path (SkewJoinHandler.java analogue)."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        # 95% of rows share key 1 (computed, so Catalyst can't
        # constant-fold the join away).
        hot = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(1))
            .otherwise(F.col("id") % 32)
            .alias("k"),
            F.col("id").alias("v"),
        )
        other = spark.range(32).select(F.col("id").alias("k"), F.lit(0).alias("w"))
        j = hot.join(other, "k")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan or "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_aqe_converts_sort_merge_to_broadcast_at_runtime(spark, sf_dir):
    """AQE join re-optimization: a join whose small side is hidden
    behind an aggregate (no reliable compile-time stats, so the
    static plan picks SortMergeJoin) converts to BroadcastHashJoin
    at RUNTIME once the shuffle materializes and AQE measures the
    actual size — the mechanism that saves the big-side shuffle on
    1000-executor clusters without manual hints."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # small side: 3-row aggregate, but behind a shuffle so the
    # static planner cannot know it is tiny
    small = (
        li.filter(F.col("l_orderkey") < 20)
        .groupBy("l_linestatus")
        .agg(F.sum("l_quantity").alias("q"))
    )
    joined = li.join(small, "l_linestatus").groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.max("q").alias("mq")
    )
    joined.collect()  # finalize the adaptive plan
    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final, final[:500]
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final
