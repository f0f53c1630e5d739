"""ACID DML queries: UPDATE / DELETE / MERGE INTO end-to-end over a
copy-on-write parquet table, final table state hash-checked against a
pure-SQL oracle (``ql/parse/UpdateDeleteSemanticAnalyzer.java:50,
68-94``; SURVEY §2.2 "UPDATE/DELETE → DataFrame rewrite").
"""

from __future__ import annotations


from pyspark.sql import functions as F

from ..functions.hive_compat import dsum
from ..scratch import scratch_dir
from .registry import register


@register(
    "acid_update_delete",
    oracle="""
WITH t AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderpriority = '1-URGENT' AND o_totalprice > 250000
              THEN o_totalprice * 0.5 ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM orders
  WHERE NOT (o_orderpriority = '5-LOW' AND o_totalprice < 100000)
)
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM t GROUP BY o_orderpriority
""",
    category="acid",
)
def acid_update_delete(spark, t):
    """UPDATE then DELETE on a partitioned copy-on-write table
    (UpdateDeleteSemanticAnalyzer.java:50,68): seed orders partitioned
    by o_orderpriority, halve the price of expensive urgent orders,
    drop cheap low-priority ones, then aggregate the surviving table.
    Each DML rewrites ONLY its matched partitions (dynamic-partition
    overwrite; pruning asserted in tests/test_acid.py). The halving
    factor 0.5 is exactly representable so both engines agree
    bit-for-bit."""
    from ..sources import acid

    d = scratch_dir("acid_ud_")
    seed = t.orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    (
        seed.repartition("o_orderpriority")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(d)
    )
    acid.update_table(
        spark,
        d,
        {"o_totalprice": F.col("o_totalprice") * 0.5},
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 250000),
        partition_cols=["o_orderpriority"],
    )
    acid.delete_from(
        spark,
        d,
        (F.col("o_orderpriority") == "5-LOW")
        & (F.col("o_totalprice") < 100000),
        partition_cols=["o_orderpriority"],
    )
    back = spark.read.parquet(d)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


@register(
    "acid_merge_upsert",
    oracle="""
WITH src AS (
  SELECT c_custkey, 'UPD-' || c_name AS c_name,
         c_acctbal + 1000.0 AS c_acctbal,
         (c_custkey % 20 = 0) AS del
  FROM customer WHERE c_custkey % 4 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW-' || c_name,
         CAST(1.5 AS DOUBLE), FALSE
  FROM customer WHERE c_custkey % 10 = 3
),
kept AS (
  SELECT t.c_custkey,
         CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name
              ELSE t.c_name END AS c_name,
         CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
              ELSE t.c_acctbal END AS c_acctbal,
         COALESCE(s.del, FALSE) AS del
  FROM customer t LEFT JOIN src s ON t.c_custkey = s.c_custkey
)
SELECT c_custkey, c_name, c_acctbal FROM kept WHERE NOT del
UNION ALL
SELECT s.c_custkey, s.c_name, s.c_acctbal
FROM src s LEFT JOIN customer t ON s.c_custkey = t.c_custkey
WHERE t.c_custkey IS NULL
""",
    category="acid",
)
def acid_merge_upsert(spark, t):
    """MERGE INTO (upsert + conditional delete in one statement —
    the update+delete+insert decomposition HDP 2.5 users ran on the
    same ACID machinery): source rows update matching customers,
    delete every 20th, and insert brand-new keys; the final TABLE
    STATE (all rows) is the checked result, so every routing branch
    of the merge join is hash-verified."""
    from ..sources import acid

    d = scratch_dir("acid_merge_")
    target = t.customer.select("c_custkey", "c_name", "c_acctbal")
    target.write.mode("overwrite").parquet(d)

    c = t.customer
    updates = c.filter(F.col("c_custkey") % 4 == 0).select(
        "c_custkey",
        F.concat(F.lit("UPD-"), F.col("c_name")).alias("c_name"),
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        (F.col("c_custkey") % 20 == 0).alias("del"),
    )
    inserts = c.filter(F.col("c_custkey") % 10 == 3).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_name")).alias("c_name"),
        F.lit(1.5).alias("c_acctbal"),
        F.lit(False).alias("del"),
    )
    acid.merge_into(
        spark,
        d,
        updates.unionByName(inserts),
        on=["c_custkey"],
        matched_update={
            "c_name": F.col("s.c_name"),
            "c_acctbal": F.col("s.c_acctbal"),
        },
        matched_delete=F.col("s.del"),
        not_matched_insert=True,
    )
    return spark.read.parquet(d)
