"""Set operations, sorts, limits, sampling (SURVEY.md §2.7-2.8).

Reference: UNION ALL / UNION DISTINCT only (``HiveParser.g:2131-2135``,
``exec/UnionOperator.java:40``); ORDER BY = total order
(``SemanticAnalyzer.java:7053``), SORT BY = per-reducer order,
DISTRIBUTE BY = partition-only, CLUSTER BY = both
(``HiveLexer.g:93-95``); TopNHash limit pushdown
(``exec/TopNHash.java:45``); TABLESAMPLE bucket sampling
(``parse/FromClauseParser.g:167``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "union_all",
    oracle="""
SELECT k AS custkey, src FROM (
  SELECT c_custkey AS k, 'high_bal' AS src FROM customer WHERE c_acctbal > 9500
  UNION ALL
  SELECT c_custkey AS k, 'building' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
)
""",
    category="setops",
)
def union_all(spark, t):
    """UNION ALL bag semantics (UnionOperator.java:40): overlapping
    rows appear once per branch."""
    a = t.customer.filter(F.col("c_acctbal") > 9500).select(
        F.col("c_custkey").alias("custkey"), F.lit("high_bal").alias("src")
    )
    b = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"), F.lit("building").alias("src")
    )
    return a.unionAll(b)


@register(
    "union_distinct",
    oracle="""
SELECT DISTINCT o_custkey AS custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  UNION
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
)
""",
    category="setops",
)
def union_distinct(spark, t):
    """UNION [DISTINCT] — union + dedup (Hive rewrites to
    UNION ALL + GroupBy; Spark: union().distinct())."""
    a = t.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = t.orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@register(
    "orderby_limit",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    category="setops",
)
def orderby_limit(spark, t):
    """ORDER BY + LIMIT → TakeOrderedAndProject: per-partition top-k
    heaps then a single merge, never a global sort (Hive's TopNHash,
    exec/TopNHash.java:45, limit pushdown Optimizer.java:180)."""
    return t.orders.select("o_orderkey", "o_totalprice", "o_orderdate").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    ).limit(25)


@register(
    "distribute_sort_by",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000
""",
    category="setops",
)
def distribute_sort_by(spark, t):
    """DISTRIBUTE BY + SORT BY (CLUSTER BY) — partition-local order
    (genReduceSinkPlan:7190). The row SET is what the oracle checks;
    per-partition order is an execution property, not a result
    property (driver compare is order-insensitive, matching Hive's
    SORT_QUERY_RESULTS mode)."""
    return (
        t.orders.filter(F.col("o_totalprice") > 400000)
        .repartition(8, "o_custkey")
        .sortWithinPartitions("o_custkey", "o_orderkey")
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "sample_bucket",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderkey % 10 = 3
""",
    category="setops",
)
def sample_bucket(spark, t):
    """TABLESAMPLE(BUCKET 4 OUT OF 10 ON o_orderkey) equivalent
    (FromClauseParser.g:167; SamplePruner Optimizer.java:129) via a
    deterministic key-mod predicate — engine-portable, unlike
    hash-based sampling."""
    return t.orders.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "distinct_projection",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
    category="setops",
)
def distinct_projection(spark, t):
    """SELECT DISTINCT — GroupBy with no aggregates; map-side partial
    dedup collapses the shuffle at scale."""
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct()
