"""Join family — every join type the reference supports.

Reference join types (``ql/plan/JoinDesc.java:42-47``): INNER,
LEFT/RIGHT/FULL OUTER, LEFT SEMI, plus CROSS (``HiveLexer.g:247``),
anti via NOT IN/NOT EXISTS rewrite (``parse/QBSubQuery.java:42-57``)
and null-safe ``<=>`` (``FunctionRegistry.java:328``). Only equi-join
conditions are allowed (``parse/SemanticAnalyzer.java:2449``); theta
predicates become residual filters — mirrored in
``join_theta_residual`` below.

Scale notes: dims (customer/supplier/nation/region) are broadcast —
Hive's MapJoin (``exec/MapJoinOperator.java:72``). Fact-to-fact joins
shuffle on the join key; AQE handles skew (Hive:
``exec/SkewJoinHandler.java:74``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import dsum
from .registry import register


@register(
    "join_inner_basic",
    oracle="""
SELECT c_mktsegment, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderstatus
""",
    category="joins",
)
def join_inner_basic(spark, t):
    """Inner equi-join (JoinOperator.java:43), broadcast dim side."""
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_totalprice > 400000
GROUP BY c_custkey, c_name
""",
    category="joins",
)
def join_left_outer(spark, t):
    """LEFT OUTER with an extra join-side predicate: unmatched
    customers survive with zero counts (CommonJoinOperator.java:50
    outer-join null padding)."""
    o = t.orders.filter(F.col("o_totalprice") > 400000)
    return (
        t.customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice
FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
RIGHT JOIN customer ON o_custkey = c_custkey
""",
    category="joins",
)
def join_right_outer(spark, t):
    """RIGHT OUTER: preserved right side yields NULL order columns."""
    o = t.orders.filter(F.col("o_totalprice") > 450000)
    return (
        o.join(t.customer, F.col("o_custkey") == F.col("c_custkey"), "right")
        .select("c_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "join_full_outer",
    oracle="""
SELECT COALESCE(c.nk, s.nk) AS nationkey, n_customers, n_suppliers
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer
      WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier
      WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
  ON c.nk = s.nk
""",
    category="joins",
)
def join_full_outer(spark, t):
    """FULL OUTER join of two aggregates (JoinDesc.java FULL_OUTER=3)."""
    c = (
        t.customer.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        t.supplier.filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, F.col("cnk") == F.col("snk"), "full").select(
        F.coalesce("cnk", "snk").alias("nationkey"), "n_customers", "n_suppliers"
    )


@register(
    "join_left_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
""",
    category="joins",
)
def join_left_semi(spark, t):
    """LEFT SEMI (JoinDesc.java:47 LEFT_SEMI=5): IN-subquery form."""
    o = t.orders.filter(F.col("o_orderstatus") == "F")
    return t.customer.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
""",
    category="joins",
)
def join_left_anti(spark, t):
    """ANTI join — Hive's NOT EXISTS rewrite (QBSubQuery.java:42-57)."""
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return t.customer.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="""
SELECT r_name, seg.c_mktsegment AS mktsegment
FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
""",
    category="joins",
)
def join_cross(spark, t):
    """Cartesian product (CrossProductCheck.java warns; we make it
    explicit with crossJoin) — 5×5 combinations."""
    segs = t.customer.select("c_mktsegment").distinct()
    return t.region.crossJoin(segs).select(
        "r_name", F.col("c_mktsegment").alias("mktsegment")
    )


@register(
    "join_null_safe",
    oracle="""
SELECT c.k AS join_key, COUNT(*) AS n_pairs
FROM (SELECT CASE WHEN c_acctbal < 1000 THEN NULL ELSE c_nationkey END AS k
      FROM customer) c
JOIN (SELECT CASE WHEN s_acctbal < 1000 THEN NULL ELSE s_nationkey END AS k
      FROM supplier) s
  ON c.k IS NOT DISTINCT FROM s.k
GROUP BY c.k
""",
    category="joins",
)
def join_null_safe(spark, t):
    """Null-safe ``<=>`` equality (GenericUDFOPEqualNS,
    FunctionRegistry.java:328): NULL keys match each other."""
    c = t.customer.select(
        F.when(F.col("c_acctbal") < 1000, None)
        .otherwise(F.col("c_nationkey"))
        .alias("ck")
    )
    s = t.supplier.select(
        F.when(F.col("s_acctbal") < 1000, None)
        .otherwise(F.col("s_nationkey"))
        .alias("sk")
    )
    return (
        c.join(s, F.col("ck").eqNullSafe(F.col("sk")))
        .groupBy(F.col("ck").alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_theta_residual",
    oracle="""
SELECT p_brand,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_extendedprice > p_retailprice * 40
GROUP BY p_brand
""",
    category="joins",
)
def join_theta_residual(spark, t):
    """Equi-join + residual theta predicate — Hive allows only
    equality in the join condition (SemanticAnalyzer.java:2449);
    the non-equi comparison stays a post-join filter."""
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("l_extendedprice") > F.col("p_retailprice") * 40)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice", "sum_price"),
        )
    )


@register(
    "join_unique_preserve",
    oracle="""
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       c.c_name, o.n_orders
FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 800) c
FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
                 WHERE o_custkey BETWEEN 400 AND 1200
                 GROUP BY o_custkey) o
  ON c.c_custkey = o.o_custkey
""",
    category="joins",
)
def join_unique_preserve(spark, t):
    """FROM UNIQUEJOIN PRESERVE (JoinDesc.java:46, type UNIQUE=4):
    rows from every PRESERVEd side survive regardless of matches —
    semantically a full outer join on the join key over deduplicated
    sides (SURVEY §2.4 mapping)."""
    c = t.customer.filter(F.col("c_custkey") <= 800).select(
        "c_custkey", "c_name"
    )
    o = (
        t.orders.filter(F.col("o_custkey").between(400, 1200))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "n_orders",
    )
