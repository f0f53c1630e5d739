"""Subqueries, CTEs, views (SURVEY.md §2.11).

Reference: Hive 1.2 supports IN / NOT IN / EXISTS / NOT EXISTS
predicates (one per query block, correlated OK), rewritten to
semi/anti joins at analysis time (``parse/QBSubQuery.java:40-57``,
``SemanticAnalyzer.genPlanForSubQueryPredicate:2715``); WITH clauses
(``HiveParser.g:2161-2164``); views expanded at parse. Spark SQL
handles all of these natively in Catalyst (RewritePredicateSubquery),
plus scalar subqueries, which we include as a superset capability.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "subq_in",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
""",
    category="subqueries",
)
def subq_in(spark, t):
    """IN subquery → left semi join (QBSubQuery.java:42)."""
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )


@register(
    "subq_not_in",
    oracle="""
SELECT c_custkey FROM customer
WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))
""",
    category="subqueries",
)
def subq_not_in(spark, t):
    """NOT IN subquery → null-aware anti join (QBSubQuery.java:44);
    keys are non-null here, matching Hive's supported form."""
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_nationkey NOT IN
          (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))
        """
    )


@register(
    "subq_exists_correlated",
    oracle="""
SELECT p_partkey, p_brand FROM part
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_partkey = p_partkey AND l_quantity > 49
)
""",
    category="subqueries",
)
def subq_exists_correlated(spark, t):
    """Correlated EXISTS → semi join on the correlation key."""
    return spark.sql(
        """
        SELECT p_partkey, p_brand FROM part
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_partkey = p_partkey AND l_quantity > 49
        )
        """
    )


@register(
    "subq_not_exists_correlated",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey AND l_shipdate >= TIMESTAMP '2001-10-25 00:00:00'
)
""",
    category="subqueries",
)
def subq_not_exists_correlated(spark, t):
    """Correlated NOT EXISTS → anti join (QBSubQuery.java:45)."""
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE NOT EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_suppkey = s_suppkey AND l_shipdate >= TIMESTAMP '2001-10-25 00:00:00'
        )
        """
    )


@register(
    "subq_scalar",
    oracle="""
SELECT o_orderkey, o_totalprice,
       ROUND(o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                                    / COUNT(*) FROM orders), 2) AS delta_vs_avg
FROM orders WHERE o_totalprice > 450000
""",
    category="subqueries",
)
def subq_scalar(spark, t):
    """Uncorrelated scalar subquery (Spark superset — Hive 1.2 lacks
    it; SURVEY.md §2.11)."""
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice -
                 (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                         / COUNT(*) FROM orders), 2) AS delta_vs_avg
        FROM orders WHERE o_totalprice > 450000
        """
    )


@register(
    "cte_chain",
    oracle="""
WITH big_orders AS (
  SELECT o_custkey, COUNT(*) AS n
  FROM orders WHERE o_totalprice > 250000
  GROUP BY o_custkey
),
ranked AS (
  SELECT c_custkey, c_mktsegment, n
  FROM customer JOIN big_orders ON c_custkey = o_custkey
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(n) AS BIGINT) AS n_big_orders
FROM ranked GROUP BY c_mktsegment
""",
    category="subqueries",
)
def cte_chain(spark, t):
    """Chained WITH clauses (HiveParser.g:2161; resolution
    SemanticAnalyzer.java:1454) — non-recursive, non-materialized."""
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n
          FROM orders WHERE o_totalprice > 250000
          GROUP BY o_custkey
        ),
        ranked AS (
          SELECT c_custkey, c_mktsegment, n
          FROM customer JOIN big_orders ON c_custkey = o_custkey
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(n) AS BIGINT) AS n_big_orders
        FROM ranked GROUP BY c_mktsegment
        """
    )


@register(
    "view_over_view",
    oracle="""
SELECT yr, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM (SELECT YEAR(o_orderdate) AS yr, o_totalprice FROM orders)
GROUP BY yr
""",
    category="subqueries",
)
def view_over_view(spark, t):
    """Logical view expansion (CREATE VIEW → parse-time inline):
    a temp view defined over a temp view, queried through SQL."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW orders_yearly AS "
        "SELECT YEAR(o_orderdate) AS yr, o_totalprice FROM orders"
    )
    return spark.sql(
        """
        SELECT yr, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM orders_yearly GROUP BY yr
        """
    )


@register(
    "subq_not_in_null_semantics",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey <= 200
  AND c_custkey NOT IN (
    SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END
    FROM orders WHERE o_custkey <= 100)
ORDER BY c_custkey
""",
    category="subqueries",
)
def subq_not_in_null_semantics(spark, t):
    """NOT IN three-valued-logic trap (reference
    ``ql/parse/SubQueryUtils.java`` null-check branches — Hive adds
    the same correlated null guards ANSI demands): the subquery
    emits NULLs, so ``x NOT IN (...)`` is never TRUE for ANY row and
    the correct result is EMPTY — that emptiness is the assertion: a
    naive anti-join rewrite (what a non-ANSI engine or a blind !=
    chain produces) would return ~100 customers here. The companion
    ``subq_not_in`` (NULL-free list) covers the non-empty path; this
    query pins the trap case both engines must agree on."""
    t.customer
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey <= 200
          AND c_custkey NOT IN (
            SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                        ELSE o_custkey END
            FROM orders WHERE o_custkey <= 100)
        ORDER BY c_custkey
        """
    )
