"""Core OLAP pipeline queries (TPC-H-shaped) — the end-to-end slice.

These exercise the reference's central operator chain
TableScan→Filter→Select→GroupBy→ReduceSink→Join→FileSink/Fetch
(``ql/.../exec/{TableScanOperator.java:58,FilterOperator.java:37,
SelectOperator.java:37,GroupByOperator.java:73,ReduceSinkOperator.java:64,
JoinOperator.java:43}``) expressed as declarative DataFrame plans:
Catalyst supplies pushdown, partial aggregation, broadcast-join
selection, and AQE does at runtime what Hive's CommonJoinResolver did
at compile time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import davg, dsum
from .registry import register


# ---------------------------------------------------------------------------
# q1_pricing_summary — flagship. Hive GroupByOperator partial/final hash
# aggregation (GroupByOperator.java:73; modes GroupByDesc.java:38-55).
# Scale: map-side partial agg collapses 100 TB to |groups|×partitions
# rows before the shuffle; decimal accumulators keep the sum exact.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    category="core",
)
def q1_pricing_summary(spark, t):
    """TPC-H Q1 shape: scan→filter→8-agg groupBy over lineitem.

    The 8 decimal accumulators make the PARTIAL phase CPU-bound, so
    an under-split scan serializes it — ensure_parallelism re-splits
    only when splits < cores (measured 0.94s→0.59s at sf0.1 on the
    single-row-group testdata; no-op at warehouse scale where the
    scan already carries thousands of splits). The 4-group collapse
    means the added round-robin exchange moves raw rows once but the
    final shuffle stays 4 rows/partition."""
    from ..operators.util import ensure_parallelism

    l = t.lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        ensure_parallelism(
            l.filter(
                F.col("l_shipdate")
                <= F.lit("1998-09-02 00:00:00").cast("timestamp")
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3_shipping_priority — 3-way join + agg + top-k. Hive: two shuffle
# joins + TopNHash limit pushdown (exec/TopNHash.java:45). Spark:
# no forced hints — customer/orders are the LARGE tables (1.5M+ rows
# per sf unit); size stats + AQE pick broadcast when they actually
# fit, shuffle join when they don't. TakeOrderedAndProject does the
# bounded top-k per partition then merges — no global sort at scale.
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    category="core",
)
def q3_shipping_priority(spark, t):
    """TPC-H Q3 shape: broadcast dim join ×2 → groupBy → top-10."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = t.orders.filter(F.col("o_orderdate") < cutoff)
    li = t.lineitem.filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5_local_supplier — 6-way star join with a cross-dimension equality
# (c_nationkey = s_nationkey). Hive: chained shuffle joins
# (CommonJoinOperator.java:50). Spark: dims broadcast; only the
# orders⋈lineitem spine shuffles, keyed on orderkey.
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
    category="core",
)
def q5_local_supplier(spark, t):
    """TPC-H Q5 shape: 6-table star join, local-supplier constraint."""
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    region = t.region.filter(F.col("r_name") == "ASIA")
    return (
        t.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer is the largest dim (1.5M rows × sf) — no forced
        # hint; AQE decides. Hints stay on the true smalls below.
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# q10_returned_items — join + filter-on-fact + grouped top-k.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    category="core",
)
def q10_returned_items(spark, t):
    """TPC-H Q10 shape: returned-item revenue per customer, top-20."""
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q18_large_orders — HAVING-style subquery feeding a semi join (Hive
# rewrites IN-subqueries to semi joins, parse/QBSubQuery.java:42-57).
# ---------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 300
)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    category="core",
)
def q18_large_orders(spark, t):
    """TPC-H Q18 shape: large-quantity orders via HAVING + semi join.

    One lineitem pass total: the HAVING aggregate's per-order sum IS
    the output ``sum_qty`` (o_orderkey is unique per group), so the
    textbook plan's second lineitem join + re-aggregate are dropped —
    at 100 TB that removes the single biggest shuffle (raw lineitem
    re-keyed by orderkey). The filtered aggregate (few rows) then
    broadcasts through orders and customer.

    The under-split guard hash-repartitions ON THE GROUP KEY, not
    round-robin: the aggregate reuses that one exchange (no second
    shuffle), where round-robin both added an exchange and destroyed
    the scan order's orderkey clustering, gutting the map-side
    partial agg (A/B at sf0.1/local[32], warm best-of-3:
    0.49s keyed vs 1.98s round-robin vs 0.91s unsplit)."""
    from ..operators.util import ensure_parallelism

    big = (
        ensure_parallelism(
            t.lineitem.select("l_orderkey", "l_quantity"),
            by=["l_orderkey"],
        )
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("_q"))
        .filter(F.col("_q") > 300)
    )
    return (
        t.orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_q").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    category="core",
)
def q6_forecast_revenue(spark, t):
    """TPC-H Q6 shape: scan-only conjunctive filter + ungrouped agg —
    the pure predicate-pushdown benchmark (FilterOperator
    ``exec/FilterOperator.java:37`` + map-side agg)."""
    li = t.lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q4_priority_exists",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    category="core",
)
def q4_priority_exists(spark, t):
    """TPC-H Q4 shape: correlated EXISTS → left-semi join
    (QBSubQuery.java rewrite), grouped count by priority. (The
    reference schema's commit/receipt dates aren't in the testdata;
    the EXISTS predicate filters returned lines instead.)"""
    t.orders.createOrReplaceTempView("orders")
    t.lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= '1996-07-01' AND o.o_orderdate < '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )


@register(
    "q12_priority_case_agg",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
    category="core",
)
def q12_priority_case_agg(spark, t):
    """TPC-H Q12 shape: join + conditional (CASE) aggregation — the
    canonical SUM(CASE WHEN ...) pivot pattern."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(
            t.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
              THEN l_extendedprice * (1 - l_discount) ELSE 0 END
              AS DECIMAL(38,6))) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(38,6))) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate < TIMESTAMP '1995-10-01'
""",
    category="core",
)
def q14_promo_revenue(spark, t):
    """TPC-H Q14 shape: broadcast part join + conditional revenue
    ratio (promo share of revenue for one month)."""
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= "1995-09-01")
            & (F.col("l_shipdate") < "1995-10-01")
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(promo.cast("decimal(38,6)")).cast("double")
                / F.sum(disc.cast("decimal(38,6)")).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q16_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%#000000001')
GROUP BY p_brand, p_type, p_size
""",
    category="core",
)
def q16_supplier_cnt(spark, t):
    """TPC-H Q16 shape: NOT IN subquery (anti join), IN-list +
    NOT LIKE filters, COUNT(DISTINCT). The part↔supplier link rides
    lineitem (testdata has no partsupp table)."""
    t.lineitem.createOrReplaceTempView("lineitem")
    t.part.createOrReplaceTempView("part")
    t.supplier.createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_name LIKE '%#000000001')
        GROUP BY p_brand, p_type, p_size
        """
    )


@register(
    "q19_disjunctive_pred",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    category="core",
)
def q19_disjunctive_pred(spark, t):
    """TPC-H Q19 shape: OR-of-ANDs join residual — exercises
    disjunction pushdown/CNF handling (PointLookupOptimizer
    territory in the reference)."""
    li, p = t.lineitem, t.part
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
    category="core",
)
def q22_global_sales_opportunity(spark, t):
    """TPC-H Q22 shape: uncorrelated scalar subquery (global avg) +
    NOT EXISTS anti join (customers with no urgent orders) + grouped agg. (Testdata has no c_phone, so
    the grouping key is market segment rather than country code.)"""
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH link AS (
  SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(l_extendedprice / l_quantity) OVER
           (PARTITION BY l_partkey) AS min_unit,
         l_extendedprice / l_quantity AS unit
  FROM lineitem WHERE l_quantity > 0
)
SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name,
       ROUND(k.unit, 6) AS unit_cost
FROM link k
JOIN part p ON p.p_partkey = k.partkey
JOIN supplier s ON s.s_suppkey = k.suppkey
WHERE k.unit = k.min_unit AND p.p_size <= 3
""",
    category="core",
)
def q2_min_cost_supplier(spark, t):
    """TPC-H Q2 shape: per-part minimum-cost supplier via a
    correlated-minimum (window-min) + join back — the classic
    argmin-per-group pattern (the testdata's partsupp equivalent is
    the lineitem part↔supplier link)."""
    from pyspark.sql import Window as W

    unit = F.col("l_extendedprice") / F.col("l_quantity")
    link = (
        t.lineitem.filter(F.col("l_quantity") > 0)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            unit.alias("unit"),
        )
        .distinct()
        .withColumn(
            "min_unit", F.min("unit").over(W.partitionBy("partkey"))
        )
    )
    return (
        link.filter(F.col("unit") == F.col("min_unit"))
        .join(
            F.broadcast(t.part.filter(F.col("p_size") <= 3)),
            F.col("p_partkey") == F.col("partkey"),
        )
        .join(
            F.broadcast(t.supplier), F.col("s_suppkey") == F.col("suppkey")
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.round("unit", 6).alias("unit_cost"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
""",
    category="core",
)
def q7_volume_shipping(spark, t):
    """TPC-H Q7 shape: 6-way join with a disjunctive cross-table
    predicate and per-year revenue. nation joins broadcast (25
    rows); the lineitem-orders join shuffles on orderkey."""
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "q8_market_share",
    oracle="""
WITH all_rev AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE p_type = 'ECONOMY'
)
SELECT o_year,
       ROUND(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE),
             6) AS mkt_share
FROM all_rev GROUP BY o_year
""",
    category="core",
)
def q8_market_share(spark, t):
    """TPC-H Q8 shape: national market share = conditional share of
    revenue per year over a 5-way join."""
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(t.part.filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    brazil = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return rev.groupBy("o_year").agg(
        F.round(
            F.sum(brazil.cast("decimal(38,6)")).cast("double")
            / F.sum(F.col("volume").cast("decimal(38,6)")).cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - l_quantity * 10.0
                     AS DECIMAL(38,6))) AS DOUBLE) AS profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN part     ON p_partkey = l_partkey
WHERE p_name LIKE '%a%'
GROUP BY n_name, year(o_orderdate)
""",
    category="core",
)
def q9_profit_by_nation_year(spark, t):
    """TPC-H Q9 shape: profit per supplier nation per year (testdata
    has no partsupp/ps_supplycost; unit cost fixed at 10.0)."""
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "l_quantity"
    ) * F.lit(10.0)
    return (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(t.part.filter(F.col("p_name").like("%a%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(profit.cast("decimal(38,6)")).cast("double").alias("profit")
        )
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H shapes (q11/q13/q15/q17/q20/q21), adapted to the
# testdata's simplified schema: there is no partsupp table and no
# l_commitdate/l_receiptdate/comment columns, so each query keeps the
# REFERENCE SHAPE (the operator tree Hive compiles — scalar-subquery
# HAVING, outer-join histogram, view-over-max, correlated-avg filter,
# grouped-IN, EXISTS/NOT-EXISTS pair) over the columns that exist.
# ---------------------------------------------------------------------------


@register(
    "q11_important_stock",
    oracle="""
WITH inv AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS value
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  WHERE s_nationkey = 7
  GROUP BY l_partkey
)
SELECT l_partkey, value FROM inv
WHERE value > (SELECT 0.001 * SUM(value) FROM inv)
""",
    category="core",
)
def q11_important_stock(spark, t):
    """TPC-H Q11 shape: group value per part for one nation's
    suppliers, keep parts above a fraction of the grand total —
    scalar-subquery HAVING (Hive compiles the subquery to a
    map-join against a 1-row reduction; Spark: the grand total is a
    separate 1-row aggregate broadcast-crossed back in — NOT a
    window-over-(), which would funnel every per-part row through a
    single partition at scale)."""
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    inv = (
        t.lineitem.join(
            F.broadcast(t.supplier.filter(F.col("s_nationkey") == 7)),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("_dval"))
    )
    total = inv.agg(F.sum("_dval").alias("_total"))
    return (
        inv.crossJoin(F.broadcast(total))
        .filter(F.col("_dval").cast("double") > 0.001 * F.col("_total").cast("double"))
        .select("l_partkey", F.col("_dval").cast("double").alias("value"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> 'URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count
""",
    category="core",
)
def q13_customer_distribution(spark, t):
    """TPC-H Q13 shape: left-outer join with a join-side filter
    (customers with zero qualifying orders count as c_count=0), then
    a histogram of counts — two shuffles, the second tiny."""
    o = t.orders.filter(F.col("o_orderpriority") != "URGENT")
    per_cust = (
        t.customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    category="core",
)
def q15_top_supplier(spark, t):
    """TPC-H Q15 shape: revenue view → supplier(s) at the max
    (CREATE VIEW + scalar MAX subquery in Hive). The MAX is a 1-row
    aggregate broadcast-crossed against the view (a window-over-()
    would single-partition the per-supplier frame at scale);
    decimal-exact revenue makes the equality against MAX
    deterministic across engines."""
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("_drev")
        )
    )
    mx = rev.agg(F.max("_drev").alias("_mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(F.col("_drev") == F.col("_mx"))
    return (
        F.broadcast(top)
        .join(t.supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("_drev").cast("double").alias("total_revenue")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey AS a_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity)
           AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON a_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_size <= 10
  AND l_quantity < 0.2 * avg_qty
""",
    category="core",
)
def q17_small_quantity_revenue(spark, t):
    """TPC-H Q17 shape: correlated AVG subquery decorrelated into a
    per-part aggregate joined back to lineitem (Hive rewrites the
    correlated subquery the same way). Order matters at scale: the
    part-attribute filter restricts WHICH parts qualify, so lineitem
    is first narrowed to those parts' rows, and the per-part average
    is computed over that narrowed frame — identical values (the
    filter touches only part columns), but the broadcast frame is
    |qualifying parts|, not |all parts| (20M rows at sf100).
    Decimal-exact avg keeps the 0.2×avg comparison boundary
    identical to DuckDB."""
    parts = t.part.filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10))
    li_of_parts = t.lineitem.join(
        F.broadcast(parts.select("p_partkey")),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    pa = li_of_parts.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        davg("l_quantity", "avg_qty")
    )
    return (
        li_of_parts.join(F.broadcast(pa), F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice") / 7.0).alias("avg_yearly")
        )
    )


@register(
    "q20_potential_promotion",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO' AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 50
)
""",
    category="core",
)
def q20_potential_promotion(spark, t):
    """TPC-H Q20 shape: IN over a grouped-HAVING subquery (suppliers
    who moved enough PROMO volume in 1996) → semi join against the
    aggregated set. Hive plans IN-subquery as LEFT SEMI JOIN
    (QBSubQuery.java); Spark does the same, and the aggregate side
    is small → broadcast semi."""
    movers = (
        t.lineitem.join(
            F.broadcast(t.part.filter(F.col("p_type") == "PROMO")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return t.supplier.join(
        F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "q21_waiting_supplier",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND s_nationkey = 3
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
    category="core",
)
def q21_waiting_supplier(spark, t):
    """TPC-H Q21 shape: the EXISTS / NOT-EXISTS pair over the same
    fact table (the supplier solely responsible for a returned item
    in a finalized multi-supplier order). Hive compiles these to a
    semi and an anti join on (orderkey, suppkey≠) — so does this
    plan, explicitly; at scale all three lineitem legs co-shuffle on
    l_orderkey, so AQE folds them into one exchange."""
    l1 = (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            t.orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = t.lineitem.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            F.broadcast(t.supplier.filter(F.col("s_nationkey") == 3)),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
