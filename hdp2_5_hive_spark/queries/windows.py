"""Window functions — the PTF operator surface (SURVEY.md §2.6).

Reference: ``ql/.../exec/PTFOperator.java:47`` drives
``udf/ptf/WindowingTableFunction.java``; functions registered at
``FunctionRegistry.java:442-454``; frame model
``parse/WindowingSpec.java`` (ROWS/RANGE, PRECEDING/FOLLOWING,
default ROWS UNBOUNDED PRECEDING..CURRENT ROW).

Spark's Window spills per-partition like Hive's PTFRowContainer
(``exec/persistence/PTFRowContainer.java:82``); partitioning the
window by a real key keeps every partition bounded at 100 TB.

Determinism rule: every ORDER BY inside a window ends with a unique
tie-break key so row_number/ntile/frames agree across engines.
Window SUM over doubles goes through the DECIMAL accumulator.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import register

_DEC = "decimal(38,6)"


@register(
    "win_ranking",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       ROW_NUMBER()  OVER w AS rn,
       RANK()        OVER w AS rnk,
       DENSE_RANK()  OVER w AS drnk
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
    category="windows",
)
def win_ranking(spark, t):
    """row_number/rank/dense_rank (FunctionRegistry.java:445-447)."""
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return t.customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_lead_lag",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice)     OVER w AS prev_price,
       LEAD(o_totalprice)    OVER w AS next_price,
       LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    category="windows",
)
def win_lead_lag(spark, t):
    """lead/lag incl. offset+default (FunctionRegistry.java:442-443,
    453-454)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    )


@register(
    "win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS running_n
FROM orders
""",
    category="windows",
)
def win_running_sum(spark, t):
    """Cumulative ROWS frame — Hive's default aggregate frame
    (WindowingSpec.java:201-246); decimal accumulator for exactness."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias(
            "running_spend"
        ),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "win_moving_avg",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS mov_avg_3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    category="windows",
)
def win_moving_avg(spark, t):
    """Sliding ROWS frame (RangeBoundarySpec) — 3-row moving average
    as exact-sum / count so both engines agree bit-for-bit."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    s = F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    return t.orders.select(
        "o_custkey", "o_orderkey", (s / n).alias("mov_avg_3")
    )


@register(
    "win_range_frame",
    oracle="""
SELECT s_suppkey, s_acctbal,
       COUNT(*) OVER (ORDER BY s_acctbal
                      RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS n_within_500
FROM supplier
""",
    category="windows",
)
def win_range_frame(spark, t):
    """Value-based RANGE frame (ValueBoundarySpec,
    WindowingSpec.java:536-540): peers counted by value distance."""
    w = W.orderBy("s_acctbal").rangeBetween(-500, W.currentRow)
    return t.supplier.select(
        "s_suppkey",
        "s_acctbal",
        F.count(F.lit(1)).over(w).alias("n_within_500"),
    )


@register(
    "win_ntile_cumedist",
    oracle="""
SELECT c_custkey,
       NTILE(4)       OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST()    OVER w, 6) AS cdist
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
    category="windows",
)
def win_ntile_cumedist(spark, t):
    """ntile/percent_rank/cume_dist (FunctionRegistry.java:448-450);
    unique tie-break (custkey) keeps ntile deterministic."""
    w = W.orderBy("c_acctbal", "c_custkey")
    return t.customer.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "win_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice)  OVER w AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    category="windows",
)
def win_first_last(spark, t):
    """first_value/last_value (FunctionRegistry.java:451-452) with an
    explicit full frame — Hive's last_value default-frame subtlety
    (SURVEY.md §2.6) is avoided by pinning UNBOUNDED..UNBOUNDED."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "win_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
""",
    category="windows",
)
def win_topk_per_group(spark, t):
    """Top-k per group — the reference does this with PTF windowing;
    Spark pushes the rank filter into the window sort."""
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_agg_over",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
            OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_qty,
       MAX(l_quantity) OVER (PARTITION BY l_orderkey) AS max_line_qty
FROM lineitem
WHERE l_orderkey < 1000
""",
    category="windows",
)
def win_agg_over(spark, t):
    """Any UDAF OVER a partition-only window (no ORDER BY → whole
    partition frame), Hive 'UDAF OVER' form (SURVEY.md §2.6)."""
    w = W.partitionBy("l_orderkey")
    li = t.lineitem.filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.sum(F.col("l_quantity").cast(_DEC)).over(w).cast("double").alias("order_qty"),
        F.max("l_quantity").over(w).alias("max_line_qty"),
    )


@register(
    "win_moving_median",
    oracle="""
SELECT user_id, event_id,
       CAST(median(CAST(value AS DOUBLE)) OVER (
         PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS med6
FROM events
""",
    category="windows",
)
def win_moving_median(spark, t):
    """Moving MEDIAN over a row frame — a full UDAF (Hive
    ``GenericUDAFPercentile``) running as a window function
    (PTFOperator drives arbitrary UDAFs over frames, §2.6 'UDAF over
    window'), and the robust-smoothing idiom time-series cleaning
    uses where a moving mean would chase outliers. Spark evaluates
    ``percentile(v, 0.5)`` per frame; DuckDB's windowed ``median``
    (quantile_cont) interpolates identically, so doubles match
    exactly. event_id breaks ts ties so the frame contents are
    deterministic on both engines."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-5, 0)
    )
    return t.events.select(
        "user_id",
        "event_id",
        F.expr("percentile(CAST(value AS DOUBLE), 0.5)")
        .over(w)
        .cast("double")
        .alias("med6"),
    )


@register(
    "win_cumulative_distinct",
    oracle="""
SELECT user_id, event_id,
       CAST(count(DISTINCT event_type) OVER (
         PARTITION BY user_id
         ORDER BY CAST(ts AS TIMESTAMP), event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
FROM events
""",
    category="windows",
)
def win_cumulative_distinct(spark, t):
    """Cumulative DISTINCT count over an expanding window — "how
    many distinct event types has this user produced so far" (the
    engagement-breadth signal). Neither Hive 1.2 nor Spark supports
    DISTINCT aggregates over windows directly; the standard rewrite
    is ``size(collect_set(x)) OVER`` — exact because the per-user
    type cardinality is tiny and bounded, so the running set state
    stays bytes-sized however long the history (at true high
    cardinality the HLL sketch in operators/sketches is the scale
    path). DuckDB's native windowed COUNT(DISTINCT) is the oracle.
    event_id tie-breaks equal timestamps deterministically."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.events.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("n_types_seen"),
    )
