"""Aggregation depth — GroupByOperator surface (SURVEY.md §2.5).

Reference: ``ql/.../exec/GroupByOperator.java:73`` (hash + sort agg,
partial/final modes ``ql/plan/GroupByDesc.java:38-55``), grouping-set
bitset expansion (``GroupByOperator.java:127-211``), DISTINCT via
union-tag encoding in ReduceSink (``ReduceSinkOperator.java:131-136``),
UDAF registrations ``exec/FunctionRegistry.java:364-392``.

Spark does partial/final automatically (map-side combine before the
shuffle — at 100 TB the shuffle carries |groups| rows per partition,
not the raw data). Grouping sets are Catalyst ``Expand`` nodes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import dsum
from .registry import register


@register(
    "agg_minmax_suite",
    oracle="""
SELECT l_returnflag,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
       MIN(l_shipdate) AS min_shipdate, MAX(l_shipdate) AS max_shipdate,
       MIN(l_linestatus) AS min_status,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_minmax_suite(spark, t):
    """min/max over numeric, timestamp, string (FunctionRegistry
    :364-365) — order statistics are exact, no float-sum issues."""
    return t.lineitem.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.min("l_linestatus").alias("min_status"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_distinct_multi",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS nd_parts,
       COUNT(DISTINCT l_suppkey) AS nd_supps,
       COUNT(DISTINCT l_orderkey) AS nd_orders,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_distinct_multi(spark, t):
    """Multi-DISTINCT in one aggregate — Hive's union-tag encoding
    (ReduceSinkOperator.java:131-136) → Catalyst Expand rewrite."""
    return t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_parts"),
        F.countDistinct("l_suppkey").alias("nd_supps"),
        F.countDistinct("l_orderkey").alias("nd_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup",
    oracle="""
SELECT c_mktsegment, c_nationkey,
       COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
FROM customer
GROUP BY ROLLUP (c_mktsegment, c_nationkey)
""",
    category="aggregates",
)
def agg_rollup(spark, t):
    """ROLLUP (HiveLexer.g:268; bitset expansion
    GroupByOperator.java:127-211) → df.rollup."""
    return t.customer.rollup("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n"), dsum("c_acctbal", "sum_bal")
    )


@register(
    "agg_cube_grouping_id",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    category="aggregates",
)
def agg_cube_grouping_id(spark, t):
    """CUBE + GROUPING__ID virtual column
    (metadata/VirtualColumn.java:65) → df.cube + F.grouping_id.

    Expand(4×) + decimal accumulators make the partial phase
    CPU-bound like q1 — re-split under-split scans only
    (0.92s→0.62s at sf0.1; no-op on a many-split warehouse scan)."""
    from ..operators.util import ensure_parallelism

    return ensure_parallelism(t.lineitem).cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sum_qty"),
    )


@register(
    "agg_grouping_id_legacy",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST((1 - GROUPING(l_returnflag)) * 1
            + (1 - GROUPING(l_linestatus)) * 2 AS INTEGER)
         AS grouping__id,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    category="aggregates",
)
def agg_grouping_id_legacy(spark, t):
    """HIVE 1.2 ``GROUPING__ID`` bit semantics — the LEGACY encoding
    the reference actually computes, which is inverted AND reversed
    vs the modern SQL standard (and vs Spark's ``grouping_id()``):
    bit j is SET when the j-th grouping column IS INCLUDED in the
    grouping set, with the FIRST column at the LEAST significant bit
    (``SemanticAnalyzer.java:3503`` ``setBit(bitmap, pos)`` building
    the set id; ``GroupByOperator.groupingSet2BitSet:169`` reading it
    back; Hive changed to the standard encoding only in 2.3 /
    HIVE-12833). For ``GROUP BY a,b WITH CUBE``: (a,b)→3, (a)→1,
    (b)→2, ()→0 — the exact inverse-reverse of Spark's 0/1/2/3. A
    migration that reads GROUPING__ID-filtering queries needs this
    mapping, re-derived here from per-column ``grouping()`` bits:
    ``sum_j (1 − grouping(col_j)) · 2^j``."""
    g = lambda c: 1 - F.grouping(c)  # noqa: E731 — included-bit
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            (g("l_returnflag") * 1 + g("l_linestatus") * 2)
            .cast("int")
            .alias("grouping__id"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "grouping__id", "n")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    category="aggregates",
)
def agg_grouping_sets(spark, t):
    """Explicit GROUPING SETS (HiveLexer.g:282) via Spark SQL."""
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
""",
    category="aggregates",
)
def agg_having(spark, t):
    """HAVING = post-aggregation FilterOperator (SemanticAnalyzer
    genHavingPlan) → filter over agg output."""
    return (
        t.orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "agg_stats_suite",
    oracle="""
SELECT l_returnflag,
       ROUND(STDDEV_POP(l_quantity), 4)  AS sd_pop_qty,
       ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_samp_qty,
       ROUND(VAR_POP(l_quantity), 4)     AS var_pop_qty,
       ROUND(VAR_SAMP(l_quantity), 4)    AS var_samp_qty,
       ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       ROUND(COVAR_POP(l_quantity, l_extendedprice), 2) AS covar_pop_qp,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_samp_qp
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_stats_suite(spark, t):
    """Statistical UDAFs (FunctionRegistry.java:370-379). Rounded —
    variance algorithms are numerically equivalent, not bit-equal."""
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_pop(q), 4).alias("sd_pop_qty"),
        F.round(F.stddev_samp(q), 4).alias("sd_samp_qty"),
        F.round(F.var_pop(q), 4).alias("var_pop_qty"),
        F.round(F.var_samp(q), 4).alias("var_samp_qty"),
        F.round(F.corr(q, p), 4).alias("corr_qty_price"),
        F.round(F.covar_pop(q, p), 2).alias("covar_pop_qp"),
        F.round(F.covar_samp(q, p), 2).alias("covar_samp_qp"),
    )


@register(
    "agg_collect",
    oracle="""
SELECT o_orderpriority,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderstatus)), ',') AS statuses,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
""",
    category="aggregates",
)
def agg_collect(spark, t):
    """collect_set (FunctionRegistry.java:382) — serialized sorted so
    the result is deterministic under any partitioning."""
    return t.orders.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_percentile",
    oracle="""
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS p50_qty,
       ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90_qty,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS p95_price
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_percentile(spark, t):
    """Exact interpolated percentile (UDAFPercentile.java,
    FunctionRegistry.java:392) → F.percentile ≡ DuckDB quantile_cont."""
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", 0.9), 4).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95_price"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv_parts_exact,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS within_5pct
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_approx_distinct(spark, t):
    """approx_count_distinct — Hive's compute_stats NDV sketch
    (NumDistinctValueEstimator.java:28) → HyperLogLog++. The raw
    estimate is engine-specific, so the oracle checks the exact NDV
    plus a 5%-relative-error bound on the estimate (HLL++ default rsd
    = 0.05, and the error at these cardinalities is far below it)."""
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("est"),
            F.countDistinct("l_partkey").alias("ndv_parts_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "ndv_parts_exact",
            "n_rows",
            (
                F.abs(F.col("est") - F.col("ndv_parts_exact"))
                / F.col("ndv_parts_exact")
                <= 0.05
            ).alias("within_5pct"),
        )
    )


@register(
    "agg_salted_skew",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_salted_skew(spark, t):
    """Skew-proof two-phase aggregation (salt -> partial -> de-salt;
    Hive hive.groupby.skewindata 2MR plan,
    SemanticAnalyzer.java:5571): byte-identical result to the direct
    groupBy, different shuffle layout. l_returnflag has only 3 values
    — exactly the hot-key shape salting exists for."""
    from ..operators.skew import salted_sum_count

    return salted_sum_count(
        t.lineitem, ["l_returnflag"], F.col("l_quantity"), n_salts=32
    )


@register(
    "agg_bitmap_index",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS ndv_bitmap,
       count(DISTINCT CASE WHEN l_quantity >= 25 THEN l_suppkey END)
         AS ndv_heavy
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_bitmap_index(spark, t):
    """Bitmap-index aggregation — closes §2.5's last row (reference
    ``udf/generic/GenericUDAFEWAHBitmap.java`` + ``GenericUDFEWAHBitmapOr``
    building compressed bitmaps of row positions). Spark's native
    twins: ``bitmap_construct_agg(bitmap_bit_position(k))`` builds the
    per-group bitmap, ``bitmap_or_agg`` merges sub-bitmaps (the
    bitmap_or role), ``bitmap_count`` reads cardinality. Two-level
    build here: per-(returnflag, linestatus) bitmaps OR-merged up to
    returnflag — the exact shape Hive's bitmap-index queries compose.
    Distinct-count over the merged bitmaps is the checkable fact the
    oracle restates as COUNT(DISTINCT). Bitmaps are PER-BUCKET
    (bitmap_bucket_number is a group key — keys 0 and 32768 occupy
    different buckets at the same bit position, so a bucket-less
    bitmap conflates them; l_suppkey starts at 0, which lives in
    bucket 0 alone), then per-bucket cardinalities sum — exactly how
    a bitmap index scales to arbitrary key ranges."""
    li = t.lineitem
    bucket = F.expr("bitmap_bucket_number(l_suppkey)").alias("bkt")
    sub = li.groupBy("l_returnflag", "l_linestatus", bucket).agg(
        F.expr(
            "bitmap_construct_agg(bitmap_bit_position(l_suppkey))"
        ).alias("bm_all"),
        F.expr(
            "bitmap_construct_agg(bitmap_bit_position("
            "CASE WHEN l_quantity >= 25 THEN l_suppkey END))"
        ).alias("bm_heavy"),
    )
    merged = sub.groupBy("l_returnflag", "bkt").agg(
        F.expr("bitmap_count(bitmap_or_agg(bm_all))").alias("c_all"),
        F.expr("bitmap_count(bitmap_or_agg(bm_heavy))").alias("c_heavy"),
    )
    return merged.groupBy("l_returnflag").agg(
        F.sum("c_all").alias("ndv_bitmap"),
        F.sum("c_heavy").alias("ndv_heavy"),
    )


@register(
    "agg_mode_deterministic",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
ranked AS (
  SELECT o_orderstatus, o_orderpriority, c,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY c DESC, o_orderpriority) AS rk
  FROM counts
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, c AS mode_count
FROM ranked WHERE rk = 1
""",
    category="aggregates",
)
def agg_mode_deterministic(spark, t):
    """MODE (most frequent value) with a DETERMINISTIC tie-break —
    neither Hive 1.2 nor standard SQL defines which value wins a
    frequency tie (Spark's mode() and DuckDB's mode() both pick
    arbitrarily, which can never hash-match), so the portable idiom
    is count + row_number ordered by (count DESC, value): one keyed
    aggregate + a window over the tiny per-group count table — the
    heavy lifting is the map-side-combined count, the window touches
    |groups|x|values| rows only."""
    counts = t.orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("c").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("c").alias("mode_count"),
        )
    )
