"""UDF / UDAF / UDTF / PTF / TRANSFORM extension queries (§2.12).

Each query exercises one extension mechanism end-to-end with a DuckDB
oracle that encodes the same semantics in plain SQL. Float outputs
are rounded to 6 decimals on both sides: pandas group aggregation
order is not guaranteed, so last-ulp drift is masked exactly as the
reference's golden files print rounded values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import extensions as ext
from .registry import register


@register(
    "udf_python_scalar",
    oracle="""
SELECT CASE WHEN split_part(o_orderpriority, '-', 1) IN ('1','2')
            THEN 'urgent' ELSE 'normal' END AS bucket,
       COUNT(*) AS n
FROM orders GROUP BY 1
""",
    category="extensions",
)
def udf_python_scalar(spark, t):
    """Row-at-a-time Python UDF (UDF.java analogue) — the documented
    slow path; grouped so output stays small."""
    return (
        t.orders.select(ext.py_priority_bucket("o_orderpriority").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "udf_pandas_charge",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge
FROM lineitem GROUP BY l_returnflag
""",
    category="extensions",
)
def udf_pandas_charge(spark, t):
    """Arrow-vectorized pandas UDF (GenericUDF fast path); the sum
    routes through DECIMAL(38,6) for order-independent totals."""
    charge = ext.pd_charge(
        F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    )
    return t.lineitem.groupBy("l_returnflag").agg(
        F.sum(charge.cast("decimal(38,6)")).cast("double").alias("sum_charge")
    )


@register(
    "udaf_pandas_weighted_avg",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_discount * l_quantity) / SUM(l_quantity), 6) AS wavg_discount
FROM lineitem GROUP BY l_returnflag
""",
    category="extensions",
)
def udaf_pandas_weighted_avg(spark, t):
    """GROUPED_AGG pandas UDAF (GenericUDAFEvaluator.java:44
    analogue): quantity-weighted mean discount per return flag."""
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(
            ext.pd_weighted_avg(F.col("l_discount"), F.col("l_quantity")), 6
        ).alias("wavg_discount")
    )


@register(
    "ptf_zscore_groups",
    oracle="""
SELECT o_orderkey,
       ROUND((o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_orderpriority))
             / STDDEV_POP(o_totalprice) OVER (PARTITION BY o_orderpriority),
             6) AS zscore
FROM orders
""",
    category="extensions",
)
def ptf_zscore_groups(spark, t):
    """PTF whole-partition function via applyInPandas
    (TableFunctionResolver analogue): z-score within priority class."""
    z = ext.zscore_per_group(t.orders, "o_orderpriority", "o_totalprice")
    return z.select("o_orderkey", F.round("zscore", 6).alias("zscore"))


@register(
    "udtf_word_stream",
    oracle="""
SELECT doc_id, w AS word, COUNT(*) AS n
FROM documents,
     UNNEST(list_filter(string_split_regex(lower(text), '\\s+'),
                        x -> x <> '')) AS u(w)
GROUP BY doc_id, w
""",
    category="extensions",
)
def udtf_word_stream(spark, t):
    """GenericUDTF analogue: mapInPandas generator emitting one row
    per token, re-aggregated to word counts per document."""
    words = ext.explode_words_udtf(t.documents, "doc_id", "text")
    return words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("n"))


@register(
    "transform_script",
    oracle="""
SELECT CAST(n_nationkey AS VARCHAR) AS k, upper(n_name) AS name_up
FROM nation
""",
    category="extensions",
)
def transform_script(spark, t):
    """TRANSFORM ... USING (ScriptOperator.java:64): pipe rows through
    an external command; tr uppercases the name column. Output
    columns are strings, as in Hive's default script SerDe."""
    return ext.transform_using(
        t.nation.select("n_nationkey", "n_name"),
        "nation_for_transform",
        "n_nationkey, n_name",
        "tr a-z A-Z",
        "k string, name_up string",
    )
