"""Scalar/window breadth, part 3 (round 6): nested JSON paths,
string-function edge semantics, IGNORE NULLS window forms.

Reference anchors: ``udf/generic/GenericUDFJsonObject`` family via
``FunctionRegistry.java`` (get_json_object), ``GenericUDFSubstringIndex``
/ ``UDFRepeat`` / ``UDFSpace`` / ``GenericUDFLpad`` (string tail),
``GenericUDAFFirstValue.java`` skipNulls (windowing spec
``PTFTranslator``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "fn_json_path_suite",
    oracle="""
WITH j AS (
  SELECT o_orderkey,
         '{"id": ' || o_orderkey || ', "cust": {"key": ' || o_custkey
           || ', "seg": "' || o_orderpriority || '"}, "items": [{"qty": '
           || (o_orderkey % 7) || '}, {"qty": ' || (o_orderkey % 11)
           || '}]}' AS doc
  FROM orders WHERE o_orderkey <= 1000
)
SELECT o_orderkey,
       json_extract_string(doc, '$.cust.key') AS cust_key,
       json_extract_string(doc, '$.cust.seg') AS seg,
       json_extract_string(doc, '$.items[1].qty') AS second_qty,
       json_extract_string(doc, '$.missing.path') AS nothing,
       json_extract_string(doc, '$.items') AS items_json
FROM j
""",
    category="scalars",
)
def fn_json_path_suite(spark, t):
    """get_json_object with NESTED paths — object steps, array
    indexing, a whole-subtree extraction, and a missing path
    (reference ``udf/UDFJson.java`` get_json_object, qfile
    ``clientpositive/udf_get_json_object.q``). The JSON is
    template-built from order columns so the oracle can build the
    identical document and extract with DuckDB's json_extract_string.
    Both engines return NULL for missing paths and the compact JSON
    text for subtree extraction."""
    o = t.orders.filter(F.col("o_orderkey") <= 1000)
    doc = F.concat(
        F.lit('{"id": '),
        F.col("o_orderkey").cast("string"),
        F.lit(', "cust": {"key": '),
        F.col("o_custkey").cast("string"),
        F.lit(', "seg": "'),
        F.col("o_orderpriority"),
        F.lit('"}, "items": [{"qty": '),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit('}, {"qty": '),
        (F.col("o_orderkey") % 11).cast("string"),
        F.lit("}]}"),
    )
    return o.select(
        "o_orderkey",
        F.get_json_object(doc, "$.cust.key").alias("cust_key"),
        F.get_json_object(doc, "$.cust.seg").alias("seg"),
        F.get_json_object(doc, "$.items[1].qty").alias("second_qty"),
        F.get_json_object(doc, "$.missing.path").alias("nothing"),
        F.get_json_object(doc, "$.items").alias("items_json"),
    )


@register(
    "fn_string_edge_cases",
    oracle="""
SELECT n_nationkey,
       array_to_string(string_split(n_name, 'A')[1:2], 'A') AS si_pos,
       array_to_string(string_split(n_name, 'A')[-1:], 'A') AS si_neg,
       CASE WHEN 3 > length(n_name) THEN 0
            WHEN position('A' IN substr(n_name, 3)) = 0 THEN 0
            ELSE position('A' IN substr(n_name, 3)) + 2 END AS loc_from_3,
       position('N' IN n_name) AS instr_n,
       repeat(substr(n_name, 1, 2), 3) AS rep3,
       repeat(' ', 4) || '|' AS spaced,
       substr('KEY:' || n_name, 1, 3) AS lpad_trunc,
       lpad(substr(n_name, 1, 3), 8, '*') AS lpad_fill,
       translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels,
       reverse(n_name) AS rev
FROM nation
""",
    category="scalars",
)
def fn_string_edge_cases(spark, t):
    """String-function edge semantics (§2.9 tail): substring_index
    with positive AND negative counts (``GenericUDFSubstringIndex``),
    locate with a start position (``UDFLocate`` 3-arg — DuckDB has no
    start argument, so the oracle shifts a substring search), instr,
    repeat/space (``UDFRepeat``/``UDFSpace``), lpad TRUNCATION when
    the input is longer than n (lpad('KEY:...', 3) keeps the first 3
    chars — spelled as substr in the oracle) plus the fill case, and
    translate/reverse. Nation names are uppercase A-Z and spaces, so
    every delimiter case is exercised deterministically."""
    n = t.nation
    name = F.col("n_name")
    return n.select(
        "n_nationkey",
        F.substring_index(name, "A", 2).alias("si_pos"),
        F.substring_index(name, "A", -1).alias("si_neg"),
        F.locate("A", name, 3).alias("loc_from_3"),
        F.instr(name, "N").alias("instr_n"),
        F.repeat(F.substring(name, 1, 2), 3).alias("rep3"),
        F.concat(F.expr("space(4)"), F.lit("|")).alias("spaced"),
        F.lpad(F.concat(F.lit("KEY:"), name), 3, "*").alias("lpad_trunc"),
        F.lpad(F.substring(name, 1, 3), 8, "*").alias("lpad_fill"),
        F.translate(name, "AEIOU", "aeiou").alias("lowered_vowels"),
        F.reverse(name).alias("rev"),
    )


@register(
    "win_first_last_ignore_nulls",
    oracle="""
WITH src AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS clerk
  FROM orders WHERE o_custkey <= 200
)
SELECT o_orderkey, o_custkey, clerk,
       first_value(clerk IGNORE NULLS) OVER w AS first_known,
       last_value(clerk IGNORE NULLS) OVER w AS last_known,
       lag(clerk IGNORE NULLS) OVER w2 AS prev_known,
       lead(clerk IGNORE NULLS) OVER w2 AS next_known
FROM src
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey)
""",
    category="windows",
)
def win_first_last_ignore_nulls(spark, t):
    """FIRST_VALUE/LAST_VALUE/LEAD/LAG with IGNORE NULLS (reference
    ``udaf/generic/GenericUDAFFirstValue.java`` skipNulls=true via
    the windowing spec ``(clerk, true)``; qfile
    ``clientpositive/windowing_navfn.q``). A third of the priority strings are
    nulled out; navigation functions must skip them, not return
    them. Spark keeps Hive's ``IGNORE NULLS`` grammar for all four
    (SQL-text form here — the DSL exposes the flag only for
    first/last); DuckDB's identical syntax states the oracle."""
    t.orders
    return spark.sql(
        """
        WITH src AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN NULL
                      ELSE o_orderpriority END AS clerk
          FROM orders WHERE o_custkey <= 200
        )
        SELECT o_orderkey, o_custkey, clerk,
               first_value(clerk) IGNORE NULLS OVER w AS first_known,
               last_value(clerk) IGNORE NULLS OVER w AS last_known,
               lag(clerk) IGNORE NULLS OVER w2 AS prev_known,
               lead(clerk) IGNORE NULLS OVER w2 AS next_known
        FROM src
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        """
    )
