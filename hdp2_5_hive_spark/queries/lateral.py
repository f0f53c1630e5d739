"""UDTFs, lateral views, JSON access (SURVEY.md §2.11-2.12).

Reference: UDTF runtime ``exec/UDTFOperator.java:44``, LATERAL VIEW
duplication/join ``exec/LateralViewForwardOperator.java:35`` +
``LateralViewJoinOperator.java:77``; built-in UDTFs explode/posexplode/
inline/stack/json_tuple registered ``FunctionRegistry.java:434-439``;
``get_json_object:287``; ``str_to_map:260``.

Spark generator expressions run inside codegen — each exploded row
never leaves the JVM, so a 100 TB explode is a map-only stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "explode_words",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (
  SELECT UNNEST(STRING_SPLIT(SUBSTR(text, 1, 200), ' ')) AS word
  FROM documents WHERE doc_id < 100
)
WHERE word <> ''
GROUP BY word
""",
    category="lateral",
)
def explode_words(spark, t):
    """LATERAL VIEW explode(split(...)) — word count over documents
    (GenericUDTFExplode.java:43)."""
    d = t.documents.filter(F.col("doc_id") < 100)
    return (
        d.select(F.explode(F.split(F.substring("text", 1, 200), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "posexplode_array",
    oracle="""
SELECT n_nationkey, z[1] AS pos, z[2] AS val
FROM (
  SELECT n_nationkey,
         UNNEST(LIST_ZIP([0,1,2], [n_name, UPPER(n_name), CAST(n_regionkey AS VARCHAR)])) AS z
  FROM nation
)
""",
    category="lateral",
)
def posexplode_array(spark, t):
    """posexplode (FunctionRegistry.java:438) — element + ordinal.
    DuckDB lacks WITH ORDINALITY; the oracle zips an index list."""
    arr = F.array(
        F.col("n_name"),
        F.upper("n_name"),
        F.col("n_regionkey").cast("string"),
    )
    return t.nation.select(
        "n_nationkey", F.posexplode(arr).alias("pos", "val")
    )


@register(
    "explode_outer_empty",
    oracle="""
SELECT c_custkey, o
FROM (
  SELECT c_custkey,
         CASE WHEN c_acctbal > 9900 THEN CAST([] AS BIGINT[])
              ELSE [c_nationkey, c_nationkey + 100] END AS arr
  FROM customer WHERE c_custkey < 200
) LEFT JOIN LATERAL (SELECT UNNEST(arr) AS o) ON TRUE
""",
    category="lateral",
)
def explode_outer_empty(spark, t):
    """LATERAL VIEW OUTER (HiveLexer.g:254): empty arrays still emit
    the source row with NULL — explode_outer."""
    c = t.customer.filter(F.col("c_custkey") < 200)
    arr = F.when(
        F.col("c_acctbal") > 9900, F.array().cast("array<bigint>")
    ).otherwise(
        F.array(
            F.col("c_nationkey").cast("bigint"),
            (F.col("c_nationkey") + 100).cast("bigint"),
        )
    )
    return c.select("c_custkey", F.explode_outer(arr).alias("o"))


@register(
    "stack_rows",
    oracle="""
SELECT r_regionkey, metric, val FROM (
  SELECT r_regionkey, 'key_x10' AS metric, CAST(r_regionkey * 10 AS BIGINT) AS val FROM region
  UNION ALL
  SELECT r_regionkey, 'key_sq', CAST(r_regionkey * r_regionkey AS BIGINT) FROM region
)
""",
    category="lateral",
)
def stack_rows(spark, t):
    """stack UDTF (FunctionRegistry.java:439) — unpivot to rows."""
    return t.region.select(
        "r_regionkey",
        F.expr(
            "stack(2, 'key_x10', CAST(r_regionkey*10 AS BIGINT),"
            " 'key_sq', CAST(r_regionkey*r_regionkey AS BIGINT))"
        ).alias("metric", "val"),
    )


@register(
    "inline_structs",
    oracle="""
SELECT n_nationkey, s.a AS a, s.b AS b FROM (
  SELECT n_nationkey,
         UNNEST([{'a': n_name, 'b': n_regionkey}, {'a': 'x', 'b': n_nationkey}]) AS s
  FROM nation WHERE n_nationkey < 5
)
""",
    category="lateral",
)
def inline_structs(spark, t):
    """inline(array<struct>) UDTF (FunctionRegistry.java:435)."""
    n = t.nation.filter(F.col("n_nationkey") < 5)
    arr = F.array(
        F.struct(F.col("n_name").alias("a"), F.col("n_regionkey").alias("b")),
        F.struct(F.lit("x").alias("a"), F.col("n_nationkey").alias("b")),
    )
    return n.select("n_nationkey", F.inline(arr))


@register(
    "json_extract",
    oracle="""
SELECT event_id,
       JSON_EXTRACT_STRING(props, '$.k')            AS k_str,
       TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_num,
       JSON_EXTRACT_STRING(props, '$.missing')      AS missing
FROM events WHERE event_id < 500
""",
    category="lateral",
)
def json_extract(spark, t):
    """get_json_object (FunctionRegistry.java:287) over the events
    JSON payload column."""
    e = t.events.filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@register(
    "json_tuple_fields",
    oracle="""
SELECT event_id,
       JSON_EXTRACT_STRING(props, '$.k') AS k
FROM events WHERE event_id < 300
""",
    category="lateral",
)
def json_tuple_fields(spark, t):
    """json_tuple UDTF (FunctionRegistry.java:436) via LATERAL VIEW."""
    e = t.events.filter(F.col("event_id") < 300)
    e.createOrReplaceTempView("events_jt")
    return spark.sql(
        """
        SELECT event_id, jt.k
        FROM events_jt LATERAL VIEW json_tuple(props, 'k') jt AS k
        """
    )


@register(
    "str_to_map_access",
    oracle="""
SELECT n_nationkey,
       REGEXP_EXTRACT(kv, 'a:([^,]*)', 1) AS a_val,
       REGEXP_EXTRACT(kv, 'k:([^,]*)', 1) AS k_val
FROM (SELECT n_nationkey,
             'a:' || CAST(n_regionkey AS VARCHAR) || ',k:' || n_name AS kv
      FROM nation)
""",
    category="lateral",
)
def str_to_map_access(spark, t):
    """str_to_map (FunctionRegistry.java:260) — parse k:v pairs then
    index the map."""
    kv = F.concat(
        F.lit("a:"), F.col("n_regionkey").cast("string"), F.lit(",k:"), F.col("n_name")
    )
    m = F.str_to_map(kv, F.lit(","), F.lit(":"))
    return t.nation.select(
        "n_nationkey",
        m.getItem("a").alias("a_val"),
        m.getItem("k").alias("k_val"),
    )


@register(
    "parse_url_parts",
    oracle="""
SELECT doc_id,
       'https://example.com/docs/' || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url,
       'example.com' AS host,
       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
       'lang=' || lang AS query,
       lang AS lang_param
FROM documents WHERE doc_id < 50
""",
    category="lateral",
)
def parse_url_parts(spark, t):
    """parse_url / parse_url_tuple (FunctionRegistry.java:257,437):
    HOST/PATH/QUERY + named query param."""
    d = t.documents.filter(F.col("doc_id") < 50)
    url = F.concat(
        F.lit("https://example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "explode_map_kv",
    oracle="""
SELECT n_nationkey, 'name' AS k, n_name AS v FROM nation
UNION ALL
SELECT n_nationkey, 'region' AS k, CAST(n_regionkey AS VARCHAR) AS v
FROM nation
""",
    category="lateral",
)
def explode_map_kv(spark, t):
    """Hive's two-column ``explode(MAP)`` UDTF form
    (``GenericUDTFExplode.java`` — map input yields (key, value)
    pairs, the shape behind ``LATERAL VIEW explode(properties)``):
    each nation row becomes one row per map entry. The oracle states
    the same relation as a UNION of the entries — the map explode
    never leaves the JVM."""
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return t.nation.select(
        "n_nationkey", F.explode(m).alias("k", "v")
    )
