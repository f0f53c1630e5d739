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


@register(
    "fn_trig_inverse",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(asin(l_discount), 6) AS asn,
       ROUND(acos(l_discount), 6) AS acs,
       ROUND(atan2(l_quantity, l_discount + 1), 6) AS at2,
       ROUND(tan(l_discount), 6) AS tn,
       ROUND((exp(l_discount) - exp(-l_discount)) / 2, 6) AS snh,
       ROUND((exp(l_discount) + exp(-l_discount)) / 2, 6) AS csh,
       ROUND((exp(2 * l_discount) - 1) / (exp(2 * l_discount) + 1), 6)
         AS tnh
FROM lineitem WHERE l_orderkey < 300
""",
    category="scalars",
)
def fn_trig_inverse(spark, t):
    """Inverse-trig + hyperbolic tail of the math registry
    (FunctionRegistry.java:198-205 asin/acos/atan2/tan; sinh/cosh/
    tanh registered alongside). l_discount ∈ [0, 0.1] keeps every
    input in-domain; 6-decimal rounding pins libm differences; the
    oracle states the hyperbolics via exp identities (engine-neutral
    definitions)."""
    li = t.lineitem.filter(F.col("l_orderkey") < 300)
    d, q = F.col("l_discount"), F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.asin(d), 6).alias("asn"),
        F.round(F.acos(d), 6).alias("acs"),
        F.round(F.atan2(q, d + 1), 6).alias("at2"),
        F.round(F.tan(d), 6).alias("tn"),
        F.round(F.sinh(d), 6).alias("snh"),
        F.round(F.cosh(d), 6).alias("csh"),
        F.round(F.tanh(d), 6).alias("tnh"),
    )


@register(
    "win_nth_value_ntile",
    oracle="""
SELECT o_custkey, o_orderkey,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
           ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_order,
       ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS quartile,
       CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
FROM orders WHERE o_custkey <= 300
""",
    category="windows",
)
def win_nth_value_ntile(spark, t):
    """nth_value (running frame — NULL until the nth row arrives)
    beside ntile and a partition-wide count (reference windowing
    spec ``PTFTranslator``/``GenericUDAFNTile.java``; nth_value is
    the beyond-1.2 navigation fn Spark and DuckDB share). Running
    2nd-order-per-customer is the classic second-purchase analysis."""
    from pyspark.sql import Window as W

    o = t.orders.filter(F.col("o_custkey") <= 300)
    w_run = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w_run).alias("second_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.count(F.lit(1))
        .over(W.partitionBy("o_custkey"))
        .alias("n_orders"),
    )


_HIVE_FUNCTION_SURFACE = (
    "abs,acos,ascii,asin,atan,avg,base64,bin,bround,cbrt,ceil,"
    "coalesce,concat,concat_ws,conv,corr,cos,count,covar_pop,"
    "covar_samp,crc32,date_add,date_sub,datediff,day,degrees,elt,"
    "exp,explode,factorial,find_in_set,first_value,floor,"
    "format_number,from_unixtime,get_json_object,greatest,hash,hex,"
    "histogram_numeric,hour,if,initcap,inline,instr,json_tuple,"
    "lag,last_day,last_value,lead,least,length,levenshtein,ln,"
    "locate,log,log10,log2,lower,lpad,ltrim,map_keys,map_values,"
    "max,md5,min,minute,month,months_between,named_struct,negative,"
    "next_day,ntile,nvl,parse_url,percent_rank,pmod,posexplode,"
    "position,pow,quarter,radians,rank,reflect,regexp_extract,"
    "regexp_replace,repeat,reverse,round,row_number,rpad,rtrim,"
    "second,sentences,sha1,sha2,shiftleft,shiftright,"
    "shiftrightunsigned,sign,sin,size,sort_array,soundex,space,"
    "split,sqrt,stack,stddev_pop,stddev_samp,str_to_map,substr,"
    "substring_index,sum,tan,to_date,translate,trim,trunc,ucase,"
    "unbase64,unhex,unix_timestamp,upper,var_pop,var_samp,weekofyear,"
    "xpath,xpath_boolean,xpath_double,xpath_int,xpath_long,"
    "xpath_string,year"
)


@register(
    "ddl_show_functions",
    oracle=f"""
SELECT unnest(string_split('{_HIVE_FUNCTION_SURFACE}', ',')) AS fn_name,
       true AS resolvable
ORDER BY fn_name
""",
    category="formats",
)
def ddl_show_functions(spark, t):
    """SHOW FUNCTIONS parity sweep (reference ``FunctionRegistry.java``
    registry + ``ql/exec/DDLTask.java showFunctions``): 128 Hive
    function names spanning every §2.9 family must resolve in this
    engine's session — checked live against
    ``spark.catalog.functionExists`` (Spark keeps Hive's names,
    including aliases like ucase/nvl/if and the xpath family). The
    oracle is the same pinned list; any Spark upgrade that dropped a
    Hive name would flip its ``resolvable`` to false and hash-fail."""
    names = sorted(_HIVE_FUNCTION_SURFACE.split(","))
    rows = [(n, bool(spark.catalog.functionExists(n))) for n in names]
    return spark.createDataFrame(rows, "fn_name string, resolvable boolean")


@register(
    "fn_date_format_patterns",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y/%m/%d') AS slashed,
       strftime(o_orderdate, '%a') AS dow_short,
       strftime(o_orderdate, '%B') AS month_full,
       ltrim(strftime(o_orderdate, '%j'), '0') AS day_of_year,
       strftime(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 13 HOUR
                + INTERVAL 7 MINUTE, '%H:%M:%S %p') AS clock,
       strftime(o_orderdate, '%d-%m-%Y') AS euro
FROM orders WHERE o_orderkey <= 500
""",
    category="scalars",
)
def fn_date_format_patterns(spark, t):
    """date_format across the SimpleDateFormat pattern surface
    (reference ``udf/UDFDateFormat``/``GenericUDFDateFormat`` —
    Java patterns: EEE day name, MMMM month name, D day-of-year,
    hh..a clock). DuckDB speaks strftime, a DIFFERENT pattern
    language — the oracle maps each Java pattern to its strftime
    twin (%a/%B/%j/%p), with %j's zero-padding stripped to match
    Java's unpadded D. Both engines emit English names at default
    locale."""
    o = t.orders.filter(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate")
    ts = d.cast("timestamp") + F.expr("INTERVAL 13 HOURS 7 MINUTES")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy/MM/dd").alias("slashed"),
        F.date_format(d, "EEE").alias("dow_short"),
        F.date_format(d, "MMMM").alias("month_full"),
        F.date_format(d, "D").alias("day_of_year"),
        F.date_format(ts, "HH:mm:ss a").alias("clock"),
        F.date_format(d, "dd-MM-yyyy").alias("euro"),
    )


@register(
    "win_range_interval_frame",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS spend_90d,
       count(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
         AS n_90d
FROM orders WHERE o_custkey <= 150
""",
    category="windows",
)
def win_range_interval_frame(spark, t):
    """RANGE frames bounded by CALENDAR intervals — trailing-90-day
    spend per customer (reference windowing RANGE frames,
    ``SemanticAnalyzer`` windowing spec over a date ORDER BY; the
    value-range twin of the ROWS frames in win_running_*). Peer rows
    (same orderdate) aggregate together, which ROWS frames get
    wrong; the decimal trick keeps the double SUM order-independent.
    Spark and DuckDB accept the identical frame text."""
    t.orders
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS spend_90d,
               count(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
                 AS n_90d
        FROM orders WHERE o_custkey <= 150
        """
    )


@register(
    "agg_min_by_max_by",
    oracle="""
SELECT l_returnflag,
       arg_min(l_orderkey, l_extendedprice + l_orderkey / 1e9) AS cheapest_order,
       arg_max(l_orderkey, l_extendedprice - l_orderkey / 1e9) AS priciest_order,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_min_by_max_by(spark, t):
    """Argmin/argmax aggregates — ``min_by``/``max_by`` (Spark) vs
    ``arg_min``/``arg_max`` (DuckDB); the SQL-standard companions of
    Hive's idiom ``struct(price, key)`` + min (which the reference
    corpus uses for the same question, e.g. TPC-H Q15's top
    supplier). Ties on price are broken deterministically by folding
    an orderkey epsilon into the ordering value on BOTH engines —
    bare min_by/arg_min are tie-unspecified, which would make the
    hash compare flaky rather than wrong."""
    li = t.lineitem
    eps = F.col("l_orderkey") / F.lit(1e9)
    return li.groupBy("l_returnflag").agg(
        F.min_by("l_orderkey", F.col("l_extendedprice") + eps).alias(
            "cheapest_order"
        ),
        F.max_by("l_orderkey", F.col("l_extendedprice") - eps).alias(
            "priciest_order"
        ),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "fn_printf_format",
    oracle="""
SELECT n_nationkey,
       printf('%s has key %d', n_name, n_nationkey) AS labeled,
       printf('%05d|%x', n_nationkey, n_nationkey + 255) AS padded_hex,
       printf('%.2f', n_nationkey / 4.0) AS fixed2
FROM nation
""",
    category="scalars",
)
def fn_printf_format(spark, t):
    """printf / format_string (reference ``udf/generic/
    GenericUDFPrintf.java``, FunctionRegistry 'printf'): %s/%d,
    zero-padding, hex, and fixed-point formatting. Spark's
    format_string IS printf (Java Formatter); DuckDB's printf is
    C-style — identical for these conversions, with float precision
    pinned explicitly on both sides."""
    n = t.nation
    return n.select(
        "n_nationkey",
        F.format_string(
            "%s has key %d", F.col("n_name"), F.col("n_nationkey")
        ).alias("labeled"),
        F.format_string(
            "%05d|%x", F.col("n_nationkey"), F.col("n_nationkey") + 255
        ).alias("padded_hex"),
        F.format_string(
            "%.2f", F.col("n_nationkey") / 4.0
        ).alias("fixed2"),
    )


@register(
    "fn_array_functions",
    oracle="""
SELECT n_nationkey,
       array_to_string(chars, '') AS sorted_chars,
       array_to_string(chars[1:3], '') AS first3,
       len(chars) AS n_chars,
       CASE WHEN len(list_filter(chars, c -> c = 'A')) > 0
            THEN true ELSE false END AS has_a,
       array_to_string(list_sort(list_distinct(chars)), '') AS distinct_set_sorted
FROM (SELECT n_nationkey,
             list_sort(string_split(n_name, '')) AS chars FROM nation) t
""",
    category="scalars",
)
def fn_array_functions(spark, t):
    """Array-function suite (reference ``GenericUDFSortArray``,
    ``GenericUDFArrayContains``, ``GenericUDFSize`` via
    FunctionRegistry): sort_array, slice, size, array_contains,
    array_distinct — every array output serialized with concat_ws
    (driver canonicalizer contract). Spark's array_distinct
    preserves first-occurrence order (sorted input -> sorted
    output); DuckDB's list_distinct returns ARBITRARY order, so the
    oracle re-sorts it — the deterministic statement of the same
    set."""
    chars = F.sort_array(F.split(F.col("n_name"), "(?!$)"))
    return t.nation.select(
        "n_nationkey",
        F.concat_ws("", chars).alias("sorted_chars"),
        F.concat_ws("", F.slice(chars, 1, 3)).alias("first3"),
        F.size(chars).cast("bigint").alias("n_chars"),
        F.array_contains(chars, "A").alias("has_a"),
        F.concat_ws("", F.array_distinct(chars)).alias("distinct_set_sorted"),
    )


@register(
    "agg_bit_ops",
    oracle="""
SELECT l_returnflag,
       bit_and(CAST(l_suppkey AS BIGINT)) AS all_and,
       bit_or(CAST(l_suppkey AS BIGINT)) AS all_or,
       bit_xor(CAST(l_suppkey AS BIGINT)) AS all_xor
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_bit_ops(spark, t):
    """Bitwise AND/OR/XOR aggregates — the aggregate companions of
    §2.9's bitwise scalar suite (Hive 1.2 exposes only the scalars
    ``&``/``|``/``^`` via ``UDFOPBitAnd`` etc.; the aggregates are
    beyond-ref SQL surface shared by Spark and DuckDB, and the
    building block of bitmask-rollup reports). Associative +
    commutative, so partial aggregation is exact at any parallelism
    — no decimal trick needed."""
    li = t.lineitem
    k = F.col("l_suppkey").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(k).alias("all_and"),
        F.bit_or(k).alias("all_or"),
        F.bit_xor(k).alias("all_xor"),
    )


@register(
    "fn_arith_edge_semantics",
    oracle="""
SELECT o_orderkey,
       o_orderkey / NULLIF(o_orderkey % 3, 0)          AS div0_int,
       CAST(o_totalprice AS DOUBLE) / NULLIF(o_orderkey % 3, 0)
                                                       AS div0_dbl,
       o_orderkey % NULLIF(o_orderkey % 5, 0)          AS mod0,
       CAST((
         (CAST(o_orderkey AS HUGEINT) * 4611686018427387904
          + 9223372036854775808) % 18446744073709551616
         - 9223372036854775808) AS BIGINT)             AS mul_wrap,
       ((0 - o_orderkey) % 7 + 7) % 7                  AS pmod7
FROM orders WHERE o_orderkey <= 2000
""",
    category="scalars",
)
def fn_arith_edge_semantics(spark, t):
    """Hive arithmetic edge semantics with ANSI off (the parity mode
    catalog.ensure_parity_confs pins — ``UDFOPDivide``/``UDFOPMod``
    return NULL on zero divisors instead of erroring, and integer
    ops wrap in Java two's complement):

    - x/0 and x%0 -> NULL for int and double operands. DuckDB agrees
      natively; the oracle spells the NULL branch with NULLIF so the
      intent is explicit.
    - bigint multiply OVERFLOW wraps (Java semantics). DuckDB would
      error, so the oracle emulates two's-complement wrap in HUGEINT:
      ((x*c + 2^63) mod 2^64) - 2^63.
    - pmod(-x, 7): Hive's always-non-negative modulus vs the
      %%-operator's sign-of-dividend — oracle re-derives it as
      ((a % n) + n) % n.

    Note Spark's `/` on integers is Hive double division; the int
    case therefore divides longs and compares as double."""
    o = t.orders.filter(F.col("o_orderkey") <= 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        (k / (k % 3)).alias("div0_int"),
        (F.col("o_totalprice").cast("double") / (k % 3)).alias("div0_dbl"),
        (k % (k % 5)).alias("mod0"),
        (k * F.lit(4611686018427387904).cast("long")).alias("mul_wrap"),
        F.pmod(-k, F.lit(7)).alias("pmod7"),
    )


@register(
    "fn_string_edge_cases2",
    oracle="""
SELECT p_partkey,
       levenshtein(p_name, p_brand) AS lev,
       array_to_string(
         list_transform(string_split(p_name, ' '),
           w -> upper(w[1:1]) || lower(w[2:])), ' ') AS ini,
       CAST(instr(p_name, 'ol') AS INTEGER) AS ins,
       translate(p_name, 'aeiou', '12345') AS tr,
       CAST(COALESCE(list_position(
         string_split('Brand#1,Brand#13,Brand#20,Brand#7', ','),
         p_brand), 0) AS INTEGER) AS fis,
       CASE 1 + p_partkey % 3 WHEN 1 THEN p_brand
                              WHEN 2 THEN p_name ELSE p_type END AS elt_pick,
       CAST(p_size AS VARCHAR) AS m_k1,
       CAST(p_partkey % 7 AS VARCHAR) AS m_k2
FROM part WHERE p_partkey <= 400
""",
    category="scalars",
)
def fn_string_edge_cases2(spark, t):
    """String-function parity, part 2 (FunctionRegistry.java rows not
    covered by fn_string_edge_cases): levenshtein (UDFLevenshtein),
    initcap (UDFInitCap — word-split capitalization; DuckDB lacks it,
    so the oracle re-derives it per word), instr (UDFInstr, 1-based,
    0 when absent), translate (UDFTranslate char-map), find_in_set
    (UDFFindInSet — position in a comma list, 0 when absent; oracle
    uses list_position over the split list), elt (UDFElt 1-based arg
    pick), and str_to_map (GenericUDFStringToMap) probed through
    scalar lookups of its entries so no map column reaches the
    driver canonicalizer. All JVM built-ins, map-only plan."""
    p = t.part.filter(F.col("p_partkey") <= 400)
    stm = F.expr(
        "str_to_map(concat('k1:', p_size, ',k2:', p_partkey % 7), ',', ':')"
    )
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_brand").alias("lev"),
        F.initcap("p_name").alias("ini"),
        F.instr("p_name", "ol").alias("ins"),
        F.translate("p_name", "aeiou", "12345").alias("tr"),
        F.expr(
            "find_in_set(p_brand, 'Brand#1,Brand#13,Brand#20,Brand#7')"
        ).alias("fis"),
        F.expr("elt(1 + p_partkey % 3, p_brand, p_name, p_type)").alias(
            "elt_pick"
        ),
        stm.getItem("k1").alias("m_k1"),
        stm.getItem("k2").alias("m_k2"),
    )


@register(
    "fn_date_edge_cases2",
    oracle="""
WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
  FROM orders WHERE o_orderkey <= 1500
)
SELECT o_orderkey,
       CAST(d + INTERVAL 1 MONTH AS DATE) AS add_1m,
       CAST(d + INTERVAL 13 MONTH AS DATE) AS add_13m,
       last_day(d) AS month_end,
       CAST(date_trunc('month', d) AS DATE) AS trunc_mm,
       CAST(date_trunc('year', d) AS DATE) AS trunc_yy,
       CAST(week(d) AS INTEGER) AS woy,
       CAST(dayofweek(d) + 1 AS INTEGER) AS dow,
       CAST(date_diff('day', DATE '1995-01-01', d) AS INTEGER) AS dd,
       d + CAST(
         CASE WHEN (8 - isodow(d)) % 7 = 0 THEN 7
              ELSE (8 - isodow(d)) % 7 END AS INTEGER) AS next_mon
FROM o
""",
    category="scalars",
)
def fn_date_edge_cases2(spark, t):
    """Date-function parity, part 2 (UDFMonthsBetween-adjacent rows
    of FunctionRegistry): add_months END-OF-MONTH CLAMP (Jan 31 + 1
    month = Feb 29 in Hive AND DuckDB interval arithmetic — the
    corner that breaks naive day-count implementations), last_day,
    trunc to month/year, ISO weekofyear (both engines use ISO 8601
    week numbering: 2021-01-01 is week 53), dayofweek (Hive/Spark
    1=Sunday vs DuckDB 0=Sunday, shifted in the oracle), datediff
    against an epoch, and next_day(_, 'MON') — STRICTLY later, so a
    Monday maps 7 days forward; the oracle re-derives it from isodow
    arithmetic. Map-only projection, all JVM built-ins."""
    o = t.orders.filter(F.col("o_orderkey") <= 1500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 1).alias("add_1m"),
        F.add_months(d, 13).alias("add_13m"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "MM").alias("trunc_mm"),
        F.trunc(d, "YYYY").alias("trunc_yy"),
        F.weekofyear(d).alias("woy"),
        F.dayofweek(d).alias("dow"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("dd"),
        F.next_day(d, "MON").alias("next_mon"),
    )


@register(
    "fn_months_between",
    oracle="""
WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
         DATE '1995-06-17' AS anchor
  FROM orders WHERE o_orderkey <= 1500
)
SELECT o_orderkey,
       CASE WHEN day(d) = day(anchor)
              OR (d = last_day(d) AND anchor = last_day(anchor))
            THEN CAST((year(d) - year(anchor)) * 12
                      + (month(d) - month(anchor)) AS DOUBLE)
            ELSE round((year(d) - year(anchor)) * 12
                       + (month(d) - month(anchor))
                       + (day(d) - day(anchor)) / 31.0, 8)
       END AS mb,
       CASE WHEN day(anchor) = day(d)
              OR (anchor = last_day(anchor) AND d = last_day(d))
            THEN CAST((year(anchor) - year(d)) * 12
                      + (month(anchor) - month(d)) AS DOUBLE)
            ELSE round((year(anchor) - year(d)) * 12
                       + (month(anchor) - month(d))
                       + (day(anchor) - day(d)) / 31.0, 8)
       END AS mb_rev
FROM o
""",
    category="scalars",
)
def fn_months_between(spark, t):
    """months_between — Hive's 31-DAY-FRACTION month arithmetic
    (``udf/generic/GenericUDFMonthsBetween.java``; Spark implements
    the identical rule): when both dates share the day-of-month or
    are both month-ends the result is the integer month difference,
    otherwise the day gap contributes ``(day1 − day2)/31`` and the
    result rounds to 8 decimals. DuckDB has no months_between, so
    the oracle re-derives the rule from year/month/day/last_day —
    pinning the SEMANTICS, not just the happy path, in both argument
    orders (the fraction's sign flips)."""
    o = t.orders.filter(F.col("o_orderkey") <= 1500)
    d = F.col("o_orderdate").cast("date")
    anchor = F.lit("1995-06-17").cast("date")
    return o.select(
        "o_orderkey",
        F.months_between(d, anchor).alias("mb"),
        F.months_between(anchor, d).alias("mb_rev"),
    )
