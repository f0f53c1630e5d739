"""Scalar function sweep — FunctionRegistry surface (SURVEY.md §2.9).

Reference: ``ql/.../exec/FunctionRegistry.java:179-468`` (~200
GenericUDFs). Each query below batches one category as a wide
projection so the whole registry is covered in few round-trips.
All run as JVM-side Catalyst expressions inside whole-stage codegen —
no Python in the row path.

Oracle notes: DuckDB lacks initcap/soundex/crc32/conv — those are
exercised Spark-side in tests (tests/test_functions.py) instead of
oracle queries. Cast-failure→NULL parity uses DuckDB TRY_CAST
(Hive returns NULL on bad casts; Spark matches with ansi=false).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "fn_string_suite",
    oracle="""
SELECT n_nationkey,
       CONCAT(n_name, '_', CAST(n_regionkey AS VARCHAR)) AS cat,
       CONCAT_WS('-', n_name, 'x')   AS cat_ws,
       LOWER(n_name)  AS lo, UPPER(LOWER(n_name)) AS up,
       SUBSTR(n_name, 1, 6)          AS sub6,
       LENGTH(n_name)                AS len,
       TRIM('  pad  ')               AS trimmed,
       LTRIM('  pad  ')              AS ltrimmed,
       RTRIM('  pad  ')              AS rtrimmed,
       LPAD(CAST(n_nationkey AS VARCHAR), 4, '0') AS lpadded,
       RPAD(n_name, 12, '.')         AS rpadded,
       REVERSE(n_name)               AS rev,
       REPLACE(n_name, 'NATION', 'N') AS repl,
       REPEAT('ab', 3)               AS rep,
       ASCII(n_name)                 AS asc_first,
       CHR(65 + n_nationkey % 26)    AS chr_k,
       INSTR(n_name, '_')            AS underscore_at,
       SPLIT_PART(n_name, '_', 2)    AS num_part,
       TRANSLATE(n_name, 'NAT', 'nat') AS translated,
       LEVENSHTEIN(n_name, 'NATION_0') AS lev
FROM nation
""",
    category="scalars",
)
def fn_string_suite(spark, t):
    """String functions (FunctionRegistry.java:179-261,413-422)."""
    n = t.nation
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        F.concat(F.col("n_name"), F.lit("_"), F.col("n_regionkey").cast("string")).alias("cat"),
        F.concat_ws("-", F.col("n_name"), F.lit("x")).alias("cat_ws"),
        F.lower("n_name").alias("lo"),
        F.upper(F.lower("n_name")).alias("up"),
        F.substring("n_name", 1, 6).alias("sub6"),
        F.length("n_name").alias("len"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.ltrim(F.lit("  pad  ")).alias("ltrimmed"),
        F.rtrim(F.lit("  pad  ")).alias("rtrimmed"),
        F.lpad(k.cast("string"), 4, "0").alias("lpadded"),
        F.rpad(F.col("n_name"), 12, ".").alias("rpadded"),
        F.reverse("n_name").alias("rev"),
        F.regexp_replace("n_name", "NATION", "N").alias("repl"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.ascii("n_name").alias("asc_first"),
        F.chr(F.lit(65) + k % 26).alias("chr_k"),
        F.instr("n_name", "_").alias("underscore_at"),
        F.split_part(F.col("n_name"), F.lit("_"), F.lit(2)).alias("num_part"),
        F.translate(F.col("n_name"), "NAT", "nat").alias("translated"),
        F.levenshtein(F.col("n_name"), F.lit("NATION_0")).alias("lev"),
    )


@register(
    "fn_regex_suite",
    oracle="""
SELECT doc_id,
       REGEXP_EXTRACT(text, '([a-z]+)', 1)          AS first_word,
       REGEXP_REPLACE(text, '[aeiou]', '_', 'g')    AS devoweled_prefix,
       REGEXP_MATCHES(text, '^key')                 AS starts_key,
       (text LIKE '%table%')                        AS has_table,
       LEN(STRING_SPLIT_REGEX(text, '\\s+'))        AS n_tokens
FROM (SELECT doc_id, SUBSTR(text, 1, 40) AS text FROM documents WHERE doc_id < 50)
""",
    category="scalars",
)
def fn_regex_suite(spark, t):
    """LIKE/RLIKE/regexp_* (UDFLike.java, FunctionRegistry:252-256)."""
    d = t.documents.filter(F.col("doc_id") < 50).select(
        "doc_id", F.substring("text", 1, 40).alias("text")
    )
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled_prefix"),
        F.col("text").rlike("^key").alias("starts_key"),
        F.col("text").like("%table%").alias("has_table"),
        F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens"),
    )


@register(
    "fn_math_suite",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1)        AS r1,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS flr,
       CAST(CEIL(l_extendedprice)  AS BIGINT) AS cl,
       ROUND(SQRT(l_quantity), 6)       AS sq,
       ABS(-l_quantity)                 AS ab,
       ROUND(LN(l_extendedprice), 6)    AS lg,
       ROUND(LOG10(l_extendedprice), 6) AS lg10,
       ROUND(LOG2(l_quantity + 1), 6)   AS lg2,
       ROUND(EXP(l_discount), 6)        AS ex,
       ROUND(POW(l_quantity, 2), 4)     AS p2,
       CAST(SIGN(l_quantity - 25) AS DOUBLE) AS sg,
       ROUND(DEGREES(l_discount), 6)    AS deg,
       ROUND(RADIANS(l_quantity), 6)    AS rad,
       ROUND(SIN(l_discount), 6)        AS sn,
       ROUND(COS(l_discount), 6)        AS cs,
       ROUND(ATAN(l_discount), 6)       AS at,
       CAST(l_quantity AS BIGINT) % 7   AS m7,
       ((CAST(l_quantity AS BIGINT) % 7) + 7) % 7 AS pm7,
       ROUND(PI(), 6)                   AS pi_const,
       GREATEST(l_quantity, l_discount * 100) AS gr,
       LEAST(l_quantity, l_tax * 100)   AS ls
FROM lineitem WHERE l_orderkey < 300
""",
    category="scalars",
)
def fn_math_suite(spark, t):
    """Math functions (FunctionRegistry.java:192-226). pmod expressed
    portably; rounding pins fp library differences."""
    li = t.lineitem.filter(F.col("l_orderkey") < 300)
    q, p, d, tx = (F.col(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(p, 1).alias("r1"),
        F.floor(p).alias("flr"),
        F.ceil(p).alias("cl"),
        F.round(F.sqrt(q), 6).alias("sq"),
        F.abs(-q).alias("ab"),
        F.round(F.log(p), 6).alias("lg"),
        F.round(F.log10(p), 6).alias("lg10"),
        F.round(F.log2(q + 1), 6).alias("lg2"),
        F.round(F.exp(d), 6).alias("ex"),
        F.round(F.pow(q, 2), 4).alias("p2"),
        F.signum(q - 25).alias("sg"),
        F.round(F.degrees(d), 6).alias("deg"),
        F.round(F.radians(q), 6).alias("rad"),
        F.round(F.sin(d), 6).alias("sn"),
        F.round(F.cos(d), 6).alias("cs"),
        F.round(F.atan(d), 6).alias("at"),
        (q.cast("bigint") % 7).alias("m7"),
        F.pmod(q.cast("bigint"), F.lit(7)).alias("pm7"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_const"),
        F.greatest(q, d * 100).alias("gr"),
        F.least(q, tx * 100).alias("ls"),
    )


@register(
    "fn_date_suite",
    oracle="""
SELECT o_orderkey,
       YEAR(o_orderdate)        AS yr,
       MONTH(o_orderdate)       AS mo,
       DAY(o_orderdate)         AS dy,
       QUARTER(o_orderdate)     AS qtr,
       DAYOFWEEK(o_orderdate) + 1 AS dow,
       WEEKOFYEAR(o_orderdate)  AS woy,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE)  AS plus30,
       CAST(o_orderdate - INTERVAL 90 DAY AS DATE)  AS minus90,
       DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       LAST_DAY(CAST(o_orderdate AS DATE))          AS month_end,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
       CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS quarter_start,
       STRFTIME(o_orderdate, '%Y-%m-%d')            AS fmt,
       CAST(EPOCH(o_orderdate) AS BIGINT)           AS epoch_s
FROM orders WHERE o_orderkey < 500
""",
    category="scalars",
)
def fn_date_suite(spark, t):
    """Date/time functions (FunctionRegistry.java:266-285,427-431).
    Hive dayofweek: 1=Sunday — Spark matches; DuckDB dayofweek is
    0=Sunday, so the oracle adds 1."""
    o = t.orders.filter(F.col("o_orderkey") < 500)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("yr"),
        F.month(od).alias("mo"),
        F.dayofmonth(od).alias("dy"),
        F.quarter(od).alias("qtr"),
        F.dayofweek(od).alias("dow"),
        F.weekofyear(od).alias("woy"),
        F.date_add(od.cast("date"), 30).alias("plus30"),
        F.date_sub(od.cast("date"), 90).alias("minus90"),
        F.datediff(F.lit("2000-01-01").cast("date"), od.cast("date")).alias(
            "days_to_y2k"
        ),
        F.last_day(od.cast("date")).alias("month_end"),
        F.trunc(od.cast("date"), "month").alias("month_start"),
        F.trunc(od.cast("date"), "quarter").alias("quarter_start"),
        F.date_format(od, "yyyy-MM-dd").alias("fmt"),
        F.unix_timestamp(od).alias("epoch_s"),
    )


@register(
    "fn_conditional",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_band,
       CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'MACHINERY' THEN 2 ELSE 0 END AS seg_code,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
       (CASE WHEN c_acctbal > 5000 THEN c_acctbal ELSE 0 END) AS if_bal,
       NULLIF(c_nationkey, 0) AS nk_nullif,
       (c_acctbal IS NULL)     AS bal_isnull,
       (c_acctbal IS NOT NULL) AS bal_notnull,
       (c_nationkey BETWEEN 5 AND 10) AS nk_between,
       (c_mktsegment IN ('BUILDING', 'AUTOMOBILE')) AS seg_in
FROM customer WHERE c_custkey < 300
""",
    category="scalars",
)
def fn_conditional(spark, t):
    """Conditionals (FunctionRegistry.java:319-325,337,407-410,424-425):
    CASE both forms, if, coalesce/nullif, between, in, null predicates."""
    c = t.customer.filter(F.col("c_custkey") < 300)
    bal, seg, nk = F.col("c_acctbal"), F.col("c_mktsegment"), F.col("c_nationkey")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "low").otherwise("high").alias(
            "bal_band"
        ),
        F.when(seg == "BUILDING", 1).when(seg == "MACHINERY", 2).otherwise(0).alias(
            "seg_code"
        ),
        F.coalesce(F.nullif(seg, F.lit("BUILDING")), F.lit("N/A")).alias("seg_or_na"),
        F.when(bal > 5000, bal).otherwise(F.lit(0.0)).alias("if_bal"),
        F.nullif(nk, F.lit(0)).alias("nk_nullif"),
        bal.isNull().alias("bal_isnull"),
        bal.isNotNull().alias("bal_notnull"),
        nk.between(5, 10).alias("nk_between"),
        seg.isin("BUILDING", "AUTOMOBILE").alias("seg_in"),
    )


@register(
    "fn_cast_null_semantics",
    oracle="""
SELECT v,
       CAST(TRUNC(TRY_CAST(v AS DOUBLE)) AS INTEGER) AS as_int,
       TRY_CAST(v AS DOUBLE)  AS as_double,
       TRY_CAST(v AS DATE)    AS as_date,
       CAST(LEN(v) AS BIGINT) AS len
FROM (VALUES ('123'), ('12.5'), ('abc'), ('2020-01-31'), (''), ('  7  ')) t(v)
""",
    category="scalars",
)
def fn_cast_null_semantics(spark, t):
    """Hive cast-failure→NULL semantics (SURVEY.md §2.9 type
    conversion): bad casts yield NULL, matching Spark ansi=false and
    DuckDB TRY_CAST. Hive/Spark truncate '12.5'→12 where DuckDB's
    direct string→int rounds, so the oracle goes through
    TRUNC(TRY_CAST(... AS DOUBLE))."""
    df = spark.createDataFrame(
        [("123",), ("12.5",), ("abc",), ("2020-01-31",), ("",), ("  7  ",)], ["v"]
    )
    return df.select(
        "v",
        F.col("v").cast("double").cast("int").alias("as_int"),
        F.col("v").cast("double").alias("as_double"),
        F.col("v").cast("date").alias("as_date"),
        F.length("v").cast("bigint").alias("len"),
    )


@register(
    "fn_hash_encode",
    oracle="""
SELECT n_nationkey,
       MD5(n_name)                       AS md5_hex,
       SHA256(n_name)                    AS sha256_hex,
       TO_BASE64(CAST(n_name AS BLOB))   AS b64,
       HEX(n_nationkey)                  AS hx,
       BIN(CAST(n_nationkey AS BIGINT))  AS bn
FROM nation
""",
    category="scalars",
)
def fn_hash_encode(spark, t):
    """Hash/encode functions (FunctionRegistry.java:221-237): md5,
    sha2, base64, hex, bin. (crc32/sha1: Spark-side tests only —
    DuckDB lacks them.)"""
    n = t.nation
    return n.select(
        "n_nationkey",
        F.md5(F.col("n_name").cast("binary")).alias("md5_hex"),
        F.sha2(F.col("n_name").cast("binary"), 256).alias("sha256_hex"),
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.upper(F.hex(F.col("n_nationkey"))).alias("hx"),
        F.bin(F.col("n_nationkey").cast("bigint")).alias("bn"),
    )


@register(
    "fn_bitwise",
    oracle="""
SELECT n_nationkey,
       n_nationkey & 12  AS band,
       n_nationkey | 5   AS bor,
       XOR(n_nationkey, 9) AS bxor,
       n_nationkey << 2  AS shl,
       n_nationkey >> 1  AS shr
FROM nation
""",
    category="scalars",
)
def fn_bitwise(spark, t):
    """Bitwise ops (FunctionRegistry.java:306-312)."""
    k = F.col("n_nationkey")
    return t.nation.select(
        "n_nationkey",
        k.bitwiseAND(12).alias("band"),
        k.bitwiseOR(5).alias("bor"),
        k.bitwiseXOR(9).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"),
    )


@register(
    "fn_complex_types",
    oracle="""
SELECT n_nationkey,
       [n_nationkey, n_regionkey, 99][2]              AS arr_second,
       LEN([n_nationkey, n_regionkey, 99])            AS arr_size,
       ARRAY_TO_STRING(LIST_SORT([n_regionkey, n_nationkey, 99]), ',') AS arr_sorted,
       LIST_CONTAINS([n_nationkey, n_regionkey], 3)   AS has3,
       {'k': n_name, 'r': n_regionkey}.k              AS struct_k,
       MAP(['a','b'], [n_nationkey, n_regionkey])['b'][1] AS map_b
FROM nation
""",
    category="scalars",
)
def fn_complex_types(spark, t):
    """Complex-type constructors/accessors (FunctionRegistry.java:
    400-421; ObjectInspector categories LIST/MAP/STRUCT,
    ObjectInspector.java:44): array/map/struct build + index."""
    k, r = F.col("n_nationkey"), F.col("n_regionkey")
    arr = F.array(k, r, F.lit(99))
    return t.nation.select(
        "n_nationkey",
        arr.getItem(1).alias("arr_second"),
        F.size(arr).alias("arr_size"),
        F.array_join(F.sort_array(F.array(r, k, F.lit(99))), ",").alias("arr_sorted"),
        F.array_contains(F.array(k, r), 3).alias("has3"),
        F.struct(F.col("n_name").alias("k"), r.alias("r")).getField("k").alias(
            "struct_k"
        ),
        F.create_map(F.lit("a"), k, F.lit("b"), r).getItem("b").alias("map_b"),
    )
