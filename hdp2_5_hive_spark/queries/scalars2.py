"""Scalar-function breadth, part 2 (SURVEY §2.9 long tail).

Covers: the remaining string functions, xpath family, interval
arithmetic, the uniontype struct encoding (§1.2), mask functions,
ngrams/context_ngrams composition (§2.5), histogram_numeric, and the
INPUT__FILE__NAME virtual column (§1.3).

Oracle notes: DuckDB lacks soundex/next_day/months_between/xpath/
histogram_numeric/crc32/sha1/xxhash64. Those oracles are synthesized
instead of dropped: xpath via the same string template the query
builds from, soundex via a generated replace-chain (RE2 has no
backreferences), crc32/sha1 via stdlib-computed literal maps over the
fixed 25 nation names, murmur/xxhash64 via the pure-Python reference
implementations in functions/pyhash.py, and the approximate sketches
(histogram_numeric, HLL NDV) as derived exactness/shape checks the
oracle can state exactly. Only genuinely engine-specific outputs stay
rows-only.
"""

from __future__ import annotations

import hashlib
import zlib

from pyspark.sql import functions as F

from ..functions import hive_compat as hc
from ..functions.pyhash import murmur3_32, xxhash64
from .registry import register


def _soundex_sql(col: str) -> str:
    """DuckDB expression computing American Soundex with the h/w
    coalescing rule (matches the JVM implementation; pinned against
    engine output in tests/test_scalars2.py). RE2 lacks backreferences,
    so adjacent-duplicate collapse is a generated replace chain — 5
    passes collapse runs up to 2^5 long, beyond any real token."""
    digits = (
        f"replace(translate(upper({col}), "
        f"'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230129022455012623019202'),"
        f" '9', '')"
    )
    collapsed = digits
    for _ in range(5):
        for d in "123456":
            collapsed = f"replace({collapsed}, '{d}{d}', '{d}')"
    # Drop the first letter's own digit — unless the first letter is
    # H/W, whose marker was already stripped (it contributes no digit,
    # and its JVM last-code 7 never coalesces with a real code).
    body = (
        f"CASE WHEN upper(substr({col},1,1)) IN ('H','W') "
        f"THEN {collapsed} ELSE substr({collapsed}, 2) END"
    )
    return (
        f"upper(substr({col},1,1)) || "
        f"substr(rpad(replace({body}, '0', ''), 3, '0'), 1, 3)"
    )


def _nation_hash_values() -> str:
    """VALUES literal mapping each fixed nation name (testdata ships
    NATION_0..NATION_24 at every scale) to independently computed
    crc32 (zlib), sha1 (hashlib), xxhash64 and murmur3 (pyhash
    reference impls). An unexpected name joins to NULL — loud."""
    rows = []
    for i in range(25):
        name = f"NATION_{i}"
        b = name.encode("utf-8")
        rows.append(
            f"('{name}', {zlib.crc32(b)}, '{hashlib.sha1(b).hexdigest()}', "
            f"{xxhash64(b)}, {murmur3_32(b)})"
        )
    return ",\n  ".join(rows)


@register(
    "fn_string_suite2",
    oracle="""
SELECT s_suppkey,
       translate(s_name, 'ae', '43') AS leeted,
       levenshtein(s_name, reverse(s_name)) AS lev_rev,
       instr(s_name, 'er') AS pos_er,
       lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded_key,
       rpad(s_name, 30, '.') AS padded_name,
       repeat('-', 5) AS dashes,
       printf('%s #%d', s_name, s_suppkey) AS labeled,
       ascii(s_name) AS first_code,
       reverse(s_name) AS rev_name
FROM supplier
""",
    category="scalars",
)
def fn_string_suite2(spark, t):
    """String long tail: translate/levenshtein/instr/lpad/rpad/
    repeat/printf/ascii/reverse (FunctionRegistry.java:183-261,
    413-423)."""
    s = t.supplier
    return s.select(
        "s_suppkey",
        F.translate("s_name", "ae", "43").alias("leeted"),
        F.levenshtein(F.col("s_name"), F.reverse("s_name")).alias("lev_rev"),
        F.instr(F.col("s_name"), "er").alias("pos_er"),
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded_key"),
        F.rpad("s_name", 30, ".").alias("padded_name"),
        F.repeat(F.lit("-"), 5).alias("dashes"),
        F.format_string("%s #%d", "s_name", "s_suppkey").alias("labeled"),
        F.ascii("s_name").alias("first_code"),
        F.reverse("s_name").alias("rev_name"),
    )


@register(
    "fn_initcap_elt_field",
    oracle="""
SELECT n_nationkey,
       upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2) AS capped,
       CASE ((n_nationkey % 3) + 1) WHEN 1 THEN 'alpha' WHEN 2 THEN 'beta'
            ELSE 'gamma' END AS elt_pick,
       CASE n_name WHEN 'NATION_5' THEN 1 WHEN 'NATION_7' THEN 2 ELSE 0 END AS fld,
       CASE WHEN strpos(',b,c,' , ',' || lower(substr(n_name,1,1)) || ',') > 0
            THEN length(substr(',b,c,', 1,
                 strpos(',b,c,', ',' || lower(substr(n_name,1,1)) || ',')))
            ELSE 0 END AS fis
FROM nation
""",
    category="scalars",
)
def fn_initcap_elt_field(spark, t):
    """initcap / elt / field / find_in_set
    (FunctionRegistry.java:250,415,248,249). Oracle re-expresses each
    via portable CASE/strpos logic; nation names are single words so
    initcap == capitalize-first."""
    n = t.nation
    return n.select(
        "n_nationkey",
        F.initcap(F.lower("n_name")).alias("capped"),
        F.expr("elt((n_nationkey % 3) + 1, 'alpha', 'beta', 'gamma')").alias(
            "elt_pick"
        ),
        hc.field(F.col("n_name"), "NATION_5", "NATION_7").alias("fld"),
        F.expr("find_in_set(lower(substr(n_name, 1, 1)), 'b,c')").alias("fis"),
    )


@register(
    "fn_xpath_suite",
    oracle="""
SELECT n_nationkey,
       n_name AS x_name,
       CAST(n_nationkey AS INTEGER) AS x_key,
       CAST(n_nationkey AS VARCHAR) || '|' || n_name || '|' ||
         CAST(n_regionkey AS VARCHAR) AS x_all
FROM nation
""",
    category="scalars",
)
def fn_xpath_suite(spark, t):
    """xpath family (FunctionRegistry.java:289-297) over XML
    synthesized from nation rows. DuckDB has no xpath, but the XML is
    template-built from the same columns, so the oracle states each
    extraction's expected value directly. The xpath() array result is
    serialized with concat_ws — the driver's canonicalizer cannot sort
    array cells (CORRECTNESS_r05), so oracle-backed queries must emit
    scalar columns only (enforced in registry.py)."""
    xml = F.concat(
        F.lit("<n><k>"),
        F.col("n_nationkey").cast("string"),
        F.lit("</k><name>"),
        F.col("n_name"),
        F.lit("</name><r>"),
        F.col("n_regionkey").cast("string"),
        F.lit("</r></n>"),
    )
    return t.nation.select(
        "n_nationkey",
        F.xpath_string(xml, F.lit("n/name")).alias("x_name"),
        F.xpath_int(xml, F.lit("n/k")).alias("x_key"),
        F.concat_ws("|", F.xpath(xml, F.lit("n/*/text()"))).alias("x_all"),
    )


@register(
    "fn_interval_arith",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
       CAST(o_orderdate - INTERVAL 90 DAY AS DATE) AS minus_90d,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_95,
       CAST(last_day(o_orderdate) AS DATE) AS month_end,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       date_diff('day', o_orderdate, o_orderdate + INTERVAL 1 YEAR) AS yr_len
FROM orders WHERE o_orderkey <= 2000
""",
    category="scalars",
)
def fn_interval_arith(spark, t):
    """Interval arithmetic (+/- over date/interval,
    GenericUDFOPPlus/Minus via FunctionRegistry.java:299-300) plus
    add_months/datediff/last_day/trunc (:276-284)."""
    o = t.orders.filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.date_add("o_orderdate", 30).alias("plus_30d"),
        F.date_sub("o_orderdate", 90).alias("minus_90d"),
        F.add_months("o_orderdate", 3).alias("plus_3m"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.last_day("o_orderdate").alias("month_end"),
        F.trunc("o_orderdate", "month").alias("month_start"),
        F.datediff(
            F.col("o_orderdate") + F.expr("INTERVAL 1 YEAR"), F.col("o_orderdate")
        ).alias("yr_len"),
    )


@register(
    "fn_uniontype_encoding",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END AS tag,
       CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS num_val,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS str_val
FROM orders WHERE o_orderkey <= 2000
""",
    category="scalars",
)
def fn_uniontype_encoding(spark, t):
    """uniontype<double,string> modeled as struct(tag, field0,
    field1) per SURVEY §1.2 (StandardUnionObjectInspector) — built,
    then flattened back out so values are engine-portable."""
    o = t.orders.filter(F.col("o_orderkey") <= 2000)
    tag = (F.col("o_orderkey") % 2 != 0).cast("int")
    union = F.struct(
        tag.alias("tag"),
        F.when(tag == 0, F.col("o_totalprice")).alias("field0"),
        F.when(tag == 1, F.col("o_orderpriority")).alias("field1"),
    )
    u = o.select("o_orderkey", union.alias("u"))
    return u.select(
        "o_orderkey",
        F.col("u.tag").alias("tag"),
        F.col("u.field0").alias("num_val"),
        F.col("u.field1").alias("str_val"),
    )


@register(
    "fn_mask_suite",
    oracle="""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(c_name,
           '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
       regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
           '[0-9]', '*', 'g'), '[A-Z]', '*', 'g'), '[a-z]', '*', 'g')
         AS masked_segment
FROM customer WHERE c_custkey <= 500
""",
    category="scalars",
)
def fn_mask_suite(spark, t):
    """mask family (FunctionRegistry.java:463-468 → F.mask): default
    X/x/n masking plus custom digit masking."""
    c = t.customer.filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked"),
        F.mask(
            F.col("c_mktsegment"),
            upperChar=F.lit("*"),
            lowerChar=F.lit("*"),
            digitChar=F.lit("*"),
        ).alias("masked_segment"),
    )


@register(
    "agg_ngrams",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT g.gram
  FROM toks, UNNEST(CASE WHEN len(w) >= 2
       THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
       ELSE [] END) AS g(gram)
)
SELECT gram, COUNT(*) AS n
FROM grams GROUP BY gram
ORDER BY n DESC, gram LIMIT 20
""",
    category="aggregates",
)
def agg_ngrams(spark, t):
    """ngrams(sentences, 2, 20) equivalent (FunctionRegistry.java:385,
    GenericUDAFnGrams): top-20 bigrams by frequency, composed as
    split → explode → count (SURVEY §2.5 composition plan)."""
    def grams_of(w):
        # w bound once — closing over the filter(split()) expression
        # would re-tokenize per gram position (O(n²) per doc)
        return F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i + 1), F.element_at(w, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    toks = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    grams = F.element_at(F.transform(F.array(toks), grams_of), 1)
    return (
        t.documents.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(20)
    )


@register(
    "agg_context_ngrams",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT w[i+1] AS nxt
  FROM toks, UNNEST(range(1, len(w))) AS r(i)
  WHERE w[i] = 'the'
)
SELECT nxt, COUNT(*) AS n
FROM grams GROUP BY nxt
ORDER BY n DESC, nxt LIMIT 10
""",
    category="aggregates",
)
def agg_context_ngrams(spark, t):
    """context_ngrams(sentences, array('the', null), 10) equivalent
    (FunctionRegistry.java:386): most frequent words following
    'the'."""
    def nxt_of(w):
        # w bound once (see agg_ngrams above)
        return F.transform(
            F.filter(
                F.sequence(F.lit(1), F.greatest(F.size(w) - 1, F.lit(1))),
                lambda i: F.element_at(w, i) == "the",
            ),
            lambda i: F.element_at(w, i + 1),
        )

    toks2 = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    nxt = F.element_at(F.transform(F.array(toks2), nxt_of), 1)
    return (
        t.documents.select(F.explode(nxt).alias("nxt"))
        .groupBy("nxt")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "nxt")
        .limit(10)
    )


@register(
    "agg_histogram_numeric",
    oracle="""
SELECT CAST(10 AS INTEGER) AS n_bins,
       CAST(COUNT(*) AS BIGINT) AS y_total,
       TRUE AS x_sorted,
       TRUE AS x_in_range
FROM orders
""",
    category="aggregates",
)
def agg_histogram_numeric(spark, t):
    """histogram_numeric(o_totalprice, 10)
    (FunctionRegistry.java:380; Hive's NumericHistogram sketch =
    Spark's histogram_numeric). Bin centroids are merge-order
    dependent, so the oracle checks the sketch's exact invariants
    instead: bin count, total mass = row count, sorted centroids,
    centroids inside the data range."""
    agg = t.orders.agg(
        F.expr("histogram_numeric(o_totalprice, 10)").alias("h"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
    xs = F.expr("transform(h, b -> b.x)")
    return agg.select(
        F.size("h").alias("n_bins"),
        F.expr("CAST(round(aggregate(h, 0D, (acc, b) -> acc + b.y)) AS BIGINT)")
        .alias("y_total"),
        (xs == F.array_sort(xs)).alias("x_sorted"),
        F.expr("forall(h, b -> b.x >= lo AND b.x <= hi)").alias("x_in_range"),
    )


@register(
    "virtual_input_file_name",
    oracle="""
SELECT CAST(1 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS total_rows,
       TRUE AS all_parquet
FROM nation
""",
    category="scalars",
)
def virtual_input_file_name(spark, t):
    """INPUT__FILE__NAME virtual column (VirtualColumn.java:48) →
    F.input_file_name(). Paths are engine-specific, so the oracle
    checks the derived facts: testdata ships one parquet file per
    table, every row carries that file's name, names end .parquet."""
    return (
        t.nation.select(F.input_file_name().alias("f"))
        .agg(
            F.countDistinct("f").alias("n_files"),
            F.count(F.lit(1)).alias("total_rows"),
            F.bool_and(F.col("f").endswith(".parquet")).alias("all_parquet"),
        )
    )


@register(
    "fn_misc_math",
    oracle="""
SELECT o_orderkey,
       ROUND(cbrt(o_totalprice), 6) AS cbrt_price,
       CAST(factorial(CAST(o_orderkey % 10 AS INTEGER)) AS BIGINT) AS fact_mod,
       upper(to_hex(o_orderkey)) AS hex_key,
       strpos(o_orderpriority, '-') AS dash_pos,
       ROUND(pi(), 6) AS pi_val,
       ROUND(exp(1), 6) AS e_val,
       repeat(' ', 3) || '|' AS spaced
FROM orders WHERE o_orderkey <= 2000
""",
    category="scalars",
)
def fn_misc_math(spark, t):
    """Math/misc long tail: cbrt/factorial/conv/locate/pi/e/space
    (FunctionRegistry.java:195,220,223,414,214,219,182)."""
    o = t.orders.filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.round(F.cbrt("o_totalprice"), 6).alias("cbrt_price"),
        F.factorial((F.col("o_orderkey") % 10).cast("int")).alias("fact_mod"),
        F.conv(F.col("o_orderkey").cast("string"), 10, 16).alias("hex_key"),
        F.locate("-", F.col("o_orderpriority")).alias("dash_pos"),
        F.round(F.expr("pi()"), 6).alias("pi_val"),
        F.round(F.expr("e()"), 6).alias("e_val"),
        F.concat(F.expr("space(3)"), F.lit("|")).alias("spaced"),
    )


@register(
    "fn_datetime_parts",
    oracle="""
SELECT event_id,
       hour(CAST(ts AS TIMESTAMP)) AS h,
       minute(CAST(ts AS TIMESTAMP)) AS m,
       second(CAST(ts AS TIMESTAMP)) AS s,
       strftime(to_timestamp(3600), '%Y-%m-%d %H:%M:%S') AS from_epoch,
       dayofweek(CAST(ts AS TIMESTAMP)) % 7 + 1 AS dow,
       CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week_start
FROM events WHERE event_id <= 3000
""",
    category="scalars",
)
def fn_datetime_parts(spark, t):
    """hour/minute/second/from_unixtime/dayofweek/trunc-week
    (FunctionRegistry.java:270-273; DuckDB dayofweek is 0=Sunday vs
    Spark 1=Sunday — oracle normalizes)."""
    e = t.events.filter(F.col("event_id") <= 3000)
    return e.select(
        "event_id",
        F.hour("ts").alias("h"),
        F.minute("ts").alias("m"),
        F.second("ts").alias("s"),
        F.from_unixtime(F.lit(3600)).alias("from_epoch"),
        F.dayofweek("ts").alias("dow"),
        F.trunc("ts", "week").alias("week_start"),
    )


@register(
    "sample_percent",
    oracle="SELECT TRUE AS frac_in_bounds, TRUE AS sampled_subset",
    category="setops",
)
def sample_percent(spark, t):
    """TABLESAMPLE (n PERCENT) (FromClauseParser.g:170-179
    TOK_TABLESPLITSAMPLE) → df.sample with a fixed seed. Which rows
    land in a Bernoulli sample is engine-specific, so the oracle
    checks the derived facts: the sampled fraction is within ±3 points
    of 10% and every sampled key exists in the source (anti-join
    empty). All three inputs are 1-row aggregates — the cross joins
    are broadcast-scalar, not a real cartesian."""
    sampled = t.orders.sample(fraction=0.1, seed=42).select(
        "o_orderkey", "o_totalprice"
    )
    n_s = sampled.agg(F.count(F.lit(1)).alias("ns"))
    n_t = t.orders.agg(F.count(F.lit(1)).alias("nt"))
    stray = (
        sampled.join(t.orders, "o_orderkey", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_stray"))
    )
    frac = F.col("ns") / F.col("nt")
    return (
        n_s.crossJoin(n_t)
        .crossJoin(stray)
        .select(
            ((frac >= 0.07) & (frac <= 0.13)).alias("frac_in_bounds"),
            (F.col("n_stray") == 0).alias("sampled_subset"),
        )
    )


@register(
    "fn_crypto_roundtrip",
    oracle="""
SELECT n_nationkey,
       n_name AS aes_roundtrip,
       n_name AS b64_roundtrip,
       n_name AS hex_roundtrip,
       n_name AS enc_roundtrip
FROM nation
""",
    category="scalars",
)
def fn_crypto_roundtrip(spark, t):
    """aes_encrypt/aes_decrypt, base64/unbase64, hex/unhex,
    encode/decode round-trips (FunctionRegistry.java:225-237) — each
    pair must reproduce its input, so the oracle is the identity."""
    key = F.lit("0123456789abcdef")  # 128-bit AES key
    name = F.col("n_name")
    return t.nation.select(
        "n_nationkey",
        F.aes_decrypt(
            F.aes_encrypt(name, key, F.lit("ECB")), key, F.lit("ECB")
        )
        .cast("string")
        .alias("aes_roundtrip"),
        F.unbase64(F.base64(name.cast("binary"))).cast("string").alias(
            "b64_roundtrip"
        ),
        F.unhex(F.hex(name)).cast("string").alias("hex_roundtrip"),
        F.decode(F.encode(name, "UTF-8"), "UTF-8").alias("enc_roundtrip"),
    )


@register(
    "fn_hash_extra",
    oracle=f"""
SELECT n.n_nationkey,
       CAST(g.crc AS BIGINT) AS crc,
       g.sha1_hex AS sha1_hex,
       CAST(g.xx64 AS BIGINT) AS xx64,
       CAST(g.murmur AS INTEGER) AS murmur
FROM nation n
LEFT JOIN (VALUES
  {_nation_hash_values()}
) AS g(name, crc, sha1_hex, xx64, murmur) ON n.n_name = g.name
""",
    category="scalars",
)
def fn_hash_extra(spark, t):
    """crc32/sha1/xxhash64/hash (FunctionRegistry.java:221,231-232,
    409). Hive's hash() uses Java hashCode conventions; Spark's
    Murmur3 differs — documented divergence (SURVEY §2.9), only
    observable if hashes are persisted. The oracle verifies every
    value against independent implementations (zlib crc32, hashlib
    sha1, functions/pyhash murmur3+xxh64) over the fixed nation
    names."""
    return t.nation.select(
        "n_nationkey",
        F.crc32(F.col("n_name").cast("binary")).alias("crc"),
        F.sha1(F.col("n_name").cast("binary")).alias("sha1_hex"),
        F.xxhash64("n_name").alias("xx64"),
        F.hash("n_name").alias("murmur"),
    )


@register(
    "fn_date_tail",
    oracle="""
SELECT o_orderkey,
       o_orderdate,
       CAST(o_orderdate
            + INTERVAL ((7 + 1 - isodow(o_orderdate) - 1) % 7 + 1) DAY
            AS DATE) AS next_monday,
       ROUND((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1)
             + (day(o_orderdate) - 1) / 31.0, 6) AS mb,
       CAST(timezone('America/New_York',
                     CAST(CAST(o_orderdate AS TIMESTAMP) AS TIMESTAMPTZ))
            AS TIMESTAMP) AS ny_time,
       CAST(timezone('Asia/Tokyo', CAST(o_orderdate AS TIMESTAMP))
            AS TIMESTAMP) AS from_tokyo
FROM orders WHERE o_orderkey <= 100
""",
    category="scalars",
)
def fn_date_tail(spark, t):
    """next_day / months_between / from_utc_timestamp /
    to_utc_timestamp (FunctionRegistry.java:277,285,427-428). The
    oracle derives next-Monday from isodow arithmetic, months_between
    from the documented 31-day-month formula (day-of-month 1 anchor →
    the same-day/last-day special cases coincide with the formula),
    and the zone shifts via timezone() with explicit TIMESTAMPTZ
    casts."""
    o = t.orders.filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.next_day("o_orderdate", "Mon").alias("next_monday"),
        F.round(
            F.months_between(F.col("o_orderdate"), F.lit("1995-01-01")), 6
        ).alias("mb"),
        F.from_utc_timestamp("o_orderdate", "America/New_York").alias("ny_time"),
        F.to_utc_timestamp("o_orderdate", "Asia/Tokyo").alias("from_tokyo"),
    )


_FIRST_WORD_SQL = r"regexp_extract(trim(text), '^\S+')"

_SENTENCES_SOUNDEX_ORACLE = (
    "SELECT doc_id,\n"
    r"       array_to_string(regexp_split_to_array(trim(text), '\s+'), '|')"
    " AS sent_tokens,\n"
    f"       {_soundex_sql(_FIRST_WORD_SQL)} AS first_word_soundex\n"
    "FROM documents WHERE doc_id < 50"
)


@register(
    "fn_sentences_soundex",
    oracle=_SENTENCES_SOUNDEX_ORACLE,
    category="scalars",
)
def fn_sentences_soundex(spark, t):
    """sentences() tokenizer (FunctionRegistry.java:419) and
    soundex (:188) over document text. The corpus text is punctuation-
    free space-separated words, so sentences() yields exactly one
    sentence of whitespace tokens — statable in SQL — and soundex is
    reproduced by a generated replace-chain (_soundex_sql). The
    array<array<string>> result is flattened and joined with '|': the
    driver's canonicalizer cannot sort array cells (CORRECTNESS_r05),
    so oracle-backed queries emit scalar columns only."""
    return t.documents.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.concat_ws("|", F.flatten(F.sentences(F.col("text")))).alias(
            "sent_tokens"
        ),
        F.soundex(F.split(F.col("text"), " ").getItem(0)).alias(
            "first_word_soundex"
        ),
    )


@register(
    "fn_char_varchar",
    oracle="""
SELECT n_nationkey,
       substr(n_name, 1, 6) AS vc6,
       substr(n_name, 1, 64) AS vc64,
       rpad(substr(n_name, 1, 6), 6, ' ') AS ch6,
       rpad(substr(n_name, 1, 12), 12, ' ') AS ch12,
       length(rpad(substr(n_name, 1, 12), 12, ' ')) AS ch12_len,
       rpad(substr(CAST(NULL AS VARCHAR), 1, 4), 4, ' ') AS ch_null
FROM nation
""",
    category="scalars",
)
def fn_char_varchar(spark, t):
    """char(n)/varchar(n) length semantics (reference
    ``serde/.../typeinfo/CharTypeInfo.java:50``,
    ``VarcharTypeInfo.java:51``): varchar truncates past n, char
    truncates then blank-pads to exactly n, NULL propagates. Spark 4
    casts don't enforce length outside table writes, so the engine
    ships explicit shims (functions/hive_compat.cast_char/
    cast_varchar); the oracle spells out the same substr/rpad."""
    name = F.col("n_name")
    return t.nation.select(
        "n_nationkey",
        hc.cast_varchar(name, 6).alias("vc6"),      # truncation
        hc.cast_varchar(name, 64).alias("vc64"),    # shorter than n: unchanged
        hc.cast_char(name, 6).alias("ch6"),         # truncate, no pad needed
        hc.cast_char(name, 12).alias("ch12"),       # pad to 12
        F.length(hc.cast_char(name, 12)).alias("ch12_len"),
        hc.cast_char(F.lit(None).cast("string"), 4).alias("ch_null"),
    )


@register(
    "fn_decimal_division",
    oracle="""
SELECT l_orderkey, l_linenumber,
       'decimal(27,15)' AS spark_result_type,
       CAST(((2 * CAST(round(l_extendedprice * 100) AS HUGEINT) * 1000000
              + CAST(round(l_quantity * 100) AS HUGEINT))
             // (2 * CAST(round(l_quantity * 100) AS HUGEINT)))
            AS DOUBLE) / 1000000.0 AS unit_price
FROM lineitem
WHERE l_orderkey < 2000
""",
    category="scalars",
)
def fn_decimal_division(spark, t):
    """Decimal division scale promotion (reference
    ``ql/.../udf/generic/GenericUDFOPDivide.java`` deriveResultDecimal
    TypeInfo): decimal(12,2)/decimal(12,2) must yield decimal(27,15)
    — precision p1-s1+s2+max(6, s1+p2+1), scale max(6, s1+p2+1).
    Spark implements exactly Hive's rule; the query asserts the
    result type at plan time, then emits the value rounded half-up to
    6 via a (38,6) cast. DuckDB divides decimals in double space, so
    the oracle reproduces exact half-up rounding with integer math:
    floor((2*p*10^6 + q) / (2*q)) on cent-scaled HUGEINTs."""
    li = t.lineitem.filter(F.col("l_orderkey") < 2000)
    p = F.col("l_extendedprice").cast("decimal(12,2)")
    q = F.col("l_quantity").cast("decimal(12,2)")
    quot = p / q
    df = li.select(
        "l_orderkey",
        "l_linenumber",
        F.lit("decimal(27,15)").alias("spark_result_type"),
        quot.cast("decimal(38,6)").cast("double").alias("unit_price"),
    )
    # Pin Hive's scale-promotion rule: if a Spark upgrade changes the
    # division result type, fail here, not with a silent value drift.
    observed = dict(li.select(quot.alias("_q")).dtypes)["_q"]
    assert observed == "decimal(27,15)", observed
    return df


@register(
    "sample_rows",
    oracle="""
SELECT CAST(least(500, (SELECT count(*) FROM orders)) AS BIGINT) AS n_rows
""",
    category="setops",
)
def sample_rows(spark, t):
    """TABLESAMPLE(n ROWS) (reference ``parse/FromClauseParser.g:
    170-179`` TOK_TABLESPLITSAMPLE rows form): take n arbitrary rows
    — Hive serves the first n per input split; ``df.limit(n)`` is the
    Spark analogue (LocalLimit per partition, then GlobalLimit,
    without reading remaining splits). WHICH rows is engine-defined,
    so the oracle-checked result is the row count of the sample."""
    return t.orders.limit(500).agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "fn_decimal_round",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(round(CAST(l_quantity / 2 AS DECIMAL(10,1)), 0) AS DOUBLE) AS half_up_dec,
       CAST(round_even(CAST(l_quantity / 2 AS DECIMAL(10,1)), 0) AS DOUBLE) AS half_even_dec,
       CAST(floor(l_quantity / 2 + 0.5) AS DOUBLE) AS half_up_dbl,
       CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), -2) AS DOUBLE) AS neg_scale_dec,
       CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS one_dec
FROM lineitem WHERE l_orderkey < 500
""",
    category="scalars",
)
def fn_decimal_round(spark, t):
    """round (HALF_UP, away from zero — Hive
    ``udf/generic/GenericUDFRound.java``) vs bround (HALF_EVEN,
    banker's — ``GenericUDFBRound.java``) on decimals, plus
    negative-scale rounding. l_quantity/2 lands exactly on .5
    boundaries, so the two modes visibly diverge; DuckDB's
    round/round_even on DECIMAL have the same semantics, making this
    hash-checkable. On DOUBLE the engines diverge (DuckDB round is
    banker's, Spark/Hive is HALF_UP — verdict r5 #1), so the oracle
    spells out half-up explicitly via floor(x + 0.5) (non-negative
    inputs here). Both sides cast the decimal results to DOUBLE for
    the compare — DuckDB's round_even(DECIMAL) returns DOUBLE while
    Spark's bround returns DECIMAL (verdict r6 #1's red row), so the
    rounding happens in the decimal domain and only the comparison
    is in doubles (values ≤ ~10^5, exact in float64)."""
    li = t.lineitem.filter(F.col("l_orderkey") < 500)
    half = (F.col("l_quantity") / 2).cast("decimal(10,1)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(half, 0).cast("double").alias("half_up_dec"),
        F.bround(half, 0).cast("double").alias("half_even_dec"),
        F.round(F.col("l_quantity") / 2).alias("half_up_dbl"),
        F.round(price, -2).cast("double").alias("neg_scale_dec"),
        F.round(price, 1).cast("double").alias("one_dec"),
    )


@register(
    "fn_java_hashcode",
    oracle="""
WITH folded AS (
  SELECT p_partkey,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(p_name, ''),
                            c -> CAST(ascii(c) AS BIGINT))),
           (h, c) -> (h * 31 + c) % 4294967296) AS hm
  FROM part WHERE p_partkey <= 200
)
SELECT p_partkey,
       CAST(CASE WHEN hm >= 2147483648 THEN hm - 4294967296 ELSE hm END
            AS BIGINT) AS hive_hash
FROM folded
""",
    category="scalar",
)
def fn_java_hashcode(spark, t):
    """Hive's hash() on strings is Java String.hashCode (reference
    ``ql/.../udf/generic/GenericUDFHash.java`` →
    ``ObjectInspectorUtils.hashCode``): h = h*31 + char. Spark's
    built-in hash() is Murmur3 — NOT compatible — so parity needs the
    fold spelled out (functions/hive_compat.java_hash_string: UTF-16
    code-unit fold in mod-2^32 bigint space, JDK-pinned incl.
    non-BMP), then re-sign to int32. Pure codegen'd expression; the
    oracle runs the matching fold in DuckDB lambda SQL (codepoint
    form — identical on this ASCII column)."""
    p = t.part.filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        hc.resign32(hc.java_hash_string(F.col("p_name"))).alias("hive_hash"),
    )


@register(
    "fn_reflect_suite",
    oracle="""
SELECT p_partkey,
       CAST(p_partkey AS VARCHAR) AS str_of,
       bin(CAST(p_partkey AS INT)) AS bin_str,
       sqrt(CAST(p_retailprice AS DOUBLE)) AS sqrt_price
FROM part WHERE p_partkey <= 100
""",
    category="scalar",
)
def fn_reflect_suite(spark, t):
    """Hive's reflect()/java_method() UDFs (reference
    ``ql/.../udf/generic/GenericUDFReflect.java``) exist natively in
    Spark as CallMethodViaReflection — same name, same semantics.
    Exercised against JDK methods with engine-independent results
    (String.valueOf, Integer.toBinaryString, Math.sqrt)."""
    p = t.part.filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.reflect(
            F.lit("java.lang.String"), F.lit("valueOf"),
            F.col("p_partkey").cast("int"),
        ).alias("str_of"),
        F.java_method(
            F.lit("java.lang.Integer"), F.lit("toBinaryString"),
            F.col("p_partkey").cast("int"),
        ).alias("bin_str"),
        F.reflect(
            F.lit("java.lang.Math"), F.lit("sqrt"),
            F.col("p_retailprice").cast("double"),
        ).cast("double").alias("sqrt_price"),
    )


@register(
    "fn_format_number",
    oracle="""
WITH d AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS p
  FROM lineitem WHERE l_orderkey < 200
)
SELECT l_orderkey, l_linenumber,
       format('{:,}', CAST(trunc(p) AS BIGINT)) || '.' ||
       lpad(CAST(CAST(p * 100 AS BIGINT) % 100 AS VARCHAR), 2, '0')
         AS pretty
FROM d
""",
    category="scalar",
)
def fn_format_number(spark, t):
    """format_number (Hive ``udf/generic/GenericUDFFormatNumber.java``):
    thousands-grouped fixed-decimal rendering. Input routed through
    DECIMAL(12,2) so no rounding happens at format time on either
    engine — the oracle reconstructs the grouped string from exact
    integer math (DuckDB's fmt can't comma-group floats)."""
    li = t.lineitem.filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.format_number(
            F.col("l_extendedprice").cast("decimal(12,2)"), 2
        ).alias("pretty"),
    )


@register(
    "agg_hll_sketch",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv_parts_exact,
       TRUE AS within_5pct
FROM lineitem GROUP BY l_returnflag
""",
    category="aggregates",
)
def agg_hll_sketch(spark, t):
    """Mergeable NDV sketches (Hive compute_stats' FM-sketch NDV,
    ``ql/.../udf/generic/GenericUDAFComputeStats.java``, modernized
    to DataSketches HLL): per-group sketch aggregation whose partial
    states union associatively — the property that lets 1000
    executors estimate distinct counts with one tiny shuffle
    (a few KB per sketch, vs the exact path's one row per distinct
    value). The estimate itself is sketch-parameter specific, so the
    oracle checks the exact NDV plus a 5%-relative-error bound on the
    estimate (DataSketches lgK=12 default → ~1.6% RSE; 5% is >3
    sigma). Accuracy + partition invariance also pinned in
    tests/test_corpus.py::test_hll_sketch_accuracy_and_invariance."""
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").alias(
                "est"
            ),
            F.countDistinct("l_partkey").alias("ndv_parts_exact"),
        )
        .select(
            "l_returnflag",
            "ndv_parts_exact",
            (
                F.abs(F.col("est") - F.col("ndv_parts_exact"))
                / F.col("ndv_parts_exact")
                <= 0.05
            ).alias("within_5pct"),
        )
    )


@register(
    "fn_next_day_tz_suite",
    oracle="""
SELECT event_id,
       CAST(CAST(ts AS DATE)
            + INTERVAL ((7 + 1 - isodow(CAST(ts AS DATE)) - 1) % 7 + 1) DAY
            AS DATE) AS next_mon,
       CAST(timezone('America/Los_Angeles', CAST(CAST(ts AS TIMESTAMP) AS TIMESTAMPTZ))
            AS TIMESTAMP) AS la_local,
       CAST(timezone('America/Los_Angeles', CAST(ts AS TIMESTAMP))
            AS TIMESTAMP) AS assume_la_utc
FROM events WHERE event_id < 200
""",
    category="scalar",
)
def fn_next_day_tz_suite(spark, t):
    """next_day + from/to_utc_timestamp with value-checked oracles
    (upgrades the rows-only date tail): Hive GenericUDFNextDay +
    GenericUDFFromUtcTimestamp/ToUtcTimestamp. The DuckDB twin
    derives next-Monday from isodow arithmetic and the zone shifts
    via timezone() with explicit TIMESTAMPTZ casts (UTC session on
    both engines; January data — no DST boundary in range)."""
    e = t.events.filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.next_day(F.col("ts"), "MON").alias("next_mon"),
        F.from_utc_timestamp(F.col("ts"), "America/Los_Angeles").alias(
            "la_local"
        ),
        F.to_utc_timestamp(F.col("ts"), "America/Los_Angeles").alias(
            "assume_la_utc"
        ),
    )


@register(
    "fn_in_file",
    oracle="""
SELECT n_name,
       n_name IN ('ALGERIA', 'BRAZIL', 'CHINA', 'NO SUCH NATION')
           AS in_file
FROM nation
""",
    category="scalar",
)
def fn_in_file(spark, t):
    """Hive in_file(str, filename) (FunctionRegistry.java:412,
    GenericUDFInFile.java) — closes the one documented §2.9 skip.
    The line file is materialized at plan time, loaded once, and
    broadcast — never read per row. The oracle restates membership as
    an IN list over the same line set."""
    import os
    import tempfile

    from ..functions.hive_compat import in_file

    path = os.path.join(
        tempfile.gettempdir(), "hdp25_in_file_fixture.txt"
    )
    if not os.path.exists(path):
        with open(path, "w") as fh:
            fh.write("ALGERIA\nBRAZIL\nCHINA\nNO SUCH NATION\n")
    return in_file(t.nation.select("n_name"), "n_name", path)


@register(
    "virtual_row_offset",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
       CAST(0 AS BIGINT) AS min_off,
       CAST(COUNT(*) - 1 AS BIGINT) AS max_off,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_off,
       CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS sum_off
FROM orders
""",
    category="scalars",
)
def virtual_row_offset(spark, t):
    """BLOCK__OFFSET__INSIDE__FILE / ROW__OFFSET__INSIDE__BLOCK
    (VirtualColumn.java:49-50) — previously documented as skipped;
    Spark's parquet ``_metadata.row_index`` hidden column provides
    the same per-file row-position fact. Row order is engine
    internal, so the oracle pins the derived invariants: offsets are
    dense 0..N-1 (min/max/distinct/sum all follow the closed form) —
    any off-by-one, duplicate, or gap breaks at least one aggregate.
    Reads the parquet path directly: hidden metadata columns attach
    to file scans, not views."""
    import os

    orders = spark.read.parquet(os.path.join(t.sf_dir, "orders.parquet"))
    off = orders.select(F.col("_metadata.row_index").alias("off"))
    return off.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.min("off").alias("min_off"),
        F.max("off").alias("max_off"),
        F.countDistinct("off").alias("n_distinct_off"),
        F.sum("off").alias("sum_off"),
    )


_STR_HASH_SQL = """list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(o_orderstatus, ''),
                            c -> CAST(ascii(c) AS BIGINT))),
           (h, c) -> (h * 31 + c) % 4294967296)"""


@register(
    "fn_hash_multiarg",
    oracle=f"""
WITH h AS (
  SELECT o_orderkey,
         CAST(o_custkey AS BIGINT) AS h_int_u,
         xor(CAST(o_orderkey AS BIGINT),
             CAST(o_orderkey AS BIGINT) >> 32) % 4294967296 AS h_long_u,
         CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1231 ELSE 1237 END
              AS BIGINT) AS h_bool_u,
         {_STR_HASH_SQL} AS h_str_u
  FROM orders WHERE o_orderkey <= 2000
),
f AS (
  SELECT *,
         ((((h_int_u * 31 + h_long_u) % 4294967296) * 31 + h_bool_u)
            % 4294967296 * 31 + h_str_u) % 4294967296 AS multi_u
  FROM h
)
SELECT o_orderkey,
       CAST(CASE WHEN h_int_u >= 2147483648 THEN h_int_u - 4294967296
                 ELSE h_int_u END AS BIGINT) AS h_int,
       CAST(CASE WHEN h_long_u >= 2147483648 THEN h_long_u - 4294967296
                 ELSE h_long_u END AS BIGINT) AS h_long,
       CAST(h_bool_u AS BIGINT) AS h_bool,
       CAST(CASE WHEN h_str_u >= 2147483648 THEN h_str_u - 4294967296
                 ELSE h_str_u END AS BIGINT) AS h_str,
       CAST(CASE WHEN multi_u >= 2147483648 THEN multi_u - 4294967296
                 ELSE multi_u END AS BIGINT) AS h_multi
FROM f
""",
    category="scalars",
)
def fn_hash_multiarg(spark, t):
    """Hive hash() parity BEYOND strings (closes verdict-r5 gap #4;
    reference ``ql/.../udf/generic/GenericUDFHash.java`` →
    ``serde2/.../ObjectInspectorUtils.hashCode``): int hashes as
    identity, bigint as (int)(v ^ (v >>> 32)), boolean as 1231/1237,
    string as the *31 char fold, and multi-argument hash(a,b,c,d)
    folds component hashes with r = r*31 + h — the same fold Hive
    applies to struct fields. All pure codegen'd column algebra in
    unsigned mod-2^32 space (functions/hive_compat.java_hash_*); the
    oracle spells out identical integer algebra in DuckDB."""
    o = t.orders.filter(F.col("o_orderkey") <= 2000)
    h_int = hc.java_hash_int(F.col("o_custkey"))
    h_long = hc.java_hash_long(F.col("o_orderkey"))
    h_bool = hc.java_hash_bool(F.col("o_orderkey") % 2 == 0)
    h_str = hc.java_hash_string(F.col("o_orderstatus"))
    return o.select(
        "o_orderkey",
        hc.resign32(h_int).alias("h_int"),
        hc.resign32(h_long).alias("h_long"),
        h_bool.alias("h_bool"),
        hc.resign32(h_str).alias("h_str"),
        hc.java_hash_fold(h_int, h_long, h_bool, h_str).alias("h_multi"),
    )


@register(
    "fn_context_aliases",
    oracle="""
SELECT CAST(3 AS BIGINT) AS ceiling_val,
       lcase('AbC') AS lcase_val,
       (current_date >= DATE '2026-01-01') AS date_after_2026,
       (current_timestamp >= TIMESTAMP '2026-01-01') AS ts_after_2026,
       (length(current_database()) > 0) AS has_db,
       TRUE AS user_known,
       CAST(NULL AS VARCHAR) AS assert_ok,
       CAST(1704164645 AS BIGINT) AS unix_val,
       CAST(1.5 AS DOUBLE) AS xf,
       CAST(1.5 AS DOUBLE) AS xn,
       CAST(7 AS INTEGER) AS xs
""",
    category="scalars",
)
def fn_context_aliases(spark, t):
    """The tail of FunctionRegistry.java the other scalar suites
    didn't spell by NAME: alias registrations (``ceiling``→ceil,
    ``lcase``→lower, ``to_unix_timestamp``→unix_timestamp,
    ``xpath_float/xpath_number/xpath_short``) and the session-context
    UDFs (``current_date/current_timestamp/current_database/
    current_user`` — GenericUDFCurrent*.java) plus ``assert_true``.
    Every expression below is the HiveQL NAME, evaluated by Spark's
    own builtin of the same name; context values are asserted by
    stable predicates (a date/timestamp lower bound, nonempty
    database, non-null user) because their literal values are
    session-dependent by definition."""
    return spark.sql(
        """
SELECT CAST(ceiling(2.3) AS BIGINT)                       AS ceiling_val,
       lcase('AbC')                                       AS lcase_val,
       current_date() >= DATE '2026-01-01'                AS date_after_2026,
       current_timestamp() >= TIMESTAMP '2026-01-01'      AS ts_after_2026,
       length(current_database()) > 0                     AS has_db,
       current_user() IS NOT NULL                         AS user_known,
       CAST(assert_true(2 > 1) AS STRING)                 AS assert_ok,
       to_unix_timestamp('2024-01-02 03:04:05')           AS unix_val,
       CAST(xpath_float('<a><b>1.5</b></a>', 'sum(a/b)') AS DOUBLE)  AS xf,
       CAST(xpath_number('<a><b>1.5</b></a>', 'sum(a/b)') AS DOUBLE) AS xn,
       CAST(xpath_short('<a><b>7</b></a>', 'sum(a/b)') AS INT)       AS xs
"""
    )
