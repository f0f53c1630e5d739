"""Value assertions for scalar queries whose oracle is rows-only
(DuckDB lacks the function): xpath family, histogram_numeric."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp2_5_hive_spark.queries import query_map


def test_xpath_values(spark):
    out = query_map()["fn_xpath_suite"](spark, "/root/testdata/sf0.001")
    rows = {r.n_nationkey: r for r in out.collect()}
    some_key = next(iter(rows))
    r = rows[some_key]
    assert r.x_key == some_key
    assert isinstance(r.x_name, str) and len(r.x_name) > 0
    # n/*/text() yields [key, name, regionkey] in document order,
    # serialized '|'-joined (driver canonicalizer rejects arrays)
    parts = r.x_all.split("|")
    assert parts[0] == str(some_key)
    assert parts[1] == r.x_name
    assert len(parts) == 3


def test_histogram_numeric_shape(spark):
    out = query_map()["agg_histogram_numeric"](spark, "/root/testdata/sf0.001")
    r = out.first()
    n_orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).count()
    assert r.n_bins == 10
    assert r.y_total == n_orders
    assert r.x_sorted and r.x_in_range


def test_field_semantics(spark):
    from hdp2_5_hive_spark.functions.hive_compat import field

    df = spark.createDataFrame([("b",), ("z",), (None,)], "x string")
    got = [
        r.i for r in df.select(field(F.col("x"), "a", "b", "c").alias("i")).collect()
    ]
    assert got[0] == 2  # 1-based hit
    assert got[1] == 0  # absent → 0


def test_hash_extra_known_values(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    r = df.select(
        F.crc32(F.col("s").cast("binary")).alias("crc"),
        F.sha1(F.col("s").cast("binary")).alias("sha"),
    ).first()
    assert r.crc == 891568578  # public CRC-32 of "abc"
    assert r.sha == "a9993e364706816aba3e25717850c26c9cd0d89d"  # SHA-1("abc")


def test_date_tail_known_values(spark):
    from datetime import date

    df = spark.createDataFrame([(date(1995, 6, 15),)], "d date")
    r = df.select(
        F.next_day("d", "Mon").alias("nm"),
        F.months_between(F.lit("1995-08-15").cast("date"), F.col("d")).alias(
            "mb"
        ),
        F.from_utc_timestamp(
            F.lit("1995-06-15 12:00:00").cast("timestamp"), "America/New_York"
        ).alias("ny"),
    ).first()
    assert str(r.nm) == "1995-06-19"  # 1995-06-15 is a Thursday
    assert abs(r.mb - 2.0) < 1e-9
    assert str(r.ny) == "1995-06-15 08:00:00"  # EDT = UTC-4


def test_sentences_soundex(spark):
    df = spark.createDataFrame(
        [("Hello world. Second sentence here.", "Robert")], "t string, n string"
    )
    r = df.select(
        F.sentences("t").alias("s"), F.soundex("n").alias("sx")
    ).first()
    assert r.s == [["Hello", "world"], ["Second", "sentence", "here"]]
    assert r.sx == "R163"  # published soundex of Robert


def test_pyhash_matches_engine(spark):
    """functions/pyhash reference implementations (pure-Python
    Murmur3-x86-32 JVM-tail variant + canonical XXH64) match the
    engine's hash()/xxhash64() bit-for-bit — the independence that
    makes the fn_hash_extra oracle a real cross-check."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hdp2_5_hive_spark.functions.pyhash import murmur3_32, xxhash64

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(max_size=48), min_size=1, max_size=8))
    def check(words):
        df = spark.createDataFrame([(w,) for w in words], "w string")
        for r in df.select(
            "w", F.hash("w").alias("m"), F.xxhash64("w").alias("x")
        ).collect():
            b = r.w.encode("utf-8")
            assert murmur3_32(b) == r.m, r.w
            assert xxhash64(b) == r.x, r.w

    check()


def test_soundex_sql_matches_engine(spark):
    """The generated DuckDB soundex replace-chain reproduces the
    engine's soundex() on names exercising the h/w-coalescing and
    vowel-separator rules."""
    import duckdb

    from hdp2_5_hive_spark.queries.scalars2 import _soundex_sql

    names = [
        "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
        "Pfister", "Honeyman", "what", "the", "a", "key", "agg",
        "scan", "window", "spark", "Jackson", "Wheeler", "Hsu",
    ]
    df = spark.createDataFrame([(n,) for n in names], "w string")
    engine = {r.w: r.sx for r in df.select("w", F.soundex("w").alias("sx")).collect()}
    con = duckdb.connect()
    names_sql = ", ".join(f"'{n}'" for n in names)
    sql = f"SELECT w, {_soundex_sql('w')} AS sx FROM (SELECT unnest([{names_sql}]) AS w)"
    oracle = dict(con.execute(sql).fetchall())
    assert engine == oracle


def test_java_hash_helpers_match_jdk(spark):
    """functions/hive_compat.java_hash_* vs the JDK's own static
    hashCode methods called through reflection — independent ground
    truth for the fn_hash_multiarg algebra (Hive's
    ObjectInspectorUtils.hashCode delegates to exactly these)."""
    from hdp2_5_hive_spark.functions import hive_compat as hc

    df = spark.createDataFrame(
        [(-2147483648, -9223372036854775808, False, ""),
         (-1, -1, True, "Pending"),
         (0, 0, False, "O"),
         (7, 42, False, "\U0001D11E clef \u00e9\u4e2d"),
         (123456789, 9223372036854775807, True, "hash me 42!")],
        "i int, l long, b boolean, s string",
    )
    rows = df.select(
        hc.resign32(hc.java_hash_int(F.col("i"))).alias("hi"),
        F.java_method(F.lit("java.lang.Integer"), F.lit("hashCode"),
                      F.col("i")).cast("long").alias("ji"),
        hc.resign32(hc.java_hash_long(F.col("l"))).alias("hl"),
        F.java_method(F.lit("java.lang.Long"), F.lit("hashCode"),
                      F.col("l")).cast("long").alias("jl"),
        hc.java_hash_bool(F.col("b")).alias("hb"),
        F.java_method(F.lit("java.lang.Boolean"), F.lit("hashCode"),
                      F.col("b")).cast("long").alias("jb"),
        hc.resign32(hc.java_hash_string(F.col("s"))).alias("hs"),
        F.java_method(F.lit("java.util.Objects"), F.lit("hashCode"),
                      F.col("s")).cast("long").alias("js"),
    ).collect()
    for r in rows:
        assert r.hi == r.ji and r.hl == r.jl
        assert r.hb == r.jb and r.hs == r.js  # incl. non-BMP string
    # NULL boolean must hash to NULL (fold turns it into 0)
    from pyspark.sql import Row
    nb = spark.createDataFrame([Row(b=None)], "b boolean").select(
        hc.java_hash_bool(F.col("b")).alias("h")
    ).first()
    assert nb.h is None


def test_java_hash_double_matches_jdk(spark):
    from hdp2_5_hive_spark.functions import hive_compat as hc

    df = spark.createDataFrame(
        [(0.0,), (-0.0,), (1.5,), (-273.15,), (float("inf",),),
         (float("nan"),), (2.2250738585072014e-308,)],
        "d double",
    )
    rows = df.select(
        hc.resign32(hc.java_hash_double(F.col("d"))).alias("h"),
        F.java_method(F.lit("java.lang.Double"), F.lit("hashCode"),
                      F.col("d")).cast("long").alias("j"),
    ).collect()
    for r in rows:
        assert r.h == r.j


def test_java_hash_fold_null_is_zero(spark):
    """ObjectInspectorUtils.hashCode(null) == 0: a NULL component
    contributes 0 to the 31-fold, not NULL-poisoning the result."""
    from hdp2_5_hive_spark.functions import hive_compat as hc

    df = spark.createDataFrame([(None, 7)], "s string, i int")
    r = df.select(
        hc.java_hash_fold(
            hc.java_hash_string(F.col("s")), hc.java_hash_int(F.col("i"))
        ).alias("h")
    ).first()
    # r = ((0*31 + 0)*31 + 7) = 7
    assert r.h == 7


def test_field_null_needle_is_zero(spark):
    """Regression: FIELD(NULL, ...) must be 0 (GenericUDFField /
    MySQL), not NULL — array_position propagates a null needle."""
    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.functions import hive_compat as hc

    df = spark.createDataFrame([("a",), (None,)], "c string")
    got = {
        (r.c,): r.f
        for r in df.select(
            "c", hc.field(F.col("c"), "a", "b").alias("f")
        ).collect()
    }
    assert got[("a",)] == 1
    assert got[(None,)] == 0
