"""Negative tests (clientnegative corpus analogue, SURVEY §5):
errors error, and Hive's NULL-not-error semantics hold where the
reference is lenient."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import functions as F


def test_unknown_column_rejected(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    with pytest.raises(AnalysisException):
        df.select("no_such_column").collect()


def test_unknown_table_rejected(spark):
    with pytest.raises(AnalysisException):
        spark.sql("SELECT * FROM definitely_not_a_table_xyz").collect()


def test_bad_cast_yields_null_not_error(spark):
    """Hive cast-failure semantics: NULL, never an exception
    (session pins spark.sql.ansi.enabled=false)."""
    df = spark.createDataFrame([("abc",), ("12",), (None,)], "s string")
    got = [r.i for r in df.select(F.col("s").cast("int").alias("i")).collect()]
    assert got == [None, 12, None]


def test_divide_by_zero_yields_null(spark):
    df = spark.createDataFrame([(1.0, 0.0)], "a double, b double")
    assert df.select((F.col("a") / F.col("b")).alias("q")).first().q is None


def test_arithmetic_overflow_wraps_not_errors(spark):
    """Non-ANSI long arithmetic wraps (Java semantics) — the behavior
    the minhash permutation family relies on."""
    df = spark.createDataFrame([(2**62,)], "v long")
    r = df.select((F.col("v") * F.lit(4)).alias("m")).first()
    assert r.m == 0  # 2^64 wraps to 0 in two's complement


def test_duplicate_query_name_rejected():
    from hdp2_5_hive_spark.queries import load_all
    from hdp2_5_hive_spark.queries.registry import register

    load_all()
    with pytest.raises(ValueError):
        register("q1_pricing_summary")(lambda spark, t: None)


def test_unknown_catalog_table_rejected(spark):
    from hdp2_5_hive_spark.catalog import load_table

    with pytest.raises(KeyError):
        load_table(spark, "/root/testdata/sf0.001", "nope")
