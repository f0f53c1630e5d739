"""Extension-surface unit tests (§2.12): edge cases the oracle
queries don't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp2_5_hive_spark.functions import extensions as ext


def test_zscore_single_row_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 4.0)], "g string, v double"
    )
    rows = {
        (r.g, r.v): r.zscore
        for r in ext.zscore_per_group(df, "g", "v").collect()
    }
    assert rows[("a", 1.0)] == 0.0  # singleton group → 0, not NaN
    assert rows[("b", 2.0)] == -1.0
    assert rows[("b", 4.0)] == 1.0


def test_zscore_does_not_mutate_input_schema(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    ext.zscore_per_group(df, "g", "v")
    assert df.columns == ["g", "v"]


def test_udtf_positions_are_token_order(spark):
    df = spark.createDataFrame([(1, "Alpha beta  gamma")], "doc_id int, text string")
    out = ext.explode_words_udtf(df, "doc_id", "text").orderBy("pos").collect()
    assert [(r.pos, r.word) for r in out] == [
        (0, "alpha"),
        (1, "beta"),
        (2, "gamma"),
    ]


def test_udtf_empty_text_emits_no_rows(spark):
    df = spark.createDataFrame([(1, ""), (2, "one")], "doc_id int, text string")
    out = ext.explode_words_udtf(df, "doc_id", "text").collect()
    assert [(r.doc_id, r.word) for r in out] == [(2, "one")]


def test_transform_using_cat_identity(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k int, s string")
    out = ext.transform_using(
        df, "t_cat", "k, s", "cat", "k string, s string"
    ).collect()
    assert {(r.k, r.s) for r in out} == {("1", "x"), ("2", "y")}


def test_pandas_udf_matches_builtin(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000)
    got = li.select(
        ext.pd_charge(
            F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
        ).alias("c"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("want"),
    )
    assert got.filter(F.abs(F.col("c") - F.col("want")) > 1e-9).count() == 0


def test_native_python_udtf_from_sql(spark):
    """Spark 4 @udtf class: registered as a SQL table function and
    invoked with LATERAL — the HiveQL `LATERAL VIEW udtf()` shape."""
    from hdp2_5_hive_spark.functions.extensions import ngram_udtf_class

    spark.udtf.register("ngrams_tf", ngram_udtf_class())
    out = spark.sql(
        """
        SELECT t.id, g.gram, g.pos
        FROM VALUES (1, 'a b c d'), (2, 'x y') AS t(id, txt),
             LATERAL ngrams_tf(t.txt, 2) AS g
        ORDER BY t.id, g.pos
        """
    ).collect()
    assert [(r.id, r.gram, r.pos) for r in out] == [
        (1, "a b", 0),
        (1, "b c", 1),
        (1, "c d", 2),
        (2, "x y", 0),
    ]


def test_udtf_null_text_emits_no_rows(spark):
    """Regression: NULL text made str.split() yield NaN and the
    repeat()/flatten crash the whole task — a Hive UDTF emits 0 rows
    for a NULL input instead."""
    df = spark.createDataFrame(
        [(1, None), (2, "one two")], "doc_id int, text string"
    )
    out = ext.explode_words_udtf(df, "doc_id", "text").collect()
    assert sorted((r.doc_id, r.word) for r in out) == [
        (2, "one"), (2, "two"),
    ]
