"""DDL / utility surface (SURVEY §2.13 — thin facade over Spark SQL):
CREATE/DROP TABLE & VIEW, DESCRIBE, SHOW, ANALYZE, EXPLAIN, SET."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_create_view_describe_show(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.createOrReplaceTempView("ddl_nation_v")
    try:
        cols = {r.col_name for r in spark.sql("DESCRIBE ddl_nation_v").collect()}
        assert {"n_nationkey", "n_name", "n_regionkey"} <= cols
        names = {r.viewName for r in spark.sql("SHOW VIEWS").collect()}
        assert "ddl_nation_v" in names
        assert spark.sql("SELECT COUNT(*) AS n FROM ddl_nation_v").first().n == 25
    finally:
        spark.catalog.dropTempView("ddl_nation_v")


def test_create_table_insert_analyze_drop(spark):
    spark.sql("DROP TABLE IF EXISTS ddl_t")
    spark.sql("CREATE TABLE ddl_t (k INT, v STRING) USING parquet")
    try:
        spark.sql("INSERT INTO ddl_t VALUES (1, 'a'), (2, 'b')")
        spark.sql("INSERT OVERWRITE ddl_t VALUES (3, 'c')")
        assert [(r.k, r.v) for r in spark.table("ddl_t").collect()] == [(3, "c")]
        # ANALYZE → stats visible via DESCRIBE EXTENDED
        spark.sql("ANALYZE TABLE ddl_t COMPUTE STATISTICS")
        ext = spark.sql("DESCRIBE TABLE EXTENDED ddl_t").collect()
        stats = [r.data_type for r in ext if r.col_name == "Statistics"]
        assert stats and "rows" in stats[0]
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_t")


def test_explain_and_set(spark):
    plan = spark.sql("EXPLAIN SELECT 1 AS one").first()[0]
    assert "Project" in plan or "Scan" in plan
    spark.sql("SET spark.sql.shuffle.partitions=16")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
    spark.sql("SET spark.sql.shuffle.partitions=32")


def test_sample_percent_fraction(spark, sf_dir):
    # sample_percent now emits its own derived checks (fraction in
    # bounds, sample ⊆ source) so the oracle can verify them.
    from hdp2_5_hive_spark.queries import query_map

    r = query_map()["sample_percent"](spark, sf_dir).first()
    assert r.frac_in_bounds and r.sampled_subset
