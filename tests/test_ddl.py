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


def test_metastore_cross_session_round_trip(spark, sf_dir, tmp_path):
    """Persistent catalog (metastore.py): table created via one
    session+Metastore instance is resolvable from a DIFFERENT session
    (fresh temp-view namespace) through a DIFFERENT Metastore instance
    that knows only the warehouse path — i.e. metadata durability
    lives entirely on disk, as in HiveMetaStore."""
    from hdp2_5_hive_spark.metastore import Metastore, NoSuchTableError

    wh = str(tmp_path / "wh")
    ms1 = Metastore(wh)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ms1.create_table(nation.filter("n_regionkey < 2"), "nations_small")

    # brand-new session: empty temp-view namespace, no shared state
    s2 = spark.newSession()
    assert "nations_small" not in [
        v.name for v in s2.catalog.listTables()
    ]
    ms2 = Metastore(wh)  # rebuilt purely from the warehouse dir
    assert ms2.tables() == ["nations_small"]
    views = ms2.attach(s2)
    assert views == ["nations_small"]
    got = s2.sql(
        "SELECT COUNT(*) AS n, MIN(n_regionkey) AS lo FROM nations_small"
    ).first()
    want = nation.filter("n_regionkey < 2").count()
    assert (got.n, got.lo) == (want, 0)

    # append = INSERT INTO; drop removes both metadata and data
    ms2.create_table(
        nation.filter("n_regionkey = 2"), "nations_small", mode="append"
    )
    assert ms1.get_table(spark, "nations_small").count() == nation.filter(
        "n_regionkey <= 2"
    ).count()
    ms1.drop_table("nations_small")
    import pytest as _pytest

    with _pytest.raises(NoSuchTableError):
        ms2.get_table(spark, "nations_small")


def test_metastore_partitioned_prunes(spark, sf_dir, tmp_path):
    """Partitioned persistent table keeps its directory layout, so a
    new session's scan prunes partitions (PartitionFilters in plan)."""
    from hdp2_5_hive_spark.metastore import Metastore

    wh = str(tmp_path / "whp")
    ms = Metastore(wh)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ms.create_table(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        "orders_bypriority",
        partition_by=["o_orderpriority"],
    )
    s2 = spark.newSession()
    df = Metastore(wh).get_table(s2, "orders_bypriority").filter(
        "o_orderpriority = '1-URGENT'"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderpriority" in plan
    assert df.count() == orders.filter("o_orderpriority = '1-URGENT'").count()


def test_export_import_round_trip(spark, sf_dir, tmp_path):
    """EXPORT → IMPORT into a different warehouse: identical rows,
    self-contained archive (source warehouse can be dropped), import
    refuses to clobber an existing table."""
    import pytest as _pytest

    from hdp2_5_hive_spark.metastore import Metastore

    src_wh, dst_wh = str(tmp_path / "src"), str(tmp_path / "dst")
    archive = str(tmp_path / "arch")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ms1 = Metastore(src_wh)
    ms1.create_table(nation, "nation_all", partition_by=["n_regionkey"])
    ms1.export_table("nation_all", archive)
    ms1.drop_table("nation_all", purge=True)  # archive must stand alone

    ms2 = Metastore(dst_wh)
    name = ms2.import_table(archive)
    assert name == "nation_all"
    got = ms2.get_table(spark, "nation_all")
    assert got.count() == nation.count()
    keys = sorted(r.n_nationkey for r in got.select("n_nationkey").collect())
    assert keys == sorted(
        r.n_nationkey for r in nation.select("n_nationkey").collect()
    )
    with _pytest.raises(ValueError):
        ms2.import_table(archive)  # no silent clobber
    assert ms2.import_table(archive, as_name="nation_copy") == "nation_copy"


def test_analyze_stats_durable_and_approx(spark, sf_dir, tmp_path):
    """ANALYZE results survive a metastore re-open; the approx-NDV
    dial (the 100 TB path) lands within 10% of exact."""
    from hdp2_5_hive_spark.metastore import Metastore

    wh = str(tmp_path / "wh")
    ms = Metastore(wh)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ms.create_table(cust.select("c_custkey", "c_mktsegment"), "cust_s")
    exact = ms.analyze_table(spark, "cust_s")
    reread = Metastore(wh).table_stats("cust_s")
    assert reread == exact
    assert exact["numRows"] == cust.count()
    assert exact["columns"]["c_custkey"]["ndv"] == cust.select(
        "c_custkey"
    ).distinct().count()
    approx = ms.analyze_table(spark, "cust_s", exact_ndv=False)
    e = exact["columns"]["c_custkey"]["ndv"]
    a = approx["columns"]["c_custkey"]["ndv"]
    assert abs(a - e) / e < 0.10


def test_sql_server_rpc_concurrent_clients(spark, sf_dir):
    """HiveServer2 entry-point analogue (scripts/sql_server.py): two
    concurrent socket clients run statements against one shared
    SparkSession; results come back typed-to-text, errors come back
    as error payloads instead of killing the connection."""
    import sys
    from concurrent.futures import ThreadPoolExecutor
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from sql_server import query, serve_background

    from hdp2_5_hive_spark.catalog import register_views

    register_views(spark, sf_dir)
    srv, port = serve_background(spark)
    try:
        with ThreadPoolExecutor(2) as ex:
            a = ex.submit(query, port, "SELECT count(*) AS n FROM nation")
            b = ex.submit(
                query, port,
                "SELECT n_name FROM nation WHERE n_nationkey = 0",
            )
            ra, rb = a.result(60), b.result(60)
        assert ra["columns"] == ["n"] and ra["rows"] == [["25"]]
        assert rb["rows"][0][0] == "NATION_0"
        err = query(port, "SELECT bogus FROM nowhere")
        assert "error" in err and "nowhere" in err["error"].lower() or "TABLE_OR_VIEW_NOT_FOUND" in err["error"]
        # ADVICE r6: clipping at MAX_ROWS must be detectable — a
        # complete small result says truncated=false, an over-limit
        # one says true and returns exactly MAX_ROWS rows
        assert ra["truncated"] is False
        import sql_server as _srv_mod

        big = query(
            port,
            f"SELECT id FROM range({_srv_mod.MAX_ROWS + 5})",
        )
        assert big["truncated"] is True
        assert len(big["rows"]) == _srv_mod.MAX_ROWS
    finally:
        srv.shutdown()


def test_explain_dependency_lineage(spark):
    """EXPLAIN DEPENDENCY (ExplainTask.getJSONDependencies): input
    tables come from resolved references only — CTE/subquery aliases
    excluded, every real view listed once; partitioned scans report
    their pushed partition predicates."""
    import json

    from hdp2_5_hive_spark.catalog import register_views
    from hdp2_5_hive_spark.functions import explain_dep

    register_views(spark, "/root/testdata/sf0.001")
    assert explain_dep.match("SELECT 1") is None
    inner = explain_dep.match(
        "EXPLAIN DEPENDENCY WITH big AS (SELECT o_custkey FROM orders "
        "WHERE o_totalprice > 1000) "
        "SELECT c_name FROM customer JOIN big ON c_custkey = o_custkey"
    )
    assert inner is not None
    out = json.loads(
        explain_dep.explain_dependency(spark, spark.sql(inner))
    )
    names = {t["tablename"] for t in out["input_tables"]}
    assert names == {"default@customer", "default@orders"}, names
    assert out["input_partitions"] == []


def test_explain_dependency_partition_filters(spark, tmp_path):
    import json

    from hdp2_5_hive_spark.functions import explain_dep
    from pyspark.sql import functions as F

    src = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id int, p int"
    )
    path = str(tmp_path / "pt")
    src.write.partitionBy("p").parquet(path)
    spark.read.parquet(path).filter(F.col("p") == 1).createOrReplaceTempView(
        "exp_dep_pt"
    )
    df = spark.sql("SELECT id FROM exp_dep_pt")
    out = json.loads(explain_dep.explain_dependency(spark, df))
    assert any("p" in x for x in out["input_partitions"]), out


def test_explain_dependency_sees_catalog_tables(spark):
    """Regression: a saved (non-temp-view) table prints a DOTTED
    SubqueryAlias (spark_catalog.default.t); the \\w+ capture grabbed
    only 'spark_catalog', which matched nothing in the catalog, and
    the table vanished from the dependency report."""
    import json

    from hdp2_5_hive_spark.functions import explain_dep

    spark.sql("DROP TABLE IF EXISTS expdep_cat_t")
    spark.range(5).write.saveAsTable("expdep_cat_t")
    try:
        df = spark.sql("SELECT * FROM expdep_cat_t")
        out = json.loads(explain_dep.explain_dependency(spark, df))
        names = {t["tablename"] for t in out["input_tables"]}
        assert "default@expdep_cat_t" in names, out
    finally:
        spark.sql("DROP TABLE IF EXISTS expdep_cat_t")


def test_source_splits_quote_aware(spark, tmp_path):
    """Regression: SOURCE split its script on EVERY ';', breaking a
    statement with a semicolon inside a string literal."""
    from hdp2_5_hive_spark.functions.resources import ResourceManager

    f = tmp_path / "s.sql"
    f.write_text(
        "-- a comment\n"
        "SELECT ';' AS sep;\n"
        "SELECT 2 AS two;\n"
    )
    ran = []
    reg = ResourceManager()
    out = reg.process(
        spark, f"SOURCE {f}", run_statement=lambda s: ran.append(s)
    )
    assert out and len(ran) == 2
    assert ran[0].strip() == "SELECT ';' AS sep"
    assert ran[1].strip() == "SELECT 2 AS two"
