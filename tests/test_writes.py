"""Write-side surface tests (SURVEY §2.2 sinks; FileSinkOperator.java:91).

Round-trips, dynamic-partition overwrite, bucketed tables,
multi-insert, compaction — each against the sf0.001 testdata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp2_5_hive_spark.sources import writers

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return spark.read.parquet(f"{SF}/nation.parquet")


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


@pytest.mark.parametrize("fmt", writers.ALL_FORMATS)
def test_round_trip_formats(nation, tmp_path, fmt):
    got = writers.round_trip(nation, str(tmp_path / fmt), fmt, header="true")
    assert got.count() == nation.count()
    assert [f.name for f in got.schema.fields] == [
        f.name for f in nation.schema.fields
    ]
    # Values survive (keys + one string col; csv/json stringify types)
    want = {(r.n_nationkey, r.n_name) for r in nation.collect()}
    have = {(int(r.n_nationkey), r.n_name) for r in got.collect()}
    assert have == want


def test_insert_into_appends(nation, tmp_path):
    p = str(tmp_path / "t")
    writers.insert_overwrite(nation, p)
    writers.insert_into(nation, p)
    assert nation.sparkSession.read.parquet(p).count() == 2 * nation.count()


def test_insert_overwrite_replaces(nation, tmp_path):
    p = str(tmp_path / "t")
    writers.insert_overwrite(nation, p)
    writers.insert_overwrite(nation.limit(5), p)
    assert nation.sparkSession.read.parquet(p).count() == 5


def test_dynamic_partition_overwrite(orders, tmp_path):
    """Only partitions present in the incoming frame are replaced."""
    p = str(tmp_path / "po")
    spark = orders.sparkSession
    base = orders.withColumn("status", F.col("o_orderstatus"))
    writers.insert_overwrite_dynamic_partitions(base, p, ["status"])
    full = spark.read.parquet(p).count()
    assert full == orders.count()

    # Overwrite ONLY status='F' with a 1-row slice; other partitions intact.
    one = base.filter(F.col("status") == "F").limit(1)
    writers.insert_overwrite_dynamic_partitions(one, p, ["status"])
    after = spark.read.parquet(p)
    n_f = after.filter(F.col("status") == "F").count()
    n_rest = after.filter(F.col("status") != "F").count()
    rest_before = base.filter(F.col("status") != "F").count()
    assert n_f == 1
    assert n_rest == rest_before


def test_bucketed_table_smb_no_exchange(orders, tmp_path, spark):
    """Bucketed+sorted tables join without a shuffle (SMB join,
    exec/SMBMapJoinOperator.java:60 → Spark bucketed SMJ)."""
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    try:
        writers.write_bucketed_table(
            orders, "b_orders", ["o_custkey"], 4, sort_cols=["o_custkey"]
        )
        writers.write_bucketed_table(
            cust, "b_customer", ["c_custkey"], 4, sort_cols=["c_custkey"]
        )
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        # Disable broadcast so the join would otherwise shuffle.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bo.join(bc, bo.o_custkey == bc.c_custkey)
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() > 0
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_multi_insert(nation, tmp_path, spark):
    """FROM src INSERT ... INSERT ... — one scan, two sinks."""
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    writers.multi_insert(
        nation,
        [
            lambda d: writers.insert_overwrite(
                d.groupBy("n_regionkey").count(), p1
            ),
            lambda d: writers.insert_overwrite(
                d.select("n_nationkey", "n_name"), p2
            ),
        ],
    )
    assert spark.read.parquet(p1).count() == 5
    assert spark.read.parquet(p2).count() == nation.count()


def test_compact_files(nation, tmp_path, spark):
    """ALTER TABLE CONCATENATE analogue: many files → few."""
    p = str(tmp_path / "frag")
    nation.repartition(8).write.parquet(p)
    writers.compact_files(spark, p, 1)
    df = spark.read.parquet(p)
    assert df.count() == nation.count()
    import glob

    assert len(glob.glob(f"{p}/part-*")) == 1


def test_range_layout_files_own_disjoint_ranges(spark, tmp_path):
    """write_range_layout: every output file covers a disjoint key
    range, proven from the parquet footer min/max stats — the file-
    pruning contract a range predicate relies on at scale."""
    import pyarrow.parquet as pq
    import glob as _glob

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "range_layout")
    writers.write_range_layout(ev.select("event_id", "user_id"), out, ["event_id"], 4)

    spans = []
    for f in _glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        col = None
        for i in range(md.row_group(0).num_columns):
            c = md.row_group(0).column(i)
            if c.path_in_schema == "event_id":
                col = i
        lo = min(md.row_group(g).column(col).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(col).statistics.max for g in range(md.num_row_groups))
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) == 4
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint: a range predicate skips whole files

    # and the readback is complete
    assert spark.read.parquet(out).count() == ev.count()


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A join whose key is the fact table's partition column and whose
    dim side carries a selective filter must plan a dynamicpruning
    subquery on the fact scan (Spark DPP — the runtime analogue of
    Hive's static partition pruner, optimizer/ppr/PartitionPruner.java).
    At 100 TB this is the difference between scanning every partition
    and scanning the 1-2 the dim selects."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    fact_path = str(tmp_path / "orders_part")
    orders.repartition(F.col("o_orderstatus")).write.partitionBy(
        "o_orderstatus"
    ).mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("F", "final"), ("O", "open"), ("P", "pending")], "st string, label string"
    ).filter(F.col("label") == "final")

    joined = fact.join(dim, fact.o_orderstatus == dim.st).groupBy("st").count()
    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan, plan[:2000]


def test_parquet_codec_options(nation, tmp_path, spark):
    """Compression codecs on the sink (Hive TBLPROPERTIES
    parquet.compression analogue): zstd + snappy round-trip."""
    for codec in ("zstd", "snappy"):
        p = str(tmp_path / f"codec_{codec}")
        nation.write.option("compression", codec).parquet(p)
        assert spark.read.parquet(p).count() == nation.count()
        import glob as _g
        import pyarrow.parquet as pq

        f = _g.glob(f"{p}/part-*.parquet")[0]
        meta = pq.ParquetFile(f).metadata.row_group(0).column(0)
        assert meta.compression.lower() == codec


def test_schema_evolution_merge_schema(nation, tmp_path, spark):
    """Schema-on-read evolution (Hive ALTER TABLE ADD COLUMNS,
    metastore alterTable path): files written before the column
    addition read as NULL for the new column under mergeSchema."""
    p = str(tmp_path / "evolving")
    nation.select("n_nationkey", "n_name").write.parquet(p)
    nation.select(
        "n_nationkey", "n_name", F.lit(9).alias("extra_col")
    ).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"n_nationkey", "n_name", "extra_col"}
    n = nation.count()
    assert df.count() == 2 * n
    assert df.filter(F.col("extra_col").isNull()).count() == n  # old files
    assert df.filter(F.col("extra_col") == 9).count() == n      # new files


def test_zorder_layout_tightens_second_column_stats(spark, tmp_path):
    """write_zorder_layout: Morton clustering keeps footer min/max
    TIGHT on every interleaved column, where a range layout on the
    leading column leaves the second column's per-file span at
    ~full-table width. Gate: mean per-file span of col B under
    z-order < half its span under range layout (measured ~0.25x on
    this grid)."""
    import glob as _glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    # 64x64 grid of (x, y) — every (x, y) combination once, so
    # clustering quality is purely the layout's doing.
    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )

    def mean_span(path: str, col_name: str) -> float:
        spans = []
        for f in _glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = next(
                i
                for i in range(md.row_group(0).num_columns)
                if md.row_group(0).column(i).path_in_schema == col_name
            )
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        assert spans
        return sum(spans) / len(spans)

    rng_path = str(tmp_path / "bycol")
    z_path = str(tmp_path / "zorder")
    writers.write_range_layout(grid, rng_path, ["x"], 16)
    writers.write_zorder_layout(grid, z_path, ["x", "y"], 16, bits=6)

    # Range layout on x: x is tight, y spans the whole table per file.
    assert mean_span(rng_path, "y") > 40
    # Z-order: BOTH columns stay tight per file.
    z_y = mean_span(z_path, "y")
    z_x = mean_span(z_path, "x")
    assert z_y < mean_span(rng_path, "y") / 2, z_y
    assert z_x < 64 / 2, z_x
    # No rows lost.
    assert spark.read.parquet(z_path).count() == 64 * 64


def test_parquet_bloom_filter_bytes_written(spark, tmp_path):
    """parquet.bloom.filter.enabled#col: identical data written with
    and without the option — the bloomed file must carry the bloom
    section (>=1 KiB growth at NDV 100k; pyarrow 16 exposes no bloom
    offsets, so the size delta is the footprint pin) and still read
    back identically."""
    import glob
    import os

    src = spark.read.parquet(f"{SF}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    sizes = {}
    for name, opts in (
        ("plain", {}),
        (
            "bloom",
            {
                "parquet.bloom.filter.enabled#s_name": "true",
                "parquet.bloom.filter.expected.ndv#s_name": "100000",
            },
        ),
    ):
        p = str(tmp_path / name)
        w = src.coalesce(1).write
        for k, v in opts.items():
            w = w.option(k, v)
        w.parquet(p)
        sizes[name] = os.path.getsize(glob.glob(f"{p}/part-*.parquet")[0])
    assert sizes["bloom"] - sizes["plain"] >= 1024, sizes
    a = {r.s_suppkey for r in spark.read.parquet(str(tmp_path / "bloom")).collect()}
    b = {r.s_suppkey for r in spark.read.parquet(str(tmp_path / "plain")).collect()}
    assert a == b


def test_schema_evolution_v1_projection_reads_without_merge(spark, tmp_path):
    """The schema-on-read contract: after ADD COLUMNS, a projection
    of pre-existing columns still reads old files with NO mergeSchema
    and NO rewrite — and the evolved read NULL-pads v1 rows."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")\
        .write.mode("append").parquet(d)
    spark.createDataFrame(
        [(3, "c", 30)], "id long, v string, extra int"
    ).write.mode("append").parquet(d)
    plain = spark.read.parquet(d).select("id", "v")
    assert sorted((r.id, r.v) for r in plain.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    rows = {r.id: r.extra for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 30}


def test_parquet_codecs_differ_on_disk(spark, tmp_path):
    """The codec matrix actually changes bytes: per-codec directory
    footprints are pairwise different and every file advertises its
    codec in the parquet footer metadata."""
    import glob
    import os

    import pyarrow.parquet as pq

    src = spark.range(0, 20000).selectExpr(
        "id", "repeat(uuid(), 2) AS s"
    )
    sizes = {}
    for codec in ("gzip", "snappy", "zstd"):
        p = str(tmp_path / codec)
        src.write.option("compression", codec).parquet(p)
        files = glob.glob(os.path.join(p, "*.parquet"))
        sizes[codec] = sum(os.path.getsize(f) for f in files)
        meta = pq.ParquetFile(files[0]).metadata
        col_codec = meta.row_group(0).column(1).compression
        assert col_codec.lower() == codec, (codec, col_codec)
    assert len(set(sizes.values())) == 3, sizes


def test_orc_bloom_filter_bytes_written_and_pushdown(spark, tmp_path):
    """orc.bloom.filter.columns: identical data with and without the
    option — the bloomed file must carry BLOOM_FILTER streams
    (size growth), read back identically, and the point probe must
    reach the ORC scan as a pushed filter (the SARG that consults
    the bloom at stripe level)."""
    import glob
    import os

    src = spark.read.parquet(f"{SF}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    sizes = {}
    for name, opts in (
        ("plain", {}),
        (
            "bloom",
            {
                "orc.bloom.filter.columns": "s_name",
                "orc.bloom.filter.fpp": "0.01",
            },
        ),
    ):
        p = str(tmp_path / name)
        w = src.coalesce(1).write
        for k, v in opts.items():
            w = w.option(k, v)
        w.orc(p)
        sizes[name] = os.path.getsize(glob.glob(f"{p}/part-*.orc")[0])
    assert sizes["bloom"] - sizes["plain"] >= 200, sizes
    a = {r.s_suppkey for r in spark.read.orc(str(tmp_path / "bloom")).collect()}
    b = {r.s_suppkey for r in spark.read.orc(str(tmp_path / "plain")).collect()}
    assert a == b
    probe = spark.read.orc(str(tmp_path / "bloom")).filter(
        "s_name = 'Supplier#000000001'"
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "s_name" in plan.split(
        "PushedFilters"
    )[1][:200], plan[:800]


def test_bucket_pruning_point_probe_reads_one_bucket(spark, tmp_path):
    """Bucket PRUNING (Hive's bucket-as-hash-partition probe, the
    read-side payoff of CLUSTERED BY beside the SMB join): an
    equality predicate on the bucketing column restricts the scan to
    ONE of N buckets — 'SelectedBucketsCount: 1 out of 8' in the
    scan node. Spark's planner only keeps the bucketed layout when
    it pays (autoBucketedScan re-plans it away for bare scans), so
    the gate pins the behavior with that heuristic off — on a
    cluster the same pruning fires inside bucketed joins/aggs."""
    prev = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    spark.sql("DROP TABLE IF EXISTS bp_gate")
    try:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        (
            spark.read.parquet(f"{SF}/customer.parquet")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable("bp_gate")
        )
        probe = spark.table("bp_gate").filter(F.col("c_custkey") == 42)
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:900]
        assert probe.count() == 1
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
        spark.sql("DROP TABLE IF EXISTS bp_gate")


def test_compact_files_crash_replay_recovers_from_tmp(nation, tmp_path, spark):
    """Defect hunt r13: a compact_files crash between the tmp write
    and the final swap leaves tmp as the only complete copy; the old
    re-run read the (possibly torn) original and OVERWROTE tmp —
    destroying that copy. A leftover tmp with _SUCCESS now resumes
    the swap; one without _SUCCESS (crash mid-tmp-write) is
    discarded and the intact original re-compacted."""
    import os
    import shutil

    p = str(tmp_path / "t")
    nation.write.parquet(p)
    expect = sorted(map(str, spark.read.parquet(p).collect()))
    tmp = p + "__compact_tmp"

    # crash window A: tmp complete (_SUCCESS), original torn — the
    # final overwrite had cleared the target before dying
    spark.read.parquet(p).coalesce(1).write.parquet(tmp)
    assert os.path.exists(os.path.join(tmp, "_SUCCESS"))
    shutil.rmtree(p)
    os.makedirs(p)  # overwrite-cleared target: dir exists, no data
    writers.compact_files(spark, p, 1)
    assert sorted(map(str, spark.read.parquet(p).collect())) == expect
    assert not os.path.isdir(tmp)

    # crash window B: tmp partial (no _SUCCESS), original intact
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-00000.parquet"), "wb") as fh:
        fh.write(b"torn parquet bytes")
    writers.compact_files(spark, p, 1)
    assert sorted(map(str, spark.read.parquet(p).collect())) == expect
    assert not os.path.isdir(tmp)
