"""Source/sink round-trip queries — driver-visible coverage for the
SerDe/FileSink surface (SURVEY §2.2).

Each query materializes a write to a scratch directory and returns
the read-back result, so the driver's oracle compare certifies the
full write→read path, not just that a write didn't throw. Reference:
``serde/.../avro/AvroSerDe.java`` (Avro),
``ql/io/orc/OrcSerde.java`` (ORC),
``ql/.../exec/FileSinkOperator.java:91`` (dynamic partitions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..scratch import scratch_dir
from .registry import register


@register(
    "fmt_avro_round_trip",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
    category="formats",
)
def fmt_avro_round_trip(spark, t):
    """Avro write→read round-trip (AvroSerDe.java analogue) through
    the engine's container-file codec (sources/avro_py, written from
    the public Avro 1.11 spec; delegates to native spark-avro when
    its jar is present). repartition(4) forces a multi-file write —
    one container file per partition, decoded in parallel."""
    from ..sources import avro_py

    d = scratch_dir("fmt_avro_")
    avro_py.write_avro(t.nation.repartition(4), d)
    return avro_py.read_avro(spark, d).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "fmt_avro_deflate",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
WHERE p_partkey <= 500
""",
    category="formats",
)
def fmt_avro_deflate(spark, t):
    """Avro round-trip with ``avro.codec=deflate`` — per-block raw
    RFC-1951 streams per the Avro 1.11 spec, the codec most real OCF
    exports actually use (AvroContainerOutputFormat honors
    ``avro.output.codec=deflate``). The reader takes the codec from
    the file header; block boundaries and sync markers are outside
    the compressed payload so per-file parallel reads are unchanged."""
    from ..sources import avro_py

    d = scratch_dir("fmt_avro_df_")
    src = t.part.filter(F.col("p_partkey") <= 500).select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )
    avro_py.write_avro(src.repartition(3), d, codec="deflate")
    return avro_py.read_avro(spark, d)


@register(
    "fmt_orc_round_trip",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_totalprice > 400000
""",
    category="formats",
)
def fmt_orc_round_trip(spark, t):
    """ORC write→read round-trip (OrcSerde.java / OrcInputFormat
    analogue): Spark's built-in vectorized ORC source."""
    d = scratch_dir("fmt_orc_")
    src = t.orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    src.write.mode("overwrite").orc(d)
    return spark.read.orc(d)


@register(
    "fmt_dynamic_partition_sink",
    oracle="""
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders GROUP BY o_orderpriority
""",
    category="formats",
)
def fmt_dynamic_partition_sink(spark, t):
    """Dynamic-partition INSERT OVERWRITE (FileSinkOperator.java:91
    dynamic-partition path + SortedDynPartitionOptimizer): write
    orders partitioned by o_orderpriority, read the partitioned
    layout back, and aggregate per partition — proves both partition
    pruning metadata and data fidelity survive the sink."""
    from ..sources import writers

    d = scratch_dir("fmt_dynpart_")
    writers.insert_overwrite_dynamic_partitions(
        t.orders.select("o_orderkey", "o_orderpriority"),
        d,
        ["o_orderpriority"],
    )
    back = spark.read.parquet(d)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@register(
    "fmt_smb_bucketed_join",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 450000
""",
    category="formats",
)
def fmt_smb_bucketed_join(spark, t):
    """SMB (sort-merge-bucket) map join surface
    (``exec/SMBMapJoinOperator.java:60`` + bucketed DDL
    ``CLUSTERED BY ... SORTED BY ... INTO n BUCKETS``,
    ``data/scripts/q_test_init.sql:74-76``): both sides written
    bucketed+sorted on the join key as external tables, then joined —
    with matching bucket counts Spark plans the join without an
    Exchange on either side (asserted in tests/test_writes.py; here
    the driver hash-checks the result set)."""
    d = scratch_dir("fmt_smb_")
    (
        t.orders.filter(F.col("o_totalprice") > 450000)
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{d}/orders_b")
        .saveAsTable("fmt_smb_orders")
    )
    (
        t.customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{d}/customer_b")
        .saveAsTable("fmt_smb_customer")
    )
    o = spark.table("fmt_smb_orders")
    c = spark.table("fmt_smb_customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name"
    )


@register(
    "fmt_multi_insert",
    oracle="""
SELECT 'big' AS sink, o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > 450000
UNION ALL
SELECT 'urgent' AS sink, o_orderkey, o_totalprice FROM orders
WHERE o_orderpriority = 'URGENT' AND o_totalprice > 450000
""",
    category="formats",
)
def fmt_multi_insert(spark, t):
    """Multi-insert (``FROM src INSERT OVERWRITE t1 ... INSERT
    OVERWRITE t2 ...``, HiveParser.g / groupby1.q:12): one cached
    source scan feeds two sinks (writers.multi_insert); the query
    reads both sinks back and unions them so the driver verifies
    both writes."""
    from ..sources import writers

    d = scratch_dir("fmt_multi_")
    src = t.orders.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    writers.multi_insert(
        src,
        [
            lambda df: df.select("o_orderkey", "o_totalprice")
            .write.mode("overwrite")
            .parquet(f"{d}/big"),
            lambda df: df.filter(F.col("o_orderpriority") == "URGENT")
            .select("o_orderkey", "o_totalprice")
            .write.mode("overwrite")
            .parquet(f"{d}/urgent"),
        ],
    )
    big = spark.read.parquet(f"{d}/big").select(
        F.lit("big").alias("sink"), "o_orderkey", "o_totalprice"
    )
    urgent = spark.read.parquet(f"{d}/urgent").select(
        F.lit("urgent").alias("sink"), "o_orderkey", "o_totalprice"
    )
    return big.unionAll(urgent)


@register(
    "fmt_concatenate_compact",
    oracle="""
SELECT 2 AS n_files_after,
       COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM orders WHERE o_totalprice > 400000
""",
    category="formats",
)
def fmt_concatenate_compact(spark, t):
    """``ALTER TABLE ... CONCATENATE`` (OrcFileMergeOperator.java:41):
    a deliberately fragmented write (16 files) compacted to 2 via
    writers.compact_files; the result row proves both the file-count
    contract and that no rows were lost or duplicated in the merge."""
    import glob as _glob
    from ..sources import writers

    d = scratch_dir("fmt_compact_") + "/frag"
    src = t.orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_totalprice"
    )
    src.repartition(16).write.mode("overwrite").parquet(d)
    writers.compact_files(spark, d, 2)
    n_files = len(_glob.glob(f"{d}/part-*.parquet"))
    return (
        spark.read.parquet(d)
        .agg(
            F.lit(n_files).alias("n_files_after"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


@register(
    "fmt_csv_round_trip",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer WHERE c_acctbal > 9000
""",
    category="formats",
)
def fmt_csv_round_trip(spark, t):
    """CSV (OpenCSVSerde analogue, ``serde/.../OpenCSVSerde.java``)
    write→read round-trip: header + quoted fields out, schema-on-read
    back (CSV itself is untyped — the declared read schema plays the
    SerDe's type-projection role). Doubles survive exactly: Spark
    writes shortest-round-trip decimal and reads it back to the same
    binary64."""
    d = scratch_dir("fmt_csv_")
    src = t.customer.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    src.write.mode("overwrite").option("header", True).csv(d)
    return spark.read.schema(
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ).option("header", True).csv(d)


@register(
    "fmt_text_serde_round_trip",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey FROM supplier WHERE s_nationkey < 10
""",
    category="formats",
)
def fmt_text_serde_round_trip(spark, t):
    """Hive TEXTFILE + LazySimpleSerDe round-trip
    (``serde/.../lazy/LazySimpleSerDe.java:82``): rows serialized with
    Hive's default field delimiter \\x01 into plain text files, read
    back via ``spark.read.text`` + split/cast — schema-on-read exactly
    as the SerDe does it (deserialize is just byte-slicing + lazy
    primitive parse)."""
    d = scratch_dir("fmt_text_")
    src = t.supplier.filter(F.col("s_nationkey") < 10).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    src.select(
        F.concat_ws(
            "\x01",
            F.col("s_suppkey").cast("string"),
            F.col("s_name"),
            F.col("s_nationkey").cast("string"),
        ).alias("value")
    ).write.mode("overwrite").text(d)
    raw = spark.read.text(d)
    parts = F.split(F.col("value"), "\x01")
    return raw.select(
        parts.getItem(0).cast("long").alias("s_suppkey"),
        parts.getItem(1).alias("s_name"),
        parts.getItem(2).cast("int").alias("s_nationkey"),
    )


@register(
    "ddl_exchange_partition",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_regionkey IN (0, 2)
""",
    category="formats",
)
def ddl_exchange_partition(spark, t):
    """``ALTER TABLE … EXCHANGE PARTITION`` (reference
    ``ql/exec/DDLTask.java:4567``): a staging table's region-2
    partition is PROMOTED into the serving table by a directory
    rename — metadata-speed, no data rewrite, the classic
    staging→production handoff. Final state read through a fresh
    session: the serving table's original region-0 rows plus the
    exchanged region-2 rows; the staging table no longer has the
    partition (enforced in tests)."""
    from ..metastore import Metastore

    wh = scratch_dir("ddl_xchg_")
    ms = Metastore(wh)
    src = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    ms.create_table(
        src.filter(F.col("n_regionkey") == 0), "serving",
        partition_by=["n_regionkey"],
    )
    ms.create_table(
        src.filter(F.col("n_regionkey").isin(1, 2)), "staging",
        partition_by=["n_regionkey"],
    )
    ms.exchange_partition("staging", "serving", {"n_regionkey": "2"})
    s2 = spark.newSession()
    Metastore(wh).attach(s2)
    return s2.table("serving").select(
        "n_nationkey",
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


@register(
    "fmt_multidelim_text",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
    category="formats",
)
def fmt_multidelim_text(spark, t):
    """MultiDelimitSerDe round-trip (reference
    ``contrib/.../serde2/MultiDelimitSerDe.java`` — the contrib SerDe
    legacy warehouses used for multi-CHARACTER field delimiters like
    ``||`` that LazySimpleSerDe's single-byte delimiter cannot
    express). Spark-first: the write is concat_ws('||'), the read is
    the native CSV reader's multi-char ``sep`` (Spark 3+) with
    schema-on-read casts playing the SerDe's type projection. Both
    directions are map-only scans."""
    d = scratch_dir("fmt_mdelim_")
    src = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    src.select(
        F.concat_ws(
            "||",
            F.col("n_nationkey").cast("string"),
            F.col("n_name"),
            F.col("n_regionkey").cast("string"),
        ).alias("value")
    ).write.mode("overwrite").text(d)
    return (
        spark.read.schema(
            "n_nationkey long, n_name string, n_regionkey long"
        )
        .option("sep", "||")
        .csv(d)
    )


@register(
    "fmt_sequencefile_round_trip",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey FROM supplier WHERE s_nationkey >= 10
""",
    category="formats",
)
def fmt_sequencefile_round_trip(spark, t):
    """SequenceFile + LazySimpleSerDe round-trip
    (``ql/io/HiveSequenceFileOutputFormat.java:35`` writing
    ``BytesWritable→Text`` records whose value bytes are the
    \\x01-delimited LazySimpleSerDe row,
    ``serde/.../lazy/LazySimpleSerDe.java:82``) — the default STORED
    AS SEQUENCEFILE layout every HDP 2.5 warehouse migration hits.

    The RDD API is the honest analogue here: SequenceFile is a
    Hadoop container of writables, below the DataFrame source API,
    so write goes through ``saveAsSequenceFile`` (key = row key as
    Text, value = serialized row) and read through
    ``sc.sequenceFile`` + schema-on-read split/cast — the one place
    in the repo where per-partition imperative RDD logic is the
    right tool. Scale: both sides are narrow map-only passes; the
    file format splits by sync markers exactly as in Hadoop."""
    d = scratch_dir("fmt_seq_") + "/seq"
    src = t.supplier.filter(F.col("s_nationkey") >= 10).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    (
        src.rdd.map(
            lambda r: (
                str(r.s_suppkey),
                f"{r.s_suppkey}\x01{r.s_name}\x01{r.s_nationkey}",
            )
        ).saveAsSequenceFile(d)
    )
    back = spark.sparkContext.sequenceFile(d)  # (Text,Text) → (str,str)
    raw = spark.createDataFrame(back.map(lambda kv: (kv[1],)), "value string")
    parts = F.split(F.col("value"), "\x01")
    return raw.select(
        parts.getItem(0).cast("long").alias("s_suppkey"),
        parts.getItem(1).alias("s_name"),
        parts.getItem(2).cast("int").alias("s_nationkey"),
    )


@register(
    "fmt_sequencefile_compressed",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey
FROM supplier WHERE s_nationkey < 10
""",
    category="formats",
)
def fmt_sequencefile_compressed(spark, t):
    """RECORD-compressed SequenceFile round-trip — the layout Hive
    writes under ``hive.exec.compress.output=true`` with the default
    ``mapred.output.compression.type=RECORD``
    (``ql/exec/FileSinkOperator`` → Hadoop ``SequenceFile.Writer``
    with DefaultCodec). Spark's JVM Hadoop integration carries the
    codecs, so write passes ``compressionCodecClass`` to
    ``saveAsSequenceFile`` and READ needs no hint — the codec class
    is in the SEQ header, exactly how a migration read encounters a
    legacy compressed warehouse. Same \\x01 LazySimpleSerDe value
    layout as fmt_sequencefile_round_trip."""
    d = scratch_dir("fmt_seq_gz_") + "/seq"
    src = t.supplier.filter(F.col("s_nationkey") < 10).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    (
        src.rdd.map(
            lambda r: (
                str(r.s_suppkey),
                f"{r.s_suppkey}\x01{r.s_name}\x01{r.s_nationkey}",
            )
        ).saveAsSequenceFile(
            d, "org.apache.hadoop.io.compress.DefaultCodec"
        )
    )
    back = spark.sparkContext.sequenceFile(d)
    raw = spark.createDataFrame(
        back.map(lambda kv: (kv[1],)), "value string"
    )
    parts = F.split(F.col("value"), "\x01")
    return raw.select(
        parts.getItem(0).cast("long").alias("s_suppkey"),
        parts.getItem(1).alias("s_name"),
        parts.getItem(2).cast("int").alias("s_nationkey"),
    )


@register(
    "ddl_persistent_catalog",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey <= 3
""",
    category="formats",
)
def ddl_persistent_catalog(spark, t):
    """Persistent catalog round-trip (metastore.py — HiveMetaStore
    ``create_table:258`` / ``get_table:1870`` facade): CREATE TABLE
    (partitioned) + INSERT INTO through one Metastore instance, then
    resolve it on a BRAND-NEW SparkSession through a brand-new
    Metastore that knows only the warehouse path. The returned rows
    therefore went disk-metadata → fresh-session scan; a temp-view
    shortcut cannot fake this."""
    from ..metastore import Metastore

    wh = scratch_dir("ddl_wh_")
    ms = Metastore(wh)
    src = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    ms.create_table(
        src.filter(F.col("n_regionkey") < 3), "nations_p",
        partition_by=["n_regionkey"],
    )
    ms.create_table(
        src.filter(F.col("n_regionkey") == 3), "nations_p",
        partition_by=["n_regionkey"], mode="append",
    )
    s2 = spark.newSession()
    Metastore(wh).attach(s2)
    return s2.table("nations_p").select(
        "n_nationkey", "n_name", F.col("n_regionkey").cast("long").alias("n_regionkey")
    )


@register(
    "ddl_export_import",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey FROM supplier WHERE s_nationkey < 7
""",
    category="formats",
)
def ddl_export_import(spark, t):
    """EXPORT TABLE → archive → IMPORT TABLE into a DIFFERENT
    warehouse (metastore.export_table/import_table — reference
    ``ql/parse/ExportSemanticAnalyzer.java:48`` /
    ``ImportSemanticAnalyzer.java:71``): the replication/migration
    path. The archive is self-contained (data files byte-copied +
    ``_metadata.json``), so the importing warehouse never saw the
    exporting one; rows come back through the imported table's scan
    in a brand-new session."""
    from ..metastore import Metastore

    src_wh = scratch_dir("exp_src_wh_")
    dst_wh = scratch_dir("exp_dst_wh_")
    archive = scratch_dir("exp_archive_")
    rows = t.supplier.filter(F.col("s_nationkey") < 7).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    ms_src = Metastore(src_wh)
    ms_src.create_table(rows, "supp_small", partition_by=["s_nationkey"])
    ms_src.export_table("supp_small", archive)

    ms_dst = Metastore(dst_wh)
    ms_dst.import_table(archive, as_name="supp_imported")
    s2 = spark.newSession()
    Metastore(dst_wh).attach(s2)
    return s2.table("supp_imported").select(
        "s_suppkey",
        "s_name",
        F.col("s_nationkey").cast("int").alias("s_nationkey"),
    )


@register(
    "ddl_analyze_stats",
    oracle="""
SELECT 'o_custkey' AS column_name,
       COUNT(DISTINCT o_custkey) AS ndv,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_val
FROM orders
UNION ALL
SELECT 'o_orderkey', COUNT(DISTINCT o_orderkey),
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(o_orderkey) AS VARCHAR), CAST(MAX(o_orderkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(DISTINCT o_orderpriority),
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(o_orderpriority) AS VARCHAR),
       CAST(MAX(o_orderpriority) AS VARCHAR)
FROM orders
ORDER BY column_name
""",
    category="formats",
)
def ddl_analyze_stats(spark, t):
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS
    (``ql/exec/ColumnStatsTask.java:58``): stats are computed in ONE
    aggregation pass (every NDV/null/min/max is an expression in a
    single agg — one scan, partial-agg tree, no extra shuffles),
    persisted in the metastore document, then read back through a
    SECOND metastore instance — proving durability, not a driver-side
    echo. Exact NDV here for oracle parity; ``exact_ndv=False`` (HLL)
    is the 100 TB dial, mirroring Hive's own FM-sketch."""
    from ..metastore import Metastore

    wh = scratch_dir("analyze_wh_")
    ms = Metastore(wh)
    cols = ["o_custkey", "o_orderkey", "o_orderpriority"]
    ms.create_table(t.orders.select(*cols), "orders_stats")
    ms.analyze_table(spark, "orders_stats", cols)
    stats = Metastore(wh).table_stats("orders_stats")
    rows = [
        (c, int(s["ndv"]), int(s["nulls"]), s["min"], s["max"])
        for c, s in stats["columns"].items()
    ]
    return spark.createDataFrame(
        rows,
        "column_name string, ndv long, n_nulls long, "
        "min_val string, max_val string",
    ).orderBy("column_name")


@register(
    "fmt_rcfile_round_trip",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer WHERE c_custkey <= 300
""",
    category="formats",
)
def fmt_rcfile_round_trip(spark, t):
    """RCFile write→read round-trip (reference ``ql/io/RCFile.java``;
    the last open §2.2 format row). The engine's from-scratch codec
    (sources/rcfile_py, public layout: RCF header, Hadoop vlong/Text
    primitives, per-group columnar key/value buffers with RLE'd cell
    lengths, sync markers) writes one file per partition in the
    executors and reads via a parallelized file list — the migration
    path for a legacy STORED AS RCFILE warehouse. Small row groups
    here force the multi-group + sync-escape code path."""
    from ..sources import rcfile_py

    d = scratch_dir("fmt_rcfile_") + "/rc"
    src = t.customer.filter(F.col("c_custkey") <= 300).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    rcfile_py.write_rcfile(src.repartition(4), d, group_rows=64)
    return rcfile_py.read_rcfile(spark, d)


@register(
    "fmt_rcfile_compressed",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey <= 800
""",
    category="formats",
)
def fmt_rcfile_compressed(spark, t):
    """COMPRESSED RCFile round-trip — the layout real legacy HDP
    warehouses actually shipped (RCFile+DefaultCodec; reference
    ``ql/io/RCFile.java:1137-1253`` flushRecords/writeKey: key buffer
    one zlib stream, each column an independent zlib stream, sizes in
    the key). Split reads resynchronize identically because sync
    escapes are never compressed; the reader takes the codec from the
    file header, so a migration read needs no configuration. Write
    with small groups + byte-range splits to force the compressed
    multi-group resync path end-to-end."""
    from ..sources import rcfile_py

    d = scratch_dir("fmt_rcfile_gz_") + "/rc"
    src = t.orders.filter(F.col("o_orderkey") <= 800).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    rcfile_py.write_rcfile(
        src.repartition(3), d, group_rows=64, codec="deflate"
    )
    return rcfile_py.read_rcfile(spark, d, split_bytes=8 * 1024)


@register(
    "fmt_rcfile_snappy",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem WHERE l_orderkey <= 600
""",
    category="formats",
)
def fmt_rcfile_snappy(spark, t):
    """Snappy-compressed RCFile round-trip — the OTHER common HDP
    compression default (``ql/io/RCFile.java`` header names
    ``o.a.h.io.compress.SnappyCodec``; each key/column buffer is an
    independent codec stream). SnappyCodec has no stream format of
    its own: Hadoop wraps raw snappy in BlockCompressorStream framing
    ([i32 uncompressed][i32 compressed][chunk]...), and the raw codec
    is implemented from the public format description in pure Python
    (sources/snappy_py — varint preamble, literal/copy tag stream,
    64 KiB fragments) and cross-validated against google snappy via
    pyarrow in both directions. Small groups + byte-range splits
    force the compressed multi-group resync path."""
    from ..sources import rcfile_py

    d = scratch_dir("fmt_rcfile_sn_") + "/rc"
    src = t.lineitem.filter(F.col("l_orderkey") <= 600).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    rcfile_py.write_rcfile(
        src.repartition(3), d, group_rows=64, codec="snappy"
    )
    return rcfile_py.read_rcfile(spark, d, split_bytes=8 * 1024)


@register(
    "ddl_insert_overwrite_partition",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_regionkey <> 0 OR n_nationkey % 2 = 0
""",
    category="formats",
)
def ddl_insert_overwrite_partition(spark, t):
    """``INSERT OVERWRITE TABLE ... PARTITION`` with Hive semantics
    (reference ``ql/exec/MoveTask.java`` / ``Hive.loadDynamicPartitions``
    — only partitions present in the incoming data are replaced):
    build a nation table partitioned by region, then overwrite ONLY
    region 0 with its even-keyed rows. Regions 1-4 must survive
    untouched — Spark's default static overwrite would truncate them,
    so the metastore facade pins dynamic partition-overwrite mode
    (metastore.insert_overwrite_partitions). Final state is what the
    oracle states: all of regions 1-4, evens of region 0."""
    from ..metastore import Metastore

    wh = scratch_dir("ddl_iop_")
    ms = Metastore(wh)
    src = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    ms.create_table(src, "nations_iop", partition_by=["n_regionkey"])
    replacement = src.filter(
        (F.col("n_regionkey") == 0) & (F.col("n_nationkey") % 2 == 0)
    )
    ms.insert_overwrite_partitions(replacement, "nations_iop")
    return ms.get_table(spark, "nations_iop").select(
        "n_nationkey",
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


@register(
    "ddl_drop_partition",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey <> 2
""",
    category="formats",
)
def ddl_drop_partition(spark, t):
    """``ALTER TABLE ... DROP PARTITION (n_regionkey=2)`` (reference
    ``ql/exec/DDLTask.java dropPartitions``): partition directories
    matching the spec are removed; remaining partitions — and SHOW
    PARTITIONS — reflect the drop immediately (the self-describing
    layout IS the partition metadata). Exactly one leaf must drop."""
    from ..metastore import Metastore

    wh = scratch_dir("ddl_dropp_")
    ms = Metastore(wh)
    src = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    ms.create_table(src, "nations_dp", partition_by=["n_regionkey"])
    n = ms.drop_partition("nations_dp", {"n_regionkey": 2})
    assert n == 1, f"expected 1 leaf partition dropped, got {n}"
    assert {"n_regionkey": "2"} not in ms.partitions("nations_dp")
    return ms.get_table(spark, "nations_dp").select(
        "n_nationkey",
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


@register(
    "fmt_zorder_skipping",
    oracle="""
SELECT l_orderkey, l_suppkey, l_quantity
FROM lineitem
WHERE l_orderkey BETWEEN 1000 AND 1500 AND l_suppkey BETWEEN 10 AND 20
""",
    category="formats",
)
def fmt_zorder_skipping(spark, t):
    """Z-order clustered layout end-to-end (sources/writers.
    write_zorder_layout — Morton interleave via JVM bit expressions +
    range exchange): write lineitem clustered on (l_orderkey,
    l_suppkey), read back through a 2-D selective predicate. The
    layout makes BOTH predicates produce tight per-file min/max
    ranges — parquet row-group stats prune files on either dimension
    (footer-stat improvement asserted in tests/test_writes.py); the
    driver checks the query still returns exactly the right rows
    after the rewrite. At 100 TB this is the difference between
    scanning a stripe and scanning the lake for multi-dimension
    point/range lookups."""
    from ..sources import writers as wr

    d = scratch_dir("fmt_zorder_") + "/li"
    src = t.lineitem.select("l_orderkey", "l_suppkey", "l_quantity")
    wr.write_zorder_layout(src, d, ["l_orderkey", "l_suppkey"], n_files=16)
    back = spark.read.parquet(d)
    return back.filter(
        (F.col("l_orderkey").between(1000, 1500))
        & (F.col("l_suppkey").between(10, 20))
    ).select("l_orderkey", "l_suppkey", "l_quantity")


@register(
    "fmt_thrift_sequencefile_round_trip",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey,
       CASE WHEN s_suppkey % 3 = 0 THEN NULL ELSE s_acctbal END AS s_acctbal
FROM supplier WHERE s_suppkey <= 60
""",
    category="formats",
)
def fmt_thrift_sequencefile_round_trip(spark, t):
    """Thrift rows in a SequenceFile — the classic
    ThriftByteStreamTypedSerDe table (reference ``serde/.../thrift/
    ThriftDeserializer.java``; §2.2 Thrift row): each row serialized
    as a TBinaryProtocol struct (sources/thrift_py, from the public
    wire spec — field headers, big-endian payloads, T_STOP) into
    SequenceFile values, read back and decoded field-positionally.
    NULL-as-absent-field is exercised via a nulled-out column wave.
    Same RDD plumbing rationale as fmt_sequencefile_round_trip:
    Hadoop writables live below the DataFrame source API."""
    from ..sources import thrift_py as tp

    d = scratch_dir("fmt_thrift_") + "/seq"
    types = ["bigint", "string", "int", "double"]
    src = t.supplier.filter(F.col("s_suppkey") <= 60).select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.when(F.col("s_suppkey") % 3 == 0, None)
        .otherwise(F.col("s_acctbal"))
        .alias("s_acctbal"),
    )
    (
        src.rdd.map(
            lambda r: (
                str(r.s_suppkey),
                bytearray(
                    tp.encode_row(
                        types,
                        [r.s_suppkey, r.s_name, r.s_nationkey, r.s_acctbal],
                    )
                ),
            )
        ).saveAsSequenceFile(d)
    )
    back = spark.sparkContext.sequenceFile(d)
    rows = back.map(lambda kv: tuple(tp.decode_row(bytes(kv[1]), 4)))
    return spark.createDataFrame(
        rows,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )


@register(
    "fmt_thrift_complex_round_trip",
    oracle="""
SELECT n_nationkey,
       n_name AS nested_name,
       n_regionkey * 2 AS m_double,
       CAST(n_nationkey % 3 AS BIGINT) AS lst_len
FROM nation
""",
    category="formats",
)
def fmt_thrift_complex_round_trip(spark, t):
    """Thrift COMPLEX rows through SequenceFile — the reference's
    ``src_thrift`` fixture shape (nested struct + map + list in one
    row; ``data/scripts/q_test_init.sql:56-64``): each row carries a
    struct<a:bigint,b:string>, a map<string,bigint> and a variable-
    length list, TBinaryProtocol-encoded (T_STRUCT nests the field
    layout uniformly; T_MAP header = key/value types + count). Read
    back schema-less (positional by field id) and FLATTENED to
    scalars for the oracle — nested values prove the codec, scalars
    keep the driver canonicalizer happy."""
    from ..sources import thrift_py as tp

    d = scratch_dir("fmt_thrift_cx_") + "/seq"
    types = [
        "bigint",
        "struct<a:bigint,b:string>",
        "map<string,bigint>",
        "array<int>",
    ]
    src = t.nation.select("n_nationkey", "n_name", "n_regionkey")

    def enc(r):
        lst = list(range(r.n_nationkey % 3))
        return (
            str(r.n_nationkey),
            bytearray(
                tp.encode_row(
                    types,
                    [
                        r.n_nationkey,
                        {"a": r.n_nationkey, "b": r.n_name},
                        {"dbl": r.n_regionkey * 2},
                        lst,
                    ],
                )
            ),
        )

    src.rdd.map(enc).saveAsSequenceFile(d)
    back = spark.sparkContext.sequenceFile(d)

    def dec(kv):
        key, nested, m, lst = tp.decode_row(bytes(kv[1]), 4)
        return (key, nested[1], m["dbl"], len(lst))

    return spark.createDataFrame(
        back.map(dec),
        "n_nationkey long, nested_name string, m_double long, lst_len long",
    )


@register(
    "fmt_protobuf_sequencefile_round_trip",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey - 12 AS nk_off,
       CASE WHEN s_suppkey % 4 = 0 THEN NULL ELSE s_acctbal END AS s_acctbal
FROM supplier WHERE s_suppkey <= 60
""",
    category="formats",
)
def fmt_protobuf_sequencefile_round_trip(spark, t):
    """ProtoBuf rows in a SequenceFile — §2.2's last connector row:
    the reference ships a PROTOCOL_BUFFERS ObjectInspector
    (``serde/.../objectinspector/ObjectInspectorFactory.java``,
    tested over ``serde2/proto/test/Complexpb.java``); here each row
    is a proto2 message (sources/protobuf_py, written from the
    public wire spec — varint tags, two's-complement int64
    negatives, ZigZag sint32, LEN strings) stored as SequenceFile
    values and decoded back by field id. ``nk_off`` goes negative,
    exercising ZigZag; the ``% 4`` wave exercises absent-field
    NULLs. Same RDD plumbing rationale as the thrift twin: Hadoop
    writables live below the DataFrame source API. Scale: map-only
    both directions, splits by SequenceFile sync markers."""
    from ..sources import protobuf_py as pb

    d = scratch_dir("fmt_proto_") + "/seq"
    types = ["bigint", "string", "sint32", "double"]
    src = t.supplier.filter(F.col("s_suppkey") <= 60).select(
        "s_suppkey",
        "s_name",
        (F.col("s_nationkey") - 12).alias("nk_off"),
        F.when(F.col("s_suppkey") % 4 == 0, None)
        .otherwise(F.col("s_acctbal"))
        .alias("s_acctbal"),
    )
    (
        src.rdd.map(
            lambda r: (
                str(r.s_suppkey),
                bytearray(
                    pb.encode_row(
                        types,
                        [r.s_suppkey, r.s_name, r.nk_off, r.s_acctbal],
                    )
                ),
            )
        ).saveAsSequenceFile(d)
    )
    back = spark.sparkContext.sequenceFile(d)
    rows = back.map(lambda kv: tuple(pb.decode_row(types, bytes(kv[1]))))
    return spark.createDataFrame(
        rows,
        "s_suppkey long, s_name string, nk_off int, s_acctbal double",
    )


@register(
    "fmt_protobuf_complex_round_trip",
    oracle="""
SELECT n_nationkey,
       n_name AS is_name,
       -CAST(n_nationkey AS INTEGER) AS is_neg,
       CAST(n_nationkey % 3 AS BIGINT) AS lint_len,
       CAST(n_regionkey AS DOUBLE) * 2 AS m_dbl
FROM nation
""",
    category="formats",
)
def fmt_protobuf_complex_round_trip(spark, t):
    """ProtoBuf COMPLEX rows — the exact ``Complexpb.Complex``
    fixture shape from the reference's PROTOCOL_BUFFERS OI test
    (``TestProtocolBuffersObjectInspectors.java``: scalar int/
    string, packed repeated int32, repeated nested ``IntString``
    message) plus a protobuf map field (repeated {key=1,value=2}
    entry messages). Values nest on the wire and are FLATTENED to
    scalars for the oracle — nested payloads prove the codec,
    scalars keep the driver canonicalizer happy. ZigZag negatives
    ride in the nested message."""
    from ..sources import protobuf_py as pb

    d = scratch_dir("fmt_proto_cx_") + "/seq"
    intstring = "struct<myint:int,mystring:string,underscore_int:sint32>"
    types = [
        "bigint",
        "array<int>",
        f"array<{intstring}>",
        "map<string,double>",
    ]
    src = t.nation.select("n_nationkey", "n_name", "n_regionkey")

    def enc(r):
        lint = list(range(r.n_nationkey % 3))
        nested = [[r.n_nationkey, r.n_name, -r.n_nationkey]]
        return (
            str(r.n_nationkey),
            bytearray(
                pb.encode_row(
                    types,
                    [
                        r.n_nationkey,
                        lint,
                        nested,
                        {"dbl": float(r.n_regionkey) * 2},
                    ],
                )
            ),
        )

    src.rdd.map(enc).saveAsSequenceFile(d)
    back = spark.sparkContext.sequenceFile(d)

    def dec(kv):
        key, lint, nested, m = pb.decode_row(types, bytes(kv[1]))
        myint, mystring, neg = nested[0]
        return (key, mystring, neg, len(lint or []), m["dbl"])

    return spark.createDataFrame(
        back.map(dec),
        "n_nationkey long, is_name string, is_neg int, "
        "lint_len long, m_dbl double",
    )


@register(
    "fmt_jsonl_round_trip",
    oracle="""
SELECT doc_id, lang, source, n_chars, text FROM documents
WHERE n_chars > 200
""",
    category="formats",
)
def fmt_jsonl_round_trip(spark, t):
    """JSON-Lines (JsonSerDe, ``hcatalog/.../JsonSerDe.java`` — and
    the interchange format every LLM-data pipeline actually ships)
    write→read round-trip: one JSON object per line out, schema-on-
    read back. Text containing newlines/quotes survives because the
    JSON string encoding escapes them — the property that makes
    JSONL splittable at any corpus size (each line is a record; a
    100 TB directory splits on line boundaries with no sync
    markers)."""
    d = scratch_dir("fmt_jsonl_")
    src = t.documents.filter(F.col("n_chars") > 200).select(
        "doc_id", "lang", "source", "n_chars", "text"
    )
    src.write.mode("overwrite").json(d)
    return spark.read.schema(
        "doc_id long, lang string, source string, n_chars long, text string"
    ).json(d)


@register(
    "fmt_rcfile_datasource",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer WHERE c_custkey <= 300
""",
    category="formats",
)
def fmt_rcfile_datasource(spark, t):
    """The RCFile codec behind Spark 4's native Python DataSource
    API: ``df.write.format("rcfile_py").save`` → one file per
    partition in-executor, ``spark.read.format("rcfile_py")`` back
    with header-inferred schema and sync-resynchronized byte-range
    splits (option split_bytes) — the fully idiomatic
    ``STORED AS RCFILE`` migration surface, same golden rows as
    fmt_rcfile_round_trip."""
    from ..sources.rcfile_py import RCFilePyDataSource

    spark.dataSource.register(RCFilePyDataSource)
    d = scratch_dir("fmt_rcfile_ds_") + "/rc"
    src = t.customer.filter(F.col("c_custkey") <= 300).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    src.repartition(4).write.format("rcfile_py").option(
        "group_rows", 64
    ).mode("overwrite").save(d)
    return (
        spark.read.format("rcfile_py").option("split_bytes", 4096).load(d)
    )


@register(
    "hs2_wire_round_trip",
    oracle="""
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey <= 200
""",
    category="formats",
)
def hs2_wire_round_trip(spark, t):
    """Entry point B over the REAL wire: the statement travels as a
    TCLIService ExecuteStatement call (strict TBinaryProtocol over a
    TCP socket — sources/hs2_wire, field ids from the reference's
    ``service/if/TCLIService.thrift``), rows come back as paged
    TRowSet fetches through the library-free client, and the driver
    hash-checks what crossed the wire. Typed round-trip: bigint/int
    ride i64/i32 TColumnValues, doubles ride doubleVal, strings
    stringVal; NULLs are absent optional fields."""
    from ..sources.hs2_wire import HS2WireClient, serve_background

    t.customer  # ensure views exist on THIS session before serving
    srv, port = serve_background(spark, max_rows=64)
    try:
        cli = HS2WireClient("127.0.0.1", port)
        cli.open_session()
        op = cli.execute(
            "SELECT c_custkey, c_name, c_acctbal FROM customer "
            "WHERE c_custkey <= 200"
        )
        rows, more = [], True
        while more:
            batch, more = cli.fetch(op, max_rows=64)
            rows.extend(batch)
        cli.close()
    finally:
        srv.shutdown()
    return spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_acctbal double"
    )


@register(
    "fmt_parquet_bloom_filter",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey FROM supplier
WHERE s_name IN ('Supplier#000000013', 'Supplier#000000042')
""",
    category="formats",
)
def fmt_parquet_bloom_filter(spark, t):
    """Parquet bloom filters — the parquet twin of ORC's bloom
    row-group skipping (reference ``ql/io/orc/WriterImpl.java:
    152-171`` bloom filter streams; Hive sets them via
    orc.bloom.filter.columns): written through the standard
    ``parquet.bloom.filter.enabled#col`` writer option, consulted by
    parquet-mr's row-group filter on equality/IN probes over
    non-dictionary-only columns. Point-lookup round trip proves
    read-path correctness; the bloom section's presence is pinned by
    the size-delta test in tests/test_writes.py (pyarrow 16 does not
    expose bloom offsets). At warehouse scale this is the difference
    between scanning every row group of a 100 TB table and touching
    only candidates for a needle-in-haystack probe."""
    from ..scratch import scratch_dir

    d = scratch_dir("fmt_pq_bloom_")
    (
        t.supplier.select("s_suppkey", "s_name", "s_nationkey")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#s_name", "true")
        .option("parquet.bloom.filter.expected.ndv#s_name", "100000")
        .parquet(d)
    )
    return spark.read.parquet(d).filter(
        F.col("s_name").isin(
            "Supplier#000000013", "Supplier#000000042"
        )
    )


@register(
    "fmt_orc_bloom_filter",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey FROM supplier
WHERE s_name IN ('Supplier#000000013', 'Supplier#000000042')
""",
    category="formats",
)
def fmt_orc_bloom_filter(spark, t):
    """ORC bloom filters — the NATIVE Hive-side of the pair
    (reference ``ql/io/orc/WriterImpl.java:152-171`` writes
    BLOOM_FILTER streams per stripe when
    ``orc.bloom.filter.columns`` is set; the reader's SARG
    evaluator consults them for equality/IN probes before reading a
    stripe). Same writer property through Spark's ORC source, point
    lookups through the predicate-pushdown path
    (``spark.sql.orc.filterPushdown`` is on in parity confs).
    Footprint + read-identity pinned in tests/test_writes.py beside
    the parquet twin; at warehouse scale the bloom turns a
    needle-in-haystack probe from a full-table scan into a
    few-stripe read."""
    from ..scratch import scratch_dir

    d = scratch_dir("fmt_orc_bloom_")
    (
        t.supplier.select("s_suppkey", "s_name", "s_nationkey")
        .write.mode("overwrite")
        .option("orc.bloom.filter.columns", "s_name")
        .option("orc.bloom.filter.fpp", "0.01")
        .orc(d)
    )
    return spark.read.orc(d).filter(
        F.col("s_name").isin(
            "Supplier#000000013", "Supplier#000000042"
        )
    )


@register(
    "fmt_webdataset_round_trip",
    oracle="""
SELECT doc_id, lang, text FROM documents WHERE doc_id <= 400
""",
    category="formats",
)
def fmt_webdataset_round_trip(spark, t):
    """WebDataset tar-shard export → import round trip
    (sources/webdataset_py; public webdataset convention — tar of
    ``<key>.<ext>`` members). The TRAINING-side sink of the pipeline:
    text + metadata members per sample, md5-keyed deterministic shard
    placement (byte-identical re-exports), streamed one-open-tar-at-a-
    time writes after a single shard-keyed exchange, stdlib-tar
    readable by any loader. Read fans out one task per shard and
    decodes members by the declared extension map."""
    from ..sources import webdataset_py as wd

    d = scratch_dir("fmt_wds_") + "/wds"
    src = t.documents.filter(F.col("doc_id") <= 400).select(
        "doc_id", "lang", "text"
    )
    wd.write_webdataset(
        src, d, "doc_id", {"text": "txt", "lang": "cls"}, n_shards=5
    )
    back = wd.read_webdataset(
        spark, d, {"txt": "string", "cls": "string"}
    )
    return back.select(
        F.col("key").cast("bigint").alias("doc_id"),
        F.col("cls").alias("lang"),
        F.col("txt").alias("text"),
    )


@register(
    "fmt_lazybinary_sequencefile_round_trip",
    oracle="""
SELECT c_custkey, c_name, c_nationkey,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS c_acctbal,
       CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_mktsegment END
         AS c_mktsegment
FROM customer WHERE c_custkey <= 80
""",
    category="formats",
)
def fmt_lazybinary_sequencefile_round_trip(spark, t):
    """LazyBinary rows in a SequenceFile — Hive's intermediate-table
    row codec (reference ``serde/.../lazybinary/LazyBinarySerDe.java``;
    the third §2.2 binary row SerDe beside Thrift and ProtoBuf).
    Exercises the null-byte group layout (a nulled column wave), the
    Hadoop vint/vlong zero-compression (keys and nationkeys), and the
    HiveDecimalWritable scale+unscaled-bytes decimal. Same RDD
    plumbing rationale as the Thrift twin: Hadoop writables live
    below the DataFrame source API."""
    from decimal import Decimal

    from ..sources import lazybinary_py as lb

    d = scratch_dir("fmt_lazybin_") + "/seq"
    types = ["bigint", "string", "int", "decimal(12,2)", "string"]
    src = t.customer.filter(F.col("c_custkey") <= 80).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("c_acctbal"),
        F.when(F.col("c_custkey") % 4 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    (
        src.rdd.map(
            lambda r: (
                str(r.c_custkey),
                bytearray(
                    lb.encode_row(
                        types,
                        [
                            r.c_custkey,
                            r.c_name,
                            r.c_nationkey,
                            r.c_acctbal,
                            r.c_mktsegment,
                        ],
                    )
                ),
            )
        ).saveAsSequenceFile(d)
    )
    back = spark.sparkContext.sequenceFile(d)
    rows = back.map(lambda kv: tuple(lb.decode_row(types, bytes(kv[1]))))
    # The wire round-trip carries a true HiveDecimalWritable; the FINAL
    # output column is aligned to DOUBLE per the repo convention (driver
    # comparator renders Spark DecimalType vs DuckDB DECIMAL cells
    # differently — see oracle.py decimal notes).
    return spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal decimal(12,2), c_mktsegment string",
    ).withColumn("c_acctbal", F.col("c_acctbal").cast("double"))


@register(
    "fmt_typedbytes_transform",
    oracle="""
SELECT c_custkey, c_name,
       CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_nationkey END
         AS c_nationkey
FROM customer WHERE c_custkey <= 120
""",
    category="formats",
)
def fmt_typedbytes_transform(spark, t):
    """Binary TRANSFORM via TypedBytes (reference ``contrib/.../
    TypedBytesSerDe.java`` — the Hadoop-streaming RECORDWRITER/
    RECORDREADER pair): rows stream through an external process as
    self-describing typed values and come back intact, NULL code and
    all. ``cat`` as the script makes this a pure wire-contract
    round trip (the pytest drives a genuinely transforming script);
    one subprocess per partition, stdin fed by a writer thread —
    the exact ScriptOperator topology."""
    from ..functions.extensions import transform_typedbytes

    src = t.customer.filter(F.col("c_custkey") <= 120).select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 5 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("c_nationkey"),
    )
    return transform_typedbytes(
        src, ["cat"], "c_custkey long, c_name string, c_nationkey int"
    )


@register(
    "fmt_parquet_schema_evolution",
    oracle="""
SELECT n_nationkey, n_name,
       CASE WHEN n_regionkey >= 2 THEN n_regionkey ELSE NULL END
         AS n_regionkey,
       CASE WHEN n_regionkey >= 2 THEN 'v2' ELSE NULL END AS batch_tag
FROM nation
""",
    category="formats",
)
def fmt_parquet_schema_evolution(spark, t):
    """Schema evolution on a parquet table — Hive's ``ALTER TABLE ADD
    COLUMNS`` warehouse reality (reference
    ``ql/exec/DDLTask.java alterTable ADDCOLS`` +
    ``serde2/.../SchemaEvolution``): old files carry the v1 schema
    (2 cols), new files v2 (4 cols); a mergeSchema read serves ONE
    union schema with NULLs for columns a file predates. Also the
    pruning contract: selecting only v1 columns must read v1 files
    untouched (no rewrite — schema-on-read, never data migration)."""
    d = scratch_dir("fmt_evolve_") + "/tbl"
    v1 = t.nation.filter(F.col("n_regionkey") < 2).select(
        "n_nationkey", "n_name"
    )
    v1.write.mode("append").parquet(d)
    v2 = t.nation.filter(F.col("n_regionkey") >= 2).select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.lit("v2").alias("batch_tag"),
    )
    v2.write.mode("append").parquet(d)
    return spark.read.option("mergeSchema", "true").parquet(d).select(
        "n_nationkey", "n_name", "n_regionkey", "batch_tag"
    )


@register(
    "fmt_text_add_columns",
    oracle="""
SELECT s_suppkey, s_name,
       CASE WHEN s_suppkey % 2 = 0 THEN NULL ELSE s_nationkey END
         AS s_nationkey,
       CASE WHEN s_suppkey % 2 = 0 THEN NULL
            ELSE 'batch-' || CAST(s_suppkey % 3 AS VARCHAR) END AS tag
FROM supplier WHERE s_suppkey <= 50
""",
    category="formats",
)
def fmt_text_add_columns(spark, t):
    """LazySimpleSerDe short-row semantics after ``ALTER TABLE ADD
    COLUMNS`` (reference ``serde/.../lazy/LazyStruct.java:parse`` —
    "Missing fields default to NULL"): pre-ALTER text rows have fewer
    \\x01-separated fields than the current schema; the SerDe pads
    the missing TRAILING columns with NULL instead of failing.
    Even suppkeys are written as old 2-field rows, odd as new
    4-field rows; one schema-on-read pass serves both vintages."""
    d = scratch_dir("fmt_addcols_")
    src = t.supplier.filter(F.col("s_suppkey") <= 50)
    old_rows = src.filter(F.col("s_suppkey") % 2 == 0).select(
        F.concat_ws(
            "\x01",
            F.col("s_suppkey").cast("string"),
            F.col("s_name"),
        ).alias("value")
    )
    new_rows = src.filter(F.col("s_suppkey") % 2 == 1).select(
        F.concat_ws(
            "\x01",
            F.col("s_suppkey").cast("string"),
            F.col("s_name"),
            F.col("s_nationkey").cast("string"),
            F.concat(F.lit("batch-"), (F.col("s_suppkey") % 3)),
        ).alias("value")
    )
    old_rows.unionByName(new_rows).write.mode("overwrite").text(d)
    raw = spark.read.text(d)
    parts = F.split(F.col("value"), "\x01")
    # element_at returns NULL past the end — exactly the SerDe's
    # missing-trailing-field rule
    return raw.select(
        F.element_at(parts, 1).cast("long").alias("s_suppkey"),
        F.element_at(parts, 2).alias("s_name"),
        F.element_at(parts, 3).cast("int").alias("s_nationkey"),
        F.element_at(parts, 4).alias("tag"),
    )


@register(
    "fmt_arrow_ipc_round_trip",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey <= 600
""",
    category="formats",
)
def fmt_arrow_ipc_round_trip(spark, t):
    """Arrow IPC stream-file export → import (sources/arrow_ipc_py;
    public Arrow IPC spec — the on-disk format HuggingFace datasets
    mmaps): batches stream from Spark's Arrow runtime straight into
    one part file per partition (no row pivot), read back one task
    per file. The interchange sink a training pipeline actually
    hands to its loaders, beside the Hive-era formats."""
    from ..sources import arrow_ipc_py as aipc

    d = scratch_dir("fmt_arrow_") + "/ipc"
    src = t.orders.filter(F.col("o_orderkey") <= 600).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    aipc.write_arrow_ipc(src.repartition(4), d)
    return aipc.read_arrow_ipc(spark, d)


@register(
    "fmt_parquet_codecs",
    oracle="""
SELECT 'gzip' AS codec, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(p_retailprice) AS DECIMAL(38,2)) AS DOUBLE) AS total
FROM part WHERE p_partkey <= 500
UNION ALL
SELECT 'snappy', CAST(COUNT(*) AS BIGINT),
       CAST(CAST(SUM(p_retailprice) AS DECIMAL(38,2)) AS DOUBLE)
FROM part WHERE p_partkey <= 500
UNION ALL
SELECT 'zstd', CAST(COUNT(*) AS BIGINT),
       CAST(CAST(SUM(p_retailprice) AS DECIMAL(38,2)) AS DOUBLE)
FROM part WHERE p_partkey <= 500
ORDER BY codec
""",
    category="formats",
)
def fmt_parquet_codecs(spark, t):
    """Parquet compression-codec matrix (the ``parquet.compression``
    table property — reference ``ql/io/parquet/`` writer options):
    the same slice written under gzip, snappy and zstd, each read
    back and aggregated — one row per codec proving every encoding
    decodes to identical data. Codec choice is a 100 TB cost dial
    (zstd ≈ gzip ratio at snappy-ish CPU); the pytest twin pins that
    the on-disk footprints actually differ by codec."""
    import os

    d = scratch_dir("fmt_codecs_")
    src = t.part.filter(F.col("p_partkey") <= 500).select(
        "p_partkey", "p_name", "p_type", "p_retailprice"
    )
    outs = []
    for codec in ("gzip", "snappy", "zstd"):
        path = os.path.join(d, codec)
        src.write.option("compression", codec).parquet(path)
        back = spark.read.parquet(path)
        outs.append(
            back.agg(
                F.lit(codec).alias("codec"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("p_retailprice").cast("decimal(38,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                .alias("total"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("codec")
