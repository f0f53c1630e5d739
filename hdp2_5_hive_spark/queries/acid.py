"""ACID DML queries: UPDATE / DELETE / MERGE INTO end-to-end over a
copy-on-write parquet table, final table state hash-checked against a
pure-SQL oracle (``ql/parse/UpdateDeleteSemanticAnalyzer.java:50,
68-94``; SURVEY §2.2 "UPDATE/DELETE → DataFrame rewrite").
"""

from __future__ import annotations


from pyspark.sql import functions as F

from ..functions.hive_compat import dsum
from ..scratch import scratch_dir
from .registry import register


@register(
    "acid_update_delete",
    oracle="""
WITH t AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderpriority = '1-URGENT' AND o_totalprice > 250000
              THEN o_totalprice * 0.5 ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM orders
  WHERE NOT (o_orderpriority = '5-LOW' AND o_totalprice < 100000)
)
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM t GROUP BY o_orderpriority
""",
    category="acid",
)
def acid_update_delete(spark, t):
    """UPDATE then DELETE on a partitioned copy-on-write table
    (UpdateDeleteSemanticAnalyzer.java:50,68): seed orders partitioned
    by o_orderpriority, halve the price of expensive urgent orders,
    drop cheap low-priority ones, then aggregate the surviving table.
    Each DML rewrites ONLY its matched partitions (dynamic-partition
    overwrite; pruning asserted in tests/test_acid.py). The halving
    factor 0.5 is exactly representable so both engines agree
    bit-for-bit."""
    from ..sources import acid

    d = scratch_dir("acid_ud_")
    seed = t.orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    (
        seed.repartition("o_orderpriority")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(d)
    )
    acid.update_table(
        spark,
        d,
        {"o_totalprice": F.col("o_totalprice") * 0.5},
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 250000),
        partition_cols=["o_orderpriority"],
    )
    acid.delete_from(
        spark,
        d,
        (F.col("o_orderpriority") == "5-LOW")
        & (F.col("o_totalprice") < 100000),
        partition_cols=["o_orderpriority"],
    )
    back = spark.read.parquet(d)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


@register(
    "acid_merge_upsert",
    oracle="""
WITH src AS (
  SELECT c_custkey, 'UPD-' || c_name AS c_name,
         c_acctbal + 1000.0 AS c_acctbal,
         (c_custkey % 20 = 0) AS del
  FROM customer WHERE c_custkey % 4 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW-' || c_name,
         CAST(1.5 AS DOUBLE), FALSE
  FROM customer WHERE c_custkey % 10 = 3
),
kept AS (
  SELECT t.c_custkey,
         CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name
              ELSE t.c_name END AS c_name,
         CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
              ELSE t.c_acctbal END AS c_acctbal,
         COALESCE(s.del, FALSE) AS del
  FROM customer t LEFT JOIN src s ON t.c_custkey = s.c_custkey
)
SELECT c_custkey, c_name, c_acctbal FROM kept WHERE NOT del
UNION ALL
SELECT s.c_custkey, s.c_name, s.c_acctbal
FROM src s LEFT JOIN customer t ON s.c_custkey = t.c_custkey
WHERE t.c_custkey IS NULL
""",
    category="acid",
)
def acid_merge_upsert(spark, t):
    """MERGE INTO (upsert + conditional delete in one statement —
    the update+delete+insert decomposition HDP 2.5 users ran on the
    same ACID machinery): source rows update matching customers,
    delete every 20th, and insert brand-new keys; the final TABLE
    STATE (all rows) is the checked result, so every routing branch
    of the merge join is hash-verified."""
    from ..sources import acid

    d = scratch_dir("acid_merge_")
    target = t.customer.select("c_custkey", "c_name", "c_acctbal")
    target.write.mode("overwrite").parquet(d)

    c = t.customer
    updates = c.filter(F.col("c_custkey") % 4 == 0).select(
        "c_custkey",
        F.concat(F.lit("UPD-"), F.col("c_name")).alias("c_name"),
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        (F.col("c_custkey") % 20 == 0).alias("del"),
    )
    inserts = c.filter(F.col("c_custkey") % 10 == 3).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_name")).alias("c_name"),
        F.lit(1.5).alias("c_acctbal"),
        F.lit(False).alias("del"),
    )
    acid.merge_into(
        spark,
        d,
        updates.unionByName(inserts),
        on=["c_custkey"],
        matched_update={
            "c_name": F.col("s.c_name"),
            "c_acctbal": F.col("s.c_acctbal"),
        },
        matched_delete=F.col("s.del"),
        not_matched_insert=True,
    )
    return spark.read.parquet(d)


@register(
    "acid_delta_layout_reader",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey % 5 = 0 THEN 'REGION_UPDATED'
            ELSE n_name END AS n_name,
       n_regionkey
FROM nation
WHERE n_nationkey % 7 <> 0
""",
    category="acid",
)
def acid_delta_layout_reader(spark, t):
    """Native Hive ACID base/delta layout, merge-on-read (reference
    ``ql/io/AcidUtils.java`` getAcidState +
    ``orc/OrcRecordUpdater.java`` 6-field record schema; closes the
    §2.2 'delta-file ACID reader' row): a base_0000001 of all nation
    rows, a delta updating every 5th row's name (operation=1, higher
    currentTransaction), and a delta deleting every 7th row
    (operation=2). sources/acid.read_acid_table resolves
    latest-transaction-wins per (originalTransaction, bucket, rowId)
    and drops winning deletes — the oracle states the surviving
    logical table directly."""
    from ..scratch import scratch_dir
    from ..sources import acid as ac

    d = scratch_dir("acid_delta_") + "/tbl"
    n = t.nation.select(
        F.lit(1).cast("long").alias("originalTransaction"),
        F.lit(0).alias("bucket"),
        F.col("n_nationkey").cast("long").alias("rowId"),
        "n_nationkey",
        "n_name",
        "n_regionkey",
    )
    ac.write_acid_events(n, d, kind="base", write_id=1)
    upd = n.filter(F.col("n_nationkey") % 5 == 0).withColumn(
        "n_name", F.lit("REGION_UPDATED")
    )
    ac.write_acid_events(
        upd, d, kind="delta", write_id=2, operation=ac.OP_UPDATE
    )
    dele = n.filter(F.col("n_nationkey") % 7 == 0)
    ac.write_acid_events(
        dele, d, kind="delta", write_id=3, operation=ac.OP_DELETE
    )
    return ac.read_acid_table(spark, d).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "acid_major_compaction",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey % 5 = 0 THEN 'REGION_UPDATED'
            ELSE n_name END AS n_name,
       n_regionkey
FROM nation
WHERE n_nationkey % 7 <> 0
""",
    category="acid",
)
def acid_major_compaction(spark, t):
    """MAJOR compaction of the native base/delta layout (reference
    ``ql/txn/compactor/Worker.java`` → CompactorMR merge +
    ``Cleaner.java`` removal): the same base+update+delete state as
    acid_delta_layout_reader is FOLDED into one base_<maxWriteId> of
    surviving rows and the stale dirs removed
    (sources/acid.compact_acid_table), then read back — the answer
    must be identical to the pre-compaction merge-on-read, which is
    the compactor's whole correctness contract. Cost shape equals
    one MoR pass + one ORC write, same as Hive's compactor job."""
    from ..scratch import scratch_dir
    from ..sources import acid as ac

    d = scratch_dir("acid_compact_") + "/tbl"
    n = t.nation.select(
        F.lit(1).cast("long").alias("originalTransaction"),
        F.lit(0).alias("bucket"),
        F.col("n_nationkey").cast("long").alias("rowId"),
        "n_nationkey",
        "n_name",
        "n_regionkey",
    )
    ac.write_acid_events(n, d, kind="base", write_id=1)
    upd = n.filter(F.col("n_nationkey") % 5 == 0).withColumn(
        "n_name", F.lit("REGION_UPDATED")
    )
    ac.write_acid_events(
        upd, d, kind="delta", write_id=2, operation=ac.OP_UPDATE
    )
    dele = n.filter(F.col("n_nationkey") % 7 == 0)
    ac.write_acid_events(
        dele, d, kind="delta", write_id=3, operation=ac.OP_DELETE
    )
    ac.compact_acid_table(spark, d)
    return ac.read_acid_table(spark, d).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "acid_minor_compaction",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey % 5 = 0 THEN 'REGION_UPDATED'
            WHEN n_nationkey % 3 = 0 THEN 'MINOR_TOUCHED'
            ELSE n_name END AS n_name,
       n_regionkey
FROM nation
WHERE n_nationkey % 7 <> 0
""",
    category="acid",
)
def acid_minor_compaction(spark, t):
    """MINOR compaction (reference ``ql/txn/compactor/CompactorMR.
    java`` minor mode; Initiator picks it when delta COUNT, not
    size, crosses hive.compactor.delta.num.threshold): three deltas
    (update, delete, second update) above the base are consolidated
    into ONE delta_lo_hi with every event preserved — deletes
    included, because the merged delta must still mask base rows —
    and the base untouched. The read-back answer must equal the
    pre-compaction merge-on-read; dir-shape and delete-event
    preservation are pinned in tests/test_acid.py."""
    from ..scratch import scratch_dir
    from ..sources import acid as ac

    d = scratch_dir("acid_minor_") + "/tbl"
    n = t.nation.select(
        F.lit(1).cast("long").alias("originalTransaction"),
        F.lit(0).alias("bucket"),
        F.col("n_nationkey").cast("long").alias("rowId"),
        "n_nationkey",
        "n_name",
        "n_regionkey",
    )
    ac.write_acid_events(n, d, kind="base", write_id=1)
    upd = n.filter(F.col("n_nationkey") % 3 == 0).withColumn(
        "n_name", F.lit("MINOR_TOUCHED")
    )
    ac.write_acid_events(
        upd, d, kind="delta", write_id=2, operation=ac.OP_UPDATE
    )
    dele = n.filter(F.col("n_nationkey") % 7 == 0)
    ac.write_acid_events(
        dele, d, kind="delta", write_id=3, operation=ac.OP_DELETE
    )
    upd2 = n.filter(
        (F.col("n_nationkey") % 5 == 0) & (F.col("n_nationkey") % 7 != 0)
    ).withColumn("n_name", F.lit("REGION_UPDATED"))
    ac.write_acid_events(
        upd2, d, kind="delta", write_id=4, operation=ac.OP_UPDATE
    )
    ac.compact_acid_minor(spark, d)
    return ac.read_acid_table(spark, d).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "acid_time_travel_read",
    oracle="""
SELECT n_nationkey,
       CASE WHEN n_nationkey % 5 = 0 THEN 'REGION_UPDATED'
            ELSE n_name END AS n_name,
       n_regionkey,
       CAST(2 AS BIGINT) AS as_of
FROM nation
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, CAST(1 AS BIGINT) AS as_of
FROM nation
ORDER BY as_of, n_nationkey
""",
    category="acid",
)
def acid_time_travel_read(spark, t):
    """TIME TRAVEL over the native base/delta layout
    (sources/acid.read_acid_table(as_of_write_id=...)): the same
    base(1) + update-delta(2) + delete-delta(3) state as
    acid_delta_layout_reader, read AS OF write 1 (pristine base —
    no update, no delete) and AS OF write 2 (updates applied,
    deletes not yet) — stacked with an as_of tag column. Snapshot
    isolation semantics per write id: directory pruning at plan
    time plus a row-level currentTransaction bound for spanning
    compacted deltas; travel below the oldest surviving base raises
    (cleaner contract) — pinned in tests/test_acid.py."""
    from ..scratch import scratch_dir
    from ..sources import acid as ac

    d = scratch_dir("acid_tt_") + "/tbl"
    n = t.nation.select(
        F.lit(1).cast("long").alias("originalTransaction"),
        F.lit(0).alias("bucket"),
        F.col("n_nationkey").cast("long").alias("rowId"),
        "n_nationkey",
        "n_name",
        "n_regionkey",
    )
    ac.write_acid_events(n, d, kind="base", write_id=1)
    upd = n.filter(F.col("n_nationkey") % 5 == 0).withColumn(
        "n_name", F.lit("REGION_UPDATED")
    )
    ac.write_acid_events(
        upd, d, kind="delta", write_id=2, operation=ac.OP_UPDATE
    )
    dele = n.filter(F.col("n_nationkey") % 7 == 0)
    ac.write_acid_events(
        dele, d, kind="delta", write_id=3, operation=ac.OP_DELETE
    )
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    at1 = ac.read_acid_table(spark, d, as_of_write_id=1).select(
        *cols, F.lit(1).cast("bigint").alias("as_of")
    )
    at2 = ac.read_acid_table(spark, d, as_of_write_id=2).select(
        *cols, F.lit(2).cast("bigint").alias("as_of")
    )
    return at1.unionAll(at2).orderBy("as_of", "n_nationkey")
