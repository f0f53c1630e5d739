"""Streaming surface tests (SURVEY §2.10): transactional ingest
facade + watermarked windowed stream aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from hdp2_5_hive_spark.streaming.ingest import (
    StreamingEndpoint,
    read_event_stream,
    run_to_completion,
    windowed_counts,
)

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("action", StringType()),
        StructField("n", IntegerType()),
    ]
)


@pytest.fixture()
def endpoint(spark, tmp_path):
    return StreamingEndpoint(spark, str(tmp_path / "ingest"), SCHEMA)


def test_commit_visible_abort_invisible(endpoint):
    b1 = endpoint.new_batch()
    b1.write({"user_id": "u1", "action": "view", "n": 1})
    b1.write({"user_id": "u2", "action": "click", "n": 2})
    b1.commit()

    b2 = endpoint.new_batch()
    b2.write({"user_id": "u3", "action": "view", "n": 3})
    b2.abort()  # never lands

    b3 = endpoint.new_batch()
    b3.write({"user_id": "u4", "action": "buy", "n": 4})
    b3.commit()

    users = {r.user_id for r in endpoint.read_committed().collect()}
    assert users == {"u1", "u2", "u4"}


def test_closed_batch_rejects_writes(endpoint):
    b = endpoint.new_batch()
    b.write({"user_id": "u1", "action": "view", "n": 1})
    b.commit()
    with pytest.raises(RuntimeError):
        b.write({"user_id": "u2", "action": "view", "n": 2})
    with pytest.raises(RuntimeError):
        b.commit()


def test_delimited_and_json_writers(endpoint):
    b = endpoint.new_batch()
    b.write_delimited("u1,view,1")
    b.write_json('{"user_id": "u2", "action": "click", "n": 2}')
    with pytest.raises(ValueError):
        b.write_delimited("too,few")
    with pytest.raises(ValueError):
        b.write_json('{"user_id": "u3", "bogus": 1}')
    b.commit()
    got = {
        (r.user_id, r.action)
        for r in endpoint.read_committed().collect()
    }
    assert got == {("u1", "view"), ("u2", "click")}


def test_windowed_stream_counts(spark, tmp_path):
    """End-to-end: ingest → file stream → watermarked tumbling window
    → exactly-once sink (availableNow drains and stops)."""
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    rows = [
        ("2024-01-01 00:00:10", "a"),
        ("2024-01-01 00:00:50", "a"),
        ("2024-01-01 00:01:10", "a"),
        ("2024-01-01 00:01:20", "b"),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id string").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )
    df.write.parquet(src)

    stream = read_event_stream(spark, src, schema)
    assert stream.isStreaming
    agg = windowed_counts(stream, "ts", "user_id", window="1 minute")
    out = str(tmp_path / "out")
    run_to_completion(agg, str(tmp_path / "ckpt"), out)

    # Append mode emits only watermark-finalized windows; with a
    # 2-minute watermark and max event 00:01:20, the 00:00 window for
    # 'a' may not finalize in a single drain — so re-run after adding
    # a late high-watermark event to flush.
    df2 = spark.createDataFrame(
        [("2024-01-01 00:10:00", "c")], "ts string, user_id string"
    ).select(F.to_timestamp("ts").alias("ts"), "user_id")
    df2.write.mode("append").parquet(src)
    stream2 = read_event_stream(spark, src, schema)
    run_to_completion(
        windowed_counts(stream2, "ts", "user_id", window="1 minute"),
        str(tmp_path / "ckpt"),
        out,
    )

    got = {
        (str(r.window_start), r.user_id): r.n
        for r in spark.read.parquet(out).collect()
    }
    assert got[("2024-01-01 00:00:00", "a")] == 2
    assert got[("2024-01-01 00:01:00", "a")] == 1
    assert got[("2024-01-01 00:01:00", "b")] == 1


def test_streaming_dedup_with_watermark(spark, tmp_path):
    """dropDuplicates on a stream: one state-store entry per key,
    later duplicates absorbed; watermark bounds the state (§2.10 —
    the streaming twin of the stream_dedup_first registered query)."""
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", StringType()),
            StructField("event_id", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    rows = [
        ("2024-01-01 00:00:10", "a", "e1"),
        ("2024-01-01 00:00:20", "a", "e1"),  # duplicate event id
        ("2024-01-01 00:00:30", "a", "e2"),
        ("2024-01-01 00:00:40", "b", "e1"),
        ("2024-01-01 00:00:50", "b", "e1"),  # duplicate
    ]
    spark.createDataFrame(
        rows, "ts string, user_id string, event_id string"
    ).select(
        F.to_timestamp("ts").alias("ts"), "user_id", "event_id"
    ).write.parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["user_id", "event_id"])
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, r.event_id) for r in spark.read.parquet(out).collect()}
    assert got == {("a", "e1"), ("a", "e2"), ("b", "e1")}


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: views matched to purchases by
    the same user within 10 minutes. Both sides carry watermarks so
    Spark can bound the join state (§2.10 — the live form of the
    stream_interval_join registered query)."""
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", StringType()),
            StructField("event_id", StringType()),
        ]
    )
    views_src = str(tmp_path / "views")
    buys_src = str(tmp_path / "buys")
    views = [
        ("2024-01-01 00:00:00", "u1", "v1"),
        ("2024-01-01 00:30:00", "u1", "v2"),
        ("2024-01-01 00:00:00", "u2", "v3"),
    ]
    buys = [
        ("2024-01-01 00:05:00", "u1", "p1"),  # matches v1 (5 min)
        ("2024-01-01 00:31:00", "u1", "p2"),  # matches v2 (1 min)
        ("2024-01-01 01:00:00", "u2", "p3"),  # 60 min after v3 — no match
    ]
    for src, rows in [(views_src, views), (buys_src, buys)]:
        spark.createDataFrame(
            rows, "ts string, user_id string, event_id string"
        ).select(F.to_timestamp("ts").alias("ts"), "user_id", "event_id").write.parquet(src)

    v = (
        spark.readStream.schema(schema)
        .parquet(views_src)
        .withWatermark("ts", "20 minutes")
        .select(
            F.col("ts").alias("v_ts"),
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
        )
    )
    b = (
        spark.readStream.schema(schema)
        .parquet(buys_src)
        .withWatermark("ts", "20 minutes")
        .select(
            F.col("ts").alias("b_ts"),
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("purchase_id"),
        )
    )
    joined = v.join(
        b,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("v_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("view_id", "purchase_id")
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.view_id, r.purchase_id) for r in spark.read.parquet(out).collect()
    }
    assert got == {("v1", "p1"), ("v2", "p2")}


def test_foreach_batch_sink_idempotent_under_replay(spark, tmp_path):
    """idempotent_batch_sink: replaying a micro-batch (the
    at-least-once window of foreachBatch) must not duplicate rows —
    the batch's partition is overwritten, others untouched."""
    from hdp2_5_hive_spark.streaming.ingest import idempotent_batch_sink

    out = str(tmp_path / "sink_out")
    sink = idempotent_batch_sink(out)
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    b1 = spark.createDataFrame([("c", 3)], "k string, v int")
    sink(b0, 0)
    sink(b0, 0)  # replay of the LAST batch (the only one Spark
    # ever re-delivers: batch N is committed before N+1 starts; an
    # OLDER id reappearing means a fresh/stale checkpoint, which the
    # sink now rejects — see assert_batch_id_monotonic)
    sink(b1, 1)
    sink(b1, 1)
    rows = sorted((r.k, r.v, r.batch_id) for r in spark.read.parquet(out).collect())
    assert rows == [("a", 1, 0), ("b", 2, 0), ("c", 3, 1)]

    # and end-to-end through a real stream
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("x", 10), ("y", 20)], "k string, v int"
    ).write.parquet(src)
    stream = spark.readStream.schema("k string, v int").parquet(src)
    out2 = str(tmp_path / "sink2")
    q = (
        stream.writeStream.foreachBatch(idempotent_batch_sink(out2))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {(r.k, r.v) for r in spark.read.parquet(out2).collect()} == {
        ("x", 10),
        ("y", 20),
    }


def test_corpus_ingest_stream_dedups_across_batches(spark, tmp_path):
    """Streaming corpus cleaning end-to-end: two micro-batch
    arrivals; short docs are quality-gated out, and a duplicate text
    arriving in the SECOND batch (different doc_id, same normalized
    fingerprint) is dropped by the streaming dedup state."""
    from hdp2_5_hive_spark.streaming.ingest import corpus_ingest_stream

    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("doc_id", StringType()),
            StructField("text", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    b1 = [
        ("2024-01-01 00:00:01", "d1", "the quick brown fox jumps"),
        ("2024-01-01 00:00:02", "d2", "tiny"),  # below min_tokens
        ("2024-01-01 00:00:03", "d3", "another perfectly fine document"),
    ]
    spark.createDataFrame(
        b1, "ts string, doc_id string, text string"
    ).select(F.to_timestamp("ts").alias("ts"), "doc_id", "text").write.parquet(
        src
    )

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        out_df = corpus_ingest_stream(stream, min_tokens=3)
        q = (
            out_df.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    b2 = [
        # same text as d1 modulo case/whitespace -> same fingerprint
        ("2024-01-01 00:02:00", "d9", "  The  QUICK brown fox jumps "),
        ("2024-01-01 00:02:01", "d10", "a genuinely new third document"),
    ]
    spark.createDataFrame(
        b2, "ts string, doc_id string, text string"
    ).select(F.to_timestamp("ts").alias("ts"), "doc_id", "text").write.mode(
        "append"
    ).parquet(src)
    drain()

    got = {r.doc_id: r.fingerprint for r in spark.read.parquet(
        str(tmp_path / "out")
    ).collect()}
    assert set(got) == {"d1", "d3", "d10"}  # d2 gated, d9 deduped
    assert len(set(got.values())) == 3


def test_stream_static_broadcast_enrich(spark, tmp_path):
    """Stream-static enrichment — the production shape for joining a
    firehose against a dimension table: the static side needs no
    watermark, is re-resolvable per micro-batch, and (being small)
    should BROADCAST inside each micro-batch rather than shuffle the
    stream. Left join keeps events whose dimension row is missing."""
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    rows = [
        ("2024-01-01 00:00:10", "a"),
        ("2024-01-01 00:00:50", "b"),
        ("2024-01-01 00:01:10", "z"),  # no dimension row
    ]
    spark.createDataFrame(rows, "ts string, user_id string").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    ).write.parquet(src)
    dims = spark.createDataFrame(
        [("a", "gold"), ("b", "basic"), ("c", "basic")],
        "user_id string, tier string",
    )

    stream = read_event_stream(spark, src, schema)
    enriched = stream.join(F.broadcast(dims), "user_id", "left").select(
        "user_id", "ts", F.coalesce("tier", F.lit("unknown")).alias("tier")
    )
    assert enriched.isStreaming
    out = str(tmp_path / "out")
    q = (
        enriched.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: r.tier for r in spark.read.parquet(out).collect()
    }
    assert got == {"a": "gold", "b": "basic", "z": "unknown"}
    # The micro-batch plan broadcast the dimension: no shuffle of the
    # stream side for the join.
    plan = q._jsq.explainInternal(True)
    assert "BroadcastHashJoin" in plan, plan


def test_jsonl_stream_source_incremental_offsets(spark, tmp_path):
    """Python streaming DataSource (jsonl_stream): a first drain
    ingests existing shard bytes; appending records to the SAME file
    and adding a new shard yields exactly the appended records in the
    second drain (per-file byte offsets — no re-read, no loss)."""
    import json as j

    from hdp2_5_hive_spark.streaming.jsonl_source import (
        JsonlStreamDataSource,
    )

    spark.dataSource.register(JsonlStreamDataSource)
    d = tmp_path / "shards"
    d.mkdir()
    f1 = d / "a.jsonl"
    f1.write_text(
        "\n".join(j.dumps({"doc_id": i, "text": f"t{i}"}) for i in (1, 2))
        + "\n"
    )
    out = str(tmp_path / "out")

    def drain():
        stream = (
            spark.readStream.format("jsonl_stream")
            .option("path", str(d))
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.doc_id for r in spark.read.parquet(out).collect()}

    assert drain() == {1, 2}
    with open(f1, "a") as fh:
        fh.write(j.dumps({"doc_id": 3, "text": "t3"}) + "\n")
    (d / "b.jsonl").write_text(
        j.dumps({"doc_id": 4, "text": "t4"}) + "\n"
    )
    assert drain() == {1, 2, 3, 4}
    # exactly once: no duplicates across drains
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4


def test_jsonl_stream_offsets_monotonic_on_truncation(tmp_path):
    """ADVICE r6: a shard that SHRINKS (truncate/rewrite) must not
    rewind its committed offset — when it grows back past the old
    size, only bytes beyond the previously-consumed offset are read,
    never a re-ingest of the overlap as duplicates."""
    import json as j

    from hdp2_5_hive_spark.streaming.jsonl_source import JsonlStreamReader

    d = tmp_path / "shards"
    d.mkdir()
    f1 = d / "a.jsonl"
    f1.write_text(
        "\n".join(j.dumps({"doc_id": i, "text": f"t{i}"}) for i in (1, 2))
        + "\n"
    )
    reader = JsonlStreamReader({"path": str(d)})
    start = reader.initialOffset()
    rows, end = reader.read(start)
    assert {r[0] for r in rows} == {1, 2}
    consumed = end[str(f1)]

    # shrink the file (rewrite with fewer bytes)
    f1.write_text(j.dumps({"doc_id": 9, "text": "t9"}) + "\n")
    rows2, end2 = reader.read(end)
    assert list(rows2) == []  # nothing re-read from the overlap
    assert end2[str(f1)] == consumed  # offset held, not rewound

    # grow past the old size: only bytes BEYOND the held offset are
    # ingested (the first `consumed` bytes are never re-read, so
    # their content is irrelevant — newline-terminated filler here)
    tail = j.dumps({"doc_id": 10, "text": "t10"}) + "\n"
    f1.write_bytes(b"x" * (consumed - 1) + b"\n" + tail.encode())
    rows3, _ = reader.read(end2)
    assert {r[0] for r in rows3} == {10}


def test_jsonl_stream_to_clean_corpus_pipeline(spark, tmp_path):
    """Capstone: the streaming corpus path end-to-end — jsonl_stream
    source → unicode normalization (Arrow UDF works on a stream) →
    min-length quality gate → parquet sink; a second shard drain
    flows through the SAME checkpointed pipeline incrementally."""
    import json as j

    from hdp2_5_hive_spark.operators.textstats import normalize_unicode
    from hdp2_5_hive_spark.streaming.jsonl_source import (
        JsonlStreamDataSource,
    )

    spark.dataSource.register(JsonlStreamDataSource)
    d = tmp_path / "clean_shards"
    d.mkdir()
    (d / "s0.jsonl").write_text(
        j.dumps({"doc_id": 1, "text": "Café  culture  here"}) + "\n"
        + j.dumps({"doc_id": 2, "text": "xx"}) + "\n"  # too short
    )
    out = str(tmp_path / "clean_out")

    def drain():
        stream = (
            spark.readStream.format("jsonl_stream")
            .option("path", str(d))
            .load()
        )
        cleaned = normalize_unicode(stream, "doc_id", "text").filter(
            F.length("text_norm") >= 10
        )
        q = (
            cleaned.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "clean_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r.doc_id: r.text_norm for r in spark.read.parquet(out).collect()
        }

    assert drain() == {1: "Cafe culture here"}
    (d / "s1.jsonl").write_text(
        j.dumps({"doc_id": 3, "text": "déjà vu all over again"})
        + "\n"
    )
    got = drain()
    assert got == {1: "Cafe culture here", 3: "deja vu all over again"}


def test_streaming_cdc_merge_upsert_sink(spark, tmp_path):
    """Streaming CDC apply — foreachBatch + MERGE (acid.merge_into):
    a stream of keyed change records upserts into a parquet target
    per micro-batch (update matched, insert new, delete on op='D').
    The production change-data shape: the stream never rewrites the
    whole table, only the merge join's routed rows."""
    import json as j

    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.sources.acid import merge_into

    target = str(tmp_path / "cdc_target")
    spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "k long, v string"
    ).write.parquet(target)

    src = str(tmp_path / "cdc_src")
    spark.createDataFrame(
        [(2, "new2", "U"), (4, "new4", "I"), (3, None, "D")],
        "k long, v string, op string",
    ).write.parquet(src)

    def apply_batch(batch_df, batch_id):
        merge_into(
            spark,
            target,
            batch_df,
            ["k"],
            matched_update={"v": F.col("s.v")},
            matched_delete=F.col("s.op") == "D",
            not_matched_insert=True,
        )

    stream = spark.readStream.schema("k long, v string, op string").parquet(
        src
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "cdc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.k: r.v
        for r in spark.read.parquet(target).collect()
    }
    assert got == {1: "old1", 2: "new2", 4: "new4"}


def test_streaming_dedup_within_watermark_differing_event_times(
    spark, tmp_path
):
    """dropDuplicatesWithinWatermark: duplicates whose EVENT TIMES
    differ (retries restamped by the producer) are still deduped, as
    long as they arrive within the watermark delay of the first
    occurrence — the case plain dropDuplicates([key, ts]) cannot
    handle (it would keep both rows since ts differs) and plain
    dropDuplicates([key]) handles only with UNBOUNDED state. This is
    the state-bounded exactly-once ingest shape for document streams
    whose upstream retries re-timestamp (§2.10)."""
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("doc_id", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    rows = [
        ("2024-01-01 00:00:10", "d1"),
        ("2024-01-01 00:02:00", "d1"),  # retry, restamped +110s
        ("2024-01-01 00:00:30", "d2"),
        ("2024-01-01 00:07:00", "d2"),  # retry within 10m watermark
        ("2024-01-01 00:01:00", "d3"),
    ]
    spark.createDataFrame(rows, "ts string, doc_id string").select(
        F.to_timestamp("ts").alias("ts"), "doc_id"
    ).write.parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["doc_id"])
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == ["d1", "d2", "d3"]


def test_neardup_stream_filters_against_persisted_index(spark, tmp_path):
    """Streaming near-dup ingest E2E (streaming/neardup_stream.py):
    batch 2 docs that near-duplicate (MinHash Jaccard >= 0.6, NOT
    byte-equal) an indexed batch-1 doc or a lower-id doc of their own
    batch are dropped; the survivor index persists across runs; and
    replaying a micro-batch (foreachBatch at-least-once window)
    leaves output and index unchanged."""
    from hdp2_5_hive_spark.streaming.neardup_stream import (
        neardup_ingest_sink,
        run_neardup_ingest,
    )

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango")
    near = base.rsplit(" ", 1)[0] + " zulu"      # ~0.89 jaccard
    uniq_c = ("one two three four five six seven eight nine ten eleven "
              "twelve thirteen fourteen fifteen sixteen")
    near_c = uniq_c.rsplit(" ", 1)[0] + " hundred"
    uniq_d = ("red orange yellow green blue indigo violet cyan magenta "
              "maroon olive navy teal silver gold bronze")

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")

    def drain():
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(src)
        run_neardup_ingest(
            stream, out, idx, str(tmp_path / "ckpt"), threshold=0.6
        )

    spark.createDataFrame(
        [(1, base), (2, "completely different short unique text here "
                        "with enough words to shingle properly")],
        "doc_id long, text string",
    ).write.parquet(src)
    drain()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}

    b2 = spark.createDataFrame(
        [(3, near), (4, uniq_c), (5, near_c), (6, uniq_d)],
        "doc_id long, text string",
    )
    b2.write.mode("append").parquet(src)
    drain()
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2, 4, 6}  # 3 ~ indexed 1; 5 ~ same-batch 4

    # index holds exactly the survivors
    sh = spark.read.parquet(idx + "/shingles")
    assert {r._id for r in sh.select("_id").distinct().collect()} == kept
    sh_rows = sh.count()  # pin BEFORE replay: the overwrite replaces
    # the files this plan references

    # replay batch 1 of the second drain (its batch_id partition
    # already exists): rerunning the sink with the same batch_id must
    # not duplicate output rows or index entries
    last_bid = max(
        r.batch_id
        for r in spark.read.parquet(out).select("batch_id").collect()
    )
    neardup_ingest_sink(out, idx, threshold=0.6)(b2, last_bid)
    kept2 = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert sorted(kept2) == sorted(kept)
    sh2 = spark.read.parquet(idx + "/shingles")
    assert sh2.count() == sh_rows


def test_dedup_within_watermark_evicts_and_reemits(spark, tmp_path):
    """dropDuplicatesWithinWatermark — the BOUNDED-state dedup tier
    (Spark 3.5+): duplicates of a key are absorbed only while the
    key's state lives (first_ts + watermark delay); once the
    watermark passes expiry the state is EVICTED and a later
    occurrence of the same key emits again. Contrast with plain
    dropDuplicates, whose per-key state never expires without an
    event-time column in the key — unbounded at 100 TB. Three
    availableNow drains over one checkpoint: dup-in-window dropped,
    watermark advanced past expiry by a foreign key, then the
    original key re-emits."""
    import os

    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("k", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)

    def add(name, rows):
        spark.createDataFrame(rows, "ts string, k string").select(
            F.to_timestamp("ts").alias("ts"), "k"
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "10 minutes")
            .dropDuplicatesWithinWatermark(["k"])
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Drain 1: k1 at 00:00 emits; k1 at 00:01 is an in-window dup.
    add("b1", [("2024-01-01 00:00:00", "k1"), ("2024-01-01 00:01:00", "k1")])
    drain()
    # Drain 2: k2 at 01:00 advances the watermark to 00:50 —
    # k1's state (expiry 00:10) is evicted after this batch.
    add("b2", [("2024-01-01 01:00:00", "k2")])
    drain()
    # Drain 3: k1 again at 01:05 — no state left, emits a second time.
    add("b3", [("2024-01-01 01:05:00", "k1")])
    drain()

    got = sorted(
        (r.k, str(r.ts)) for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert [k for k, _ in got] == ["k1", "k1", "k2"]
    assert ("k1", "2024-01-01 00:00:00") in got
    assert ("k1", "2024-01-01 01:05:00") in got


def test_stream_stream_left_outer_join_null_pads_after_watermark(
    spark, tmp_path
):
    """Watermarked stream-stream LEFT OUTER join: matched rows emit
    immediately; an UNMATCHED left row may only emit (null-padded)
    once the watermark proves no right match can still arrive — the
    state-eviction semantics that make outer stream joins bounded.
    Two drains: first delivers both sides (one match, one orphan —
    orphan held in state, not yet emitted), second advances the
    watermark far past the orphan's join window, forcing the
    null-padded emission."""
    import os

    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("k", StringType()),
        ]
    )
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc)
    os.makedirs(rsrc)

    def add(path, rows):
        spark.createDataFrame(rows, "ts string, k string").select(
            F.to_timestamp("ts").alias("ts"), "k"
        ).coalesce(1).write.mode("append").parquet(path)

    def drain():
        left = (
            spark.readStream.schema(schema)
            .parquet(lsrc)
            .withWatermark("ts", "5 minutes")
            .select(F.col("ts").alias("lts"), F.col("k"))
        )
        right = (
            spark.readStream.schema(schema)
            .parquet(rsrc)
            .withWatermark("ts", "5 minutes")
            .select(F.col("ts").alias("rts"), F.col("k").alias("rk"))
        )
        j = left.join(
            right,
            F.expr(
                "k = rk AND rts BETWEEN lts - INTERVAL 1 MINUTE"
                " AND lts + INTERVAL 1 MINUTE"
            ),
            "leftOuter",
        )
        q = (
            j.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    add(lsrc, [("2024-01-01 00:10:00", "m"), ("2024-01-01 00:10:00", "orphan")])
    add(rsrc, [("2024-01-01 00:10:30", "m")])
    drain()
    got1 = {
        (r.k, r.rk)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert ("m", "m") in got1
    assert ("orphan", None) not in got1  # held: watermark hasn't passed
    # advance the watermark well past orphan's window on BOTH sides
    add(lsrc, [("2024-01-01 01:00:00", "late_l")])
    add(rsrc, [("2024-01-01 01:00:00", "late_r")])
    drain()
    got2 = {
        (r.k, r.rk)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert ("orphan", None) in got2


def test_observe_metrics_accumulate_per_action(spark, sf_dir):
    """df.observe(): named aggregate metrics ride the job (the
    engine-side observability hook a nightly pipeline exports) —
    values must match the data exactly."""
    from pyspark.sql import Observation

    obs = Observation("docs")
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .filter("n_chars >= 0")
    )
    d.collect()
    want = spark.read.parquet(f"{sf_dir}/documents.parquet").agg(
        F.count(F.lit(1)), F.sum("n_chars")
    ).collect()[0]
    assert obs.get["n"] == want[0]
    assert obs.get["chars"] == want[1]


def test_max_files_per_trigger_batches_backfill(spark, tmp_path):
    """maxFilesPerTrigger — the backfill throttle: 4 input files
    with a 2-file cap must drain in exactly 2 micro-batches under
    availableNow (bounded state/commit sizes during a historical
    catch-up; without the cap one giant batch can blow executor
    memory at 100 TB backfills)."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(4):
        spark.createDataFrame(
            [(i * 10 + j,) for j in range(5)], "v long"
        ).coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.schema("v long")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = q.recentProgress
    n_rows = [int(p["numInputRows"]) for p in batches if int(p["numInputRows"]) > 0]
    assert sum(n_rows) == 20
    assert len(n_rows) == 2 and all(n == 10 for n in n_rows), n_rows
    got = {r.v for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {i * 10 + j for i in range(4) for j in range(5)}


def test_write_dict_order_independent(endpoint):
    """Regression: write() stored Row(**row) and createDataFrame
    mapped it POSITIONALLY against the endpoint schema, so a dict
    whose key order differed from the schema was silently
    column-swapped (or failed at commit once types diverged). Rows
    are now normalized to schema order; missing keys become NULL
    like write_json; unknown keys fail loudly."""
    b = endpoint.new_batch()
    b.write({"n": 7, "user_id": "u1", "action": "view"})  # shuffled
    b.write({"user_id": "u2"})  # missing -> NULL
    with pytest.raises(ValueError, match="unknown fields"):
        b.write({"user_id": "u3", "bogus": 1})
    b.commit()
    got = {r.user_id: (r.action, r.n) for r in endpoint.read_committed().collect()}
    assert got == {"u1": ("view", 7), "u2": (None, None)}


def test_delimited_boolean_garbage_is_null(spark, tmp_path):
    """LazySimpleSerDe parity: unparseable boolean text is NULL,
    never a silent False (regression: == 'true' mapped garbage to
    False)."""
    from pyspark.sql.types import BooleanType

    schema = StructType(
        [StructField("k", StringType()), StructField("b", BooleanType())]
    )
    ep = StreamingEndpoint(spark, str(tmp_path / "ing2"), schema)
    b = ep.new_batch()
    b.write_delimited("a,true")
    b.write_delimited("b,FALSE")
    b.write_delimited("c,yes")  # unparseable -> NULL
    b.commit()
    got = {r.k: r.b for r in ep.read_committed().collect()}
    assert got == {"a": True, "b": False, "c": None}


def test_failed_commit_keeps_batch_retryable(endpoint, tmp_path):
    """Regression: commit() marked the batch CLOSED before running
    the append job — a failed write left the rows stranded in a
    closed batch and the caller's retry raised 'batch closed'
    (silent data loss). Hive's TransactionBatchImpl keeps the txn
    abortable/retryable on write failure; now the batch stays open
    with its rows intact until the append lands."""
    import os

    b = endpoint.new_batch()
    b.write({"user_id": "u1", "action": "view", "n": 1})
    b.write({"user_id": "u2", "action": "buy", "n": 2})
    # squat a regular FILE on the target path so the append job fails
    with open(endpoint.path, "w") as fh:
        fh.write("not a directory")
    with pytest.raises(Exception):
        b.commit()
    os.remove(endpoint.path)
    b.commit()  # retry succeeds — rows were never lost
    users = {r.user_id for r in endpoint.read_committed().collect()}
    assert users == {"u1", "u2"}
    with pytest.raises(RuntimeError):
        b.commit()  # and the batch is closed exactly once


def test_idempotent_sink_leaves_session_conf_alone(spark, tmp_path):
    """Regression: the sink set partitionOverwriteMode=dynamic
    session-wide around its write — a concurrent query's write on
    another driver thread could observe the leaked 'dynamic'. The
    dynamic overwrite now rides the per-writer option; the session
    conf is never touched (and the sink still overwrites only its
    own batch partition under a session left at 'static')."""
    from hdp2_5_hive_spark.streaming.ingest import idempotent_batch_sink

    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key)
    spark.conf.set(key, "static")
    try:
        out = str(tmp_path / "sink_conf")
        sink = idempotent_batch_sink(out)
        sink(spark.createDataFrame([("a", 1)], "k string, v int"), 0)
        assert spark.conf.get(key) == "static"
        # replay of the LAST batch (the only replay Spark produces —
        # an older id means a stale checkpoint and is rejected)
        sink(spark.createDataFrame([("a", 9)], "k string, v int"), 0)
        sink(spark.createDataFrame([("b", 2)], "k string, v int"), 1)
        rows = sorted(
            (r.k, r.v, r.batch_id)
            for r in spark.read.parquet(out).collect()
        )
        # replayed batch 0 overwrote ONLY its partition
        assert rows == [("a", 9, 0), ("b", 2, 1)]
        assert spark.conf.get(key) == "static"
    finally:
        spark.conf.set(key, prev)


def test_jsonl_stream_tolerates_in_flight_partial_line(tmp_path):
    """Regression: stat can catch a writer MID-APPEND; committing a
    mid-line offset crashed this batch on the torn head AND poisoned
    every replay (the tail half re-parsed as garbage forever). The
    reader now clamps each batch's end offset to the last newline and
    picks the completed line up next tick."""
    import json
    import os

    from hdp2_5_hive_spark.streaming.jsonl_source import JsonlStreamReader

    d = str(tmp_path / "src")
    os.makedirs(d)
    f = os.path.join(d, "a.jsonl")
    full = json.dumps({"doc_id": 1, "text": "one"}) + "\n"
    partial = '{"doc_id": 2, "te'  # torn mid-append, no newline
    with open(f, "w") as fh:
        fh.write(full + partial)

    rd = JsonlStreamReader({"path": d})
    it, end = rd.read({})
    assert list(it) == [(1, "one")]
    assert end[f] == len(full.encode())  # newline-aligned, not EOF

    # the writer finishes the line; the next tick picks it up whole
    rest = 'xt": "two"}\n'
    with open(f, "a") as fh:
        fh.write(rest)
    it2, end2 = rd.read(end)
    assert list(it2) == [(2, "two")]
    assert end2[f] == len((full + partial + rest).encode())
    # replay between committed (newline-aligned) offsets is exact
    assert list(rd.readBetweenOffsets(end, end2)) == [(2, "two")]


def test_jsonl_stream_stable_newline_less_tail_is_ingested(tmp_path):
    """Staleness escape (ADVICE r12): a finished file whose final
    record lacks a trailing newline must not be withheld forever by
    the newline clamp — after TAIL_STABLE_BATCHES unchanged-size
    batches the tail is accepted as the last record."""
    import json
    import os

    from hdp2_5_hive_spark.streaming.jsonl_source import (
        TAIL_STABLE_BATCHES,
        JsonlStreamReader,
    )

    d = str(tmp_path / "src")
    os.makedirs(d)
    f = os.path.join(d, "a.jsonl")
    full = json.dumps({"doc_id": 1, "text": "one"}) + "\n"
    tail = json.dumps({"doc_id": 2, "text": "two"})  # no newline, ever
    with open(f, "w") as fh:
        fh.write(full + tail)

    rd = JsonlStreamReader({"path": d})
    it, end = rd.read({})
    assert list(it) == [(1, "one")]  # tail withheld while maybe-in-flight
    assert end[f] == len(full.encode())
    for _ in range(TAIL_STABLE_BATCHES - 1):
        it, end = rd.read(end)
        assert list(it) == []
    # size has now been stable for TAIL_STABLE_BATCHES batches
    it, end = rd.read(end)
    assert list(it) == [(2, "two")]
    assert end[f] == len((full + tail).encode())
    # and nothing is double-ingested afterwards
    it, end = rd.read(end)
    assert list(it) == []


def test_jsonl_stream_stability_counter_resets_on_growth(tmp_path):
    """A file that grows mid-window restarts the staleness clock —
    the escape only fires for a genuinely quiescent file."""
    import json
    import os

    from hdp2_5_hive_spark.streaming.jsonl_source import (
        TAIL_STABLE_BATCHES,
        JsonlStreamReader,
    )

    d = str(tmp_path / "src")
    os.makedirs(d)
    f = os.path.join(d, "a.jsonl")
    partial = '{"doc_id": 1, "te'
    with open(f, "w") as fh:
        fh.write(partial)

    rd = JsonlStreamReader({"path": d})
    it, end = rd.read({})
    assert list(it) == []
    for _ in range(TAIL_STABLE_BATCHES - 1):
        it, end = rd.read(end)
        assert list(it) == []
    # writer resumes before the escape fires: completes the record
    rest = 'xt": "one"}\n' + json.dumps({"doc_id": 2, "text": "two"})
    with open(f, "a") as fh:
        fh.write(rest)
    it, end = rd.read(end)
    assert list(it) == [(1, "one")]  # whole line, no torn halves
    # the new newline-less tail starts its own stability window
    for _ in range(TAIL_STABLE_BATCHES):
        it, end = rd.read(end)
    assert list(it) == [(2, "two")]


def test_batch_sink_rejects_fresh_checkpoint_over_existing_output(
    spark, tmp_path
):
    """Defect hunt r13: a stream restarted with a FRESH (or
    restored-stale) checkpoint over surviving sink directories
    restarts batch ids at 0 — dynamic partition overwrite then
    silently interleaves two unrelated runs (some old partitions
    replaced, the rest left as duplicates). Legitimate replay only
    re-delivers the single LAST batch, so a batch_id below the
    on-disk maximum is always that operational error and now fails
    loudly in both batch_id-partitioned sinks."""
    import pytest as _pytest

    from hdp2_5_hive_spark.streaming.ingest import idempotent_batch_sink
    from hdp2_5_hive_spark.streaming.neardup_stream import (
        neardup_ingest_sink,
    )

    out = str(tmp_path / "out")
    sink = idempotent_batch_sink(out)
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    sink(df, 0)
    sink(df, 1)
    sink(df, 1)  # same-batch replay: allowed (overwrites itself)
    sink(df, 5)  # forward skip: allowed (empty batches write nothing)
    with _pytest.raises(ValueError, match="fresh or stale checkpoint"):
        sink(df, 0)  # fresh-checkpoint restart: ids went backwards

    nd_out = str(tmp_path / "nd_out")
    nd_idx = str(tmp_path / "nd_idx")
    nd = neardup_ingest_sink(nd_out, nd_idx)
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    nd(docs, 0)
    nd(docs, 1)
    with _pytest.raises(ValueError, match="fresh or stale checkpoint"):
        nd(docs, 0)
