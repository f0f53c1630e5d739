"""applyInPandasWithState sessionization: a session closes after the
processing-time gap and is emitted exactly once."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from hdp2_5_hive_spark.streaming.stateful import sessionize_stream

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def test_session_emitted_on_timeout(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        (1, "2024-01-01 00:00:00", 1.5),
        (1, "2024-01-01 00:00:30", 2.5),
        (2, "2024-01-01 00:01:00", 4.0),
    ]
    (
        spark.createDataFrame(rows, "user_id long, ts string, value double")
        .select("user_id", F.to_timestamp("ts").alias("ts"), "value")
        .write.parquet(src)
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sessions = sessionize_stream(stream, gap_ms=2000)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        got = []
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM sessions_out").collect()
            if len(got) >= 2:
                break
            time.sleep(2)
        by_user = {r.user_id: r for r in got}
        assert set(by_user) == {1, 2}
        u1 = by_user[1]
        assert u1.n_events == 2
        assert abs(u1.sum_value - 4.0) < 1e-9
        assert str(u1.session_start) == "2024-01-01 00:00:00"
        assert str(u1.session_end) == "2024-01-01 00:00:30"
        assert by_user[2].n_events == 1
    finally:
        q.stop()


def test_transform_with_state_running_totals(spark, tmp_path):
    """transformWithStateInPandas: ValueState persists across
    micro-batches (maxFilesPerTrigger=1 forces two batches); the
    second emission for a key includes the first batch's rows.

    Spark's TransformWithStateInPySpark server requires a working
    google.protobuf in the Python env; this container ships a broken
    one (no pip allowed), so skip when the import fails — the
    applyInPandasWithState path above covers stateful semantics."""
    import pytest as _pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        _pytest.skip("google.protobuf unavailable: transformWithState "
                     "driver worker cannot start in this container")
    from hdp2_5_hive_spark.streaming.stateful import running_totals_stream

    src = str(tmp_path / "src")
    b1 = [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:00:01", 5.0)]
    b2 = [(1, "2024-01-01 00:10:00", 2.0)]
    for i, rows in enumerate([b1, b2]):
        (
            spark.createDataFrame(rows, "user_id long, ts string, value double")
            .select("user_id", F.to_timestamp("ts").alias("ts"), "value")
            .write.mode("append" if i else "overwrite").parquet(src)
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    totals = running_totals_stream(stream)
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM totals_out").collect()
    # final state per key: user 1 saw both batches (n=2, total=3.0)
    final = {}
    for r in rows:
        final[r.user_id] = (r.n, r.total)  # later emissions overwrite
    assert final[1] == (2, 3.0)
    assert final[2] == (1, 5.0)


def test_heavy_hitters_accumulate_across_batches(spark, tmp_path):
    """Stateful running token counts: a second micro-batch ADDS to
    each token's state (not restarts it), and the latest emission per
    token is the true cross-batch total."""
    src = str(tmp_path / "hh_src")
    (
        spark.createDataFrame(
            [("a",), ("a",), ("b",)], "tok string"
        ).write.parquet(src)
    )
    from hdp2_5_hive_spark.streaming.stateful import heavy_hitters_stream

    out = str(tmp_path / "hh_out")

    def drain():
        stream = spark.readStream.schema("tok string").parquet(src)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            heavy_hitters_stream(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # latest emission per token = its max running count
        return {
            r.tok: r.mx
            for r in spark.read.parquet(out)
            .groupBy("tok")
            .agg(F.max("count").alias("mx"))
            .collect()
        }

    first = drain()
    assert first == {"a": 2, "b": 1}
    (
        spark.createDataFrame(
            [("a",), ("c",)], "tok string"
        ).write.mode("append").parquet(src)
    )
    second = drain()  # same checkpoint: state carries over
    assert second.get("a") == 3 and second.get("c") == 1


def test_mg_heavy_hitters_bounded_state_across_batches(spark, tmp_path):
    """Streaming Misra-Gries: two micro-batches over a skewed stream;
    state stays <= k counters per group, the stream length
    accumulates, and the MG contract holds against the exact
    cross-batch counts (heavy token present, no overestimate,
    undercount <= n/(k+1))."""
    from hdp2_5_hive_spark.streaming.stateful import (
        mg_heavy_hitters_stream,
    )

    src = str(tmp_path / "mg_src")
    batch1 = [("g", "hot")] * 12 + [("g", "a")] * 3 + [("g", "b")] * 2
    batch2 = [("g", "hot")] * 9 + [("g", "c")] * 4 + [("g", "a")] * 2
    spark.createDataFrame(batch1, "grp string, tok string").write.parquet(
        src + "/b1"
    )
    out = str(tmp_path / "mg_out")

    def drain():
        stream = spark.readStream.schema(
            "grp string, tok string"
        ).parquet(src + "/*")

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            mg_heavy_hitters_stream(stream, "grp", k=2)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "mg_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        latest_n = max(r.n_stream for r in rows)
        return {
            r.tok: r.c for r in rows if r.n_stream == latest_n
        }, latest_n

    state1, n1 = drain()
    assert n1 == 17 and len(state1) <= 2
    assert state1["hot"] >= 12 - 17 / 3 and state1["hot"] <= 12

    spark.createDataFrame(batch2, "grp string, tok string").write.parquet(
        src + "/b2"
    )
    state2, n2 = drain()
    true = {"hot": 21, "a": 5, "b": 2, "c": 4}
    assert n2 == 32 and len(state2) <= 2
    bound = n2 / 3
    for tok, c in state2.items():
        assert c <= true[tok] and c >= true[tok] - bound
    assert "hot" in state2  # 21 > 32/3: guaranteed present
