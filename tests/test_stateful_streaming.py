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
