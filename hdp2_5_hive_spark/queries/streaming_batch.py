"""Window-operator queries runnable in batch mode (oracle-checkable).

``F.window`` tumbling/sliding windows are the same Catalyst operator
in batch and streaming; running them on the static ``events`` table
lets the driver hash-check the window semantics that the streaming
tests (tests/test_streaming.py) exercise with watermarks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


@register(
    "stream_tumbling_counts",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    category="streaming",
)
def stream_tumbling_counts(spark, t):
    """Tumbling 1-hour window counts per event type — §2.10 windowed
    aggregation (batch-mode twin of windowed_counts)."""
    return (
        t.events.groupBy(
            F.window("ts", "1 hour").alias("win"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


@register(
    "stream_sliding_counts",
    oracle="""
WITH offsets AS (SELECT UNNEST([0, 30]) AS off_min)
SELECT time_bucket(INTERVAL 1 HOUR,
                   CAST(ts AS TIMESTAMP) - (off_min * INTERVAL 1 MINUTE))
         + (off_min * INTERVAL 1 MINUTE) AS window_start,
       COUNT(*) AS n
FROM events, offsets
WHERE CAST(ts AS TIMESTAMP) >= time_bucket(INTERVAL 1 HOUR,
                   CAST(ts AS TIMESTAMP) - (off_min * INTERVAL 1 MINUTE))
         + (off_min * INTERVAL 1 MINUTE)
GROUP BY 1
""",
    category="streaming",
)
def stream_sliding_counts(spark, t):
    """Sliding window (1 hour, 30-minute slide): every event lands in
    two overlapping windows — the Expand-based multi-assignment the
    streaming engine uses."""
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "n")
    )


@register(
    "stream_session_window",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         LAG(CAST(ts AS TIMESTAMP)) OVER
           (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM e
), sess AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n
FROM sess GROUP BY user_id, sid
""",
    category="streaming",
)
def stream_session_window(spark, t):
    """Gap-based session windows via F.session_window (the Spark
    stream-native operator; batch-mode here so the driver can
    hash-check it). window.end = last event + gap — mirrored in the
    oracle's islands construction."""
    return (
        t.events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
    )


@register(
    "stream_dedup_first",
    oracle="""
SELECT user_id, event_type,
       MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
       COUNT(*) - 1 AS n_dropped
FROM events
GROUP BY user_id, event_type
""",
    category="streaming",
)
def stream_dedup_first(spark, t):
    """Streaming dedup twin: ``dropDuplicates`` on a key keeps the
    first arrival (state-store entry per key; in a stream,
    ``withWatermark`` bounds that state — exercised live in
    tests/test_streaming.py). Batch mode makes "first" deterministic
    as min event time, and reports how many later duplicates the
    state would have absorbed."""
    return t.events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )


@register(
    "stream_interval_join",
    oracle="""
SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id,
       CAST((epoch_us(CAST(b.ts AS TIMESTAMP))
             - epoch_us(CAST(a.ts AS TIMESTAMP))) // 1000000 AS BIGINT)
         AS gap_sec
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'view' AND b.event_type = 'purchase'
 AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
 AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
""",
    category="streaming",
)
def stream_interval_join(spark, t):
    """Time-interval join: views attributed to a purchase by the same
    user within 10 minutes — the batch twin of a watermarked
    stream-stream join (tests/test_streaming.py runs the live
    streaming form with state cleanup). The plan is an equi-join on
    user_id with the time range as residual filter: one keyed
    shuffle, no nested loop, so it holds at 100 TB where a pure
    range-condition join would not."""
    e = t.events
    a = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("a_ts"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            "view_id",
            "purchase_id",
            "user_id",
            # Integer DIV, not double /: micros deltas near 2^40 are
            # exact in int64 but not guaranteed bit-stable through a
            # double round-trip (memory: the nanos DIV lesson).
            F.expr(
                "CAST((unix_micros(b_ts) - unix_micros(a_ts)) DIV 1000000 AS BIGINT)"
            ).alias("gap_sec"),
        )
    )


@register(
    "events_asof_join",
    oracle="""
SELECT a.user_id, CAST(a.ts AS TIMESTAMP) AS ts, a.event_id AS click_id,
       b.event_id AS view_id, CAST(b.ts AS TIMESTAMP) AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') b
  ON a.user_id = b.user_id
 AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP)
""",
    category="streaming",
)
def events_asof_join(spark, t):
    """AS-OF join: every click annotated with the user's most recent
    prior (or same-instant) view. Spark lacks a native ASOF operator;
    operators/timeseries.asof_join composes it as union + one keyed
    window — a single hash exchange, where the naive correlated/range
    self-join is quadratic per user. Oracle: DuckDB's native
    ASOF LEFT JOIN over the same streams."""
    from ..operators import timeseries as tsx

    e = t.events
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    out = tsx.asof_join(
        clicks, views, on=["user_id"], ts_col="ts", right_value_cols=["event_id"]
    )
    return out.select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("right_event_id").alias("view_id"),
        F.col("right_ts").alias("view_ts"),
    )


@register(
    "events_rollup_daily",
    oracle="""
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_v
FROM events
GROUP BY 1, 2
""",
    category="streaming",
)
def events_rollup_daily(spark, t):
    """Hypertable-style continuous-aggregate chain: hourly rollup
    from raw, daily rollup FROM THE HOURLY ONE (timeseries.
    rollup_reuse) — the oracle aggregates raw directly, proving the
    decomposable-reuse chain is exact (sums/counts re-aggregate;
    avg derived once at the end, never averaged-of-averages)."""
    from ..operators import timeseries as tsx

    _, daily = tsx.rollup_reuse(
        t.events, "ts", "event_type", "value", fine="1 hour", coarse_unit="day"
    )
    return daily


@register(
    "events_asof_forward",
    oracle="""
SELECT a.user_id, CAST(a.ts AS TIMESTAMP) AS ts, a.event_id AS click_id,
       b.event_id AS next_view_id, CAST(b.ts AS TIMESTAMP) AS next_view_ts
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') b
  ON a.user_id = b.user_id
 AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
""",
    category="streaming",
)
def events_asof_forward(spark, t):
    """FORWARD as-of join (pandas ``merge_asof(direction='forward')``
    parity): every click annotated with the user's NEXT view at or
    after it — the time-to-next-action primitive behind response-lag
    and abandonment metrics. Same one-exchange union+window plan as
    the backward AS-OF, window order flipped
    (operators/timeseries.asof_join direction="forward"). Oracle:
    DuckDB's native ASOF LEFT JOIN with the ``>=`` inequality picks
    the nearest following row — identical semantics."""
    from ..operators import timeseries as tsx

    e = t.events
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    out = tsx.asof_join(
        clicks, views, on=["user_id"], ts_col="ts",
        right_value_cols=["event_id"], direction="forward",
    )
    return out.select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("right_event_id").alias("next_view_id"),
        F.col("right_ts").alias("next_view_ts"),
    )
