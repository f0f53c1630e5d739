"""Event-analytics queries over the events table: conversion funnel
and cohort retention — the classic warehouse workloads an HDP 2.5
deployment runs on clickstream tables (reference surface: plain
HiveQL aggregation/join compositions; e.g. the multi-step CTE shapes
of ``ql/src/test/queries/clientpositive/cte_mat_*.q``).

Scale notes: every stage is a keyed aggregate (map-side combine on
user_id) followed by a user-keyed join whose left side only shrinks
(each funnel stage is a subset of the previous), so AQE broadcasts
the later stages; retention is two keyed aggregates and one
day-offset rollup. Nothing scans events more than once per stage and
no shuffle carries more than one row per (user, stage/day).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register

# Ordered conversion steps present in the testdata's event_type.
_FUNNEL_STEPS = ("signup", "view", "click", "purchase")


@register(
    "events_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
)
SELECT 1 AS step, 'signup' AS stage, COUNT(*) AS n_users FROM s1
UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
UNION ALL SELECT 3, 'click', COUNT(*) FROM s3
UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4
""",
    category="analytics",
)
def events_funnel(spark, t):
    """Ordered conversion funnel signup → view → click → purchase:
    a user advances a stage only with an event strictly AFTER their
    entry into the previous stage (the sequential-pattern semantics
    a MATCH_RECOGNIZE engine gives; composed here — and in the
    oracle — from per-stage min-ts aggregates + user-keyed joins).
    Each stage's frame shrinks, so later joins broadcast under AQE."""
    e = t.events.select("user_id", "event_type", "ts")
    stage = None
    counts = []
    for step, ev in enumerate(_FUNNEL_STEPS, start=1):
        cur = e.filter(F.col("event_type") == ev)
        if stage is not None:
            cur = cur.join(
                stage.select("user_id", F.col("t").alias("_prev")), "user_id"
            ).filter(F.col("ts") > F.col("_prev"))
        stage = cur.groupBy("user_id").agg(F.min("ts").alias("t"))
        counts.append(
            stage.agg(
                F.lit(step).alias("step"),
                F.lit(ev).alias("stage"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


@register(
    "events_retention",
    oracle="""
WITH first_day AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
)
SELECT date_diff('day', f.cohort_day, a.d) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN first_day f ON a.user_id = f.user_id
WHERE date_diff('day', f.cohort_day, a.d) <= 14
GROUP BY day_offset
""",
    category="analytics",
)
def events_retention(spark, t):
    """Cohort retention: users active N days after their first-ever
    event, day offsets 0-14. Two keyed aggregates (first day, active
    days) + one join + a 15-row rollup — the standard retention
    curve, computable at any event volume because nothing holds more
    than one row per (user, day)."""
    e = t.events.select("user_id", "ts")
    first_day = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    active = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    j = active.join(first_day, "user_id").select(
        "user_id", F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset")
    )
    return (
        j.filter(F.col("day_offset") <= 14)
        .groupBy("day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "events_top_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       COUNT(*) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY n DESC, from_type, to_type
LIMIT 10
""",
    category="analytics",
)
def events_top_transitions(spark, t):
    """Top event-to-event transitions (clickstream path analysis):
    LEAD over each user's ts-ordered stream, then a keyed count +
    top-10. One exchange on user_id for the window, one partial-agg
    shuffle on the 25-cell transition matrix, TakeOrdered for the
    limit — the matrix is bounded by |event_type|², so the rollup
    never grows with event volume. (event_id tiebreak makes the
    sequence — and therefore the counts — engine-deterministic.)"""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return (
        seq.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "from_type", "to_type")
        .limit(10)
    )


@register(
    "events_windowed_rate",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS t FROM events
),
win AS (
  SELECT event_type, t,
         to_timestamp(7200 * CAST(floor(epoch(t) / 7200) AS BIGINT))
           - i * INTERVAL 2 HOUR AS w_start
  FROM e, LATERAL (SELECT unnest(range(0, 3)) AS i) s
)
SELECT CAST(w_start AS TIMESTAMP) AS window_start, event_type,
       count(*) AS n_events,
       round(count(*) / 6.0, 6) AS per_hour
FROM win
WHERE t < w_start + INTERVAL 6 HOUR
GROUP BY w_start, event_type
""",
    category="analytics",
)
def events_windowed_rate(spark, t):
    """Sliding-window event rate per type — the batch twin of a
    Structured Streaming windowed aggregation (``F.window(ts, '6
    hours', '2 hours')``; reference streaming windowing SURVEY §2.10).
    Each event lands in duration/slide = 3 windows; Spark aligns
    window starts to the epoch, which the oracle reproduces with
    integer floor arithmetic on epoch seconds, enumerating the 3
    covering windows per event. At scale this is one partial-agg
    tree over an explode — no shuffle beyond the final groupBy."""
    e = t.events.select("event_type", F.col("ts").alias("t"))
    win = F.window("t", "6 hours", "2 hours")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.round(F.col("n_events") / 6.0, 6).alias("per_hour"),
        )
    )


@register(
    "events_attribution",
    oracle="""
WITH p AS (
  SELECT event_id AS pid, user_id, CAST(ts AS TIMESTAMP) AS pts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS cid, user_id, event_type, CAST(ts AS TIMESTAMP) AS cts
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT p.pid, c.event_type,
         ROW_NUMBER() OVER (PARTITION BY p.pid
                            ORDER BY c.cts, c.cid) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY p.pid
                            ORDER BY c.cts DESC, c.cid DESC) AS rn_last
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND c.cts < p.pts AND c.cts >= p.pts - INTERVAL 7 DAY
)
SELECT model, event_type, count(*) AS n FROM (
  SELECT 'first_touch' AS model, event_type FROM j WHERE rn_first = 1
  UNION ALL
  SELECT 'last_touch' AS model, event_type FROM j WHERE rn_last = 1
) GROUP BY model, event_type
""",
    category="analytics",
)
def events_attribution(spark, t):
    """Marketing attribution over the event stream: each purchase is
    credited to the user's FIRST and LAST click/view touchpoint in
    the preceding 7 days (the two classic single-touch models).
    Sessionize/funnel/retention's sibling — the remaining staple of
    an event-analytics suite. Plan: one banded time-range join per
    user (the purchase side is small after the event_type filter and
    broadcasts under AQE), then two WindowGroupLimit-able row_number
    ranks per purchase; cardinality is bounded by touchpoints within
    the window, never |events|²."""
    e = t.events
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    c = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("cid"),
        "user_id",
        "event_type",
        F.col("ts").alias("cts"),
    )
    from pyspark.sql import Window as W

    j = p.join(
        c,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("cts") < F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS")),
    )
    w_first = W.partitionBy("pid").orderBy("cts", "cid")
    w_last = W.partitionBy("pid").orderBy(F.desc("cts"), F.desc("cid"))
    ranked = j.select(
        "pid",
        "event_type",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    first = ranked.filter(F.col("rn_first") == 1).select(
        F.lit("first_touch").alias("model"), "event_type"
    )
    last = ranked.filter(F.col("rn_last") == 1).select(
        F.lit("last_touch").alias("model"), "event_type"
    )
    return first.unionByName(last).groupBy("model", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "events_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day
),
stats AS (
  SELECT event_type,
         avg(n) AS mu,
         stddev_samp(n) AS sigma
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.n,
       round((d.n - s.mu) / s.sigma, 6) AS z
FROM daily d JOIN stats s USING (event_type)
WHERE abs((d.n - s.mu) / s.sigma) > 2
""",
    category="analytics",
)
def events_anomaly_zscore(spark, t):
    """Volume-anomaly detection over the event stream: per-type
    daily counts z-scored against that type's own mean/stddev; days
    beyond 2 sigma flag. The monitoring staple beside
    funnel/retention/attribution. Two aggregates (daily counts, then
    per-type moments — the second input is |types|x|days| rows, tiny
    at any corpus scale) and a broadcast join back; both engines
    compute stddev_samp with the same definition and the 6-decimal
    round pins fp association order."""
    e = t.events
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2)
        .select("event_type", "day", "n", F.round(z, 6).alias("z"))
    )


@register(
    "join_range_banded",
    oracle="""
WITH iv AS (
  SELECT o_orderkey, o_orderdate AS lo,
         o_orderdate + CAST(o_orderkey % 20 AS INT) * INTERVAL 1 DAY AS hi
  FROM orders WHERE o_orderkey <= 1000
),
pts AS (
  SELECT l_orderkey, l_shipdate FROM lineitem WHERE l_orderkey <= 3000
)
SELECT iv.o_orderkey, count(*) AS n_in_range
FROM iv JOIN pts
  ON pts.l_shipdate >= iv.lo AND pts.l_shipdate <= iv.hi
GROUP BY iv.o_orderkey
""",
    category="analytics",
)
def join_range_banded(spark, t):
    """Pure-inequality (point-in-interval) join at scale
    (operators/rangejoin.banded_range_join): ship dates of UNRELATED
    lineitems counted into each order's date interval. With no
    equality key Spark would plan a BroadcastNestedLoopJoin —
    O(|L|x|R|) — so the operator quantizes time into 30-day bands,
    explodes intervals over covered bands, and equi-joins on the
    band id with an exact re-check; the never-nested-loop shape is
    plan-gated in tests/test_plan_audit.py. The oracle runs the
    honest quadratic join (fine at oracle scale, the whole point is
    that the engine doesn't)."""
    from ..operators.rangejoin import banded_range_join

    iv = t.orders.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("lo"),
        (
            F.col("o_orderdate")
            + ((F.col("o_orderkey") % 20) * F.expr("INTERVAL 1 DAY"))
        ).cast("timestamp").alias("hi"),
    )
    pts = t.lineitem.filter(F.col("l_orderkey") <= 3000).select(
        F.col("l_shipdate").cast("timestamp").alias("p")
    )
    joined = banded_range_join(
        pts, iv, "p", "lo", "hi", band_seconds=30 * 86400
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_in_range")
    )


@register(
    "events_gap_fill",
    oracle="""
WITH e AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM span
),
counts AS (SELECT user_id, day, COUNT(*) AS n FROM e GROUP BY ALL)
SELECT g.user_id, g.day, CAST(COALESCE(n, 0) AS BIGINT) AS n_events
FROM grid g LEFT JOIN counts USING (user_id, day)
""",
    category="analytics",
)
def events_gap_fill(spark, t):
    """Time-series gap filling (resample-to-regular-grid): one row
    per user per DAY between that user's first and last event, with
    zero-filled quiet days — the densification step every
    rate/anomaly model needs before it can see silence. Plan: the
    per-user span is a keyed aggregate; the grid EXPLODES from each
    span row (rows ∝ users × days, never a cartesian against a
    calendar table); counts join back on (user, day). At 100 TB the
    explode stays proportional to the OUTPUT, which is the floor for
    producing it."""
    e = t.events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    span = e.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    counts = e.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("n"))
    return grid.join(counts, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
    )


@register(
    "events_gap_fill_locf",
    oracle="""
WITH e AS (
  SELECT user_id, date_trunc('day', ts) AS day, value FROM events
),
span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM span
),
daily AS (
  SELECT user_id, day,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
           AS day_avg
  FROM e GROUP BY user_id, day
),
joined AS (
  SELECT g.user_id, g.day, d.day_avg
  FROM grid g LEFT JOIN daily d USING (user_id, day)
)
SELECT user_id, day, day_avg,
       last_value(day_avg IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
FROM joined
""",
    category="analytics",
)
def events_gap_fill_locf(spark, t):
    """Gap filling + last-observation-carried-forward: the densified
    daily grid (events_gap_fill) with each quiet day's value carried
    from the user's most recent active day — the standard time-series
    imputation before differencing/rate models. day_avg goes through
    the DECIMAL(38,6) accumulator so both engines agree bit-for-bit;
    the carry is last_value IGNORE NULLS over an unbounded-preceding
    ROWS frame (one window pass, same single shuffle as the grid)."""
    from pyspark.sql import Window as W

    from ..functions.hive_compat import davg

    e = t.events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day"), "value"
    )
    span = e.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    daily = e.groupBy("user_id", "day").agg(davg("value", "day_avg"))
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        "day_avg",
        F.last("day_avg", ignorenulls=True).over(w).alias("value_locf"),
    )


@register(
    "events_funnel_time_bound",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view'
    AND CAST(e.ts AS TIMESTAMP) > s1.t
    AND CAST(e.ts AS TIMESTAMP) <= s1.t + INTERVAL 2 HOUR
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click'
    AND CAST(e.ts AS TIMESTAMP) > s2.t
    AND CAST(e.ts AS TIMESTAMP) <= s2.t + INTERVAL 2 HOUR
  GROUP BY e.user_id
)
SELECT 1 AS step, 'signup' AS stage, COUNT(*) AS n_users FROM s1
UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
UNION ALL SELECT 3, 'click', COUNT(*) FROM s3
""",
    category="analytics",
)
def events_funnel_time_bound(spark, t):
    """TIME-BOUND conversion funnel — each stage must follow the
    previous one WITHIN a conversion window (2h here): the refinement
    real funnel analytics runs, where an unbounded funnel overcounts
    (a purchase a month after signup is not a conversion). Same
    shrinking per-stage min-ts + user-keyed join shape as
    events_funnel, with the upper time bound added to each join
    predicate; every stage remains a keyed aggregate, later joins
    broadcast under AQE as frames shrink."""
    e = t.events.select("user_id", "event_type", "ts")
    stage = None
    rows = []
    for step, ev in enumerate(("signup", "view", "click"), start=1):
        cur = e.filter(F.col("event_type") == ev)
        if stage is not None:
            cur = (
                cur.join(
                    stage.select("user_id", F.col("t").alias("_prev")),
                    "user_id",
                )
                .filter(F.col("ts") > F.col("_prev"))
                .filter(
                    F.col("ts") <= F.col("_prev") + F.expr("INTERVAL 2 HOURS")
                )
            )
        stage = cur.groupBy("user_id").agg(F.min("ts").alias("t"))
        rows.append(
            stage.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(step).alias("step"),
                F.lit(ev).alias("stage"),
                "n_users",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "events_scd2_history",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
  FROM events
),
chg AS (
  SELECT *, LAG(event_type)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM e
),
v AS (
  SELECT user_id, event_type, ts, event_id FROM chg
  WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type AS state, ts AS effective_from,
       LEAD(ts) OVER w AS effective_to,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_no,
       LEAD(ts) OVER w IS NULL AS is_current
FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    category="events",
)
def events_scd2_history(spark, t):
    """Slowly-changing-dimension Type 2 history build — the classic
    warehouse pattern Hive ETL jobs ran nightly (reference surface:
    the INSERT OVERWRITE + window idiom, e.g. the windowing qfile
    family ``ql/src/test/queries/clientpositive/windowing*.q``):
    collapse each entity's event stream to its CHANGE points (lag
    inequality — consecutive identical states never open a new
    version), then assign [effective_from, effective_to) validity
    intervals via lead and a version counter; the open interval is
    the current row. Two windows over the same (user_id; ts,
    event_id) order — Catalyst plans ONE sort/shuffle, the second
    Window reuses the child ordering. Scale: everything is keyed by
    entity; per-entity history fits a partition by construction."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    changes = (
        t.events.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "is_change",
            prev.isNull() | (F.col("event_type") != prev),
        )
        .filter("is_change")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w).alias("effective_to"),
        F.row_number().over(w).cast("bigint").alias("version_no"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "events_anomaly_mad",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day
),
med AS (
  SELECT event_type, median(n) AS med FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day, d.n, d.n - m.med AS dv,
         abs(d.n - m.med) AS ad
  FROM daily d JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type
)
SELECT v.event_type, v.day, CAST(v.n AS BIGINT) AS n,
       FLOOR(v.dv / (1.4826 * t.mad) * 1000000 + 0.5) / 1000000
         AS robust_z,
       abs(v.dv / (1.4826 * t.mad)) > 2.0 AS is_anomaly
FROM dev v JOIN mad t USING (event_type)
ORDER BY event_type, day
""",
    category="analytics",
)
def events_anomaly_mad(spark, t):
    """ROBUST volume-anomaly detection: median/MAD z-scores
    (Hampel's rule, z = (n − median)/(1.4826·MAD)) — the outlier
    detector that doesn't let the outlier inflate its own yardstick,
    unlike events_anomaly_zscore's mean/stddev. Two median passes
    (per-type daily counts are |types|×|days| rows — tiny at any
    corpus scale, so exact percentile() is fine where a true
    full-corpus quantile would use the mergeable bottom-k sketch),
    broadcast joins back, pround final quotient. Both engines
    interpolate the median identically (lang_percentile_gate
    precedent)."""
    from ..functions.hive_compat import pround

    e = t.events
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "day",
        "n",
        (F.col("n") - F.col("med")).alias("dv"),
        F.abs(F.col("n") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    z = F.col("dv") / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            F.col("n").cast("bigint").alias("n"),
            pround(z).alias("robust_z"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "events_seasonal_weekday",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day
),
wd AS (
  SELECT event_type, day, n, dayofweek(day) AS weekday FROM daily
),
season AS (
  SELECT event_type, weekday, median(n) AS wd_median
  FROM wd GROUP BY event_type, weekday
)
SELECT w.event_type, w.day, CAST(w.weekday AS INT) AS weekday,
       CAST(w.n AS BIGINT) AS n,
       ROUND(s.wd_median, 6) AS wd_median,
       ROUND(w.n - s.wd_median, 6) AS residual
FROM wd w JOIN season s USING (event_type, weekday)
ORDER BY event_type, day
""",
    category="analytics",
)
def events_seasonal_weekday(spark, t):
    """Weekday seasonal decomposition of event volume — the
    remove-the-weekly-cycle step before any volume anomaly rule
    (Mondays are not anomalies): per (type, weekday) exact median
    over the daily counts, residual = day − its weekday baseline.
    Two keyed aggregates over |types|×|days| rows + a broadcast
    join back; medians of integers interpolate identically on both
    engines (lang_percentile_gate precedent)."""
    e = t.events
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    wd = daily.withColumn("weekday", F.dayofweek("day") - 1)
    season = wd.groupBy("event_type", "weekday").agg(
        F.expr("percentile(n, 0.5)").alias("wd_median")
    )
    return (
        wd.join(F.broadcast(season), ["event_type", "weekday"])
        .select(
            "event_type",
            "day",
            F.col("weekday").cast("int").alias("weekday"),
            F.col("n").cast("bigint").alias("n"),
            F.round("wd_median", 6).alias("wd_median"),
            F.round(F.col("n") - F.col("wd_median"), 6).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "events_top_paths",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         LEAD(event_type, 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         LEAD(event_type, 2) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS e3,
         LEAD(ts, 2) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS ts3,
         CAST(ts AS TIMESTAMP) AS ts1
  FROM events
)
SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq
WHERE e3 IS NOT NULL
  AND CAST(ts3 AS TIMESTAMP) <= ts1 + INTERVAL 1 HOUR
GROUP BY e1, e2, e3
ORDER BY n DESC, path
LIMIT 15
""",
    category="analytics",
)
def events_top_paths(spark, t):
    """Top 3-step behavioral paths within a 1-hour span (the
    sequence-mining tier above events_top_transitions' 2-step
    matrix): two LEADs over each user's ts-ordered stream, a time
    bound so stitched-across-days non-journeys drop out, then a
    keyed count + distinct-user reach and top-15. Same scale story
    as the transition matrix — one user_id exchange, a
    |event_type|³-bounded rollup, TakeOrdered; the time filter is
    computed inside the window pass, never a self-join."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.col("ts").alias("ts1"),
        F.lead("ts", 2).over(w).alias("ts3"),
    ).filter(
        F.col("e3").isNotNull()
        & (F.col("ts3") <= F.col("ts1") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .select(
            F.concat_ws(" > ", "e1", "e2", "e3").alias("path"),
            "n",
            "n_users",
        )
        .orderBy(F.desc("n"), "path")
        .limit(15)
    )
