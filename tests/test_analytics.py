"""Event-analytics invariants (oracle equality is the driver's job;
these pin the semantic properties)."""

from __future__ import annotations

from hdp2_5_hive_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def test_funnel_counts_monotonically_shrink(spark):
    qs = all_queries()
    rows = sorted(
        qs["events_funnel"].fn(spark, SF).collect(), key=lambda r: r.step
    )
    assert [r.stage for r in rows] == ["signup", "view", "click", "purchase"]
    counts = [r.n_users for r in rows]
    assert counts[0] > 0
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts


def test_retention_day_zero_counts_every_user(spark):
    """Every user is active on their own cohort day, so offset 0 must
    equal the distinct-user count; offsets are bounded to 0..14."""
    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.catalog import load_table

    qs = all_queries()
    rows = {r.day_offset: r.n_users
            for r in qs["events_retention"].fn(spark, SF).collect()}
    n_users = (
        load_table(spark, SF, "events")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()[0]
        .n
    )
    assert rows[0] == n_users
    assert all(0 <= k <= 14 for k in rows)


def test_scd2_single_sort_and_semantics(spark):
    """SCD2 build: consecutive identical states never open a
    version; intervals chain (to[i] == from[i+1]); exactly one
    open (is_current) row per entity. Plan: the two Windows share
    one Exchange+Sort (same partitioning and ordering)."""
    qs = all_queries()
    df = qs["events_scd2_history"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") <= 2  # one physical sort (+subtree print)
    rows = df.filter("user_id = 1").orderBy("version_no").collect()
    assert rows, "user 1 should have history"
    for a, b in zip(rows, rows[1:]):
        assert a.state != b.state  # change points only
        assert a.effective_to == b.effective_from  # intervals chain
    assert [r.is_current for r in rows] == [False] * (len(rows) - 1) + [True]


def test_interval_overlap_join_matches_brute_force(spark):
    """Banded interval-overlap join vs the O(n·m) reference over an
    adversarial set: point-touching intervals, nested intervals, a
    giant interval spanning every band, negative coordinates, and
    band-boundary endpoints. Exact set equality proves completeness;
    exact MULTISET equality proves the canonical-band rule emits no
    duplicates without a DISTINCT."""
    from hdp2_5_hive_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    lefts = [
        (1, 0, 10), (2, 10, 10), (3, 11, 20), (4, -65, -3),
        (5, 0, 500), (6, 31, 33), (7, 64, 64), (8, 100, 131),
    ]
    rights = [
        (101, 5, 12), (102, 10, 10), (103, -100, 0), (104, 200, 300),
        (105, 32, 32), (106, -4, 64), (107, 131, 140),
    ]
    L = spark.createDataFrame(lefts, "lid int, s long, e long").repartition(3)
    R = spark.createDataFrame(rights, "rid int, ps long, pe long").repartition(2)
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            L, R, "s", "e", "ps", "pe", band=32
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for lid, s, e in lefts
        for rid, ps, pe in rights
        if s <= pe and ps <= e
    )
    assert got == want
    assert len(got) == len(set(got))  # duplicate-free, no DISTINCT
