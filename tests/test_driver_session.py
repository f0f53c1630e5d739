"""Driver-environment parity regression tests (round-1 gate failure).

The verify driver invokes ``__spark_entry__.queries()[name](spark,
sf_dir)`` with ITS OWN SparkSession — on Spark 4.x that session has
ANSI mode ON, no nanos handling, and a machine-local timezone. Round 1
died 0/50 because parity confs lived only in our session factory.
These tests build a deliberately-hostile session (vanilla Spark 4
defaults, worse timezone) and require the full oracle gate to pass
through it, plus fault isolation when one table is unreadable.
"""

from __future__ import annotations

import os

import pytest

from hdp2_5_hive_spark.catalog import PARITY_CONFS, TABLES
from hdp2_5_hive_spark.oracle import compare_query

# The three round-1 tripwires: parquet nanos scan, cast-to-NULL
# semantics under default-ON ANSI mode, and timestamp sessionization
# under a non-UTC session timezone.
TRIPWIRES = ("q1_pricing_summary", "fn_cast_null_semantics", "events_sessionize")


@pytest.fixture(scope="module")
def hostile(spark):
    """A session with vanilla Spark 4 defaults forced back on —
    simulates the driver's ``SparkSession.builder.getOrCreate()``
    (our factory confs land in the shared SparkConf, so newSession()
    alone would inherit them; we explicitly revert the lot)."""
    s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    s.conf.set("spark.sql.shuffle.partitions", "200")
    return s


@pytest.mark.parametrize("name", TRIPWIRES)
def test_hostile_session_passes_oracle(name, hostile, sf_dir, oracle_con):
    import __spark_entry__ as e

    df = e.queries()[name](hostile, sf_dir)
    ok, detail = compare_query(df, oracle_con, e.oracle_sql()[name])
    assert ok, f"{name} on hostile session: {detail}"


def test_parity_confs_applied_to_incoming_session(hostile, sf_dir):
    import __spark_entry__ as e

    e.queries()["q6_forecast_revenue"](hostile, sf_dir)
    for k, v in PARITY_CONFS.items():
        assert hostile.conf.get(k) == v, k


def test_one_bad_table_costs_one_query(spark, sf_dir, tmp_path):
    """A poisoned events.parquet must not break queries that never
    touch events (round 1: eager registration made it break all 117)."""
    for t in TABLES:
        dst = tmp_path / f"{t}.parquet"
        if t == "events":
            dst.write_bytes(b"this is not parquet")
        else:
            os.symlink(f"{sf_dir}/{t}.parquet", dst)

    from hdp2_5_hive_spark.queries import query_map

    s = spark.newSession()  # own temp-view namespace
    qm = query_map()
    assert qm["q6_forecast_revenue"](s, str(tmp_path)).count() > 0
    with pytest.raises(Exception):
        qm["events_sessionize"](s, str(tmp_path)).collect()
    # and the healthy tables keep working afterwards
    assert qm["join_inner_basic"](s, str(tmp_path)).count() > 0
