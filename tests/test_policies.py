"""Row-filter + column-mask policy engine (Ranger data plane as a
plan-time rewrite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp2_5_hive_spark.functions.policies import apply_policies

POLICIES = [
    {
        "table": "customer",
        "users": ["analyst"],
        "row_filter": "c_nationkey < 10",
        "column_masks": {
            "c_name": "concat(substring(c_name, 1, 2),"
            " repeat('x', length(c_name) - 2))"
        },
    },
    {
        "table": "customer",
        # no users key -> applies to everyone, admin included
        "row_filter": "c_custkey >= 0",
    },
]


def _cust(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def test_analyst_filtered_and_masked_admin_untouched(spark, sf_dir):
    c = _cust(spark, sf_dir)
    analyst = apply_policies(c, "customer", "analyst", POLICIES)
    admin = apply_policies(c, "customer", "admin", POLICIES)
    assert admin.count() == c.count()  # universal policy is a no-op filter
    assert {r.c_name for r in admin.collect()} == {
        r.c_name for r in c.collect()
    }
    rows = analyst.collect()
    assert rows and all(r.c_nationkey < 10 for r in rows)
    assert all(
        r.c_name[2:] == "x" * (len(r.c_name) - 2) for r in rows
    )
    # masks see PRE-mask values: first 2 chars survive
    orig = {r.c_custkey: r.c_name for r in c.collect()}
    assert all(r.c_name[:2] == orig[r.c_custkey][:2] for r in rows)


def test_policy_row_filter_reaches_parquet_scan(spark, sf_dir):
    """The whole point of rewrite-time enforcement: the policy
    predicate pushes down to the scan like any user WHERE."""
    c = _cust(spark, sf_dir)
    analyst = apply_policies(c, "customer", "analyst", POLICIES).select(
        "c_custkey", "c_name"
    )
    plan = analyst._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:200]
    assert "c_nationkey" in pushed, plan[:900]


def test_mask_type_preserved_and_unknown_column_raises(spark, sf_dir):
    c = _cust(spark, sf_dir)
    masked = apply_policies(
        c,
        "customer",
        "u",
        [{"table": "customer", "column_masks": {"c_acctbal": "0.0"}}],
    )
    assert dict(masked.dtypes)["c_acctbal"] == dict(c.dtypes)["c_acctbal"]
    assert {r.c_acctbal for r in masked.collect()} == {0.0}
    with pytest.raises(ValueError, match="unknown column"):
        apply_policies(
            c,
            "customer",
            "u",
            [{"table": "customer", "column_masks": {"nope": "'x'"}}],
        )


def test_non_matching_table_or_user_is_identity(spark, sf_dir):
    c = _cust(spark, sf_dir)
    same = apply_policies(c, "orders", "analyst", POLICIES[:1])
    assert same is c
    same2 = apply_policies(c, "customer", "intern", POLICIES[:1])
    assert same2 is c
