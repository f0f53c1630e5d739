"""SHOW PARTITIONS / MSCK REPAIR parity on the file-backed catalog."""

from __future__ import annotations

import os

import pytest

from hdp2_5_hive_spark.metastore import Metastore, NoSuchTableError


def test_show_partitions_lists_specs(spark, sf_dir, tmp_path):
    ms = Metastore(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ms.create_table(nation, "nation_p", partition_by=["n_regionkey"])
    specs = ms.partitions("nation_p")
    got = sorted(s["n_regionkey"] for s in specs)
    want = sorted(
        str(r.n_regionkey)
        for r in nation.select("n_regionkey").distinct().collect()
    )
    assert got == want


def test_show_partitions_multi_level(spark, sf_dir, tmp_path):
    ms = Metastore(str(tmp_path / "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    ms.create_table(
        orders, "orders_p", partition_by=["o_orderstatus", "o_orderpriority"]
    )
    specs = ms.partitions("orders_p")
    assert all(
        set(s) == {"o_orderstatus", "o_orderpriority"} for s in specs
    )
    n_combos = (
        orders.select("o_orderstatus", "o_orderpriority").distinct().count()
    )
    assert len(specs) == n_combos


def test_msck_ok_and_detects_stray(spark, sf_dir, tmp_path):
    ms = Metastore(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ms.create_table(nation, "nation_p", partition_by=["n_regionkey"])
    rep = ms.msck_repair("nation_p")
    assert len(rep["partitions"]) == 5
    # a stray non-partition directory breaks the layout contract
    os.makedirs(str(tmp_path / "wh" / "nation_p" / "stray_dir"))
    with pytest.raises(ValueError):
        ms.msck_repair("nation_p")
    with pytest.raises(NoSuchTableError):
        ms.partitions("never_created")


def test_unpartitioned_table_has_no_partitions(spark, sf_dir, tmp_path):
    ms = Metastore(str(tmp_path / "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ms.create_table(nation, "nation_flat")
    assert ms.partitions("nation_flat") == []
    assert ms.msck_repair("nation_flat")["partitions"] == []
