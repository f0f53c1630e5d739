"""Guard the driver-environment seam.

Round-3 lesson: the driver regenerated ``events.parquet`` with ``ts``
as ``timestamp[us]`` where the old generator wrote TIMESTAMP(NANOS);
the loader assumed one encoding and 9 correctness rows + 15 tests +
the whole bench died on a single line. These tests fail loudly (in
seconds, via pyarrow — no Spark) on the next silent testdata drift,
and prove the loader handles every encoding family we know about.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hdp2_5_hive_spark.catalog import TABLES, load_table, table_path

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

# table -> {column: allowed type families}. A "family" is a predicate
# over the pyarrow type, loose enough to allow generator-side width
# changes (int32 vs int64, us vs ms) but tight enough that a category
# switch (timestamp -> string) fails here instead of mid-suite.
_FAMILIES = {
    "int": pa.types.is_integer,
    "float": pa.types.is_floating,
    "decimal": pa.types.is_decimal,
    "string": lambda t: pa.types.is_string(t) or pa.types.is_large_string(t),
    "timestamp": pa.types.is_timestamp,
    "date": lambda t: pa.types.is_date(t) or pa.types.is_timestamp(t),
    "binary": lambda t: pa.types.is_binary(t) or pa.types.is_large_binary(t),
    "floatlist": lambda t: (pa.types.is_list(t) or pa.types.is_large_list(t))
    and pa.types.is_floating(t.value_type),
}

# events.ts is the drift we were burned by: accept timestamp OR int
# (the legacy nanos-as-long encoding). Everything else is one family.
CONTRACT: dict[str, dict[str, tuple[str, ...]]] = {
    "region": {"r_regionkey": ("int",), "r_name": ("string",)},
    "nation": {"n_nationkey": ("int",), "n_regionkey": ("int",)},
    "customer": {"c_custkey": ("int",), "c_acctbal": ("float", "decimal")},
    "supplier": {"s_suppkey": ("int",), "s_nationkey": ("int",)},
    "part": {"p_partkey": ("int",), "p_retailprice": ("float", "decimal")},
    "orders": {
        "o_orderkey": ("int",),
        "o_custkey": ("int",),
        "o_orderdate": ("date", "string"),
        "o_totalprice": ("float", "decimal"),
    },
    "lineitem": {
        "l_orderkey": ("int",),
        "l_quantity": ("float", "decimal", "int"),
        "l_extendedprice": ("float", "decimal"),
        "l_shipdate": ("date", "string"),
    },
    "events": {
        "event_id": ("int",),
        "ts": ("timestamp", "int"),  # current generator | legacy nanos
        "user_id": ("int",),
        "event_type": ("string",),
        "value": ("float",),
        "props": ("string",),
    },
    "documents": {"doc_id": ("int",), "text": ("string",)},
    "embeddings": {
        "vec_id": ("int",),
        "embedding": ("floatlist",),
        "label": ("int",),
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(CONTRACT))
def test_testdata_schema_families(sf_dir: str, table: str) -> None:
    schema = pq.read_schema(table_path(sf_dir, table))
    names = set(schema.names)
    for col, fams in CONTRACT[table].items():
        assert col in names, f"{sf_dir}/{table}: missing column {col!r}"
        typ = schema.field(col).type
        assert any(_FAMILIES[f](typ) for f in fams), (
            f"{sf_dir}/{table}.{col}: type {typ} not in families {fams} — "
            "testdata generator drifted; update catalog.load_table AND "
            "this contract"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_tables_present(sf_dir: str) -> None:
    import os

    for t in TABLES:
        assert os.path.exists(table_path(sf_dir, t)), f"{sf_dir}: {t} missing"


def test_events_loads_for_both_encodings(spark, tmp_path) -> None:
    """``load_table`` must adapt to the file's declared ts type
    (schema-on-read — reference LazySimpleSerDe.java:82): the real
    testdata (currently timestamp[us]) AND a self-written
    TIMESTAMP(NANOS) fixture must both scan to a timestamp column
    with identical values."""
    real = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(real.dtypes)["ts"] == "timestamp"
    rows = real.select("event_id", "ts").orderBy("event_id").limit(5).collect()
    assert len(rows) == 5 and all(r.ts is not None for r in rows)

    # Write the same 5 rows as nanos and re-load through the fixture
    # dir; values must round-trip exactly (micros precision).
    nanos_dir = tmp_path / "nanos_sf"
    nanos_dir.mkdir()
    table = pa.table(
        {
            "event_id": pa.array([r.event_id for r in rows], pa.int64()),
            "ts": pa.array([r.ts for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["click"] * 5),
            "value": pa.array([1.0] * 5, pa.float64()),
            "props": pa.array(["{}"] * 5),
        }
    )
    # Pin the writer format: parquet 2.6 preserves timestamp[ns]. A
    # future pyarrow default that coerces ns→us on write would make
    # this fixture silently test the timestamp branch twice and the
    # nanos/bigint coverage would vanish without a failure.
    pq.write_table(
        table,
        str(nanos_dir / "events.parquet"),
        version="2.6",
        coerce_timestamps=None,
    )
    # The fixture only covers the legacy branch if Spark actually
    # scans ts as bigint (nanosAsLong); assert it, don't assume it.
    raw_dtype = dict(
        spark.read.parquet(str(nanos_dir / "events.parquet")).dtypes
    )["ts"]
    assert raw_dtype == "bigint", (
        f"nanos fixture scanned as {raw_dtype!r}, not bigint — pyarrow "
        "stopped writing TIMESTAMP(NANOS); fixture no longer tests the "
        "legacy branch"
    )
    redux = load_table(spark, str(nanos_dir), "events")
    assert dict(redux.dtypes)["ts"] == "timestamp"
    got = {r.event_id: r.ts for r in redux.select("event_id", "ts").collect()}
    assert got == {r.event_id: r.ts for r in rows}
