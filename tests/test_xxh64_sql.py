"""The generated DuckDB XXH64 SQL is a bit-exact twin of Spark's
``xxhash64`` — the parity that lets hash-dependent pipelines
(SimHash, minhash permutations) carry synthesized oracles instead of
rows-only checks."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hdp2_5_hive_spark.xxh64_sql import (
    M64,
    mul64,
    signed64,
    xxh64_cte,
)

# every length class XXH64 branches on: empty, <4, 4-7, 8-31 (tail
# words), 31/32/33 (stripe boundary), 63/64/65, multi-stripe, and
# multibyte UTF-8 (the hash is over UTF-8 BYTES, not code points)
BOUNDARY_STRINGS = [
    "",
    "a",
    "abc",
    "abcd",
    "abcde",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "x" * 15,
    "x" * 16,
    "y" * 31,
    "z" * 32,
    "w" * 33,
    "q" * 63,
    "r" * 64,
    "s" * 65,
    "t" * 100,
    "u" * 255,
    "v" * 256,
    "long stripe input " * 20,
    "hello world this is a long shingle of words",
    "aé日本語",
    "的 是 了",
    "emoji 🎉 tail",
    "the quick brown fox jumps over the lazy dog " * 3,
]


def _duck_hashes(strs: list[str]) -> list[int]:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(strs)))
        + ") v(id, s)",
        strs,
    )
    sql = (
        "WITH "
        + xxh64_cte("t", ("id",), "s", "hh")[1:]
        + f" SELECT id, {signed64('h')} AS h FROM hh ORDER BY id"
    )
    return [r[1] for r in con.execute(sql).fetchall()]


def _spark_hashes(spark, strs: list[str]) -> list[int]:
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "id int, s string"
    )
    return [
        r.h for r in df.select("id", F.xxhash64("s").alias("h")).orderBy("id").collect()
    ]


def test_xxh64_sql_matches_spark_on_boundaries(spark):
    assert _duck_hashes(BOUNDARY_STRINGS) == _spark_hashes(spark, BOUNDARY_STRINGS)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=200,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_xxh64_sql_matches_spark_on_random_strings(spark, strs):
    assert _duck_hashes(strs) == _spark_hashes(spark, strs)


def test_mul64_and_signed64_match_python_ints():
    con = duckdb.connect()
    cases = [
        (0, 0),
        (1, M64 - 1),
        (M64 - 1, M64 - 1),
        (0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9),
        (1 << 63, 3),
    ]
    for a, b in cases:
        got = con.execute(
            f"SELECT {mul64(f'{a}::HUGEINT', f'{b}::HUGEINT')}"
        ).fetchone()[0]
        assert int(got) == (a * b) % M64, (a, b)
    for v in [0, 1, (1 << 63) - 1, 1 << 63, M64 - 1]:
        got = con.execute(f"SELECT {signed64(f'{v}::HUGEINT')}").fetchone()[0]
        expect = v - M64 if v >= 1 << 63 else v
        assert got == expect, v


def test_simhash_oracle_is_registered_and_hash_green(spark, oracle_con, sf_dir):
    """dedup_simhash carries the synthesized oracle (rows-only →
    hash-green upgrade) and passes the exact comparator."""
    from hdp2_5_hive_spark.oracle import compare_query, reject_complex_schema
    from hdp2_5_hive_spark.queries import all_queries

    q = all_queries()["dedup_simhash"]
    assert q.oracle, "dedup_simhash lost its synthesized oracle"
    sdf = q.fn(spark, sf_dir)
    reject_complex_schema(sdf)
    ok, msg = compare_query(sdf, oracle_con, q.oracle)
    assert ok, msg
