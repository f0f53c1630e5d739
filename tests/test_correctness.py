"""Every registered query vs its DuckDB oracle at sf0.001 — the
same gate the driver applies at sf0.01 (order-insensitive exact
compare, hdp2_5_hive_spark/oracle.py)."""

from __future__ import annotations

import pytest

from hdp2_5_hive_spark.oracle import compare_query
from hdp2_5_hive_spark.queries import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        # rows-only contract: must execute and return a well-formed
        # frame, AND a driver-canonicalizable schema — the driver
        # pandas-sorts even rows-only results and dies on array cells
        # (emb_pca_project ERR r6), so the complex-schema guard
        # applies to every registered query, not just oracle-backed.
        from hdp2_5_hive_spark.oracle import reject_complex_schema

        reject_complex_schema(df)
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0
        return
    ok, detail = compare_query(df, oracle_con, q.oracle)
    assert ok, f"{name}: {detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns[0] == "l_returnflag"


def test_contract_shape():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 50


def test_view_registration_follows_sf_dir(spark):
    """Interleaving sf_dirs (driver: entry at sf0.001, correctness
    at sf0.01) must re-point the session's temp views — a cached
    registration would silently serve the wrong scale."""
    from hdp2_5_hive_spark.queries import query_map

    qm = query_map()
    a = qm["subq_in"](spark, "/root/testdata/sf0.001").count()
    b = qm["subq_in"](spark, "/root/testdata/sf0.01").count()
    a2 = qm["subq_in"](spark, "/root/testdata/sf0.001").count()
    assert a == a2
    assert b != a


def test_sample_front_names_unique_and_registered():
    """SAMPLE_FRONT is the driver's correctness window: a duplicate
    name silently shrinks the window (dict collapse), a missing name
    raises in all_queries() — pin both."""
    from hdp2_5_hive_spark.queries import SAMPLE_FRONT

    assert len(set(SAMPLE_FRONT)) == len(SAMPLE_FRONT)
    assert set(SAMPLE_FRONT) <= set(QUERIES)


def test_sample_front_window_is_rotated():
    """Rotation forcing function (r7 verdict: a stale front re-proves
    50 already-green rows and stalls the ledger). The driver samples a
    ~50-name prefix of SAMPLE_FRONT, so that prefix must contain NO
    query that already has a cumulative CORRECTNESS_r*.json row.
    This test going red at the start of a round means the driver just
    recorded the previous window — rotate SAMPLE_FRONT (front the
    remaining never-sampled names, or the round's fixed red rows)
    as the FIRST commit of the round, exactly like the rotation
    ledger in queries/__init__.py describes.

    Exemption (r8 verdict #2): a name whose LATEST cumulative row is
    red (err, or any *_match false) MUST be re-sampled to prove the
    fix, so red-latest names are allowed — required, even — in the
    front window.

    Exemption (r9 verdict #1): when fewer never-sampled/red names
    remain than window slots, the spare slots should deliberately
    RE-PROVE the oldest-evidence green rows — so green names are
    allowed at positions >= the window's count of names that NEED
    sampling (never-sampled, red-latest, or oracle-upgraded).

    Amendments (r10 verdict #2):
    (a) a name whose registry entry HAS an oracle but whose latest
        driver row is ``no_oracle`` NEEDS sampling — a staged
        rows-only -> oracle upgrade isn't evidence until the driver
        records the hash row;
    (b) when nothing in the registry needs sampling, the window must
        still ROTATE: any name that appears in the MOST RECENT
        CORRECTNESS artifact goes red — the next round's starting
        gun, forcing the evidence-freshness ratchet (r10 verdict #5:
        spare slots go to the stalest-evidence rows, oldest first,
        never a repeat of the window just recorded)."""
    import glob
    import json
    import os

    from hdp2_5_hive_spark.queries import SAMPLE_FRONT, oracle_map

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, dict] = {}
    newest_artifact: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            newest_artifact = json.loads(open(path).read())
        except (OSError, ValueError):
            continue
        latest.update(newest_artifact)
    if not latest:
        return  # fresh clone without driver artifacts

    has_oracle = set(oracle_map())

    def _green(row: dict) -> bool:
        # rows-only contract: err == "no_oracle" with rows returned is
        # the driver's executed-green record shape (emb_pca_project r7)
        if row.get("err") == "no_oracle":
            return row.get("spark_rows") is not None
        if row.get("err"):
            return False
        return all(
            row.get(k) is not False
            for k in ("rows_match", "schema_match", "hash_match")
        )

    def _needs_sampling(name: str) -> bool:
        row = latest.get(name)
        if row is None or not _green(row):
            return True
        # (a) staged oracle upgrade: registry now has an oracle, but
        # the latest driver evidence predates it (rows-only record)
        return row.get("err") == "no_oracle" and name in has_oracle

    window = SAMPLE_FRONT[:50]
    needs_sampling = sum(1 for n in window if _needs_sampling(n))
    if needs_sampling == 0:
        # (b) all-green steady state: the starting gun. The window
        # must not repeat any name the driver just recorded — rotate
        # to the stalest-evidence rows instead.
        stale = [n for n in window if n in newest_artifact]
        assert not stale, (
            f"nothing in the SAMPLE_FRONT window needs sampling, yet "
            f"{len(stale)} of its names were just recorded in the "
            f"newest CORRECTNESS artifact (first: {stale[:5]}) — "
            "rotate the window to the stalest-evidence rows before "
            "doing anything else this round"
        )
        return
    stale = [
        n
        for i, n in enumerate(window)
        if i < needs_sampling and not _needs_sampling(n)
    ]
    assert not stale, (
        f"SAMPLE_FRONT window holds {len(stale)} already-green "
        f"queries ahead of the re-prove boundary (position "
        f"{needs_sampling}; first stale: {stale[:5]}) — rotate the "
        "front before doing anything else this round"
    )
