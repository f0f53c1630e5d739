"""Simulate the verify driver exactly: a VANILLA SparkSession (no
engine session factory — Spark 4 defaults, ANSI on) runs every
``__spark_entry__.queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB. This is the gate CORRECTNESS_r{N}.json
records; run it before ending a round.

Usage: python scripts/driver_sim.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from hdp2_5_hive_spark.oracle import (
        compare_query,
        connect_oracle,
        reject_complex_schema,
    )

    # entry() smoke first, like the driver
    n_entry = entrymod.entry(spark).count()
    print(f"entry() rows: {n_entry}")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = connect_oracle(sf_dir)
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, detail = compare_query(df, con, oracles[name])
            else:
                # the real driver canonicalizes rows-only results too
                # (emb_pca_project ERR r6) — enforce the same guard
                reject_complex_schema(df)
                cnt = df.count()
                ok, detail = cnt >= 0, f"{cnt} rows (rows-only)"
                n_rows_only += 1
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"ERR {type(exc).__name__}: {str(exc)[:160]}"
        dt = time.time() - t0
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {detail} [{dt:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"== {n_pass} pass, {n_fail} fail ({n_rows_only} rows-only) ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
