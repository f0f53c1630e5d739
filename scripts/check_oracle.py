"""Self-check harness: run every registered query on Spark AND its
DuckDB oracle; exact order-insensitive compare (see
hdp2_5_hive_spark/oracle.py).

Usage:
    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from hdp2_5_hive_spark.oracle import (
    compare_query,
    connect_oracle,
    reject_complex_schema,
)
from hdp2_5_hive_spark.queries import all_queries
from hdp2_5_hive_spark.session import get_session


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(args)

    spark = get_session()
    con = connect_oracle(sf_dir)

    qs = all_queries()
    names = [n for n in qs if not only or n in only]
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        q = qs[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            if q.oracle is None:
                reject_complex_schema(sdf)
                n = sdf.count()
                print(f"ROWS {name}: {n} rows (no oracle) [{time.time()-t0:.1f}s]")
                n_rowsonly += 1
                continue
            ok, detail = compare_query(sdf, con, q.oracle)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {detail} [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
