"""Self-check harness: run every registered query on Spark AND its
DuckDB oracle, compare row count, schema (column names), and values
exactly (sorted rows, stringified) — a strict local stand-in for the
driver's order-insensitive value-hash gate.

Usage:
    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

from hdp2_5_hive_spark.catalog import TABLES, table_path
from hdp2_5_hive_spark.queries import all_queries
from hdp2_5_hive_spark.session import get_session


def canon(v):
    """Canonicalize a value the way a hash-compare plausibly would."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(args)

    spark = get_session()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    qs = all_queries()
    names = [n for n in qs if not only or n in only]
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        q = qs[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        dt_spark = time.time() - t0
        if q.oracle is None:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{dt_spark:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            rel = con.execute(q.oracle)
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            sc = rows_canon(scols, [tuple(r) for r in srows])
            dc = rows_canon(dcols, drows)
            if sc != dc:
                diffs = [(a, b) for a, b in zip(sc, dc) if a != b]
                print(f"FAIL {name}: {len(diffs)}/{len(sc)} rows differ; first:")
                for a, b in diffs[:3]:
                    print(f"   spark: {a}\n   duck : {b}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(srows)} rows [{dt_spark:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
