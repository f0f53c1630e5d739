"""Oracle-side timing sweep: run every registered DuckDB oracle
alone (no Spark) and report the slowest.

The Spark-side sweep (``scripts/time_sweep.py``) bounds the engine's
per-query cost; this bounds the ORACLE's share of a driver
correctness run — a pathological oracle burns driver wall-clock even
when the engine is fast (the simhash replay's first cut took 28 s at
sf0.01 purely on a re-evaluated lane expression; this sweep is what
localized it).

Usage: python scripts/oracle_sweep.py [sf_dir] [threshold_s] [--json OUT]
Prints one line per oracle slower than threshold (default 5 s), then
a summary; exit 0 always (informational). With ``--json OUT`` also
writes the full per-oracle timing map to OUT (the committed
ORACLE_SWEEP_r{N}.json round artifact — verdict r10 #7: oracle-side
cost is part of the round discipline, so keep its history in-repo
like BENCH_r{N}.json).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from hdp2_5_hive_spark.oracle import connect_oracle
from hdp2_5_hive_spark.queries import all_queries


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("--json requires an output path")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    threshold = float(args[0]) if args else 5.0

    con = connect_oracle(sf_dir)
    times: dict[str, float] = {}
    errors = 0
    for name, q in all_queries().items():
        if not q.oracle:
            continue
        t0 = time.time()
        try:
            con.execute(q.oracle).fetchall()
            times[name] = time.time() - t0
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors += 1
            print(f"ERR   {name}: {type(e).__name__}: {str(e)[:120]}")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        if t < threshold:
            break
        print(f"{t:7.1f}s {name}")
    if times:
        print(
            f"== {len(times)} oracles, {errors} errors, "
            f"total {sum(times.values()):.1f}s, "
            f"max {max(times.values()):.1f}s ({max(times, key=times.get)}) =="
        )
    else:
        print(f"== 0 oracles timed, {errors} errors ==")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_oracles": len(times),
                    "errors": errors,
                    "total_s": round(sum(times.values()), 3),
                    "oracles": {n: round(t, 3) for n, t in times.items()},
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
