"""Full-registry timing sweep — every registered query once at a
given SF into the noop sink, chunked across fresh sessions like
bench.py. The headline bench gates 18 queries; this sweep is the
outlier hunt across all of them: anything disproportionately slow at
sf0.1 is a 100 TB problem, not a benchmark miss.

Usage: python scripts/time_sweep.py [sf_dir] [out.json]
Prints a slowest-first report to stderr and writes {name: sec} JSON.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hdp2_5_hive_spark.queries import all_queries  # noqa: E402
from hdp2_5_hive_spark.session import get_session  # noqa: E402

CHUNK = 25


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/time_sweep.json"

    names = list(all_queries())
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for start in range(0, len(names), CHUNK):
        group = names[start : start + CHUNK]
        spark = get_session(app_name="hdp2_5_hive_spark-sweep")
        spark.range(1_000_000).selectExpr("sum(id) AS s").write.format(
            "noop"
        ).mode("overwrite").save()
        qs = all_queries()
        for name in group:
            t0 = time.time()
            try:
                df = qs[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times[name] = round(time.time() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — sweep must finish
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            spark.catalog.clearCache()
            print(
                f"# {name}: {times.get(name, 'ERR')}",
                file=sys.stderr,
                flush=True,
            )
        spark.stop()

    with open(out_path, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "times": times, "errors": errors}, fh, indent=1
        )
    print(f"\n== slowest 25 of {len(times)} ==", file=sys.stderr)
    for name, sec in sorted(times.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{sec:8.2f}s  {name}", file=sys.stderr)
    if errors:
        print(f"== {len(errors)} errors ==", file=sys.stderr)
        for name, msg in errors.items():
            print(f"ERR {name}: {msg}", file=sys.stderr)
    print(json.dumps({"swept": len(times), "errors": len(errors)}))
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
