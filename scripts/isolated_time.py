"""Isolated per-query timing — each query in its OWN fresh session
(subprocess), sweep methodology (fn build + one noop write) after a
1M-row warmup. The cleanest before/after instrument for operators
whose cost is in the fn() build (iterative trainers): no accumulated
session state, no chunk-position effects.

Usage: python scripts/isolated_time.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

CHILD = r"""
import sys, time
sys.path.insert(0, {root!r})
from hdp2_5_hive_spark.queries import all_queries
from hdp2_5_hive_spark.session import get_session
spark = get_session(app_name="isolated-time")
spark.range(1_000_000).selectExpr("sum(id) AS s").write.format("noop").mode("overwrite").save()
t0 = time.time()
df = all_queries()[{name!r}].fn(spark, {sf!r})
df.write.format("noop").mode("overwrite").save()
print("ISOLATED " + {name!r} + " %.3f" % (time.time() - t0))
spark.stop()
"""


def main() -> int:
    args = sys.argv[1:]
    sf = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    root = str(Path(__file__).resolve().parent.parent)
    for name in args:
        code = CHILD.format(root=root, name=name, sf=sf)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        for line in out.stdout.splitlines():
            if line.startswith("ISOLATED"):
                print(line, flush=True)
                break
        else:
            print(f"ISOLATED {name} ERROR rc={out.returncode}", flush=True)
            sys.stderr.write(out.stderr[-2000:])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
