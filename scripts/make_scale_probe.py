"""Synthesize a ~10x scaling-probe dataset from sf0.1 (SCALING ONLY).

The driver ships sf0.001/0.01/0.1; the r13 verdict showed the 8-vs-32
core scaling probe is blind at sf0.1 (per-query fixed costs swamp the
signal). This script builds a deterministic "sf1" directory by
unioning K shifted copies of every sf0.1 table:

- fact keys shift by copy * 10^9 (l_orderkey/o_orderkey, doc_id,
  vec_id, event_id, user_id) so join relationships survive per copy;
- dimension tables (region/nation/customer/supplier/part) are kept
  as-is — the TPC-H "scale facts" axis;
- document text gets a per-copy suffix token so near-dup structure is
  replicated per copy instead of exploding quadratically across
  copies (10 exact twins of every doc would change the dedup
  workload's shape, not its scale).

This data is NOT oracle-checked and is used only for the committed
SCALING_r14.md ratio measurements. It never touches /root/testdata.

Usage: python scripts/make_scale_probe.py [out_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from hdp2_5_hive_spark.session import get_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
SHIFT = 1_000_000_000


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/scale_probe/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    spark = get_session(app_name="make-scale-probe")

    dims = ["region", "nation", "customer", "supplier", "part"]
    for t in dims:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")

    shifts = {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "events": ["event_id", "user_id"],
    }
    for t, keys in shifts.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(k):
            c = src
            for key in keys:
                c = c.withColumn(key, F.col(key) + F.lit(i * SHIFT))
            if t == "documents" and "text" in c.columns:
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copytag{i}"))
                )
            copies.append(c)
        allc = copies[0]
        for c in copies[1:]:
            allc = allc.unionByName(c)
        allc.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"wrote {t} x{k}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
