"""Time-series operators: as-of join and multi-resolution rollups.

Spark has no native AS-OF join (DuckDB/kdb do); the classic
distributed formulation is union-the-streams + one keyed window —
ONE shuffle on the join key, no range self-join, no per-row probe.
That is the shape that survives 100 TB of events: the window state
per (key, ts) partition is a single carried value.

Reference anchor: Hive 1.2 has no as-of either; users emulated it
with correlated subqueries (O(N²)) — this operator is the engine
extension that replaces that pattern (SURVEY §2.14 custom-operator
clause).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` sharing the ``on`` keys (AS OF
    semantics, ties resolved toward the right row).

    ``direction``: "backward" (default — latest right row at or
    before the left ts, the classic AS OF) or "forward" (earliest
    right row at or after it, pandas ``merge_asof`` parity); both
    are the SAME one-exchange union+window plan, only the window
    order flips.

    Implementation: tag and union both inputs, then one window per
    key ordered by (ts, side) carrying ``last_value(..., ignorenulls)``
    of the right columns; left rows read the carried value. Exactly
    one hash exchange on ``on`` — compare a range self-join, which
    explodes quadratically within key groups.

    ``tolerance``: optional max staleness (e.g. ``"30 minutes"``) —
    matches older than that become NULL, like pandas ``merge_asof``.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = [c for c in left.columns if c not in set(on) | {ts_col}]
    # The right row is carried as ONE struct, not per-column lasts:
    # independent `last(_r_c, ignorenulls)` columns back-filled a NULL
    # field from an OLDER right row while the other fields came from
    # the newest one — emitting a right tuple that never existed.
    # pandas merge_asof (and every AS OF implementation) carries whole
    # rows; a NULL field in the matched row stays NULL.
    rstruct_type = StructType(
        [StructField("_ts", right.schema[ts_col].dataType)]
        + [
            StructField(c, right.schema[c].dataType)
            for c in right_value_cols
        ]
    )
    tagged_l = left.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("_r_all"),
    )
    tagged_r = right.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(
            F.col(ts_col).alias("_ts"),
            *[F.col(c) for c in right_value_cols],
        ).alias("_r_all"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # Right rows sort BEFORE left rows at equal ts (side desc) so a
    # same-instant right row is visible to the left row — `<=` for
    # backward, `>=` for forward (where the scan order is reversed).
    # The right-row struct completes the total order: several right
    # rows can share a (key, ts), and with ties left to the engine
    # the carried `last` would be partition/sort nondeterministic.
    # Rule: among equal-ts right rows the GREATEST value tuple wins
    # (struct comparison is field-wise lexicographic; they sort
    # ascending and `last` reads the final one) — same deterministic-
    # output discipline as every other operator here.
    order = (
        [F.col(ts_col).asc(), F.col("_side").desc(), F.col("_r_all").asc()]
        if direction == "backward"
        else [F.col(ts_col).desc(), F.col("_side").desc(), F.col("_r_all").asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "*",
        F.last("_r_all", ignorenulls=True).over(w).alias("_c_all"),
    ).select(
        "*",
        *[
            F.col("_c_all").getField(c).alias(f"_c_{c}")
            for c in right_value_cols
        ],
        F.col("_c_all").getField("_ts").alias("_c_ts"),
    )
    out = carried.filter(F.col("_side") == 0)
    if tolerance is not None:
        fresh = (
            F.col("_c_ts") >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("_c_ts") <= F.col(ts_col) + F.expr(f"INTERVAL {tolerance}")
        )
        out = out.select(
            *on,
            ts_col,
            *lcols,
            *[
                F.when(fresh, F.col(f"_c_{c}")).alias(f"_c_{c}")
                for c in right_value_cols
            ],
            F.when(fresh, F.col("_c_ts")).alias("_c_ts"),
        )
    return out.select(
        *on,
        ts_col,
        *lcols,
        *[F.col(f"_c_{c}").alias(f"right_{c}") for c in right_value_cols],
        F.col("_c_ts").alias(f"right_{ts_col}"),
    )


def rollup_reuse(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    fine: str = "1 hour",
    coarse_unit: str = "day",
) -> tuple[DataFrame, DataFrame]:
    """Hypertable-style continuous-aggregate chain: the fine rollup
    (e.g. hourly) is computed from raw events ONCE; the coarse rollup
    (e.g. daily) re-aggregates the fine one — at 100 TB the daily
    pass reads |hours × keys| rows, not the raw table. Sums/counts
    are decomposable so the reuse is exact; avg is derived at read
    time as sum/count (never averaged-of-averages).

    Returns (fine_df, coarse_df).
    """
    fine_df = (
        events.groupBy(
            F.window(ts_col, fine).alias("win"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).alias("sum_v"),
        )
        .select(
            F.col("win.start").alias("bucket_start"), key_col, "n", "sum_v"
        )
    )
    coarse_df = (
        fine_df.groupBy(
            F.date_trunc(coarse_unit, "bucket_start").alias("bucket_start"),
            F.col(key_col),
        )
        .agg(F.sum("n").alias("n"), F.sum("sum_v").alias("sum_v"))
        .select(
            "bucket_start",
            key_col,
            F.col("n").cast("bigint").alias("n"),
            F.col("sum_v").cast("double").alias("sum_v"),
            (F.col("sum_v").cast("double") / F.col("n")).alias("avg_v"),
        )
    )
    return fine_df, coarse_df
