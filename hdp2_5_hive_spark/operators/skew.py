"""Skew mitigation: salted two-phase aggregation and salted
broadcast-side join.

Reference: Hive fights skew twice — compile-time
(``optimizer/SkewJoinOptimizer.java``, ``hive.groupby.skewindata``'s
two-MR-job plan, ``parse/SemanticAnalyzer.java:5571``
``genGroupByPlan2MR``) and runtime (``exec/SkewJoinHandler.java:74``
spilling oversized keys to side files). Spark's AQE skew-join covers
the join case automatically; *aggregation* skew on a hot key still
concentrates one reducer, and that is exactly Hive's 2MR trick —
re-expressed here as salt → partial agg → de-salt → final agg.

At 100 TB: a hot key (empty string, null-ish sentinel, bot user_id)
can hold >50% of rows. Salting spreads its partial aggregation over
``n_salts`` reducers; the second aggregation then combines only
|keys|×n_salts pre-aggregated rows. Both phases keep map-side
partial aggregation, so the extra pass is over tiny data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    *,
    n_salts: int = 32,
    sum_alias: str = "sum_value",
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase skew-proof SUM/COUNT by ``keys``.

    Phase 1 groups by (keys, salt) where salt = hash(whole row id
    surrogate) % n_salts — uniform by construction; phase 2 groups by
    keys alone over the n_salts partial rows per key. Result is
    identical to the direct groupBy (sums/counts are associative);
    only the shuffle layout changes.
    """
    # Salt from ROW CONTENT (keys + value), never from
    # monotonically_increasing_id or rand(): a non-deterministic
    # expression feeding a shuffle key is the classic lost/duplicated
    # row hazard under stage retry — a re-executed map task that sees
    # rows in a different order re-salts them differently, and
    # reducers that already consumed the old output plus re-run
    # reducers consuming the new one can together count a row twice
    # or zero times. The content hash is retry-stable; the value
    # column spreads a hot key's rows uniformly, and in the
    # degenerate all-identical-rows case map-side partial
    # aggregation already collapses each (key, salt) group to one
    # row per map task, so the hot reducer receives O(#mappers)
    # pre-aggregated rows either way.
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], value), F.lit(n_salts)
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(value.cast("decimal(38,6)")).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").cast("double").alias(sum_alias),
        F.sum("_pcnt").alias(count_alias),
    )


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
) -> DataFrame:
    """Salted broadcast join for a skewed big side: the big side gets
    a random salt in [0, n_salts); the (broadcast) small side is
    replicated once per salt value, so a hot key's rows spread over
    ``n_salts`` tasks instead of one. Inner-join semantics.

    This is the manual form of what AQE skew-join does to *shuffle*
    joins; for broadcast joins skew doesn't matter (no shuffle), so
    this exists for the shuffle-join case with broadcast-sized
    replication factor — and as the documented fallback when AQE is
    off (Hive GenMRSkewJoinProcessor parity).
    """
    # Deterministic content-hash salt for the same retry-stability
    # reason as salted_sum_count (full-duplicate rows share a salt —
    # the price of determinism; distinct payload columns spread them)
    salted_big = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
        ),
    )
    replicated_small = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(n_salts).select(
                F.col("id").cast("long").alias("_salt")
            )
        )
    )
    return salted_big.join(replicated_small, [key, "_salt"]).drop("_salt")
