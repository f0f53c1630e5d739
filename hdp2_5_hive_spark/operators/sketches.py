"""Mergeable sketches: Count-Min (Cormode & Muthukrishnan 2005,
public) for heavy-hitter estimation over unbounded token streams,
and a deterministic bottom-k uniform-sample sketch for mergeable
quantile estimation.

The reference's statistics stack estimates NDV per column
(``ql/.../udf/generic/GenericUDAFComputeStats.java`` — FM/HLL-style
sketches) but has no frequency sketch; CMS is the standard companion
(the one-line estimate `min_d cms[d][h_d(x)]`) every large-corpus
vocabulary/heavy-hitter pipeline carries, and — like the HLL NDV
sketch beside it in this repo (queries/scalars2.agg_hll_sketch) —
its whole value at 100 TB is MERGEABILITY: per-partition partial
counts of fixed width d*w collapse by plain SUM, so the sketch
costs one keyed aggregate of the token stream and a few KB of state
no matter the corpus size. Estimation for a probe set joins the
d*w-row sketch as a broadcast.

Hashing is md5-prefix mod w with the row index mixed into the
input (``features.md5_bucket`` idiom) — engine-portable, so a SQL
oracle reproduces the sketch cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .features import md5_bucket


def cms_bucket(col: Column, row: Column, width: int) -> Column:
    """Hash of token ``col`` for CMS row ``row``: md5 of
    '<row>:<token>' mod width — independent-enough rows from one
    engine-portable hash family."""
    return md5_bucket(F.concat(row.cast("string"), F.lit(":"), col), width)


def cms_build(
    tokens: DataFrame, tok_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch of a token stream: (row s, bucket b, c) cells,
    c = number of tokens hashing to bucket b under row s's hash.
    Exactly ``depth`` × ``width`` cells at most; built by ONE keyed
    aggregate with map-side combine (each input row contributes to
    ``depth`` cells via a width-``depth`` explode). Merging two
    sketches (another batch, another day) is SUM over (s, b) —
    associative, the mergeability that makes it a sketch."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("s")
    return (
        tokens.select(F.col(tok_col).alias("_tok"), rows)
        .groupBy(
            "s", cms_bucket(F.col("_tok"), F.col("s"), width).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    tok_col: str,
    *,
    depth: int | None = None,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for a probe token set: est(x) =
    min over rows s of sketch[s][h_s(x)]. Never underestimates
    (every cell holds x's true count plus non-negative collisions);
    overestimate is bounded by the classic 2N/w with probability
    1 - (1/2)^depth. The ≤ depth·width-row sketch joins as an
    explicit broadcast — probes shuffle only for their own distinct.

    ``depth``/``width`` must match the build parameters or the probe
    hashes address different cells and min-with-coalesce(0) silently
    returns 0 for present tokens (ADVICE r6). Depth therefore
    defaults to DERIVED from the sketch itself (max(s)+1 — one tiny
    aggregate over a KB-sized frame); an explicitly passed depth is
    validated against it, and a sketch bucket ≥ width (built wider
    than probed) raises instead of mis-addressing."""
    meta = sketch.agg(
        F.max("s").alias("smax"), F.max("b").alias("bmax")
    ).collect()[0]
    if meta.smax is None:
        raise ValueError("cms_estimate: empty sketch")
    sk_depth = int(meta.smax) + 1
    if depth is None:
        depth = sk_depth
    elif depth != sk_depth:
        raise ValueError(
            f"cms_estimate depth={depth} != sketch depth {sk_depth}"
        )
    if int(meta.bmax) >= width:
        raise ValueError(
            f"cms_estimate width={width} smaller than sketch bucket "
            f"{int(meta.bmax)} — probe width must match cms_build width"
        )
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("ps")
    keyed = (
        probes.select(F.col(tok_col).alias("_tok"))
        .distinct()
        .select("_tok", rows)
        .withColumn(
            "pb", cms_bucket(F.col("_tok"), F.col("ps"), width)
        )
    )
    # LEFT join + coalesce(0): a sketch CELL that was never touched
    # holds an implicit zero — an inner join would silently drop (or
    # overestimate from the remaining cells) a probe token the corpus
    # never contained, whose correct estimate is exactly 0.
    hit = keyed.join(
        F.broadcast(sketch),
        (F.col("ps") == F.col("s")) & (F.col("pb") == F.col("b")),
        "left",
    )
    return (
        hit.groupBy("_tok")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
        .select(F.col("_tok").alias(tok_col), "cms_est")
    )


def qsketch_build(
    df: DataFrame, value_col: str, id_expr: Column, *, k: int = 512
) -> DataFrame:
    """Quantile sketch = the k rows with the SMALLEST md5(id) — a
    deterministic uniform row sample (md5 of a unique row identity is
    a fixed random permutation of the rows, so its bottom-k is a
    simple random sample without replacement). Columns: ``qk`` (the
    hash key, kept so sketches can merge) and ``qv`` (the value as
    double).

    Why this shape: Hive's percentile_approx carries a histogram UDAF
    (``ql/.../udf/generic/GenericUDAFPercentileApprox.java``) whose
    estimates are non-deterministic under partitioning; the bottom-k
    sample gives the two properties a 100 TB pipeline actually needs
    — MERGEABLE (merge = union + re-bottom-k, associative and
    commutative, so per-day/per-shard sketches collapse) and
    DETERMINISTIC (same data → same sketch on any engine, any
    partitioning — a SQL oracle replays it exactly). Standard rank
    error for a k-sample is O(sqrt(p(1-p)/k)).

    Scale: orderBy(k-limit) plans as TakeOrderedAndProject — a
    bounded heap per partition, then a k-row merge; never a global
    sort, never more than k rows on the driver."""
    keyed = df.select(
        F.md5(id_expr).alias("qk"),
        F.col(value_col).cast("double").alias("qv"),
    )
    return keyed.orderBy("qk").limit(k)


def qsketch_merge(a: DataFrame, b: DataFrame, *, k: int = 512) -> DataFrame:
    """Merge two bottom-k sketches: union, keep the k smallest keys.
    bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) — each side's
    kept set is a superset of its contribution to the global bottom-k
    — so merging shard sketches equals sketching the whole corpus
    (pinned in tests/test_sketches.py)."""
    return a.unionByName(b).orderBy("qk").limit(k)


def qsketch_quantiles(
    sketch: DataFrame, probs: list[float]
) -> DataFrame:
    """One-row quantile estimates from a sketch: exact interpolated
    percentiles OF THE SAMPLE (k rows — trivially cheap). Column per
    prob: ``p<prob*100>`` rounded to 6 places so any engine's linear
    interpolation agrees bit-for-bit."""
    return sketch.agg(
        F.count(F.lit(1)).alias("sample_k"),
        *[
            F.round(F.expr(f"percentile(qv, {p!r})"), 6).alias(
                "p" + str(int(round(p * 100)))
            )
            for p in probs
        ],
    )
