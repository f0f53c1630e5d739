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
        # self-describing width: cms_estimate validates its probe
        # width against this, closing the mis-address hole the bmax
        # heuristic can't (probing WIDER than the build passes
        # bmax < width yet addresses different cells)
        .withColumn("w", F.lit(width))
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
    aggs = [F.max("s").alias("smax"), F.max("b").alias("bmax")]
    has_w = "w" in sketch.columns
    if has_w:
        aggs.append(F.max("w").alias("wmax"))
    meta = sketch.agg(*aggs).collect()[0]
    if meta.smax is None:
        raise ValueError("cms_estimate: empty sketch")
    sk_depth = int(meta.smax) + 1
    if depth is None:
        depth = sk_depth
    elif depth != sk_depth:
        raise ValueError(
            f"cms_estimate depth={depth} != sketch depth {sk_depth}"
        )
    if has_w and meta.wmax is not None and width != int(meta.wmax):
        # exact check when the sketch declares its build width —
        # catches probing WIDER as well as narrower (the bmax
        # heuristic below only catches narrower)
        raise ValueError(
            f"cms_estimate width={width} != sketch build width "
            f"{int(meta.wmax)}"
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


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS sketches: SUM per (s, b) cell — associative and
    commutative, the mergeability that makes it a sketch. Both sides
    must have been built with the same depth/width; the declared
    width travels with the merged sketch (max is safe: widths are
    constant per side and validated equal here)."""
    if ("w" in a.columns) != ("w" in b.columns):
        raise ValueError("cms_merge: one sketch declares width, one not")
    if "w" in a.columns:
        wa = a.agg(F.max("w")).collect()[0][0]
        wb = b.agg(F.max("w")).collect()[0][0]
        if wa is not None and wb is not None and wa != wb:
            raise ValueError(
                f"cms_merge: sketch widths differ ({wa} vs {wb})"
            )
        u = a.select("s", "b", "c", "w").unionByName(
            b.select("s", "b", "c", "w")
        )
        return (
            u.groupBy("s", "b", "w")
            .agg(F.sum("c").alias("c"))
            .select("s", "b", "c", "w")
        )
    u = a.select("s", "b", "c").unionByName(b.select("s", "b", "c"))
    return u.groupBy("s", "b").agg(F.sum("c").alias("c"))


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


def mg_summaries(
    tokens: DataFrame, tok_col: str, *, k: int = 64
) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter summaries (Misra &
    Gries 1982; merge rule from Agarwal et al. 2013 "Mergeable
    Summaries", public): each partition reduces its token stream to
    AT MOST ``k`` (token, c) counters satisfying the MG invariant

        true_p(x) - n_p/(k+1)  <=  c_p(x)  <=  true_p(x)

    (absent tokens count as c_p = 0). The batched update IS the
    mergeable-summaries MERGE op: add a batch's exact counts, then if
    more than k counters remain subtract the (k+1)-th largest value
    from all and drop the non-positive — each such subtraction
    removes weight from >= k+1 counters at once, which is what bounds
    the total undercount by n_p/(k+1).

    Scale shape: ONE pass over each partition inside an Arrow batch
    iterator (mapInPandas), O(k) state per partition, <= k output
    rows per partition — the classic "combiner that never spills".
    The global merge is a plain SUM groupBy over <= k * n_partitions
    rows (see mg_merge); summed counters keep the invariant with the
    error bounds ADDING, so the merged error is <= N/(k+1) however
    the stream was partitioned. The reference's closest analogue is
    hive.groupby.skewindata's two-stage partial aggregation
    (``ql/.../GroupByOperator.java`` hash-side flush) — MG replaces
    the unbounded partial hash with a provably bounded one."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("token", StringType()),
            StructField("c", LongType()),
        ]
    )

    def summarize(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            col = pdf[tok_col].dropna()
            for tok, cnt in col.value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                m = vals[k]  # (k+1)-th largest counter value
                counters = {
                    t: c - m for t, c in counters.items() if c > m
                }
        if counters:
            yield pd.DataFrame(
                {
                    "token": list(counters.keys()),
                    "c": list(counters.values()),
                }
            )

    return tokens.select(F.col(tok_col).alias(tok_col)).mapInPandas(
        summarize, schema
    )


def mg_merge(summaries: DataFrame) -> DataFrame:
    """Merge per-partition MG summaries by plain SUM per token.
    Summed counters satisfy  true(x) - N/(k+1) <= c(x) <= true(x)
    (per-partition undercounts add to at most sum n_p/(k+1)); every
    token with true count > N/(k+1) therefore survives with c > 0.
    One keyed aggregate over <= k rows per partition — KBs of data
    regardless of stream size."""
    return summaries.groupBy("token").agg(F.sum("c").alias("c"))


def mg_topk(merged: DataFrame, n: int) -> DataFrame:
    """Top-n counters from a merged summary, largest first (ties by
    token for determinism). TakeOrderedAndProject — bounded heaps,
    never a global sort."""
    return merged.orderBy(F.col("c").desc(), "token").limit(n)
