"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (BASELINE.json north-star): nearest
neighbors for near-dup mining / retrieval over an embeddings table.

Two paths:

- ``cosine_topk``: exact brute-force top-k — the correctness
  baseline. Query×corpus join; per-pair math stays inside codegen
  (zip_with fold, no Python). Top-k via per-partition window.
- ``lsh_bucket_topk``: random-hyperplane (sign-LSH) bucketed search —
  the 100 TB path. Each vector hashes to a bucket by the signs of h
  deterministic pseudo-random projections; only same-bucket pairs are
  scored. Recall < 1 by construction (probed in tests, not the
  oracle gate).

Determinism: dot/norm sums are sequential left folds over the array
(arrays live whole inside one row), so results are bit-identical to
the DuckDB oracle at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

def _dsum_arr(arr: Column) -> Column:
    """Sequential left-fold sum of a double array. Arrays are
    per-row (never split across partitions), so the fold order is
    fixed → bit-identical to DuckDB's list_reduce left fold."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot_col(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _dsum_arr(prods)


def norm_col(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(_dsum_arr(sq))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    (query_id, neighbor_id, rank, cosine); self-pairs excluded.
    The corpus side is the big side — Spark broadcasts the (small)
    query side; ranking is a bounded per-query window.
    """
    from .util import ensure_parallelism

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # Per-pair fold math is the CPU cost — split the big side wide.
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(vec: Column, *, dim: int, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id from n deterministic pseudo-random
    hyperplanes. Plane j's component i is a zero-mean value derived
    from xxhash64(j, i) — reproducible on any cluster, no RNG state."""
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        comps = F.array(
            *[
                (F.xxhash64(F.lit(j), F.lit(i)) % 1000).cast("double")
                for i in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(vec, comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        )
    return bucket


def lsh_bucket_topk(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    k: int = 5,
) -> DataFrame:
    """Approximate all-pairs top-k: score only same-bucket pairs.
    2^n_planes buckets shrink the pair space ~2^n_planes-fold; the
    bucket join shuffles on bucket id (AQE splits skewed buckets)."""
    from .util import ensure_parallelism

    withb = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        hyperplane_bucket(F.col(vec_col), dim=dim, n_planes=n_planes).alias(
            "_bucket"
        ),
    )
    a = withb.select(
        F.col("_id").alias("query_id"),
        F.col("_vec").alias("q_vec"),
        "_bucket",
    )
    b = withb.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_vec").alias("c_vec"),
        "_bucket",
    )
    scored = (
        a.join(b, "_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )
