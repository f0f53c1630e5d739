"""Embedding-matrix operators: distributed PCA.

Dimensionality reduction is the standard pre-step for embedding
near-dup and ANN at corpus scale (project 64→16 dims before LSH/IVF:
4× less shuffle bytes, denser buckets). The classic scale shape:

- TRAIN: the covariance matrix needs ONE distributed pass. Each
  partition emits (n, Σx, XᵀX) — a d×d partial (64×64 floats, a few
  KB) regardless of row count — via Arrow-batched numpy; partials
  combine on the driver (their count is #partitions, not #rows) and
  a d×d eigendecomposition runs driver-side in microseconds. This is
  the same bounded-driver-work discipline as the IVF trainer
  (operators/similarity.py): driver work scales with d², never with
  corpus size.
- APPLY: projection is a broadcast (k×d) matmul inside mapInPandas —
  map-only, no shuffle.

Determinism: partials are combined in partition order and eigenvector
signs are canonicalized (largest-|component| positive), so the
projection is a pure function of the input — pinned against an
in-memory numpy PCA in tests/test_embeddings_pca.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    StringType,
    StructField,
    StructType,
)


def pca_train(
    df: DataFrame, vec_col: str = "embedding", k: int = 16
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-pass covariance PCA. Returns (mean[d], components[k,d],
    explained_variance_ratio[k]); components are orthonormal rows,
    eigenvalue-descending, sign-canonicalized."""
    # Partials MUST be float64: the kernel computes float64 and a
    # float32 schema would silently truncate every (n, sum, XtX)
    # through Arrow — a partition past 2^24 rows can no longer even
    # count exactly in float32, and the cov = g/n - mean*mean
    # cancellation loses most of its 7 significant digits.
    part_schema = StructType(
        [
            StructField("n", DoubleType()),
            StructField("sum", ArrayType(DoubleType())),
            StructField("xtx", ArrayType(DoubleType())),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, xtx = 0, None, None
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if x.size == 0:
                continue
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            xtx = g if xtx is None else xtx + g
        if n:
            yield pd.DataFrame(
                {
                    "n": [float(n)],
                    "sum": [s.astype(np.float64)],
                    "xtx": [xtx.ravel().astype(np.float64)],
                }
            )

    rows = df.select(vec_col).mapInPandas(partials, part_schema).collect()
    if not rows:
        raise ValueError("pca_train: empty input")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["sum"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:  # #partitions partials — driver work is O(P·d²)
        s += np.asarray(r["sum"], dtype=np.float64)
        g += np.asarray(r["xtx"], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # canonical sign: the largest-|x| coordinate of each component is
    # positive — removes eigh's sign ambiguity across platforms
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ratio = evals[order] / max(evals.sum(), 1e-30)
    return mean, comps, ratio


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, proj[k]): broadcast-matmul projection, map-only."""
    out_schema = StructType(
        [
            StructField("vec_id", StringType()),
            StructField("proj", ArrayType(FloatType())),
        ]
    )
    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            p = (x - mu) @ w.T
            yield pd.DataFrame(
                {
                    "vec_id": [str(v) for v in pdf[id_col]],
                    "proj": [row.astype(np.float32) for row in p],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, out_schema)


# ---------------------------------------------------------------------------
# distributed k-means (full-corpus Lloyd iterations)
# ---------------------------------------------------------------------------


def _kmeans_init(df: DataFrame, vec_col: str, id_col: str, k: int) -> np.ndarray:
    """Deterministic, engine-portable init: the k vectors whose
    md5(id) sorts first — a seeded pseudo-random draw with no RNG
    state (same trick as corpus.shuffle_seeded)."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(k)
        .collect()
    )
    return np.asarray(
        [np.asarray(r[vec_col], dtype=np.float64) for r in rows]
    )


def kmeans_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 10,
    tol: float = 1e-6,
) -> np.ndarray:
    """Full-corpus Lloyd's algorithm. Unlike the IVF quantizer
    (operators/similarity.py — trained on a bounded 2048-row sample),
    every iteration here aggregates over ALL rows: per partition one
    Arrow batch computes nearest centroids (numpy matmul against the
    broadcast (k,d) array) and emits per-centroid (count, Σx)
    partials — k·d floats per partition, independent of row count —
    combined on the driver. Empty clusters keep their old centroid.
    Stops early when the max centroid shift drops below ``tol``.
    Driver work per round: O(P·k·d); rounds are bounded jobs exactly
    like operators/bpe.train_bpe."""
    cent = _kmeans_init(df, vec_col, id_col, k)
    d = cent.shape[1]
    # float64 partials for the same reason as pca_train: float32
    # counts stop being exact integers past 2^24 rows per partition
    part_schema = StructType(
        [
            StructField("cnt", ArrayType(DoubleType())),
            StructField("sums", ArrayType(DoubleType())),
        ]
    )
    base = df.select(vec_col).persist()
    # One count materializes the cache (previously the first round's
    # job paid that implicitly) and right-sizes the n_iter partial
    # jobs to the data (guide §2) — cached plans keep the static
    # shuffle layout, so small vector sets would otherwise schedule
    # n_iter × shuffle.partitions near-empty Arrow tasks. Values are
    # unchanged within the 1e-8 partition-invariance pin
    # (tests/test_embeddings_pca.py): partials still combine in
    # collect (partition) order.
    from .util import right_size_loop_frame

    rows_per_partition = 32768
    n_rows = base.count()
    vecs = right_size_loop_frame(
        base, n_rows, rows_per_partition=rows_per_partition
    )
    try:
        if n_rows <= rows_per_partition:
            # One partition after the coalesce ⇒ the driver's
            # partial-combine is the identity, so run EVERY Lloyd
            # round next to the data in one task — same per-batch
            # accumulation order, same centroid-update and tol
            # arithmetic, bit-identical centroids — instead of
            # n_iter collect round-trips (the logreg
            # _single_partition_loop discipline). Multi-partition
            # data still takes the distributed path below.
            c0 = cent

            def whole_loop(
                batches: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                mats = []
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    mats.append(
                        np.asarray(
                            [
                                np.asarray(v, dtype=np.float64)
                                for v in pdf[vec_col]
                            ]
                        )
                    )
                cen = c0
                for _ in range(n_iter):
                    cnt = np.zeros(len(cen))
                    sums = np.zeros((len(cen), d))
                    for x in mats:
                        dist = -2.0 * (x @ cen.T) + (cen * cen).sum(axis=1)
                        a = dist.argmin(axis=1)
                        for j in range(len(cen)):
                            m = a == j
                            if m.any():
                                cnt[j] += int(m.sum())
                                sums[j] += x[m].sum(axis=0)
                    new = cen.copy()
                    nz = cnt > 0
                    new[nz] = sums[nz] / cnt[nz, None]
                    shift = float(np.abs(new - cen).max())
                    cen = new
                    if shift < tol:
                        break
                yield pd.DataFrame({"cent": [cen.ravel()]})

            out = vecs.mapInPandas(
                whole_loop,
                StructType([StructField("cent", ArrayType(DoubleType()))]),
            ).collect()
            return np.asarray(out[0]["cent"], dtype=np.float64).reshape(
                cent.shape
            )
        for _ in range(n_iter):
            c = cent  # capture for the closure

            def partials(
                batches: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                cnt = np.zeros(len(c))
                sums = np.zeros((len(c), d))
                any_rows = False
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    any_rows = True
                    x = np.asarray(
                        [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                    )
                    # ||x-c||² argmin via the expanded form; x² is
                    # constant per row so argmin needs only -2xc + c²
                    dist = -2.0 * (x @ c.T) + (c * c).sum(axis=1)
                    a = dist.argmin(axis=1)
                    for j in range(len(c)):
                        m = a == j
                        if m.any():
                            cnt[j] += int(m.sum())
                            sums[j] += x[m].sum(axis=0)
                if any_rows:
                    yield pd.DataFrame(
                        {"cnt": [cnt.astype(np.float64)],
                         "sums": [sums.ravel().astype(np.float64)]}
                    )

            rows = vecs.mapInPandas(partials, part_schema).collect()
            cnt = np.zeros(len(c))
            sums = np.zeros((len(c), d))
            for r in rows:
                cnt += np.asarray(r["cnt"], dtype=np.float64)
                sums += np.asarray(r["sums"], dtype=np.float64).reshape(
                    len(c), d
                )
            new = cent.copy()
            nz = cnt > 0
            new[nz] = sums[nz] / cnt[nz, None]
            shift = float(np.abs(new - cent).max())
            cent = new
            if shift < tol:
                break
    finally:
        base.unpersist()
    return cent


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, sq_dist): broadcast nearest-centroid assignment,
    map-only."""
    c = np.asarray(centroids, dtype=np.float64)
    out_schema = StructType(
        [
            StructField("vec_id", StringType()),
            StructField("cluster", FloatType()),
            StructField("sq_dist", FloatType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": [str(v) for v in pdf[id_col]],
                    "cluster": a.astype(np.float64),
                    "sq_dist": d2[np.arange(len(a)), a].astype(np.float64),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, out_schema).select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.col("sq_dist").cast("double").alias("sq_dist"),
    )
