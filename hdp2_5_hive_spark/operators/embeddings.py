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
    part_schema = StructType(
        [
            StructField("n", FloatType()),
            StructField("sum", ArrayType(FloatType())),
            StructField("xtx", ArrayType(FloatType())),
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
