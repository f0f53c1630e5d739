"""Distributed one-pass PCA vs in-memory numpy PCA: identical
components (same covariance, same eigendecomposition, canonical
signs), variance ordering, orthonormality, projection accuracy."""

from __future__ import annotations

import numpy as np

from hdp2_5_hive_spark.operators import embeddings as emb


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = (x.T @ x) / x.shape[0] - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order] / evals.sum()


def test_pca_matches_inmemory_reference(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = np.asarray(
        [np.asarray(r.embedding, dtype=np.float64) for r in df.collect()]
    )
    mean, comps, ratio = emb.pca_train(df, "embedding", k=8)
    m2, c2, r2 = _numpy_pca(x, k=8)
    assert np.allclose(mean, m2, atol=1e-9)
    # same subspace, same order, same signs (up to fp tolerance)
    assert np.allclose(np.abs(comps @ c2.T), np.eye(8), atol=1e-6)
    assert np.allclose(ratio, r2, atol=1e-9)


def test_pca_components_orthonormal_and_variance_ordered(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, comps, ratio = emb.pca_train(df, "embedding", k=8)
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-9)
    assert all(ratio[i] >= ratio[i + 1] - 1e-12 for i in range(7))
    assert (ratio > 0).all()


def test_pca_project_variance_concentrates(spark, sf_dir):
    """Projected dim 0 carries the most variance; projection of the
    mean vector is ~0."""
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mean, comps, _ = emb.pca_train(df, "embedding", k=4)
    proj = emb.pca_project(df, mean, comps)
    p = np.asarray([np.asarray(r.proj) for r in proj.collect()])
    assert p.shape[1] == 4
    variances = p.var(axis=0)
    assert variances[0] == max(variances)
    assert abs(p.mean(axis=0)).max() < 1e-3  # centered


def test_pca_partition_invariant(spark, sf_dir):
    """Repartitioning must not change the learned components beyond
    fp tolerance (partials combine associatively)."""
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, c1, _ = emb.pca_train(df, "embedding", k=4)
    _, c2, _ = emb.pca_train(df.repartition(17), "embedding", k=4)
    assert np.allclose(np.abs(c1 @ c2.T), np.eye(4), atol=1e-6)
