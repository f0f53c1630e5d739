"""Distributed logistic regression (operators/logreg): pinned
against a sequential numpy reference, partition-invariant, and
actually learns (en-vs-rest above majority baseline on holdout)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hdp2_5_hive_spark.operators import logreg

DIM = 64


def _featurized(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = logreg.dense_hash_features(docs, "doc_id", "text", dim=DIM)
    return feats.join(
        docs.select("doc_id", (F.col("lang") == "en").cast("double").alias("label")),
        "doc_id",
    )


def _reference_gd(X, y, rounds, lr, l2):
    w, b = np.zeros(X.shape[1]), 0.0
    n = len(y)
    for _ in range(rounds):
        z = X @ w + b
        p = 1 / (1 + np.exp(-z))
        err = p - y
        w -= lr * ((X.T @ err) / n + l2 * w)
        b -= lr * float(err.sum()) / n
    return w, b


def test_matches_sequential_reference_and_partition_invariant(spark, sf_dir):
    data = _featurized(spark, sf_dir)
    w1, b1, loss1 = logreg.train_logreg(
        data.repartition(3), dim=DIM, n_rounds=15, lr=0.5, l2=1e-4
    )
    w2, b2, _ = logreg.train_logreg(
        data.repartition(13), dim=DIM, n_rounds=15, lr=0.5, l2=1e-4
    )
    assert np.allclose(w1, w2, atol=1e-8) and abs(b1 - b2) < 1e-8

    rows = data.collect()
    X = np.asarray([list(r.features) for r in rows])
    y = np.asarray([r.label for r in rows])
    wr, br = _reference_gd(X, y, 15, 0.5, 1e-4)
    assert np.allclose(w1, wr, atol=1e-6), np.abs(w1 - wr).max()
    assert abs(b1 - br) < 1e-6
    assert np.isfinite(loss1)


def test_learns_planted_distribution_on_holdout(spark):
    """Two overlapping word distributions (logreg.planted_corpus —
    the testdata lang label is text-independent, so learnability
    needs a planted corpus): holdout accuracy must clear 0.85,
    far above the 0.5 majority."""
    docs = spark.createDataFrame(
        logreg.planted_corpus(), "doc_id long, text string, label double"
    )
    feats = logreg.dense_hash_features(docs, "doc_id", "text", dim=DIM)
    data = feats.join(docs.select("doc_id", "label"), "doc_id")
    # %8<=1 holdout carries BOTH classes (labels are doc_id % 2;
    # a %4==0 holdout is all-label-0 and an always-0 predictor
    # would ace it)
    train = data.filter(F.col("doc_id") % 8 >= 2)
    test = data.filter(F.col("doc_id") % 8 <= 1)
    w, b, loss = logreg.train_logreg(train, dim=DIM, n_rounds=60, lr=1.0)
    scored = logreg.predict(test, w, b)
    r = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("score") > 0.5).cast("double") == F.col("label"))
              .cast("long")).alias("correct"),
    ).first()
    acc = r.correct / r.n
    assert acc >= 0.85, (acc, loss)
    assert loss < 0.6
