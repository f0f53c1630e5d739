"""Hashing-trick featurization + inverted-index sparse cosine
(operators/features.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp2_5_hive_spark.operators.features import (
    hash_token_features,
    sparse_cosine_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "an entirely different sentence about spark plans"),
        (4, "the quick brown fox naps under the lazy dog"),   # near dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_features_counts(spark, docs):
    sp = hash_token_features(docs, "doc_id", "text", dim=32)
    per_doc = {
        r.doc_id: r.total
        for r in sp.groupBy("doc_id").agg(F.sum("cnt").alias("total")).collect()
    }
    # Bucket counts must sum to the token count of each doc.
    assert per_doc == {1: 9, 2: 9, 3: 7, 4: 9}
    # Identical docs hash to identical sparse vectors.
    v1 = {(r.bucket, r.cnt) for r in sp.filter("doc_id = 1").collect()}
    v2 = {(r.bucket, r.cnt) for r in sp.filter("doc_id = 2").collect()}
    assert v1 == v2


def test_cosine_identical_docs_is_one(spark, docs):
    sp = hash_token_features(docs, "doc_id", "text", dim=64)
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_cosine_pairs(sp, "doc_id", threshold=0.0).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0, abs=1e-12)
    # near-dup scores above the unrelated pair
    assert pairs[(1, 4)] > pairs.get((1, 3), 0.0)
    assert pairs[(1, 4)] < 1.0


def test_bucket_df_cut_drops_hot_buckets(spark):
    # 'stop' appears in every doc -> its bucket df = 3 > max_bucket_df=2
    rows = [(1, "stop alpha"), (2, "stop beta"), (3, "stop gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sp = hash_token_features(docs, "doc_id", "text", dim=512)
    with_cut = sparse_cosine_pairs(
        sp, "doc_id", threshold=0.0, max_bucket_df=2
    ).collect()
    without = sparse_cosine_pairs(sp, "doc_id", threshold=0.0).collect()
    # Without the cut every pair shares the 'stop' bucket; with it,
    # no pair shares any bucket (alpha/beta/gamma all distinct).
    assert len(without) == 3
    assert len(with_cut) == 0
