"""Text featurization: hashing-trick bag-of-words (sparse term
vectors) and inverted-index sparse cosine similarity.

The "hashing trick" (Weinberger et al. 2009, public; also Spark
MLlib's HashingTF) maps each token to one of ``dim`` buckets by
hashing, making the feature space fixed-width with no vocabulary
build — the standard first featurization of a large text corpus.
Here the hash is md5-prefix mod dim, because BOTH engines (Spark and
any SQL oracle) implement md5 identically — the whole pipeline stays
hash-checkable end-to-end, unlike xxhash/murmur whose seeds differ
across engines.

Scale notes (100 TB):
- Featurization is explode → one hash shuffle on (doc, bucket) —
  the same shape as word count; no vocabulary broadcast, no driver
  state, works identically at any corpus size.
- Similarity uses the INVERTED-INDEX join: sparse vectors meet on
  their bucket ids, so a pair of documents is compared only if they
  share at least one bucket — never an all-pairs product. Dot
  products come from one groupBy over the co-bucket rows. This is
  the classic scalable sparse-similarity shape (each posting list
  joins only against itself); a hot bucket (stopword-like token) is
  the skew risk, which ``min_df``-style bucket pruning caps.

Reference: Hive exposes no featurization; the reference corpus uses
n-gram UDAFs (``ql/udf/generic/GenericUDAFnGrams.java``) for term
statistics. This module is part of the training-data-pipeline
surface SURVEY §6 adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import words_col


def md5_bucket(col: Column, dim: int) -> Column:
    """Engine-portable hash bucket: first 8 hex chars of md5 as an
    integer, mod ``dim``. Any SQL engine reproduces this exactly."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % dim
    )


def hash_token_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 64,
) -> DataFrame:
    """Hashing-trick sparse term vector per document: (id, bucket,
    cnt) rows, bucket = md5(token) mod dim, cnt = token occurrences
    hashed into that bucket. One explode + one shuffle."""
    return (
        df.select(
            F.col(id_col),
            F.explode(words_col(F.col(text_col))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy(
            F.col(id_col), md5_bucket(F.col("tok"), dim).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sparse_cosine_pairs(
    sparse: DataFrame,
    id_col: str,
    *,
    threshold: float = 0.5,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """All document pairs with cosine similarity ≥ ``threshold``
    over sparse (id, bucket, cnt) vectors, via the inverted-index
    join: co-bucket rows → partial products → one groupBy for dots,
    norms joined in (both sides shuffle on id — small aggregates).

    ``max_bucket_df`` drops buckets present in more than that many
    documents before the self-join (the df-cut every sparse
    similarity system applies — stopword buckets contribute little
    cosine mass but dominate join cost; at 100 TB this is the dial
    that keeps the hot posting lists bounded).
    """
    s = sparse.select(
        F.col(id_col).alias("_id"), F.col("bucket"), F.col("cnt")
    )
    norms = s.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("norm")
    )
    joinable = s
    if max_bucket_df is not None:
        bucket_df = s.groupBy("bucket").agg(
            F.countDistinct("_id").alias("_bdf")
        )
        joinable = s.join(
            bucket_df.filter(F.col("_bdf") <= max_bucket_df).select("bucket"),
            on="bucket",
            how="inner",
        )
    a = joinable.select(
        F.col("_id").alias("id_a"), "bucket", F.col("cnt").alias("cnt_a")
    )
    b = joinable.select(
        F.col("_id").alias("id_b"), "bucket", F.col("cnt").alias("cnt_b")
    )
    dots = (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("dot"))
    )
    return (
        dots.join(norms.withColumnRenamed("_id", "id_a"), on="id_a")
        .withColumnRenamed("norm", "norm_a")
        .join(norms.withColumnRenamed("_id", "id_b"), on="id_b")
        .withColumnRenamed("norm", "norm_b")
        .select(
            "id_a",
            "id_b",
            (F.col("dot") / (F.col("norm_a") * F.col("norm_b"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )
