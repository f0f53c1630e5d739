"""Term-based retrieval: TF-IDF / BM25 scoring over the documents
table — the lexical complement of operators/similarity.py's embedding
ANN (SURVEY §2.14 similarity-search extension).

Scale shape (100 TB corpus, small query set):
- Per-doc term frequencies are one explode + keyed partial agg —
  the shuffle carries (doc, term, tf), collapsed map-side.
- Document frequencies reuse the same table: groupBy(term) partial
  agg — one row per distinct term.
- Corpus scalars (N, average doc length) are single-row aggregates
  broadcast via crossJoin, NOT an empty-frame window (which would
  funnel the corpus through one partition).
- The query side is tiny by construction → broadcast hash join on
  term; the corpus table never shuffles for scoring, only the
  (doc, query) partial sums do.

Everything is built-in expressions; ln() runs JVM-side and the final
score is rounded so cross-engine libm ulp noise cannot surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import words_col

# Single-slot persisted term index (same bounded-cache contract as
# dedup._last_shingles): the tf table feeds three consumers (corpus
# scalars, document frequencies, scoring) — without the persist each
# one re-runs the tokenize+explode+agg chain. The previous persisted
# index is dropped on the next build.
_last_tf: DataFrame | None = None


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl): per-document term counts + doc length."""
    from .util import ensure_parallelism

    words = ensure_parallelism(df).select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = words.groupBy(id_col).agg(F.count("*").alias("dl"))
    return tf.join(dl, id_col)


def bm25_scores(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every corpus doc for every query (docs
    sharing at least one term). Robertson/Spärck Jones BM25 with the
    +1 idf floor (as in Lucene): idf = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Returns (query_id, doc_id, score) with score rounded to 4 dp.
    """
    global _last_tf
    if _last_tf is not None:
        _last_tf.unpersist()
    tf = term_frequencies(corpus, id_col, text_col).persist()
    _last_tf = tf
    stats = corpus.select(
        F.count("*").alias("n_docs")
    ).crossJoin(
        tf.select(id_col, "dl")
        .distinct()
        .select(F.avg("dl").alias("avgdl"))
    )
    q_terms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(words_col(F.col(text_col)))).alias("term"),
    )
    # Document frequencies over the WHOLE corpus, but narrowed to the
    # query vocabulary before broadcast — a full (term, df) table is
    # millions of rows at corpus scale and must never be broadcast
    # (same mistake class as round-1's forced broadcast(customer)).
    df_t = (
        tf.join(F.broadcast(q_terms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf") * (k1 + 1)
    ) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            query_id_col,
            id_col,
            (idf * tf_part).alias("contrib"),
        )
    )
    return scored.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("contrib"), 4).alias("score")
    )
