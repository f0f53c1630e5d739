r"""LLM-pipeline queries, round 5: corpus LM quality scoring, Bloom
decontamination, int8 embedding quantization, stratified sampling.

Each pairs a scale-first operator with a DuckDB oracle that
recomputes the semantics from scratch (gram strings, list folds,
window functions) — the operators' hash/bloom/decimal machinery is
an implementation detail the oracle never sees.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import corpus as cp
from ..operators import quality as ql
from ..operators import quantize as qz
from .pipeline2 import _G5, _TOKS
from .registry import register

# Token stream for the text oracles — same tokenizer as
# operators/dedup.words_col (split(lower(text), ' ')), mirroring
# pipeline2's _TOKS fragment.
_WORDS = (
    "SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
    "FROM documents"
)


@register(
    "quality_unigram_bits",
    oracle=f"""
WITH words AS ({_WORDS}),
doc_word AS (
  SELECT doc_id, w, COUNT(*) AS dc FROM words GROUP BY doc_id, w
),
vocab AS (SELECT w, SUM(dc) AS c FROM doc_word GROUP BY w),
tot AS (SELECT SUM(c) AS n_total FROM vocab)
SELECT doc_id,
       CAST(SUM(dc) AS BIGINT) AS n_tokens,
       FLOOR(
         CAST(SUM(CAST(ROUND(-LOG2(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)), 6)
                       AS DECIMAL(38,6)) * dc) AS DOUBLE)
         / CAST(SUM(dc) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS bits_per_token
FROM doc_word JOIN vocab USING (w), tot
GROUP BY doc_id
""",
    category="pipeline",
)
def quality_unigram_bits(spark, t):
    """Unigram-LM quality score (CCNet-style perplexity filter
    signal): mean bits/token of each doc under the corpus's own
    unigram distribution (operators/quality.unigram_logprob).
    DECIMAL-accumulated log terms keep both engines' sums exact and
    order-independent."""
    return ql.unigram_logprob(t.documents, "doc_id", "text")


@register(
    "decontaminate_bloom_prefilter",
    oracle=f"""
WITH toks AS ({_TOKS}),
grams AS (
  SELECT doc_id, source, list_distinct({_G5}) AS g FROM toks
),
ev AS (
  SELECT DISTINCT gram
  FROM (SELECT unnest(g) AS gram FROM grams WHERE source = 'src0')
),
evl AS (SELECT list(gram) AS egrams FROM ev)
SELECT doc_id,
       CAST(len(g) AS BIGINT) AS n_grams,
       CAST(len(list_intersect(g, egrams)) AS BIGINT) AS n_matched,
       ROUND(CAST(len(list_intersect(g, egrams)) AS DOUBLE) / len(g), 6)
         AS contamination,
       CAST(len(list_intersect(g, egrams)) AS DOUBLE) / len(g) >= 0.5
         AS is_contaminated
FROM grams, evl
WHERE source <> 'src0' AND len(g) > 0
""",
    category="pipeline",
)
def decontaminate_bloom_prefilter(spark, t):
    """Bloom-prefiltered decontamination
    (operators/corpus.decontaminate_bloom): a 128 KiB filter built
    from the eval set's gram hashes discards non-matching corpus
    grams map-side; the surviving sliver is confirmed with an exact
    semi join, so the result is identical to exact decontamination —
    which is exactly what the oracle computes, on gram STRINGS. The
    scale story: the exact eval hash table can outgrow broadcast
    (10⁸ grams); the Bloom cannot."""
    d = t.documents
    return cp.decontaminate_bloom(
        d.filter(F.col("source") != "src0"),
        d.filter(F.col("source") == "src0"),
        k=5,
        threshold=0.5,
    ).select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_matched").cast("bigint").alias("n_matched"),
        "contamination",
        "is_contaminated",
    )


@register(
    "emb_int8_quantize",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
s AS (
  SELECT vec_id, e,
         GREATEST(list_aggregate(list_transform(e, x -> ABS(x)), 'max')
                  / 127.0, 1e-30) AS scale
  FROM v
),
q AS (
  SELECT vec_id, e, scale,
         list_transform(e, x -> CAST(ROUND(x / scale) AS INTEGER)) AS qv
  FROM s
),
dq AS (
  SELECT vec_id, e, scale, qv,
         list_transform(qv, x -> x * scale) AS d
  FROM q
)
SELECT vec_id,
       ROUND(scale, 8) AS scale,
       CAST(len(list_filter(qv, x -> ABS(x) = 127)) AS INTEGER)
         AS n_saturated,
       ROUND(list_aggregate(
               list_transform(list_zip(e, d), z -> ABS(z[1] - z[2])), 'max'),
             8) AS max_abs_err,
       ROUND(
         list_reduce(list_transform(list_zip(e, d), z -> z[1] * z[2]),
                     (x, y) -> x + y)
         / ( SQRT(list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y))
           * SQRT(list_reduce(list_transform(d, x -> x * x), (x, y) -> x + y))),
         8) AS cos_dequant
FROM dq
""",
    category="pipeline",
)
def emb_int8_quantize(spark, t):
    """Symmetric per-vector int8 quantization audit
    (operators/quantize.quantize_int8_stats): scale, saturation
    count, max reconstruction error, cosine(original, dequantized).
    Map-only JVM array expressions; the oracle replays the exact
    arithmetic with DuckDB list functions."""
    return qz.quantize_int8_stats(t.embeddings, "vec_id", "embedding")


@register(
    "sample_stratified",
    oracle="""
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 10
""",
    category="pipeline",
)
def sample_stratified(spark, t):
    """Deterministic stratified sampling: 10 docs per ``source``
    stratum, chosen by md5(doc_id) order — reproducible on any
    engine/cluster (no RNG state, unlike TABLESAMPLE), evenly spread
    because md5 scrambles insertion order. One hash shuffle on the
    stratum key; rank pushdown (WindowGroupLimit) keeps the top-10
    heap map-side, so the exchange carries ≤10 rows per stratum per
    input partition at any corpus size."""
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        t.documents.select("source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


@register(
    "dedup_jaccard_prefix",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)])
              ELSE [] END AS s
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
             6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(a.s) > 0 AND len(b.s) > 0
  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
""",
    category="pipeline",
)
def dedup_jaccard_prefix(spark, t):
    """EXACT Jaccard similarity self-join via prefix filtering
    (operators/dedup.jaccard_prefix_pairs — AllPairs/PPJoin family):
    the deterministic complement to MinHash-LSH with a pruning
    GUARANTEE instead of probabilistic recall. Candidates must share
    one of each doc's rarest-token prefix; the oracle is the O(N²)
    brute force — results must be identical."""
    from ..operators import dedup as dd

    return dd.jaccard_prefix_pairs(
        t.documents, "doc_id", "text", threshold=0.6
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "text_compression_ratio",
    oracle=None,  # DEFLATE has no SQL twin — rows-only; values pinned
    # in tests/test_corpus.py on fixed strings.
    category="pipeline",
)
def text_compression_ratio(spark, t):
    """zlib compression-ratio quality signal
    (operators/quality.compression_ratio): entropy proxy — repetitive
    machine text compresses low, natural text sits mid-range. Arrow-
    batched pandas UDF; deterministic at fixed level 6."""
    from ..operators import quality as q

    return q.compression_ratio(t.documents, "doc_id", "text")


@register(
    "quality_bigram_bits",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i) s
  WHERE len(w) >= 2
),
doc_gram AS (
  SELECT doc_id, w1, w2, COUNT(*) AS dc FROM grams GROUP BY doc_id, w1, w2
),
bigrams AS (SELECT w1, w2, SUM(dc) AS c12 FROM doc_gram GROUP BY w1, w2),
context AS (SELECT w1, SUM(c12) AS c1 FROM bigrams GROUP BY w1)
SELECT doc_id,
       CAST(SUM(dc) AS BIGINT) AS n_bigrams,
       FLOOR(
         CAST(SUM(CAST(ROUND(-LOG2(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)),
                             6) AS DECIMAL(38,6)) * dc) AS DOUBLE)
         / CAST(SUM(dc) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS bits_per_bigram
FROM doc_gram JOIN bigrams USING (w1, w2) JOIN context USING (w1)
GROUP BY doc_id
""",
    category="pipeline",
)
def quality_bigram_bits(spark, t):
    """Bigram-LM quality score (operators/quality.bigram_logprob):
    mean conditional bits per bigram under the corpus's own MLE
    bigram model — the order-sensitive signal unigram bits can't
    see (scrambled boilerplate keeps its unigram score but spikes
    here). DECIMAL-accumulated rounded log terms keep both engines'
    sums exact and order-independent."""
    return ql.bigram_logprob(t.documents, "doc_id", "text")
