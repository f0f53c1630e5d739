r"""LLM-pipeline queries, round 5 part 2: repeated-span dedup
statistics, temperature-weighted domain mixing, seeded deterministic
corpus shuffle, MinHash fuzzy decontamination, and perceptual-hash
image near-dup.

Beyond-reference operators under the training-data-pipeline mandate
(HDP 2.5 Hive has none of these — SURVEY §6): each pairs a
scale-first Spark plan with a DuckDB oracle that re-derives the
semantics from portable primitives (string grams, md5, window
interval arithmetic); hash-bucket internals (xxhash64, pHash) stay
implementation details the oracle never sees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import corpus as cp
from ..operators import dedup as dd
from ..operators import phash as ph
from .registry import register


@register(
    "corpus_span_dedup",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+15], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 14)) AS i) s
  WHERE len(t) >= 16
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
cov AS (
  SELECT doc_id, pos,
         MAX(pos + 16) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_end
  FROM hits
),
agg AS (
  SELECT doc_id,
         SUM(GREATEST(0, pos + 16 - GREATEST(COALESCE(prev_end, pos), pos)))
           AS dup_tokens
  FROM cov GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       ROUND(CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE) / len(d.t), 6)
         AS dup_ratio
FROM toks d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
""",
    category="pipeline",
)
def corpus_span_dedup(spark, t):
    """Duplicated-span coverage per document (substring-level dedup
    signal, Lee et al. 2022): tokens inside any 16-gram occurring ≥2
    times corpus-wide. Spark flags grams by 8-byte hash and unions
    intervals with a per-doc running-max window (operators/
    corpus.span_dup_stats); the oracle recomputes with literal gram
    strings and the same window arithmetic — positions are 0-based in
    Spark, 1-based in the oracle, and the coverage algebra is
    translation-invariant so results agree exactly."""
    return cp.span_dup_stats(t.documents, "doc_id", "text", k=16).orderBy(
        "doc_id"
    )


@register(
    "corpus_mix_temperature",
    oracle="""
WITH counts AS (
  SELECT source AS domain, COUNT(*) AS n_docs FROM documents GROUP BY source
),
wa AS (
  SELECT domain, n_docs,
         CAST(ROUND(POW(CAST(n_docs AS DOUBLE), 0.5), 6) AS DECIMAL(38,6)) AS w
  FROM counts
),
tot AS (SELECT SUM(w) AS tw FROM wa)
SELECT domain,
       CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS weight,
       CAST(FLOOR(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) * 100000) AS BIGINT)
         AS target_docs
FROM wa, tot
ORDER BY domain
""",
    category="pipeline",
)
def corpus_mix_temperature(spark, t):
    """Temperature-weighted domain mixing plan (mT5/XLM-R recipe:
    weight ∝ count^α, α=0.5 up-weights rare domains) with integer
    budget allocation. DECIMAL-accumulated normalizer keeps both
    engines' weight sums exact and order-independent
    (operators/corpus.mix_temperature)."""
    return cp.mix_temperature(
        t.documents, "source", alpha=0.5, budget=100_000
    ).orderBy("domain")


@register(
    "corpus_shuffle_seeded",
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         md5('shuffle-v1' || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
),
sharded AS (
  SELECT doc_id, skey,
         CAST(CAST('0x' || substr(skey, 1, 8) AS BIGINT) % 8 AS INT) AS shard
  FROM keyed
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY skey, doc_id) - 1
            AS BIGINT) AS pos
FROM sharded
ORDER BY shard, pos
""",
    category="pipeline",
)
def corpus_shuffle_seeded(spark, t):
    """Deterministic seeded global shuffle for training order:
    md5(seed||id) → shard + rank-within-shard. Reproducible on any
    engine and any partitioning — the permutation IS the hash, no RNG
    state (operators/corpus.shuffle_seeded). One hash shuffle + one
    per-shard window; never a global single-partition sort."""
    return cp.shuffle_seeded(
        t.documents, "doc_id", seed="shuffle-v1", n_shards=8
    ).orderBy("shard", "pos")


@register(
    "decontaminate_fuzzy_minhash",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, string_split(lower(text), ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id, source,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)])
              ELSE [] END AS s
  FROM toks
),
pairs AS (
  SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
  FROM sh a JOIN sh b ON a.source <> 'src0' AND b.source = 'src0'
  WHERE len(a.s) + len(b.s) > 0
)
SELECT train_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_eval_matches,
       MAX(jaccard) AS max_jaccard
FROM pairs WHERE jaccard >= 0.5
GROUP BY train_id ORDER BY doc_id
""",
    category="pipeline",
)
def decontaminate_fuzzy_minhash(spark, t):
    """FUZZY test-set decontamination: training docs near-duplicating
    an eval doc at Jaccard ≥ 0.5 — catches paraphrased/whitespace-
    mangled benchmark leakage that exact/Bloom gram matching
    (decontaminate_eval_overlap) misses. Spark reuses the MinHash-LSH
    candidate machinery (one banded bucket join between corpus sides,
    never train×eval all-pairs) with exact Jaccard confirm; the
    oracle brute-forces all cross-side pairs. 'src0' documents play
    the eval suite."""
    docs = t.documents
    pairs = dd.near_duplicate_pairs(
        docs, "doc_id", "text", threshold=0.5
    )
    side = docs.select("doc_id", (F.col("source") == "src0").alias("is_eval"))
    a = side.select(
        F.col("doc_id").alias("id_a"), F.col("is_eval").alias("eval_a")
    )
    b = side.select(
        F.col("doc_id").alias("id_b"), F.col("is_eval").alias("eval_b")
    )
    crossed = (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .filter(F.col("eval_a") != F.col("eval_b"))
        .select(
            F.when(F.col("eval_a"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("doc_id"),
            "jaccard",
        )
    )
    return (
        crossed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_phash_dedup",
    oracle=None,  # pHash bit patterns have no SQL twin → rows-only;
    # locality, format-invariance, and planted-group recovery are
    # pinned in tests/test_phash.py.
    category="pipeline",
)
def multimodal_phash_dedup(spark, t):
    """Perceptual-hash image near-dup over a deterministic synthetic
    media corpus: documents are assigned images in constant-size
    groups of ~12 (same base raster per group, one slightly-brightened
    pixel per member — a re-encode/thumbnail stand-in; constant group
    size keeps the true-pair count linear in corpus size), then
    decode → 64-bit
    DCT pHash (Arrow-batched mapInPandas) → 16-bit-banded bucket join
    → exact Hamming ≤ 6 (operators/phash.py). Returns the near-dup
    pair list; byte-level exact dedup finds NONE of these pairs
    (every payload differs)."""
    media = _synthesize_grouped_media(t.documents)
    hashes = ph.phash_table(media)
    return ph.phash_near_pairs(hashes, max_distance=6).orderBy(
        "id_a", "id_b"
    )


def _synthesize_grouped_media(docs):
    """(doc_id, payload) with planted perceptual near-dup groups:
    base 16×16 raster keyed on doc_id // 12 (constant ~12-member
    groups, so the pair count stays LINEAR in corpus size at any sf),
    per-doc single-pixel brightness tweak so no two payloads are
    byte-identical."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.multimodal import encode_ppm

    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                gid = int(doc_id) // 12
                rng = np.random.RandomState(1000 + gid)
                base = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
                px = base.copy()
                y, x = (int(doc_id) % 12) % 16, (5 * int(doc_id)) % 16
                px[y, x] = (px[y, x].astype(np.int64) + 12) % 256
                ids.append(str(doc_id))
                payloads.append(encode_ppm(16, 16, px.reshape(-1)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(kernel, schema)


@register(
    "corpus_span_mask",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+15], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 14)) AS i) s
  WHERE len(t) >= 16
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
cov AS (
  SELECT DISTINCT g.doc_id, c.p AS pos
  FROM grams g JOIN dup USING (gram),
       LATERAL (SELECT unnest(range(g.pos, g.pos + 16)) AS p) c
),
tokens AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) s
),
kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok
  FROM tokens tk ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.pos = cov.pos
),
rebuilt AS (
  SELECT doc_id,
         string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(r.text_clean, '') AS text_clean,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(d.t) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
FROM toks d LEFT JOIN rebuilt r USING (doc_id)
ORDER BY doc_id
""",
    category="pipeline",
)
def corpus_span_mask(spark, t):
    """Substring-level corpus cleaning: drop every token covered by a
    corpus-duplicated 16-gram and rebuild each document
    (operators/corpus.span_mask — the destructive twin of
    corpus_span_dedup). The oracle re-derives the same cleaned text
    from literal gram strings; Spark's gram flags travel as 8-byte
    hashes and the rebuild is one doc-keyed aggregate with in-place
    array_sort (no sort shuffle)."""
    return cp.span_mask(t.documents, "doc_id", "text", k=16).orderBy(
        "doc_id"
    )


def _bpe_rounds_sql(n_rounds: int, *, keep_word: bool, min_pair_count: int = 2,
                    pfx: str = "") -> str:
    """Unrolled-round DuckDB replay of ``operators/bpe.train_bpe``
    (the same static-unroll discipline as the topic-model hard-EM and
    pagerank oracles), built on the shared round skeleton in
    ``queries/oracle_parts.subword_rounds_sql`` — which documents the
    fold-exactness, early-stop-composition, and materialization
    arguments. BPE specifics: plain character decomposition, raw
    pair-count argmax with (count DESC, l, r) tie-breaks at
    ``min_pair_count`` support, ``merged = l || r``. ``keep_word``
    carries the original word through the rounds so an apply-side
    oracle can join tokenizations back to documents (training
    evolution == applying merges in rank order)."""
    from .oracle_parts import subword_rounds_sql

    def argmax(k: int) -> str:
        return f"""{pfx}m{k} AS MATERIALIZED (
  SELECT l, r, l || r AS merged, pc FROM {pfx}pc{k}
  WHERE pc >= {min_pair_count}
  ORDER BY pc DESC, l, r LIMIT 1
)"""

    return subword_rounds_sql(
        n_rounds,
        pfx=pfx,
        keep_word=keep_word,
        sym_expr="list_transform(range(1, length(w) + 1), i -> w[i])",
        argmax_cte=argmax,
    )


def _bpe_merges_oracle(n_merges: int = 8) -> str:
    """Synthesized oracle for ``vocab_bpe_merges`` (rows-only →
    hash-green upgrade): the full merge table from the unrolled-round
    replay, rank order + lexicographic tie-breaks identical to the
    Spark trainer."""
    unions = "\n  UNION ALL ".join(
        f'SELECT {k} AS rank, l AS "left", r AS "right", merged,'
        f" CAST(pc AS BIGINT) AS pair_count FROM m{k}"
        for k in range(n_merges)
    )
    return f"WITH {_bpe_rounds_sql(n_merges, keep_word=False)}\n  {unions}"


@register(
    "vocab_bpe_merges",
    oracle=_bpe_merges_oracle(),
    category="pipeline",
)
def vocab_bpe_merges(spark, t):
    """Distributed BPE vocabulary training (Sennrich et al. 2016) —
    8 merge rounds over the distinct-word frequency table
    (operators/bpe.py). Each round: pair-count partial-agg +
    TakeOrdered(1) argmax (one row to the driver), then an
    Arrow-batched merge rewrite with lineage cut per round. Returns
    the learned merge table (rank, left, right, merged, pair_count)
    — deterministic via lexicographic tie-breaks."""
    from ..operators import bpe

    return bpe.bpe_merge_table(t.documents, "text", n_merges=8)


@register(
    "emb_pca_project",
    oracle=None,  # eigendecomposition has no SQL twin — rows-only;
    # components/projection are pinned exactly against an in-memory
    # numpy PCA in tests/test_embeddings_pca.py.
    category="pipeline",
)
def emb_pca_project(spark, t):
    """Distributed PCA 64→8 over the embeddings table
    (operators/embeddings.py): covariance aggregated in ONE pass as
    per-partition (n, Σx, XᵀX) partials — driver work is O(d²·
    #partitions), never corpus-sized — then a broadcast-matmul
    projection, map-only. The projection is the standard pre-step
    before LSH/IVF at scale (8× fewer shuffle bytes per vector).

    Output: the 8-dim projection flattened to scalar proj_0..proj_7
    DOUBLE columns — the driver canonicalizes even rows-only results
    and its pandas sort dies on array cells (CORRECTNESS_r06 ERR), so
    no registered query may emit a complex top-level column."""
    from ..operators import embeddings as emb

    vecs = t.embeddings
    mean, comps, _ = emb.pca_train(vecs, "embedding", k=8)
    proj = emb.pca_project(vecs, mean, comps)
    return proj.select(
        "vec_id",
        *[
            F.col("proj")[i].cast("double").alias(f"proj_{i}")
            for i in range(8)
        ],
    ).orderBy("vec_id")


@register(
    "emb_kmeans_clusters",
    oracle=None,  # iterative Lloyd loop — no SQL twin; centroids and
    # assignments are pinned exactly against a sequential numpy
    # reference from the same deterministic init in
    # tests/test_embeddings_pca.py.
    category="pipeline",
)
def emb_kmeans_clusters(spark, t):
    """Distributed k-means (full-corpus Lloyd, k=6, 8 rounds) over
    the embeddings table (operators/embeddings.kmeans_train): per
    round, every partition emits per-centroid (count, Σx) partials —
    k·d floats regardless of row count — against broadcast centroids;
    assignment is a map-only broadcast matmul. Semantic-clustering
    building block (cluster-balanced sampling, semantic dedup)."""
    from ..operators import embeddings as emb

    vecs = t.embeddings
    cent = emb.kmeans_train(vecs, "embedding", "vec_id", k=6, n_iter=8)
    return emb.kmeans_assign(vecs, cent).orderBy("vec_id")


@register(
    "corpus_clean_v3",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+15], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 14)) AS i) s
  WHERE len(t) >= 16
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
cov AS (
  SELECT DISTINCT g.doc_id, c.p AS pos
  FROM grams g JOIN dup USING (gram),
       LATERAL (SELECT unnest(range(g.pos, g.pos + 16)) AS p) c
),
tokens AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) s
),
kept_tok AS (
  SELECT tk.doc_id, tk.pos, tk.tok
  FROM tokens tk ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.pos = cov.pos
),
rebuilt AS (
  SELECT doc_id,
         string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         COUNT(*) AS n_kept
  FROM kept_tok GROUP BY doc_id
),
w3 AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, source,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)])
              ELSE [] END AS s
  FROM w3
),
contaminated AS (
  SELECT DISTINCT a.doc_id
  FROM sh a JOIN sh b ON a.source <> 'src0' AND b.source = 'src0'
  WHERE len(a.s) + len(b.s) > 0
    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
),
survivors AS (
  SELECT r.doc_id, r.text_clean, r.n_kept
  FROM rebuilt r
  JOIN documents d USING (doc_id)
  WHERE r.n_kept >= 16 AND d.source <> 'src0'
    AND r.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
keyed AS (
  SELECT doc_id, text_clean, n_kept,
         md5('clean-v3' || CAST(doc_id AS VARCHAR)) AS skey
  FROM survivors
)
SELECT doc_id,
       CAST(CAST('0x' || substr(skey, 1, 8) AS BIGINT) % 4 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (
              PARTITION BY CAST('0x' || substr(skey, 1, 8) AS BIGINT) % 4
              ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos,
       text_clean,
       CAST(n_kept AS BIGINT) AS n_kept
FROM keyed
ORDER BY shard, pos
""",
    category="pipeline",
)
def corpus_clean_v3(spark, t):
    """End-to-end training-corpus pipeline v3, composed ENTIRELY of
    this round's operators and oracle-checked end to end: substring
    span masking (drop corpus-duplicated 16-gram spans, rebuild
    docs) → minimum-length filter (≥16 surviving tokens) → MinHash
    fuzzy decontamination against the 'src0' eval slice (Jaccard ≥
    0.5 on ORIGINAL text, LSH candidates + exact confirm, anti join)
    → seeded deterministic shuffle into 4 training shards. One
    composed plan; shuffles: gram hash ×2 (dup set + flag join), doc
    key (rebuild), LSH bands (decon), shard (final order) — each
    already individually plan-gated."""
    docs = t.documents
    masked = cp.span_mask(docs, "doc_id", "text", k=16)
    kept = masked.filter(F.col("n_kept") >= 16)
    pairs = dd.near_duplicate_pairs(docs, "doc_id", "text", threshold=0.5)
    side = docs.select("doc_id", (F.col("source") == "src0").alias("is_eval"))
    a = side.select(F.col("doc_id").alias("id_a"), F.col("is_eval").alias("ea"))
    b = side.select(F.col("doc_id").alias("id_b"), F.col("is_eval").alias("eb"))
    contaminated = (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .filter(F.col("ea") != F.col("eb"))
        .select(
            F.when(F.col("ea"), F.col("id_b")).otherwise(F.col("id_a")).alias("doc_id")
        )
        .distinct()
    )
    survivors = (
        kept.join(docs.select("doc_id", "source"), "doc_id")
        .filter(F.col("source") != "src0")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "text_clean", "n_kept")
    )
    ordered = cp.shuffle_seeded(
        survivors, "doc_id", seed="clean-v3", n_shards=4,
        carry=("text_clean", "n_kept"),
    )
    return ordered.select(
        "doc_id", "shard", "pos", "text_clean",
        F.col("n_kept").cast("long").alias("n_kept"),
    ).orderBy("shard", "pos")


@register(
    "pack_ffd_bins",
    # Upgraded from rows-only (verdict r9 #3 pattern): per-shard
    # first-fit-decreasing IS SQL-expressible as a recursive fold —
    # the working row per shard carries the remaining-capacity list;
    # each iteration joins the shard's next item (ROW_NUMBER over the
    # same tokens-desc/id-asc order), finds the first fitting bin
    # with list_position over a >=-mask (0 = no fit -> open a bin),
    # and rewrites the capacity list by comprehension. Integer
    # capacities -> exact; shards fold in parallel rows of the same
    # recursion. The md5 shard hash replays Spark's
    # conv(substring(md5,1,8),16,10)%8 via a strpos hex fold.
    oracle=r"""
WITH RECURSIVE
items0 AS MATERIALIZED (
  SELECT CAST(doc_id AS VARCHAR) AS _id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
           AS n_tokens,
         CAST(list_reduce(
           [strpos('0123456789abcdef',
                   md5('pack-ffd' || CAST(doc_id AS VARCHAR))[j]) - 1
            for j in range(1, 9)],
           (a, b) -> a * 16 + b) % 8 AS INTEGER) AS shard
  FROM documents
),
items AS MATERIALIZED (
  SELECT _id, n_tokens, shard,
         ROW_NUMBER() OVER (PARTITION BY shard
                            ORDER BY n_tokens DESC, _id ASC) AS rn
  FROM items0
),
st(shard, idx, bins, _id, n_tokens, bin_id, oversize) AS (
  SELECT shard, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
         CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
  FROM (SELECT DISTINCT shard FROM items)
  UNION ALL
  SELECT shard, idx,
         CASE WHEN ovs THEN list_append(bins, 0)
              WHEN fit = 0 THEN list_append(bins, 128 - n)
              ELSE [CASE WHEN j = fit THEN bins[j] - n ELSE bins[j] END
                    for j in range(1, len(bins) + 1)]
         END,
         nid, n,
         CASE WHEN ovs OR fit = 0 THEN len(bins) ELSE fit - 1 END,
         ovs
  FROM (
    SELECT p.shard, p.idx + 1 AS idx, p.bins, i._id AS nid,
           i.n_tokens AS n, (i.n_tokens > 128) AS ovs,
           list_position(list_transform(p.bins, c -> c >= i.n_tokens),
                         true) AS fit
    FROM st p JOIN items i ON i.shard = p.shard AND i.rn = p.idx + 1
  ) q
)
SELECT _id AS doc_id, n_tokens, shard, bin_id, oversize
FROM st WHERE idx > 0
ORDER BY shard, bin_id, doc_id
""",
    category="pipeline",
)
def pack_ffd_bins(spark, t):
    """First-fit-decreasing sequence packing (operators/
    corpus.pack_ffd): whole-document bins for ctx=128 — the
    no-truncation alternative to concat-and-chunk packing
    (pack_sequences_ctx512). Docs hash into 8 independent md5 shards
    that pack in parallel; output is partition-invariant."""
    return cp.pack_ffd(
        t.documents, "doc_id", "text", ctx_len=128, n_shards=8
    ).orderBy("shard", "bin_id", "doc_id")


@register(
    "dedup_incremental_batch",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)])
              ELSE [] END AS s
  FROM toks
)
SELECT a.doc_id AS id_new, b.doc_id AS id_old,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id >= 400 AND b.doc_id < a.doc_id
WHERE len(a.s) + len(b.s) > 0
  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
ORDER BY id_new, id_old
""",
    category="pipeline",
)
def dedup_incremental_batch(spark, t):
    """INCREMENTAL near-dup: docs with doc_id ≥ 400 play the incoming
    ingest batch, the rest the already-indexed corpus. Only the batch
    is shingled fresh; candidates come from one band-bucket join of
    batch buckets against the corpus index ∪ batch
    (operators/dedup.minhash_index / near_duplicates_against) — the
    index-reuse shape that avoids re-shingling the warehouse per
    batch. Oracle brute-forces every (new, earlier) pair."""
    docs = t.documents
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    idx_sh, idx_buckets = dd.minhash_index(corpus, "doc_id", "text")
    return dd.near_duplicates_against(
        idx_sh, idx_buckets, batch, "doc_id", "text", threshold=0.6
    ).orderBy("id_new", "id_old")


@register(
    "dedup_incremental_unordered_ids",
    oracle="""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS sid, doc_id,
         string_split(lower(text), ' ') AS w
  FROM documents
),
sh AS (
  SELECT sid, doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)])
              ELSE [] END AS s
  FROM toks
)
SELECT a.sid AS id_new, b.sid AS id_old,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sh a JOIN sh b
  ON a.doc_id >= 400
 AND (b.doc_id < 400 OR (b.doc_id >= 400 AND b.sid < a.sid))
WHERE len(a.s) + len(b.s) > 0
  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
ORDER BY id_new, id_old
""",
    category="pipeline",
)
def dedup_incremental_unordered_ids(spark, t):
    """Incremental near-dup with STRING ids that carry no ordering
    contract (regression for ADVICE r5: '99' sorts above '400'
    lexicographically, so an id_old < id_new filter applied to
    batch-vs-index pairs would silently drop most corpus matches).
    Batch-vs-index pairs are reported regardless of id order; only
    batch-batch pairs use the lexicographic tie-break (emit each
    unordered pair once). Oracle brute-forces under the same rule."""
    docs = t.documents.select(
        F.col("doc_id").cast("string").alias("sid"), "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 400).select("sid", "text")
    batch = docs.filter(F.col("doc_id") >= 400).select("sid", "text")
    idx_sh, idx_buckets = dd.minhash_index(corpus, "sid", "text")
    return dd.near_duplicates_against(
        idx_sh, idx_buckets, batch, "sid", "text", threshold=0.6
    ).orderBy("id_new", "id_old")


def _planted_vectors(n_pairs: int = 100, dim: int = 64):
    """Deterministic planted near-dup corpus, no RNG: components
    derive from sha256 (the operators/similarity._plane_matrix
    discipline — reproducible on any cluster/numpy). Each base vector
    b_i gets a partner d_i = normalize(b_i + 0.25 * unit-noise), so
    cos(b_i, d_i) = 1/sqrt(1 + 0.0625) ≈ 0.970 and every planted
    partner IS the true cosine nearest neighbor (random pairs sit
    near 0 at dim=64)."""
    import hashlib

    import numpy as np

    def hvec(tag: str, i: int) -> "np.ndarray":
        v = np.array(
            [
                int.from_bytes(
                    hashlib.sha256(f"{tag}:{i}:{c}".encode()).digest()[:8],
                    "big",
                )
                / 2.0**64
                - 0.5
                for c in range(dim)
            ]
        )
        return v / np.linalg.norm(v)

    rows = []
    for i in range(n_pairs):
        b = hvec("base", i)
        d = b + 0.25 * hvec("noise", i)
        d = d / np.linalg.norm(d)
        rows.append((f"b{i}", [float(x) for x in b]))
        rows.append((f"d{i}", [float(x) for x in d]))
    return rows


def _planted_df(spark, n_pairs: int = 100, dim: int = 64):
    """The planted corpus as a DataFrame via the pandas/Arrow path.

    A list-based ``createDataFrame`` becomes a pickled-row Python
    scan: EVERY action on the frame (counts, trainer collects, the
    final write) spawns 32 Python workers just to re-deserialize the
    same 200 rows — measured 1-2s per action cold (guide §4: the
    Python boundary is the cost, cross it with Arrow). The Arrow
    path materializes the rows JVM-side once; values are identical
    (float64 passes through bit-exactly, asserted in
    tests/test_pipeline.py::test_planted_df_matches_list_path)."""
    import pandas as pd

    rows = _planted_vectors(n_pairs=n_pairs, dim=dim)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
        "vec_id string, embedding array<double>",
    )


@register(
    "ann_lsh_recall",
    oracle="""
SELECT CAST(100 AS BIGINT) AS n_planted, CAST(true AS BOOLEAN) AS recall_ok
""",
    category="pipeline",
)
def ann_lsh_recall(spark, t):
    """Quantified recall evidence for the LSH-bucketed ANN scale path
    (verdict r4 #6 / r5 #8): top-5 sign-LSH with 8 OR-amplified
    tables over a deterministic planted corpus must find >= 70% of
    the 100 planted nearest-neighbor pairs (measured ~0.81 at T=8;
    the planted partner is the exact cosine-top-1, so this IS recall
    vs brute-force ground truth). The driver-checked output is the
    derived correctness fact (pair count + threshold pass), robust to
    the small recall jitter future internal changes could cause;
    exact curve 0.18/0.63/0.81 at T=1/4/8 pinned in
    tests/test_pipeline.py."""
    from ..operators import similarity as sim

    df = _planted_df(spark)
    topk = sim.lsh_bucket_topk(
        df, dim=64, n_planes=6, k=5, n_tables=8
    ).select("query_id", "neighbor_id")
    hits = topk.filter(
        F.expr(
            "substring(query_id, 2) = substring(neighbor_id, 2)"
            " AND query_id != neighbor_id"
        )
    )
    n_found = (
        hits.select(
            F.substring("query_id", 2, 10).alias("pair")
        ).distinct()
    )
    return n_found.agg(
        F.lit(100).cast("bigint").alias("n_planted"),
        (F.count(F.lit(1)) >= 70).alias("recall_ok"),
    )


@register(
    "ann_ivf_recall",
    oracle="""
SELECT CAST(100 AS BIGINT) AS n_planted, CAST(true AS BOOLEAN) AS recall_ok
""",
    category="pipeline",
)
def ann_ivf_recall(spark, t):
    """Quantified recall evidence for the IVF scale path — the
    symmetric gate to ann_lsh_recall: IVF top-5 (8 cells, 3 probes)
    over the same deterministic planted corpus must find >= 70% of
    the 100 planted nearest-neighbor pairs. Planted partners sit at
    cosine ~0.97, so base and partner quantize to the same or a
    near cell — exactly the regime IVF is built for; the driver
    checks the derived pass/fail fact."""
    from ..operators import similarity as sim

    df = _planted_df(spark)
    topk = sim.ivf_topk(df, n_cells=8, n_probe=3, k=5).select(
        "query_id", "neighbor_id"
    )
    hits = topk.filter(
        F.expr(
            "substring(query_id, 2) = substring(neighbor_id, 2)"
            " AND query_id != neighbor_id"
        )
    )
    n_found = hits.select(
        F.substring("query_id", 2, 10).alias("pair")
    ).distinct()
    return n_found.agg(
        F.lit(100).cast("bigint").alias("n_planted"),
        (F.count(F.lit(1)) >= 70).alias("recall_ok"),
    )


def _bpe_apply_oracle(n_merges: int = 16) -> str:
    """Synthesized oracle for ``vocab_bpe_apply``: train via the
    unrolled-round replay (keeping the original word as key — the
    evolved symbol table IS rank-order application per word), then
    rebuild every document from its non-empty lowercased words.
    Empty documents keep a row (tokens='', n_tokens=0), matching the
    kernel."""
    from .oracle_parts import doc_rebuild_sql

    return f"""
WITH {_bpe_rounds_sql(n_merges, keep_word=True)},
final AS MATERIALIZED (
  SELECT w, array_to_string(syms, ' ') AS toks, len(syms) AS nt FROM w{n_merges}
),
{doc_rebuild_sql(wtok_cte='final', sums=[('nt', 'n_tokens')])}
"""


@register(
    "vocab_bpe_apply",
    oracle=_bpe_apply_oracle(),
    category="pipeline",
)
def vocab_bpe_apply(spark, t):
    """The inference half of BPE (operators/bpe.apply_bpe): train 16
    merges on the documents corpus, then tokenize every document with
    the learned table — map-only, merge table in the kernel closure,
    per-partition word cache. Returns (doc_id, tokens, n_tokens);
    token counts shrink monotonically with merges (asserted in
    tests), the canonical sanity check of a subword tokenizer."""
    from ..operators import bpe

    docs = t.documents
    merges = bpe.train_bpe(docs, "text", n_merges=16)
    return bpe.apply_bpe(docs, merges).orderBy("doc_id")


@register(
    "quality_learned_classifier",
    oracle="""
SELECT CAST(100 AS BIGINT) AS n_eval, CAST(true AS BOOLEAN) AS acc_ok
""",
    category="pipeline",
)
def quality_learned_classifier(spark, t):
    """Learned document filter end-to-end (operators/logreg — the
    fastText/CCNet-style linear quality classifier of a training-data
    pipeline, Wenzek 2020/Joulin 2017): hashing-trick features →
    full-batch distributed gradient descent (per-partition mapInArrow
    partials, O(P·d) to the driver, localCheckpoint'd feature table)
    → map-only scoring. Trained on 300 docs of a deterministic
    planted two-distribution corpus, evaluated on a 100-doc holdout;
    the driver-checked fact is holdout accuracy ≥ 0.85 (measured
    ~0.9+; majority baseline 0.5). Exact weight parity with a
    sequential numpy reference and partition invariance are pinned
    in tests/test_logreg.py."""
    from ..operators import logreg

    docs = spark.createDataFrame(
        logreg.planted_corpus(), "doc_id long, text string, label double"
    )
    feats = logreg.dense_hash_features(docs, "doc_id", "text", dim=64)
    data = feats.join(docs.select("doc_id", "label"), "doc_id")
    # Holdout %8 in {0,1}: BOTH classes (labels are doc_id % 2 —
    # a %4==0 holdout is all-label-0, which an always-0 predictor
    # would "ace"; found during the calibration-audit build).
    train = data.filter(F.col("doc_id") % 8 >= 2)
    holdout = data.filter(F.col("doc_id") % 8 <= 1)
    w, b, _ = logreg.train_logreg(train, dim=64, n_rounds=60, lr=1.0)
    scored = logreg.predict(holdout, w, b)
    return scored.agg(
        F.count(F.lit(1)).alias("n_eval"),
        (
            F.sum(
                ((F.col("score") > 0.5).cast("double") == F.col("label"))
                .cast("long")
            )
            / F.count(F.lit(1))
            >= 0.85
        ).alias("acc_ok"),
    )


@register(
    "corpus_token_budget_sample",
    oracle="""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '')) AS n_tok,
         md5('budget' || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
),
run AS (
  SELECT doc_id, source, n_tok, skey,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY skey, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tok
  FROM toks
)
SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(cum_tok AS BIGINT) AS cum_tok
FROM run WHERE cum_tok <= 400
ORDER BY source, skey, doc_id
""",
    category="pipeline",
)
def corpus_token_budget_sample(spark, t):
    """Token-budget sampling per domain — the mixing primitive that
    caps each source at a TOKEN budget rather than a document count
    (how real data recipes state quotas, e.g. 'x billion tokens of
    domain d'; complements corpus_mix_temperature's proportion
    weights). Deterministic: docs are admitted in md5-keyed order
    (the seeded-shuffle discipline — no RNG, reproducible on any
    cluster) until the running token total per source exceeds the
    budget. One window over (source, md5 order) — the running sum
    shuffles each source's docs once; at 100 TB the window key is
    the domain, so parallelism is |sources| × AQE-split, and a
    heavy-domain skew splits exactly like any hot window key."""
    docs = t.documents
    from pyspark.sql import Window as W

    from ..operators import textstats as x

    keyed = docs.select(
        "doc_id",
        "source",
        x.token_count(F.col("text")).alias("n_tok"),
        F.md5(F.concat(F.lit("budget"), F.col("doc_id").cast("string"))).alias(
            "skey"
        ),
    )
    w = (
        W.partitionBy("source")
        .orderBy("skey", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        keyed.select(
            "doc_id",
            "source",
            "n_tok",
            F.sum("n_tok").over(w).alias("cum_tok"),
        )
        .filter(F.col("cum_tok") <= 400)
        .orderBy("source", "skey", "doc_id")
        .drop("skey")
    )


@register(
    "corpus_interleave_stride",
    oracle="""
WITH keyed AS (
  SELECT doc_id, source,
         CASE WHEN CAST(substr(source, 4) AS INT) < 10
              THEN 2.0 ELSE 1.0 END AS w,
         md5('stride' || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
),
ranked AS (
  SELECT doc_id, source, w,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY skey, doc_id)
           AS rank_in_src
  FROM keyed
)
SELECT doc_id, source, CAST(rank_in_src AS BIGINT) AS rank_in_src,
       ROUND(rank_in_src / w, 6) AS stride_key
FROM ranked
ORDER BY stride_key, source, doc_id
""",
    category="pipeline",
)
def corpus_interleave_stride(spark, t):
    """Deterministic weighted interleave of domains into one training
    order — stride scheduling (classic deterministic weighted fair
    queueing, Waldspurger & Weihl OSDI'94): doc k of source s gets
    global key (k+1... here k)/weight(s), so a weight-2 source
    appears twice as often at every prefix of the stream. The
    runtime twin of corpus_mix_temperature (which computes the
    weights; here they're stated: 2x for src0-9, 1x for the rest).
    Within-source order is md5-seeded (no RNG). Plan: one window per
    source + a key projection — consumers range-partition on
    stride_key to write interleaved shards without a global sort."""
    docs = t.documents
    from pyspark.sql import Window as W

    w_col = F.when(
        F.substring("source", 4, 10).cast("int") < 10, F.lit(2.0)
    ).otherwise(F.lit(1.0))
    keyed = docs.select(
        "doc_id",
        "source",
        w_col.alias("w"),
        F.md5(F.concat(F.lit("stride"), F.col("doc_id").cast("string"))).alias(
            "skey"
        ),
    )
    win = W.partitionBy("source").orderBy("skey", "doc_id")
    return (
        keyed.select(
            "doc_id",
            "source",
            "w",
            F.row_number().over(win).alias("rank_in_src"),
        )
        .select(
            "doc_id",
            "source",
            F.col("rank_in_src").cast("bigint").alias("rank_in_src"),
            F.round(F.col("rank_in_src") / F.col("w"), 6).alias("stride_key"),
        )
        .orderBy("stride_key", "source", "doc_id")
    )


@register(
    "dedup_semantic_clusters",
    oracle="""
SELECT CAST(60 AS BIGINT) AS n_planted, CAST(true AS BOOLEAN) AS found_ok,
       CAST(true AS BOOLEAN) AS all_valid
""",
    category="pipeline",
)
def dedup_semantic_clusters(spark, t):
    """SemDeDup semantic near-dup pairs (Abbas et al. 2023;
    operators/similarity.semantic_dedup_pairs): k-means-cluster the
    embedding space, score cosine pairs only within clusters —
    cluster-bounded quadratic, the web-scale semantic-dedup recipe.
    Driver-checked facts over the deterministic planted corpus: >=
    90% of the 60 planted near-identical pairs found (same-cell
    quantization) and every reported pair's cosine INDEPENDENTLY
    recomputed — via a posexplode + SQL-aggregation path that shares
    no code with the operator's zip_with fold — must match the
    reported value and clear the threshold (a min(cosine) over the
    operator's own output would be tautological: the operator already
    filtered on it). K-means/assignment internals are pinned
    separately (tests/test_embeddings_pca.py)."""
    from ..operators import similarity as sim

    df = _planted_df(spark, n_pairs=60)
    pairs = sim.semantic_dedup_pairs(df, k=6, threshold=0.9)
    ea = df.select(
        F.col("vec_id").alias("id_a"), F.posexplode("embedding").alias("i", "xa")
    )
    eb = df.select(
        F.col("vec_id").alias("id_b"), F.posexplode("embedding").alias("i", "xb")
    )
    recomputed = (
        pairs.join(ea, "id_a")
        .join(eb, ["id_b", "i"])
        .groupBy("id_a", "id_b", "cosine")
        .agg(
            (
                F.sum(F.col("xa") * F.col("xb"))
                / (
                    F.sqrt(F.sum(F.col("xa") * F.col("xa")))
                    * F.sqrt(F.sum(F.col("xb") * F.col("xb")))
                )
            ).alias("cos2")
        )
    )
    planted_hit = F.sum(
        (
            F.substring("id_a", 2, 10) == F.substring("id_b", 2, 10)
        ).cast("long")
    )
    return recomputed.agg(
        F.lit(60).cast("bigint").alias("n_planted"),
        (planted_hit >= 54).alias("found_ok"),
        (
            (F.min("cos2") >= 0.9)
            & (F.max(F.abs(F.col("cos2") - F.col("cosine"))) < 1e-9)
        ).alias("all_valid"),
    )


@register(
    "corpus_ngram_novelty",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) s
  WHERE len(w) >= 3
),
firsts AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       ROUND(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM grams JOIN firsts USING (g)
GROUP BY doc_id
""",
    category="pipeline",
)
def corpus_ngram_novelty(spark, t):
    """Ordered n-gram NOVELTY per document: the fraction of a doc's
    distinct 3-grams whose FIRST corpus occurrence (by doc_id order
    — ingestion order in a real pipeline) is this doc. The curation
    signal behind dedup-aware sampling: late boilerplate scores near
    0, genuinely new text near 1 — and unlike pairwise dedup it
    prices PARTIAL overlap without any pair join. Plan: distinct
    (doc, gram) partials → one gram-keyed min aggregate → join back
    on gram; grams shuffle once each way, no pair blowup at any
    corpus size."""
    docs = t.documents
    from ..operators import dedup as dd

    grams = (
        docs.select(
            "doc_id",
            F.explode(
                dd.shingles_col(F.col("text"), k=3)
            ).alias("g"),
        )
        .distinct()
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("long")
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
            F.round(
                F.sum(novel) / F.count(F.lit(1)).cast("double"), 6
            ).alias("novelty"),
        )
    )


@register(
    "quality_dsir_weights",
    oracle="""
WITH base AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         string_split(lower(text), ' ') AS w
  FROM documents
),
uni AS (
  SELECT doc_id, is_t, unnest(w) AS g FROM base
),
big AS (
  SELECT doc_id, is_t, w[i] || ' ' || w[i + 1] AS g
  FROM base, LATERAL (SELECT unnest(range(1, len(w))) AS i) s
  WHERE len(w) >= 2
),
grams AS (
  SELECT * FROM uni WHERE g <> '' UNION ALL SELECT * FROM big
),
db AS (
  SELECT doc_id, is_t,
         CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 512 AS b,
         COUNT(*) AS dc
  FROM grams GROUP BY ALL
),
raw AS (SELECT b, SUM(dc) AS cr FROM db GROUP BY b),
tgt AS (SELECT b, SUM(dc) AS ct FROM db WHERE is_t GROUP BY b),
model AS (
  SELECT r.b, COALESCE(t.ct, 0) AS ct, r.cr
  FROM raw r LEFT JOIN tgt t USING (b)
),
tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM model)
SELECT doc_id,
       CAST(SUM(dc) AS BIGINT) AS n_grams,
       CAST(ROUND(CAST(SUM(
         CAST(ROUND(LOG2(
           CAST(ct + 1 AS DOUBLE) * CAST(nr + 512 AS DOUBLE)
           / (CAST(cr + 1 AS DOUBLE) * CAST(nt + 512 AS DOUBLE))
         ), 6) AS DECIMAL(38,6)) * dc
       ) AS DOUBLE), 6) AS DOUBLE) AS log2_ratio
FROM db JOIN model USING (b), tot
GROUP BY doc_id
""",
    category="pipeline",
)
def quality_dsir_weights(spark, t):
    """DSIR importance weights (operators/quality.dsir_logratio; Xie
    et al. NeurIPS 2023): per-doc log2 likelihood ratio of hashed
    unigram+bigram features under the target-domain (lang='en')
    bucket model vs the raw-corpus model — the data-selection weight
    whose top-k IS the DSIR resampling step. Both models are
    ≤512-row broadcast aggregates of the one (doc,bucket) shuffle;
    DECIMAL-accumulated rounded log terms keep both engines exact."""
    from ..operators import quality as q

    return q.dsir_logratio(
        t.documents, F.col("lang") == "en", "doc_id", "text", n_buckets=512
    )


@register(
    "corpus_dsir_resample",
    oracle="""
WITH base AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         string_split(lower(text), ' ') AS w
  FROM documents
),
uni AS (
  SELECT doc_id, is_t, unnest(w) AS g FROM base
),
big AS (
  SELECT doc_id, is_t, w[i] || ' ' || w[i + 1] AS g
  FROM base, LATERAL (SELECT unnest(range(1, len(w))) AS i) s
  WHERE len(w) >= 2
),
grams AS (
  SELECT * FROM uni WHERE g <> '' UNION ALL SELECT * FROM big
),
db AS (
  SELECT doc_id, is_t,
         CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 512 AS b,
         COUNT(*) AS dc
  FROM grams GROUP BY ALL
),
raw AS (SELECT b, SUM(dc) AS cr FROM db GROUP BY b),
tgt AS (SELECT b, SUM(dc) AS ct FROM db WHERE is_t GROUP BY b),
model AS (
  SELECT r.b, COALESCE(t.ct, 0) AS ct, r.cr
  FROM raw r LEFT JOIN tgt t USING (b)
),
tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM model),
wts AS (
  SELECT doc_id,
         CAST(SUM(dc) AS BIGINT) AS n_grams,
         CAST(ROUND(CAST(SUM(
           CAST(ROUND(LOG2(
             CAST(ct + 1 AS DOUBLE) * CAST(nr + 512 AS DOUBLE)
             / (CAST(cr + 1 AS DOUBLE) * CAST(nt + 512 AS DOUBLE))
           ), 6) AS DECIMAL(38,6)) * dc
         ) AS DOUBLE), 6) AS DOUBLE) AS log2_ratio
  FROM db JOIN model USING (b), tot
  GROUP BY doc_id
),
keyed AS (
  SELECT doc_id, n_grams, log2_ratio,
         0.6931471805599453 * log2_ratio
         - LN(-LN((CAST('0x' || substr(md5('dsir-v1:' || CAST(doc_id
               AS VARCHAR)), 1, 8) AS BIGINT) + 0.5) / 4294967296.0))
           AS gumbel_key
  FROM wts
)
SELECT doc_id, n_grams, log2_ratio,
       ROUND(gumbel_key, 6) AS gumbel_key
FROM keyed
ORDER BY gumbel_key DESC, doc_id
LIMIT 100
""",
    category="pipeline",
)
def corpus_dsir_resample(spark, t):
    """DSIR proportional-without-replacement resampling
    (operators/quality.dsir_resample): Gumbel top-k over the
    importance weights with an md5-seeded deterministic uniform —
    the selection step that turns DSIR weights into the actual
    training subset. TakeOrderedAndProject top-k (per-partition
    heaps), never a global sort."""
    from ..operators import quality as q

    return q.dsir_resample(
        t.documents, F.col("lang") == "en", "doc_id", "text",
        k=100, n_buckets=512,
    )


@register(
    "agg_cms_heavy_hitters",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
t AS (SELECT tok FROM toks WHERE tok <> ''),
cells AS (
  SELECT s,
         CAST('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || tok), 1, 8)
              AS BIGINT) % 256 AS b,
         COUNT(*) AS c
  FROM t, LATERAL (SELECT unnest(range(0, 4)) AS s) r
  GROUP BY s, b
),
exact AS (
  SELECT tok, COUNT(*) AS exact_cnt FROM t GROUP BY tok
  ORDER BY exact_cnt DESC, tok LIMIT 20
),
probe AS (
  SELECT tok, exact_cnt, s,
         CAST('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || tok), 1, 8)
              AS BIGINT) % 256 AS b
  FROM exact, LATERAL (SELECT unnest(range(0, 4)) AS s) r
)
SELECT tok,
       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(MIN(c) AS BIGINT) AS cms_est,
       CAST(MIN(c) - exact_cnt AS BIGINT) AS over_est
FROM probe JOIN cells USING (s, b)
GROUP BY tok, exact_cnt
""",
    category="aggregates",
)
def agg_cms_heavy_hitters(spark, t):
    """Count-Min sketch heavy hitters (operators/sketches.py; Cormode
    & Muthukrishnan 2005): build the d=4 x w=256 mergeable frequency
    sketch of the token stream in one keyed aggregate, then estimate
    the top-20 exact tokens' counts from it — over_est >= 0 row by
    row is the sketch's no-underestimate guarantee, checked exactly
    by the oracle. Sketch state is fixed KBs at any corpus size;
    estimation joins it as a broadcast."""
    from ..operators import dedup as dd
    from ..operators import sketches as sk

    toks = t.documents.select(
        F.explode(dd.words_col(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    sketch = sk.cms_build(toks, "tok", depth=4, width=256)
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("tok"))
        .limit(20)
    )
    est = sk.cms_estimate(exact, sketch, "tok", depth=4, width=256)
    return exact.join(est, "tok").select(
        "tok",
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt"))
        .cast("bigint")
        .alias("over_est"),
    )


@register(
    "dedup_source_overlap",
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
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
           AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.6
)
SELECT least(da.source, db.source)    AS src_a,
       greatest(da.source, db.source) AS src_b,
       CAST(COUNT(*) AS BIGINT)       AS n_pairs,
       MAX(jaccard)                   AS max_jaccard
FROM pairs
JOIN documents da ON pairs.id_a = da.doc_id
JOIN documents db ON pairs.id_b = db.doc_id
GROUP BY 1, 2
""",
    category="pipeline",
)
def dedup_source_overlap(spark, t):
    """Cross-source duplication matrix — the curation analytics view
    over near-dup pairs: for every unordered pair of sources, how
    many documents near-duplicate each other across (or within)
    them. This is how a corpus owner finds that crawl A re-scraped
    crawl B before deciding which to keep. Plan: the banded-LSH pair
    generation (never all-pairs) + two id-keyed joins to attach each
    side's source + one tiny |sources|² aggregate; MAX(jaccard) not
    AVG keeps the float column order-independent, so both engines
    agree exactly."""
    docs = t.documents
    pairs = dd.near_duplicate_pairs(docs, "doc_id", "text", threshold=0.6)
    sa = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa"))
    sb = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


@register(
    "emb_cluster_balanced_sample",
    oracle=None,  # k-means is iterative (rows-only like
    # emb_kmeans_clusters); balance/determinism invariants are pinned
    # in tests/test_embeddings_pca.py.
    category="pipeline",
)
def emb_cluster_balanced_sample(spark, t):
    """Cluster-balanced diversity sampling — the coreset-flavored
    selection step (SemDeDup/DataComp family): k-means the embedding
    space, then take an EQUAL md5-ordered quota from every cluster,
    so the sample spans the space instead of mirroring its density.
    Plan: Lloyd rounds are bounded (k·d partials per round, broadcast
    centroids), assignment is map-only, and the per-cluster quota is
    the WindowGroupLimit top-n (map-side heaps) — one final shuffle
    on the cluster key."""
    from ..operators import embeddings as em

    from pyspark.sql import Window as W

    vecs = t.embeddings
    cents = em.kmeans_train(vecs, "embedding", "vec_id", k=8, n_iter=10)
    assigned = em.kmeans_assign(vecs, cents, "vec_id", "embedding")
    w = W.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        assigned.select("vec_id", F.col("cluster").cast("int").alias("cluster"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


@register(
    "corpus_clean_v4",
    oracle="""
WITH w3 AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
            FROM documents),
sh AS (
  SELECT doc_id, source,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)])
              ELSE [] END AS s
  FROM w3
),
contaminated AS (
  SELECT DISTINCT a.doc_id
  FROM sh a JOIN sh b ON a.source <> 'src0' AND b.source = 'src0'
  WHERE len(a.s) + len(b.s) > 0
    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
),
survivors AS (
  SELECT doc_id, text, lang FROM documents
  WHERE source <> 'src0'
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
base AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         string_split(lower(text), ' ') AS w
  FROM survivors
),
uni AS (SELECT doc_id, is_t, unnest(w) AS g FROM base),
big AS (
  SELECT doc_id, is_t, w[i] || ' ' || w[i + 1] AS g
  FROM base, LATERAL (SELECT unnest(range(1, len(w))) AS i) s
  WHERE len(w) >= 2
),
grams AS (SELECT * FROM uni WHERE g <> '' UNION ALL SELECT * FROM big),
db AS (
  SELECT doc_id, is_t,
         CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 512 AS b,
         COUNT(*) AS dc
  FROM grams GROUP BY ALL
),
raw AS (SELECT b, SUM(dc) AS cr FROM db GROUP BY b),
tgt AS (SELECT b, SUM(dc) AS ct FROM db WHERE is_t GROUP BY b),
model AS (
  SELECT r.b, COALESCE(t.ct, 0) AS ct, r.cr
  FROM raw r LEFT JOIN tgt t USING (b)
),
tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM model),
wts AS (
  SELECT doc_id,
         CAST(ROUND(CAST(SUM(
           CAST(ROUND(LOG2(
             CAST(ct + 1 AS DOUBLE) * CAST(nr + 512 AS DOUBLE)
             / (CAST(cr + 1 AS DOUBLE) * CAST(nt + 512 AS DOUBLE))
           ), 6) AS DECIMAL(38,6)) * dc
         ) AS DOUBLE), 6) AS DOUBLE) AS log2_ratio
  FROM db JOIN model USING (b), tot
  GROUP BY doc_id
),
sel AS (
  SELECT doc_id, log2_ratio
  FROM wts
  ORDER BY 0.6931471805599453 * log2_ratio
           - LN(-LN((CAST('0x' || substr(md5('dsir-v1:' || CAST(doc_id
                 AS VARCHAR)), 1, 8) AS BIGINT) + 0.5) / 4294967296.0))
           DESC, doc_id
  LIMIT 150
),
keyed AS (
  SELECT doc_id, log2_ratio,
         md5('clean-v4' || CAST(doc_id AS VARCHAR)) AS skey
  FROM sel
)
SELECT doc_id,
       CAST(CAST('0x' || substr(skey, 1, 8) AS BIGINT) % 4 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (
              PARTITION BY CAST('0x' || substr(skey, 1, 8) AS BIGINT) % 4
              ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos,
       log2_ratio
FROM keyed
ORDER BY shard, pos
""",
    category="pipeline",
)
def corpus_clean_v4(spark, t):
    """End-to-end training-corpus pipeline v4 — the SELECTION-centric
    flagship beside v3's masking-centric one, composed from this
    session's operators and oracle-checked end to end: MinHash fuzzy
    decontamination against the 'src0' eval slice (LSH candidates +
    exact confirm, anti join) → DSIR importance weights over the
    decontaminated corpus (target = lang='en', 512-bucket broadcast
    models) → Gumbel top-150 proportional resampling (md5-seeded,
    deterministic) → seeded shuffle into 4 training shards. One
    composed plan; every stage's scale shape is individually
    plan-gated by its operator's gate."""
    from ..operators import quality as q

    docs = t.documents
    pairs = dd.near_duplicate_pairs(docs, "doc_id", "text", threshold=0.5)
    side = docs.select("doc_id", (F.col("source") == "src0").alias("is_eval"))
    a = side.select(F.col("doc_id").alias("id_a"), F.col("is_eval").alias("ea"))
    b = side.select(F.col("doc_id").alias("id_b"), F.col("is_eval").alias("eb"))
    contaminated = (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .filter(F.col("ea") != F.col("eb"))
        .select(
            F.when(F.col("ea"), F.col("id_b")).otherwise(F.col("id_a")).alias("doc_id")
        )
        .distinct()
    )
    survivors = (
        docs.filter(F.col("source") != "src0")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "text", "lang")
    )
    sel = q.dsir_resample(
        survivors, F.col("lang") == "en", "doc_id", "text",
        k=150, n_buckets=512, seed="dsir-v1",
    ).select("doc_id", "log2_ratio")
    ordered = cp.shuffle_seeded(
        sel, "doc_id", seed="clean-v4", n_shards=4, carry=("log2_ratio",)
    )
    return ordered.select("doc_id", "shard", "pos", "log2_ratio").orderBy(
        "shard", "pos"
    )


@register(
    "vocab_pmi_collocations",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
grams AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i) s
  WHERE len(w) >= 2
),
big AS (SELECT w1, w2, COUNT(*) AS c12 FROM grams GROUP BY w1, w2),
left_m AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY w1),
right_m AS (SELECT w2, SUM(c12) AS c2 FROM big GROUP BY w2),
tot AS (SELECT SUM(c12) AS n FROM big),
scored AS (
  SELECT w1, w2, c12,
         ROUND(LOG2(CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE)
                    / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 6) AS pmi
  FROM big JOIN left_m USING (w1) JOIN right_m USING (w2), tot
  WHERE c12 >= 5
)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, pmi
FROM scored
ORDER BY pmi DESC, w1, w2
LIMIT 50
""",
    category="pipeline",
)
def vocab_pmi_collocations(spark, t):
    """Collocation mining by pointwise mutual information — the
    word2phrase step (Mikolov et al. 2013) that finds multi-word
    units worth fusing before tokenizer training: PMI(w1,w2) =
    log2(c12·N / (c1·c2)) over adjacent bigrams, support-filtered
    (c12 ≥ 5), top-50. Plan: one bigram-keyed aggregate; the two
    marginals are aggregates OF that table (vocab-bounded, not
    corpus-bounded) joining back on their word keys; N is a 1-row
    broadcast; top-50 is TakeOrderedAndProject. PMI is rounded to 6
    decimals BEFORE the ordering, so ranking is ulp-robust across
    engines."""
    docs = t.documents
    # Bind the token array ONCE (the shingles_col discipline —
    # closing the split() expression into the transform lambda would
    # re-split per element, O(n^2) per doc).
    base = docs.select(dd.words_col(F.col("text")).alias("_wa"))
    wa = F.col("_wa")
    grams = (
        base.select(
            F.explode(
                F.when(
                    F.size(wa) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(wa) - 1),
                        lambda i: F.struct(
                            F.element_at(wa, i).alias("w1"),
                            F.element_at(wa, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
    )
    big = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    left_m = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    right_m = big.groupBy("w2").agg(F.sum("c12").alias("c2"))
    tot = big.agg(F.sum("c12").alias("n"))
    scored = (
        big.filter(F.col("c12") >= 5)
        .join(left_m, "w1")
        .join(right_m, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.round(
                F.log2(
                    F.col("c12").cast("double") * F.col("n").cast("double")
                    / (
                        F.col("c1").cast("double")
                        * F.col("c2").cast("double")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(50)


@register(
    "ann_pq_recall",
    oracle="""
SELECT CAST(100 AS BIGINT) AS n_planted, CAST(true AS BOOLEAN) AS recall_ok
""",
    category="pipeline",
)
def ann_pq_recall(spark, t):
    """Quantified recall evidence for the PRODUCT-QUANTIZATION ANN
    scale path (operators/quantize.pq_*; Jégou et al. 2011), the
    third leg beside ann_lsh_recall/ann_ivf_recall: m=4, k=16
    codebooks compress each 64-d vector to 4 bytes; asymmetric-
    distance top-5 over the same deterministic planted corpus must
    find >= 70% of the 100 planted nearest-neighbor pairs. The
    float vectors are never re-read at query time — the whole
    search runs on the 4-byte codes."""
    from ..operators import quantize as qz

    df = _planted_df(spark)
    books = qz.pq_train(df, "vec_id", "embedding", m=4, k=16, n_iter=6)
    codes = qz.pq_encode(df, books, "vec_id", "embedding")
    topk = qz.pq_topk(
        codes, df, books, "vec_id", "embedding", k_top=5
    ).select("query_id", "neighbor_id")
    hits = topk.filter(
        F.expr(
            "substring(query_id, 2) = substring(neighbor_id, 2)"
            " AND query_id != neighbor_id"
        )
    )
    found = hits.select(
        F.substring("query_id", 2, 10).alias("pair")
    ).distinct()
    return found.agg(
        F.lit(100).cast("bigint").alias("n_planted"),
        (F.count(F.lit(1)) >= 70).alias("recall_ok"),
    )


@register(
    "text_normalize_unicode",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(strip_accents(nfc_normalize(text)),
                           '[\\t\\n\\f\\r ]+', ' ', 'g')) AS text_norm,
       (trim(regexp_replace(strip_accents(nfc_normalize(text)),
                            '[\\t\\n\\f\\r ]+', ' ', 'g')) <> text)
         AS changed
FROM documents
""",
    category="pipeline",
)
def text_normalize_unicode(spark, t):
    """Unicode canonicalization (operators/textstats.
    normalize_unicode): NFC + accent stripping + whitespace collapse
    — map-only Arrow-batched pass; the oracle reproduces it with
    DuckDB's nfc_normalize/strip_accents and the identical explicit
    whitespace class."""
    from ..operators import textstats as ts

    return ts.normalize_unicode(t.documents, "doc_id", "text")


@register(
    "win_session_window_fn",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         LAG(CAST(ts AS TIMESTAMP)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  -- microsecond-precision gap test: DATE_DIFF('second') would
  -- truncate 1800.4s to 1800 and disagree with session_window,
  -- which merges on new_ts <= prev_end (probed: ==1800s merges,
  -- 1800.4s splits)
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM e
), sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess
GROUP BY user_id, sid
""",
    category="windows",
)
def win_session_window_fn(spark, t):
    """Spark's NATIVE session_window aggregate in batch mode — the
    built-in twin of the lag+cumsum idiom (events_sessionize) and of
    the streaming session operator (streaming/stateful.py): dynamic-
    gap windows merge at the aggregate, one shuffle on (user, window
    merge). The oracle derives identical sessions from the windowed
    gap algebra; session_end is last_event + gap by session_window's
    definition."""
    ev = t.events.select("user_id", "event_id", F.col("ts").alias("tts"))
    sess = ev.groupBy(
        "user_id", F.session_window("tts", "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sess.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


@register(
    "sample_weighted_groups",
    oracle="""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ROUND(LN((CAST('0x' || substr(md5('wsamp-v1:' ||
                 CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 0.5)
               / 4294967296.0) / CAST(n_chars AS DOUBLE), 6) AS skey
  FROM documents
)
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY skey DESC, doc_id) AS rn
  FROM keyed
) WHERE rn <= 5
""",
    category="pipeline",
)
def sample_weighted_groups(spark, t):
    """Weighted sampling WITHOUT replacement per group (Efraimidis &
    Spirakis 2006): within each source, 5 docs drawn with probability
    proportional to n_chars — the byte-budget-fair shard sampler (a
    uniform pick would under-represent long documents' bytes). Key =
    ln(u)/w with the md5-seeded deterministic uniform (RNG-free, any
    engine reproduces the sample); top-5 keys per group ARE the
    proportional draw. Key rounded to 6 decimals BEFORE ranking so
    ordering is ulp-robust; WindowGroupLimit keeps the per-group
    heap map-side."""
    from pyspark.sql import Window as W

    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("wsamp-v1:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    skey = F.round(F.log(u) / F.col("n_chars").cast("double"), 6)
    w = W.partitionBy("source").orderBy(F.col("skey").desc(), "doc_id")
    return (
        t.documents.select("source", "doc_id", "n_chars", skey.alias("skey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", "n_chars")
    )


@register(
    "agg_hll_set_ops",
    oracle="""
WITH a AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1994-01-01'
    AND o_orderdate < DATE '1995-01-01'
),
b AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1995-01-01'
    AND o_orderdate < DATE '1996-01-01'
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS exact_a,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS exact_b,
       (SELECT CAST(COUNT(*) AS BIGINT)
          FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS exact_both,
       TRUE AS union_est_ok,
       TRUE AS intersect_est_ok
""",
    category="aggregates",
)
def agg_hll_set_ops(spark, t):
    """HLL sketch SET OPERATIONS — the workflow NDV sketches exist
    for: build one sketch per cohort (1994 vs 1995 buyers), merge
    with hll_union for |A∪B| without re-scanning, estimate the
    intersection by inclusion–exclusion. Sketch bytes are
    engine-specific, so the driver-checked output is exact cohort
    cardinalities (oracle-verified) plus the derived facts that both
    estimates land within 15% of truth — the DataSketches HLL error
    envelope at default lgK leaves a wide margin."""
    o = t.orders
    a = o.filter(
        (F.col("o_orderdate") >= "1994-01-01")
        & (F.col("o_orderdate") < "1995-01-01")
    ).select("o_custkey")
    b = o.filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_custkey")
    sk = (
        a.agg(F.hll_sketch_agg("o_custkey").alias("sa"))
        .crossJoin(b.agg(F.hll_sketch_agg("o_custkey").alias("sb")))
        .select(
            F.hll_sketch_estimate("sa").alias("est_a"),
            F.hll_sketch_estimate("sb").alias("est_b"),
            F.hll_sketch_estimate(
                F.hll_union("sa", "sb")
            ).alias("est_union"),
        )
    )
    exact = (
        a.distinct()
        .agg(F.count(F.lit(1)).alias("exact_a"))
        .crossJoin(b.distinct().agg(F.count(F.lit(1)).alias("exact_b")))
        .crossJoin(
            a.intersect(b).agg(F.count(F.lit(1)).alias("exact_both"))
        )
    )
    j = exact.crossJoin(sk)
    est_both = F.col("est_a") + F.col("est_b") - F.col("est_union")
    exact_union = (
        F.col("exact_a") + F.col("exact_b") - F.col("exact_both")
    )
    return j.select(
        F.col("exact_a").cast("bigint").alias("exact_a"),
        F.col("exact_b").cast("bigint").alias("exact_b"),
        F.col("exact_both").cast("bigint").alias("exact_both"),
        (
            F.abs(F.col("est_union") - exact_union)
            <= 0.15 * exact_union
        ).alias("union_est_ok"),
        (
            F.abs(est_both - F.col("exact_both"))
            <= F.greatest(0.15 * F.col("exact_both"), F.lit(50.0))
        ).alias("intersect_est_ok"),
    )


@register(
    "quality_lang_percentile_gate",
    oracle="""
WITH cuts AS (
  SELECT lang,
         ROUND(quantile_cont(n_chars, 0.1), 6) AS p10,
         ROUND(quantile_cont(n_chars, 0.9), 6) AS p90
  FROM documents GROUP BY lang
)
SELECT d.lang, c.p10, c.p90,
       CAST(SUM(CASE WHEN d.n_chars < c.p10 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_below,
       CAST(SUM(CASE WHEN d.n_chars > c.p90 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN cuts c USING (lang)
GROUP BY d.lang, c.p10, c.p90
""",
    category="pipeline",
)
def quality_lang_percentile_gate(spark, t):
    """Per-language percentile gating — the length-outlier filter
    computed PER SUBPOPULATION (a global cutoff over-filters the
    short-text language and under-filters the long one): exact
    interpolated p10/p90 of n_chars per lang (Hive
    ``percentile``/GenericUDAFPercentileCont; DuckDB quantile_cont —
    identical (1-f)·x_i + f·x_{i+1} arithmetic, probed equal to 6
    decimals) and the outlier counts each band would drop. The cuts
    table is |langs| rows — broadcast back onto the corpus; two
    keyed aggregates total."""
    d = t.documents
    cuts = d.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.1)"), 6).alias("p10"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90"),
    )
    j = d.join(F.broadcast(cuts), "lang")
    return j.groupBy("lang", "p10", "p90").agg(
        F.sum((F.col("n_chars") < F.col("p10")).cast("long"))
        .cast("bigint")
        .alias("n_below"),
        F.sum((F.col("n_chars") > F.col("p90")).cast("long"))
        .cast("bigint")
        .alias("n_above"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "fn_variant_json",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
""",
    category="scalars",
)
def fn_variant_json(spark, t):
    """Spark 4 VARIANT ingestion — the modern twin of Hive's
    get_json_object string re-parsing (``UDFJson.java``): parse the
    JSON props column ONCE into a variant, then typed field access
    (``variant_get``) in the aggregate. At 100 TB the difference is
    parse-once-binary vs regex-per-access; the oracle extracts the
    same field with DuckDB's JSON operators."""
    e = t.events
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_type",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
    ).groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "join_on_vs_where_filter",
    oracle="""
SELECT n.n_nationkey,
       c_on.c_custkey  AS on_custkey,
       c_wh.c_custkey  AS wh_custkey
FROM nation n
LEFT JOIN customer c_on
  ON n.n_nationkey = c_on.c_nationkey AND c_on.c_acctbal > 9900
LEFT JOIN customer c_wh
  ON n.n_nationkey = c_wh.c_nationkey
WHERE (c_wh.c_acctbal > 9900 OR c_wh.c_custkey IS NULL)
""",
    category="joins",
)
def join_on_vs_where_filter(spark, t):
    """The OUTER-JOIN filter-placement trap (reference qfile
    ``clientpositive/join_filters.q``; Hive's JoinCondTypeCheck):
    a predicate on the PRESERVED-side's partner in the ON clause
    filters only which rows MATCH (unmatched nations survive with
    NULLs), while the same predicate in WHERE filters the JOINED
    result (dropping nations whose only matches fail it — here kept
    via the explicit IS NULL escape to make the two forms
    comparable row-for-row). Both engines must agree on both
    placements."""
    n = t.nation
    c = t.customer
    c_on = c.select(
        F.col("c_custkey"),
        F.col("c_nationkey").alias("nk1"),
        F.col("c_acctbal").alias("ab1"),
    )
    c_wh = c.select(
        F.col("c_custkey").alias("c_custkey2"),
        F.col("c_nationkey").alias("nk2"),
        F.col("c_acctbal").alias("ab2"),
    )
    j = (
        n.join(
            c_on,
            (F.col("n_nationkey") == F.col("nk1"))
            & (F.col("ab1") > 9900),
            "left",
        )
        .join(c_wh, F.col("n_nationkey") == F.col("nk2"), "left")
        .filter((F.col("ab2") > 9900) | F.col("c_custkey2").isNull())
    )
    return j.select(
        "n_nationkey",
        F.col("c_custkey").alias("on_custkey"),
        F.col("c_custkey2").alias("wh_custkey"),
    )


@register(
    "agg_null_group_semantics",
    oracle="""
SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN c_acctbal < 0 THEN NULL
                       ELSE c_mktsegment END) AS BIGINT) AS n_nonnull_keys,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
FROM customer
GROUP BY 1
""",
    category="aggregates",
)
def agg_null_group_semantics(spark, t):
    """NULL grouping-key semantics (reference qfiles
    ``clientpositive/nullgroup*.q``): NULL keys form ONE group (SQL
    GROUP BY treats NULLs as equal), count(*) counts its rows while
    count(key) counts zero of them — the classic count(*)/count(col)
    divergence, plus a DISTINCT agg inside the null group. GROUP BY
    ordinal exercises the position-alias parser surface
    (hive.groupby.position.alias)."""
    t.customer
    return spark.sql(
        """
        SELECT CASE WHEN c_acctbal < 0 THEN NULL
                    ELSE c_mktsegment END AS seg,
               COUNT(*) AS n_rows,
               COUNT(CASE WHEN c_acctbal < 0 THEN NULL
                          ELSE c_mktsegment END) AS n_nonnull_keys,
               COUNT(DISTINCT c_nationkey) AS n_nations
        FROM customer
        GROUP BY 1
        """
    )


@register(
    "setop_union_type_coercion",
    oracle="""
SELECT CAST(o_orderkey AS DOUBLE) AS v FROM orders WHERE o_orderkey < 5
UNION
SELECT o_totalprice AS v FROM orders WHERE o_orderkey < 5
""",
    category="setops",
)
def setop_union_type_coercion(spark, t):
    """UNION branch type coercion (``FunctionRegistry
    .getCommonClassForUnionAll``; qfile ``union_type_chk.q``): a
    BIGINT branch and a DOUBLE branch resolve to DOUBLE, and UNION
    DISTINCT dedups in the COERCED type — an integer 1 and a float
    1.0 would collapse. Both engines must pick the same common
    type."""
    o = t.orders.filter(F.col("o_orderkey") < 5)
    a = o.select(F.col("o_orderkey").alias("v"))
    b = o.select(F.col("o_totalprice").alias("v"))
    return a.union(b).distinct()


@register(
    "agg_quantile_sketch",
    oracle="""
WITH s AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS qv
  FROM lineitem
  ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '|'
               || CAST(l_linenumber AS VARCHAR))
  LIMIT 512
)
SELECT CAST(COUNT(*) AS BIGINT) AS sample_k,
       ROUND(quantile_cont(qv, 0.10), 6) AS p10,
       ROUND(quantile_cont(qv, 0.50), 6) AS p50,
       ROUND(quantile_cont(qv, 0.90), 6) AS p90,
       ROUND(quantile_cont(qv, 0.99), 6) AS p99
FROM s
""",
    category="aggregates",
)
def agg_quantile_sketch(spark, t):
    """Mergeable deterministic quantile sketch
    (operators/sketches.qsketch_*): bottom-512 rows by md5(row id) =
    a uniform sample whose exact percentiles estimate the corpus
    quantiles (rank error O(1/sqrt(k))). Hive's own approximate
    percentile lives in ``GenericUDAFPercentileApprox.java``; its
    histogram state is partitioning-dependent, this sketch is not.

    The query builds TWO shard sketches (odd/even orderkey) and
    MERGES them; the oracle derives quantiles from the GLOBAL
    bottom-512 directly — hash equality of the two IS the
    mergeability proof, certified by the driver. Each build is a
    TakeOrderedAndProject (per-partition bounded heap, k rows to the
    driver), never a global sort."""
    from ..operators import sketches as sk

    ident = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("|"),
        F.col("l_linenumber").cast("string"),
    )
    li = t.lineitem
    even = sk.qsketch_build(
        li.filter(F.col("l_orderkey") % 2 == 0), "l_extendedprice",
        ident, k=512,
    )
    odd = sk.qsketch_build(
        li.filter(F.col("l_orderkey") % 2 == 1), "l_extendedprice",
        ident, k=512,
    )
    merged = sk.qsketch_merge(even, odd, k=512)
    return sk.qsketch_quantiles(merged, [0.10, 0.50, 0.90, 0.99])


@register(
    "corpus_chunk_overlap",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE doc_id < 50
),
n_ch AS (
  SELECT doc_id, t,
         1 + CAST(FLOOR(GREATEST(len(t) - 32 + 23, 0) / 24.0) AS INT)
           AS nc
  FROM toks
),
ch AS (
  SELECT doc_id, t, CAST(cid AS INT) AS chunk_id,
         list_slice(t, cid * 24 + 1, cid * 24 + 32) AS piece
  FROM n_ch, LATERAL (SELECT unnest(range(0, nc)) AS cid) s
)
SELECT doc_id, chunk_id,
       CAST(len(piece) AS INT) AS n_chunk_tokens,
       array_to_string(piece, ' ') AS chunk_text
FROM ch
""",
    category="pipeline",
)
def corpus_chunk_overlap(spark, t):
    """Sliding-window chunking with overlap
    (operators/corpus.chunk_documents): chunk_tokens=32, overlap=8 →
    stride 24; consecutive chunks share 8 tokens, every token lands
    in some chunk, chunk ids are deterministic (re-chunking an
    appended corpus never renumbers). The context-window prep step
    for retrieval indexes / long-doc training. Map-only: tokenize
    once, one explode(sequence), slice per chunk — no shuffle, no
    Python."""
    return cp.chunk_documents(
        t.documents.filter(F.col("doc_id") < 50),
        "doc_id",
        "text",
        chunk_tokens=32,
        overlap=8,
    )


@register(
    "ann_ivfpq_recall",
    oracle="""
SELECT CAST(100 AS BIGINT) AS n_planted, CAST(true AS BOOLEAN) AS recall_ok
""",
    category="pipeline",
)
def ann_ivfpq_recall(spark, t):
    """Recall gate for the COMPOSED IVF-PQ index
    (operators/quantize.ivfpq_topk; FAISS IndexIVFPQ / Jégou et al.
    2011 §V "IVFADC") — the production shape that multiplies the two
    scale levers the separate ann_ivf_recall / ann_pq_recall gates
    prove individually: coarse cells prune the candidate set
    n_cells/n_probe-fold AND residual-PQ codes shrink every surviving
    candidate to m ints. Same deterministic planted corpus, same
    driver-checked fact: top-5 over 8 cells × 3 probes × (m=4, k=16)
    residual codebooks must find >= 70% of the 100 planted
    nearest-neighbor pairs (measured 100/100). Residual encoding is
    the composition's precision win on CLUSTERED corpora (the regime
    IVF cells exist for): x̂ = centroid + decode(codes) reconstructs
    with strictly lower error than raw PQ's decode(codes) at the same
    (m, k) — pinned numerically on a clustered corpus in
    tests/test_embeddings_pca.py (on isotropic-random vectors the
    advantage vanishes, also measured there)."""
    from ..operators import quantize as qz

    df = _planted_df(spark)
    topk = qz.ivfpq_topk(
        df, df, "vec_id", "embedding",
        n_cells=8, n_probe=3, m=4, k=16, k_top=5,
    ).select("query_id", "neighbor_id")
    hits = topk.filter(
        F.expr(
            "substring(query_id, 2) = substring(neighbor_id, 2)"
            " AND query_id != neighbor_id"
        )
    )
    found = hits.select(
        F.substring("query_id", 2, 10).alias("pair")
    ).distinct()
    return found.agg(
        F.lit(100).cast("bigint").alias("n_planted"),
        (F.count(F.lit(1)) >= 70).alias("recall_ok"),
    )


@register(
    "multimodal_crossmodal_dedup",
    oracle=None,  # pHash bits have no SQL twin → rows-only; the full
    # pair-set classification is pinned exactly in tests/test_phash.py
    category="pipeline",
)
def multimodal_crossmodal_dedup(spark, t):
    """Cross-modal duplicate classification — the curation decision
    table for (text, image) documents: the SAME pair list annotated
    with WHICH modality duplicates. Image tier = the perceptual-hash
    pipeline (groups of ~12, banded Hamming join); text tier = exact
    dedup of normalized text, planted on an INDEPENDENT grouping
    (doc_id DIV 8: group-base text + whitespace/case jitter that
    normalize_text collapses), so pairs genuinely split across
    image_only / text_only / both. Shapes: the image path is the
    existing banded join; the text path one md5 aggregate + one
    group-keyed pair join; the final FULL OUTER join is keyed on the
    pair — churn-sized, never corpus-sized. A pipeline drops 'both'
    pairs outright and routes single-modality pairs to review."""
    from pyspark.sql import Window as W

    from ..operators import phash as ph
    from ..operators.dedup import normalize_text

    media = _synthesize_grouped_media(t.documents)
    hashes = ph.phash_table(media)
    # media ids are strings, so the pHash pair order is lexicographic
    # ("10" < "2"); renormalize numerically before the pair join
    ia = F.col("id_a").cast("long")
    ib = F.col("id_b").cast("long")
    img = (
        ph.phash_near_pairs(hashes, max_distance=6)
        .select(
            F.least(ia, ib).alias("id_a"),
            F.greatest(ia, ib).alias("id_b"),
        )
        .withColumn("img_dup", F.lit(True))
    )

    tg = F.expr("doc_id DIV 8")
    base = (
        t.documents.groupBy(tg.alias("tg"))
        .agg(F.min(F.struct("doc_id", "text")).alias("m"))
        .select("tg", F.col("m.text").alias("base_text"))
    )
    seeded = (
        t.documents.select("doc_id", tg.alias("tg"))
        .join(base, "tg")
        .select(
            "doc_id",
            "tg",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("  "), F.upper("base_text")),
            )
            .otherwise(F.col("base_text"))
            .alias("text"),
        )
    )
    fp = F.md5(normalize_text(F.col("text")).cast("binary"))
    keyed = seeded.select("doc_id", fp.alias("fp"))
    txt = (
        keyed.alias("a")
        .join(keyed.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .withColumn("txt_dup", F.lit(True))
    )
    return (
        img.join(txt, ["id_a", "id_b"], "full_outer")
        .select(
            "id_a",
            "id_b",
            F.when(
                F.coalesce(F.col("img_dup"), F.lit(False))
                & F.coalesce(F.col("txt_dup"), F.lit(False)),
                "both",
            )
            .when(F.coalesce(F.col("img_dup"), F.lit(False)), "image_only")
            .otherwise("text_only")
            .alias("modality"),
        )
        .orderBy("id_a", "id_b")
    )
