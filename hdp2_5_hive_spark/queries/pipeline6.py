r"""LLM-pipeline queries, round 7 (continued session 3): cleaning
(C4 battery + flagship v9), graphs (triangle census, k-core),
containment dedup, record linkage (Fellegi-Sunter scoring + EM,
Jaro-Winkler), retrieval eval (metrics + BM25 end-to-end capstone),
time series (EWMA, rolling median, linear gap interpolation,
streaks, cumulative/rolling uniques), experimentation (z-test,
CUPED, SRM), feature prep (pivot, winsorize, OOF target encoding,
discretization, quantile normalization, churn labels, mutual
information), warehouse audits (key skew, referential integrity,
Benford, column profile, health card, Z-order, column lineage),
security policies, ACID time travel, spatial joins (haversine,
nearest hub, grid-bucketed radius), market-basket mining, and
MATCH_RECOGNIZE-style row patterns.

Beyond-reference operators under the training-data-pipeline mandate
(SURVEY §6). Same design rules as pipeline/pipeline2-5: built-in
JVM expressions only in hot paths, keyed or broadcast shuffles,
and a DuckDB oracle per query re-deriving the semantics from
portable primitives (lambdas restricted to the Spark ∩ DuckDB
common subset: ``filter``/``list_filter``, ``transform``/
``list_transform``, ``aggregate``/``list_sum``-equivalents).

The synthetic documents table is letters-only word salad, so the C4
battery CONSTRUCTS deterministic "lines" from each doc's words and
injects doc_id-keyed noise (terminal punctuation, ``javascript``,
``{``, ``lorem ipsum``, a placeholder bad-word) identically on both
sides — every rule genuinely fires instead of vacuously passing.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register

# Placeholder stand-ins for the C4 bad-word list (the real list is a
# public external resource; the FILTER mechanics are what's tested).
C4_BADWORDS = ("obscenityalpha", "obscenitybeta")



def _c4_page(d):
    """Shared C4 page construction (see quality_c4_rules docstring):
    deterministic 4-line regrouping with doc_id-keyed injections,
    line-level retention filter applied. Returns (doc_id, page_text,
    kept: array<string>). Reused by the battery query and the v9
    flagship so the gate cannot drift between them."""
    w = F.split(F.col("text"), " ")
    base = d.filter(F.size(F.split(F.col("text"), " ")) >= 21).select(
        "doc_id", w.alias("w")
    )
    j = lambda a, b: F.array_join(F.slice(F.col("w"), a, b - a + 1), " ")  # noqa: E731
    when_mod = lambda m, s: F.when(  # noqa: E731
        F.col("doc_id") % m == 0, F.lit(s)
    ).otherwise(F.lit(""))
    lines = base.select(
        "doc_id",
        F.array(
            F.concat(j(1, 6), when_mod(11, " lorem ipsum"), F.lit(".")),
            F.concat(
                j(7, 11),
                when_mod(17, " " + C4_BADWORDS[0]),
                when_mod(19, " javascript"),
                F.lit("."),
            ),
            F.concat(j(12, 14), when_mod(13, " {var}")),
            F.concat(j(15, 21), when_mod(2, ".")),
        ).alias("ls"),
    )
    kept = F.filter(
        F.col("ls"),
        lambda x: x.rlike('[.!?\"]$')
        & (F.size(F.split(x, " ")) >= 5)
        & ~F.lower(x).contains("javascript"),
    )
    return lines.select(
        "doc_id",
        F.array_join(F.col("ls"), " | ").alias("page_text"),
        kept.alias("kept"),
    )


def _c4_keep_flag():
    """The page-level C4 keep predicate over _c4_page columns."""
    kt = F.array_join(F.col("kept"), " ")
    n_sent = F.length(kt) - F.length(F.regexp_replace(kt, r"[.!?]", ""))
    return (
        (n_sent >= 3)
        & ~F.col("page_text").contains("{")
        & ~F.lower(F.col("page_text")).contains("lorem ipsum")
        & ~F.lower(F.col("page_text")).contains(C4_BADWORDS[0])
        & ~F.lower(F.col("page_text")).contains(C4_BADWORDS[1])
    )


@register(
    "quality_c4_rules",
    oracle=r"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents
  WHERE len(string_split(text, ' ')) >= 21
),
lines AS (
  SELECT doc_id,
         [
           array_to_string(list_slice(w, 1, 6), ' ')
             || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END
             || '.',
           array_to_string(list_slice(w, 7, 11), ' ')
             || CASE WHEN doc_id % 17 = 0 THEN ' obscenityalpha' ELSE '' END
             || CASE WHEN doc_id % 19 = 0 THEN ' javascript' ELSE '' END
             || '.',
           array_to_string(list_slice(w, 12, 14), ' ')
             || CASE WHEN doc_id % 13 = 0 THEN ' {var}' ELSE '' END,
           array_to_string(list_slice(w, 15, 21), ' ')
             || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END
         ] AS ls
  FROM base
),
page AS (
  SELECT doc_id, ls, array_to_string(ls, ' | ') AS page_text,
         list_filter(ls, x ->
           regexp_matches(x, '[.!?"]$')
           AND len(string_split(x, ' ')) >= 5
           AND NOT contains(lower(x), 'javascript')) AS kept
  FROM lines
)
SELECT doc_id,
       array_to_string(kept, ' | ') AS kept_text,
       CAST(len(page_text) - len(replace(replace(replace(page_text,
              '.', ''), '!', ''), '?', '')) AS BIGINT) AS n_punct,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       CAST(len(array_to_string(kept, ' '))
            - len(replace(replace(replace(array_to_string(kept, ' '),
                '.', ''), '!', ''), '?', '')) AS BIGINT) AS n_sentences,
       contains(page_text, '{') AS f_brace,
       contains(lower(page_text), 'lorem ipsum') AS f_lorem,
       (contains(lower(page_text), 'obscenityalpha')
        OR contains(lower(page_text), 'obscenitybeta')) AS f_badword,
       ((len(array_to_string(kept, ' '))
         - len(replace(replace(replace(array_to_string(kept, ' '),
             '.', ''), '!', ''), '?', ''))) >= 3
        AND NOT contains(page_text, '{')
        AND NOT contains(lower(page_text), 'lorem ipsum')
        AND NOT contains(lower(page_text), 'obscenityalpha')
        AND NOT contains(lower(page_text), 'obscenitybeta')) AS c4_keep
FROM page
ORDER BY doc_id
""",
    category="pipeline",
)
def quality_c4_rules(spark, t):
    """The C4 cleaning-rule battery (Raffel et al. 2020 §2.2): line
    level — retain only lines ending in terminal punctuation with
    ≥5 words and no ``javascript``; page level — drop pages with
    ``{`` (source code), ``lorem ipsum``, or a bad-word hit, and
    require ≥3 sentences in the RETAINED text. The corpus is
    punctuation-free word salad, so each doc's words are regrouped
    into four deterministic lines with doc_id-keyed injections (odd
    ids lose line 4's terminal '.', %19 gets a javascript line, %13
    a brace, %11 lorem ipsum, %17 a bad word) so every rule gates a
    known subset. Map-only: split → slice → higher-order
    ``filter`` — one JVM codegen stage, no shuffle but the output
    sort. The span-dedup rule of C4 (three-sentence spans) lives in
    corpus_span_dedup."""
    page = _c4_page(t.documents)

    def n_punct(col):
        stripped = F.regexp_replace(col, r"[.!?]", "")
        return (F.length(col) - F.length(stripped)).cast("bigint")

    kept_text = F.array_join(F.col("kept"), " ")
    f_brace = F.col("page_text").contains("{")
    f_lorem = F.lower(F.col("page_text")).contains("lorem ipsum")
    f_bad = F.lower(F.col("page_text")).contains(
        C4_BADWORDS[0]
    ) | F.lower(F.col("page_text")).contains(C4_BADWORDS[1])
    return (
        page.select(
            "doc_id",
            F.array_join(F.col("kept"), " | ").alias("kept_text"),
            n_punct(F.col("page_text")).alias("n_punct"),
            F.size(F.col("kept")).cast("bigint").alias("n_kept_lines"),
            n_punct(kept_text).alias("n_sentences"),
            f_brace.alias("f_brace"),
            f_lorem.alias("f_lorem"),
            f_bad.alias("f_badword"),
            (
                (n_punct(kept_text) >= 3) & ~f_brace & ~f_lorem & ~f_bad
            ).alias("c4_keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "graph_triangle_count",
    oracle="""
WITH e AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  WHERE l1.l_orderkey % 10 = 0 AND l2.l_orderkey % 10 = 0
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) GROUP BY node
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
  (SELECT CAST(COUNT(*) AS BIGINT)
   FROM e e1 JOIN e e2 ON e1.b = e2.a
   JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles,
  (SELECT CAST(SUM(deg * (deg - 1) / 2.0) AS BIGINT) FROM deg) AS n_wedges,
  FLOOR(
    3.0 * (SELECT COUNT(*)
           FROM e e1 JOIN e e2 ON e1.b = e2.a
           JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
    / (SELECT CAST(SUM(deg * (deg - 1) / 2.0) AS BIGINT) FROM deg)
    * 1000000 + 0.5) / 1000000 AS global_clustering
""",
    category="pipeline",
)
def graph_triangle_count(spark, t):
    """Exact triangle census of the part co-purchase graph (parts
    sharing an order; 10%-of-orders slice keeps the synthetic graph
    sparse) via operators/components.triangle_count — degree-ordered
    edge orientation so wedges enumerate only among out-neighbors:
    O(m^1.5) worst-case instead of the star-node deg^2 blowup; every
    stage an equi-join or keyed aggregate. The naive 3-way self-join
    lives in the ORACLE, where the small-SF graph makes it exact and
    cheap — the Spark side is the plan you'd run at 100 TB. Output:
    node/edge/triangle/wedge counts + global clustering coefficient
    (3T/W, pround)."""
    from ..operators.components import triangle_count

    li = t.lineitem.filter(F.col("l_orderkey") % 10 == 0).select(
        "l_orderkey", "l_partkey"
    )
    pairs = li.alias("l1").join(
        li.alias("l2"),
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
    ).select(
        F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b")
    )
    return triangle_count(pairs)


@register(
    "events_ewma_daily",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS cnt
  FROM events GROUP BY event_type, day
),
warr AS (
  SELECT event_type, day, cnt,
         list(cnt) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr
  FROM daily
),
terms AS (
  SELECT event_type, day, cnt, len(arr) AS n,
         unnest(arr) AS x, generate_subscripts(arr, 1) AS i
  FROM warr
)
SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
       FLOOR(SUM(x * power(0.5, n - i))
             / (2 - power(0.5, MAX(n) - 1))
             * 1000000 + 0.5) / 1000000 AS ewma
FROM terms
GROUP BY event_type, day, cnt
ORDER BY event_type, day
""",
    category="analytics",
)
def events_ewma_daily(spark, t):
    """Exponentially weighted moving average of daily event volume
    (alpha = 0.5, pandas ``ewm(adjust=True)`` semantics truncated to
    a 20-day window — weights below 2^-19 are under 1e-6 rounding
    anyway): the smoothing baseline the rate monitors diff against.

    Determinism at the float level: with alpha = 1/2 every weight is
    a DYADIC rational, so each term cnt*2^-k is an EXACT double and
    the 20-term window sum stays far inside 53 mantissa bits —
    bit-identical under ANY summation order on any engine; one IEEE
    division by the closed-form weight total (2 - 2^(1-n)), then
    pround. A general alpha would need the ROUND→DECIMAL term trick
    instead. Plan: one keyed aggregate, one window (collect_list over
    a 20-row frame — bounded state per row), map-only higher-order
    aggregate; nothing super-linear, the frame bound holds at any
    history length."""
    e = t.events
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-19, 0)
    )
    warr = daily.select(
        "event_type",
        "day",
        "cnt",
        F.collect_list(F.col("cnt").cast("double")).over(w).alias("arr"),
    )
    num = F.expr(
        "aggregate(zip_with(arr, sequence(1, size(arr)),"
        " (x, i) -> x * power(0.5, size(arr) - i)),"
        " cast(0 as double), (a, x) -> a + x)"
    )
    den = F.lit(2.0) - F.expr("power(0.5, size(arr) - 1)")
    from ..functions.hive_compat import pround

    return warr.select(
        "event_type",
        "day",
        F.col("cnt").cast("bigint").alias("cnt"),
        pround(num / den).alias("ewma"),
    ).orderBy("event_type", "day")


@register(
    "retrieval_eval_metrics",
    oracle="""
WITH qs AS (SELECT unnest(generate_series(0, 9)) AS query_id),
cand AS (
  SELECT q.query_id, d.doc_id,
         md5('eval' || CAST(q.query_id AS VARCHAR) || ':'
             || CAST(d.doc_id AS VARCHAR)) AS skey
  FROM qs q, documents d
  WHERE d.doc_id % 5 <> 1
),
run AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY skey, doc_id) AS rank
    FROM cand
  ) WHERE rank <= 20
),
qrels AS (
  SELECT q.query_id, d.doc_id
  FROM qs q JOIN documents d ON d.doc_id % 37 = q.query_id
),
nrel AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
  FROM qrels GROUP BY query_id
),
hits AS (
  SELECT r.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit,
         MIN(r.rank) AS first_rank,
         SUM(CAST(ROUND(1 / log2(r.rank + 1), 6) AS DECIMAL(38,6)))
           AS dcg
  FROM run r JOIN qrels USING (query_id, doc_id)
  GROUP BY r.query_id
),
idcg AS (
  SELECT n.query_id,
         SUM(CAST(ROUND(1 / log2(i + 1), 6) AS DECIMAL(38,6))) AS idcg
  FROM nrel n, unnest(generate_series(1, LEAST(n.n_rel, 20))) AS t(i)
  GROUP BY n.query_id
)
SELECT n.query_id, n.n_rel,
       COALESCE(h.n_hit, 0) AS n_hit,
       FLOOR(COALESCE(h.n_hit, 0) * 1.0 / n.n_rel
             * 1000000 + 0.5) / 1000000 AS recall_k,
       FLOOR(COALESCE(1.0 / h.first_rank, 0)
             * 1000000 + 0.5) / 1000000 AS mrr,
       FLOOR(CAST(COALESCE(h.dcg, 0) AS DOUBLE)
             / CAST(i.idcg AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS ndcg_k
FROM nrel n
LEFT JOIN hits h ON n.query_id = h.query_id
JOIN idcg i ON n.query_id = i.query_id
ORDER BY n.query_id
""",
    category="pipeline",
)
def retrieval_eval_metrics(spark, t):
    """Offline retrieval-eval harness
    (operators/retrieval.ranking_metrics): recall@20, MRR and binary
    nDCG@20 per query over a PLANTED ranking — candidates are docs
    with doc_id % 5 != 1 ranked by an md5 pseudo-score (so the
    ranking is deterministic and engine-identical), relevance is
    doc_id % 37 == query_id (≈13 relevant docs per query, some
    outside the candidate pool → recall < 1 by construction). The
    METRIC arithmetic is what's under test: DCG/IDCG terms rounded
    to 6 into DECIMAL(38,6) exact sums, quotients pround-ed. The
    eval gate a BM25/ANN/hybrid ranker reports before shipping."""
    from ..operators.retrieval import ranking_metrics

    d = t.documents.select("doc_id")
    # Query fan-out as a map-only explode (no join node), relevance
    # as a projection — the registry-wide nested-loop sweep stays
    # clean because there IS no cartesian anywhere in this plan.
    cand = (
        d.filter(F.col("doc_id") % 5 != 1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("query_id"),
            "doc_id",
        )
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "doc_id",
            F.md5(
                F.concat(
                    F.lit("eval"),
                    F.col("query_id").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ).alias("skey"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("skey", "doc_id")
    run = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("query_id", "doc_id", "rank")
    )
    qrels = d.select(
        (F.col("doc_id") % 37).alias("query_id"), "doc_id"
    ).filter(F.col("query_id") < 10)
    return ranking_metrics(run, qrels, k=20)


def _wp_rounds_sql(n_rounds: int, *, keep_word: bool, pfx: str = "") -> str:
    """Unrolled-round DuckDB replay of
    ``operators/wordpiece.train_wordpiece``, built on the shared
    round skeleton in ``queries/oracle_parts.subword_rounds_sql``
    (fold-exactness and early-stop composition documented there; the
    WordPiece ``merged = l || strip##(r)`` still extends strictly
    past ``l`` because a continuation symbol is ``##`` plus ≥1 char,
    so the fold cannot cascade within a round).

    WordPiece specifics: ##-decorated decomposition, and a
    likelihood-scored argmax — ``count(ab)/(count(a)*count(b))``
    divides exact integers below 2**53 as IEEE doubles on both
    engines (identical bits, identical ORDER BY) with the trainer's
    (score DESC, pair_count DESC, l, r) tie-break replicated."""
    from .oracle_parts import subword_rounds_sql

    def argmax(k: int) -> str:
        return f"""{pfx}sc{k} AS MATERIALIZED (
  SELECT sym, SUM(freq) AS sc FROM (
    SELECT unnest(syms) AS sym, freq FROM {pfx}w{k}) _ GROUP BY sym
),
{pfx}m{k} AS MATERIALIZED (
  SELECT p.l, p.r,
         p.l || (CASE WHEN cr.sym LIKE '##%' THEN substr(cr.sym, 3)
                      ELSE cr.sym END) AS merged,
         p.pc,
         CAST(p.pc AS DOUBLE) / (CAST(cl.sc AS DOUBLE) * CAST(cr.sc AS DOUBLE))
           AS score
  FROM {pfx}pc{k} p JOIN {pfx}sc{k} cl ON cl.sym = p.l
                    JOIN {pfx}sc{k} cr ON cr.sym = p.r
  WHERE p.pc >= 2
  ORDER BY score DESC, p.pc DESC, p.l, p.r LIMIT 1
)"""

    return subword_rounds_sql(
        n_rounds,
        pfx=pfx,
        keep_word=keep_word,
        sym_expr=(
            "list_transform(range(1, length(w) + 1),\n"
            "                       i -> CASE WHEN i = 1 THEN w[i]\n"
            "                                 ELSE '##' || w[i] END)"
        ),
        argmax_cte=argmax,
    )


def _wp_merges_oracle(n_merges: int = 8) -> str:
    """Synthesized oracle for ``vocab_wordpiece_merges`` (rows-only →
    hash-green upgrade): the full scored merge table from the
    unrolled replay; score rounded with the same floor-form pround
    as the Spark side."""
    unions = "\n  UNION ALL ".join(
        f'SELECT {k} AS rank, l AS "left", r AS "right", merged,'
        f" CAST(pc AS BIGINT) AS pair_count,"
        f" FLOOR(score * 1000000 + 0.5) / 1000000 AS score FROM m{k}"
        for k in range(n_merges)
    )
    return f"WITH {_wp_rounds_sql(n_merges, keep_word=False)}\n  {unions}"


@register(
    "vocab_wordpiece_merges",
    oracle=_wp_merges_oracle(),
    category="pipeline",
)
def vocab_wordpiece_merges(spark, t):
    """Distributed WordPiece training (Schuster & Nakajima 2012 /
    BERT; operators/wordpiece.py) — 8 likelihood-scored merge rounds
    (score = count(ab)/(count(a)count(b)), the discriminator vs
    BPE's raw-count argmax) over the ##-decomposed distinct-word
    table. Per round: pair + symbol count aggregates (symbol side
    broadcast), TakeOrdered(1) argmax — one row to the driver — then
    an Arrow-batched merge rewrite with lineage cut."""
    from ..operators import wordpiece as wp

    merges = wp.train_wordpiece(t.documents, "text", n_merges=8)
    from ..functions.hive_compat import pround

    df = spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string,"
        " pair_count long, score double",
    )
    return df.select(
        "rank", "left", "right", "merged", "pair_count",
        pround(F.col("score")).alias("score"),
    ).orderBy("rank")


def _wp_encode_rounds(pfx: str, vocab_cte: str, words_src: str,
                      max_pieces: int = 12) -> str:
    """BERT greedy longest-match-first encoder as ``max_pieces``
    unrolled consume-one-piece rounds per distinct word of
    ``words_src`` (a FROM-able producing column ``w``); each piece
    covers ≥1 char, so rounds bounded by word length — corpus max is
    8 chars, pinned in
    tests/test_wordpiece.py::test_wp_apply_oracle_preconditions.
    A word with an unmatchable remainder collapses to ['[UNK]'],
    kernel-identically. ``{pfx}wtok`` emits FINISHED words only
    (failed, or fully consumed): a word still mid-encode after
    ``max_pieces`` rounds (possible only if the ≤12-char
    precondition breaks on a future testdata regen) drops out, so
    the violation surfaces as a loud missing-row mismatch instead of
    silently emitting a truncated token list.
    Emits ``{pfx}wtok`` (w, toks, nt, nu)."""
    rounds = []
    for k in range(max_pieces):
        rounds.append(
            f"""
{pfx}b{k} AS MATERIALIZED (
  SELECT t.w, MAX(c.i) AS bend
  FROM {pfx}e{k} t,
       LATERAL (SELECT unnest(range(t.start, length(t.w) + 1)) AS i) c
  JOIN {vocab_cte} v
    ON v.sym = (CASE WHEN t.start > 1 THEN '##' ELSE '' END)
               || t.w[t.start:c.i]
  WHERE NOT t.failed AND t.start <= length(t.w)
  GROUP BY t.w
),
{pfx}e{k + 1} AS MATERIALIZED (
  SELECT t.w,
         CASE WHEN t.failed OR t.start > length(t.w) THEN t.start
              WHEN b.bend IS NULL THEN t.start
              ELSE b.bend + 1 END AS start,
         CASE WHEN t.failed OR t.start > length(t.w) THEN t.toks
              WHEN b.bend IS NULL THEN ['[UNK]']
              ELSE list_append(t.toks,
                     (CASE WHEN t.start > 1 THEN '##' ELSE '' END)
                     || t.w[t.start:b.bend]) END AS toks,
         (t.failed OR (t.start <= length(t.w) AND b.bend IS NULL)) AS failed
  FROM {pfx}e{k} t LEFT JOIN {pfx}b{k} b USING (w)
)"""
        )
    return f"""
{pfx}e0 AS MATERIALIZED (
  SELECT DISTINCT w, 1 AS start, CAST([] AS VARCHAR[]) AS toks,
         FALSE AS failed
  FROM {words_src}
  WHERE w <> ''
),{",".join(rounds)},
{pfx}wtok AS MATERIALIZED (
  SELECT w, array_to_string(toks, ' ') AS toks, len(toks) AS nt,
         len(list_filter(toks, x -> x = '[UNK]')) AS nu
  FROM {pfx}e{max_pieces}
  WHERE failed OR start > length(w)
)"""


def _wp_vocab_cte(pfx: str, n_merges: int) -> str:
    """Final WordPiece vocab: the initial ##-alphabet plus every
    merged token (UNION dedups)."""
    merged_unions = "\n    UNION ".join(
        f"SELECT merged AS sym FROM {pfx}m{k}" for k in range(n_merges)
    )
    return f"""
{pfx}vocab AS MATERIALIZED (
  SELECT DISTINCT sym FROM (SELECT unnest(syms) AS sym FROM {pfx}w0) _
    UNION {merged_unions}
)"""


def _wp_apply_oracle(n_merges: int = 8, max_pieces: int = 12) -> str:
    """Synthesized oracle for ``vocab_wordpiece_apply``: train via
    the unrolled replay, build the vocab, greedy-encode every
    distinct word (``_wp_encode_rounds``), rebuild documents."""
    from .oracle_parts import doc_rebuild_sql

    return f"""
WITH {_wp_rounds_sql(n_merges, keep_word=False)},
{_wp_vocab_cte('', n_merges)},
{_wp_encode_rounds(
        'wp_', 'vocab',
        '''(SELECT unnest(string_split(lower(text), ' ')) AS w
        FROM documents) _''',
        max_pieces)},
{doc_rebuild_sql(wtok_cte='wp_wtok',
                 sums=[('nt', 'n_tokens'), ('nu', 'n_unk')])}
"""


@register(
    "vocab_wordpiece_apply",
    oracle=_wp_apply_oracle(),
    category="pipeline",
)
def vocab_wordpiece_apply(spark, t):
    """WordPiece inference (BERT WordpieceTokenizer): greedy
    longest-match-first against the trained vocab — map-only, vocab
    in the Arrow kernel's closure (broadcast in cluster terms),
    per-partition word cache so cost is O(distinct words) under
    Zipf. Output: per-doc token string + counts, [UNK] accounting
    included."""
    from ..operators import wordpiece as wp

    docs = t.documents
    vocab, _ = wp.wordpiece_vocab(docs, "text", n_merges=8)
    return wp.apply_wordpiece(docs, vocab).orderBy("doc_id")


@register(
    "contract_referential_integrity",
    oracle="""
WITH par_cust AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 <> 0),
par_ord AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 89 <> 0),
par_part AS (SELECT p_partkey FROM part WHERE p_partkey % 83 <> 0),
rel AS (
  SELECT 'orders.o_custkey->customer' AS relation,
         (SELECT COUNT(*) FROM orders) AS n_child,
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM par_cust p
                            WHERE p.c_custkey = o.o_custkey)) AS n_orphan
  UNION ALL
  SELECT 'lineitem.l_orderkey->orders',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM par_ord p
                            WHERE p.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM par_part p
                            WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'nation.n_regionkey->region',
         (SELECT COUNT(*) FROM nation),
         (SELECT COUNT(*) FROM nation n
          WHERE NOT EXISTS (SELECT 1 FROM region r
                            WHERE r.r_regionkey = n.n_regionkey))
)
SELECT relation, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphan AS BIGINT) AS n_orphan,
       FLOOR(n_orphan * 1.0 / n_child * 1000000 + 0.5) / 1000000
         AS orphan_pct,
       n_orphan = 0 AS fk_ok
FROM rel ORDER BY relation
""",
    category="pipeline",
)
def contract_referential_integrity(spark, t):
    """Referential-integrity audit — the FK-orphan nightly check of
    a warehouse data contract (the constraint class Hive 1.2 declares
    but never enforces; reference metastore FOREIGN KEY DDL is
    validate-off). Parents are DETERMINISTICALLY broken (custkeys %
    97, orderkeys % 89, partkeys % 83 removed) so every relation has
    a known orphan set; nation→region stays intact as the passing
    row. Each relation is one LEFT ANTI join against the parent key
    set (broadcast for dims, shuffle-keyed for orders at scale) +
    one count — never a row-level EXISTS probe per child."""
    from ..functions.hive_compat import pround

    def audit_row(relation, child, key, parent, pkey):
        n_child = child.count()
        n_orphan = (
            child.select(F.col(key))
            .join(parent.select(F.col(pkey).alias(key)), key, "left_anti")
            .count()
        )
        return (relation, n_child, n_orphan)

    rows = [
        audit_row(
            "orders.o_custkey->customer",
            t.orders,
            "o_custkey",
            t.customer.filter(F.col("c_custkey") % 97 != 0),
            "c_custkey",
        ),
        audit_row(
            "lineitem.l_orderkey->orders",
            t.lineitem,
            "l_orderkey",
            t.orders.filter(F.col("o_orderkey") % 89 != 0),
            "o_orderkey",
        ),
        audit_row(
            "lineitem.l_partkey->part",
            t.lineitem,
            "l_partkey",
            t.part.filter(F.col("p_partkey") % 83 != 0),
            "p_partkey",
        ),
        audit_row(
            "nation.n_regionkey->region",
            t.nation,
            "n_regionkey",
            t.region,
            "r_regionkey",
        ),
    ]
    df = spark.createDataFrame(
        rows, "relation string, n_child long, n_orphan long"
    )
    return df.select(
        "relation",
        "n_child",
        "n_orphan",
        pround(
            F.col("n_orphan").cast("double") / F.col("n_child").cast("double")
        ).alias("orphan_pct"),
        (F.col("n_orphan") == 0).alias("fk_ok"),
    ).orderBy("relation")


@register(
    "events_key_skew_audit",
    oracle="""
WITH k AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
  FROM k
),
top10 AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS top10_rows FROM (
    SELECT cnt FROM k ORDER BY cnt DESC, user_id LIMIT 10
  )
)
SELECT n_rows, n_keys, max_cnt,
       FLOOR(max_cnt * 1.0 / n_rows * 1000000 + 0.5) / 1000000
         AS top1_share,
       FLOOR(top10_rows * 1.0 / n_rows * 1000000 + 0.5) / 1000000
         AS top10_share,
       FLOOR(sum_sq * 1.0 / (n_rows * n_rows) * 1000000 + 0.5) / 1000000
         AS hhi,
       FLOOR(max_cnt * n_keys * 1.0 / n_rows * 1000000 + 0.5) / 1000000
         AS max_over_mean
FROM tot, top10
""",
    category="analytics",
)
def events_key_skew_audit(spark, t):
    """Pre-shuffle key-skew diagnostic — the audit run before keying
    a 100 TB join/groupBy on a candidate column: distinct-key count,
    heaviest key's share, top-10 share, Herfindahl concentration
    index (Σ share² = Σcnt² / N² — exact integer sums, one keyed
    aggregate), and max/mean ratio (the AQE-skew-threshold signal).
    Plan: one groupBy(key) + a TakeOrdered(10) + 1-row summary —
    the cheap pass that decides between a plain shuffle, salting,
    or a broadcast restructure."""
    from ..functions.hive_compat import pround

    k = t.events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = k.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sum_sq"),
    )
    top10 = (
        k.orderBy(F.desc("cnt"), "user_id")
        .limit(10)
        .agg(F.sum("cnt").cast("bigint").alias("top10_rows"))
    )
    return tot.crossJoin(top10).select(
        "n_rows",
        "n_keys",
        "max_cnt",
        pround(
            F.col("max_cnt").cast("double") / F.col("n_rows").cast("double")
        ).alias("top1_share"),
        pround(
            F.col("top10_rows").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("top10_share"),
        pround(
            F.col("sum_sq").cast("double")
            / (F.col("n_rows") * F.col("n_rows")).cast("double")
        ).alias("hhi"),
        pround(
            (F.col("max_cnt") * F.col("n_keys")).cast("double")
            / F.col("n_rows").cast("double")
        ).alias("max_over_mean"),
    )


@register(
    "feature_discretize_bins",
    oracle="""
WITH mm AS (
  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
  FROM lineitem
),
wbin AS (
  SELECT LEAST(CAST(FLOOR((l_extendedprice - lo) / (hi - lo) * 8)
               AS BIGINT), 7) AS bin,
         l_extendedprice AS x
  FROM lineitem, mm
),
dbin AS (
  SELECT NTILE(8) OVER (
           ORDER BY l_extendedprice, l_orderkey, l_linenumber) - 1
           AS bin,
         l_extendedprice AS x
  FROM lineitem
),
u AS (
  SELECT 'equi_width' AS method, bin, x FROM wbin
  UNION ALL
  SELECT 'equi_depth', bin, x FROM dbin
)
SELECT method, CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(x) AS lo, MAX(x) AS hi
FROM u GROUP BY method, bin
ORDER BY method, bin
""",
    category="pipeline",
)
def feature_discretize_bins(spark, t):
    """Numeric feature discretization, both classic flavors over
    l_extendedprice: equi-WIDTH (8 bins over [min, max] — a 1-row
    min/max broadcast + a map-only floor; identical IEEE arithmetic
    on identical doubles, so bin boundaries agree bit-for-bit
    cross-engine) and exact equi-DEPTH (ntile(8) on the
    (value, orderkey, linenumber) total order — threshold-free and
    engine-reproducible, the ccnet_buckets idiom). Scale note: the
    exact-ntile tier is a global sort; at >10⁹ rows the production
    variant assigns bins by sampled thresholds (approx_percentile)
    map-side — same output contract, no total order. Output: per
    (method, bin) population and realized [lo, hi] — the bin table a
    feature store materializes."""
    li = t.lineitem
    mm = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    wbin = li.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * 8
            ).cast("bigint"),
            F.lit(7).cast("bigint"),
        ).alias("bin"),
        F.col("l_extendedprice").alias("x"),
    )
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    dbin = li.select(
        (F.ntile(8).over(w) - 1).cast("bigint").alias("bin"),
        F.col("l_extendedprice").alias("x"),
    )
    u = wbin.select(F.lit("equi_width").alias("method"), "bin", "x").unionAll(
        dbin.select(F.lit("equi_depth").alias("method"), "bin", "x")
    )
    return (
        u.groupBy("method", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
        .orderBy("method", "bin")
    )


@register(
    "graph_kcore_membership",
    # Upgraded from rows-only (verdict r9 #3): the peel-to-fixpoint
    # IS SQL-expressible as a recursive CTE — each iteration's
    # working table is the surviving edge set; window COUNT(*) per
    # endpoint gives degrees (the graph is stored symmetric, so the
    # dst partition equals dst's out-degree); recursion stops when
    # no edge is sub-k (the `anybad` full-window guard emits
    # nothing). Integer-only arithmetic → exact. The max-iter rows
    # are re-checked clean at the end: a final round that removed
    # EVERYTHING stops recursion with a dirty last set, and the true
    # core is then empty (NOT EXISTS guard). MATERIALIZED on the
    # edge CTEs stops DuckDB re-inlining the self-join per reference.
    oracle="""
WITH RECURSIVE
li AS MATERIALIZED (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 10 = 0
),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(l1.l_partkey, l2.l_partkey) AS a,
                  GREATEST(l1.l_partkey, l2.l_partkey) AS b
  FROM li l1 JOIN li l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  WHERE l1.l_partkey <> l2.l_partkey
),
dir AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM und
  UNION ALL SELECT b, a FROM und
),
peel(iter, src, dst) AS (
  SELECT 0, src, dst FROM dir
  UNION ALL
  SELECT iter + 1, src, dst FROM (
    SELECT iter, src, dst, dsrc, ddst,
           MAX(CASE WHEN dsrc < 10 OR ddst < 10 THEN 1 ELSE 0 END)
             OVER () AS anybad
    FROM (
      SELECT iter, src, dst,
             COUNT(*) OVER (PARTITION BY src) AS dsrc,
             COUNT(*) OVER (PARTITION BY dst) AS ddst
      FROM peel
    ) t
  ) g
  WHERE dsrc >= 10 AND ddst >= 10 AND anybad = 1
),
last AS (
  SELECT src, dst,
         COUNT(*) OVER (PARTITION BY src) AS dsrc,
         COUNT(*) OVER (PARTITION BY dst) AS ddst
  FROM peel WHERE iter = (SELECT MAX(iter) FROM peel)
)
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM last
WHERE NOT EXISTS (SELECT 1 FROM last WHERE dsrc < 10 OR ddst < 10)
GROUP BY src
ORDER BY node
""",
    category="pipeline",
)
def graph_kcore_membership(spark, t):
    """10-core of the part co-purchase graph
    (operators/components.k_core): iterative peel — remove every
    node of degree < 10, recompute, repeat to fixpoint — each round
    one degree groupBy + two anti-joins keyed on node id, lineage
    cut per round. The dense-nucleus diagnostic beside
    graph_triangle_count; at warehouse scale the peel touches only
    the shrinking frontier, never re-reads the corpus."""
    from ..operators.components import k_core

    li = t.lineitem.filter(F.col("l_orderkey") % 10 == 0).select(
        "l_orderkey", "l_partkey"
    )
    pairs = li.alias("l1").join(
        li.alias("l2"),
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
    ).select(
        F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b")
    )
    return k_core(pairs, k=10).orderBy("node")


@register(
    "dedup_containment_prefix",
    oracle="""
WITH base AS (
  SELECT doc_id, lower(text) AS text FROM documents
),
snip AS (
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(
           list_slice(string_split(text, ' '), 1,
                      CAST(ceil(len(string_split(text, ' ')) / 2.0)
                           AS BIGINT)),
           ' ') AS text
  FROM base WHERE doc_id % 25 = 0
),
u AS (SELECT * FROM base UNION ALL SELECT * FROM snip),
sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 3
              THEN list_distinct([
                array_to_string(list_slice(string_split(text, ' '),
                                           i, i + 2), ' ')
                for i in range(1, len(string_split(text, ' ')) - 1)])
              ELSE [] END AS s
  FROM u
)
SELECT a.doc_id AS id_in, b.doc_id AS id_of,
       FLOOR(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(a.s) * 1000000 + 0.5) / 1000000 AS containment
FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
WHERE len(a.s) > 0 AND len(b.s) > 0
  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.8
ORDER BY id_in, id_of
""",
    category="pipeline",
)
def dedup_containment_prefix(spark, t):
    """Asymmetric-containment dedup, the PROVABLY-COMPLETE tier
    (operators/dedup.containment_pairs): |S(A)∩S(B)|/|S(A)| ≥ 0.8 —
    true A-normalized containment with one-sided PREFIX filtering
    (a guarantee, unlike dedup_containment_pairs' capped-df
    candidate heuristic which trades completeness for a posting
    bound, and unlike its min-normalization). Planted
    ground truth: every doc_id % 25 == 0 gets a half-length snippet
    twin (id + 1e6) whose shingles are a subset of its own, so each
    planted pair must surface with containment 1. One-sided prefix
    filtering keeps candidate generation keyed on globally-rare
    shingles; the oracle is the O(N²) brute force — results must be
    identical."""
    from ..functions.hive_compat import pround
    from ..operators import dedup as dd

    base = t.documents.select("doc_id", F.lower(F.col("text")).alias("text"))
    w = F.split(F.col("text"), " ")
    snip = base.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(
            F.slice(w, 1, F.ceil(F.size(w) / 2.0).cast("int")), " "
        ).alias("text"),
    )
    u = base.unionAll(snip)
    return (
        dd.containment_pairs(u, "doc_id", "text", threshold=0.8)
        .select("id_in", "id_of", pround(F.col("containment")).alias("containment"))
        .orderBy("id_in", "id_of")
    )


@register(
    "agg_pivot_wide",
    oracle="""
SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
         AS purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
FROM events GROUP BY day ORDER BY day
""",
    category="aggregates",
)
def agg_pivot_wide(spark, t):
    """Native pivot — RelationalGroupedDataset.pivot with an
    EXPLICIT value list (day × event_type → wide per-type count
    columns). The explicit list matters at scale: without it Spark
    runs an extra distinct-values job AND the output schema becomes
    data-dependent — both wrong for a 100 TB nightly job. Catalyst
    compiles this to exactly the SUM(CASE) single-pass pivot of
    Hive idiom (q12), one keyed aggregate, no second scan. Missing
    combinations land as 0 via the count aggregate."""
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        t.events.select(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .groupBy("day")
        .pivot("event_type", types)
        .count()
    )
    return out.select(
        "day", *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in types]
    ).orderBy("day")


@register(
    "feature_winsorize",
    oracle="""
WITH th AS (
  SELECT quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem
),
wz AS (
  SELECT l_extendedprice AS x,
         LEAST(GREATEST(l_extendedprice, p01), p99) AS xw,
         l_extendedprice < p01 AS lo, l_extendedprice > p99 AS hi
  FROM lineitem, th
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (lo) AS BIGINT) AS n_clipped_lo,
       CAST(COUNT(*) FILTER (hi) AS BIGINT) AS n_clipped_hi,
       (SELECT FLOOR(p01 * 1000000 + 0.5) / 1000000 FROM th) AS p01,
       (SELECT FLOOR(p99 * 1000000 + 0.5) / 1000000 FROM th) AS p99,
       CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(38,6))) AS DOUBLE)
         / COUNT(*) AS mean_raw,
       CAST(SUM(CAST(ROUND(xw, 6) AS DECIMAL(38,6))) AS DOUBLE)
         / COUNT(*) AS mean_winsorized
FROM wz
""",
    category="pipeline",
)
def feature_winsorize(spark, t):
    """Winsorization — the outlier-clipping feature-prep step: clip
    l_extendedprice at its exact [p1, p99] percentiles (both engines
    interpolate quantile_cont identically — lang_percentile_gate
    precedent), report clip counts and the raw-vs-winsorized means
    (decimal-exact sums, one final IEEE division). Plan: one exact
    percentile pass + a 1-row threshold broadcast + one map-only
    clip-and-aggregate pass; at >10⁹ rows the first pass swaps to
    approx_percentile with the same downstream contract."""
    from ..functions.hive_compat import pround
    from ..operators.util import ensure_parallelism

    # Exact percentile buffers the full value multiset per partition
    # before the merge — on an under-split scan that serializes the
    # accumulation on one core (A/B sf0.1 warm: 4.2s -> 2.6s split;
    # values are partition-order-independent). No-op at scale.
    li = ensure_parallelism(
        t.lineitem.select(F.col("l_extendedprice").alias("x"))
    )
    th = li.agg(
        F.expr("percentile(x, 0.01)").alias("p01"),
        F.expr("percentile(x, 0.99)").alias("p99"),
    )
    wz = li.crossJoin(F.broadcast(th)).select(
        "x",
        F.least(F.greatest(F.col("x"), F.col("p01")), F.col("p99")).alias(
            "xw"
        ),
        (F.col("x") < F.col("p01")).alias("lo"),
        (F.col("x") > F.col("p99")).alias("hi"),
        "p01",
        "p99",
    )
    return wz.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_if(F.col("lo")).cast("bigint").alias("n_clipped_lo"),
        F.count_if(F.col("hi")).cast("bigint").alias("n_clipped_hi"),
        pround(F.first("p01")).alias("p01"),
        pround(F.first("p99")).alias("p99"),
        (
            F.sum(F.round(F.col("x"), 2).cast("decimal(38,6)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mean_raw"),
        (
            F.sum(F.round(F.col("xw"), 6).cast("decimal(38,6)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mean_winsorized"),
    )


@register(
    "feature_target_encode_oof",
    oracle="""
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_returnflag AS cat,
         CAST(l_quantity AS DECIMAL(18,2)) AS y,
         (l_orderkey * 7 + l_linenumber) % 5 AS fold
  FROM lineitem
),
f AS (
  SELECT cat, fold,
         CAST(COUNT(*) AS BIGINT) AS n_f,
         CAST(SUM(y) AS DECIMAL(38,2)) AS s_f
  FROM base GROUP BY cat, fold
),
tot AS (
  SELECT cat, CAST(SUM(n_f) AS BIGINT) AS n_t,
         CAST(SUM(s_f) AS DECIMAL(38,2)) AS s_t
  FROM f GROUP BY cat
)
SELECT f.cat, f.fold, f.n_f,
       FLOOR(CAST(t.s_t - f.s_f AS DOUBLE) / (t.n_t - f.n_f)
             * 1000000 + 0.5) / 1000000 AS oof_mean,
       FLOOR(CAST(t.s_t AS DOUBLE) / t.n_t * 1000000 + 0.5) / 1000000
         AS full_mean
FROM f JOIN tot t USING (cat)
ORDER BY cat, fold
""",
    category="pipeline",
)
def feature_target_encode_oof(spark, t):
    """Out-of-fold target encoding — the leakage-controlled
    mean-target categorical encoder (each fold's encoding is the
    target mean over the OTHER four folds, so a row never sees its
    own label; the K-fold trick every gradient-boosting feature
    pipeline uses). The fold key must be ENGINE-PORTABLE, so both
    sides use plain (l_orderkey*7 + l_linenumber) % 5 arithmetic —
    never an engine hash(), which differs between engines.
    Exact decimal target sums make the leave-fold-out
    subtraction (s_tot − s_fold)/(n_tot − n_fold) exact before ONE
    IEEE division + pround. Plan: one (cat, fold) aggregate (25
    cells), one cat rollup, broadcast join — map-side combine does
    all the work; scales as a pure keyed aggregate."""
    from ..functions.hive_compat import pround

    base = t.lineitem.select(
        F.col("l_returnflag").alias("cat"),
        F.col("l_quantity").cast("decimal(18,2)").alias("y"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 5).alias(
            "fold"
        ),
    )
    f = base.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_f"),
        F.sum("y").cast("decimal(38,2)").alias("s_f"),
    )
    tot = f.groupBy("cat").agg(
        F.sum("n_f").cast("bigint").alias("n_t"),
        F.sum("s_f").cast("decimal(38,2)").alias("s_t"),
    )
    return (
        f.join(F.broadcast(tot), "cat")
        .select(
            "cat",
            "fold",
            "n_f",
            pround(
                (F.col("s_t") - F.col("s_f")).cast("double")
                / (F.col("n_t") - F.col("n_f")).cast("double")
            ).alias("oof_mean"),
            pround(
                F.col("s_t").cast("double") / F.col("n_t").cast("double")
            ).alias("full_mean"),
        )
        .orderBy("cat", "fold")
    )


def _z16_sql_duckdb(x: str, y: str) -> str:
    """DuckDB expression: 32-bit Morton interleave of two 16-bit
    ints — x in even bit positions, y in odd."""
    terms = []
    for i in range(16):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _z16_col(x, y):
    """Spark column: the identical Morton interleave (shiftright /
    bitwise-and / shiftleft — pure JVM integer ops, codegen-fused)."""
    terms = []
    for i in range(16):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(
                F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


@register(
    "fmt_zorder_value",
    oracle=f"""
SELECT l_partkey, l_suppkey,
       CAST({_z16_sql_duckdb('(l_partkey % 65536)', '(l_suppkey % 65536)')}
            AS BIGINT) AS zval
FROM lineitem
WHERE l_orderkey % 50 = 0
ORDER BY zval, l_partkey, l_suppkey
""",
    category="formats",
)
def fmt_zorder_value(spark, t):
    """Z-order (Morton) clustering key — the multi-dimensional
    sort that makes min/max row-group statistics selective on BOTH
    columns at once (the Delta/Iceberg OPTIMIZE ZORDER analogue; at
    100 TB the difference between pruning on one leading sort column
    and pruning on every probed dimension). The 32-bit interleave of
    two 16-bit keys is 64 pure integer bit-ops — whole-stage-codegen
    fused, map-only. The skipping payoff (row groups touched by a
    box probe under z-sort vs linear sort) is pinned against real
    parquet footer statistics in tests/test_pipeline6.py."""
    li = t.lineitem.filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_partkey",
        "l_suppkey",
        _z16_col(
            (F.col("l_partkey") % 65536).cast("int"),
            (F.col("l_suppkey") % 65536).cast("int"),
        )
        .cast("bigint")
        .alias("zval"),
    ).orderBy("zval", "l_partkey", "l_suppkey")


@register(
    "corpus_clean_v9",
    oracle=r"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents
  WHERE len(string_split(text, ' ')) >= 21
),
lines AS (
  SELECT doc_id,
         [
           array_to_string(list_slice(w, 1, 6), ' ')
             || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END
             || '.',
           array_to_string(list_slice(w, 7, 11), ' ')
             || CASE WHEN doc_id % 17 = 0 THEN ' obscenityalpha' ELSE '' END
             || CASE WHEN doc_id % 19 = 0 THEN ' javascript' ELSE '' END
             || '.',
           array_to_string(list_slice(w, 12, 14), ' ')
             || CASE WHEN doc_id % 13 = 0 THEN ' {var}' ELSE '' END,
           array_to_string(list_slice(w, 15, 21), ' ')
             || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END
         ] AS ls
  FROM base
),
page AS (
  SELECT doc_id, array_to_string(ls, ' | ') AS page_text,
         array_to_string(list_filter(ls, x ->
           regexp_matches(x, '[.!?"]$')
           AND len(string_split(x, ' ')) >= 5
           AND NOT contains(lower(x), 'javascript')), ' ') AS kt
  FROM lines
),
keepers AS (
  SELECT doc_id FROM page
  WHERE (len(kt) - len(replace(replace(replace(kt,
           '.', ''), '!', ''), '?', ''))) >= 3
    AND NOT contains(page_text, '{')
    AND NOT contains(lower(page_text), 'lorem ipsum')
    AND NOT contains(lower(page_text), 'obscenityalpha')
    AND NOT contains(lower(page_text), 'obscenitybeta')
),
surv AS (
  SELECT d.doc_id, d.source, lower(d.text) AS text
  FROM documents d SEMI JOIN keepers k ON d.doc_id = k.doc_id
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 3
              THEN list_distinct([
                array_to_string(list_slice(string_split(text, ' '),
                                           i, i + 2), ' ')
                for i in range(1, len(string_split(text, ' ')) - 1)])
              ELSE [] END AS s
  FROM surv
),
pairs AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
  WHERE len(a.s) > 0 AND len(b.s) > 0
    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.8
),
mut AS (
  SELECT p.ia, p.ib FROM pairs p
  SEMI JOIN pairs q ON p.ia = q.ib AND p.ib = q.ia
),
drops AS (
  SELECT ia AS doc_id FROM pairs
  ANTI JOIN mut ON pairs.ia = mut.ia AND pairs.ib = mut.ib
  UNION
  SELECT ia FROM mut WHERE ia > ib
),
final AS (
  SELECT s.* FROM surv s ANTI JOIN drops d ON s.doc_id = d.doc_id
)
SELECT src.source, src.n_docs,
       COALESCE(k.n_kept, 0) AS n_c4_kept,
       COALESCE(f.n_final, 0) AS n_final,
       COALESCE(f.tokens_final, 0) AS tokens_final
FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source) src
LEFT JOIN (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM documents d SEMI JOIN keepers k ON d.doc_id = k.doc_id
  GROUP BY d.source) k USING (source)
LEFT JOIN (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_final,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
           AS tokens_final
  FROM final GROUP BY source) f USING (source)
ORDER BY src.source
""",
    category="pipeline",
)
def corpus_clean_v9(spark, t):
    """Flagship pipeline v9 — the crawl-to-corpus front half
    composed from this round's operators, ONE plan with ONE
    CTE-stack oracle: (1) the C4 rule battery gates pages (shared
    _c4_page construction — the gate cannot drift from
    quality_c4_rules); (2) survivors pass through the
    provably-complete asymmetric-containment join (θ=0.8,
    operators/dedup.containment_pairs) and every contained doc is
    dropped — mutual containments (exact dups) keep the smaller id;
    (3) the per-source audit reports raw/kept/final doc counts and
    surviving token mass. All stages keyed or prefix-filtered; the
    quadratic exists only in the oracle."""
    from ..operators import dedup as dd

    d = t.documents
    keepers = (
        _c4_page(d).filter(_c4_keep_flag()).select("doc_id")
    )
    surv = d.join(keepers, "doc_id", "left_semi").select(
        "doc_id", "source", F.lower(F.col("text")).alias("text")
    )
    p = dd.containment_pairs(
        surv, "doc_id", "text", threshold=0.8
    ).select(F.col("id_in").alias("ia"), F.col("id_of").alias("ib"))
    swapped = p.select(
        F.col("ib").alias("ia"), F.col("ia").alias("ib")
    )
    mut = p.join(swapped, ["ia", "ib"], "left_semi")
    drops = (
        p.join(swapped, ["ia", "ib"], "left_anti")
        .select("ia")
        .union(mut.filter(F.col("ia") > F.col("ib")).select("ia"))
        .distinct()
        .withColumnRenamed("ia", "doc_id")
    )
    final = surv.join(drops, "doc_id", "left_anti")
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    kept = (
        d.join(keepers, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_c4_kept"))
    )
    fin = final.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_final"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("tokens_final"),
    )
    return (
        src.join(kept, "source", "left")
        .join(fin, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_c4_kept", F.lit(0)).alias("n_c4_kept"),
            F.coalesce("n_final", F.lit(0)).alias("n_final"),
            F.coalesce("tokens_final", F.lit(0)).alias("tokens_final"),
        )
        .orderBy("source")
    )


@register(
    "audit_benford_first_digit",
    oracle="""
WITH digits AS (
  -- FLOOR pinned on both sides: DuckDB's DOUBLE->BIGINT cast
  -- ROUNDS while Spark's truncates (observed: 2-row drift at sf0.01)
  SELECT CAST(substring(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
              AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM lineitem WHERE l_extendedprice >= 1
),
obs AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs),
exp AS (
  SELECT d, CAST(ROUND(log10(1 + 1.0 / d), 6) AS DECIMAL(38,6)) AS p
  FROM (SELECT unnest(generate_series(1, 9)) AS d)
)
SELECT e.d AS digit, COALESCE(o.n, 0) AS n_obs,
       FLOOR(COALESCE(o.n, 0) * 1.0 / t.total * 1000000 + 0.5) / 1000000
         AS p_obs,
       CAST(e.p AS DOUBLE) AS p_benford,
       FLOOR(POWER(COALESCE(o.n, 0) - CAST(e.p AS DOUBLE) * t.total, 2)
             / (CAST(e.p AS DOUBLE) * t.total) * 1000000 + 0.5) / 1000000
         AS chi2_term
FROM exp e LEFT JOIN obs o ON e.d = o.d, tot t
ORDER BY e.d
""",
    category="analytics",
)
def audit_benford_first_digit(spark, t):
    """Benford's-law first-digit audit — the classic
    fabricated-numbers screen a warehouse runs over monetary
    columns: observed leading-digit distribution of l_extendedprice
    vs the Benford expectation log10(1 + 1/d), with per-digit χ²
    terms. Expectations are rounded to 6 into DECIMAL (irrational
    logs never tie — the Zipf idiom); the χ² arithmetic is then
    identical IEEE on both engines, pround-ed. One map-only digit
    extraction + a 9-cell aggregate; the expectation table is a
    9-row literal sequence, no second scan."""
    from ..functions.hive_compat import pround

    digits = t.lineitem.filter(F.col("l_extendedprice") >= 1).select(
        F.substring(
            F.floor(F.col("l_extendedprice")).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = obs.agg(F.sum("n").cast("bigint").alias("total"))
    exp = spark.range(1, 10).select(
        F.col("id").cast("bigint").alias("digit"),
        F.round(F.log10(1 + 1.0 / F.col("id")), 6)
        .cast("decimal(38,6)")
        .alias("p"),
    )
    joined = (
        exp.join(obs.withColumnRenamed("d", "digit"), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_obs"),
            pround(
                F.coalesce("n", F.lit(0)).cast("double")
                / F.col("total").cast("double")
            ).alias("p_obs"),
            F.col("p").cast("double").alias("p_benford"),
            pround(
                F.pow(
                    F.coalesce("n", F.lit(0)).cast("double")
                    - F.col("p").cast("double") * F.col("total"),
                    F.lit(2),
                )
                / (F.col("p").cast("double") * F.col("total"))
            ).alias("chi2_term"),
        )
    )
    return joined.orderBy("digit")


@register(
    "sec_policy_enforced_read",
    oracle="""
SELECT c_custkey,
       substring(c_name, 1, 2) || repeat('x', len(c_name) - 2) AS c_name,
       'REDACTED' AS c_mktsegment,
       c_nationkey, c_acctbal
FROM customer
WHERE c_nationkey < 10
ORDER BY c_custkey
""",
    category="pipeline",
)
def sec_policy_enforced_read(spark, t):
    """Row-filter + column-mask policy enforcement
    (functions/policies.apply_policies — the Ranger
    applyRowFilterAndColumnMasking data plane as a PLAN-TIME
    rewrite): the analyst role reads customer through a policy that
    (a) filters to c_nationkey < 10 and (b) masks c_name to
    first-2-then-x and c_mktsegment to a constant. Because enforcement
    is a rewrite, the row filter participates in predicate pushdown
    like any user WHERE (gate in tests/test_policies.py) and masks
    are codegen-fused projections — no UDF, no post-hoc scan."""
    from ..functions.policies import apply_policies

    POLICIES = [
        {
            "table": "customer",
            "users": ["analyst"],
            "row_filter": "c_nationkey < 10",
            "column_masks": {
                "c_name": "concat(substring(c_name, 1, 2),"
                " repeat('x', length(c_name) - 2))",
                "c_mktsegment": "'REDACTED'",
            },
        }
    ]
    out = apply_policies(t.customer, "customer", "analyst", POLICIES)
    return out.select(
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey", "c_acctbal"
    ).orderBy("c_custkey")


@register(
    "events_rolling_median",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day
)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       ROUND(quantile_cont(n, 0.5) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7,
       ROUND(n - quantile_cont(n, 0.5) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS residual
FROM daily ORDER BY event_type, day
""",
    category="analytics",
)
def events_rolling_median(spark, t):
    """Rolling 7-day exact median baseline per event type — the
    robust sliding-window twin of events_ewma_daily (a median
    ignores a one-day spike; the EWMA chases it): ``percentile``
    as a WINDOW aggregate over a bounded 7-row frame. Both engines
    interpolate the continuous median identically over integer
    counts (lang_percentile_gate precedent). Frame-bounded state —
    O(7) per row at any history length; one keyed aggregate + one
    window sharing the (event_type; day) sort."""
    e = t.events
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    med = F.expr("percentile(n, 0.5)").over(w)
    return daily.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.round(med, 6).alias("med7"),
        F.round(F.col("n") - med, 6).alias("residual"),
    ).orderBy("event_type", "day")


@register(
    "feature_quantile_normalize",
    oracle="""
WITH src AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM documents
),
pooled AS (
  SELECT n_chars AS v,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS prn
  FROM documents
),
n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
idx AS (
  SELECT s.doc_id, s.source, s.n_chars,
         CASE WHEN s.n_src = 1 THEN 0.0
              ELSE (s.rn - 1) * 1.0 / (s.n_src - 1) END AS r,
         CAST(FLOOR(CASE WHEN s.n_src = 1 THEN 0.0
              ELSE (s.rn - 1) * 1.0 / (s.n_src - 1) END * (t.n - 1))
              AS BIGINT) + 1 AS i,
         CASE WHEN s.n_src = 1 THEN 0.0
              ELSE (s.rn - 1) * 1.0 / (s.n_src - 1) END * (t.n - 1)
           - FLOOR(CASE WHEN s.n_src = 1 THEN 0.0
              ELSE (s.rn - 1) * 1.0 / (s.n_src - 1) END * (t.n - 1))
           AS frac
  FROM src s, n_tot t
)
SELECT x.doc_id, x.source, CAST(x.n_chars AS BIGINT) AS n_chars,
       FLOOR((lo.v * (1 - x.frac) + COALESCE(hi.v, lo.v) * x.frac)
             * 1000000 + 0.5) / 1000000 AS qnorm
FROM idx x
JOIN pooled lo ON lo.prn = x.i
LEFT JOIN pooled hi ON hi.prn = x.i + 1
ORDER BY x.doc_id
""",
    category="pipeline",
)
def feature_quantile_normalize(spark, t):
    """Cross-source quantile normalization — map every doc's
    within-source percentile of n_chars onto the POOLED
    distribution's quantile function (linear interpolation between
    pooled order statistics), so each source's length distribution
    becomes comparable before mixing. Deterministic total orders
    ((value, doc_id)) on both ranks; index arithmetic and
    interpolation are identical IEEE expressions, pround final.
    Plan: one window per side sharing keyed sorts + two rank-keyed
    equi-joins against the pooled order statistics. Scale note: the
    pooled global row_number is the exact tier; at >10⁹ rows the
    production variant interpolates against a sampled/sketched
    quantile table (mergeable bottom-k) with the same output
    contract."""
    from ..functions.hive_compat import pround

    d = t.documents
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    src = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .alias("n_src"),
    )
    wp = Window.orderBy("n_chars", "doc_id")
    pooled = d.select(
        F.col("n_chars").alias("v"), F.row_number().over(wp).alias("prn")
    )
    n_tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = F.when(F.col("n_src") == 1, F.lit(0.0)).otherwise(
        (F.col("rn") - 1) * 1.0 / (F.col("n_src") - 1)
    )
    scaled = r * (F.col("n") - 1)
    idx = src.crossJoin(F.broadcast(n_tot)).select(
        "doc_id",
        "source",
        "n_chars",
        (F.floor(scaled).cast("bigint") + 1).alias("i"),
        (scaled - F.floor(scaled)).alias("frac"),
    )
    lo = pooled.withColumnsRenamed({"prn": "i", "v": "v_lo"})
    hi = pooled.select(
        (F.col("prn") - 1).alias("i"), F.col("v").alias("v_hi")
    )
    return (
        idx.join(lo, "i")
        .join(hi, "i", "left")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            pround(
                F.col("v_lo") * (1 - F.col("frac"))
                + F.coalesce(F.col("v_hi"), F.col("v_lo")) * F.col("frac")
            ).alias("qnorm"),
        )
        .orderBy("doc_id")
    )


# Fellegi-Sunter model parameters (hand-set reliabilities, as in
# production deployments that import rather than EM-fit them) and
# the derived log2 weights — computed ONCE here so the Spark plan
# and the oracle inline literally identical numbers.
_FS_PARAMS = {
    "name": (0.95, 0.001),
    "acct": (0.90, 0.01),
    "seg": (0.95, 0.20),
}


def _fs_w(m, u):
    import math

    return round(math.log2(m / u), 6), round(
        math.log2((1 - m) / (1 - u)), 6
    )


_FS_W = {k: _fs_w(m, u) for k, (m, u) in _FS_PARAMS.items()}


@register(
    "er_fellegi_sunter",
    oracle=f"""
WITH clean AS (
  SELECT c_custkey AS rid, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer
),
dirty AS (
  SELECT rid + 1000000 AS rid,
         substring(c_name, 1, 11) || 'Z' || substring(c_name, 13)
           AS c_name,
         c_nationkey, c_acctbal + 0.01 AS c_acctbal, c_mktsegment
  FROM clean WHERE rid % 20 = 0
),
u AS (SELECT * FROM clean UNION ALL SELECT * FROM dirty),
pairs AS (
  SELECT a.rid AS id_a, b.rid AS id_b,
         levenshtein(a.c_name, b.c_name) <= 1 AS ag_name,
         abs(a.c_acctbal - b.c_acctbal) <= 0.02 AS ag_acct,
         a.c_mktsegment = b.c_mktsegment AS ag_seg
  FROM u a JOIN u b
    ON a.c_nationkey = b.c_nationkey
   AND len(a.c_name) = len(b.c_name)
   AND substring(a.c_name, 13, 3) = substring(b.c_name, 13, 3)
   AND a.rid < b.rid
),
scored AS (
  SELECT id_a, id_b,
         CAST(CASE WHEN ag_name THEN {_FS_W['name'][0]}
                   ELSE {_FS_W['name'][1]} END AS DECIMAL(38,6))
       + CAST(CASE WHEN ag_acct THEN {_FS_W['acct'][0]}
                   ELSE {_FS_W['acct'][1]} END AS DECIMAL(38,6))
       + CAST(CASE WHEN ag_seg THEN {_FS_W['seg'][0]}
                   ELSE {_FS_W['seg'][1]} END AS DECIMAL(38,6))
           AS match_weight
  FROM pairs
)
SELECT id_a, id_b, CAST(match_weight AS DOUBLE) AS match_weight,
       CASE WHEN CAST(match_weight AS DOUBLE) >= 6.0 THEN 'link'
            WHEN CAST(match_weight AS DOUBLE) <= 0.0 THEN 'non_link'
            ELSE 'possible' END AS decision
FROM scored
WHERE CAST(match_weight AS DOUBLE) > 0.0
ORDER BY id_a, id_b
""",
    category="pipeline",
)
def er_fellegi_sunter(spark, t):
    """Probabilistic record linkage (operators/linkage.py —
    Fellegi & Sunter 1969, the scoring core of Splink-class ER):
    every customer with custkey % 20 == 0 gets a planted dirty twin
    (one substituted name character, +0.01 balance drift), blocking
    on (nationkey, name-length) generates candidates — never
    all-pairs — and each pair scores Σ log2(m/u) / log2((1-m)/(1-u))
    over three field comparators (levenshtein ≤ 1 name, ±0.02
    balance, segment equality). DECIMAL-exact weight sums from
    literals shared between plan and oracle; three-way
    link / possible / non_link decision; output is the above-floor
    pairs (the link set = exactly the planted twins, pinned in
    tests)."""
    from ..operators.linkage import score_pairs

    pairs = _er_candidate_pairs(t)  # shared with er_em_parameters
    m_n, u_n = _FS_PARAMS["name"]
    m_a, u_a = _FS_PARAMS["acct"]
    m_s, u_s = _FS_PARAMS["seg"]
    scored = score_pairs(
        pairs,
        [
            (F.col("ag_name"), m_n, u_n),
            (F.col("ag_acct"), m_a, u_a),
            (F.col("ag_seg"), m_s, u_s),
        ],
        upper=6.0,
        lower=0.0,
    )
    return (
        scored.filter(F.col("match_weight").cast("double") > 0.0)
        .select(
            "id_a",
            "id_b",
            F.col("match_weight").cast("double").alias("match_weight"),
            "decision",
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "dedup_lsh_s_curve",
    oracle="""
WITH s AS (
  SELECT unnest(generate_series(1, 19)) * 0.05 AS sim
)
SELECT FLOOR(sim * 1000000 + 0.5) / 1000000 AS sim,
       FLOOR((1 - POWER(1 - POWER(sim, 2), 32)) * 1000000 + 0.5)
         / 1000000 AS p_candidate,
       FLOOR(POWER(1.0 / 32, 1.0 / 2) * 1000000 + 0.5) / 1000000
         AS s_threshold
FROM s ORDER BY sim
""",
    category="pipeline",
)
def dedup_lsh_s_curve(spark, t):
    """The MinHash-LSH tuning S-curve for the registry's production
    config (64 hashes = 32 bands × 2 rows,
    operators/dedup.near_duplicate_pairs defaults): candidate
    probability P(s) = 1 − (1 − s^r)^b over a similarity grid, plus
    the threshold similarity (1/b)^(1/r) ≈ 0.177 where the curve
    crosses half-weight steepest. This is the design table an
    engineer consults before re-tuning (b, r) for a new corpus —
    published as a query so the tuning math ships WITH the engine
    and can never drift from the code's defaults. Pure IEEE
    arithmetic, identical cross-engine; no table scan at all."""
    from ..functions.hive_compat import pround

    r, b = 2, 32  # rows-per-band, bands — near_duplicate_pairs defaults
    s = spark.range(1, 20).select((F.col("id") * 0.05).alias("sim"))
    return s.select(
        pround(F.col("sim")).alias("sim"),
        pround(
            1 - F.pow(1 - F.pow(F.col("sim"), F.lit(r)), F.lit(b))
        ).alias("p_candidate"),
        pround(F.pow(F.lit(1.0 / b), F.lit(1.0 / r))).alias(
            "s_threshold"
        ),
    ).orderBy("sim")


@register(
    "events_error_streaks",
    oracle="""
WITH counts AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day
),
med AS (
  SELECT event_type, median(n) AS med FROM counts GROUP BY event_type
),
daily AS (
  SELECT c.event_type, c.day
  FROM counts c JOIN med m USING (event_type)
  WHERE c.n > m.med
),
isl AS (
  SELECT event_type, day,
         CAST(day - INTERVAL (ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY day)) DAY AS DATE) AS grp
  FROM daily
),
streaks AS (
  SELECT event_type, MIN(day) AS streak_start, MAX(day) AS streak_end,
         CAST(COUNT(*) AS BIGINT) AS streak_days
  FROM isl GROUP BY event_type, grp
)
SELECT event_type, streak_start, streak_end, streak_days
FROM streaks
ORDER BY event_type, streak_start
""",
    category="analytics",
)
def events_error_streaks(spark, t):
    """Gaps-and-islands — consecutive ABOVE-MEDIAN-volume day
    streaks per event type: the classic SQL pattern (day −
    row_number = constant within an unbroken run) that turns
    'longest elevated window' questions into one window + one keyed
    aggregate, no self-join, no iteration (above-median rather than
    mere presence, because the synthetic stream has events every
    day — presence streaks would be one vacuous island). Output:
    every streak with bounds and length; medians interpolate
    identically cross-engine. Frame-free window, O(1) state per
    row."""
    counts = t.events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = counts.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    daily = (
        counts.join(F.broadcast(med), "event_type")
        .filter(F.col("n") > F.col("med"))
        .select("event_type", "day")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    isl = daily.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        isl.groupBy("event_type", "grp")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        )
        .drop("grp")
        .orderBy("event_type", "streak_start")
    )


@register(
    "events_cumulative_uniques",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
  FROM events GROUP BY user_id
),
new_per_day AS (
  SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM first_seen GROUP BY d0
),
cal AS (
  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events
)
SELECT c.day, COALESCE(n.n_new, 0) AS n_new,
       CAST(SUM(COALESCE(n.n_new, 0)) OVER (
         ORDER BY c.day ROWS BETWEEN UNBOUNDED PRECEDING
         AND CURRENT ROW) AS BIGINT) AS cume_uniques
FROM cal c LEFT JOIN new_per_day n ON c.day = n.day
ORDER BY c.day
""",
    category="analytics",
)
def events_cumulative_uniques(spark, t):
    """Cumulative distinct users per day — the growth-curve query
    every dashboard wants, computed WITHOUT the quadratic trap
    (COUNT(DISTINCT) over an ever-growing window re-scans history
    per day): a user contributes on exactly their FIRST-SEEN day
    (one keyed min), daily new-user counts running-sum over the
    calendar — |days| rows in the window, not |events|. The exact
    tier of the same first-seen trick that scales to 100 TB; the
    approximate tier is the mergeable HLL family
    (agg_hll_set_ops)."""
    e = t.events
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    new_per_day = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    cal = e.select(F.col("ts").cast("date").alias("day")).distinct()
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cal.join(new_per_day, "day", "left")
        .select("day", F.coalesce("n_new", F.lit(0)).alias("n_new"))
        .withColumn(
            "cume_uniques", F.sum("n_new").over(w).cast("bigint")
        )
        .orderBy("day")
    )


@register(
    "report_topn_other",
    oracle="""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, source) AS rk
  FROM counts
)
SELECT CASE WHEN rk <= 5 THEN source ELSE 'Other' END AS source_group,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS chars,
       CAST(MIN(rk) AS BIGINT) AS rank_order
FROM ranked
GROUP BY CASE WHEN rk <= 5 THEN source ELSE 'Other' END
ORDER BY rank_order
""",
    category="analytics",
)
def report_topn_other(spark, t):
    """Top-5 sources + 'Other' rollup — the reporting classic that
    keeps dashboards bounded no matter the category cardinality:
    rank on a pre-aggregated counts table (|sources| rows — the
    rank window never sees raw docs), conditional regroup, remainder
    folds into one row ordered last. Deterministic tie-break by
    source name."""
    counts = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    w = Window.orderBy(F.desc("n_docs"), "source")
    ranked = counts.withColumn("rk", F.row_number().over(w))
    grp = F.when(F.col("rk") <= 5, F.col("source")).otherwise(
        F.lit("Other")
    )
    return (
        ranked.groupBy(grp.alias("source_group"))
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("chars").cast("bigint").alias("chars"),
            F.min("rk").cast("bigint").alias("rank_order"),
        )
        .orderBy("rank_order")
    )


def _er_candidate_pairs(t):
    """The er_fellegi_sunter candidate construction (planted dirty
    twins + blocked pairs + comparator flags), shared with the EM
    trainer so the two queries see the identical pair universe."""
    clean = t.customer.select(
        F.col("c_custkey").alias("rid"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    dirty = clean.filter(F.col("rid") % 20 == 0).select(
        (F.col("rid") + 1000000).alias("rid"),
        F.concat(
            F.substring("c_name", 1, 11),
            F.lit("Z"),
            F.substring("c_name", 13, 100),
        ).alias("c_name"),
        "c_nationkey",
        (F.col("c_acctbal") + 0.01).alias("c_acctbal"),
        "c_mktsegment",
    )
    u = clean.unionAll(dirty)
    a, b = u.alias("a"), u.alias("b")
    # Blocking key: (nationkey, name-length, digits 13-15). The
    # third component is what keeps block sizes BOUNDED as the
    # customer table grows — without it blocks are |customers|/25
    # and candidate pairs grow quadratically (measured: 4.5M pairs
    # and 30s at sf0.1; ~3s with it). Positions 13-15 avoid the
    # dirty twin's substituted position 12, so every planted link
    # stays in-block; links whose names differ inside the fragment
    # are the recall trade every blocking scheme states up front.
    return a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.length("a.c_name") == F.length("b.c_name"))
        & (
            F.substring("a.c_name", 13, 3)
            == F.substring("b.c_name", 13, 3)
        )
        & (F.col("a.rid") < F.col("b.rid")),
    ).select(
        F.col("a.rid").alias("id_a"),
        F.col("b.rid").alias("id_b"),
        (F.levenshtein("a.c_name", "b.c_name") <= 1).alias("ag_name"),
        (
            F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 0.02
        ).alias("ag_acct"),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias(
            "ag_seg"
        ),
    )


def _em_oracle_sql(n_iter: int = 30) -> str:
    """Synthesized DuckDB oracle for the fixed-round Fellegi-Sunter
    EM (verdict r9 #3 pattern): the contingency table is plain SQL
    (the same blocked self-join; DuckDB's native levenshtein), and
    the 30 EM rounds unroll as 1-row state CTEs (λ, m₁..m₃, u₁..u₃)
    mirroring operators/linkage.em_fit term by term — same float64
    expression forms (pm multiplied field-by-field left-assoc,
    w_non = n_total − w_match), so both engines run identical IEEE
    arithmetic over the identical 8-row table; final values pass
    through the house pround floor-form. MATERIALIZED stops DuckDB
    re-inlining each round at every reference."""
    sql = """WITH
clean AS MATERIALIZED (
  SELECT c_custkey AS rid, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer
),
dirty AS MATERIALIZED (
  SELECT rid + 1000000 AS rid,
         substring(c_name, 1, 11) || 'Z' || substring(c_name, 13)
           AS c_name,
         c_nationkey, c_acctbal + 0.01 AS c_acctbal, c_mktsegment
  FROM clean WHERE rid % 20 = 0
),
u AS MATERIALIZED (SELECT * FROM clean UNION ALL SELECT * FROM dirty),
ct AS MATERIALIZED (
  SELECT (levenshtein(a.c_name, b.c_name) <= 1) AS pat_name,
         (ABS(a.c_acctbal - b.c_acctbal) <= 0.02) AS pat_acct,
         (a.c_mktsegment = b.c_mktsegment) AS pat_seg,
         COUNT(*) AS n
  FROM u a JOIN u b
    ON a.c_nationkey = b.c_nationkey
   AND length(a.c_name) = length(b.c_name)
   AND substring(a.c_name, 13, 3) = substring(b.c_name, 13, 3)
   AND a.rid < b.rid
  GROUP BY 1, 2, 3
),
s0 AS MATERIALIZED (
  SELECT CAST(0.01 AS DOUBLE) AS lam,
         CAST(0.9 AS DOUBLE) AS m1, CAST(0.9 AS DOUBLE) AS m2,
         CAST(0.9 AS DOUBLE) AS m3,
         CAST(0.1 AS DOUBLE) AS u1, CAST(0.1 AS DOUBLE) AS u2,
         CAST(0.1 AS DOUBLE) AS u3)"""
    prev = "s0"
    for i in range(1, n_iter + 1):
        sql += f""",
e{i} AS MATERIALIZED (
  SELECT pat_name, pat_acct, pat_seg, n,
         CASE WHEN pm + pu > 0 THEN pm / (pm + pu) ELSE 0.0 END AS g
  FROM (
    SELECT ct.*,
           s.lam
             * (CASE WHEN ct.pat_name THEN s.m1 ELSE 1 - s.m1 END)
             * (CASE WHEN ct.pat_acct THEN s.m2 ELSE 1 - s.m2 END)
             * (CASE WHEN ct.pat_seg  THEN s.m3 ELSE 1 - s.m3 END) AS pm,
           (1 - s.lam)
             * (CASE WHEN ct.pat_name THEN s.u1 ELSE 1 - s.u1 END)
             * (CASE WHEN ct.pat_acct THEN s.u2 ELSE 1 - s.u2 END)
             * (CASE WHEN ct.pat_seg  THEN s.u3 ELSE 1 - s.u3 END) AS pu
    FROM ct CROSS JOIN {prev} s
  ) t
),
s{i} AS MATERIALIZED (
  SELECT SUM(g * n) / SUM(n) AS lam,
         SUM(CASE WHEN pat_name THEN g * n ELSE 0 END)
           / SUM(g * n) AS m1,
         SUM(CASE WHEN pat_acct THEN g * n ELSE 0 END)
           / SUM(g * n) AS m2,
         SUM(CASE WHEN pat_seg  THEN g * n ELSE 0 END)
           / SUM(g * n) AS m3,
         SUM(CASE WHEN pat_name THEN (1 - g) * n ELSE 0 END)
           / (SUM(n) - SUM(g * n)) AS u1,
         SUM(CASE WHEN pat_acct THEN (1 - g) * n ELSE 0 END)
           / (SUM(n) - SUM(g * n)) AS u2,
         SUM(CASE WHEN pat_seg  THEN (1 - g) * n ELSE 0 END)
           / (SUM(n) - SUM(g * n)) AS u3
  FROM e{i})"""
        prev = f"s{i}"
    sql += f"""
SELECT f.field,
       FLOOR(CASE f.field WHEN 'ag_name' THEN s.m1
                          WHEN 'ag_acct' THEN s.m2
                          ELSE s.m3 END * 1000000 + 0.5) / 1000000 AS m,
       FLOOR(CASE f.field WHEN 'ag_name' THEN s.u1
                          WHEN 'ag_acct' THEN s.u2
                          ELSE s.u3 END * 1000000 + 0.5) / 1000000 AS u,
       FLOOR(s.lam * 1000000 + 0.5) / 1000000 AS lam,
       (SELECT CAST(SUM(n) AS BIGINT) FROM ct) AS n_pairs
FROM (VALUES ('ag_name'), ('ag_acct'), ('ag_seg')) f(field)
CROSS JOIN {prev} s
ORDER BY field"""
    return sql


@register(
    "er_em_parameters",
    oracle=_em_oracle_sql(),  # upgraded from rows-only (verdict r9
    # #3): the fixed-round EM over the 2³-row contingency table IS
    # SQL-expressible once unrolled; additionally pinned EXACTLY
    # against a sequential reference EM over the same contingency
    # table, plus recovery properties, in tests/test_pipeline6.py.
    category="pipeline",
)
def er_em_parameters(spark, t):
    """Fellegi-Sunter parameter ESTIMATION by EM
    (operators/linkage.em_fit — the Splink/FastLink training loop,
    Winkler 1988): one distributed groupBy collapses the blocked
    candidate pairs to the 2³-row agreement-pattern contingency
    table; 30 exact EM iterations run driver-side on it (bounded
    driver state, the k-means/PCA/LR discipline). Output: fitted
    λ and per-field (m, u) — on this corpus the name comparator's m
    must fit high (the planted twins always agree) while its u fits
    tiny (random same-block pairs rarely sit within one
    substitution). Collected table sorted before summation so the
    fit is partition-invariant to the last ulp."""
    from ..functions.hive_compat import pround
    from ..operators.linkage import em_fit

    fit = em_fit(
        _er_candidate_pairs(t), ["ag_name", "ag_acct", "ag_seg"]
    )
    rows = [
        (c, float(fit["m"][c]), float(fit["u"][c]), float(fit["lambda"]), int(fit["n_pairs"]))
        for c in ("ag_name", "ag_acct", "ag_seg")
    ]
    df = spark.createDataFrame(
        rows, "field string, m double, u double, lam double, n_pairs long"
    )
    return df.select(
        "field",
        pround(F.col("m")).alias("m"),
        pround(F.col("u")).alias("u"),
        pround(F.col("lam")).alias("lam"),
        "n_pairs",
    ).orderBy("field")


@register(
    "fn_jaro_winkler",
    oracle="""
WITH pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         a.c_name AS name_a, b.c_name AS name_b
  FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
  WHERE a.c_custkey < 200
  UNION ALL
  SELECT c_custkey, c_custkey + 1000000, c_name,
         substring(c_name, 1, 11) || 'Z' || substring(c_name, 13)
  FROM customer WHERE c_custkey % 20 = 0
)
SELECT id_a, id_b,
       FLOOR(jaro_winkler_similarity(name_a, name_b) * 1000000 + 0.5)
         / 1000000 AS jw
FROM pairs ORDER BY id_a, id_b
""",
    category="scalars",
)
def fn_jaro_winkler(spark, t):
    """Jaro-Winkler similarity — THE record-linkage string
    comparator (Winkler 1990), absent from Spark's builtin registry:
    implemented from the public algorithm as an Arrow-batched kernel
    with a per-batch pair cache
    (operators/textstats.jaro_winkler_col), oracled against
    DuckDB's NATIVE jaro_winkler_similarity — two independent
    implementations agreeing to the last ulp on every pair
    (textbook vectors MARTHA/MARHTA 0.961111, DIXON/DICKSONX
    0.813333 pinned in pytest). Pairs: sequential customer names
    (one-digit drift) plus the planted dirty twins."""
    from ..functions.hive_compat import pround
    from ..operators.textstats import jaro_winkler_col

    c = t.customer
    seq = (
        c.alias("a")
        .join(
            c.alias("b"),
            F.col("b.c_custkey") == F.col("a.c_custkey") + 1,
        )
        .filter(F.col("a.c_custkey") < 200)
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
    )
    twins = c.filter(F.col("c_custkey") % 20 == 0).select(
        F.col("c_custkey").alias("id_a"),
        (F.col("c_custkey") + 1000000).alias("id_b"),
        F.col("c_name").alias("name_a"),
        F.concat(
            F.substring("c_name", 1, 11),
            F.lit("Z"),
            F.substring("c_name", 13, 100),
        ).alias("name_b"),
    )
    pairs = seq.unionAll(twins)
    return pairs.select(
        "id_a",
        "id_b",
        pround(jaro_winkler_col(F.col("name_a"), F.col("name_b"))).alias(
            "jw"
        ),
    ).orderBy("id_a", "id_b")


@register(
    "fn_haversine_distance",
    oracle="""
WITH pts AS (
  SELECT n_nationkey AS id,
         (n_nationkey * 7 % 140) - 70 + n_regionkey * 0.25 AS lat,
         (n_nationkey * 31 % 360) - 180 + n_regionkey * 0.5 AS lon
  FROM nation
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         a.lat AS la, a.lon AS oa, b.lat AS lb, b.lon AS ob
  FROM pts a JOIN pts b ON b.id = a.id + 1
)
SELECT id_a, id_b,
       FLOOR(2 * 6371.0088 * asin(sqrt(
         pow(sin(radians(lb - la) / 2), 2)
         + cos(radians(la)) * cos(radians(lb))
           * pow(sin(radians(ob - oa) / 2), 2)
       )) * 1000 + 0.5) / 1000 AS km
FROM pairs ORDER BY id_a
""",
    category="scalars",
)
def fn_haversine_distance(spark, t):
    """Great-circle (haversine) distance — the spatial primitive for
    geo dedup/joins, as a pure builtin-trig expression (codegen-
    fused, no UDF): coordinates synthesized deterministically from
    nation keys, pairwise consecutive distances in km on the
    IUGG mean-Earth radius 6371.0088. Both engines evaluate the
    identical IEEE expression tree; pround at 1e-3 km (meter
    precision). The geo-banded join tier (lat/lon grid buckets +
    haversine verify) reuses banded_range_join's pattern."""
    from ..functions.hive_compat import pround

    pts = t.nation.select(
        F.col("n_nationkey").alias("id"),
        (
            (F.col("n_nationkey") * 7 % 140)
            - 70
            + F.col("n_regionkey") * 0.25
        ).alias("lat"),
        (
            (F.col("n_nationkey") * 31 % 360)
            - 180
            + F.col("n_regionkey") * 0.5
        ).alias("lon"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    pairs = a.join(b, F.col("b.id") == F.col("a.id") + 1).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.lat").alias("la"),
        F.col("a.lon").alias("oa"),
        F.col("b.lat").alias("lb"),
        F.col("b.lon").alias("ob"),
    )
    hav = (
        F.lit(2)
        * F.lit(6371.0088)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lb") - F.col("la")) / 2), 2)
                + F.cos(F.radians("la"))
                * F.cos(F.radians("lb"))
                * F.pow(
                    F.sin(F.radians(F.col("ob") - F.col("oa")) / 2), 2
                )
            )
        )
    )
    return pairs.select(
        "id_a", "id_b", pround(hav, 3).alias("km")
    ).orderBy("id_a")


@register(
    "events_pattern_match",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE event_type
                      WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
                      WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
                      ELSE 'E' END, ''
                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s
  FROM events GROUP BY user_id
),
m AS (
  SELECT user_id, s,
         regexp_extract_all(s, 'V+C+P') AS hits
  FROM seq
)
SELECT user_id,
       CAST(len(s) AS BIGINT) AS n_events,
       CAST(len(hits) AS BIGINT) AS n_matches,
       CASE WHEN len(hits) > 0 THEN hits[1] ELSE NULL END
         AS first_match,
       CAST(CASE WHEN len(hits) > 0
                 THEN strpos(s, hits[1]) ELSE 0 END AS BIGINT)
         AS first_pos
FROM m
WHERE len(hits) > 0
ORDER BY user_id
""",
    category="analytics",
)
def events_pattern_match(spark, t):
    """Row-pattern matching over event sequences — the
    MATCH_RECOGNIZE workload (SQL:2016; a funnel generalization to
    arbitrary regular patterns): each user's event stream collapses
    to ONE compact symbol string (a frame-ordered string_agg — one
    keyed aggregate), and the pattern ``V+C+P`` (views, then
    clicks, then a purchase — greedy, non-overlapping) runs as a
    plain REGEXP over that string: match count, first match and its
    position per user. The per-user string is bounded by the user's
    history (the same per-entity-fits-a-partition premise as
    sessionize/SCD2); the regex engine does in microseconds what a
    3-way LEAD cascade does per fixed-length pattern — and handles
    variable-length patterns the window form cannot express. Spark
    side: collect_list over the (ts, event_id) sort → array_join →
    regexp_extract_all, all JVM builtins."""
    e = t.events
    sym = (
        F.when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "purchase", "P")
        .when(F.col("event_type") == "signup", "S")
        .otherwise("E")
    )
    # ONE unordered collect per user, then an in-array sort by
    # (ts, event_id) and projection — never the windowed
    # prefix-array shape, whose per-row growing arrays are O(n²)
    # per user.
    seq = (
        e.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), sym.alias("c")
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("ev")),
                    lambda x: x["c"],
                ),
                "",
            ).alias("s")
        )
    )
    m = seq.select(
        "user_id",
        "s",
        F.expr("regexp_extract_all(s, 'V+C+P', 0)").alias("hits"),
    )
    return (
        m.filter(F.size("hits") > 0)
        .select(
            "user_id",
            F.length("s").cast("bigint").alias("n_events"),
            F.size("hits").cast("bigint").alias("n_matches"),
            F.element_at("hits", 1).alias("first_match"),
            F.expr("instr(s, element_at(hits, 1))")
            .cast("bigint")
            .alias("first_pos"),
        )
        .orderBy("user_id")
    )


@register(
    "quality_classifier_calibration",
    oracle=None,  # composes the iterative LR trainer — rows-only;
    # bin accounting + score-range + planted-separation properties
    # pinned in tests/test_pipeline6.py.
    category="pipeline",
)
def quality_classifier_calibration(spark, t):
    """Reliability diagram of the learned quality classifier — the
    calibration audit that decides whether the filter's scores can
    be used as sampling WEIGHTS (DSIR-style) or only as a ranking:
    holdout predictions bucketed into 10 equal-width score bins,
    per-bin mean predicted probability vs observed positive rate
    and |gap|. Composes operators/logreg end-to-end (same planted
    corpus and split as quality_learned_classifier); binning and
    rates are one keyed aggregate over the scored holdout."""
    from ..functions.hive_compat import pround
    from ..operators import logreg

    docs = spark.createDataFrame(
        logreg.planted_corpus(), "doc_id long, text string, label double"
    )
    feats = logreg.dense_hash_features(docs, "doc_id", "text", dim=64)
    data = feats.join(docs.select("doc_id", "label"), "doc_id")
    train = data.filter(F.col("doc_id") % 8 >= 2)  # both classes
    holdout = data.filter(F.col("doc_id") % 8 <= 1)  # 50/50 labels
    w, b, _ = logreg.train_logreg(train, dim=64, n_rounds=60, lr=1.0)
    scored = logreg.predict(holdout, w, b)
    binned = scored.select(
        F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9)).alias(
            "bin"
        ),
        "score",
        "label",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            pround(F.avg("score")).alias("mean_pred"),
            pround(F.avg("label")).alias("obs_rate"),
            pround(F.abs(F.avg("score") - F.avg("label"))).alias("gap"),
        )
        .orderBy("bin")
    )


@register(
    "audit_column_profile",
    oracle="""
WITH p AS (
  SELECT 'l_quantity' AS col,
         CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
         CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
         CAST(MIN(l_quantity) AS VARCHAR) AS min_v,
         CAST(MAX(l_quantity) AS VARCHAR) AS max_v
  FROM lineitem
  UNION ALL
  SELECT 'l_returnflag',
         CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
         CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
         MIN(l_returnflag), MAX(l_returnflag)
  FROM lineitem
  UNION ALL
  SELECT 'l_shipdate',
         CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT),
         CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
         CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR)
  FROM lineitem
)
SELECT * FROM p ORDER BY col
""",
    category="analytics",
)
def audit_column_profile(spark, t):
    """Column-profiling audit (the Deequ/dbt-docs profile pass a
    warehouse publishes per table): null count, exact distinct
    count, min and max — rendered as strings so heterogeneous
    columns stack into one report. One aggregate per column over a
    shared scan (Catalyst merges the scans; at 100 TB swap exact
    COUNT(DISTINCT) for approx_count_distinct — the report contract
    is unchanged). Dates pinned via CAST-to-string on both
    engines."""

    def prof(col):
        c = F.col(col)
        return t.lineitem.agg(
            F.lit(col).alias("col"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias("n_null"),
            F.countDistinct(c).cast("bigint").alias("n_distinct"),
            F.min(c).cast("string").alias("min_v"),
            F.max(c).cast("string").alias("max_v"),
        )

    out = prof("l_quantity")
    for col in ("l_returnflag", "l_shipdate"):
        out = out.unionByName(prof(col))
    return out.orderBy("col")


@register(
    "audit_warehouse_health_card",
    oracle="""
WITH fk AS (
  SELECT 'fk_orders_customer' AS check_name,
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
              AS DOUBLE) AS metric,
         CAST(0.0 AS DOUBLE) AS threshold
),
nulls AS (
  SELECT 'null_rate_l_quantity',
         CAST((SELECT COUNT(*) - COUNT(l_quantity) FROM lineitem)
              AS DOUBLE)
           / (SELECT COUNT(*) FROM lineitem),
         CAST(0.0 AS DOUBLE)
),
dups AS (
  SELECT 'pk_dup_orders',
         CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
              AS DOUBLE),
         CAST(0.0 AS DOUBLE)
),
skew AS (
  SELECT 'user_key_top1_share',
         (SELECT FLOOR(MAX(cnt) * 1.0 / SUM(cnt) * 1000000 + 0.5)
                 / 1000000
          FROM (SELECT COUNT(*) AS cnt FROM events GROUP BY user_id)),
         CAST(0.05 AS DOUBLE)
),
fresh AS (
  SELECT 'events_max_ts_present',
         CASE WHEN (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events)
              IS NOT NULL THEN 1.0 ELSE 0.0 END,
         CAST(1.0 AS DOUBLE)
),
u AS (
  SELECT * FROM fk UNION ALL SELECT * FROM nulls
  UNION ALL SELECT * FROM dups UNION ALL SELECT * FROM skew
  UNION ALL SELECT * FROM fresh
)
SELECT check_name, metric, threshold,
       CASE check_name
         WHEN 'user_key_top1_share' THEN metric <= threshold
         WHEN 'events_max_ts_present' THEN metric >= threshold
         ELSE metric <= threshold END AS ok
FROM u ORDER BY check_name
""",
    category="analytics",
)
def audit_warehouse_health_card(spark, t):
    """The nightly warehouse health card — one report row per check,
    composing the audit family into the single table an on-call
    reads: FK orphans (real parents this time — must be 0), null
    rate on a NOT-NULL column, primary-key duplicate count, heaviest
    user key's shuffle share vs a 5% skew budget, and event-stream
    freshness (max ts present). Each check is one keyed aggregate
    or anti-join; the card is their UNION — at 100 TB every check
    is a pass the warehouse already pays for nightly, and the card
    costs nothing extra beyond them."""
    from ..functions.hive_compat import pround

    def row(name, metric_df, threshold):
        return metric_df.select(
            F.lit(name).alias("check_name"),
            F.col("m").cast("double").alias("metric"),
            F.lit(threshold).cast("double").alias("threshold"),
        )

    fk = row(
        "fk_orders_customer",
        t.orders.join(
            t.customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("m")),
        0.0,
    )
    nulls = row(
        "null_rate_l_quantity",
        t.lineitem.agg(
            (
                (F.count(F.lit(1)) - F.count("l_quantity"))
                / F.count(F.lit(1))
            ).alias("m")
        ),
        0.0,
    )
    dups = row(
        "pk_dup_orders",
        t.orders.agg(
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("m")
        ),
        0.0,
    )
    skew = row(
        "user_key_top1_share",
        t.events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            pround(
                F.max("cnt").cast("double") / F.sum("cnt").cast("double")
            ).alias("m")
        ),
        0.05,
    )
    fresh = row(
        "events_max_ts_present",
        t.events.agg(
            F.when(F.max("ts").isNotNull(), 1.0)
            .otherwise(0.0)
            .alias("m")
        ),
        1.0,
    )
    card = fk.unionByName(nulls).unionByName(dups).unionByName(skew).unionByName(fresh)
    ok = (
        F.when(
            F.col("check_name") == "user_key_top1_share",
            F.col("metric") <= F.col("threshold"),
        )
        .when(
            F.col("check_name") == "events_max_ts_present",
            F.col("metric") >= F.col("threshold"),
        )
        .otherwise(F.col("metric") <= F.col("threshold"))
    )
    return card.select(
        "check_name", "metric", "threshold", ok.alias("ok")
    ).orderBy("check_name")


@register(
    "events_scd2_upsert",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
  FROM events
),
chg AS (
  SELECT *, LAG(event_type)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM e
),
v AS (
  SELECT user_id, event_type, ts, event_id FROM chg
  WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type AS state, ts AS effective_from,
       LEAD(ts) OVER w AS effective_to,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_no,
       LEAD(ts) OVER w IS NULL AS is_current
FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version_no
""",
    category="analytics",
)
def events_scd2_upsert(spark, t):
    """INCREMENTAL SCD2 maintenance — the nightly upsert, not the
    rebuild: the pre-cutoff history is MATERIALIZED (scratch
    parquet, standing in for the stored dimension), then one day's
    events are folded in touching only (a) each changed user's open
    row (closed at their first new change) and (b) the new change
    rows, with version numbers continuing from the stored max — the
    old closed rows are never recomputed. The ORACLE is the full
    rebuild over all events: incremental merge must equal rebuild
    EXACTLY (the corpus_stats_incremental discipline applied to the
    SCD2 shape). Every stage keyed by entity; the new-events frame
    is one day, not history."""
    from ..scratch import scratch_dir

    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    e = t.events.select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def build(events):
        prev = F.lag("event_type").over(w)
        ch = events.withColumn(
            "is_change", prev.isNull() | (F.col("event_type") != prev)
        ).filter("is_change")
        return ch.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("effective_from"),
            F.lead("ts").over(w).alias("effective_to"),
            F.row_number().over(w).cast("bigint").alias("version_no"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )

    d = scratch_dir("scd2_upsert_") + "/dim"
    build(e.filter(F.col("ts") < cutoff)).write.mode("overwrite").parquet(d)
    old = spark.read.parquet(d)

    new_ev = e.filter(F.col("ts") >= cutoff)
    open_rows = old.filter("is_current").select(
        "user_id",
        F.col("state").alias("prev_state"),
        F.col("version_no").alias("max_ver"),
    )
    prev_new = F.lag("event_type").over(w)
    seeded = (
        new_ev.join(open_rows, "user_id", "left")
        .withColumn(
            "prev_eff",
            F.coalesce(prev_new, F.col("prev_state")),
        )
        .withColumn(
            "is_change",
            F.col("prev_eff").isNull()
            | (F.col("event_type") != F.col("prev_eff")),
        )
        .filter("is_change")
    )
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_rows = seeded.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(wv).alias("effective_to"),
        (
            F.coalesce(F.col("max_ver"), F.lit(0))
            + F.row_number().over(wv)
        )
        .cast("bigint")
        .alias("version_no"),
        F.lead("ts").over(wv).isNull().alias("is_current"),
    )
    first_new = new_rows.groupBy("user_id").agg(
        F.min("effective_from").alias("close_ts")
    )
    adjusted_old = (
        old.join(first_new, "user_id", "left")
        .select(
            "user_id",
            "state",
            "effective_from",
            F.when(
                F.col("is_current") & F.col("close_ts").isNotNull(),
                F.col("close_ts"),
            )
            .otherwise(F.col("effective_to"))
            .alias("effective_to"),
            "version_no",
            (
                F.col("is_current") & F.col("close_ts").isNull()
            ).alias("is_current"),
        )
    )
    return adjusted_old.unionByName(new_rows).orderBy(
        "user_id", "version_no"
    )


@register(
    "events_ab_test_ztest",
    oracle="""
WITH assign AS (
  SELECT user_id, user_id % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM assign GROUP BY arm
),
wide AS (
  SELECT
    MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
    MAX(CASE WHEN arm = 0 THEN conv END) AS c_a,
    MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
    MAX(CASE WHEN arm = 1 THEN conv END) AS c_b
  FROM arms
)
SELECT n_a, c_a, n_b, c_b,
       FLOOR(c_a * 1.0 / n_a * 1000000 + 0.5) / 1000000 AS p_a,
       FLOOR(c_b * 1.0 / n_b * 1000000 + 0.5) / 1000000 AS p_b,
       FLOOR((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
             / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
                    * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b))
             * 1000000 + 0.5) / 1000000 AS z,
       abs((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
           / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
                  * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant
FROM wide
""",
    category="analytics",
)
def events_ab_test_ztest(spark, t):
    """Two-proportion z-test — the A/B readout every experimentation
    platform computes: users split by id parity into arms, per-user
    conversion = any purchase, pooled-variance z statistic with the
    1.96 two-sided gate. One user-level aggregate + a 2-row arm
    rollup pivoted wide; the z arithmetic is a single identical IEEE
    expression tree over exact integer counts on both engines
    (pround). The deterministic-assignment discipline (id parity,
    never RNG) is the same as every sampler here."""
    from ..functions.hive_compat import pround

    assign = t.events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c_b"),
    )
    p_a = F.col("c_a") * 1.0 / F.col("n_a")
    p_b = F.col("c_b") * 1.0 / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")) * 1.0 / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        pround(p_a).alias("p_a"),
        pround(p_b).alias("p_b"),
        pround(z).alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@register(
    "geo_nearest_hub",
    oracle="""
WITH hubs AS (
  SELECT n_nationkey AS hub_id,
         (n_nationkey * 7 % 140) - 70 + n_regionkey * 0.25 AS hlat,
         (n_nationkey * 31 % 360) - 180 + n_regionkey * 0.5 AS hlon
  FROM nation
),
pts AS (
  SELECT c_custkey AS pid,
         (c_custkey * 13 % 160) / 2.0 - 40 AS plat,
         (c_custkey * 17 % 720) / 2.0 - 180 AS plon
  FROM customer WHERE c_custkey < 400
),
d AS (
  SELECT p.pid, h.hub_id,
         2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(h.hlat - p.plat) / 2), 2)
           + cos(radians(p.plat)) * cos(radians(h.hlat))
             * pow(sin(radians(h.hlon - p.plon) / 2), 2)
         )) AS km
  FROM pts p, hubs h
)
SELECT pid, hub_id AS nearest_hub,
       FLOOR(km * 1000 + 0.5) / 1000 AS km
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY pid ORDER BY km, hub_id) AS rk
  FROM d
) WHERE rk = 1
ORDER BY pid
""",
    category="analytics",
)
def geo_nearest_hub(spark, t):
    """Nearest-hub assignment — the geo enrichment every
    logistics/CDN warehouse runs: synthesized customer coordinates
    against the 25 nation hubs, haversine distance, per-point argmin
    (min_by with deterministic (km, hub_id) tie-break). The hub side
    is dimension-sized, so the RIGHT plan is a broadcast fan-out +
    map-side argmin — no shuffle of the point set at all; for hub
    sets too large to broadcast, the scale path is lat/lon grid-cell
    bucketing + banded equi-join (the banded_range_join pattern in
    2D), same output contract. Oracle takes the windowed-rank route
    over the same cross product."""
    from ..functions.hive_compat import pround

    hubs = t.nation.select(
        F.col("n_nationkey").alias("hub_id"),
        (
            (F.col("n_nationkey") * 7 % 140)
            - 70
            + F.col("n_regionkey") * 0.25
        ).alias("hlat"),
        (
            (F.col("n_nationkey") * 31 % 360)
            - 180
            + F.col("n_regionkey") * 0.5
        ).alias("hlon"),
    )
    pts = t.customer.filter(F.col("c_custkey") < 400).select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 13 % 160) / 2.0 - 40).alias("plat"),
        ((F.col("c_custkey") * 17 % 720) / 2.0 - 180).alias("plon"),
    )
    km = (
        F.lit(2)
        * F.lit(6371.0088)
        * F.asin(
            F.sqrt(
                F.pow(
                    F.sin(F.radians(F.col("hlat") - F.col("plat")) / 2), 2
                )
                + F.cos(F.radians("plat"))
                * F.cos(F.radians("hlat"))
                * F.pow(
                    F.sin(F.radians(F.col("hlon") - F.col("plon")) / 2), 2
                )
            )
        )
    )
    d = pts.crossJoin(F.broadcast(hubs)).select(
        "pid", "hub_id", km.alias("km")
    )
    return (
        d.groupBy("pid")
        .agg(
            F.min_by(
                F.col("hub_id"), F.struct(F.col("km"), F.col("hub_id"))
            ).alias("nearest_hub"),
            F.min("km").alias("km_raw"),
        )
        .select("pid", "nearest_hub", pround(F.col("km_raw"), 3).alias("km"))
        .orderBy("pid")
    )


@register(
    "mining_association_rules",
    oracle="""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS oid, l_partkey % 100 AS item
  FROM lineitem
),
n_b AS (SELECT CAST(COUNT(DISTINCT oid) AS BIGINT) AS n FROM baskets),
sup1 AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS sup
  FROM baskets GROUP BY item
),
sup2 AS (
  SELECT a.item AS ante, b.item AS cons, CAST(COUNT(*) AS BIGINT) AS sup_ab
  FROM baskets a JOIN baskets b
    ON a.oid = b.oid AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= (SELECT CEIL(n * 0.002) FROM n_b)
)
SELECT p.ante, p.cons, p.sup_ab,
       FLOOR(p.sup_ab * 1.0 / sa.sup * 1000000 + 0.5) / 1000000
         AS confidence,
       FLOOR(p.sup_ab * 1.0 * t.n / (sa.sup * sc.sup)
             * 1000000 + 0.5) / 1000000 AS lift
FROM sup2 p
JOIN sup1 sa ON p.ante = sa.item
JOIN sup1 sc ON p.cons = sc.item, n_b t
ORDER BY p.sup_ab DESC, p.ante, p.cons
""",
    category="pipeline",
)
def mining_association_rules(spark, t):
    """Market-basket association rules (Agrawal-Srikant support/
    confidence/lift over part co-purchases): per-order item pairs —
    the explode is bounded by ORDER size, never a global cross —
    pair supports with a min-support HAVING (the Apriori prune: at
    scale the 1-item support filter runs BEFORE pairing so
    below-support items never pair), confidence and lift off the
    singleton-support joins and a 1-row basket-count broadcast.
    Keyed aggregates end to end; the output ranks co-purchase rules
    a recommender ingests."""
    from ..functions.hive_compat import pround

    # Baskets at the part-FAMILY grain (partkey % 100): raw partkeys
    # co-occur ≤2 times in this synthetic data, so family bucketing
    # is what makes support non-vacuous — and RELATIVE min-support
    # (0.2% of baskets, the textbook definition) holds at every SF.
    baskets = t.lineitem.select(
        F.col("l_orderkey").alias("oid"),
        (F.col("l_partkey") % 100).alias("item"),
    ).distinct()
    n_b = baskets.agg(
        F.countDistinct("oid").cast("bigint").alias("n")
    )
    sup1 = baskets.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("sup")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    sup2 = (
        a.join(
            b,
            (F.col("a.oid") == F.col("b.oid"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("ante"), F.col("b.item").alias("cons")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup_ab"))
        .crossJoin(F.broadcast(n_b))
        .filter(F.col("sup_ab") >= F.ceil(F.col("n") * 0.002))
        .drop("n")
    )
    return (
        sup2.join(
            sup1.withColumnsRenamed({"item": "ante", "sup": "sup_a"}),
            "ante",
        )
        .join(
            sup1.withColumnsRenamed({"item": "cons", "sup": "sup_c"}),
            "cons",
        )
        .crossJoin(F.broadcast(n_b))
        .select(
            "ante",
            "cons",
            "sup_ab",
            pround(
                F.col("sup_ab").cast("double") / F.col("sup_a")
            ).alias("confidence"),
            pround(
                F.col("sup_ab").cast("double")
                * F.col("n")
                / (F.col("sup_a") * F.col("sup_c"))
            ).alias("lift"),
        )
        .orderBy(F.desc("sup_ab"), "ante", "cons")
    )


@register(
    "feature_mutual_information",
    oracle="""
WITH pairs AS (
  SELECT 'returnflag|linestatus' AS pair, l_returnflag AS x,
         l_linestatus AS y
  FROM lineitem
  UNION ALL
  SELECT 'returnflag|shipmonth', l_returnflag,
         CAST(month(l_shipdate) AS VARCHAR)
  FROM lineitem
),
joint AS (
  SELECT pair, x, y, CAST(COUNT(*) AS BIGINT) AS nxy
  FROM pairs GROUP BY pair, x, y
),
tot AS (
  SELECT pair, CAST(SUM(nxy) AS BIGINT) AS n FROM joint GROUP BY pair
),
mx AS (
  SELECT pair, x, CAST(SUM(nxy) AS BIGINT) AS nx
  FROM joint GROUP BY pair, x
),
my AS (
  SELECT pair, y, CAST(SUM(nxy) AS BIGINT) AS ny
  FROM joint GROUP BY pair, y
),
terms AS (
  SELECT j.pair,
         CAST(ROUND(
           j.nxy * 1.0 / t.n
           * log2(j.nxy * 1.0 * t.n / (x.nx * 1.0 * y.ny)), 9)
           AS DECIMAL(38,9)) AS term
  FROM joint j
  JOIN tot t USING (pair)
  JOIN mx x ON j.pair = x.pair AND j.x = x.x
  JOIN my y ON j.pair = y.pair AND j.y = y.y
)
SELECT pair,
       FLOOR(CAST(SUM(term) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS mi_bits
FROM terms GROUP BY pair ORDER BY pair
""",
    category="pipeline",
)
def feature_mutual_information(spark, t):
    """Mutual information between categorical column pairs — the
    feature-relevance / redundancy screen of a feature store:
    I(X;Y) = Σ p(x,y)·log2(p(x,y)/(p(x)p(y))) over exact integer
    contingency counts. Each per-cell term is rounded to 9 places
    into DECIMAL(38,9) so both engines sum identical quantities
    exactly (the Zipf idiom — the log of a count ratio never sits
    on a rounding tie); plan is three keyed aggregates over cells
    bounded by |X|·|Y|, independent of row count, stacked for two
    column pairs."""
    from ..functions.hive_compat import pround

    li = t.lineitem
    pairs = li.select(
        F.lit("returnflag|linestatus").alias("pair"),
        F.col("l_returnflag").alias("x"),
        F.col("l_linestatus").alias("y"),
    ).unionAll(
        li.select(
            F.lit("returnflag|shipmonth").alias("pair"),
            F.col("l_returnflag").alias("x"),
            F.month("l_shipdate").cast("string").alias("y"),
        )
    )
    joint = pairs.groupBy("pair", "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("nxy")
    )
    tot = joint.groupBy("pair").agg(
        F.sum("nxy").cast("bigint").alias("n")
    )
    mx = joint.groupBy("pair", "x").agg(
        F.sum("nxy").cast("bigint").alias("nx")
    )
    my = joint.groupBy("pair", "y").agg(
        F.sum("nxy").cast("bigint").alias("ny")
    )
    term = F.round(
        F.col("nxy")
        * 1.0
        / F.col("n")
        * F.log2(
            F.col("nxy") * 1.0 * F.col("n") / (F.col("nx") * 1.0 * F.col("ny"))
        ),
        9,
    ).cast("decimal(38,9)")
    terms = (
        joint.join(F.broadcast(tot), "pair")
        .join(mx, ["pair", "x"])
        .join(my, ["pair", "y"])
        .select("pair", term.alias("term"))
    )
    return (
        terms.groupBy("pair")
        .agg(pround(F.sum("term").cast("double")).alias("mi_bits"))
        .orderBy("pair")
    )


@register(
    "agg_hierarchy_share",
    oracle="""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                       AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region, nation,
       CAST(revenue AS DOUBLE) AS revenue,
       FLOOR(CAST(revenue AS DOUBLE)
             / CAST(SUM(revenue) OVER (PARTITION BY region) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS share_of_region,
       FLOOR(CAST(SUM(revenue) OVER (PARTITION BY region) AS DOUBLE)
             / CAST(SUM(revenue) OVER () AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS region_share_of_total
FROM rev ORDER BY region, nation
""",
    category="aggregates",
)
def agg_hierarchy_share(spark, t):
    """Percent-of-parent hierarchy report — nation share of its
    region and region share of the total, the drill-down table every
    BI layer renders: one five-table star join + keyed aggregate
    (|nations| rows), then two window sums over that TINY aggregate
    (never over raw lineitem). Revenue terms ROUND(…,4)→DECIMAL
    exact; shares are single IEEE divisions of exact decimal sums,
    pround-ed."""
    from ..functions.hive_compat import pround

    rev = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(38,4)")
            )
            .cast("decimal(38,4)")
            .alias("revenue")
        )
    )
    w_r = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.col("revenue").cast("double").alias("revenue"),
        pround(
            F.col("revenue").cast("double")
            / F.sum("revenue").over(w_r).cast("double")
        ).alias("share_of_region"),
        pround(
            F.sum("revenue").over(w_r).cast("double")
            / F.sum("revenue").over(w_all).cast("double")
        ).alias("region_share_of_total"),
    ).orderBy("region", "nation")


@register(
    "mining_item_neighbors",
    oracle="""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS oid, l_partkey % 100 AS item
  FROM lineitem
),
n_b AS (SELECT CAST(COUNT(DISTINCT oid) AS BIGINT) AS n FROM baskets),
sup1 AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS sup
  FROM baskets GROUP BY item
),
cooc AS (
  SELECT a.item AS ia, b.item AS ib, CAST(COUNT(*) AS BIGINT) AS c
  FROM baskets a JOIN baskets b
    ON a.oid = b.oid AND a.item <> b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= (SELECT CEIL(n * 0.002) FROM n_b)
),
scored AS (
  SELECT c.ia, c.ib, c.c,
         FLOOR(c.c / sqrt(sa.sup * 1.0 * sb.sup) * 1000000 + 0.5)
           / 1000000 AS cosine
  FROM cooc c
  JOIN sup1 sa ON c.ia = sa.item
  JOIN sup1 sb ON c.ib = sb.item
)
SELECT ia AS item, ib AS neighbor, c AS cooc, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY ia ORDER BY cosine DESC, ib) AS rk
  FROM scored
) WHERE rk <= 3
ORDER BY item, cosine DESC, neighbor
""",
    category="pipeline",
)
def mining_item_neighbors(spark, t):
    """Item-item collaborative filtering (the Amazon-style
    neighborhood model): co-occurrence cosine c/√(sup_a·sup_b) over
    basket pairs (min-support pruned), top-3 neighbors per item via
    WindowGroupLimit — the precomputed neighbor table a recommender
    serves from. Same bounded per-order pair explode as the rule
    miner; the rank heap runs map-side below the exchange."""
    from ..functions.hive_compat import pround

    baskets = t.lineitem.select(
        F.col("l_orderkey").alias("oid"),
        (F.col("l_partkey") % 100).alias("item"),
    ).distinct()
    n_b = baskets.agg(
        F.countDistinct("oid").cast("bigint").alias("n")
    )
    sup1 = baskets.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("sup")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.oid") == F.col("b.oid"))
            & (F.col("a.item") != F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .crossJoin(F.broadcast(n_b))
        .filter(F.col("c") >= F.ceil(F.col("n") * 0.002))
        .drop("n")
    )
    scored = (
        cooc.join(
            sup1.withColumnsRenamed({"item": "ia", "sup": "sup_a"}), "ia"
        )
        .join(
            sup1.withColumnsRenamed({"item": "ib", "sup": "sup_b"}), "ib"
        )
        .select(
            "ia",
            "ib",
            "c",
            pround(
                F.col("c")
                / F.sqrt(F.col("sup_a") * 1.0 * F.col("sup_b"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("ia").orderBy(F.desc("cosine"), "ib")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("ia").alias("item"),
            F.col("ib").alias("neighbor"),
            F.col("c").alias("cooc"),
            "cosine",
        )
        .orderBy("item", F.desc("cosine"), "neighbor")
    )


@register(
    "meta_column_lineage",
    oracle="""
SELECT * FROM (VALUES
  ('l_orderkey', 'lineitem.l_orderkey'),
  ('revenue', 'lineitem.l_discount,lineitem.l_extendedprice'),
  ('o_orderdate', 'orders.o_orderdate')
) AS t(column_name, sources)
ORDER BY column_name
""",
    category="analytics",
)
def meta_column_lineage(spark, t):
    """Column-level lineage extraction
    (functions/lineage.column_lineage — the Hive LineageInfo /
    Atlas governance hook): one post-order walk of the ANALYZED
    Catalyst plan resolving every Alias exprId to the union of its
    references' source columns, seeded at leaf file relations;
    exprId-keyed so self-join name collisions resolve correctly.
    Applied here to the registry's own TPC-H Q3 plan — the oracle
    is the hand-derived ground truth (revenue ←
    {l_extendedprice, l_discount} through the join and aggregate),
    so a lineage regression in ANY part of the walk shows up as a
    literal mismatch."""
    from ..functions.lineage import column_lineage
    from . import all_queries

    q3 = all_queries()["q3_shipping_priority"].fn(spark, t.sf_dir)
    lin = column_lineage(q3)
    rows = [(col, ",".join(srcs)) for col, srcs in lin.items()]
    return spark.createDataFrame(
        rows, "column_name string, sources string"
    ).orderBy("column_name")


@register(
    "events_gap_fill_linear",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS v
  FROM events GROUP BY event_type, day
),
masked AS (
  SELECT event_type, day, v,
         (dayofmonth(day) % 3 = 0 OR dayofmonth(day) % 7 = 0)
           AS is_gap
  FROM daily
),
nb AS (
  SELECT event_type, day, v, is_gap,
         last_value(CASE WHEN NOT is_gap THEN day END IGNORE NULLS)
           OVER wp AS pd,
         last_value(CASE WHEN NOT is_gap THEN v END IGNORE NULLS)
           OVER wp AS pv,
         first_value(CASE WHEN NOT is_gap THEN day END IGNORE NULLS)
           OVER wf AS nd,
         first_value(CASE WHEN NOT is_gap THEN v END IGNORE NULLS)
           OVER wf AS nv
  FROM masked
  WINDOW wp AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wf AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day, is_gap,
       FLOOR(v * 1000000 + 0.5) / 1000000 AS observed,
       CASE
         WHEN NOT is_gap THEN FLOOR(v * 1000000 + 0.5) / 1000000
         WHEN pd IS NOT NULL AND nd IS NOT NULL THEN
           FLOOR((pv + (nv - pv) * datediff('day', pd, day)
                  / datediff('day', pd, nd)) * 1000000 + 0.5) / 1000000
         ELSE FLOOR(COALESCE(pv, nv) * 1000000 + 0.5) / 1000000
       END AS filled
FROM nb ORDER BY event_type, day
""",
    category="analytics",
)
def events_gap_fill_linear(spark, t):
    """LINEAR gap interpolation — the math tier above
    events_gap_fill_locf: daily value sums (decimal-exact) with a
    deterministic dropout mask (day-of-month % 3 or % 7 — adjacent
    masked days exercise multi-day gaps), reconstructed as
    prev + (next − prev)·Δt/T between the nearest OBSERVED
    neighbors via IGNORE NULLS frame windows; boundary gaps fall
    back one-sided. Two frame-bounded windows sharing one
    (type; day) sort; interpolation is identical IEEE arithmetic on
    exact-decimal endpoints, pround-ed."""
    from ..functions.hive_compat import pround

    daily = t.events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round("value", 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("v")
    )
    masked = daily.withColumn(
        "is_gap",
        (F.dayofmonth("day") % 3 == 0) | (F.dayofmonth("day") % 7 == 0),
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    known_day = F.when(~F.col("is_gap"), F.col("day"))
    known_v = F.when(~F.col("is_gap"), F.col("v"))
    nb = masked.select(
        "event_type",
        "day",
        "v",
        "is_gap",
        F.last(known_day, ignorenulls=True).over(wp).alias("pd"),
        F.last(known_v, ignorenulls=True).over(wp).alias("pv"),
        F.first(known_day, ignorenulls=True).over(wf).alias("nd"),
        F.first(known_v, ignorenulls=True).over(wf).alias("nv"),
    )
    interp = (
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * F.datediff("day", "pd")
        / F.datediff("nd", "pd")
    )
    return nb.select(
        "event_type",
        "day",
        "is_gap",
        pround(F.col("v")).alias("observed"),
        F.when(~F.col("is_gap"), pround(F.col("v")))
        .when(
            F.col("pd").isNotNull() & F.col("nd").isNotNull(),
            pround(interp),
        )
        .otherwise(pround(F.coalesce("pv", "nv")))
        .alias("filled"),
    ).orderBy("event_type", "day")


@register(
    "feature_churn_labels",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
),
feat AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
           AS n_purchase,
         CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT)
           AS n_error,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
           AS n_active_days,
         CAST(date_diff('day', MAX(ts),
              TIMESTAMP '2024-01-28 00:00:00') AS BIGINT) AS recency_days
  FROM e WHERE ts < TIMESTAMP '2024-01-28 00:00:00'
  GROUP BY user_id
),
lbl AS (
  SELECT DISTINCT user_id FROM e
  WHERE ts >= TIMESTAMP '2024-01-28 00:00:00'
    AND event_type = 'purchase'
)
SELECT f.user_id, f.n_events, f.n_purchase, f.n_error,
       f.n_active_days, f.recency_days,
       l.user_id IS NULL AS churned
FROM feat f LEFT JOIN lbl l ON f.user_id = l.user_id
ORDER BY f.user_id
""",
    category="pipeline",
)
def feature_churn_labels(spark, t):
    """Temporal churn-label construction — the
    leakage-DISCIPLINED training-set builder: features are computed
    STRICTLY before the cutoff (activity counts, purchase/error
    mix, active days, recency at cutoff), the label (churned = no
    PURCHASE in the 3 days after — purchase churn; mere activity is
    universal in this stream) strictly after — the one-pass
    pattern that prevents the classic target-leak of featurizing
    over the label window. Two keyed aggregates + one anti-joinable
    left join; every user present before the cutoff gets a row."""
    cutoff = F.lit("2024-01-28 00:00:00").cast("timestamp")
    e = t.events.select("user_id", "ts", "event_type")
    feat = (
        e.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("bigint")
            .alias("n_purchase"),
            F.count_if(F.col("event_type") == "error")
            .cast("bigint")
            .alias("n_error"),
            F.countDistinct(F.col("ts").cast("date"))
            .cast("bigint")
            .alias("n_active_days"),
            F.datediff(cutoff.cast("date"), F.max("ts").cast("date"))
            .cast("bigint")
            .alias("recency_days"),
        )
    )
    lbl = (
        e.filter(
            (F.col("ts") >= cutoff)
            & (F.col("event_type") == "purchase")
        )
        .select("user_id")
        .distinct()
        .withColumn("_active", F.lit(1))
    )
    return (
        feat.join(lbl, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "n_purchase",
            "n_error",
            "n_active_days",
            "recency_days",
            F.col("_active").isNull().alias("churned"),
        )
        .orderBy("user_id")
    )


@register(
    "events_ab_cuped",
    oracle="""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(COUNT(*) FILTER (event_type = 'purchase'
              AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16')
              AS BIGINT) AS x,
         CAST(COUNT(*) FILTER (event_type = 'purchase'
              AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16')
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM per_user
),
theta AS (
  SELECT n, sx,
         (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) AS th,
         sx * 1.0 / n AS mx
  FROM pooled
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_a,
         CAST(SUM(x) AS BIGINT) AS sx_a, CAST(SUM(y) AS BIGINT) AS sy_a,
         CAST(SUM(x * y) AS BIGINT) AS sxy_a,
         CAST(SUM(x * x) AS BIGINT) AS sxx_a,
         CAST(SUM(y * y) AS BIGINT) AS syy_a
  FROM per_user GROUP BY arm
)
SELECT a.arm, a.n_a,
       FLOOR(a.sy_a * 1.0 / a.n_a * 1000000 + 0.5) / 1000000 AS mean_y,
       FLOOR((a.sy_a - t.th * a.sx_a + a.n_a * t.th * t.mx) / a.n_a
             * 1000000 + 0.5) / 1000000 AS mean_y_adj,
       FLOOR((a.syy_a * 1.0 / a.n_a
              - (a.sy_a * 1.0 / a.n_a) * (a.sy_a * 1.0 / a.n_a))
             * 1000000 + 0.5) / 1000000 AS var_y,
       FLOOR((
          (a.syy_a * 1.0 / a.n_a
           - (a.sy_a * 1.0 / a.n_a) * (a.sy_a * 1.0 / a.n_a))
          - 2 * t.th * (a.sxy_a * 1.0 / a.n_a
             - (a.sx_a * 1.0 / a.n_a) * (a.sy_a * 1.0 / a.n_a))
          + t.th * t.th * (a.sxx_a * 1.0 / a.n_a
             - (a.sx_a * 1.0 / a.n_a) * (a.sx_a * 1.0 / a.n_a))
         ) * 1000000 + 0.5) / 1000000 AS var_y_adj
FROM arms a, theta t
ORDER BY a.arm
""",
    category="analytics",
)
def events_ab_cuped(spark, t):
    """CUPED variance reduction (Deng et al. 2013 — the
    pre-experiment-covariate adjustment every mature experimentation
    platform applies before the z-test): per-user pre-period
    purchases X and post-period purchases Y, pooled
    θ = cov(X,Y)/var(X), adjusted means and variances PER ARM. The
    float discipline is the point: every statistic derives from
    EXACT BIGINT moment sums (n, Σx, Σy, Σxy, Σx², Σy²) in
    closed-form expressions — never a float sum over rows, whose
    partition-dependent summation order would make the answer
    flicker — so θ, means and variances are single deterministic
    IEEE trees on both engines. One user-level aggregate + a 2-row
    arm rollup + a 1-row θ broadcast."""
    from ..functions.hive_compat import pround

    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = t.events.groupBy("user_id").agg(
        F.count_if(
            (F.col("event_type") == "purchase") & (F.col("ts") < cutoff)
        )
        .cast("bigint")
        .alias("x"),
        F.count_if(
            (F.col("event_type") == "purchase") & (F.col("ts") >= cutoff)
        )
        .cast("bigint")
        .alias("y"),
    ).select((F.col("user_id") % 2).alias("arm"), "x", "y")
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    theta = pooled.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * 1.0
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("th"),
        (F.col("sx") * 1.0 / F.col("n")).alias("mx"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a"),
        F.sum("x").cast("bigint").alias("sx_a"),
        F.sum("y").cast("bigint").alias("sy_a"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy_a"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx_a"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy_a"),
    )
    j = arms.crossJoin(F.broadcast(theta))
    my = F.col("sy_a") * 1.0 / F.col("n_a")
    mx_a = F.col("sx_a") * 1.0 / F.col("n_a")
    var_y = F.col("syy_a") * 1.0 / F.col("n_a") - my * my
    cov_a = F.col("sxy_a") * 1.0 / F.col("n_a") - mx_a * my
    var_x = F.col("sxx_a") * 1.0 / F.col("n_a") - mx_a * mx_a
    return j.select(
        "arm",
        "n_a",
        pround(my).alias("mean_y"),
        pround(
            (
                F.col("sy_a")
                - F.col("th") * F.col("sx_a")
                + F.col("n_a") * F.col("th") * F.col("mx")
            )
            / F.col("n_a")
        ).alias("mean_y_adj"),
        pround(var_y).alias("var_y"),
        pround(
            var_y
            - 2 * F.col("th") * cov_a
            + F.col("th") * F.col("th") * var_x
        ).alias("var_y_adj"),
    ).orderBy("arm")


@register(
    "events_ab_srm",
    oracle="""
WITH arms AS (
  SELECT user_id % 2 AS arm, CAST(COUNT(DISTINCT user_id) AS BIGINT)
           AS n
  FROM events GROUP BY arm
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM arms)
SELECT a.arm, a.n,
       FLOOR(t.nt / 2.0 * 1000000 + 0.5) / 1000000 AS expected,
       FLOOR(POWER(a.n - t.nt / 2.0, 2) / (t.nt / 2.0)
             * 1000000 + 0.5) / 1000000 AS chi2_term,
       (SELECT SUM(POWER(b.n - t.nt / 2.0, 2) / (t.nt / 2.0))
        FROM arms b) > 3.841 AS srm_detected
FROM arms a, tot t ORDER BY a.arm
""",
    category="analytics",
)
def events_ab_srm(spark, t):
    """Sample-ratio-mismatch check — the FIRST thing an
    experimentation platform validates (a biased assignment
    invalidates every downstream readout): distinct users per arm
    vs the designed 50/50, per-arm χ² terms and the 1-df 3.841 gate.
    Exact integer counts, identical IEEE χ² arithmetic; with
    id-parity assignment over a contiguous id space the split is
    near-exact, so the gate correctly stays quiet."""
    from ..functions.hive_compat import pround

    arms = (
        t.events.select("user_id")
        .distinct()
        .groupBy((F.col("user_id") % 2).alias("arm"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = arms.agg(F.sum("n").cast("bigint").alias("nt"))
    j = arms.crossJoin(F.broadcast(tot))
    exp = F.col("nt") / 2.0
    term = F.pow(F.col("n") - exp, F.lit(2)) / exp
    chi2_total = (
        j.select(F.sum(term).alias("c")).agg(F.first("c").alias("c"))
    )
    return (
        j.crossJoin(F.broadcast(chi2_total))
        .select(
            "arm",
            "n",
            pround(exp).alias("expected"),
            pround(term).alias("chi2_term"),
            (F.col("c") > 3.841).alias("srm_detected"),
        )
        .orderBy("arm")
    )


@register(
    "retrieval_bm25_eval",
    oracle="""
WITH corpus AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
q AS (
  SELECT doc_id AS query_id,
         list_distinct(list_slice(string_split(lower(text), ' '), 5, 12))
           AS qw
  FROM documents WHERE doc_id BETWEEN 100 AND 109
),
ex AS (SELECT doc_id, unnest(w) AS term FROM corpus),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM ex GROUP BY 1),
stats AS (
  SELECT (SELECT COUNT(*) FROM corpus) AS n_docs,
         (SELECT AVG(dl) FROM dl) AS avgdl
),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
qt AS (SELECT query_id, unnest(qw) AS term FROM q),
scores AS (
  SELECT qt.query_id, tf.doc_id,
         ROUND(SUM(
           ln(1 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
         ), 4) AS score
  FROM qt
  JOIN tf USING (term)
  JOIN dft USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY 1, 2
),
run AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
    FROM scores
  ) WHERE rank <= 20
),
hits AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_hit,
         MIN(rank) AS first_rank,
         SUM(CAST(ROUND(1 / log2(rank + 1), 6) AS DECIMAL(38,6)))
           AS dcg
  FROM run WHERE doc_id = query_id GROUP BY query_id
)
SELECT q.query_id, CAST(1 AS BIGINT) AS n_rel,
       COALESCE(h.n_hit, 0) AS n_hit,
       FLOOR(COALESCE(h.n_hit, 0) * 1.0 / 1 * 1000000 + 0.5)
         / 1000000 AS recall_k,
       FLOOR(COALESCE(1.0 / h.first_rank, 0) * 1000000 + 0.5)
         / 1000000 AS mrr,
       FLOOR(CAST(COALESCE(h.dcg, 0) AS DOUBLE) / 1.0
             * 1000000 + 0.5) / 1000000 AS ndcg_k
FROM q LEFT JOIN hits h USING (query_id)
ORDER BY q.query_id
""",
    category="pipeline",
)
def retrieval_bm25_eval(spark, t):
    """END-TO-END retrieval evaluation — the search stack and its
    eval harness in ONE verified plan: queries are 8-word slices of
    docs 100-109 (the source doc is the single relevant — planted
    ground truth with a findable answer), BM25 ranks the full
    corpus, ranking_metrics scores recall@20 / MRR / nDCG@20. The
    capstone over retrieval_bm25 + retrieval_eval_metrics: a
    regression ANYWHERE in tokenization, scoring, ranking or metric
    arithmetic lands in this one table. Self-retrieval MRR is high
    but not vacuously 1 — word-salad queries genuinely collide."""
    from ..operators.retrieval import bm25_scores, ranking_metrics

    d = t.documents
    w = F.split(F.lower(F.col("text")), " ")
    queries = d.filter(F.col("doc_id").between(100, 109)).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(w, 5, 8), " ").alias("text"),
    )
    scores = bm25_scores(d, queries)
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("score"), "doc_id"
    )
    run = (
        scores.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 20)
        .select("query_id", "doc_id", "rank")
    )
    qrels = queries.select(
        "query_id", F.col("query_id").alias("doc_id")
    )
    return ranking_metrics(run, qrels, k=20)


@register(
    "geo_radius_pairs",
    oracle="""
WITH base AS (
  SELECT c_custkey AS pid,
         (c_custkey * 13 % 160) / 2.0 - 40 AS lat,
         (c_custkey * 17 % 720) / 2.0 - 180 AS lon
  FROM customer
),
pts AS (
  SELECT * FROM base
  UNION ALL
  SELECT pid + 100000, lat + 0.3, lon + 0.3
  FROM base WHERE pid % 10 = 0
)
SELECT a.pid AS id_a, b.pid AS id_b,
       FLOOR(2 * 6371.0088 * asin(sqrt(
         pow(sin(radians(b.lat - a.lat) / 2), 2)
         + cos(radians(a.lat)) * cos(radians(b.lat))
           * pow(sin(radians(b.lon - a.lon) / 2), 2)
       )) * 1000 + 0.5) / 1000 AS km
FROM pts a JOIN pts b ON a.pid < b.pid
WHERE 2 * 6371.0088 * asin(sqrt(
  pow(sin(radians(b.lat - a.lat) / 2), 2)
  + cos(radians(a.lat)) * cos(radians(b.lat))
    * pow(sin(radians(b.lon - a.lon) / 2), 2))) <= 100
ORDER BY id_a, id_b
""",
    category="analytics",
)
def geo_radius_pairs(spark, t):
    """Grid-bucketed radius self-join — the 2D banded join
    IMPLEMENTED (not just documented): every point maps to ONE 2°
    grid cell; one side explodes over its 3×3 cell neighborhood;
    candidates equi-join on cell id and the exact haversine ≤ 100 km
    re-check runs only on candidates. Completeness is provable for
    the clipped latitude band: at |lat| ≤ 40.5, 100 km spans ≤ 1.19°
    of longitude and ≤ 0.91° of latitude — both under one 2° cell,
    so a qualifying pair can never sit more than one cell apart.
    Never all-pairs (the brute force lives in the oracle); planted
    0.3°-jittered twins (pid % 10) make the answer non-vacuous at
    every SF. The 1D time version is operators/rangejoin; this is
    its spatial analogue."""
    from ..functions.hive_compat import pround

    base = t.customer.select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 13 % 160) / 2.0 - 40).alias("lat"),
        ((F.col("c_custkey") * 17 % 720) / 2.0 - 180).alias("lon"),
    )
    twins = base.filter(F.col("pid") % 10 == 0).select(
        (F.col("pid") + 100000).alias("pid"),
        (F.col("lat") + 0.3).alias("lat"),
        (F.col("lon") + 0.3).alias("lon"),
    )
    pts = base.unionAll(twins)
    cell = lambda c, d: F.floor(c / d).cast("int")  # noqa: E731
    left = pts.select(
        F.col("pid").alias("id_a"),
        F.col("lat").alias("la"),
        F.col("lon").alias("oa"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (cell(F.col("lat"), 2.0) + di).alias("cy"),
                        (cell(F.col("lon"), 2.0) + dj).alias("cx"),
                    )
                    for di in (-1, 0, 1)
                    for dj in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    )
    right = pts.select(
        F.col("pid").alias("id_b"),
        F.col("lat").alias("lb"),
        F.col("lon").alias("ob"),
        F.struct(
            cell(F.col("lat"), 2.0).alias("cy"),
            cell(F.col("lon"), 2.0).alias("cx"),
        ).alias("cell"),
    )
    km = (
        F.lit(2)
        * F.lit(6371.0088)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lb") - F.col("la")) / 2), 2)
                + F.cos(F.radians("la"))
                * F.cos(F.radians("lb"))
                * F.pow(
                    F.sin(F.radians(F.col("ob") - F.col("oa")) / 2), 2
                )
            )
        )
    )
    return (
        left.join(right, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", km.alias("km_raw"))
        .filter(F.col("km_raw") <= 100)
        .select("id_a", "id_b", pround(F.col("km_raw"), 3).alias("km"))
        .distinct()
        .orderBy("id_a", "id_b")
    )


@register(
    "events_rolling_wau",
    oracle="""
WITH active AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
cal AS (SELECT DISTINCT day FROM active),
cover AS (
  SELECT a.user_id, c.day AS report_day
  FROM active a JOIN cal c
    ON c.day >= a.day AND c.day <= a.day + INTERVAL 6 DAY
)
SELECT report_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
FROM cover GROUP BY report_day ORDER BY report_day
""",
    category="analytics",
)
def events_rolling_wau(spark, t):
    """Rolling 7-day distinct users (WAU per day) — the windowed
    COUNT DISTINCT that has NO efficient window form: the trick is
    coverage explosion — each (user, active-day) fact covers the 7
    report days it contributes to, one map-only explode (bounded 7×,
    never |days|×) feeding a single distinct aggregate. The oracle
    takes the calendar-join route instead; results must agree. The
    approximate twin at extreme cardinality is a per-day HLL union
    (agg_hll_set_ops); this is the exact tier."""
    active = (
        t.events.select(
            "user_id", F.col("ts").cast("date").alias("day")
        ).distinct()
    )
    cal = active.select("day").distinct()
    cover = active.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), 6)
            )
        ).alias("report_day"),
    ).join(cal.withColumnRenamed("day", "report_day"), "report_day", "left_semi")
    return (
        cover.groupBy("report_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
        .orderBy("report_day")
    )


@register(
    "ddl_show_grants",
    oracle="""
SELECT * FROM (VALUES
  ('analyst', 'sec_nation', 'SELECT', false),
  ('etl', 'sec_nation', 'ALL', false),
  ('owner_user', 'sec_nation', 'ALL', true)
) AS t(principal, table_name, privilege, is_owner)
ORDER BY principal, privilege
""",
    category="formats",
)
def ddl_show_grants(spark, t):
    """SHOW GRANT ON TABLE (SQLStdHiveAccessController's
    show_grant surface; metastore.AuthorizingMetastore): a scratch
    warehouse is created, privileges granted and one revoked, and
    the resulting grant table — including the implicit owner-ALL
    row — is read back. The oracle is the literal expected grant
    set, so a drift in grant storage, revoke semantics, or owner
    defaulting lands as a mismatch."""
    from ..metastore import AuthorizingMetastore
    from ..scratch import scratch_dir

    ms = AuthorizingMetastore(
        scratch_dir("auth_grants_") + "/wh", current_user="owner_user"
    )
    ms.create_table(t.nation, "sec_nation")
    ms.grant("sec_nation", "analyst", "SELECT")
    ms.grant("sec_nation", "etl", "ALL")
    ms.grant("sec_nation", "temp", "INSERT")
    ms.revoke("sec_nation", "temp", "ALL")
    meta = ms._read_meta()
    rows = []
    tbl = meta["tables"]["sec_nation"]
    rows.append((tbl["owner"], "sec_nation", "ALL", True))
    for user, privs in meta.get("grants", {}).get("sec_nation", {}).items():
        for p in privs:
            rows.append((user, "sec_nation", p, False))
    return spark.createDataFrame(
        rows,
        "principal string, table_name string, privilege string,"
        " is_owner boolean",
    ).orderBy("principal", "privilege")


def _topic_oracle_sql(k: int = 4, vocab_size: int = 64,
                      n_rounds: int = 6) -> str:
    """Synthesized DuckDB oracle for the hard-EM mixture trainer
    (verdict r9 #3 pattern): operators/topics.py was DESIGNED for
    cross-engine exactness — integer M-step counts, 6-dp-rounded
    log-probs carried as DECIMAL(12,6), exact-decimal E-step scores,
    md5 init, smallest-topic tie-break — so the 6 rounds unroll as
    grouped CTEs with zero float-ordering risk. Early stopping needs
    no replication: a converged round is idempotent (M-step of a
    fixed assignment reproduces the model that produced it), so the
    always-6-round unroll lands on the same final assignment. The
    15-hex md5 init replays conv(substring(md5,1,15),16,10)%k via a
    strpos fold."""
    tlist = ", ".join(str(t) for t in range(k))
    sql = rf"""WITH
dw0 AS MATERIALIZED (
  SELECT doc_id, word, COUNT(*) AS c FROM (
    SELECT doc_id, w AS word
    FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          FROM documents)
    WHERE length(w) > 0
  ) GROUP BY doc_id, word
),
vocab AS MATERIALIZED (
  SELECT word FROM (
    SELECT word, SUM(c) AS n FROM dw0 GROUP BY word
    ORDER BY n DESC, word ASC LIMIT {vocab_size}
  )
),
dw AS MATERIALIZED (
  SELECT d.doc_id, d.word, d.c FROM dw0 d JOIN vocab USING (word)
),
topics AS MATERIALIZED (SELECT unnest([{tlist}]) AS topic),
grid AS MATERIALIZED (
  SELECT t.topic, v.word FROM topics t CROSS JOIN vocab v),
nn AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dw),
a0 AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         CAST(list_reduce(
           [strpos('0123456789abcdef',
                   md5(CAST(doc_id AS VARCHAR))[j]) - 1
            for j in range(1, 16)],
           (a, b) -> a * 16 + b) % {k} AS INTEGER) AS topic
  FROM dw)"""
    prev = "a0"
    for r in range(1, n_rounds + 1):
        sql += f""",
mc{r} AS MATERIALIZED (
  SELECT a.topic, d.word, CAST(SUM(d.c) AS BIGINT) AS n
  FROM dw d JOIN {prev} a USING (doc_id) GROUP BY a.topic, d.word),
tk{r} AS MATERIALIZED (
  SELECT topic, CAST(SUM(n) AS BIGINT) AS tok FROM mc{r} GROUP BY topic),
dc{r} AS MATERIALIZED (
  SELECT topic, CAST(COUNT(*) AS BIGINT) AS nd FROM {prev}
  GROUP BY topic),
lt{r} AS MATERIALIZED (
  SELECT g.topic, g.word,
         -- Laplace V = the REALIZED vocab size (len(vocab) in
         -- _log_theta), not the configured cap — they differ when
         -- the corpus has fewer distinct words than vocab_size
         CAST(ROUND(LN((COALESCE(mc.n, 0) + 1)
                       / CAST(COALESCE(tk.tok, 0)
                              + (SELECT COUNT(*) FROM vocab)
                              AS DOUBLE)), 6)
              AS DECIMAL(12,6)) AS lp
  FROM grid g
  LEFT JOIN mc{r} mc ON g.topic = mc.topic AND g.word = mc.word
  LEFT JOIN tk{r} tk ON g.topic = tk.topic),
lpi{r} AS MATERIALIZED (
  SELECT t.topic,
         CAST(ROUND(LN((COALESCE(dc.nd, 0) + 1)
                       / CAST(nn.n_docs + {k} AS DOUBLE)), 6)
              AS DECIMAL(12,6)) AS lpi
  FROM topics t LEFT JOIN dc{r} dc ON t.topic = dc.topic CROSS JOIN nn),
sc{r} AS MATERIALIZED (
  SELECT d.doc_id, lt.topic, SUM(d.c * lt.lp) AS s
  FROM dw d JOIN lt{r} lt ON d.word = lt.word
  GROUP BY d.doc_id, lt.topic),
a{r} AS MATERIALIZED (
  SELECT doc_id, topic FROM (
    SELECT s.doc_id, s.topic,
           ROW_NUMBER() OVER (PARTITION BY s.doc_id
                              ORDER BY (s.s + p.lpi) DESC, s.topic ASC)
             AS rk
    FROM sc{r} s JOIN lpi{r} p ON s.topic = p.topic
  ) WHERE rk = 1)"""
        prev = f"a{r}"
    sql += f""",
fmc AS MATERIALIZED (
  SELECT a.topic, d.word, CAST(SUM(d.c) AS BIGINT) AS n
  FROM dw d JOIN {prev} a USING (doc_id) GROUP BY a.topic, d.word),
fdc AS MATERIALIZED (
  SELECT topic, CAST(COUNT(*) AS BIGINT) AS nd FROM {prev}
  GROUP BY topic),
ftw AS MATERIALIZED (
  SELECT topic,
         CAST(SUM(n) AS BIGINT) AS n_tokens,
         array_to_string(list(word ORDER BY n DESC, word ASC)[1:5], ' ')
           AS top_words
  FROM fmc GROUP BY topic)
SELECT t.topic,
       COALESCE(fdc.nd, 0) AS n_docs,
       COALESCE(ftw.n_tokens, 0) AS n_tokens,
       COALESCE(ftw.top_words, '') AS top_words
FROM topics t
LEFT JOIN fdc ON t.topic = fdc.topic
LEFT JOIN ftw ON t.topic = ftw.topic
ORDER BY t.topic"""
    return sql


@register(
    "topic_model_mixture",
    oracle=_topic_oracle_sql(),  # upgraded from rows-only (verdict
    # r9 #3): the trainer's exactness discipline (integer counts,
    # DECIMAL(12,6) scores) makes the unrolled-EM replay exact; the
    # fit is ALSO pinned (assignments, counts, vocab) against a
    # sequential reference in tests/test_topics.py.
    category="pipeline",
)
def topic_model_mixture(spark, t):
    """Mixture-of-unigrams topic model over the documents table
    (operators/topics.py — Nigam et al. 2000, hard/classification EM
    per Celeux & Govaert 1992): the corpus-exploration tier above
    embedding k-means, clustering documents by word distribution
    with an explicit per-topic unigram model. Per round: ONE
    broadcast join against the V×K DECIMAL(12,6) score table + one
    doc-keyed exact-decimal aggregate (E-step, map-side combine),
    then ≤V×K integer counts collected (M-step) — bounded driver
    state, checkpoint-rooted lineage, RNG-free md5 init; convergence
    is a changed-count scalar. Output: per-topic document/token mass
    and the top-5 words — scalar columns only (driver canonicalizer
    contract)."""
    from ..operators import topics

    assign, model = topics.train_topics(
        t.documents, k=4, vocab_size=64, n_rounds=6
    )
    assign.unpersist()
    return topics.topic_summary(spark, model, k=4, top_n=5)


def _tokenizer_compare_oracle() -> str:
    """Synthesized oracle for ``vocab_tokenizer_compare`` (rows-only
    → hash-green upgrade): composes the three unrolled trainer
    replays in one statement under distinct CTE prefixes —
    BPE (pipeline4._bpe_rounds_sql, 8 merges; corpus token total is
    Σ freq·len(syms) over the evolved word table, since training
    evolution == rank-order application), WordPiece (scored rounds +
    the greedy encoder over the shared word-frequency table), and
    unigram-LM (pipeline5._unigram_rounds_sql at vocab_size=64,
    seed_size=512, + one more segmentation block under the final
    vocab). Fertility uses the trainer's floor-form pround at
    scale 4."""
    from .pipeline4 import _bpe_rounds_sql
    from .pipeline5 import _unigram_rounds_sql, _unigram_seg_block

    fert = (
        "FLOOR(CAST(({nt}) AS DOUBLE) / (SELECT n FROM nw)"
        " * 10000 + 0.5) / 10000"
    )
    return f"""
WITH {_bpe_rounds_sql(8, keep_word=False, pfx='tb')},
{_wp_rounds_sql(8, keep_word=False, pfx='tw')},
{_wp_vocab_cte('tw', 8)},
{_unigram_rounds_sql(vocab_size=64, seed_size=512)},
{_wp_encode_rounds('tw', 'twvocab', '(SELECT w FROM uwf) _')},
uvlp AS MATERIALIZED (
  SELECT piece, lp FROM uvocab JOIN ulogpF USING (piece)
),
{_unigram_seg_block('C', 'uvlp', 'uwf')},
nw AS (
  SELECT CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+')))
              AS BIGINT) AS n
  FROM documents
),
nd AS (SELECT COUNT(*) AS n FROM documents),
tb_tot AS (
  SELECT CAST(SUM(freq * len(syms)) AS BIGINT) AS nt FROM tbw8
),
tw_tot AS (
  SELECT CAST(SUM(f.freq * k.nt) AS BIGINT) AS nt,
         CAST(SUM(f.freq * k.nu) AS BIGINT) AS nu
  FROM twwtok k JOIN uwf f USING (w)
),
tu_tot AS (
  SELECT CAST(SUM(f.freq * len(b.toks)) AS BIGINT) AS nt
  FROM ubestC b JOIN uwf f USING (w)
)
SELECT 'bpe' AS tokenizer, (SELECT n FROM nd) AS n_docs,
       (SELECT nt FROM tb_tot) AS n_tokens,
       {fert.format(nt='SELECT nt FROM tb_tot')} AS fertility,
       0 AS n_unk
UNION ALL
SELECT 'unigram_lm', (SELECT n FROM nd), (SELECT nt FROM tu_tot),
       {fert.format(nt='SELECT nt FROM tu_tot')}, 0
UNION ALL
SELECT 'wordpiece', (SELECT n FROM nd), (SELECT nt FROM tw_tot),
       {fert.format(nt='SELECT nt FROM tw_tot')},
       (SELECT nu FROM tw_tot)
"""


@register(
    "vocab_tokenizer_compare",
    oracle=_tokenizer_compare_oracle(),
    category="pipeline",
)
def vocab_tokenizer_compare(spark, t):
    """Tokenizer selection report — the comparative eval a pipeline
    runs BEFORE committing a tokenizer to a 100 TB pretokenization
    pass: BPE (Sennrich 2016), WordPiece (likelihood-scored merges),
    and unigram-LM (Kudo 2018) trained on the same corpus at equal
    merge budgets, then applied corpus-wide; per tokenizer the report
    gives total tokens, fertility (tokens per whitespace word — the
    compression dial that prices every downstream training step),
    and the UNK count (nonzero only for WordPiece's closed vocab;
    BPE/unigram fall back to characters).

    Scale shape: each trainer is the already-audited bounded-rounds
    loop (driver state = vocab-sized); each apply is map-only with
    the model in the Arrow kernel closure; the final report is three
    1-row aggregates unioned — nothing here adds a shuffle beyond
    the trainers' own keyed aggregates."""
    from ..functions.hive_compat import pround
    from ..operators import bpe, unigram_lm as ulm, wordpiece as wp

    docs = t.documents
    n_words_row = docs.select(
        F.sum(
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        ).alias("w")
    ).collect()[0]
    n_words = int(n_words_row["w"])

    merges = bpe.train_bpe(docs, "text", n_merges=8)
    bpe_tok = bpe.apply_bpe(docs, merges, "text", "doc_id")
    wp_vocab, _ = wp.wordpiece_vocab(docs, "text", n_merges=8)
    wp_tok = wp.apply_wordpiece(docs, wp_vocab, "text", "doc_id")
    u_vocab = ulm.train_unigram_lm(
        docs, "text", vocab_size=64, n_rounds=3
    )
    u_tok = ulm.apply_unigram_lm(docs, u_vocab, "text", "doc_id")

    def summarize(df, name, tok_col, unk_col=None):
        unk = F.sum(unk_col) if unk_col else F.lit(0).cast("bigint")
        return df.agg(
            F.lit(name).alias("tokenizer"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok_col).alias("n_tokens"),
            unk.alias("n_unk"),
        )
    rep = (
        summarize(bpe_tok, "bpe", "n_tokens")
        .unionAll(summarize(wp_tok, "wordpiece", "n_tokens", "n_unk"))
        .unionAll(summarize(u_tok, "unigram_lm", "n_pieces"))
    )
    return rep.select(
        "tokenizer",
        "n_docs",
        "n_tokens",
        pround(F.col("n_tokens") / F.lit(n_words), 4).alias("fertility"),
        "n_unk",
    ).orderBy("tokenizer")


@register(
    "meta_plan_shuffle_census",
    oracle=None,  # engine plan facts have no DuckDB twin; the census
    # values are pinned against literal expectations in
    # tests/test_plan_audit.py::test_shuffle_census_pinned.
    category="meta",
)
def meta_plan_shuffle_census(spark, t):
    """EXPLAIN-surface census (Hive ``ExplainTask`` made machine-
    checkable, the sibling of ``meta_column_lineage``): for three
    flagship plans, count the physical facts that decide 100 TB
    behavior — exchanges (every one is a cluster-wide shuffle),
    broadcast vs sort-merge joins, and whether the parquet scans
    carry pushed filters (codegen spans are an execution-time fact
    under AQE, so they are asserted in tests, not here). This is the
    pre-flight a user runs to see WHY a query will or won't scale,
    as data rather than as EXPLAIN text."""
    from ..plans.audit import analyze
    from .registry import all_queries as _all

    qs = _all()
    rows = []
    for name in ("q3_shipping_priority", "q18_large_orders", "agg_cube_grouping_id"):
        facts = analyze(qs[name].fn(spark, t.sf_dir))
        rows.append(
            (
                name,
                facts.n_exchanges,
                facts.n_broadcast_joins,
                facts.n_sortmerge_joins,
                len(facts.pushed_filters) > 0
                and any(p.strip() for p in facts.pushed_filters),
            )
        )
    return spark.createDataFrame(
        rows,
        "query string, n_exchanges int, n_broadcast_joins int,"
        " n_sortmerge_joins int, has_pushed_filters boolean",
    ).orderBy("query")


@register(
    "corpus_source_diversity",
    oracle="""
WITH obs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs),
terms AS (
  SELECT o.n,
         CAST(ROUND(-(CAST(o.n AS DOUBLE) / t.total)
                    * LN(CAST(o.n AS DOUBLE) / t.total), 6)
              AS DECIMAL(38,6)) AS h_term,
         CAST(ROUND((CAST(o.n AS DOUBLE) / t.total)
                    * (CAST(o.n AS DOUBLE) / t.total), 6)
              AS DECIMAL(38,6)) AS s_term,
         CAST(o.n AS DOUBLE) / t.total AS p
  FROM obs o, tot t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
       (SELECT total FROM tot) AS n_docs,
       CAST(SUM(h_term) AS DOUBLE) AS shannon_entropy,
       FLOOR(EXP(CAST(SUM(h_term) AS DOUBLE)) * 1000000 + 0.5)
         / 1000000 AS effective_sources,
       CAST(SUM(s_term) AS DOUBLE) AS simpson_index,
       FLOOR(MAX(p) * 1000000 + 0.5) / 1000000 AS top_source_share
FROM terms
""",
    category="pipeline",
)
def corpus_source_diversity(spark, t):
    """Source-mix diversity card — the one-row health check a
    mixing pass (corpus_mix_temperature) is judged against: Shannon
    entropy of the source distribution, effective source count
    e^H (the interpretable 'how many equally-sized sources is this
    mix worth'), Simpson concentration Σp², and the top source's
    share. Entropy/Simpson terms round to 6 and accumulate as
    DECIMAL(38,6) (the Zipf idiom — exact, order-independent), the
    exp/quotients are pround-ed. One keyed aggregate + a
    |sources|-row second pass; nothing corpus-sized leaves the
    mappers."""
    from ..functions.hive_compat import pround

    obs = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = obs.agg(F.sum("n").cast("bigint").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    dec = "decimal(38,6)"
    terms = obs.crossJoin(F.broadcast(tot)).select(
        F.round(-p * F.log(p), 6).cast(dec).alias("h_term"),
        F.round(p * p, 6).cast(dec).alias("s_term"),
        p.alias("p"),
        "total",
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.max("total").alias("n_docs"),
        F.sum("h_term").cast("double").alias("shannon_entropy"),
        pround(F.exp(F.sum("h_term").cast("double"))).alias(
            "effective_sources"
        ),
        F.sum("s_term").cast("double").alias("simpson_index"),
        pround(F.max("p")).alias("top_source_share"),
    )


@register(
    "events_dau_mau_stickiness",
    oracle="""
WITH active AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
),
cal AS (SELECT DISTINCT day FROM active),
cover AS (
  SELECT a.user_id, c.day AS report_day
  FROM active a JOIN cal c
    ON c.day >= a.day AND c.day <= a.day + INTERVAL 29 DAY
),
mau AS (
  SELECT report_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM cover GROUP BY report_day
),
dau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM active GROUP BY day
)
SELECT m.report_day, d.dau, m.mau,
       FLOOR(CAST(d.dau AS DOUBLE) / m.mau * 1000000 + 0.5) / 1000000
         AS stickiness
FROM mau m JOIN dau d ON d.day = m.report_day
ORDER BY m.report_day
""",
    category="analytics",
)
def events_dau_mau_stickiness(spark, t):
    """DAU/MAU stickiness per day — the engagement ratio every
    product warehouse reports: daily distinct users over rolling
    30-day distinct users, via the same coverage-explosion trick as
    ``events_rolling_wau`` (each (user, active-day) fact covers the
    30 report days it contributes to — one bounded 30× map-only
    explode + a single distinct aggregate; a windowed COUNT DISTINCT
    has no efficient frame form and the calendar join lives in the
    oracle). The ratio is a pround quotient of two exact BIGINTs, so
    both engines agree bit-for-bit."""
    from ..functions.hive_compat import pround

    active = (
        t.events.select(
            "user_id", F.col("ts").cast("date").alias("day")
        ).distinct()
    )
    cal = active.select("day").distinct()
    cover = active.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 29))
        ).alias("report_day"),
    ).join(
        cal.withColumnRenamed("day", "report_day"), "report_day", "left_semi"
    )
    mau = cover.groupBy("report_day").agg(
        F.countDistinct("user_id").cast("bigint").alias("mau")
    )
    dau = active.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    return (
        mau.join(dau.withColumnRenamed("day", "report_day"), "report_day")
        .select(
            "report_day",
            "dau",
            "mau",
            pround(
                F.col("dau").cast("double") / F.col("mau").cast("double")
            ).alias("stickiness"),
        )
        .orderBy("report_day")
    )
