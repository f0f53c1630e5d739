"""Corpus-preparation operator tests: distributed prefix sum
equivalence, packing invariants, decontamination plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hdp2_5_hive_spark.operators import corpus as cp

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_prefix_sum_matches_global_window(spark):
    """Two-phase block scan == naive global-window cumsum, with a
    block size small enough (7) to force many blocks + offsets."""
    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 13 + 1).alias("v")
    )
    fast = cp.distributed_prefix_sum(df, "id", "v", block_size=7)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    naive = df.withColumn(
        "expect", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long")
    )
    joined = fast.join(naive, "id")
    assert joined.filter(F.col("cum_before") != F.col("expect")).count() == 0


def test_prefix_sum_no_global_exchange_funnel(spark):
    """The big-side window must be partitioned by block (parallel),
    not a single global sort partition: the plan's first window runs
    under `partitionBy _blk`."""
    df = spark.range(0, 1000).select(F.col("id"), F.lit(2).alias("v"))
    plan = cp.distributed_prefix_sum(df, "id", "v")._jdf.queryExecution().toString()
    assert "_blk" in plan  # block-partitioned window present


def test_pack_sequences_invariants(docs):
    packed = cp.pack_sequences(docs, ctx_len=128)
    rows = packed.orderBy("doc_id").collect()
    # offsets are the exclusive cumsum of token counts in id order
    run = 0
    for r in rows:
        assert r.start_offset == run
        run += r.n_tokens
    # bin assignment consistent with offsets
    for r in rows:
        assert r.bin_id == r.start_offset // 128
        crosses = (r.start_offset // 128) != (
            (r.start_offset + r.n_tokens - 1) // 128
        )
        assert r.crosses_boundary == crosses


def test_packing_stats_conserve_tokens(docs):
    packed = cp.pack_sequences(docs, ctx_len=128)
    stats = cp.packing_stats(packed, ctx_len=128)
    total_direct = packed.agg(F.sum("n_tokens")).collect()[0][0]
    total_binned = stats.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_direct == total_binned
    assert stats.filter(F.col("contained_tokens") > F.col("n_tokens")).count() == 0


def test_decontaminate_broadcasts_eval_side(docs):
    corpus = docs.filter(F.col("source") != "src0")
    eval_df = docs.filter(F.col("source") == "src0")
    out = cp.decontaminate(corpus, eval_df, k=5, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # self-decontamination: every eval doc fully overlaps itself
    self_out = cp.decontaminate(eval_df, eval_df, k=5, threshold=0.99)
    bad = self_out.filter(~F.col("is_contaminated")).count()
    assert bad == 0


def test_repetition_stats_bounds(docs):
    stats = cp.repetition_stats(docs)
    n = stats.count()
    assert n == docs.count()
    in_range = stats.filter(
        (F.col("distinct_word_ratio") > 0)
        & (F.col("distinct_word_ratio") <= 1)
        & (F.col("top_word_share") > 0)
        & (F.col("top_word_share") <= 1)
        & (F.col("dup_2gram_ratio") >= 0)
        & (F.col("dup_2gram_ratio") < 1)
    ).count()
    assert in_range == n


def test_top_ngrams_is_top_k(docs):
    out = cp.top_ngrams(docs, k=2, top=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = out.collect()
    assert len(rows) == 10
    counts = [r.occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_bm25_broadcasts_query_side_only(spark, docs):
    """BM25: the three broadcast exchanges are query terms, narrowed
    dfs, and corpus scalars — the corpus-side term table must join as
    the probe (streamed) side, never broadcast."""
    from hdp2_5_hive_spark.operators import retrieval as rt

    corpus = docs.filter(F.col("doc_id") >= 5)
    queries = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    out = rt.bm25_scores(corpus, queries)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # self-retrieval sanity: a query's own text scores every doc that
    # shares a term; scores are finite and positive
    n_bad = out.filter(
        F.col("score").isNull() | F.isnan("score") | (F.col("score") < 0)
    ).count()
    assert n_bad == 0


def test_hll_sketch_accuracy_and_invariance(spark):
    """HLL NDV estimate: ≤2% relative error at this cardinality and
    identical under any partitioning (sketch union associativity)."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    est = lambda d: d.selectExpr(  # noqa: E731
        "hll_sketch_estimate(hll_sketch_agg(l_partkey)) e",
        "count(distinct l_partkey) x",
    ).collect()[0]
    r1 = est(li)
    r17 = est(li.repartition(17))
    assert r1.e == r17.e  # partition-invariant
    assert abs(r1.e - r1.x) / r1.x < 0.02


def test_asof_join_semantics_and_plan(spark):
    """asof_join: picks the latest right row with ts <= left ts,
    same-instant rows match, tolerance nulls stale matches — and the
    physical plan contains NO join node (window composition, one
    keyed exchange)."""
    from hdp2_5_hive_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", "L1"),
         ("u", "2024-01-01 12:00:00", "L2"),
         ("v", "2024-01-01 09:00:00", "L3")],
        "k string, ts string, lid string",
    ).select("k", F.to_timestamp("ts").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("u", "2024-01-01 09:30:00", "R1"),
         ("u", "2024-01-01 10:00:00", "R2"),   # same instant as L1
         ("u", "2024-01-01 11:00:00", "R3")],
        "k string, ts string, rid string",
    ).select("k", F.to_timestamp("ts").alias("ts"), "rid")

    out = asof_join(left, right, on=["k"], ts_col="ts", right_value_cols=["rid"])
    got = {r.lid: r.right_rid for r in out.collect()}
    assert got == {"L1": "R2", "L2": "R3", "L3": None}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # window carry, not a join

    tol = asof_join(
        left, right, on=["k"], ts_col="ts", right_value_cols=["rid"],
        tolerance="30 minutes",
    )
    got_tol = {r.lid: r.right_rid for r in tol.collect()}
    assert got_tol == {"L1": "R2", "L2": None, "L3": None}  # R3 is 1h stale

    # duplicate-(key, ts) right rows (regression): the window order
    # must be a TOTAL order — with ties left to the engine the
    # carried value was partition/sort luck. Rule: the greatest value
    # tuple among equal-ts right rows wins, on every partitioning.
    dup = spark.createDataFrame(
        [("u", "2024-01-01 09:30:00", "R1"),
         ("u", "2024-01-01 09:30:00", "R9"),
         ("u", "2024-01-01 09:30:00", "R5")],
        "k string, ts string, rid string",
    ).select("k", F.to_timestamp("ts").alias("ts"), "rid")
    for reparted in (dup, dup.repartition(7), dup.coalesce(1)):
        d = asof_join(
            left, reparted, on=["k"], ts_col="ts", right_value_cols=["rid"]
        )
        got_dup = {r.lid: r.right_rid for r in d.collect()}
        assert got_dup == {"L1": "R9", "L2": "R9", "L3": None}


def test_rollup_reuse_exact(spark):
    """Daily-from-hourly == daily-from-raw (decomposable aggregates)."""
    from hdp2_5_hive_spark.operators.timeseries import rollup_reuse

    from hdp2_5_hive_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "event_type", "value"
    )
    _, daily = rollup_reuse(ev, "ts", "event_type", "value")
    direct = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("bucket_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_v"),
        )
    )
    diff = (
        daily.select("bucket_start", "event_type", "n", "sum_v")
        .exceptAll(direct)
        .count()
    )
    assert diff == 0 and daily.count() == direct.count()


def test_asof_join_empty_right_side(spark):
    """No right rows at all → every left row matches NULL (left
    semantics preserved, no crash in the window carry)."""
    from hdp2_5_hive_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", "L1")], "k string, ts string, lid string"
    ).select("k", F.to_timestamp("ts").alias("ts"), "lid")
    right = left.filter(F.lit(False)).select(
        "k", "ts", F.col("lid").alias("rid")
    )
    out = asof_join(left, right, on=["k"], ts_col="ts", right_value_cols=["rid"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0].right_rid is None


def test_decontaminate_empty_eval_set(spark, docs):
    """Empty benchmark → nothing is contaminated (left join keeps
    every corpus doc; zero matches)."""
    from hdp2_5_hive_spark.operators.corpus import decontaminate

    out = decontaminate(docs, docs.filter(F.lit(False)), k=5, threshold=0.5)
    assert out.filter(F.col("is_contaminated")).count() == 0
    assert out.filter(F.col("n_matched") != 0).count() == 0


def test_pack_sequences_doc_larger_than_ctx(spark):
    """A doc longer than the context window must mark
    crosses_boundary and still keep offsets exact."""
    from hdp2_5_hive_spark.operators.corpus import pack_sequences

    rows = [(0, "w " * 10), (1, "x " * 300), (2, "y " * 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in pack_sequences(df, ctx_len=128).collect()}
    assert out[1].crosses_boundary  # 300 tokens > 128-token bin
    assert out[0].start_offset == 0
    assert out[1].start_offset == out[0].n_tokens
    assert out[2].start_offset == out[0].n_tokens + out[1].n_tokens


def test_train_holdout_split_map_only_and_leakproof(spark, docs):
    """Split is map-only (no Exchange in the plan), deterministic
    across invocations, and exact duplicates land on the same side."""
    from hdp2_5_hive_spark.operators.corpus import train_holdout_split

    out = train_holdout_split(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split) for r in train_holdout_split(docs).collect()}
    assert a == b
    # duplicate texts share a bucket (content-keyed)
    two = docs.limit(1).union(docs.limit(1))
    buckets = [r.bucket for r in train_holdout_split(two).collect()]
    assert buckets[0] == buckets[1]


def test_line_dedup_keeps_first_occurrence(spark):
    """A chunk repeated across docs survives only at its first
    (doc_id, chunk_idx); unique chunks are untouched; a doc that is
    entirely repeats drops out."""
    from hdp2_5_hive_spark.operators.corpus import line_dedup

    a = "a b c"          # unique
    rep = "x y z"        # repeated everywhere
    rows = [
        (1, rep + " " + a),   # chunk0=rep (first), chunk1=a
        (2, rep),             # chunk0=rep (dup) -> doc drops out
        (3, a + " " + rep),   # both chunks are dups of doc1's
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.text_clean, r.n_kept)
        for r in line_dedup(df, "doc_id", "text", chunk_words=3).collect()
    }
    # doc1 keeps both chunks (first occurrence of rep AND of a)
    assert out[1] == (rep + " " + a, 2)
    # doc2 was nothing but a repeat of rep -> gone
    assert 2 not in out
    # doc3: its "a b c" chunk is a dup of doc1's, its rep chunk too
    assert 3 not in out
    assert len(out) == 1


def test_boilerplate_filter_drops_high_df_chunks_everywhere(spark):
    """A chunk in ≥ min_docs distinct docs is dropped from EVERY doc
    (C4 semantics — contrast line_dedup's keep-first); chunks below
    the threshold survive even when repeated WITHIN one doc; a doc
    that is all boilerplate keeps its row with NULL text."""
    from hdp2_5_hive_spark.operators.corpus import boilerplate_filter

    boiler = "x y z"     # in 3 distinct docs -> dropped
    twice = "p q r"      # twice in ONE doc -> df=1, kept
    rows = [
        (1, boiler + " a b c"),
        (2, boiler + " " + twice + " " + twice),
        (3, boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in boilerplate_filter(
            df, "doc_id", "text", chunk_words=3, min_docs=3
        ).collect()
    }
    assert len(out) == 3
    assert (out[1].text_clean, out[1].n_kept, out[1].n_dropped) == (
        "a b c", 1, 1)
    assert (out[2].text_clean, out[2].n_kept, out[2].n_dropped) == (
        twice + " " + twice, 2, 1)
    # all-boilerplate doc: row kept, text NULL
    assert out[3].text_clean is None
    assert (out[3].n_kept, out[3].n_dropped) == (0, 1)
    # below threshold (min_docs=4): nothing dropped
    out4 = boilerplate_filter(
        df, "doc_id", "text", chunk_words=3, min_docs=4
    ).agg({"n_dropped": "sum"}).collect()[0][0]
    assert out4 == 0


def test_snapshot_diff_classifies_by_content_not_presence(spark):
    """Same id + same text → no row (a re-fetch is not churn); same
    id + new text → changed; id only in new → added; only in old →
    removed."""
    from hdp2_5_hive_spark.operators.corpus import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.status
        for r in snapshot_diff(old, new, "doc_id", "text").collect()
    }
    assert out == {2: "changed", 3: "removed", 4: "added"}

    # NULL text (regression): presence must come from the join, not
    # from md5 nullability — md5(NULL) is NULL, which used to make a
    # present-in-both doc with NULL old text look "added" (and NULL
    # new text look "removed"). NULL <-> text is changed; NULL <->
    # NULL is unchanged (no row).
    old_n = spark.createDataFrame(
        [(1, None), (2, "b"), (5, None)], "doc_id long, text string"
    )
    new_n = spark.createDataFrame(
        [(1, "x"), (2, None), (4, "d"), (5, None)],
        "doc_id long, text string",
    )
    out_n = {
        r.doc_id: r.status
        for r in snapshot_diff(old_n, new_n, "doc_id", "text").collect()
    }
    assert out_n == {1: "changed", 2: "changed", 4: "added"}


def test_redact_pii_counts_and_placeholders(spark):
    from hdp2_5_hive_spark.operators.corpus import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b@c.io and x@y.org now"),
            (2, "call 555-0199 or 555-0100"),
            (3, "clean text"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df, "doc_id", "text").collect()}
    assert out[1].n_emails == 2 and out[1].n_phones == 0
    assert out[1].text_redacted == "mail <EMAIL> and <EMAIL> now"
    assert out[2].n_phones == 2 and "<PHONE>" in out[2].text_redacted
    assert out[3].text_redacted == "clean text"


def test_bloom_filter_no_false_negatives_and_fp_bound(spark):
    """Bloom contract on seeded hashes: every inserted hash probes
    true (no false negatives — structural guarantee), and the FP rate
    on 20k non-members stays under 2% (theory: (1-e^{-kn/m})^k ≈ 3e-5
    at n=5k, m=2^20, k=5; the 2% bound is loud-failure headroom, not
    the expectation)."""
    import numpy as np

    from hdp2_5_hive_spark.operators.corpus import (
        bloom_build,
        bloom_contains_col,
    )

    rng = np.random.default_rng(11)
    members = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    non = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    non = np.setdiff1d(non, members)
    mdf = spark.createDataFrame([(int(x),) for x in members], "gh long")
    bloom = bloom_build(mdf)
    contains = bloom_contains_col(bloom)
    got_m = (
        mdf.select(contains(F.col("gh")).alias("ok"))
        .agg(F.sum(F.col("ok").cast("int")).alias("n"))
        .collect()[0]
        .n
    )
    assert got_m == len(members)  # zero false negatives
    ndf = spark.createDataFrame([(int(x),) for x in non], "gh long")
    fp = (
        ndf.select(contains(F.col("gh")).alias("ok"))
        .agg(F.sum(F.col("ok").cast("int")).alias("n"))
        .collect()[0]
        .n
    )
    assert fp / len(non) < 0.02, f"FP rate {fp / len(non):.4f}"


def test_decontaminate_bloom_equals_exact(spark, sf_dir):
    """The Bloom-prefiltered decontamination must return EXACTLY the
    exact path's rows — the confirm join removes every false
    positive."""
    from hdp2_5_hive_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    exact = cp.decontaminate(corpus, ev, k=5, threshold=0.5)
    bloomed = cp.decontaminate_bloom(corpus, ev, k=5, threshold=0.5)
    assert exact.exceptAll(bloomed).count() == 0
    assert bloomed.exceptAll(exact).count() == 0


def test_unigram_logprob_hand_computed(spark):
    """3-doc corpus with hand-computable unigram stats: 'a' appears
    4/8 tokens (1 bit), 'b' 2/8 (2 bits), 'c'/'d' 1/8 (3 bits)."""
    from hdp2_5_hive_spark.operators.quality import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "a d")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    assert out[1].n_tokens == 3 and abs(out[1].bits_per_token - (1 + 1 + 2) / 3) < 1e-6
    assert out[2].n_tokens == 3 and abs(out[2].bits_per_token - (1 + 2 + 3) / 3) < 1e-6
    assert out[3].n_tokens == 2 and abs(out[3].bits_per_token - (1 + 3) / 2) < 1e-6


def test_quantize_int8_roundtrip_bounds(spark):
    """Quantization invariants: |err| <= scale/2 elementwise (round
    to nearest), cosine(orig, dequant) ~ 1, saturation only at the
    max-|x| element(s)."""
    from hdp2_5_hive_spark.operators.quantize import quantize_int8_stats

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [127.0, 1.0, -127.0, 64.0]),
            (3, [0.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in quantize_int8_stats(df).collect()}
    assert out[1].n_saturated == 1  # the 1.0 element maps to ±127
    assert out[1].max_abs_err <= out[1].scale / 2 + 1e-12
    assert out[1].cos_dequant > 0.9999
    assert out[2].n_saturated == 2
    assert out[3].max_abs_err == 0.0  # zero vector: guarded scale


def test_compression_ratio_signal(spark):
    """zlib ratio separates repetitive from high-entropy text, and
    empty text is guarded to 1.0."""
    from hdp2_5_hive_spark.operators.quality import compression_ratio

    df = spark.createDataFrame(
        [
            (1, "spam " * 200),
            (2, "the quick brown fox jumps over the lazy dog and keeps going"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.zlib_ratio for r in compression_ratio(df).collect()}
    assert out[1] < 0.05          # 200x repetition collapses
    assert 0.5 < out[2] <= 1.2    # normal sentence barely compresses
    assert out[3] == 1.0          # empty guarded


def test_jaccard_prefix_equals_bruteforce(spark, sf_dir):
    """Prefix-filtered exact join == O(N²) brute force, pair for
    pair (the pruning is lossless by theorem, this pins it)."""
    from hdp2_5_hive_spark.catalog import load_table
    from hdp2_5_hive_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id").alias("id"), dd.shingles_col(F.col("text")).alias("s")
    ).filter(F.size("s") > 0)
    a = sh.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
    brute = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", dd.jaccard_col(F.col("sa"), F.col("sb")).alias("j")
        )
        .filter(F.col("j") >= 0.6)
        .collect()
    }
    fast = {
        (r.id_a, r.id_b)
        for r in dd.jaccard_prefix_pairs(
            docs, "doc_id", "text", threshold=0.6
        ).collect()
    }
    assert fast == brute and brute


def test_prefix_filter_fp_ceiling_completeness(spark):
    """Regression: the prefix length p = n - ceil(theta*n) + 1 must
    use the TRUE integer ceiling. The FP product can overshoot it —
    ceil(0.56 * 25) = ceil(14.000000000000002) = 15 — shortening the
    prefix by one and silently missing qualifying pairs. Adversarial
    construction that the overshoot missed before the 1e-9 backoff:
    doc A = 11 unique words + 14 shared, doc B = the 14 shared words
    (J = 14/25 = 0.56 exactly; containment of A in B = 0.56 too).
    The shared words have global df=2 so they sort LAST in A's
    rarity order (ranks 12-25); the old 11-token prefix held only
    A-unique words and generated no candidate."""
    from hdp2_5_hive_spark.operators import dedup as dd

    words_a = [f"u{i:02d}" for i in range(11)] + [
        f"s{i:02d}" for i in range(14)
    ]
    words_b = [f"s{i:02d}" for i in range(14)]
    df = spark.createDataFrame(
        [(1, " ".join(words_a)), (2, " ".join(words_b))],
        "doc_id long, text string",
    )
    jp = dd.jaccard_prefix_pairs(
        df, "doc_id", "text", threshold=0.56, shingle_k=1
    ).collect()
    assert [(r.id_a, r.id_b) for r in jp] == [(1, 2)]
    cp = dd.containment_pairs(
        df, "doc_id", "text", threshold=0.56, shingle_k=1
    ).collect()
    got = {(r.id_in, r.id_of): r.containment for r in cp}
    assert got[(1, 2)] == 14 / 25  # A's side relied on the fix
    assert got[(2, 1)] == 1.0


def test_pack_ffd_matches_reference_and_invariants(spark, sf_dir):
    """FFD packing: matches a sequential reference per shard (same
    md5 sharding, same sort, same first-fit), no bin over capacity,
    partition-invariant."""
    import hashlib

    from hdp2_5_hive_spark.operators import corpus as cp
    from hdp2_5_hive_spark.operators.textstats import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ctx = 128
    out = cp.pack_ffd(docs, "doc_id", "text", ctx_len=ctx, n_shards=4)
    rows = out.collect()
    out2 = cp.pack_ffd(
        docs.repartition(13), "doc_id", "text", ctx_len=ctx, n_shards=4
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2))

    toks = {
        str(r.doc_id): r.n
        for r in docs.select(
            "doc_id", token_count(F.col("text")).alias("n")
        ).collect()
    }
    # reference FFD per shard
    def shard_of(doc_id: str) -> int:
        h = hashlib.md5(f"pack-ffd{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % 4

    by_shard: dict[int, list[tuple[int, str]]] = {}
    for d, n in toks.items():
        by_shard.setdefault(shard_of(d), []).append((n, d))
    want: dict[str, tuple[int, int]] = {}
    for sh, items in by_shard.items():
        bins: list[int] = []
        for n, d in sorted(items, key=lambda t: (-t[0], t[1])):
            oversize = n > ctx
            placed = None
            if not oversize:
                for b, cap in enumerate(bins):
                    if cap >= n:
                        placed = b
                        break
            if placed is None:
                bins.append(0 if oversize else ctx - n)
                placed = len(bins) - 1
            else:
                bins[placed] -= n
            want[d] = (sh, placed)
    got = {r.doc_id: (r.shard, r.bin_id) for r in rows}
    assert got == want

    # capacity invariant
    fill: dict[tuple[int, int], int] = {}
    for r in rows:
        if not r.oversize:
            fill[(r.shard, r.bin_id)] = fill.get((r.shard, r.bin_id), 0) + r.n_tokens
    assert all(v <= ctx for v in fill.values())


def test_dsir_logratio_separates_target_domain(spark):
    """DSIR importance weights (Xie et al. 2023): docs drawn from
    the target domain's vocabulary must out-score docs from a
    disjoint vocabulary, the in-between doc lands in between, and
    weights are invariant to input partitioning (keyed aggregates
    only). Hand corpus: target = docs 1-2 ('data' dialect), raw
    additionally holds docs 3-4 ('cat' dialect) and mixed doc 5."""
    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.operators.quality import dsir_logratio

    rows = [
        (1, "data model trains on data", "t"),
        (2, "model trains data model", "t"),
        (3, "cat sat on the mat", "r"),
        (4, "the cat and the mat", "r"),
        (5, "data model cat mat", "r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = {
        r.doc_id: r
        for r in dsir_logratio(
            df, F.col("grp") == "t", "doc_id", "text", n_buckets=64
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # unigrams + bigrams: 5-word doc -> 9 grams
    assert out[1].n_grams == 9 and out[3].n_grams == 9
    tgt_min = min(out[1].log2_ratio, out[2].log2_ratio)
    far_max = max(out[3].log2_ratio, out[4].log2_ratio)
    assert tgt_min > out[5].log2_ratio > far_max
    repartitioned = {
        r.doc_id: r.log2_ratio
        for r in dsir_logratio(
            df.repartition(7), F.col("grp") == "t", "doc_id", "text",
            n_buckets=64,
        ).collect()
    }
    assert repartitioned == {k: v.log2_ratio for k, v in out.items()}


def test_cms_mergeable_and_never_underestimates(spark):
    """Count-Min invariants: (1) summing the sketches of two corpus
    halves cell-for-cell equals the whole-corpus sketch (the
    mergeability that lets 100 TB build as per-partition partials);
    (2) every estimate >= the true count; (3) with width far above
    the vocabulary, estimates are exact."""
    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.operators import sketches as sk

    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 2 + [("d",)] * 1
    toks = spark.createDataFrame(rows, "tok string")
    h1, h2 = toks.limit(6), toks.exceptAll(toks.limit(6))
    whole = sk.cms_build(toks, "tok", depth=3, width=32)
    merged = sk.cms_merge(
        sk.cms_build(h1, "tok", depth=3, width=32),
        sk.cms_build(h2, "tok", depth=3, width=32),
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0

    probes = toks.distinct()
    est = {
        r.tok: r.cms_est
        for r in sk.cms_estimate(
            probes, whole, "tok", depth=3, width=32
        ).collect()
    }
    true = {"a": 7, "b": 3, "c": 2, "d": 1}
    assert all(est[t] >= c for t, c in true.items())
    assert est == true  # width 32 >> 4 tokens: no collisions expected


def test_cms_absent_token_estimates_zero(spark):
    """A probe token the corpus never contained must estimate 0 —
    its cells are absent from the sparse sketch representation and
    count as implicit zeros (regression: an inner cell join dropped
    or overestimated such probes)."""
    from hdp2_5_hive_spark.operators import sketches as sk

    toks = spark.createDataFrame([("a",), ("b",)], "tok string")
    sketch = sk.cms_build(toks, "tok", depth=3, width=8)
    probes = spark.createDataFrame([("zzz",), ("a",)], "tok string")
    est = {
        r.tok: r.cms_est
        for r in sk.cms_estimate(
            probes, sketch, "tok", depth=3, width=8
        ).collect()
    }
    assert est["zzz"] == 0
    assert est["a"] >= 1


def test_cms_estimate_validates_probe_params(spark):
    """ADVICE r6: mismatched probe depth/width silently returned 0
    for present tokens (wrong cells addressed). Now: depth defaults
    to DERIVED from the sketch (max(s)+1), an explicit wrong depth
    raises, and a probe width smaller than a sketch bucket raises."""
    import pytest as _pytest

    from hdp2_5_hive_spark.operators import sketches as sk

    toks = spark.createDataFrame([("a",)] * 5 + [("b",)], "tok string")
    sketch = sk.cms_build(toks, "tok", depth=3, width=32)
    probes = toks.distinct()
    # derived depth — no parameter needed
    est = {
        r.tok: r.cms_est
        for r in sk.cms_estimate(probes, sketch, "tok", width=32).collect()
    }
    assert est == {"a": 5, "b": 1}
    with _pytest.raises(ValueError, match="depth"):
        sk.cms_estimate(probes, sketch, "tok", depth=5, width=32)
    # width smaller than an existing bucket index cannot match cells
    bmax = sketch.agg({"b": "max"}).first()[0]
    if bmax >= 2:  # overwhelmingly likely with 6 tokens x 3 rows
        with _pytest.raises(ValueError, match="width"):
            sk.cms_estimate(probes, sketch, "tok", width=2)
    # probing WIDER than the build passed the bmax heuristic but
    # addressed different cells (silent 0 for present tokens) — the
    # sketch now declares its build width and the mismatch raises
    with _pytest.raises(ValueError, match="build width"):
        sk.cms_estimate(probes, sketch, "tok", width=64)
    # and merging sketches of different widths raises instead of
    # keeping incompatible cells side by side
    other = sk.cms_build(probes, "tok", depth=3, width=16)
    with _pytest.raises(ValueError, match="widths differ"):
        sk.cms_merge(sketch, other)


def test_normalize_unicode_edges(spark):
    """Accent stripping keeps non-accent letters (ß, CJK), collapses
    mixed whitespace, preserves case, passes None through."""
    from hdp2_5_hive_spark.operators.textstats import normalize_unicode

    rows = [
        (1, "Café  déjà\tvu"),
        (2, "中文 ß  OK"),
        (3, None),
        (4, "  plain  "),
        (5, "한국어 텍스트"),  # Hangul: NFD → Jamo, MUST recompose
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_unicode(df).collect()}
    assert out[1].text_norm == "Cafe deja vu" and out[1].changed
    assert out[2].text_norm == "中文 ß OK" and out[2].changed
    assert out[3].text_norm is None and out[3].changed is None
    assert out[4].text_norm == "plain" and out[4].changed
    # ADVICE r6: Hangul canonical decomposition is NOT combining
    # marks — the output must be recomposed NFC, byte-identical to
    # the already-NFC input, with changed=false.
    assert out[5].text_norm == "한국어 텍스트" and not out[5].changed


def test_qsketch_merge_equals_global_and_plan(spark):
    """Bottom-k quantile-sketch invariants: (1) merging per-shard
    sketches equals sketching the whole corpus EXACTLY (bottom-k of a
    union == bottom-k of the union of per-part bottom-ks — the
    mergeability that lets 100 TB build per shard/day); (2) the build
    plans as TakeOrderedAndProject (bounded per-partition heap),
    never a global Sort+Exchange."""
    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.operators import sketches as sk

    rows = [(i, float((i * 37) % 101)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double")
    ident = F.col("id").cast("string")
    whole = sk.qsketch_build(df, "v", ident, k=24)
    a = sk.qsketch_build(df.filter("id % 3 = 0"), "v", ident, k=24)
    b = sk.qsketch_build(df.filter("id % 3 = 1"), "v", ident, k=24)
    c = sk.qsketch_build(df.filter("id % 3 = 2"), "v", ident, k=24)
    merged = sk.qsketch_merge(sk.qsketch_merge(a, b, k=24), c, k=24)
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )

    plan = whole._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_qsketch_rank_error_bounded(spark):
    """Quantile estimates from a k=400 sketch of 5000 distinct values
    land within rank error 4/sqrt(k) = 0.2 of the requested
    percentile (typical is ~1/sqrt(k); deterministic here — the md5
    permutation is fixed given the data)."""
    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.operators import sketches as sk

    n, k = 5000, 400
    df = spark.range(n).select(
        F.col("id"), F.col("id").cast("double").alias("v")
    )
    sketch = sk.qsketch_build(df, "v", F.col("id").cast("string"), k=k)
    row = sk.qsketch_quantiles(sketch, [0.1, 0.5, 0.9]).collect()[0]
    assert row.sample_k == k
    for p, est in ((0.1, row.p10), (0.5, row.p50), (0.9, row.p90)):
        rank = (est + 1) / n  # values are 0..n-1: rank(x) = (x+1)/n
        assert abs(rank - p) < 4 / k**0.5, (p, est, rank)


def test_chunk_documents_windows_and_reconstruction(spark):
    """chunk_documents semantics: 10 tokens at chunk=4/overlap=2 →
    starts 0,2,4,6 (stride 2); consecutive chunks share exactly
    ``overlap`` tokens; dropping each chunk's first ``overlap``
    tokens after chunk 0 reconstructs the document; a doc shorter
    than one chunk yields itself."""
    from hdp2_5_hive_spark.operators.corpus import chunk_documents

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b c")], "doc_id long, text string"
    )
    out = {
        (r.doc_id, r.chunk_id): r
        for r in chunk_documents(
            df, chunk_tokens=4, overlap=2
        ).collect()
    }
    d1 = [out[(1, i)] for i in range(4)]
    assert [r.chunk_text for r in d1] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9",
    ]
    assert all(r.n_chunk_tokens == 4 for r in d1)
    rebuilt = d1[0].chunk_text.split()
    for r in d1[1:]:
        rebuilt += r.chunk_text.split()[2:]
    assert rebuilt == words
    assert (2, 1) not in out and out[(2, 0)].chunk_text == "a b c"
    assert out[(2, 0)].n_chunk_tokens == 3

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_canonical_url_rules(spark):
    """Each canonicalization rule individually: fragment strip,
    scheme+host lowercase ONLY (path case kept), default-port drop
    (non-default kept), tracking-param removal preserving real
    params, dangling-separator tidy, trailing slash stripped only
    without a query."""
    from hdp2_5_hive_spark.operators.corpus import canonical_url_col

    cases = [
        ("HTTPS://WWW.EX.COM/Path/A#frag", "https://www.ex.com/Path/A"),
        ("http://ex.com:80/a", "http://ex.com/a"),
        ("https://ex.com:443/a", "https://ex.com/a"),
        ("https://ex.com:8080/a", "https://ex.com:8080/a"),
        ("https://ex.com/a?utm_source=x&page=2&utm_medium=y",
         "https://ex.com/a?page=2"),
        ("https://ex.com/a?fbclid=abc", "https://ex.com/a"),
        # once gclid is stripped the URL is query-less, so the
        # trailing-slash rule applies
        ("https://ex.com/a/?gclid=1", "https://ex.com/a"),
        ("https://ex.com/a/", "https://ex.com/a"),
        ("https://ex.com/a/?page=2", "https://ex.com/a/?page=2"),
        # boundary regression: parameters whose NAME merely ends in a
        # tracked name must survive (an unanchored pattern ate their
        # tails, '?afbclid=1' -> '?a', falsely merging distinct pages)
        ("https://ex.com/p?afbclid=1", "https://ex.com/p?afbclid=1"),
        ("https://ex.com/p?a=1&xgclid=2", "https://ex.com/p?a=1&xgclid=2"),
        # consecutive leading tracking params (stage-1 + stage-2 mix)
        ("https://ex.com/p?utm_a=1&utm_b=2&page=3", "https://ex.com/p?page=3"),
    ]
    df = spark.createDataFrame(
        [(u,) for u, _ in cases], "url string"
    ).select("url", canonical_url_col(F.col("url")).alias("c"))
    got = {r.url: r.c for r in df.collect()}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)


def test_ccnet_buckets_exact_terciles_and_order(spark):
    """Per language: tercile sizes differ by <=1 (ntile contract),
    every head doc's bits <= every tail doc's bits, and docs with
    equal bits break ties by doc_id (engine-reproducible order)."""
    from hdp2_5_hive_spark.operators.quality import (
        ccnet_perplexity_buckets,
    )

    rows = [
        # 7 'en' docs with visibly different fluency + 4 'de' docs
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog sat on the mat"),
        (3, "en", "the cat and the dog"),
        (4, "en", "zxq wvu ponm lkj"),
        (5, "en", "qqq zzz xxx"),
        (6, "en", "the the the the"),
        (7, "en", "cat dog mat on"),
        (8, "de", "der hund und die katze"),
        (9, "de", "die katze und der hund"),
        (10, "de", "blorp glurp"),
        (11, "de", "der der die die"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = ccnet_perplexity_buckets(df, "doc_id", "text", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "de"}
    for lang, rs in by_lang.items():
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            sizes[r.bucket] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        heads = [r.bits_per_token for r in rs if r.bucket == "head"]
        tails = [r.bits_per_token for r in rs if r.bucket == "tail"]
        assert max(heads) <= min(tails), (lang, heads, tails)
    # doc 8 and 9 are permutations -> identical bits; tie order is
    # by doc_id, so 8 ranks before 9 deterministically
    b8 = next(r for r in out if r.doc_id == 8)
    b9 = next(r for r in out if r.doc_id == 9)
    assert b8.bits_per_token == b9.bits_per_token
    order = {"head": 0, "middle": 1, "tail": 2}
    assert order[b8.bucket] <= order[b9.bucket]


def test_char_entropy_hand_computed(spark):
    """'aabb' -> 1 bit/char; 'abcd' -> 2 bits; 'aaaa' -> 0 bits;
    uniq counts and totals exact."""
    from hdp2_5_hive_spark.operators.textstats import char_entropy

    df = spark.createDataFrame(
        [(1, "aabb"), (2, "abcd"), (3, "aaaa")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert out[1].n_chars == 4 and out[1].n_uniq_chars == 2
    assert abs(out[1].bits_per_char - 1.0) < 1e-6
    assert abs(out[2].bits_per_char - 2.0) < 1e-6
    assert out[3].n_uniq_chars == 1 and out[3].bits_per_char == 0.0


def test_html_extract_hand_computed(spark):
    from hdp2_5_hive_spark.operators.textstats import html_extract

    df = spark.createDataFrame(
        [
            (1, '<html><head><script>x<y;</script><style>a{}</style>'
                '</head><body><h1 id="z">My  Title</h1>'
                '<p>Hello &amp; bye &lt;tag&gt; &quot;q&#39;</p></body></html>'),
            (2, "<p>no title</p>"),
        ],
        "doc_id long, html string",
    )
    out = {r.doc_id: r for r in html_extract(df).collect()}
    assert out[1].title == "My  Title"  # extracted BEFORE collapse
    assert out[1].text_extracted == 'My Title Hello & bye <tag> "q\''
    # script TEXT never leaks (x<y; is gone), style text gone
    assert "x<y" not in out[1].text_extracted
    assert out[2].title == "" and out[2].text_extracted == "no title"


def test_misra_gries_bounds_every_partitioning(spark):
    """MG invariants on a zipf-ish stream, checked under several
    forced partition layouts: (1) per-partition summaries hold at
    most k counters; (2) the merged estimate never exceeds the true
    count; (3) undercount is bounded by N/(k+1); (4) every token
    with true count > N/(k+1) is present.  The CONTENTS of the
    summary may differ per layout — the bounds may not."""
    from pyspark.sql import functions as F

    from hdp2_5_hive_spark.operators import sketches as sk

    true = {"a": 40, "b": 20, "c": 10, "d": 6, "e": 3, "f": 2, "g": 1}
    rows = [(t,) for t, c in true.items() for _ in range(c)]
    n = sum(true.values())  # 82
    k = 3
    bound = n / (k + 1)  # 20.5 -> only "a" is guaranteed present
    for parts in (1, 2, 7, 32):
        toks = spark.createDataFrame(rows, "tok string").repartition(
            parts, "tok"
        )
        summaries = sk.mg_summaries(toks, "tok", k=k)
        per_part = (
            summaries.withColumn(
                "pid", F.spark_partition_id()
            )
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        assert all(r.rows <= k for r in per_part), (parts, per_part)
        got = {
            r.token: r.c for r in sk.mg_merge(summaries).collect()
        }
        for tok, c in got.items():
            assert c <= true[tok], (parts, tok, c)
            assert c >= true[tok] - bound, (parts, tok, c)
        for tok, c in true.items():
            if c > bound:
                assert tok in got, (parts, tok)


def test_misra_gries_merge_is_sum_and_topk_plan(spark):
    """Merging the summaries of two disjoint halves by SUM gives
    exactly the hand-run of (MG(h1) + MG(h2)) — per-day shard
    sketches collapse by plain addition — and mg_topk plans as
    TakeOrderedAndProject (bounded heaps, no global sort)."""
    from hdp2_5_hive_spark.operators import sketches as sk

    h1 = [("x",)] * 9 + [("y",)] * 4 + [("z",)] * 2
    h2 = [("x",)] * 5 + [("w",)] * 6 + [("z",)] * 3
    a = spark.createDataFrame(h1, "tok string").coalesce(1)
    b = spark.createDataFrame(h2, "tok string").coalesce(1)
    merged_sep = sk.mg_merge(
        sk.mg_summaries(a, "tok", k=2).unionByName(
            sk.mg_summaries(b, "tok", k=2)
        )
    )
    # h1: {x:9,y:4,z:2} -> minus 3rd-largest 2 -> {x:7,y:2}
    # h2: {w:6,x:5,z:3} -> minus 3rd-largest 3 -> {w:3,x:2}
    assert sorted(
        (r.token, r.c) for r in merged_sep.collect()
    ) == [("w", 3), ("x", 9), ("y", 2)]

    plan = sk.mg_topk(merged_sep, 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    top = sk.mg_topk(merged_sep, 1).collect()
    assert top[0].token == "x"  # 14 true, undercount <= 29/3


def test_misra_gries_single_partition_is_classic_mg(spark):
    """One partition, k=2, the textbook stream: counts follow the
    hand-run of batched MG exactly (value_counts add, subtract the
    (k+1)-th largest, drop non-positives) — one Arrow batch, so the
    whole partition is a single MG merge step."""
    from hdp2_5_hive_spark.operators import sketches as sk

    rows = [(t,) for t in ["a"] * 5 + ["b"] * 4 + ["c"] * 3]
    toks = spark.createDataFrame(rows, "tok string").coalesce(1)
    got = {
        r.token: r.c
        for r in sk.mg_summaries(toks, "tok", k=2).collect()
    }
    # batch counts {a:5,b:4,c:3}; 3rd largest = 3; subtract, drop c
    assert got == {"a": 2, "b": 1}


def test_exact_proportion_split_hamilton_counts(spark):
    """Largest-remainder allocation: per-stratum bucket counts equal
    the Hamilton apportionment exactly for adversarial sizes (1, 2,
    3, 7, 9, 10, 19), buckets fill in md5 rank order, and the split
    is invariant under input partitioning."""
    from hdp2_5_hive_spark.operators.corpus import (
        exact_proportion_split,
    )

    sizes = {"s1": 1, "s2": 2, "s3": 3, "s7": 7, "s9": 9,
             "s10": 10, "s19": 19}
    rows, i = [], 0
    for st, n in sizes.items():
        for _ in range(n):
            rows.append((i, st))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    def hamilton(n, pcts=(80, 10, 10)):
        base = [n * p // 100 for p in pcts]
        rem = [n * p % 100 for p in pcts]
        r = n - sum(base)
        order = sorted(range(3), key=lambda b: (-rem[b], b))
        for b in order[:r]:
            base[b] += 1
        return tuple(base)

    for parts in (1, 8):
        out = exact_proportion_split(
            df.repartition(parts), "doc_id", "lang"
        ).collect()
        got = {}
        for row in out:
            got.setdefault(row.stratum, {"train": 0, "val": 0, "test": 0})
            got[row.stratum][row.bucket] += 1
        for st, n in sizes.items():
            want = hamilton(n)
            have = (got[st]["train"], got[st]["val"], got[st]["test"])
            assert have == want, (st, n, have, want)
            assert sum(have) == n


def test_quality_features_empty_text_ansi_safe(spark):
    """Regression: empty text made punct_ratio divide by zero — a
    hard DIVIDE_BY_ZERO error under ANSI (the driver's session
    default), only masked by testdata containing no empty docs.
    Contract now matches the DuckDB oracle: NULL ratio, zero counts."""
    from hdp2_5_hive_spark.operators.textstats import text_profile

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame(
            [(1, ""), (2, "hi there.")], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in text_profile(df, "text", "doc_id").collect()}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert rows[1].punct_ratio is None
    assert rows[1].n_chars == 0 and rows[1].n_bpe_tokens == 0
    assert rows[2].punct_ratio == 0.111111


def test_tables_hasattr_probe_is_safe(spark, sf_dir):
    """Regression: Tables.__getattr__ leaked KeyError for unknown
    names, so hasattr()/getattr(default) crashed instead of
    returning False/default."""
    from hdp2_5_hive_spark.catalog import Tables

    t = Tables(spark, sf_dir)
    assert not hasattr(t, "definitely_not_a_table")
    assert getattr(t, "definitely_not_a_table", None) is None
    assert t.nation.count() > 0  # real tables still resolve


def test_asof_join_carries_whole_right_row_with_null_fields(spark):
    """Regression: per-column last(ignorenulls) carries back-filled a
    NULL field of the matched right row from an OLDER right row — the
    output was a right tuple that never existed. The matched row is
    now carried atomically (pandas merge_asof semantics: a NULL field
    in the matched row stays NULL)."""
    from hdp2_5_hive_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 7)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 5, 10, None), (1, 6, None, 20)],
        "k int, ts int, a int, b int",
    )
    row = asof_join(left, right, ["k"], "ts", ["a", "b"]).collect()[0]
    # the ts=6 row is the AS OF match; its a is NULL and must STAY
    # NULL — not back-fill 10 from the ts=5 row
    assert row.right_ts == 6
    assert row.right_a is None
    assert row.right_b == 20
