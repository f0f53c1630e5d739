"""Distributed BPE trainer vs a from-scratch sequential reference:
the merge tables must match exactly (same pairs, same order, same
counts) — determinism via lexicographic tie-breaks."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive_spark.operators import bpe


def _reference_bpe(texts: list[str], n_merges: int, min_pair: int = 2):
    """Sequential Sennrich-style BPE on a word-frequency dict."""
    wf = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                wf[w] += 1
    words = {w: [c for c in w] for w in wf}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            f = wf[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        # max count, ties lexicographic on (left, right)
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        if cnt < min_pair:
            break
        merges.append((rank, left, right, cnt))
        for w, syms in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            words[w] = merged
    return merges


def test_bpe_matches_reference_on_corpus(spark, sf_dir):
    """12 merges on the real documents table: distributed == reference."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = bpe.train_bpe(docs, "text", n_merges=12)
    texts = [r.text for r in docs.select("text").collect()]
    want = _reference_bpe(texts, n_merges=12)
    assert got == want


def test_bpe_greedy_overlap_semantics(spark):
    """'aaa' under merge (a,a) becomes ['aa','a'] — left-to-right
    greedy, no overlapping merge."""
    df = spark.createDataFrame(
        [(1, "aaa aaa aaa")], "doc_id long, text string"
    )
    got = bpe.train_bpe(df, "text", n_merges=2)
    want = _reference_bpe(["aaa aaa aaa"], n_merges=2)
    assert got == want
    assert got[0][1] == "a" and got[0][2] == "a"
    # after merging (a,a)->aa, remaining adjacency is (aa, a)
    assert (got[1][1], got[1][2]) == ("aa", "a")


def test_bpe_early_stop_below_min_count(spark):
    """All-unique pairs (count 1) stop training immediately."""
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    assert bpe.train_bpe(df, "text", n_merges=5, min_pair_count=2) == []


def test_bpe_round_time_flat_over_50_merges(spark, sf_dir):
    """Lineage truncation contract (verdict r5 #4): localCheckpoint
    per merge round keeps Catalyst analysis cost CONSTANT per round.
    Without it, round k re-analyzes a k-deep mapInPandas chain and
    per-round time grows superlinearly — 50 rounds would cost far
    more than 5x the first 10. Generous 4x slack absorbs machine
    noise; a quadratic regression blows well past it."""
    import time

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    first = bpe.train_bpe(docs, "text", n_merges=10, min_pair_count=1)
    t10 = time.time() - t0
    t0 = time.time()
    full = bpe.train_bpe(docs, "text", n_merges=50, min_pair_count=1)
    t50 = time.time() - t0
    assert len(full) == 50 and full[:10] == first
    assert t50 < 5 * t10 * 4, f"per-round time not flat: t10={t10:.1f}s t50={t50:.1f}s"


def _reference_apply(texts, merges):
    out = []
    ranked = [(lt, rt) for _, lt, rt, _ in sorted(merges)]
    for t in texts:
        doc = []
        for w in t.lower().split(" "):
            if not w:
                continue
            syms = list(w)
            for lt, rt in ranked:
                i, nxt = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == lt and syms[i + 1] == rt:
                        nxt.append(lt + rt)
                        i += 2
                    else:
                        nxt.append(syms[i])
                        i += 1
                syms = nxt
            doc.extend(syms)
        out.append(doc)
    return out


def test_bpe_apply_matches_reference_and_shrinks(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    merges = bpe.train_bpe(docs, "text", n_merges=12)
    got = {
        r.doc_id: (r.tokens, r.n_tokens)
        for r in bpe.apply_bpe(docs, merges).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    want = _reference_apply([r.text for r in rows], merges)
    for r, w in zip(rows, want):
        assert got[r.doc_id][0] == " ".join(w)
        assert got[r.doc_id][1] == len(w)
    # more merges => token counts never grow
    fewer = bpe.apply_bpe(docs, merges[:4])
    n12 = sum(v[1] for v in got.values())
    n4 = sum(r.n_tokens for r in fewer.collect())
    assert n12 <= n4


# ---------- property test of the SYNTHESIZED ORACLE generator
# (queries/pipeline4._bpe_rounds_sql) against the sequential
# reference on RANDOM corpora — pure DuckDB vs pure Python, no
# Spark. BPE is integer-exact end to end (counts, lexicographic
# tie-breaks), so random corpora cannot introduce engine-dependent
# ambiguity the way float-scored trainers can.


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcé日", min_size=1, max_size=9),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_oracle_sql_matches_reference_on_random_corpora(texts):
    import duckdb

    from hdp2_5_hive_spark.queries.pipeline4 import (
        _bpe_apply_oracle,
        _bpe_merges_oracle,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(texts)))
        + ") v(doc_id, text)",
        texts,
    )
    want = _reference_bpe(texts, n_merges=6)
    got = sorted(con.execute(_bpe_merges_oracle(6)).fetchall())
    assert got == [
        (r, lt, rt, lt + rt, c) for r, lt, rt, c in want
    ], (texts, got, want)

    want_docs = _reference_apply(texts, _reference_bpe(texts, n_merges=6))
    got_docs = {
        r[0]: (r[1], r[2])
        for r in con.execute(_bpe_apply_oracle(6)).fetchall()
    }
    for i, doc in enumerate(want_docs):
        assert got_docs[i] == (" ".join(doc), len(doc)), (texts, i)
