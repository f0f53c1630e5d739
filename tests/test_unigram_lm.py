"""Unigram-LM tokenizer trainer: exact pin against a from-scratch
sequential reference (independent code path — Counter-based corpus
stats, its own recursive Viterbi), plus segmentation and plan-shape
properties."""

from __future__ import annotations

from collections import Counter

from hdp2_5_hive_spark.operators import unigram_lm as ul

CORPUS = [
    "unhappiness unhappy happiness happy ness un happing",
    "unhappiness unhappy happiness happy ness un happing",
    "unhappiness unhappy happiness happy ness un happing",
    "unhappiness unhappy happiness happy ness un happing",
    "the thematic theme them the them",
    "rethink rethinking thinking think thinker the",
]


# ---------- sequential reference (shares no code with the operator)


def _ref_word_freq(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                c[w] += 1
    return dict(c)


def _ref_seed(wf, max_len, seed_size):
    sub = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                sub[w[i : i + ln]] += f
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) >= 2),
        key=lambda pc: (-pc[1] * len(pc[0]), pc[0]),
    )[:seed_size]
    out = dict(chars)
    out.update(multi)
    return out


def _ref_logp(counts):
    import math

    sm = {
        p: c + 1 if len(p) == 1 else c
        for p, c in counts.items()
        if c > 0 or len(p) == 1
    }
    tot = sum(sm.values())
    return {p: math.log(c) - math.log(tot) for p, c in sm.items()}


def _ref_viterbi(word, logp, max_len):
    """Same declared tie rule (longer last piece, then smaller
    piece), independently implemented: forward DP storing the full
    winning candidate per cell."""
    NEG = float("-inf")
    n = len(word)
    score = [NEG] * (n + 1)
    choice = [None] * (n + 1)
    score[0] = 0.0
    for i in range(1, n + 1):
        cands = []
        for ln in range(1, min(max_len, i) + 1):
            piece = word[i - ln : i]
            if piece in logp and score[i - ln] != NEG:
                cands.append((score[i - ln] + logp[piece], ln, piece))
        if not cands:
            continue
        best_s = max(c[0] for c in cands)
        tied = [c for c in cands if c[0] == best_s]
        tied.sort(key=lambda c: (-c[1], c[2]))
        score[i], choice[i] = best_s, tied[0]
    pieces = []
    i = n
    while i > 0:
        _, ln, piece = choice[i]
        pieces.append(piece)
        i -= ln
    return pieces[::-1]


def _ref_train(texts, vocab_size, seed_size, n_rounds, max_len, shrink=0.75):
    wf = _ref_word_freq(texts)
    logp = _ref_logp(_ref_seed(wf, max_len, seed_size))
    counts = {}
    for _ in range(n_rounds):
        counts = Counter()
        for w, f in wf.items():
            for piece in _ref_viterbi(w, logp, max_len):
                counts[piece] += f
        counts = dict(counts)
        for p in logp:
            if len(p) == 1 and p not in counts:
                counts[p] = 0
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        n_chars = sum(1 for p in counts if len(p) == 1)
        keep = max(vocab_size - n_chars, int(len(multi) * shrink))
        kept = dict(multi[:keep])
        kept.update((p, c) for p, c in counts.items() if len(p) == 1)
        logp = _ref_logp(kept)
    counts = Counter()
    for w, f in wf.items():
        for piece in _ref_viterbi(w, logp, max_len):
            counts[piece] += f
    counts = dict(counts)
    for p in logp:
        if len(p) == 1 and p not in counts:
            counts[p] = 0
    logp = _ref_logp(counts)
    final = sorted(counts.items(), key=lambda pc: (-pc[1], pc[0]))
    chars = [(p, c) for p, c in final if len(p) == 1]
    multi = [(p, c) for p, c in final if len(p) > 1]
    room = max(vocab_size - len(chars), 0)
    vocab = sorted(chars + multi[:room], key=lambda pc: (-pc[1], pc[0]))
    return [(p, c, logp[p]) for p, c in vocab]


# ---------- tests


def test_unigram_lm_matches_sequential_reference_exactly(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    ).repartition(5)
    got = ul.train_unigram_lm(
        docs, vocab_size=40, seed_size=96, n_rounds=3, max_piece_len=6
    )
    want = _ref_train(CORPUS, 40, 96, 3, 6)
    assert [(p, c) for p, c, _ in got] == [(p, c) for p, c, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-12


def test_unigram_apply_segments_and_covers(spark):
    """Viterbi decode: segmentation concatenates back to the word
    stream (lossless), and discovered morphemes actually appear as
    pieces (non-vacuous subword learning)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    vocab = ul.train_unigram_lm(
        docs, vocab_size=40, seed_size=96, n_rounds=3, max_piece_len=6
    )
    pieces = {p for p, _, _ in vocab}
    assert {"happy", "un", "ness", "think", "the"} <= pieces
    out = {r.doc_id: r for r in ul.apply_unigram_lm(docs, vocab).collect()}
    for i, text in enumerate(CORPUS):
        rebuilt = out[i].tokens.replace(" ", "")
        assert rebuilt == text.lower().replace(" ", "")
        assert out[i].n_pieces == len(out[i].tokens.split())


def test_unigram_estep_partition_invariant(spark):
    """Hard-EM counts are integers: identical under 1 vs 13
    partitions (the property that makes the trainer exact on any
    cluster layout)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    a = ul.train_unigram_lm(
        docs.coalesce(1), vocab_size=40, seed_size=96, n_rounds=2
    )
    b = ul.train_unigram_lm(
        docs.repartition(13), vocab_size=40, seed_size=96, n_rounds=2
    )
    assert a == b


def test_unigram_oracle_preconditions():
    """The synthesized vocab_unigram_lm/apply oracles brute-force
    ALL segmentations and take the score argmax, which equals the
    trainer's tie-ruled Viterbi iff the best full-path score is
    strictly unique per word — pin that (and the ≤12-piece unroll
    bound) on the oracle SFs, for every logp table the replay uses
    (seed, three pruned rounds, final, and the vocab-restricted
    apply table)."""
    import duckdb

    def all_segs(word, logp, max_len=6):
        outs = []

        def rec(i, toks, score):
            if i == len(word):
                outs.append((score, tuple(toks)))
                return
            for ln in range(1, min(max_len, len(word) - i) + 1):
                piece = word[i : i + ln]
                lp = logp.get(piece)
                if lp is not None:
                    toks.append(piece)
                    rec(i + ln, toks, score + lp)
                    toks.pop()

        rec(0, [], 0.0)
        return outs

    configs = [(48, 256), (64, 512)]  # vocab queries / tokenizer_compare
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
      for vocab_size, seed_size in configs:
        texts = [
            r[0]
            for r in duckdb.sql(
                f"SELECT text FROM read_parquet('{sf}/documents.parquet')"
            ).fetchall()
        ]
        wf = _ref_word_freq(texts)
        assert max(len(w) for w in wf) <= 12, sf
        logps = [_ref_logp(_ref_seed(wf, 6, seed_size))]
        counts = {}
        for _ in range(3):
            counts = Counter()
            for w, f in wf.items():
                for piece in _ref_viterbi(w, logps[-1], 6):
                    counts[piece] += f
            counts = dict(counts)
            for p in logps[-1]:
                if len(p) == 1 and p not in counts:
                    counts[p] = 0
            multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )
            n_chars = sum(1 for p in counts if len(p) == 1)
            keep = max(vocab_size - n_chars, int(len(multi) * 0.75))
            kept = dict(multi[:keep])
            kept.update((p, c) for p, c in counts.items() if len(p) == 1)
            logps.append(_ref_logp(kept))
        # final (unpruned) table + the vocab-restricted apply table
        counts = Counter()
        for w, f in wf.items():
            for piece in _ref_viterbi(w, logps[-1], 6):
                counts[piece] += f
        counts = dict(counts)
        for p in logps[-1]:
            if len(p) == 1 and p not in counts:
                counts[p] = 0
        logp_f = _ref_logp(counts)
        final = sorted(counts.items(), key=lambda pc: (-pc[1], pc[0]))
        chars = [(p, c) for p, c in final if len(p) == 1]
        multi = [(p, c) for p, c in final if len(p) > 1]
        room = max(vocab_size - len(chars), 0)
        vocab = {p for p, _ in chars + multi[:room]}
        logps.append(logp_f)
        logps.append({p: lp for p, lp in logp_f.items() if p in vocab})
        for li, logp in enumerate(logps):
            for w in wf:
                segs = all_segs(w, logp)
                assert segs, (sf, li, w)
                segs.sort(key=lambda s: -s[0])
                best_score, best_toks = segs[0]
                for s, toks in segs[1:]:
                    if toks != best_toks:
                        assert s < best_score, (sf, li, w, toks, best_toks)
