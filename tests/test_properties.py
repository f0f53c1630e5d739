"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5: Hive 1.2 has no randomized testing).

Each property pins an invariant the engine's determinism story rests
on: order-independent sums, partition-invariant results, portable
hashes, Jaccard ∈ [0,1] symmetry.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hdp2_5_hive_spark.functions.hive_compat import dsum
from hdp2_5_hive_spark.operators.textstats import (
    ROLLING_BASE,
    ROLLING_MOD,
    rolling_hash,
)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

prices = st.lists(
    st.floats(
        min_value=0.01, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=60,
)


@given(xs=prices, parts=st.integers(min_value=1, max_value=8))
@SET
def test_dsum_partition_invariant(spark, xs, parts):
    """dsum is identical no matter how rows are partitioned —
    the decimal accumulator makes addition associative."""
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    a = df.repartition(parts).agg(dsum("v").alias("s")).first().s
    b = df.coalesce(1).agg(dsum("v").alias("s")).first().s
    assert a == b  # bit-identical, not approximately


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=32, max_codepoint=126
            ),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=10,
    )
)
@SET
def test_rolling_hash_matches_reference(spark, texts):
    """Spark rolling hash == independent pure-Python implementation."""

    def py_hash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * ROLLING_BASE + ord(ch)) % ROLLING_MOD
        return h

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r.h
        for r in df.select(rolling_hash(F.col("t")).alias("h"))
        .collect()
    ]
    want = [py_hash(t) for t in texts]
    assert sorted(got) == sorted(want)


@given(
    a=st.sets(st.text(st.characters(min_codepoint=97, max_codepoint=122),
                      min_size=1, max_size=5), max_size=15),
    b=st.sets(st.text(st.characters(min_codepoint=97, max_codepoint=122),
                      min_size=1, max_size=5), max_size=15),
)
@SET
def test_jaccard_symmetric_and_bounded(spark, a, b):
    from hdp2_5_hive_spark.operators.dedup import jaccard_col

    df = spark.createDataFrame(
        [(sorted(a), sorted(b))], "a array<string>, b array<string>"
    )
    r = df.select(
        jaccard_col(F.col("a"), F.col("b")).alias("ab"),
        jaccard_col(F.col("b"), F.col("a")).alias("ba"),
    ).first()
    if not a and not b:
        assert r.ab is None  # 0/0 — Hive NULL semantics
    else:
        assert r.ab == r.ba
        assert 0.0 <= r.ab <= 1.0
        inter = len(a & b)
        assert abs(r.ab - inter / (len(a) + len(b) - inter)) < 1e-12


@given(xs=prices)
@SET
def test_salted_agg_equals_direct_property(spark, xs):
    from hdp2_5_hive_spark.operators.skew import salted_sum_count

    df = spark.createDataFrame([("k", x) for x in xs], "k string, v double")
    direct = df.agg(dsum("v").alias("s")).first().s
    salted = salted_sum_count(df, ["k"], F.col("v"), n_salts=4).first()
    assert salted.sum_value == direct
    assert salted.n == len(xs)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
@SET
def test_java_hashcode_fold_matches_jdk_definition(spark, texts):
    """The fn_java_hashcode expression fold == Java String.hashCode
    (h = h*31 + c over UTF-16 units; printable-ASCII inputs so char
    units == code points) for arbitrary printable strings."""
    from functools import reduce

    def jdk(s: str) -> int:
        h = reduce(lambda a, c: (a * 31 + ord(c)) & 0xFFFFFFFF, s, 0)
        return h - 4294967296 if h >= 2147483648 else h

    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "i int, s string")
    codes = F.transform(F.split(F.col("s"), ""), lambda c: F.ascii(c).cast("bigint"))
    hm = F.aggregate(
        codes, F.lit(0).cast("bigint"), lambda h, c: (h * F.lit(31) + c) % F.lit(4294967296)
    )
    signed = F.when(hm >= F.lit(2147483648), hm - F.lit(4294967296)).otherwise(hm)
    got = {r.i: r.h for r in df.select("i", signed.alias("h")).collect()}
    for i, s in enumerate(texts):
        assert got[i] == jdk(s), (s, got[i], jdk(s))


@given(
    vals=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=80),
    block=st.integers(min_value=1, max_value=16),
)
@SET
def test_prefix_sum_any_block_size(spark, vals, block):
    """distributed_prefix_sum is exact for every block size ≥ 1 —
    the two-phase scan must not depend on block/data alignment."""
    from hdp2_5_hive_spark.operators.corpus import distributed_prefix_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r.id: r.cum_before
        for r in distributed_prefix_sum(df, "id", "v", block_size=block).collect()
    }
    run = 0
    for i, v in enumerate(vals):
        assert got[i] == run
        run += v


@given(
    n_left=st.integers(min_value=1, max_value=25),
    n_right=st.integers(min_value=0, max_value=25),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@SET
def test_asof_join_matches_pandas_merge_asof(spark, n_left, n_right, seed):
    """asof_join (union + window carry) == pandas merge_asof
    (by-key, backward direction) on random keyed timestamp data."""
    import numpy as np
    import pandas as pd

    from hdp2_5_hive_spark.operators.timeseries import asof_join

    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")

    def mk(n, prefix):
        return pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], size=n),
                "ts": base + pd.to_timedelta(
                    rng.choice(10_000, size=n, replace=False), unit="s"
                ),
                "val": [f"{prefix}{i}" for i in range(n)],
            }
        )

    lp, rp = mk(n_left, "L"), mk(n_right, "R")
    left = spark.createDataFrame(lp)
    if n_right:
        right = spark.createDataFrame(rp)
    else:
        right = spark.createDataFrame([], "k string, ts timestamp, val string")
    got = {
        r.val: r.right_val
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_value_cols=["val"]
        ).collect()
    }
    expect_df = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts").rename(columns={"val": "right_val"}),
        on="ts",
        by="k",
        direction="backward",
    )
    expect = {
        r.val: (None if pd.isna(r.right_val) else r.right_val)
        for r in expect_df.itertuples()
    }
    assert got == expect


# -- round-5 part-2 operators ------------------------------------------------

words_st = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=40
)
corpus_st = st.lists(words_st, min_size=2, max_size=6)


@given(docs=corpus_st)
@SET
def test_span_dup_stats_matches_bruteforce(spark, docs):
    """span coverage == a brute-force set-of-covered-positions
    reference on random small corpora (k=4 so repeats actually
    happen)."""
    from hdp2_5_hive_spark.operators import corpus as cp

    k = 4
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens)
        for r in cp.span_dup_stats(df, "doc_id", "text", k=k).collect()
    }
    # reference: count every k-gram occurrence corpus-wide, union
    # covered positions per doc
    from collections import Counter

    cnt = Counter()
    for ws in docs:
        for i in range(len(ws) - k + 1):
            cnt[tuple(ws[i : i + k])] += 1
    for doc_id, ws in enumerate(docs):
        covered = set()
        for i in range(len(ws) - k + 1):
            if cnt[tuple(ws[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        assert got[doc_id] == (len(ws), len(covered)), (doc_id, ws)


@given(docs=corpus_st, n_merges=st.integers(min_value=1, max_value=5))
@SET
def test_bpe_matches_reference_random(spark, docs, n_merges):
    """Distributed BPE == sequential reference on random corpora."""
    from hdp2_5_hive_spark.operators import bpe
    from tests.test_bpe import _reference_bpe

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    assert bpe.train_bpe(df, "text", n_merges=n_merges) == _reference_bpe(
        texts, n_merges
    )


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=50,
        unique=True,
    ),
    n_shards=st.integers(min_value=1, max_value=6),
)
@SET
def test_shuffle_seeded_bijection_random(spark, ids, n_shards):
    """Every id appears exactly once; per-shard positions are dense
    0..n-1 — for arbitrary id sets and shard counts."""
    from hdp2_5_hive_spark.operators import corpus as cp

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = cp.shuffle_seeded(df, "doc_id", n_shards=n_shards).collect()
    assert sorted(r.doc_id for r in rows) == sorted(ids)
    per_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < n_shards
        per_shard.setdefault(r.shard, []).append(r.pos)
    for poss in per_shard.values():
        assert sorted(poss) == list(range(len(poss)))


@given(docs=corpus_st)
@SET
def test_span_mask_matches_bruteforce(spark, docs):
    """span_mask cleaned text == brute-force covered-position removal
    on random corpora (k=4)."""
    from collections import Counter

    from hdp2_5_hive_spark.operators import corpus as cp

    k = 4
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text_clean, r.n_kept, r.n_removed)
        for r in cp.span_mask(df, "doc_id", "text", k=k).collect()
    }
    cnt = Counter()
    for ws in docs:
        for i in range(len(ws) - k + 1):
            cnt[tuple(ws[i : i + k])] += 1
    for doc_id, ws in enumerate(docs):
        covered = set()
        for i in range(len(ws) - k + 1):
            if cnt[tuple(ws[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        assert got[doc_id] == (
            " ".join(kept),
            len(kept),
            len(ws) - len(kept),
        ), (doc_id, ws)


@given(
    lens=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=30
    ),
    ctx=st.integers(min_value=8, max_value=32),
)
@SET
def test_pack_ffd_capacity_and_totals(spark, lens, ctx):
    """FFD never overfills a bin, packs every doc exactly once, and
    flags exactly the oversize docs — for random length profiles."""
    from hdp2_5_hive_spark.operators import corpus as cp

    rows = [(i, " ".join("x" for _ in range(n))) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cp.pack_ffd(df, "doc_id", "text", ctx_len=ctx, n_shards=3).collect()
    assert sorted(int(r.doc_id) for r in out) == list(range(len(lens)))
    fill: dict[tuple[int, int], int] = {}
    for r in out:
        assert r.oversize == (r.n_tokens > ctx)
        if not r.oversize:
            key = (r.shard, r.bin_id)
            fill[key] = fill.get(key, 0) + r.n_tokens
            assert fill[key] <= ctx


@given(
    toks=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=3),
        min_size=1,
        max_size=40,
    ),
    depth=st.integers(min_value=1, max_value=4),
    width=st.integers(min_value=2, max_value=16),
)
@SET
def test_cms_never_underestimates_any_corpus(spark, toks, depth, width):
    """Count-Min's one-sided error guarantee holds on ANY corpus and
    any (depth, width): estimate >= exact count for every token —
    including degenerate all-identical and collision-heavy tiny-width
    cases."""
    from collections import Counter

    from hdp2_5_hive_spark.operators import sketches as sk

    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    sketch = sk.cms_build(df, "tok", depth=depth, width=width)
    est = {
        r.tok: r.cms_est
        for r in sk.cms_estimate(
            df.distinct(), sketch, "tok", depth=depth, width=width
        ).collect()
    }
    exact = Counter(toks)
    assert set(est) == set(exact)
    for tok, c in exact.items():
        assert est[tok] >= c
