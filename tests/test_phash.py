"""Perceptual-hash (pHash) properties: locality under perturbation,
separation for unrelated images, cross-format invariance, and planted
near-dup group recovery through the banded pair search — the
independent evidence for the rows-only ``multimodal_phash_dedup``
query (no SQL oracle can re-derive DCT bit patterns)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hdp2_5_hive_spark.operators import multimodal as mm
from hdp2_5_hive_spark.operators import phash as ph


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_locality_and_separation():
    """One perturbed pixel → Hamming ≤ 6; unrelated random rasters →
    Hamming ≥ 16 (expected ~32). Pinned on a seeded corpus of 20
    base images × 3 perturbations."""
    rng = np.random.RandomState(42)
    for _ in range(20):
        base = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        h0 = ph.phash64(base)
        for _ in range(3):
            pert = base.copy()
            y, x = rng.randint(0, 16, 2)
            pert[y, x] = (pert[y, x].astype(np.int64) + 12) % 256
            assert _ham(h0, ph.phash64(pert)) <= 6
        other = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        assert _ham(h0, ph.phash64(other)) >= 16


def test_phash_format_invariant():
    """The SAME raster re-encoded PPM vs PNG hashes identically —
    the property byte-level exact dedup cannot provide."""
    rng = np.random.RandomState(7)
    raster = rng.randint(0, 256, (12, 10, 3)).astype(np.uint8).reshape(-1)
    p_ppm = mm.encode_ppm(10, 12, raster)
    p_png = mm.encode_png(10, 12, raster)
    h_ppm = ph.phash64(ph._decode_pixels(p_ppm))
    h_png = ph.phash64(ph._decode_pixels(p_png))
    assert h_ppm == h_png
    assert p_ppm != p_png  # payload bytes differ → exact dedup blind


def test_phash_scale_invariance_nearest():
    """2× nearest-upscaled raster maps to the same 32×32 resample →
    identical hash (thumbnail robustness)."""
    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    up = np.kron(base, np.ones((2, 2, 1), dtype=np.uint8))
    assert ph.phash64(base) == ph.phash64(up)


def test_phash_near_pairs_recovers_planted_groups(spark):
    """End-to-end through Spark: 60 images in 6 planted groups of 10
    (same base, one tweaked pixel each) → every returned pair is
    within-group, and within-group recall is ≥ 0.9."""
    import pandas as pd

    rows = []
    for gid in range(6):
        rng = np.random.RandomState(500 + gid)
        base = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        for m in range(10):
            px = base.copy()
            px[m % 16, (3 * m) % 16] = (
                px[m % 16, (3 * m) % 16].astype(np.int64) + 10
            ) % 256
            rows.append(
                {
                    "media_id": f"g{gid}_m{m}",
                    "payload": mm.encode_ppm(16, 16, px.reshape(-1)),
                }
            )
    media = spark.createDataFrame(pd.DataFrame(rows))
    hashes = ph.phash_table(media)
    pairs = ph.phash_near_pairs(hashes, max_distance=6).collect()
    assert pairs, "no near-dup pairs found"
    n_within = 0
    for r in pairs:
        assert r.id_a.split("_")[0] == r.id_b.split("_")[0], (
            f"cross-group pair {r.id_a} {r.id_b} at distance {r.distance}"
        )
        n_within += 1
    # 6 groups × C(10,2) = 270 possible within-group pairs
    assert n_within / 270 >= 0.9, f"recall {n_within / 270:.2f}"


def test_span_dup_stats_hand_corpus(spark):
    """span_dup_stats on a hand corpus: a 16-token span planted in
    two docs covers exactly 16 tokens in each; a doc with no repeats
    reports 0; overlapping dup grams are union-counted once."""
    span = " ".join(f"s{i}" for i in range(16))
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_b = " ".join(f"b{i}" for i in range(8))
    uniq_c = " ".join(f"c{i}" for i in range(24))
    df = spark.createDataFrame(
        [
            (1, f"{uniq_a} {span}"),
            (2, f"{span} {uniq_b}"),
            (3, uniq_c),
        ],
        "doc_id long, text string",
    )
    from hdp2_5_hive_spark.operators import corpus as cp

    out = {
        r.doc_id: r
        for r in cp.span_dup_stats(df, "doc_id", "text", k=16).collect()
    }
    assert out[1].dup_tokens == 16 and out[1].n_tokens == 24
    assert out[2].dup_tokens == 16
    assert out[3].dup_tokens == 0 and out[3].dup_ratio == 0.0


def test_span_dup_stats_within_doc_repeat(spark):
    """A span repeated WITHIN one document counts as duplicated
    (self-repetition is dup text too — Lee et al. 2022 §3)."""
    span = " ".join(f"t{i}" for i in range(16))
    mid = " ".join(f"m{i}" for i in range(4))
    df = spark.createDataFrame(
        [(1, f"{span} {mid} {span}")], "doc_id long, text string"
    )
    from hdp2_5_hive_spark.operators import corpus as cp

    row = cp.span_dup_stats(df, "doc_id", "text", k=16).collect()[0]
    assert row.n_tokens == 36
    assert row.dup_tokens == 32  # both span copies, mid not covered


def test_shuffle_seeded_is_permutation(spark, sf_dir):
    """shuffle_seeded output is a bijection: every doc exactly once,
    positions within each shard are 0..n_shard-1 dense, and the
    assignment is stable across invocations and repartitionings."""
    from hdp2_5_hive_spark.operators import corpus as cp

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = cp.shuffle_seeded(docs, "doc_id", n_shards=8)
    b = cp.shuffle_seeded(docs.repartition(13), "doc_id", n_shards=8)
    pa = {(r.doc_id): (r.shard, r.pos) for r in a.collect()}
    pb = {(r.doc_id): (r.shard, r.pos) for r in b.collect()}
    assert pa == pb
    assert len(pa) == docs.count()
    per_shard: dict[int, list[int]] = {}
    for shard, pos in pa.values():
        per_shard.setdefault(shard, []).append(pos)
    for shard, poss in per_shard.items():
        assert sorted(poss) == list(range(len(poss)))


def test_mix_temperature_weights_sum_to_one(spark, sf_dir):
    """Mixing weights sum to ~1 and α=0.5 up-weights small domains
    relative to their raw share."""
    from hdp2_5_hive_spark.operators import corpus as cp

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = cp.mix_temperature(docs, "source", alpha=0.5, budget=1000).collect()
    total_w = sum(r.weight for r in rows)
    assert abs(total_w - 1.0) < 1e-4
    n_total = sum(r.n_docs for r in rows)
    for r in rows:
        raw_share = r.n_docs / n_total
        if raw_share < 1.0 / len(rows):
            assert r.weight >= raw_share - 1e-9


def test_span_mask_removes_only_covered(spark):
    """span_mask drops exactly the covered tokens (both copies of the
    planted span) and preserves surviving token order."""
    from hdp2_5_hive_spark.operators import corpus as cp

    span = " ".join(f"s{i}" for i in range(16))
    head = " ".join(f"h{i}" for i in range(3))
    tail = " ".join(f"z{i}" for i in range(3))
    df = spark.createDataFrame(
        [
            (1, f"{head} {span} {tail}"),
            (2, f"{span}"),
            (3, "totally unrelated words here only once repeated never"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cp.span_mask(df, "doc_id", "text", k=16).collect()}
    assert out[1].text_clean == f"{head} {tail}"
    assert out[1].n_removed == 16 and out[1].n_kept == 6
    assert out[2].text_clean == "" and out[2].n_kept == 0
    assert out[3].n_removed == 0
    assert out[3].text_clean == "totally unrelated words here only once repeated never"


def test_video_near_dups_recovers_planted_mod256_pairs(spark):
    """synthesize_structured_avi keys its noise raster on doc_id%256:
    ids i and i+256 render identical frames (different container
    bytes). video_near_dups must find exactly those pairs."""
    from hdp2_5_hive_spark.operators.multimodal import (
        synthesize_structured_avi,
    )
    from hdp2_5_hive_spark.operators.phash import video_near_dups

    ids = [1, 2, 3, 257, 259]  # pairs: (1,257), (3,259)
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    media = synthesize_structured_avi(df, "doc_id")
    pairs = {
        (r.id_a, r.id_b, r.n_matched)
        for r in video_near_dups(media, n_frames=4).collect()
    }
    assert pairs == {(1, 257, 4), (3, 259, 4)}


def test_video_near_dups_tolerates_frame_perturbation(spark):
    """A re-encoded copy whose every frame differs by one slightly
    brightened block still matches (pHash locality), while an
    unrelated video does not."""
    import numpy as np

    from hdp2_5_hive_spark.operators.multimodal import (
        encode_avi_mjpeg,
    )
    from hdp2_5_hive_spark.operators.jpeg_py import encode_jpeg
    from hdp2_5_hive_spark.operators.phash import video_near_dups

    def avi(seed, bump):
        # noise-like raster (pHash is brightness/contrast invariant,
        # so smooth gradients from different seeds would be TRUE
        # perceptual near-dups — structure must differ per seed)
        frames = []
        for f in range(4):
            idx = np.arange(256, dtype=np.int64)
            gray = (
                (seed * 2654435761 + idx * 40503 + f * 9176553) % 251
            ).astype(np.uint8).reshape(16, 16)
            if bump:
                gray = gray.copy()
                gray[:8, :8] = np.minimum(
                    gray[:8, :8].astype(np.int64) + 8, 255
                ).astype(np.uint8)
            rgb = np.stack([gray] * 3, axis=-1)
            frames.append(encode_jpeg(16, 16, rgb.reshape(-1)))
        return encode_avi_mjpeg(16, 16, frames)

    rows = [
        (1, avi(5, False)),
        (2, avi(5, True)),   # perturbed copy of 1
        (3, avi(99, False)), # unrelated
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary"
    )
    got = {
        (r.id_a, r.id_b)
        for r in video_near_dups(media, n_frames=4).collect()
    }
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_crossmodal_dedup_exact_classification(spark):
    """multimodal_crossmodal_dedup at sf0.001: the pair set and its
    modality labels must EXACTLY match the planted structure — image
    pairs = same doc_id//12 raster group (full pHash recovery),
    text pairs = same doc_id//8 normalized-text group, 'both' =
    the intersection. This pins the full-outer classification, not
    just counts."""
    import itertools

    from hdp2_5_hive_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    img, txt = set(), set()
    for a, b in itertools.combinations(ids, 2):
        if a // 12 == b // 12:
            img.add((a, b))
        if a // 8 == b // 8:
            txt.add((a, b))
    expect = {}
    for p in img | txt:
        expect[p] = (
            "both" if p in img and p in txt
            else "image_only" if p in img
            else "text_only"
        )
    got = {
        (r.id_a, r.id_b): r.modality
        for r in all_queries()["multimodal_crossmodal_dedup"]
        .fn(spark, sf)
        .collect()
    }
    # SOUND: every reported pair/label is consistent with the planted
    # groups (an image label never appears off-raster-group, etc.)
    for (a, b), m in got.items():
        assert (a, b) in expect, (a, b)
        if m == "both":
            assert expect[(a, b)] == "both"
        elif m == "image_only":
            assert (a, b) in img and (a, b) not in txt
        else:
            assert (a, b) in txt
    # text tier is EXACT dedup -> deterministic, complete
    assert {p for p, m in got.items() if m in ("both", "text_only")} | {
        p for p in txt if got.get(p) == "both"
    } >= txt
    # perceptual tier: a one-pixel tweak occasionally crosses the
    # Hamming-6 radius; require >=95% planted recall, exact labels
    got_img = {p for p, m in got.items() if m in ("both", "image_only")}
    assert len(got_img & img) >= 0.95 * len(img), len(got_img & img) / len(img)
    assert len({v for v in got.values()}) == 3  # all three classes occur


def test_phash_empty_raster_raises_loudly():
    """A zero-dimension raster (crafted 0x0 header now returned by
    the hardened decoders) must raise ValueError, not IndexError."""
    import numpy as np
    import pytest

    from hdp2_5_hive_spark.operators.phash import phash64

    with pytest.raises(ValueError, match="empty raster"):
        phash64(np.zeros((0, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="empty raster"):
        phash64(np.zeros((4, 0, 3), dtype=np.uint8))
