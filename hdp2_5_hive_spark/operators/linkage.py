"""Probabilistic record linkage — Fellegi-Sunter match scoring.

The classic entity-resolution decision model (Fellegi & Sunter 1969,
"A Theory for Record Linkage"; the scoring core of Splink/dedupe):
candidate record pairs get a log-likelihood-ratio match weight

    W = Σ_i  log2(m_i / u_i)            if field i agrees
            log2((1-m_i) / (1-u_i))     if field i disagrees

where m_i = P(agree | match) and u_i = P(agree | non-match) are the
per-field reliability parameters. Pairs above an upper threshold are
links, below a lower threshold non-links, between them clerical
review.

Scale shape: candidates come from BLOCKING (equi-join on a blocking
key — never all-pairs; the same discipline as every dedup operator
here); agreement predicates are built-in expressions (levenshtein,
abs-diff, equality) evaluated only on blocked pairs; the weight is a
sum of per-field DECIMAL-rounded log terms (log2 of rational m/u
ratios is irrational except for dyadic ratios — never on a rounding
tie; the Zipf idiom), so both engines accumulate identical
quantities exactly. m/u are MODEL PARAMETERS (literals) — estimating
them via EM is the training problem, out of scope here as it is for
most production deployments that hand-tune or import them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_weight(
    agree: Column, m: float, u: float
) -> Column:
    """One field's Fellegi-Sunter weight contribution as an exact
    DECIMAL(38,6) term: log2(m/u) on agreement, log2((1-m)/(1-u))
    on disagreement."""
    import math

    w_a = round(math.log2(m / u), 6)
    w_d = round(math.log2((1 - m) / (1 - u)), 6)
    return F.when(agree, F.lit(w_a)).otherwise(F.lit(w_d)).cast(
        "decimal(38,6)"
    )


def score_pairs(
    pairs: DataFrame,
    field_weights: list[tuple[Column, float, float]],
    *,
    upper: float,
    lower: float,
) -> DataFrame:
    """Attach the total match weight and the three-way
    link / possible / non_link decision to a candidate-pair frame.
    ``field_weights`` = [(agreement predicate, m, u), ...]."""
    total = fs_weight(*field_weights[0])
    for fw in field_weights[1:]:
        total = total + fs_weight(*fw)
    out = pairs.withColumn("match_weight", total)
    return out.withColumn(
        "decision",
        F.when(F.col("match_weight").cast("double") >= upper, "link")
        .when(F.col("match_weight").cast("double") <= lower, "non_link")
        .otherwise("possible"),
    )


def em_fit(
    pairs: DataFrame,
    agree_cols: list[str],
    *,
    n_iter: int = 30,
    init_lambda: float = 0.01,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> dict:
    """Estimate the Fellegi-Sunter parameters by EM over the
    AGREEMENT-PATTERN CONTINGENCY TABLE (the Splink/FastLink training
    loop, Winkler 1988): with k boolean comparators there are only
    2^k distinct patterns, so ONE distributed groupBy collapses any
    number of candidate pairs to ≤ 2^k counted rows, and the EM
    iterations run driver-side on that tiny table — exact,
    deterministic, and O(2^k · n_iter) regardless of corpus size.
    The same bounded-driver-state discipline as the k-means/PCA/LR
    trainers.

    Model: two-class mixture — P(pattern) = λ·Π m_i^a_i (1-m_i)^(1-a_i)
    + (1-λ)·Π u_i^a_i (1-u_i)^(1-a_i), independence across fields
    (the standard FS assumption). E-step computes P(match | pattern)
    per row of the table; M-step re-estimates λ, m_i, u_i from
    count-weighted responsibilities.

    Returns {"lambda": λ, "m": {col: m}, "u": {col: u},
    "n_pairs": N, "n_iter": n_iter} — floats are plain Python
    doubles; determinism comes from fixed init + fixed iteration
    count (no convergence-threshold coin flips)."""
    rows = (
        pairs.groupBy(*[F.col(c).cast("boolean").alias(c) for c in agree_cols])
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    # Sort the collected table: float summation below must not
    # depend on shuffle arrival order, or the fit would drift
    # between runs/partitionings in the last ulp.
    patterns = sorted(
        (tuple(bool(r[c]) for c in agree_cols), int(r["_n"])) for r in rows
    )
    n_total = sum(n for _, n in patterns)
    k = len(agree_cols)
    lam = init_lambda
    m = [init_m] * k
    u = [init_u] * k
    for _ in range(n_iter):
        # E-step
        resp = []
        for pat, n in patterns:
            pm = lam
            pu = 1 - lam
            for i in range(k):
                pm *= m[i] if pat[i] else (1 - m[i])
                pu *= u[i] if pat[i] else (1 - u[i])
            g = pm / (pm + pu) if (pm + pu) > 0 else 0.0
            resp.append(g)
        # M-step
        w_match = sum(g * n for g, (_, n) in zip(resp, patterns))
        w_non = n_total - w_match
        if w_match <= 0 or w_non <= 0:
            break
        lam = w_match / n_total
        for i in range(k):
            m[i] = (
                sum(
                    g * n
                    for g, (pat, n) in zip(resp, patterns)
                    if pat[i]
                )
                / w_match
            )
            u[i] = (
                sum(
                    (1 - g) * n
                    for g, (pat, n) in zip(resp, patterns)
                    if pat[i]
                )
                / w_non
            )
    return {
        "lambda": lam,
        "m": dict(zip(agree_cols, m)),
        "u": dict(zip(agree_cols, u)),
        "n_pairs": n_total,
        "n_iter": n_iter,
    }
