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
