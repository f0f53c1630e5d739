"""Distributed PageRank over an edge list — link-graph quality
weighting for crawl corpora.

Web-scale corpus curation weights documents by the authority of
their host (CommonCrawl publishes exactly this as its host-level
"harmonic/pr" ranks); a training-data engine therefore needs
PageRank as a first-class operator next to dedup and quality
scoring. Classic damped power iteration (Page et al. 1999):

    r'(v) = (1−d)/N + d · ( Σ_{u→v} r(u)/deg(u)  +  D/N )

where D is the total rank mass sitting on DANGLING nodes (no
out-edges) — redistributed uniformly, the standard stochastic fix;
without it rank mass leaks and the vector no longer sums to 1.

Scale shape (the same discipline as operators/components.py):

- each round is ONE join (ranks ⋈ edges on src — both sides hash-
  partition on the node id, AQE reuses the exchange) + ONE groupBy
  dst partial-sum; per-round shuffle is O(|E|), never N².
- the dangling mass D is a one-row aggregate carried into the next
  round as a broadcast scalar (crossJoin of a 1-row frame), not
  driver state.
- ranks are ``localCheckpoint``-ed every round: without lineage
  truncation the iterated plan grows exponentially and Catalyst
  analysis time, not data, becomes the bottleneck (on a real
  cluster prefer a durable checkpoint dir).
- convergence is fixed-iteration (``n_iter``), the production norm
  for link graphs (10-20 rounds); L1-delta stopping would add a
  per-round action without changing the plan shape.

Determinism note: contributions are float64 and the per-key sum
order is partition-dependent, so ranks are reproducible to ~1e-12
ulps, not bit-identical — tests pin against a sequential numpy
power iteration with tolerance, and partition-invariance is asserted
to 1e-9 (tests/test_components.py).

Reference parity: no graph operators exist in HDP 2.5 Hive —
beyond-reference under the pipeline mandate (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    n_iter: int = 15,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) for every node appearing in ``edges`` (either
    side). Duplicate edges are collapsed (link graphs count a link
    once); self-loops participate normally."""
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).distinct()
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # out-degree rides with the node row so the per-round join emits
    # rank/deg directly; dangling nodes carry deg NULL
    base = nodes.join(
        deg, nodes["node"] == deg["u"], "left"
    ).select("node", "deg")
    n_total = nodes.count()  # scalar, bounded driver state
    if n_total == 0:
        raise ValueError("pagerank: empty edge list (no nodes)")
    ranks = base.withColumn(
        "rank", F.lit(1.0 / n_total)
    ).localCheckpoint()

    for _ in range(n_iter):
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dmass")
        )
        contrib = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks["node"] == e["u"])
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "deg",
                (
                    F.lit((1.0 - damping) / n_total)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("_dmass") / F.lit(float(n_total))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")
