"""Plan auditing: programmatic EXPLAIN checks.

Hive's ``EXPLAIN`` (``ql/.../exec/ExplainTask.java``) prints the
operator DAG for humans; at 100 TB what matters is asserting the
*shape* machine-side: filters reached the scan, small dims broadcast,
expressions stayed inside whole-stage codegen, exchanges only where
the semantics demand one. These helpers parse the formatted physical
plan so tests (and CI) can gate on plan regressions, not just row
results.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanFacts:
    pushed_filters: list[str]
    read_schemas: list[str]
    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_codegen_spans: int
    text: str

    def scans_read_only(self, *cols: str) -> bool:
        """True if every parquet scan's ReadSchema is a subset of
        ``cols`` — column pruning proof."""
        want = set(cols)
        for rs in self.read_schemas:
            got = set(re.findall(r"(\w+):", rs))
            if not got <= want:
                return False
        return True


def analyze(df: DataFrame) -> PlanFacts:
    text = formatted_plan(df)
    return PlanFacts(
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
        # formatted-mode text: the tree line + the detail block each
        # mention Exchange once per exchange (tests pin that 2x
        # convention); the old extra terms were dead ('Exchange
        # hashpartitioning' never appears in formatted output, and
        # '(Exchange' is already matched via the word boundary)
        n_exchanges=len(re.findall(r"\bExchange\b", text)),
        n_broadcast_joins=text.count("BroadcastHashJoin"),
        n_sortmerge_joins=text.count("SortMergeJoin"),
        n_codegen_spans=len(re.findall(r"WholeStageCodegen", text)),
        text=text,
    )


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    facts = analyze(df)
    joined = ";".join(facts.pushed_filters)
    assert fragment in joined, (
        f"expected pushed filter containing {fragment!r}; got {joined!r}"
    )


def assert_broadcast(df: DataFrame, at_least: int = 1) -> None:
    facts = analyze(df)
    assert facts.n_broadcast_joins >= at_least, (
        f"expected >= {at_least} broadcast joins; plan:\n{facts.text}"
    )
