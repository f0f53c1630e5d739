"""Named query registry — the driver-facing surface.

Each registered query pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with an equivalent DuckDB oracle SQL string (or ``None``
for non-SQL-expressible operators → rows-only check). This mirrors
the reference's golden-file qfile tests
(``ql/src/test/queries/clientpositive/*.q`` + ``*.q.out``,
SURVEY.md §5) with DuckDB as the golden-output generator.
"""

from __future__ import annotations

import importlib

from .registry import Query, all_queries, oracle_map, query_map, register

# Registration (= driver sampling) order: the driver's correctness
# run checks a prefix of the registry, so the most load-bearing
# suites come first — TPC-H core, join matrix, aggregates, windows,
# then the LLM-pipeline operators (first-class per SURVEY §2.14).
_MODULES = (
    "core",
    "joins",
    "aggregates",
    "windows",
    "pipeline",
    "scalars",
    "setops",
    "lateral",
    "subqueries",
    "extensions",
    "streaming_batch",
    "scalars2",
    "formats",
    "pipeline2",
)


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")


__all__ = [
    "Query",
    "register",
    "all_queries",
    "query_map",
    "oracle_map",
    "load_all",
]
