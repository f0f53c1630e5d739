"""Query registry machinery.

The registry is the engine's equivalent of Hive's qfile list: a named,
enumerable suite where every entry is independently runnable and
oracle-checked (SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Tables, ensure_parity_confs, register_views

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → rows-only check
    category: str
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Cache of Tables per (session, sf_dir) so each query call doesn't
# re-read ten parquet footers; plus the sf_dir whose views are
# CURRENTLY registered per session — temp view names are global to
# the session, so switching sf_dir (driver: entry at sf0.001, then
# correctness at sf0.01) must re-point them or SQL-text queries would
# silently read the wrong scale. Keys hold the SparkSession object
# itself (strong ref, so a GC'd session can't recycle an id() and
# serve stale state to a different session).
_TABLES_CACHE: dict[tuple[SparkSession, str], Tables] = {}
_ACTIVE_SF: dict[SparkSession, str] = {}


def tables_for(spark: SparkSession, sf_dir: str) -> Tables:
    # The driver calls queries with ITS OWN vanilla session — parity
    # confs must be (re)applied here, the one choke point every query
    # passes through, not just in our session factory. Re-applied on
    # cache hits too: confs are runtime-mutable and cheap to pin.
    ensure_parity_confs(spark)
    key = (spark, sf_dir)
    if key not in _TABLES_CACHE:
        _TABLES_CACHE[key] = register_views(spark, sf_dir)
    elif _ACTIVE_SF.get(spark) != sf_dir:
        register_views(spark, sf_dir)
    _ACTIVE_SF[spark] = sf_dir
    return _TABLES_CACHE[key]


def register(
    name: str, oracle: str | None = None, category: str = "core"
) -> Callable[[Callable[..., DataFrame]], QueryFn]:
    """Decorator: register ``fn(spark, tables) -> DataFrame`` under
    ``name``. The wrapper adapts to the driver's ``(spark, sf_dir)``
    calling convention and guarantees temp views exist."""

    def deco(fn: Callable[..., DataFrame]) -> QueryFn:
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            t = tables_for(spark, sf_dir)
            return fn(spark, t)

        wrapper.__name__ = f"query_{name}"
        wrapper.__doc__ = fn.__doc__
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(
            name=name,
            fn=wrapper,
            oracle=oracle.strip() if oracle else None,
            category=category,
            doc=(fn.__doc__ or "").strip(),
        )
        return wrapper

    return deco


def all_queries() -> dict[str, Query]:
    """Every registered query, ordered for the driver's sample window.

    The driver's correctness run checks a prefix (~50) of this dict,
    so ``SAMPLE_FRONT`` (the per-round rotation ledger in
    ``queries/__init__``) comes first, then the rest in module
    registration order. A front name that doesn't exist is a bug —
    fail loudly rather than silently shrinking the window."""
    from . import SAMPLE_FRONT, load_all

    load_all()
    missing = [n for n in SAMPLE_FRONT if n not in _REGISTRY]
    if missing:
        raise KeyError(f"SAMPLE_FRONT names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in SAMPLE_FRONT}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def query_map() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle}
