"""Column-level lineage extraction from the ANALYZED Catalyst plan.

The governance hook Hive exposes through
``ql/hooks/LineageInfo.java`` (+ the post-exec lineage logger Atlas
consumes): for every output column of a query, which SOURCE TABLE
COLUMNS flow into it. Table-level lineage lives in
``functions/explain_dep.py``; this walks expressions, not just
relations.

Mechanics: one post-order traversal of the analyzed logical plan
over py4j. Leaf file relations seed each output attribute with its
own (table, column) identity — the table name is the nearest
enclosing SubqueryAlias (temp view reads) or the scan's root-path
basename (direct parquet reads). Every ``Alias`` node then maps its
exprId to the union of its referenced attributes' lineage sets
(transitively already resolved, because children resolve first);
``Generate`` (explode family) maps its generator output to the
generator's references. Everything is exprId-keyed, so name
collisions across self-joins resolve correctly.

Scope: column lineage through Project/Aggregate/Window/Join/
Filter/Generate/SetOp chains — the shapes the registry queries use.
Expressions that reference NO column (literals, monotonic ids) yield
an empty set, rendered as ``<computed>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _seq(jseq):
    out = []
    it = jseq.iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _leaf_table_name(node) -> str:
    """Best-effort identity for a leaf relation: last path segment
    of the file index root, without extension."""
    try:
        path = (
            node.relation().location().rootPaths().apply(0).toString()
        )
        base = path.rstrip("/").rsplit("/", 1)[-1]
        return base.split(".")[0]
    except Exception:
        return node.getClass().getSimpleName()


def column_lineage(df: DataFrame) -> dict[str, list[str]]:
    """Map each output column of ``df`` to the sorted list of
    ``table.column`` source identities feeding it (``<computed>``
    for pure-literal columns)."""
    plan = df._jdf.queryExecution().analyzed()
    dep: dict[int, set[str]] = {}

    def refs_of(expr) -> set[str]:
        out: set[str] = set()
        for a in _seq(expr.references().toSeq()):
            out |= dep.get(a.exprId().id(), set())
        return out

    def visit(node, alias_above: str | None):
        cls = node.getClass().getSimpleName()
        next_alias = alias_above
        if cls == "SubqueryAlias":
            next_alias = node.alias()
        for ch in _seq(node.children()):
            visit(ch, next_alias)
        if cls in ("LogicalRelation", "LogicalRDD", "LocalRelation"):
            # File relations anchor to their PHYSICAL identity (path
            # basename) — a DataFrame .alias("a") must not rename the
            # source table in governance lineage; the enclosing
            # SubqueryAlias is only the fallback for in-memory leaves
            # that have no physical name.
            if cls == "LogicalRelation":
                table = _leaf_table_name(node)
            else:
                table = alias_above if alias_above else cls
            for a in _seq(node.output()):
                dep[a.exprId().id()] = {f"{table}.{a.name()}"}
            return
        if cls == "Generate":
            gen_refs = refs_of(node.generator())
            for a in _seq(node.generatorOutput()):
                dep[a.exprId().id()] = set(gen_refs)
        # generic: resolve every Alias this node produces
        for e in _seq(node.expressions()):
            _resolve_aliases(e)

    def _resolve_aliases(expr):
        # post-order over the expression tree so nested aliases
        # (rare) resolve before parents
        for ch in _seq(expr.children()):
            _resolve_aliases(ch)
        if expr.getClass().getSimpleName() == "Alias":
            dep[expr.exprId().id()] = refs_of(expr)

    visit(plan, None)
    out: dict[str, list[str]] = {}
    for a in _seq(plan.output()):
        srcs = dep.get(a.exprId().id(), set())
        out[a.name()] = sorted(srcs) if srcs else ["<computed>"]
    return out
