"""``EXPLAIN DEPENDENCY`` — Hive's machine-readable input-lineage
statement (reference ``ql/exec/ExplainTask.java`` ``getJSONDependencies``
and ``ql/hooks/LineageInfo.java``: emits one JSON object with
``input_tables`` / ``input_partitions`` for workflow schedulers and
audit tooling to consume).

Spark-first shape: the lineage is read off the ANALYZED logical plan
— resolved view/table references appear as ``SubqueryAlias`` nodes
before the optimizer inlines them — then filtered against the
session catalog so CTE aliases and subquery aliases (which Hive also
excludes) don't leak in. Partition lineage: Hive enumerates the
concrete partitions the pruner selected; the Spark analogue is the
scan's ``PartitionFilters``, so for partitioned scans we report the
pushed partition predicates (the pruning CONTRACT; the concrete
directory list is an execution-time artifact under AQE).
"""

from __future__ import annotations

import json
import re

_KEYWORD = re.compile(r"^\s*EXPLAIN\s+DEPENDENCY\s+", re.IGNORECASE)


def match(statement: str) -> str | None:
    """Return the inner SQL if this is an EXPLAIN DEPENDENCY
    statement, else None."""
    m = _KEYWORD.match(statement)
    return statement[m.end() :] if m else None


def explain_dependency(spark, df) -> str:
    """One JSON line for an analyzed DataFrame, Hive's output shape:
    ``{"input_tables":[{"tablename":...}],"input_partitions":[...]}``."""
    qe = df._jdf.queryExecution()
    analyzed = qe.analyzed().toString()
    # a catalog (non-temp-view) table prints a DOTTED alias
    # (spark_catalog.default.orders) — capture the whole name and
    # compare its LAST component, or catalog tables silently vanish
    # from the dependency report
    aliases = set(re.findall(r"SubqueryAlias ([\w.]+)", analyzed))
    catalog = {t.name for t in spark.catalog.listTables()}
    tables = sorted(
        {
            a.rsplit(".", 1)[-1]
            for a in aliases
            if a.rsplit(".", 1)[-1] in catalog
        }
    )
    # partition lineage from the optimized scan nodes
    optimized = qe.executedPlan().toString()
    parts = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", optimized):
        expr = m.group(1).strip()
        if expr:
            parts.append(re.sub(r"#\d+L?", "", expr))
    return json.dumps(
        {
            "input_tables": [
                {"tablename": f"default@{t}", "tabletype": "VIEW"}
                for t in tables
            ],
            "input_partitions": sorted(set(parts)),
        },
        sort_keys=True,
    )
