"""Row-filter + column-mask policy engine — the Ranger data plane.

Hive deployments enforce row-level security and column masking
through policies evaluated at COMPILE time: Ranger's hooks rewrite
the query so a row-filter policy becomes a WHERE predicate and a
masking policy replaces the column expression in the select list
(reference surface: ``ql/security/authorization/plugin/
HiveAuthorizer.java`` — applyRowFilterAndColumnMasking; the
enforcement daemon itself is deployment-layer, SURVEY §2.13). This
module implements the same data plane for DataFrames: policies are
DATA (a list of dicts), application is a plan-time rewrite — which
means a row filter participates in Catalyst pushdown like any user
predicate (gate: tests/test_policies.py asserts it reaches the
parquet scan's PushedFilters), and a masked column is a plain
projection expression, codegen-fused, zero UDFs.

Policy shape (one per table):
    {"table": "customer",
     "users": ["analyst"],           # None/absent → applies to all
     "row_filter": "c_nationkey < 10",         # SQL boolean expr
     "column_masks": {"c_name": "mask_show_first_n(c_name, 2)",
                      "c_phone": "'REDACTED'"}}

Masks may reference the original column (pre-mask values, as Ranger
does) and any builtin; unlisted columns pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Policy = dict


def policies_for(
    policies: list[Policy], table: str, user: str
) -> list[Policy]:
    """Policies matching (table, user); a policy without ``users``
    applies to everyone."""
    out = []
    for p in policies:
        if p.get("table") != table:
            continue
        users = p.get("users")
        if users is None or user in users:
            out.append(p)
    return out


def apply_policies(
    df: DataFrame, table: str, user: str, policies: list[Policy]
) -> DataFrame:
    """Rewrite ``df`` under every policy matching (table, user):
    row filters AND together; masks replace select-list expressions.
    Applied filter-first so masks can never unmask rows the filter
    removed, and masks see PRE-mask column values (Ranger
    semantics). No matching policy → df unchanged."""
    matched = policies_for(policies, table, user)
    for p in matched:
        rf = p.get("row_filter")
        if rf:
            df = df.filter(F.expr(rf))
    cols = df.columns
    mask_exprs: dict[str, str] = {}
    for p in matched:
        for col, expr in (p.get("column_masks") or {}).items():
            if col not in cols:
                raise ValueError(
                    f"masking policy for unknown column {col!r} on "
                    f"table {table!r}"
                )
            mask_exprs[col] = expr
    if mask_exprs:
        df = df.select(
            *[
                F.expr(mask_exprs[c]).cast(dict(df.dtypes)[c]).alias(c)
                if c in mask_exprs
                else F.col(c)
                for c in cols
            ]
        )
    return df
