"""Hive regex column specification (``hive.support.quoted.identifiers
= none``).

Reference: ``ql/parse/SemanticAnalyzer.java`` genColListRegex /
``unparseTranslator`` — when quoted-identifier support is off (the
Hive 1.2 default), a backquoted token in a SELECT list is NOT an
identifier but a Java regex matched in FULL against the FROM source's
column names, expanding to every match in schema order. The canonical
idiom is the possessive-quantifier exclude, qfile
``clientpositive/regex_col.q``::

    SELECT `(ds|hr)?+.+` FROM srcpart          -- all EXCEPT ds, hr

Spark has no equivalent (backquotes are always identifiers), so this
is a driver-side text expansion in the same mold as
:mod:`.macros`: the rewritten statement Catalyst sees is plain
column references — nothing changes in the row path. Python 3.11's
``re`` supports possessive quantifiers, so Hive's published patterns
work verbatim; matching is case-insensitive on the lower-cased
schema names, exactly Hive's behavior (it lower-cases column names
at metastore boundaries).

Scope (documented, loud): expansion applies to a SELECT-list item
that is EXACTLY one backquoted token (optionally ``alias.``-
qualified); the FROM source must be a named table/view visible to
``spark.table``. Anything else passes through untouched — a
backquoted token that is a plain identifier (``[a-z0-9_]+``) is
treated as a quoted identifier, as Hive does for valid column names
even with regex support on.
"""

from __future__ import annotations

import re

from .macros import _scan_segments


class ColumnRegexError(ValueError):
    """No column matched, or the statement shape is unsupported."""


_PLAIN_IDENT = re.compile(r"[a-z0-9_]+\Z")
# a select-list item that is exactly `pattern` or alias.`pattern`
_ITEM = re.compile(r"\A(?:([A-Za-z_][A-Za-z0-9_]*)\.)?`([^`]+)`\Z")


def _code_text(sql: str) -> str:
    """sql with quote/comment spans blanked (length-preserving) so
    top-level keyword scans can't match inside literals."""
    out = []
    for s, e, kind in _scan_segments(sql):
        seg = sql[s:e]
        out.append(seg if kind == "code" else " " * len(seg))
    return "".join(out)


def _split_top_level_commas(text: str) -> list[tuple[int, int]]:
    """(start, end) spans of comma-separated items, paren-aware;
    operates on code-blanked text offsets valid for the original."""
    spans, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            spans.append((start, i))
            start = i + 1
    spans.append((start, len(text)))
    return spans


def expand_column_regex(spark, sql: str) -> str:
    """Rewrite every regex column spec in the (single) top-level
    SELECT list of ``sql`` into explicit column references."""
    code = _code_text(sql)
    msel = re.search(r"\bSELECT\b", code, re.IGNORECASE)

    # the TOP-LEVEL FROM: the first FROM at paren depth 0 after the
    # SELECT. Anchoring on the first textual FROM mis-scoped the
    # select list whenever it contained a scalar subquery (or
    # substring(x FROM 1)) — those FROMs are parenthesized, so depth
    # tracking skips them.
    from_span = None
    if msel:
        depth = 0
        for m in re.finditer(
            r"[()]|\bFROM\b", code[msel.end():], re.IGNORECASE
        ):
            tok = m.group(0)
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif depth == 0:
                from_span = (msel.end() + m.start(), msel.end() + m.end())
                break
    if not msel or from_span is None:
        raise ColumnRegexError(
            "regex column expansion needs a SELECT ... FROM statement"
        )
    # FROM source: first identifier token after FROM
    mtab = re.match(
        r"\s*([A-Za-z_][A-Za-z0-9_.]*)", code[from_span[1]:]
    )
    if not mtab:
        raise ColumnRegexError("cannot resolve FROM source for regex "
                               "column expansion")
    cols = [c.lower() for c in spark.table(mtab.group(1)).columns]

    sel_lo, sel_hi = msel.end(), from_span[0]
    out, changed = [], False
    pos = sel_lo
    for s, e in _split_top_level_commas(code[sel_lo:sel_hi]):
        item_sql = sql[sel_lo + s : sel_lo + e]
        m = _ITEM.match(item_sql.strip())
        pat = m.group(2) if m else None
        if pat is not None and not _PLAIN_IDENT.match(pat):
            try:
                rx = re.compile(pat)
            except re.error as exc:  # not a regex either — Hive errors
                raise ColumnRegexError(
                    f"invalid column regex `{pat}`: {exc}"
                ) from exc
            qual = (m.group(1) + ".") if m.group(1) else ""
            matched = [c for c in cols if rx.fullmatch(c)]
            if not matched:
                # SemanticAnalyzer: "Invalid column reference"
                raise ColumnRegexError(
                    f"regex column spec `{pat}` matched no column of "
                    f"{mtab.group(1)} ({', '.join(cols)})"
                )
            out.append(" " + ", ".join(qual + c for c in matched))
            changed = True
        else:
            out.append(item_sql)
    if not changed:
        return sql
    return sql[:sel_lo] + ",".join(out) + sql[sel_hi:]


def sql_with_column_regex(spark, sql: str):
    """Expand regex column specs, then run the statement."""
    return spark.sql(expand_column_regex(spark, sql))
