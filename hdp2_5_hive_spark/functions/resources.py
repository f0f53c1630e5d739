"""Session resource commands — ADD/LIST/DELETE FILE and SOURCE.

Reference: ``cli/.../CliDriver.java`` processCmd dispatches these
BEFORE SQL parsing; ``ql/session/SessionState.java`` ResourceType
(FILE/JAR/ARCHIVE) keeps the session's resource list and ships each
file to the cluster so TRANSFORM scripts and UDF jars can use them.

Spark analogue: ``sparkContext.addFile`` distributes a file to every
executor (fetched into the executor's SparkFiles root — the same
job Hive's distributed cache does for ADD FILE). JAR/ARCHIVE map to
``addJar``/``addFile`` respectively; DELETE removes the name from
the SESSION resource list only (both systems: already-shipped
copies stay on executors until session end — Hive's delete is also
list-only). ``SOURCE file`` replays a script through the caller's
statement processor, exactly CliDriver's recursive processFile.
"""

from __future__ import annotations

import os
import re


class ResourceError(ValueError):
    """Unknown resource command / missing file."""


def split_statements(text: str) -> list[str]:
    """Quote-aware top-level ';' split + full-line comment strip —
    CliDriver's statement segmentation, shared by the CLI shell and
    SOURCE. A bare ``text.split(';')`` broke any statement containing
    a semicolon inside a string literal (fixed for SOURCE in r11; the
    shell's top level had the same bug until this was extracted)."""
    from .macros import _scan_segments

    cuts = [
        k
        for s, e, kind in _scan_segments(text)
        if kind == "code"
        for k in range(s, e)
        if text[k] == ";"
    ]
    stmts, prev = [], 0
    for k in cuts:
        stmts.append(text[prev:k])
        prev = k + 1
    stmts.append(text[prev:])
    out = []
    for stmt in stmts:
        # drop full-line comments, not the whole statement — a
        # statement PRECEDED by a comment must still run
        body = "\n".join(
            ln for ln in stmt.splitlines()
            if not ln.strip().startswith("--")
        ).strip()
        if body:
            out.append(body)
    return out


_CMD = re.compile(
    r"\s*(ADD|LIST|DELETE)\s+(FILES?|JARS?|ARCHIVES?)\b(.*)$|"
    r"\s*(SOURCE)\s+(.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)


class ResourceManager:
    """Tracks the session resource list and distributes via Spark."""

    def __init__(self) -> None:
        self.resources: dict[str, list[str]] = {
            "FILE": [], "JAR": [], "ARCHIVE": []
        }

    def match(self, statement: str):
        return _CMD.match(statement)

    def process(self, spark, statement: str, run_statement=None):
        """Handle one resource command. ``run_statement(stmt)`` is
        the caller's statement processor, needed by SOURCE. Returns
        a list of output lines (like the CLI prints), or None if the
        statement is not a resource command."""
        m = self.match(statement)
        if not m:
            return None
        if m.group(4):  # SOURCE
            path = m.group(5).strip().strip("'\"")
            if not os.path.isfile(path):
                raise ResourceError(f"SOURCE: no such file {path!r}")
            if run_statement is None:
                raise ResourceError("SOURCE needs a statement processor")
            text = open(path).read()
            for body in split_statements(text):
                run_statement(body)
            return [f"sourced {path}"]

        verb = m.group(1).upper()
        rtype = m.group(2).upper().rstrip("S")
        args = [a for a in (m.group(3) or "").split() if a]
        rlist = self.resources[rtype]
        if verb == "LIST":
            return list(rlist)
        if verb == "ADD":
            if not args:
                raise ResourceError(f"ADD {rtype} needs at least one path")
            out = []
            for p in args:
                if not os.path.isfile(p):
                    raise ResourceError(f"ADD {rtype}: no such file {p!r}")
                if rtype == "JAR":
                    spark.sparkContext.addJar(p)
                else:  # FILE and ARCHIVE both ship via addFile
                    spark.sparkContext.addFile(p)
                if p not in rlist:
                    rlist.append(p)
                out.append(f"added {rtype.lower()} {p}")
            return out
        # DELETE: session-list removal only (matches Hive — executor
        # copies persist until session end in both systems)
        if not args:
            rlist.clear()
            return [f"deleted all {rtype.lower()}s from resource list"]
        for p in args:
            if p in rlist:
                rlist.remove(p)
        return [f"deleted {rtype.lower()} {' '.join(args)}"]
