"""Hive ``CREATE TEMPORARY MACRO`` (HIVE-2655) — session-scoped SQL macros.

Reference surface: ``ql/parse/MacroSemanticAnalyzer.java`` (CREATE
TEMPORARY MACRO / DROP TEMPORARY MACRO statements; duplicate-parameter
and unused/undefined-column checks) and
``ql/udf/generic/GenericUDFMacro.java`` (the registered function that
binds call arguments to the macro's formal parameters, CONVERTING each
argument to the parameter's declared type, then evaluates the body
expression compiled once at CREATE time).

Spark has no macro object, but Hive macros are purely expression-level:
the body is an expression over the formal parameters, bound
positionally at each call site. This module reproduces those semantics
as session-scoped textual expansion against Spark SQL:

* ``CREATE TEMPORARY MACRO name(p1 T1, ...) body_expr`` — records the
  macro. The body is expanded against already-defined macros AT CREATE
  TIME (Hive compiles the body once when the macro is created, so
  redefining an inner macro later must not change an outer one — the
  test suite pins this).
* ``DROP TEMPORARY MACRO [IF EXISTS] name``.
* Any other statement: every top-level call ``name(a1, ..., an)`` of a
  defined macro is replaced by ``(body with pK -> CAST((aK) AS TK))``.
  The CAST reproduces GenericUDFMacro's converter step; the extra
  parens preserve argument/body precedence under substitution.

The expander is quote-aware (``'…'``, ``"…"``, backticks, ``--`` and
``/* */`` comments are never rewritten) and splits arguments on
top-level commas only, so nested function calls and literal commas in
strings pass through intact. Recursion is impossible by construction:
a macro's name is not defined while its own body is being expanded,
exactly as in Hive.

Scale: expansion happens on the driver before ``spark.sql``; the
executed plan is identical to hand-written SQL — no UDF, no extra
operator, full Catalyst optimization of the inlined expression.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TEMPORARY\s+MACRO\s+(`?)(\w+)\1\s*\(",
    re.IGNORECASE,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TEMPORARY\s+MACRO\s+(IF\s+EXISTS\s+)?(`?)(\w+)\2\s*;?\s*$",
    re.IGNORECASE,
)
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")


@dataclass(frozen=True)
class Macro:
    name: str
    params: tuple[str, ...]  # lower-cased formal parameter names
    types: tuple[str, ...]  # declared SQL types, verbatim
    body: str  # pre-expanded at CREATE time


class MacroExpansionError(ValueError):
    """Raised for the error cases MacroSemanticAnalyzer rejects."""


def _scan_segments(text: str):
    """Yield (start, end, kind) spans; kind 'code' spans are safe to
    rewrite, everything else (quotes/comments) must pass through."""
    i, n = 0, len(text)
    code_start = 0
    while i < n:
        c = text[i]
        if c in "'\"`":
            if code_start < i:
                yield (code_start, i, "code")
            q = c
            j = i + 1
            while j < n:
                if text[j] == "\\" and q != "`":
                    j += 2
                    continue
                if text[j] == q:
                    # '' / "" / `` escape-by-doubling
                    if j + 1 < n and text[j + 1] == q:
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            else:
                j = n
            yield (i, j, "quote")
            i = j
            code_start = i
        elif c == "-" and text[i : i + 2] == "--":
            if code_start < i:
                yield (code_start, i, "code")
            j = text.find("\n", i)
            j = n if j == -1 else j + 1
            yield (i, j, "comment")
            i = j
            code_start = i
        elif c == "/" and text[i : i + 2] == "/*":
            if code_start < i:
                yield (code_start, i, "code")
            j = text.find("*/", i + 2)
            j = n if j == -1 else j + 2
            yield (i, j, "comment")
            i = j
            code_start = i
        else:
            i += 1
    if code_start < n:
        yield (code_start, n, "code")


def _find_close_paren(text: str, open_idx: int) -> int:
    """Index of the ')' matching text[open_idx] == '(' — quote-aware."""
    depth = 0
    for s, e, kind in _scan_segments(text[open_idx:]):
        if kind != "code":
            continue
        for k in range(s, e):
            ch = text[open_idx + k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return open_idx + k
    raise MacroExpansionError(f"unbalanced parentheses after index {open_idx}")


def _split_top_level_args(
    argtext: str, angle_aware: bool = False
) -> list[str]:
    """Split 'a, f(b, c), d' on top-level commas only.

    ``angle_aware`` additionally treats ``<``/``>`` as nesting — for
    PARAMETER DECLARATION lists only, where they can only be type
    brackets (``x MAP<STRING,INT>`` must not split inside the type).
    Call-ARGUMENT lists keep the default: there ``<``/``>`` are
    comparison operators (``m(a < b, c)``) and counting them as
    brackets would corrupt the split."""
    if argtext.strip() == "":
        return []
    openers = "([<" if angle_aware else "(["
    closers = ")]>" if angle_aware else ")]"
    parts, depth, start = [], 0, 0
    for s, e, kind in _scan_segments(argtext):
        if kind != "code":
            continue
        for k in range(s, e):
            ch = argtext[k]
            if ch in openers:
                depth += 1
            elif ch in closers:
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(argtext[start:k])
                start = k + 1
    parts.append(argtext[start:])
    return [p.strip() for p in parts]


def _sub_params(body: str, params: tuple[str, ...], repl: dict[str, str]) -> str:
    """Replace formal-parameter identifiers in body (code spans only,
    whole identifiers only, case-insensitive)."""
    out: list[str] = []
    for s, e, kind in _scan_segments(body):
        seg = body[s:e]
        if kind != "code":
            out.append(seg)
            continue
        pos = 0
        buf: list[str] = []
        for m in _IDENT_RE.finditer(seg):
            word = m.group(0).lower()
            if word in repl:
                # not a function call: identifier followed by '(' is a
                # call, and Hive params are value identifiers
                after = seg[m.end() :].lstrip()
                if after.startswith("("):
                    continue
                buf.append(seg[pos : m.start()])
                buf.append(repl[word])
                pos = m.end()
        buf.append(seg[pos:])
        out.append("".join(buf))
    return "".join(out)


class MacroRegistry:
    """Session-scoped macro store + statement executor.

    ``sql(spark, text)`` mirrors ``Driver.run`` for the three statement
    shapes Hive's macro surface adds: CREATE TEMPORARY MACRO and DROP
    TEMPORARY MACRO execute against this registry and return None; any
    other statement is macro-expanded and handed to ``spark.sql``.
    """

    def __init__(self) -> None:
        self._macros: dict[str, Macro] = {}

    # -- statement surface -------------------------------------------------
    def sql(self, spark, text: str):
        if _CREATE_RE.match(text):
            self._create(text)
            return None
        m = _DROP_RE.match(text)
        if m:
            self._drop(m.group(3).lower(), if_exists=bool(m.group(1)))
            return None
        return spark.sql(self.expand(text))

    # -- DDL ----------------------------------------------------------------
    def _create(self, text: str) -> None:
        m = _CREATE_RE.match(text)
        assert m is not None
        name = m.group(2).lower()
        open_idx = text.index("(", m.end() - 1)
        close_idx = _find_close_paren(text, open_idx)
        params_text = text[open_idx + 1 : close_idx]
        body = text[close_idx + 1 :].strip().rstrip(";").strip()
        if not body:
            raise MacroExpansionError(f"macro {name}: empty body")
        params: list[str] = []
        types: list[str] = []
        for spec in _split_top_level_args(params_text, angle_aware=True):
            toks = spec.split(None, 1)
            if len(toks) != 2:
                raise MacroExpansionError(
                    f"macro {name}: parameter spec {spec!r} must be "
                    "'name TYPE' (MacroSemanticAnalyzer requires typed "
                    "formal parameters)"
                )
            pname = toks[0].strip("`").lower()
            if pname in params:
                # MacroSemanticAnalyzer.java: "duplicate parameter name"
                raise MacroExpansionError(
                    f"macro {name}: duplicate parameter name {pname}"
                )
            params.append(pname)
            types.append(toks[1].strip())
        # Hive compiles the body ONCE at CREATE time → expand nested
        # macro calls now; later redefinition of inner macros must not
        # retroactively change this macro.
        body = self.expand(body)
        self._macros[name] = Macro(name, tuple(params), tuple(types), body)

    def _drop(self, name: str, *, if_exists: bool) -> None:
        if name not in self._macros:
            if if_exists:
                return
            raise MacroExpansionError(f"macro {name} does not exist")
        del self._macros[name]

    # -- expansion -----------------------------------------------------------
    def expand(self, text: str) -> str:
        """Inline every defined-macro call site in ``text``."""
        if not self._macros:
            return text
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            # find next candidate identifier in a code span
            nxt = None
            for s, e, kind in _scan_segments(text[i:]):
                if kind != "code":
                    continue
                m = _IDENT_RE.search(text, i + s, i + e)
                while m is not None and m.end() <= i + e:
                    word = m.group(0).lower()
                    after = text[m.end() :].lstrip()
                    prev = text[: m.start()].rstrip()
                    qualified = prev.endswith(".")
                    if (
                        word in self._macros
                        and after.startswith("(")
                        and not qualified
                    ):
                        nxt = m
                        break
                    m = _IDENT_RE.search(text, m.end(), i + e)
                if nxt is not None:
                    break
            if nxt is None:
                out.append(text[i:])
                break
            out.append(text[i : nxt.start()])
            macro = self._macros[nxt.group(0).lower()]
            open_idx = text.index("(", nxt.end())
            close_idx = _find_close_paren(text, open_idx)
            raw_args = _split_top_level_args(text[open_idx + 1 : close_idx])
            if len(raw_args) != len(macro.params):
                raise MacroExpansionError(
                    f"macro {macro.name} expects {len(macro.params)} "
                    f"argument(s), got {len(raw_args)}"
                )
            # arguments may themselves contain macro calls
            repl = {
                p: f"CAST(({self.expand(a)}) AS {t})"
                for p, t, a in zip(macro.params, macro.types, raw_args)
            }
            out.append("(" + _sub_params(macro.body, macro.params, repl) + ")")
            i = close_idx + 1
        return "".join(out)
