"""Shared CTE generators for the synthesized trainer-replay oracles.

The BPE and WordPiece replays (pipeline4/pipeline6) share the whole
round skeleton — word-frequency base table, adjacent-pair counts, a
≤1-row argmax, and the greedy merge rewrite expressed as a left fold
— differing only in the initial symbol decomposition and how the
argmax is scored. The fold-exactness and early-stop-composition
arguments (see ``pipeline4._bpe_rounds_sql``) therefore live in
exactly one place, as does the per-document rebuild every apply
oracle ends with. Same extraction discipline as
``sources/hadoop_framing.py``.
"""

from __future__ import annotations

from collections.abc import Callable


def subword_rounds_sql(
    n_rounds: int,
    *,
    pfx: str,
    keep_word: bool,
    sym_expr: str,
    argmax_cte: Callable[[int], str],
) -> str:
    """CTE chain ``{pfx}w0..{pfx}w{n}`` (the evolving distinct-word
    symbol table over ``documents``) plus per-round pair counts
    ``{pfx}pc{k}`` and the caller-supplied argmax ``{pfx}m{k}``.

    ``sym_expr`` builds the initial symbol list from column ``w``.
    ``argmax_cte(k)`` must emit CTE text ending with ``{pfx}m{k}``
    exposing at least (l, r, merged) for the ≤1 winning merge —
    empty once the best support drops below the trainer's threshold,
    which composes correctly under static unrolling (a no-op round
    leaves the table unchanged, so later rounds re-derive the same
    sub-threshold best).

    The greedy left-to-right merge rewrite is a left fold — exact
    because ``merged`` always extends strictly past ``l`` (BPE:
    ``l || r`` with non-empty ``r``; WordPiece: ``l || strip##(r)``
    where a continuation symbol is ``##`` plus ≥1 char), so the fold
    can never cascade within a round where the sequential kernel
    would not. Every stage is MATERIALIZED: ``{pfx}w{k}`` is read
    twice (pair counts + next rewrite) and inlining would double the
    plan per round.
    """
    wk = "w, " if keep_word else ""
    parts = [
        f"""
{pfx}w0 AS MATERIALIZED (
  SELECT {wk}{sym_expr} AS syms, freq
  FROM (
    SELECT w, COUNT(*) AS freq FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents) _
    WHERE w <> '' GROUP BY w) _
)"""
    ]
    for k in range(n_rounds):
        wkm = f"{'wt.w, ' if keep_word else ''}"
        parts.append(
            f"""
{pfx}pc{k} AS MATERIALIZED (
  SELECT l, r, SUM(freq) AS pc FROM (
    SELECT syms[i.i] AS l, syms[i.i + 1] AS r, freq
    FROM {pfx}w{k}, LATERAL (SELECT unnest(range(1, len(syms))) AS i) i
  ) _ GROUP BY l, r
),
{argmax_cte(k)},
{pfx}w{k + 1} AS MATERIALIZED (
  SELECT {wkm}wt.freq,
         CASE WHEN m.l IS NULL THEN wt.syms ELSE
           list_reduce(
             list_prepend(CAST([] AS VARCHAR[]),
                          list_transform(wt.syms, s -> [s])),
             (a, e) -> CASE WHEN len(a) > 0 AND a[len(a)] = m.l
                             AND e[1] = m.r
                       THEN list_append(a[1:len(a) - 1], m.merged)
                       ELSE list_append(a, e[1]) END)
         END AS syms
  FROM {pfx}w{k} wt LEFT JOIN {pfx}m{k} m ON TRUE
)"""
        )
    return ",".join(parts)


def doc_rebuild_sql(
    *,
    wtok_cte: str,
    sums: list[tuple[str, str]],
    doc_where: str = "",
) -> str:
    """Per-document reconstruction shared by every apply oracle:
    position-unnest each document's non-empty lowercased words, join
    the per-word tokenization ``{wtok_cte}`` (columns ``w``, ``toks``
    plus the per-word counters named in ``sums``), order-preserving
    string_agg, and a LEFT JOIN back to ``documents`` so empty
    documents keep a row (tokens='', counters 0 — kernel parity).

    ``sums`` maps (wtok counter column → output column); ``doc_where``
    optionally restricts the document slice (e.g. ``WHERE doc_id <=
    60``). Emits the ``docw``/``agg`` CTEs and the final SELECT.
    """
    agg_cols = ",\n         ".join(
        f"CAST(SUM({src}) AS BIGINT) AS {out}" for src, out in sums
    )
    out_cols = ",\n       ".join(
        f"COALESCE(a.{out}, 0) AS {out}" for _, out in sums
    )
    return f"""
docw AS (
  SELECT doc_id, i.i AS pos, ws[i.i] AS w
  FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
        FROM documents {doc_where}) d,
       LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) i
),
agg AS (
  SELECT doc_id, string_agg(toks, ' ' ORDER BY pos) AS tokens,
         {agg_cols}
  FROM docw JOIN {wtok_cte} USING (w) GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(a.tokens, '') AS tokens,
       {out_cols}
FROM (SELECT doc_id FROM documents {doc_where}) d
LEFT JOIN agg a USING (doc_id)
"""
