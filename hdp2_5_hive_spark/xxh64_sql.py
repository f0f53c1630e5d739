"""Generate DuckDB SQL that computes Spark's ``xxhash64`` exactly.

Spark's ``xxhash64(col)`` (used by the dedup operators as the shared
string hash) is the standard XXH64 algorithm with seed 42 over the
UTF-8 bytes of the value (reference parity:
``ql/src/java/org/apache/hadoop/hive/ql/exec/vector/expressions/
MurmurHashStringColStringCol.java`` is the reference's analogous
vectorized string-hash operator family; Spark publishes XXH64 as the
DataFrame-level hash — see
``sql/catalyst/expressions/hash.scala`` ``XxHash64Function``).

DuckDB has no xxhash64 function, so synthesized oracles that need
hash parity (e.g. SimHash fingerprints) were stuck at rows-only.
This module closes that gap: it emits a chain of CTE stages that
reproduces XXH64 bit-exactly in portable SQL —

- all arithmetic is HUGEINT (128-bit) reduced ``% 2**64``; 64-bit
  multiplication splits operands into 32-bit halves so no
  intermediate exceeds ~2**65;
- XOR is done on 32-bit halves via BIGINT ``xor`` (DuckDB 1.0 has no
  HUGEINT xor);
- the variable-length stripe / tail loops are ``list_reduce`` left
  folds with the initial accumulator prepended (DuckDB 1.0's
  list_reduce has no init argument); the 32-byte stripe fold carries
  its four lane accumulators as a ``LIST(HUGEINT)`` so the fold
  stays homogeneous.

The emitted SQL is pure (single WITH fragment, no temp macros), so
it can be embedded in a driver oracle string verbatim.
"""

from __future__ import annotations

M64 = 1 << 64
M32 = 1 << 32

P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261

SEED = 42  # Spark's fixed xxhash64 seed (hash.scala XxHash64 default)


def _mulc(x: str, c: int) -> str:
    """``(x * c) % 2**64`` for HUGEINT expr ``x`` and constant ``c``,
    via 32-bit half products (largest intermediate < 2**65)."""
    c_lo, c_hi = c % M32, c // M32
    return (
        f"((({x}) % {M32}) * {c_lo} + "
        f"(((({x}) // {M32}) * {c_lo} + (({x}) % {M32}) * {c_hi}) % {M32})"
        f" * {M32}) % {M64}"
    )


def _rotl(x: str, r: int) -> str:
    """64-bit rotate left by constant r (disjoint bit ranges → +)."""
    return f"((({x}) % {1 << (64 - r)}) * {1 << r} + ({x}) // {1 << (64 - r)})"


def _xor(a: str, b: str) -> str:
    """64-bit XOR of two HUGEINT exprs in [0, 2**64)."""
    return (
        f"(CAST(xor(CAST(({a}) % {M32} AS BIGINT), CAST(({b}) % {M32} AS BIGINT)) AS HUGEINT)"
        f" + CAST(xor(CAST(({a}) // {M32} AS BIGINT), CAST(({b}) // {M32} AS BIGINT)) AS HUGEINT)"
        f" * {M32})"
    )


def _round(acc: str, w: str) -> str:
    """XXH64 stripe round: rotl31(acc + w*P2) * P1 (all mod 2**64)."""
    inner = f"((({acc}) + {_mulc(w, P2)}) % {M64})"
    return _mulc(_rotl(inner, 31), P1)


def _shr_xor(x: str, r: int) -> str:
    return _xor(x, f"(({x}) // {1 << r})")


def xxh64_cte(src: str, key_cols: tuple[str, ...], val_col: str, out: str) -> str:
    """Emit CTE stage definitions (to splice into a WITH list) that
    hash ``src.val_col`` (VARCHAR) with XXH64 seed 42.

    Output CTE ``out`` has columns ``key_cols`` + ``h`` (HUGEINT in
    [0, 2**64), equal to Spark's xxhash64 reinterpreted unsigned).
    Stage names are prefixed with ``out`` so multiple expansions can
    coexist in one statement.
    """
    keys = ", ".join(key_cols)
    v1 = (SEED + P1 + P2) % M64
    v2 = (SEED + P2) % M64
    v3 = SEED % M64
    v4 = (SEED - P1) % M64
    small = (SEED + P5) % M64

    # Expression-size discipline: every stage references the previous
    # stage's COLUMNS only (never re-nests big expressions) and every
    # fold lambda works on PRE-MAPPED per-element values — textual
    # operand duplication in _xor/_mulc otherwise compounds ~6× per
    # wrap and megabyte-sized SQL takes DuckDB ~1 min to even bind.

    # one stripe round per lane; acc and stripe are LIST(HUGEINT)[4]
    lane = [_round("a[%d]" % i, "s[%d]" % i) for i in (1, 2, 3, 4)]
    merged = (
        f"(({_rotl('vv[1]', 1)}) + ({_rotl('vv[2]', 7)}) + "
        f"({_rotl('vv[3]', 12)}) + ({_rotl('vv[4]', 18)})) % {M64}"
    )
    # merge rounds as separate stages: m_k = (xor(m_{k-1}, round0(vv[k]))*P1+P4)
    def _round0(operand: str) -> str:
        """round(0, operand) — built per operand like _mulc/_rotl, never
        by textual substitution into a template (a bare .replace('x', …)
        would corrupt the SQL the moment the arithmetic grows another
        'x', e.g. a hex literal or xor())."""
        return _mulc(_rotl(_mulc(operand, P2), 31), P1)

    round0 = _round0("x")  # lambda-body form: 'x' IS the lambda variable
    merge_stage = f"({_mulc(_xor('m', 'r'), P1)} + {P4}) % {M64}"

    # tail folds: pre-map round(0,w) / w*P5 so the lambda sees one var
    tail8 = f"({_mulc(_rotl(_xor('a', 'rw'), 27), P1)} + {P4}) % {M64}"
    w4 = (
        "(b[8 * (n // 8) + 1] + b[8 * (n // 8) + 2] * 256"
        " + b[8 * (n // 8) + 3] * 65536 + b[8 * (n // 8) + 4] * 16777216)"
    )
    tail4 = f"({_mulc(_rotl(_xor('h1', _mulc(w4, P1)), 23), P2)} + {P3}) % {M64}"
    tail1 = _mulc(_rotl(_xor("a", "rb"), 11), P1)

    ava1 = _mulc(_shr_xor("h3", 33), P2)
    ava2 = _mulc(_shr_xor("a1", 29), P3)
    ava3 = _shr_xor("a2", 32)

    return f"""
{out}_hx AS MATERIALIZED (
  SELECT {keys},
         octet_length(encode({val_col})) AS n,
         hex(encode({val_col})) AS hx
  FROM {src}
),
{out}_b AS MATERIALIZED (
  SELECT {keys}, n,
         list_transform(range(1, n + 1),
           i -> CAST(strpos('0123456789ABCDEF',
                            substr(hx, 2 * i - 1, 1)) - 1
                     AS HUGEINT) * 16
              + (strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1)) AS b
  FROM {out}_hx
),
{out}_w AS MATERIALIZED (
  SELECT {keys}, n, b,
         list_transform(range(0, n // 8),
           k -> b[8 * k + 1] + b[8 * k + 2] * 256 + b[8 * k + 3] * 65536
              + b[8 * k + 4] * 16777216 + b[8 * k + 5] * 4294967296
              + b[8 * k + 6] * 1099511627776 + b[8 * k + 7] * 281474976710656
              + b[8 * k + 8] * 72057594037927936) AS w8
  FROM {out}_b
),
{out}_v AS MATERIALIZED (
  SELECT {keys}, n, b, w8,
         CASE WHEN n >= 32 THEN list_reduce(
           list_prepend(
             [{v1}::HUGEINT, {v2}::HUGEINT, {v3}::HUGEINT, {v4}::HUGEINT],
             list_transform(range(0, n // 32),
               k -> [w8[4 * k + 1], w8[4 * k + 2], w8[4 * k + 3], w8[4 * k + 4]])),
           (a, s) -> [{lane[0]}, {lane[1]}, {lane[2]}, {lane[3]}])
         ELSE [0::HUGEINT] END AS vv
  FROM {out}_w
),
{out}_m0 AS MATERIALIZED (
  SELECT {keys}, n, b, w8, vv, {merged} AS m
  FROM {out}_v
),
{out}_m1 AS MATERIALIZED (
  SELECT {keys}, n, b, w8, vv, {merge_stage} AS m
  FROM (SELECT *, {_round0('(vv[1])')} AS r FROM {out}_m0) _
),
{out}_m2 AS MATERIALIZED (
  SELECT {keys}, n, b, w8, vv, {merge_stage} AS m
  FROM (SELECT *, {_round0('(vv[2])')} AS r FROM {out}_m1) _
),
{out}_m3 AS MATERIALIZED (
  SELECT {keys}, n, b, w8, vv, {merge_stage} AS m
  FROM (SELECT *, {_round0('(vv[3])')} AS r FROM {out}_m2) _
),
{out}_m4 AS MATERIALIZED (
  SELECT {keys}, n, b, w8, {merge_stage} AS m
  FROM (SELECT *, {_round0('(vv[4])')} AS r FROM {out}_m3) _
),
{out}_h0 AS MATERIALIZED (
  SELECT {keys}, n, b, w8,
         ((CASE WHEN n >= 32 THEN m ELSE {small}::HUGEINT END) + n) % {M64} AS h0
  FROM {out}_m4
),
{out}_h1 AS MATERIALIZED (
  SELECT {keys}, n, b,
         list_reduce(
           list_prepend(h0, list_transform(
             list_transform(range(4 * (n // 32), n // 8), k -> w8[k + 1]),
             x -> {round0})),
           (a, rw) -> {tail8}) AS h1
  FROM {out}_h0
),
{out}_h2 AS MATERIALIZED (
  SELECT {keys}, n, b,
         CASE WHEN n % 8 >= 4 THEN {tail4} ELSE h1 END AS h2
  FROM {out}_h1
),
{out}_h3 AS MATERIALIZED (
  SELECT {keys},
         list_reduce(
           list_prepend(h2, list_transform(
             list_transform(
               range(8 * (n // 8) + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END, n),
               i -> b[i + 1]),
             x -> {_mulc('x', P5)})),
           (a, rb) -> {tail1}) AS h3
  FROM {out}_h2
),
{out}_a1 AS MATERIALIZED (SELECT {keys}, {ava1} AS a1 FROM {out}_h3),
{out}_a2 AS MATERIALIZED (SELECT {keys}, {ava2} AS a2 FROM {out}_a1),
{out} AS MATERIALIZED (
  SELECT {keys}, {ava3} AS h FROM {out}_a2
)"""


def mul64(x: str, y: str) -> str:
    """``(x * y) % 2**64`` for two HUGEINT exprs in [0, 2**64) —
    32-bit half products, largest intermediate < 2**65."""
    return (
        f"((({x}) % {M32}) * (({y}) % {M32}) + "
        f"(((({x}) // {M32}) * (({y}) % {M32}) + (({x}) % {M32}) * (({y}) // {M32}))"
        f" % {M32}) * {M32}) % {M64}"
    )


def signed64(expr: str) -> str:
    """HUGEINT in [0, 2**64) → Java-long two's-complement BIGINT."""
    return (
        f"CAST(CASE WHEN ({expr}) >= {1 << 63} THEN ({expr}) - {M64} "
        f"ELSE ({expr}) END AS BIGINT)"
    )


