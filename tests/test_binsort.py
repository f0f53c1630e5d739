"""Binary-sortable encoding (sources/binsort_py): byte order of
encoded keys must equal typed tuple order (NULLs first), pinned by
hypothesis over mixed-type rows; exact round-trip decode."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive_spark.sources import binsort_py as bs

TYPES = ["bigint", "string", "double", "boolean", "int"]

row_st = st.tuples(
    st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
    st.one_of(st.none(), st.text(max_size=12)),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=True, width=64),
    ),
    st.one_of(st.none(), st.booleans()),
    st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
)


def _sql_key(row):
    """Typed tuple order with NULLs FIRST, matching the encoding."""
    out = []
    for v in row:
        if v is None:
            out.append((0,))
        elif isinstance(v, bool):
            out.append((1, int(v)))
        elif isinstance(v, str):
            out.append((1, list(v.encode("utf-8"))))
        elif isinstance(v, float) and v == 0.0:
            # -0.0 and +0.0 compare equal in SQL; IEEE bits differ.
            out.append((1, 0.0))
        else:
            out.append((1, v))
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(row_st, min_size=2, max_size=12))
def test_byte_order_equals_tuple_order(rows):
    enc = [bs.encode_key(TYPES, list(r)) for r in rows]
    by_bytes = sorted(range(len(rows)), key=lambda i: enc[i])
    by_tuple = sorted(range(len(rows)), key=lambda i: _sql_key(rows[i]))
    # compare the ordered KEYS (ties may permute indices freely)
    assert [_sql_key(rows[i]) for i in by_bytes] == [
        _sql_key(rows[i]) for i in by_tuple
    ]


@settings(max_examples=200, deadline=None)
@given(row_st)
def test_round_trip(row):
    got = bs.decode_key(TYPES, bs.encode_key(TYPES, list(row)))
    want = list(row)
    for g, w in zip(got, want):
        if isinstance(w, float):
            assert g == w or (math.isnan(g) and math.isnan(w)) or (
                g == 0.0 and w == 0.0
            )
        else:
            assert g == w


def test_known_orderings():
    t = ["bigint"]
    ks = [bs.encode_key(t, [v]) for v in (None, -(2**63), -1, 0, 1, 2**63 - 1)]
    assert ks == sorted(ks)
    t = ["string"]
    ks = [
        bs.encode_key(t, [v])
        for v in (None, "", "\x00", "\x00a", "\x01", "a", "a\x00", "ab", "b")
    ]
    assert ks == sorted(ks)
    t = ["double"]
    vals = (None, float("-inf"), -1.5, -0.0, 1e-300, 2.5, float("inf"))
    ks = [bs.encode_key(t, [v]) for v in vals]
    assert ks == sorted(ks)


def test_binsort_mutation_fuzz_never_leaks_internal_errors():
    """Seeded byte-mutation/truncation fuzz (round-12 contract):
    decode or ValueError — never IndexError / struct.error."""
    import numpy as np

    from hdp2_5_hive_spark.sources import binsort_py as bs

    types = ["bigint", "string", "double", "boolean"]
    payload = bs.encode_key(types, [5, "abc", -1.5, True])
    rng = np.random.default_rng(9)
    for trial in range(400):
        m = bytearray(payload)
        for _ in range(int(rng.integers(1, 5))):
            m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        if trial % 4 == 0:
            m = m[: max(1, int(rng.integers(1, len(m))))]
        try:
            bs.decode_key(types, bytes(m))
        except (ValueError, NotImplementedError):
            pass
