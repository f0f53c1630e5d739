"""TypedBytes: wire-pinned bytes, round-trip property, and a real
transforming script through the binary ScriptOperator kernel."""

from __future__ import annotations

import struct
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive_spark.sources import typedbytes_py as tb


def test_wire_bytes_pinned():
    """Codes and payloads straight from Type.java / HADOOP-1722:
    INT=3 int32 BE, LONG=4, STRING=7 len+utf8, NULL=12, BOOL=2,
    VECTOR=8 count + typed elements, MAP=10 count + kv."""
    assert tb.encode_value(7) == b"\x03" + struct.pack(">i", 7)
    assert tb.encode_value(2**40) == b"\x04" + struct.pack(">q", 2**40)
    assert tb.encode_value("ab") == b"\x07\x00\x00\x00\x02ab"
    assert tb.encode_value(None) == b"\x0c"
    assert tb.encode_value(True) == b"\x02\x01"
    assert tb.encode_value(1.5) == b"\x06" + struct.pack(">d", 1.5)
    assert tb.encode_value(b"\xff") == b"\x00\x00\x00\x00\x01\xff"
    assert (
        tb.encode_value([1, None])
        == b"\x08\x00\x00\x00\x02" + tb.encode_value(1) + b"\x0c"
    )
    assert tb.encode_value({"k": 2}) == (
        b"\x0a\x00\x00\x00\x01" + tb.encode_value("k") + tb.encode_value(2)
    )
    # reader also accepts codes this writer never emits (BYTE, SHORT,
    # FLOAT, LIST+MARKER) — files from other Hadoop-streaming writers
    assert tb.decode_row(b"\x01\xfe", 1) == [-2]
    assert tb.decode_row(b"\x0b\xff\xfe", 1) == [-2]
    assert tb.decode_row(b"\x05" + struct.pack(">f", 0.5), 1) == [0.5]
    assert tb.decode_row(b"\x09\x03\x00\x00\x00\x01\x0c\xff", 1) == [[1, None]]


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.none()
        | st.booleans()
        | st.integers(-(2**62), 2**62)
        | st.floats(allow_nan=False)
        | st.text(max_size=10)
        | st.binary(max_size=10)
        | st.lists(st.none() | st.integers(-5, 5), max_size=4)
        | st.dictionaries(st.text(max_size=3), st.integers(-5, 5), max_size=3),
        min_size=1,
        max_size=6,
    )
)
def test_row_round_trip_property(values):
    got = tb.decode_row(tb.encode_row(values), len(values))
    assert got == values


def test_stream_splits_rows():
    rows = [[1, "a"], [None, "b"], [3, None]]
    blob = b"".join(tb.encode_row(r) for r in rows)
    assert list(tb.decode_stream(blob, 2)) == rows


def test_transform_typedbytes_real_script(spark):
    """A genuinely TRANSFORMING script (doubles the key, uppercases
    the name) driven through the binary ScriptOperator kernel —
    stdin/stdout both typedbytes, per-partition subprocess."""
    from hdp2_5_hive_spark.functions.extensions import (
        transform_typedbytes,
    )

    script = (
        "import sys; sys.path.insert(0, %r); "
        "from hdp2_5_hive_spark.sources import typedbytes_py as tb; "
        "data = sys.stdin.buffer.read(); "
        "out = b''.join(tb.encode_row([k * 2, s.upper()]) "
        "for k, s in tb.decode_stream(data, 2)); "
        "sys.stdout.buffer.write(out)"
    ) % "/root/repo"
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(25)], "k long, s string"
    ).repartition(4)
    out = transform_typedbytes(
        df, [sys.executable, "-c", script], "k long, s string"
    )
    got = sorted((r.k, r.s) for r in out.collect())
    assert got == [(2 * i, f"NAME{i}") for i in range(25)]


def test_corrupt_inputs_fail_loudly():
    """Corrupt-input uniformity (r9 hardening): truncation anywhere —
    including an unterminated LIST, previously a bare IndexError —
    raises EOFError, never IndexError."""
    import pytest

    from hdp2_5_hive_spark.sources import typedbytes_py as tb

    with pytest.raises(EOFError):
        tb.decode_row(b"\x07\x00\x00\x00\x05ab", 1)  # string len 5, 2 left
    # LIST (code 9) with elements but no 0xFF end marker
    blob = bytes([9]) + tb.encode_value(1) + tb.encode_value(2)
    with pytest.raises(EOFError, match="unterminated list"):
        tb.decode_row(blob, 1)


def test_negative_container_counts_raise():
    """Regression: a corrupt negative VECTOR/MAP count made
    range(n) empty, so the container decoded as []/{} WITHOUT
    consuming its element bytes — the elements then re-parsed as the
    next columns' type codes, a garbage row with no error."""
    import struct

    import pytest

    from hdp2_5_hive_spark.sources.typedbytes_py import (
        MAP,
        VECTOR,
        decode_row,
    )

    with pytest.raises(ValueError, match="negative vector"):
        decode_row(bytes([VECTOR]) + struct.pack(">i", -1), 1)
    with pytest.raises(ValueError, match="negative map"):
        decode_row(bytes([MAP]) + struct.pack(">i", -2), 1)


def test_transform_partial_consumption_fails_loudly(spark):
    """Regression: a script exiting 0 WITHOUT consuming all stdin
    killed the feed thread with a swallowed BrokenPipeError and the
    kernel yielded a silently truncated result. Hive's
    ScriptOperator (allow.partial.consumption=false) fails the query
    — so do we."""
    import sys

    import pytest

    from hdp2_5_hive_spark.functions.extensions import (
        transform_typedbytes,
    )

    # reads ONE row's worth of bytes then exits 0
    script = (
        "import sys; sys.stdin.buffer.read(8); "
        "sys.stdout.buffer.write(b'')"
    )
    df = spark.createDataFrame(
        [(i, "x" * 200) for i in range(5000)], "k long, s string"
    ).coalesce(1)
    with pytest.raises(Exception, match="consume|feed thread"):
        transform_typedbytes(
            df, [sys.executable, "-c", script], "k long, s string"
        ).collect()


def test_transform_crash_reports_exit_code_not_broken_pipe(spark):
    """Regression (ADVICE r11): a script that CRASHES (rc != 0)
    without draining stdin also kills the feed thread with
    BrokenPipeError; checking the feed error first reported 'did not
    consume its full input', masking the real root cause. The exit
    status must win."""
    import sys

    import pytest

    from hdp2_5_hive_spark.functions.extensions import (
        transform_typedbytes,
    )

    # reads a few bytes then dies with a non-zero exit
    script = "import sys; sys.stdin.buffer.read(8); sys.exit(3)"
    df = spark.createDataFrame(
        [(i, "x" * 200) for i in range(5000)], "k long, s string"
    ).coalesce(1)
    with pytest.raises(Exception, match="exited 3"):
        transform_typedbytes(
            df, [sys.executable, "-c", script], "k long, s string"
        ).collect()


def test_deep_nesting_raises_valueerror_not_recursionerror():
    """Corrupt-input contract (r13, same class as the thrift_py fix):
    a few KB of nested VECTOR headers drove the recursive decoder
    past Python's recursion limit — RecursionError is an internal
    error class the contract forbids."""
    import struct

    import pytest

    from hdp2_5_hive_spark.sources import typedbytes_py as tb

    body = b"".join(
        bytes([tb.VECTOR]) + struct.pack(">i", 1)
        for _ in range(tb.MAX_NEST_DEPTH + 1000)
    )
    body += bytes([tb.BOOL, 0])
    with pytest.raises(ValueError, match="nesting deeper"):
        tb.decode_row(body, 1)
    # legit shallow nesting still decodes (vector of vector of ints)
    legit = (
        bytes([tb.VECTOR])
        + struct.pack(">i", 1)
        + bytes([tb.VECTOR])
        + struct.pack(">i", 2)
        + bytes([tb.INT])
        + struct.pack(">i", 7)
        + bytes([tb.INT])
        + struct.pack(">i", 9)
    )
    assert tb.decode_row(legit, 1) == [[[7, 9]]]
