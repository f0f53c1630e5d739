"""Hive-semantics expression shims over ``pyspark.sql.functions``.

Two jobs (SURVEY.md §2.9 / §7 "hard parts"):

1. Hive functions whose Spark twin differs slightly in name/shape
   (``nvl``, ``if`` — reference registrations
   ``ql/.../exec/FunctionRegistry.java:258,322``).

2. **Deterministic float aggregation.** Summing doubles is
   order-dependent; a distributed sum and the single-threaded DuckDB
   oracle would disagree in the last ulp and fail the driver's
   value-hash compare. ``dsum``/``davg`` therefore route double sums
   through DECIMAL(38,6): decimal addition is exact and associative,
   so any shuffle/partial-agg order gives bit-identical results — at
   100 TB exactly as at sf0.01. (Hive itself aggregates DECIMAL
   exactly; ``GenericUDAFSum.java`` keeps a decimal accumulator.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale for the exact-decimal accumulator. 38 total digits leaves 32
# integer digits at scale 6 — ample headroom for 100 TB sums of prices.
_DECIMAL = "decimal(38,6)"


def exact_sum_expr(expr: str, alias: str) -> str:
    """SQL-text form of ``dsum`` for use inside ``spark.sql`` strings
    (and, symmetrically, in DuckDB oracle SQL)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double column (exact decimal
    accumulator, result cast back to double)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum divided by count in
    double space (both engines do the identical final division)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DECIMAL)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def pround(col: Column, scale: int = 6) -> Column:
    """Cross-engine-DETERMINISTIC half-up round of a DOUBLE:
    ``floor(x * 10^scale + 0.5) / 10^scale`` in pure IEEE double ops
    — bit-identical on every engine given the same ``x``.

    Why not native ROUND: engines disagree on doubles lying within an
    ulp of a decimal tie (Spark rounds the exact binary value of x,
    DuckDB rounds after an inexact scale-multiply). That is NOT a
    theoretical corner for this codebase's quotients-of-decimal-sums:
    a DECIMAL(38,6) sum divided by a small integer count is a
    rational whose exact value can sit ON the .5*10^-scale tie, so
    the double lands within half an ulp of it and the two ROUNDs
    coin-flip (observed: text_char_entropy at sf0.001, doc with
    n=122 chars). The floor form may round such a value the "wrong"
    way vs exact decimal HALF_UP — but IDENTICALLY wrong on both
    engines, which is what oracle parity needs.

    Oracle twin (keep the op order — divide, then scale):
    ``FLOOR(x * 1000000 + 0.5) / 1000000``."""
    s = float(10**scale)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def nvl(col: Column, default: Column) -> Column:
    """Hive ``nvl`` (FunctionRegistry.java:258) — two-arg coalesce."""
    return F.coalesce(col, default)


def hive_if(cond: Column, then: Column, otherwise: Column) -> Column:
    """Hive ``if(cond, a, b)`` (FunctionRegistry.java:322)."""
    return F.when(cond, then).otherwise(otherwise)


def cast_varchar(col: Column, n: int) -> Column:
    """Hive ``CAST(x AS VARCHAR(n))``: silently truncate to ``n``
    characters (reference ``serde/.../typeinfo/VarcharTypeInfo.java:51``,
    ``HiveVarchar.java`` enforceMaxLength). Spark 4's SQL cast keeps
    the full string (char/varchar are length-checked only on table
    write), so parity needs the explicit substring."""
    return F.substring(col, 1, n)


def cast_char(col: Column, n: int) -> Column:
    """Hive ``CAST(x AS CHAR(n))``: truncate to ``n`` then blank-pad
    to exactly ``n`` characters (reference
    ``serde/.../typeinfo/CharTypeInfo.java:50``, ``HiveChar.java``
    getPaddedValue). NULL stays NULL (rpad of NULL is NULL)."""
    return F.rpad(F.substring(col, 1, n), n, " ")


def field(needle: Column, *haystack: Column | str) -> Column:
    """Hive/MySQL ``field(x, v1, v2, ...)`` (FunctionRegistry.java:248,
    ``udf/generic/GenericUDFField.java``): 1-based index of ``x`` in
    the argument list, 0 if absent. No Spark builtin —
    ``array_position`` has exactly these semantics."""
    vals = [v if isinstance(v, Column) else F.lit(v) for v in haystack]
    # GenericUDFField/MySQL: FIELD(NULL, ...) is 0, not NULL —
    # array_position propagates a null needle, so pin the Hive value
    return F.when(needle.isNull(), F.lit(0).cast("long")).otherwise(
        F.array_position(F.array(*vals), needle)
    )


def in_file(df, col, path: str, *, flag_name: str = "in_file"):
    """Hive ``in_file(str, filename)`` (FunctionRegistry.java:412,
    ``udf/generic/GenericUDFInFile.java``): true when the string
    equals a line of the file. Hive reads the file on the task node;
    the Spark-first shape loads the line set ONCE as a DataFrame and
    broadcast-joins it — no per-row IO, no driver loop, works at any
    corpus size (the FILE is small by construction; the corpus side
    never shuffles)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    lines = (
        spark.read.text(path)
        .select(F.col("value").alias("__line"))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    joined = df.join(
        F.broadcast(lines), df[col] == F.col("__line"), "left"
    )
    return joined.select(
        *df.columns, F.coalesce("__hit", F.lit(False)).alias(flag_name)
    )


# ---------------------------------------------------------------------------
# Hive hash() parity — ObjectInspectorUtils.hashCode
# ---------------------------------------------------------------------------
# Reference ``ql/.../udf/generic/GenericUDFHash.java`` folds
# ``serde2/objectinspector/ObjectInspectorUtils.hashCode`` per-type
# hashes with r = r*31 + h across arguments (same fold for structs).
# All arithmetic runs in unsigned mod-2^32 bigint space (overflow-free
# in both Spark and DuckDB), re-signed to int32 at the end.

_M32 = 4294967296  # 2^32


def _unsigned32(h: Column) -> Column:
    """Signed int32 value -> its unsigned mod-2^32 representative."""
    return ((h.cast("bigint") % _M32) + _M32) % _M32


def java_hash_int(col: Column) -> Column:
    """Java Integer.hashCode == identity (unsigned32 form)."""
    return _unsigned32(col.cast("int"))


def java_hash_long(col: Column) -> Column:
    """Java Long.hashCode == (int)(v ^ (v >>> 32)) (unsigned32)."""
    v = col.cast("bigint")
    return _unsigned32(
        v.bitwiseXOR(F.shiftrightunsigned(v, 32)).cast("int")
    )


def java_hash_bool(col: Column) -> Column:
    """Java Boolean.hashCode: true->1231, false->1237; NULL stays
    NULL (java_hash_fold turns it into 0, Hive's hashCode(null) —
    an otherwise() here would silently hash NULL as false+6)."""
    return (
        F.when(col.isNull(), F.lit(None).cast("bigint"))
        .when(col, F.lit(1231))
        .otherwise(F.lit(1237))
        .cast("bigint")
    )


def java_hash_string(col: Column) -> Column:
    """Java String.hashCode: h = h*31 + codeUNIT, mod-2^32 fold.

    Java folds UTF-16 CODE UNITS, not codepoints — a supplementary
    character ('𝄞', emoji) contributes its two surrogates. The
    column form therefore folds over the UTF-16BE byte pairs
    (encode → hex → 4-hex-digit units) rather than splitting into
    characters, matching the JDK for all of Unicode (pinned against
    Objects.hashCode via reflection in tests/test_scalars2.py)."""
    hx = F.hex(F.encode(col, "UTF-16BE"))
    n_units = (F.length(hx) / F.lit(4)).cast("int")
    units = F.when(
        n_units > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_units, F.lit(1))),
            lambda i: F.conv(
                F.substring(hx, (i - 1) * 4 + 1, 4), 16, 10
            ).cast("bigint"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.when(
        col.isNotNull(),
        F.aggregate(
            units,
            F.lit(0).cast("bigint"),
            lambda h, c: (h * F.lit(31) + c) % F.lit(_M32),
        ),
    )


def java_hash_fold(*hashes: Column) -> Column:
    """Multi-arg/struct fold r = r*31 + h_i (NULL hashes as 0, per
    ObjectInspectorUtils), returned SIGNED int32 as bigint."""
    r = F.lit(0).cast("bigint")
    for h in hashes:
        r = (r * F.lit(31) + F.coalesce(h, F.lit(0))) % F.lit(_M32)
    return resign32(r)


def resign32(h: Column) -> Column:
    """Unsigned mod-2^32 value -> signed int32 (as bigint)."""
    return (
        F.when(h >= F.lit(2147483648), h - F.lit(_M32)).otherwise(h)
    ).cast("bigint")


def java_hash_double(col: Column) -> Column:
    """Java Double.hashCode: bits = doubleToLongBits(v), then the
    long fold (int)(bits ^ (bits >>> 32)). IEEE-754 bit extraction
    has no built-in column form, so the bits come from the JDK
    itself via reflect (CallMethodViaReflection — JVM-side, no
    Python) — the same route Hive's own UDFs take to Double
    semantics. NaN canonicalization (all NaNs -> 0x7ff8...) matches
    Java because doubleToLongBits, not RawLongBits, is called."""
    bits = F.java_method(
        F.lit("java.lang.Double"),
        F.lit("doubleToLongBits"),
        col.cast("double"),
    ).cast("bigint")
    return _unsigned32(
        bits.bitwiseXOR(F.shiftrightunsigned(bits, 32)).cast("int")
    )
