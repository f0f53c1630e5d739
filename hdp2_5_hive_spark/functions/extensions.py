"""User-extension surface: UDF / UDAF / UDTF / PTF / TRANSFORM.

Reference (SURVEY §2.12):
- legacy ``UDF`` + ``GenericUDF`` (``ql/.../exec/UDF.java``,
  ``udf/generic/GenericUDF.java:66``) → ``F.udf`` (slow path) and
  ``pandas_udf`` (Arrow-vectorized — the default choice).
- ``GenericUDAFEvaluator`` partial/final lifecycle
  (``udf/generic/GenericUDAFEvaluator.java:44,63-80``) →
  ``pandas_udf`` GROUPED_AGG; Spark handles partial/final.
- ``GenericUDTF`` (``udf/generic/GenericUDTF.java:37``) →
  ``mapInPandas`` (0..n output rows per input row).
- PTF plug-ins (``udf/ptf/TableFunctionResolver.java``) →
  ``groupBy().applyInPandas`` (whole-partition function).
- ``TRANSFORM ... USING 'cmd'`` (``exec/ScriptOperator.java:64``) →
  Spark SQL ``TRANSFORM`` (native since 3.0, no Hive needed).

Scale: every pandas path here transfers Arrow record batches, not
rows; per-group functions assume a group fits in one worker's memory
(same contract as Hive's PTFPartition spill threshold — callers must
pick group keys with bounded cardinality per key).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

# ---------------------------------------------------------------------------
# scalar UDFs
# ---------------------------------------------------------------------------


@F.udf(returnType=StringType())
def py_priority_bucket(priority: str) -> str | None:
    """Row-at-a-time Python UDF (legacy ``UDF.java`` analogue).
    Documented slow path — exists to prove the surface, not for hot
    loops."""
    if priority is None:
        return None
    n = priority.split("-")[0]
    return "urgent" if n in ("1", "2") else "normal"


@F.pandas_udf(DoubleType())
def pd_charge(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Arrow-vectorized scalar UDF (GenericUDF analogue, the fast
    Python path): l_extendedprice*(1-l_discount)*(1+l_tax)."""
    return extended * (1.0 - discount) * (1.0 + tax)


@F.pandas_udf(DoubleType())
def pd_weighted_avg(value: pd.Series, weight: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF (GenericUDAFEvaluator analogue):
    weight-averaged value. Spark runs it per group after a hash
    shuffle — the iterate/merge/terminate lifecycle is implicit."""
    w = weight.sum()
    return float((value * weight).sum() / w) if w else float("nan")


# ---------------------------------------------------------------------------
# PTF: applyInPandas per-group table function
# ---------------------------------------------------------------------------


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """PTF-style whole-partition function: z-normalize ``value_col``
    within each group (udf/ptf/TableFunctionResolver analogue via
    ``applyInPandas``). Population stddev; groups with a single row
    or zero variance get zscore 0."""
    from pyspark.sql.types import StructField, StructType

    # Copy — StructType.add mutates in place, and df.schema is the
    # DataFrame's cached schema object.
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=0)
        pdf[out_col] = 0.0 if (not sd or sd != sd) else (v - v.mean()) / sd
        return pdf

    return df.groupBy(group_col).applyInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# UDTF: mapInPandas generator
# ---------------------------------------------------------------------------


def explode_words_udtf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """GenericUDTF analogue over ``mapInPandas``: emit one row per
    whitespace token (0..n output rows per input row — the
    ``process/forward`` contract of GenericUDTF.java:37). Arrow
    batches in and out; never row-at-a-time."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("pos", LongType()),
            StructField("word", StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            # NULL text explodes to 0 rows (Hive UDTF semantics) —
            # str.split() yields NaN for nulls, and repeat(NaN) /
            # iterating a float crashed the whole task
            words = (
                pdf[text_col]
                .str.lower()
                .str.split()
                .apply(lambda ws: ws if isinstance(ws, list) else [])
            )
            exploded = pd.DataFrame(
                {
                    id_col: pdf[id_col].repeat(words.str.len()),
                    "word": [w for ws in words for w in ws],
                }
            )
            exploded["pos"] = exploded.groupby(id_col).cumcount()
            yield exploded[[id_col, "pos", "word"]]

    return df.select(id_col, text_col).mapInPandas(gen, schema=out_schema)


# ---------------------------------------------------------------------------
# TRANSFORM ... USING 'script'
# ---------------------------------------------------------------------------


def transform_using(
    df: DataFrame,
    view_name: str,
    select_cols: str,
    script: str,
    as_schema: str,
) -> DataFrame:
    """Hive ``TRANSFORM (cols) USING 'cmd' AS (schema)`` —
    ScriptOperator.java:64. Spark executes the script per partition,
    feeding tab-separated rows on stdin and parsing stdout. The
    script is a row-stream mapper exactly as in Hive.

    The command is embedded as a SQL single-quoted literal (the
    grammar offers no placeholder for it), so embedded ``'`` are
    escaped by doubling — same rule as any SQL string literal."""
    df.createOrReplaceTempView(view_name)
    quoted = script.replace("'", "''")
    return df.sparkSession.sql(
        f"SELECT TRANSFORM ({select_cols}) USING '{quoted}' "
        f"AS ({as_schema}) FROM {view_name}"
    )


def ngram_udtf_class():
    """Spark 4 native Python UDTF (the modern GenericUDTF analogue —
    reference ``ql/.../udf/generic/GenericUDTF.java:39``): a class
    with ``eval`` yielding 0..N rows per input row, registered via
    ``spark.udtf.register`` and callable from SQL as a table
    function. Arrow-optimized when
    spark.sql.execution.pythonUDTF.arrow.enabled is set."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="gram: string, pos: int")
    class NgramUDTF:
        def eval(self, text: str, n: int):  # noqa: D102
            if text is None or n is None or n < 1:
                return
            toks = text.lower().split()
            for i in range(len(toks) - n + 1):
                yield " ".join(toks[i : i + n]), i

    return NgramUDTF


def transform_typedbytes(
    df: DataFrame,
    argv: list[str],
    out_schema: str,
    *,
    n_out: int | None = None,
) -> DataFrame:
    """Hive's BINARY ScriptOperator path: ``TRANSFORM ... USING 'cmd'
    RECORDWRITER TypedBytesRecordWriter RECORDREADER
    TypedBytesRecordReader`` (reference ``contrib/.../serde2/
    TypedBytesSerDe.java`` + ``util/typedbytes/``) — rows stream to
    the script's stdin as self-describing typedbytes values and its
    stdout streams typedbytes rows back. Spark's native TRANSFORM is
    tab-separated text only, so the binary contract runs as a
    mapInArrow kernel: one subprocess per partition, a writer thread
    feeding stdin (genuinely streaming — no deadlock on large
    partitions, no partition buffered on the write side), stdout
    decoded by column count. ``argv`` is exec'd directly (no shell).
    """
    import subprocess
    import threading

    from ..sources import typedbytes_py as tb

    parsed = [f.split() for f in out_schema.split(",")]
    out_fields = [p[0] for p in parsed]
    out_types = [p[1].lower() for p in parsed]
    k = n_out if n_out is not None else len(out_fields)

    def kernel(batches):
        import pyarrow as pa

        _ARROW = {
            "boolean": pa.bool_(),
            "tinyint": pa.int8(),
            "smallint": pa.int16(),
            "int": pa.int32(),
            "bigint": pa.int64(),
            "long": pa.int64(),
            "float": pa.float32(),
            "double": pa.float64(),
            "string": pa.string(),
            "binary": pa.binary(),
        }
        arrow_schema = pa.schema(
            [
                pa.field(n, _ARROW[t])
                for n, t in zip(out_fields, out_types)
            ]
        )

        proc = subprocess.Popen(
            argv, stdin=subprocess.PIPE, stdout=subprocess.PIPE
        )

        feed_err: list[BaseException] = []

        def feed():
            try:
                for batch in batches:
                    cols = [
                        batch.column(i).to_pylist()
                        for i in range(batch.num_columns)
                    ]
                    for row in zip(*cols):
                        proc.stdin.write(tb.encode_row(list(row)))
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                feed_err.append(exc)
            finally:
                proc.stdin.close()

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        out = proc.stdout.read()
        t.join()
        rc = proc.wait()
        if rc != 0:
            # ADVICE r11: check the exit code FIRST — a script that
            # crashes without draining stdin also kills the feed
            # thread with BrokenPipeError, and reporting that masks
            # the real root cause (the non-zero exit).
            note = (
                f" (feed thread also died: {feed_err[0]!r})"
                if feed_err
                else ""
            )
            raise RuntimeError(f"typedbytes script exited {rc}{note}")
        if feed_err:
            # a script that exits 0 WITHOUT consuming all stdin (or an
            # encode error mid-stream) kills the feed thread with
            # BrokenPipeError; swallowing it would yield a silently
            # TRUNCATED result with rc == 0 — Hive's ScriptOperator
            # (hive.exec.script.allow.partial.consumption=false) fails
            # the query instead, and so do we
            raise RuntimeError(
                "typedbytes script did not consume its full input "
                f"(feed thread died: {feed_err[0]!r})"
            ) from feed_err[0]
        rows = list(tb.decode_stream(out, k))
        yield pa.RecordBatch.from_pydict(
            {
                name: [r[i] for r in rows]
                for i, name in enumerate(out_fields)
            },
            schema=arrow_schema,
        )

    return df.mapInArrow(kernel, out_schema)
