"""Embedding quantization: symmetric per-vector int8 with
reconstruction-quality metrics.

The storage/IO optimization every 100 TB embedding corpus runs
before ANN indexing (4× smaller than float32, 8× than float64;
FAISS's ScalarQuantizer QT_8bit shape). Everything is JVM-side array
expressions — ``transform``/``zip_with``/``aggregate`` — inside
whole-stage codegen; no Python in the path. The sequential left-fold
dot products keep float math bit-identical to the DuckDB oracle's
``list_reduce`` (same discipline as operators/similarity.dot_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_col


def quantize_int8_stats(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization round-trip report:
    scale = max|x|/127 (zero-vector guarded), q = round(x/scale),
    dequantized error and cosine(original, dequantized).

    Map-only — one projection, no shuffle; the quantized array and
    its metrics derive from each row alone. Output columns are the
    audit a pipeline gates on before swapping the float column out.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    d = (
        df.select(F.col(id_col), v.alias("_v"))
        .withColumn(
            "_scale",
            F.greatest(
                F.array_max(F.transform(F.col("_v"), F.abs)) / F.lit(127.0),
                F.lit(1e-30),
            ),
        )
        .withColumn(
            "_q",
            F.transform(
                F.col("_v"),
                lambda x: F.round(x / F.col("_scale"), 0).cast("int"),
            ),
        )
        .withColumn(
            "_dq",
            F.transform(
                F.col("_q"), lambda q: q.cast("double") * F.col("_scale")
            ),
        )
    )
    return d.select(
        id_col,
        F.round(F.col("_scale"), 8).alias("scale"),
        F.size(
            F.filter(F.col("_q"), lambda q: F.abs(q) == 127)
        ).alias("n_saturated"),
        F.round(
            F.array_max(
                F.zip_with(
                    F.col("_v"), F.col("_dq"), lambda a, b: F.abs(a - b)
                )
            ),
            8,
        ).alias("max_abs_err"),
        F.round(cosine_col(F.col("_v"), F.col("_dq")), 8).alias("cos_dequant"),
    )
