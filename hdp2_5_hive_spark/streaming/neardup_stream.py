"""Streaming near-duplicate filtering — the incremental MinHash/LSH
twin of the batch ``dedup.near_duplicates`` path.

``corpus_ingest_stream`` (ingest.py) dedups EXACT fingerprints with
bounded watermark state; this module handles the near-dup tier, which
cannot live in a streaming state store (the LSH index is corpus-sized
and must persist across runs). The standard production shape is a
``foreachBatch`` sink owning a persisted index:

  per micro-batch:
    1. read the corpus index (shingles + banded buckets, parquet);
    2. ``dedup.near_duplicates_against`` — only the BATCH is
       shingled/hashed; candidates come from band-bucket equality
       joins against the index (never batch × corpus);
    3. drop every batch doc that near-duplicates an indexed doc or a
       lower-id doc of the same batch (keep-first transitivity — the
       same greedy semantics as the batch LSH dedup);
    4. append survivors to the output AND their shingles/buckets to
       the index, both partitioned by ``batch_id`` with dynamic
       partition overwrite, so micro-batch REPLAY (the at-least-once
       window of foreachBatch) overwrites its own partition instead
       of duplicating — the same exactly-once recipe as
       ``idempotent_batch_sink``.

Replay is also CORRECT, not just idempotent: a half-written index
partition from a crashed attempt contains the replayed batch's own
ids, and ``near_duplicates_against`` anti-joins batch ids out of the
index before matching (its re-ingest replacement contract), so a doc
never suppresses itself.

Hive-side anchor: this is the missing near-dup analogue of Hive
streaming ingest's TransactionBatch commit/abort
(hcatalog/streaming/.../TransactionBatch.java) — arrival-order
semantics, durable index, replay safety.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import minhash_index, near_duplicates_against

_SHINGLE_SCHEMA = "_id long, _sh array<string>, batch_id long"
_BUCKET_SCHEMA = "_id long, band int, bucket long, batch_id long"


def _read_or_empty(spark, path: str, schema: str) -> DataFrame:
    if os.path.isdir(path) and any(
        f.endswith(".parquet") or f.startswith("batch_id=")
        for f in os.listdir(path)
    ):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def neardup_ingest_sink(
    out_dir: str,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    shingle_k: int = 3,
):
    """Returns the ``foreachBatch`` callable. ``index_dir`` gains
    ``shingles/`` and ``buckets/`` subdirs; ``out_dir`` receives the
    surviving (id, text) rows, all batch_id-partitioned."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from .ingest import assert_batch_id_monotonic

        # fresh/stale-checkpoint guard across ALL three sink dirs: a
        # crash can leave them at different max batch ids, and a
        # restarted-with-wrong-checkpoint run must not interleave
        # with any of them
        assert_batch_id_monotonic(
            batch_id,
            out_dir,
            os.path.join(index_dir, "shingles"),
            os.path.join(index_dir, "buckets"),
        )
        spark = batch_df.sparkSession
        batch = batch_df.select(
            F.col(id_col), F.col(text_col)
        ).localCheckpoint()  # the source may not be re-readable

        idx_sh = _read_or_empty(
            spark, os.path.join(index_dir, "shingles"), _SHINGLE_SCHEMA
        ).drop("batch_id")
        idx_bk = _read_or_empty(
            spark, os.path.join(index_dir, "buckets"), _BUCKET_SCHEMA
        ).drop("batch_id")

        pairs = near_duplicates_against(
            idx_sh,
            idx_bk,
            batch,
            id_col,
            text_col,
            threshold=threshold,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
            shingle_k=shingle_k,
        )
        # greedy keep-first: any doc matching the index or a
        # lower-id batch doc drops (id_new is always the batch side;
        # batch-batch pairs always have id_old < id_new)
        dropped = pairs.select(F.col("id_new").alias(id_col)).distinct()
        # materialize BEFORE writing: the index partitions about to be
        # overwritten are part of this lineage — a lazy plan would
        # re-read them mid-overwrite (FAILED_READ_FILE)
        kept = batch.join(dropped, id_col, "left_anti").localCheckpoint()

        k_sh, k_bk = minhash_index(
            kept,
            id_col,
            text_col,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
            shingle_k=shingle_k,
        )

        # per-writer option, not a session-conf set/restore: two
        # concurrent streaming queries interleave foreachBatch calls
        # on different driver threads (same hazard class as
        # ingest.idempotent_batch_sink)
        for df, sub in (
            (kept, None),
            (k_sh, "shingles"),
            (k_bk, "buckets"),
        ):
            path = out_dir if sub is None else os.path.join(
                index_dir, sub
            )
            (
                df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(path)
            )
            # a replayed overwrite deletes part files the session's
            # FileStatusCache may still list — refresh so same-
            # session readers (and the next micro-batch's index
            # read) never chase deleted files
            spark.catalog.refreshByPath(path)

    return sink


def run_neardup_ingest(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint: str,
    **kwargs,
) -> None:
    """Drain all available input through the near-dup sink
    (Trigger.AvailableNow), then stop."""
    q = (
        stream.writeStream.foreachBatch(
            neardup_ingest_sink(out_dir, index_dir, **kwargs)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
