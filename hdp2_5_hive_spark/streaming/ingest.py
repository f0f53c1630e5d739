"""Streaming ingest + stream-query surface.

Reference (SURVEY §2.10): Hive 1.2 has NO stream-query engine — its
streaming surface is the transactional ingest API
(``hcatalog/streaming/.../HiveEndPoint.java:62``:
``newConnection`` → ``TransactionBatchImpl:555`` with
``beginNextTransaction/write/commit/abort`` + heartbeats) appending
micro-batches to ACID tables so concurrent readers see only committed
data; record writers ``DelimitedInputWriter.java:50`` and
``StrictJsonWriter.java:41`` parse byte payloads.

Spark-first mapping:
- ``TransactionBatch`` → an atomic micro-batch append: rows buffer
  client-side, ``commit()`` lands them as one parquet append job.
  Parquet file appends are all-or-nothing per task commit, giving the
  same readers-see-committed-only contract.
- ``DelimitedInputWriter``/``StrictJsonWriter`` → ``from_csv`` /
  ``from_json`` projections.
- The *query* side (beyond the reference, Spark-native): file-source
  ``readStream`` with watermarked tumbling/sliding windows, and
  exactly-once sinks via checkpointed ``writeStream``.

Scale: the ingest path is append-only partitioned parquet — at
1000 executors each commit is one distributed write job; the query
side shards state by group key in the state store, with watermarks
bounding state size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# ---------------------------------------------------------------------------
# Transactional ingest facade (HiveEndPoint analogue)
# ---------------------------------------------------------------------------


def _coerce(value: str, simple_type: str):
    """Delimited-text field → schema type (LazySimpleSerDe projection;
    Hive semantics: unparseable → NULL, never error)."""
    try:
        if simple_type in ("tinyint", "smallint", "int", "bigint"):
            return int(value)
        if simple_type in ("float", "double") or simple_type.startswith("decimal"):
            return float(value)
        if simple_type == "boolean":
            v = value.strip().lower()
            # Hive LazySimpleSerDe: only the literals parse; anything
            # else is NULL (the docstring's unparseable->NULL rule —
            # a bare == 'true' silently turned garbage into False)
            return {"true": True, "false": False}.get(v)
        return value
    except (ValueError, AttributeError):
        return None


@dataclass
class TransactionBatch:
    """One open transaction batch (TransactionBatchImpl:555 analogue).

    ``write`` buffers rows; ``commit`` lands them atomically as a
    single append job; ``abort`` discards. A batch can carry many
    logical transactions — matching Hive's N-txns-per-batch model —
    but each commit is one atomic append."""

    endpoint: "StreamingEndpoint"
    _rows: list[tuple] = field(default_factory=list)
    _open: bool = True

    def write(self, row: dict) -> None:
        if not self._open:
            raise RuntimeError("batch closed")
        fields = [f.name for f in self.endpoint.schema.fields]
        unknown = set(row) - set(fields)
        if unknown:
            raise ValueError(f"unknown fields {sorted(unknown)}")
        # normalize to SCHEMA ORDER: createDataFrame(schema=...) maps
        # kwarg-Rows positionally, so a dict whose key order differs
        # from the schema silently column-swapped (or failed at
        # commit once types diverged). Missing keys become NULL, like
        # write_json.
        self._rows.append(tuple(row.get(n) for n in fields))

    def write_delimited(self, line: str, sep: str = ",") -> None:
        """DelimitedInputWriter.java:50 analogue: positional parse
        against the endpoint schema."""
        parts = line.split(sep)
        fields = self.endpoint.schema.fields
        if len(parts) != len(fields):
            raise ValueError(f"expected {len(fields)} fields, got {len(parts)}")
        self.write(
            {
                f.name: _coerce(v, f.dataType.simpleString())
                for f, v in zip(fields, parts)
            }
        )

    def write_json(self, doc: str) -> None:
        """StrictJsonWriter.java:41 analogue: strict JSON→schema."""
        import json

        obj = json.loads(doc)
        names = {f.name for f in self.endpoint.schema.fields}
        unknown = set(obj) - names
        if unknown:
            raise ValueError(f"unknown fields {sorted(unknown)}")
        self.write({n: obj.get(n) for n in (f.name for f in self.endpoint.schema.fields)})

    def commit(self) -> None:
        if not self._open:
            raise RuntimeError("batch closed")
        if self._rows:
            # land the append BEFORE closing the batch: a failed write
            # job used to leave the batch closed with its rows
            # stranded in the buffer — the caller's retry raised
            # "batch closed" and the data was silently lost. Hive's
            # TransactionBatchImpl keeps the txn abortable/retryable
            # on write failure (TransactionBatchImpl.java:555); so do
            # we — on failure the batch stays open, rows intact, and
            # the caller may commit() again or abort().
            spark = self.endpoint.spark
            df = spark.createDataFrame(
                self._rows, schema=self.endpoint.schema
            )
            df.write.mode("append").parquet(self.endpoint.path)
        self._open = False
        self._rows.clear()

    def abort(self) -> None:
        self._open = False
        self._rows.clear()


@dataclass
class StreamingEndpoint:
    """HiveEndPoint.java:62 analogue: (path, schema) ingest target.
    ``new_batch()`` ≈ ``newConnection().fetchTransactionBatch()``."""

    spark: SparkSession
    path: str
    schema: StructType

    def new_batch(self) -> TransactionBatch:
        return TransactionBatch(self)

    def read_committed(self) -> DataFrame:
        """Readers see exactly the committed appends (ACID snapshot
        analogue — parquet appends are atomic per job)."""
        return self.spark.read.schema(self.schema).parquet(self.path)


# ---------------------------------------------------------------------------
# Stream-query surface (Spark-native, beyond the reference)
# ---------------------------------------------------------------------------


def read_event_stream(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """File-source stream over an append directory — the read side of
    the ingest contract (new files = newly committed batches)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per key. Watermark
    bounds state: groups older than max(event_time) - watermark are
    finalized and evicted — this is what keeps unbounded streams
    bounded-memory at any scale."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def run_to_completion(stream_df: DataFrame, checkpoint: str, out_path: str) -> None:
    """Drain all available input (Trigger.AvailableNow) into an
    exactly-once parquet sink, then stop — micro-batch commit
    semantics, checkpointed for restart."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def assert_batch_id_monotonic(batch_id: int, *paths: str) -> None:
    """Stale/fresh-checkpoint guard for batch_id-partitioned
    foreachBatch sinks (defect hunt r13): Spark replays AT MOST the
    single last uncommitted batch, so a legitimate batch_id is always
    >= the highest batch_id partition already on disk. A LOWER id
    means the query restarted against a fresh (or restored-stale)
    checkpoint while the output directories survived — the new run's
    ids restart at 0 and dynamic partition overwrite would silently
    interleave two unrelated runs (some old partitions replaced, the
    rest left as duplicates). Fail loudly instead; the operator must
    either restore the matching checkpoint or point the sink at clean
    directories."""
    import os

    seen = -1
    for p in paths:
        if not os.path.isdir(p):
            continue
        for name in os.listdir(p):
            if name.startswith("batch_id="):
                try:
                    seen = max(seen, int(name.split("=", 1)[1]))
                except ValueError:
                    continue
    if batch_id < seen:
        raise ValueError(
            f"foreachBatch got batch_id={batch_id} but the sink "
            f"directories already hold batch_id={seen}: the stream "
            "restarted with a fresh or stale checkpoint over an "
            "existing output — restore the matching checkpoint or "
            "start from clean sink directories"
        )


def idempotent_batch_sink(out_path: str):
    """foreachBatch sink that stays exactly-once under micro-batch
    REPLAY: each batch lands in its own ``batch_id=N`` partition with
    dynamic partition overwrite, so re-delivery of a batch (restart
    between sink write and checkpoint commit — the at-least-once
    window of foreachBatch) overwrites its own partition instead of
    appending duplicates. This is the standard Spark recipe for
    exactly-once into non-transactional stores; Hive streaming got
    the same guarantee from TransactionBatch commit/abort
    (hcatalog/streaming/.../TransactionBatch.java).

    Returns the (batch_df, batch_id) callable for
    ``writeStream.foreachBatch``.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        assert_batch_id_monotonic(batch_id, out_path)
        # per-writer option, NOT a session-conf set/restore: two
        # concurrent streaming queries sharing the session interleave
        # their foreachBatch calls on different driver threads, and
        # the temporary session-wide 'dynamic' leaked into whatever
        # write ran concurrently (the same hazard class as the acid
        # _full_rewrite fix — the writer option always wins).
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return sink


def corpus_ingest_stream(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 3,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming corpus cleaning — the incremental twin of the batch
    corpus_clean pipeline (SURVEY §6): quality gate (minimum token
    count) → canonical fingerprint (md5 of whitespace-normalized
    lowercase text, the same fingerprint text_profile computes) →
    watermarked streaming dedup on the fingerprint via
    ``dropDuplicatesWithinWatermark`` — the variant whose state store
    IS evicted by the watermark even though the event-time column is
    not part of the dedup key (plain ``dropDuplicates([fingerprint])``
    would keep every fingerprint forever: Spark only expires state
    for keys containing the watermarked column). State is bounded by
    the horizon; re-ingests beyond it are a batch dedup's job
    downstream.

    Every stage is stream-safe (stateless projections + one
    dropDuplicates state store); output appends (id, fingerprint,
    n_tok, ts) rows ready for a parquet sink."""
    from ..operators.textstats import token_count

    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(id_col),
            F.col(ts_col),
            token_count(F.col(text_col)).alias("n_tok"),
            fp.alias("fingerprint"),
        )
        .filter(F.col("n_tok") >= min_tokens)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
