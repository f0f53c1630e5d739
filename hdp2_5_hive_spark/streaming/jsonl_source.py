"""Python streaming DataSource: incremental JSON-Lines corpus ingest.

Spark 4's ``SimpleDataSourceStreamReader`` surface over a growing
directory of .jsonl shards — the tail-the-corpus shape every
training-data pipeline runs between the crawler and the cleaning
job. Offsets are a {file: bytes_consumed} dict, so each micro-batch
reads exactly the bytes appended since the last one (per-file byte
ranges — restart-safe, replayable via readBetweenOffsets, no
rescan of already-ingested shards).

Register per session::

    spark.dataSource.register(JsonlStreamDataSource)
    stream = (spark.readStream.format("jsonl_stream")
              .option("path", d).load())

Scale notes: the offset dict is O(#files) driver state; record
parsing happens in ``read`` which Spark runs on the driver for
simple stream readers — the right trade for CONTROL-PLANE-sized
ingest ticks (the heavy lifting happens downstream in the
distributed plan). For bulk backfill, read the same directory with
``spark.read.json`` (fmt_jsonl_round_trip) instead.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


#: micro-batches a file's size must stay unchanged before a
#: newline-less tail is accepted as the (finished) final record —
#: see the staleness escape in ``read``.
TAIL_STABLE_BATCHES = 3


class JsonlStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_stream: option 'path' is required")
        # per-file (size, consecutive-batches-at-that-size) — driver
        # state for the newline-less-tail staleness escape; lost on
        # restart, which only delays a stable tail by N more batches
        self._tail_stable: dict[str, list[int]] = {}

    def _sizes(self) -> dict:
        return {
            f: os.path.getsize(f)
            for f in sorted(glob.glob(os.path.join(self.path, "*.jsonl")))
        }

    def initialOffset(self) -> dict:
        # start of stream: nothing consumed
        return {}

    def _read_range(self, start: dict, end: dict):
        for f, upto in sorted(end.items()):
            done = int(start.get(f, 0))
            if upto <= done:
                continue
            with open(f, "rb") as fh:
                fh.seek(done)
                chunk = fh.read(upto - done)
            # committed offsets are newline-aligned (see read()), so
            # only whole lines exist in a replayed range; a corrupt
            # line still surfaces as a loud json error, never silent
            # loss
            for line in chunk.splitlines():
                if not line.strip():
                    continue
                rec = json.loads(line)
                if not isinstance(rec, dict):
                    raise ValueError(
                        f"jsonl_stream: record is not an object: {line[:80]!r}"
                    )
                yield (rec.get("doc_id"), rec.get("text"))

    def read(self, start: dict):
        sizes = self._sizes()
        # carry files that vanished from disk forward unchanged so
        # their consumed offsets are never re-read as zero, and keep
        # offsets MONOTONIC for files that shrank (truncate/rewrite):
        # rewinding the committed offset to the new smaller size would
        # re-ingest bytes as duplicates (or torn garbage) once the
        # file grows again — breaking exactly-once (ADVICE r6).
        end: dict = {}
        for f, off in start.items():
            end[f] = max(int(sizes.pop(f, 0)), int(off))
        end.update(sizes)
        # Clamp each file's end offset to its last NEWLINE in the new
        # range: stat can catch a writer MID-APPEND, and committing a
        # mid-line offset poisoned the stream permanently — this batch
        # crashed on the torn head, and every replay re-read the same
        # torn bytes (the tail half would parse as garbage forever).
        # Leaving the partial tail for the next batch keeps offsets
        # newline-aligned and the stream exactly-once under in-flight
        # appends.
        #
        # Staleness escape (ADVICE r12): a finished file whose FINAL
        # record lacks a trailing newline would be withheld forever by
        # the clamp. Once a file's size has been UNCHANGED for
        # TAIL_STABLE_BATCHES consecutive batches, accept the
        # newline-less tail as the last record — the writer is done.
        # If that tail is genuinely torn (writer crashed mid-record)
        # it surfaces as a loud json error, never silent loss; a
        # writer that pauses mid-line longer than the window and then
        # resumes is indistinguishable from done and also fails loud.
        for f in list(end):
            size_now = int(end[f])
            prev = self._tail_stable.get(f)
            if prev is not None and prev[0] == size_now:
                prev[1] += 1
            else:
                self._tail_stable[f] = [size_now, 0]
        for f in set(self._tail_stable) - set(end):
            del self._tail_stable[f]
        for f in list(end):
            done = int(start.get(f, 0))
            upto = int(end[f])
            if upto <= done or not os.path.exists(f):
                continue
            with open(f, "rb") as fh:
                fh.seek(done)
                chunk = fh.read(upto - done)
            if chunk.endswith(b"\n"):
                continue
            if self._tail_stable[f][1] >= TAIL_STABLE_BATCHES:
                continue  # stable file: accept the newline-less tail
            cut = chunk.rfind(b"\n")
            end[f] = done if cut < 0 else done + cut + 1
        # materialized: Spark's prefetch cache copy.copy()s the
        # iterator, which a lazy generator cannot survive
        return iter(list(self._read_range(start, end))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path after restart: deterministic re-read
        return iter(list(self._read_range(start, end)))


class JsonlStreamDataSource(DataSource):
    """``spark.readStream.format("jsonl_stream")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_stream"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema):
        return JsonlStreamReader(self.options)
