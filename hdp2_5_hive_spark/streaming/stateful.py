"""Custom stateful streaming operator: session windows via
``applyInPandasWithState``.

The reference has no stateful stream operators at all (SURVEY §2.10)
— this is the Spark-native extension a modern pipeline needs: per-key
session aggregation with timeout-driven emission. State is sharded by
key across the cluster's state store; the processing-time timeout
closes idle sessions, bounding state exactly as a watermark bounds
windowed aggs.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = (
    "start_us long, end_us long, n long, s double"
)


def sessionize_stream(
    events: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Streaming sessionization: group events by user; a session
    closes after ``gap_ms`` of processing-time inactivity, emitting
    (user, start, end, n_events, sum_value).

    Input columns: user_id long, ts timestamp, value double.
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, end_us, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
            return
        start_us = end_us = None
        n, s = 0, 0.0
        if state.exists:
            start_us, end_us, n, s = state.get
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → us
            lo, hi = int(ts_us.min()), int(ts_us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            end_us = hi if end_us is None else max(end_us, hi)
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((start_us, end_us, n, s))
        state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(
            columns=[f.name for f in SESSION_SCHEMA.fields]
        ).astype(
            {
                "user_id": "int64",
                "n_events": "int64",
                "sum_value": "float64",
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def running_totals_stream(events, key_col: str = "user_id", value_col: str = "value"):
    """Arbitrary stateful processing on the modern Spark 4 API
    (``transformWithStateInPandas`` + ``StatefulProcessor`` — the
    successor to applyInPandasWithState): per-key running count/sum
    carried in a ValueState across micro-batches, emitted in Update
    mode each time the key sees data.

    Hive's streaming surface had no stateful operators at all
    (SURVEY §2.10 — ingest only); this is the engine extension that
    covers the continuous-aggregation half of the gap. State lives in
    the state store (RocksDB/HDFS-backed on a cluster) keyed by the
    shuffle partitioning, so 1000 executors each own their key range.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n BIGINT, s DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, s = 0, 0.0
            if self._state.exists():
                prev = self._state.get()
                n, s = int(prev[0]), float(prev[1])
            for pdf in rows:
                n += len(pdf)
                s += float(pdf[value_col].sum())
            self._state.update((n, s))
            yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [s]})

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


HH_SCHEMA = StructType(
    [
        StructField("tok", StringType()),
        StructField("count", LongType()),
    ]
)


def heavy_hitters_stream(tokens: DataFrame) -> DataFrame:
    """Streaming running token counts — the stateful heavy-hitter
    feed (top-k is a trivial ORDER BY over the sink's latest rows):
    per-token state is ONE long, updated per micro-batch and emitted
    in update mode whenever the token appears. State shards by token
    across the state store exactly like any keyed agg; memory is
    O(|vocabulary observed|) — cap upstream with the Count-Min
    sketch (operators/sketches.py) when the key space is unbounded.

    Input column: tok string."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"tok": [key[0]], "count": [n]})

    return tokens.groupBy("tok").applyInPandasWithState(
        fn,
        outputStructType=HH_SCHEMA,
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_SCHEMA = StructType(
    [
        StructField("grp", StringType()),
        StructField("tok", StringType()),
        StructField("c", LongType()),
        StructField("n_stream", LongType()),
    ]
)


def mg_heavy_hitters_stream(
    tokens: DataFrame, group_col: str = "grp", *, k: int = 8
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters — BOUNDED state where
    heavy_hitters_stream grows O(|vocabulary|): per group the state
    is AT MOST ``k`` (token, counter) pairs plus the stream length,
    updated each micro-batch with the same mergeable-summaries rule
    as the batch operator (operators/sketches.mg_summaries), so the
    contract carries across batches forever:

        true_count(x) - n_stream/(k+1)  <=  c(x)  <=  true_count(x)

    and every token with true count > n_stream/(k+1) is in state.
    This is the unbounded-key-space answer the CMS docstring points
    at, with deterministic counters instead of hashed cells. Emits
    the full summary per group per batch (update mode).

    Input columns: ``group_col`` string, ``tok`` string."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, cs, n = state.get
            counters = dict(zip(toks, cs))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            vc = pdf["tok"].dropna().value_counts()
            n += int(vc.sum())
            for t, c in vc.items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                m = vals[k]
                counters = {
                    t: c - m for t, c in counters.items() if c > m
                }
        state.update(
            (list(counters.keys()), list(counters.values()), n)
        )
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(counters),
                "tok": list(counters.keys()),
                "c": list(counters.values()),
                "n_stream": [n] * len(counters),
            }
        )

    return tokens.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=MG_SCHEMA,
        stateStructType="toks array<string>, cs array<long>, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
