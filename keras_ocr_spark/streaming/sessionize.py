"""Custom stateful streaming operator: event sessionization with
``applyInPandasWithState``.

The batch engine sessionizes with a lag + running-sum window (the 1-D
connected-components recast, ``driver_queries.q_runlength_segments``).
A continuous ingest needs the same grouping as a STATEFUL streaming
operator: per user, events within ``gap`` of the previous event extend
the open session; a larger gap CLOSES it (emitted downstream) and opens
a new one. Open sessions live in the state store across micro-batches
and flush on processing-time timeout.

Semantics contract (tested stream≡batch in tests/test_streaming.py):
the emitted closed sessions equal the batch sessionization of the same
events minus each user's final (still-open) session.

Scale shape: state is one tiny tuple per user (start, end, n, sum) —
bounded by |users|, not |events|; the shuffle is the same hash exchange
on user_id the batch groupBy pays. Late data within a micro-batch is
handled by sorting the batch; cross-batch late arrivals reopen at the
stream level exactly as the reference's resumable-batch design would
(SURVEY §2.9 — the north rule is batch-with-resume; this operator is
the bonus streaming variant).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .state import use_rocksdb_state

SESSION_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, total_value double"
)
STATE_SCHEMA = "session_start_us bigint, session_end_us bigint, n bigint, v double"

_COLS = ["user_id", "session_start_us", "session_end_us", "n_events", "total_value"]


def _sessionize_fn(gap_us: int, timeout_ms: int):
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n, v = state.get
                closed.append((user_id, s, e, n, v))
            state.remove()
        else:
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values("ts_us")  # in-batch late data
            if state.exists:
                s, e, n, v = state.get
            else:
                s = e = None
                n, v = 0, 0.0
            for ts, val in zip(batch["ts_us"], batch["value"]):
                ts = int(ts)
                if s is None:
                    s, e, n, v = ts, ts, 1, float(val)
                elif ts - e > gap_us:
                    closed.append((user_id, s, e, n, v))
                    s, e, n, v = ts, ts, 1, float(val)
                else:
                    e, n, v = ts, n + 1, v + float(val)
            if s is not None:
                state.update((int(s), int(e), int(n), float(v)))
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(closed, columns=_COLS)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Streaming events (user_id, ts, value) -> closed-session rows.

    One stateful exchange on user_id; emits a session the moment a gap
    closes it, or when the user goes quiet for ``timeout_ms`` of
    processing time (the state-store flush).
    """
    if events.isStreaming:
        use_rocksdb_state(events.sparkSession)
    slim = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )
    return slim.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_minutes * 60_000_000, timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """The batch twin (lag + running-sum window) — same output shape,
    ALL sessions including each user's final open one. The stream≡batch
    test drops the per-user last session before comparing."""
    from pyspark.sql import Window as W

    gap_us = gap_minutes * 60_000_000
    slim = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )
    w = W.partitionBy("user_id").orderBy("ts_us")
    seg = F.sum(
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us) | F.lag("ts_us").over(w).isNull(), 1
        ).otherwise(0)
    ).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        slim.withColumn("seg", seg)
        .groupBy("user_id", "seg")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id", "session_start_us", "session_end_us",
            F.col("n_events").cast("long").alias("n_events"), "total_value",
        )
    )
