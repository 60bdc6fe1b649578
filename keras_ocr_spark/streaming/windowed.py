"""Watermarked tumbling-window streaming aggregation.

The second streaming shape a transcript-ingest pipeline needs next to
stateful sessionization (``streaming/sessionize.py``): per-window
rollups with LATE-DATA discipline. ``withWatermark`` bounds state — a
window closes (and its state is freed) once event time passes
window_end + delay, and events arriving later than the watermark are
dropped rather than corrupting closed windows. Without a watermark a
windowed streaming agg keeps every window open forever — unbounded
state at 10^12-turn ingest.

Semantics (tested in tests/test_streaming.py):
- append mode emits each window exactly once, when the watermark passes
  it; an event later than the watermark is DROPPED (asserted with a
  two-micro-batch file feed);
- complete mode re-emits all windows every trigger and equals the batch
  ``groupBy(window(...))`` of the same input — the parity the driver
  oracle checks (``stream_windowed_counts``).

Scale shape: one shuffle on (window, event_type) — identical to the
batch agg; state per open window per key, bounded by the watermark
horizon, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .state import use_rocksdb_state


def windowed_event_counts(
    events: DataFrame,
    window_minutes: int = 60,
    watermark_minutes: int = 60,
    ts_col: str = "ts",
) -> DataFrame:
    """events (streaming or batch) -> per-(tumbling window, event_type)
    counts and value totals. On a streaming frame the watermark bounds
    state and defines late-data drop; on a batch frame the same plan
    degrades to a plain windowed groupBy (watermark is a no-op)."""
    src = events
    if events.isStreaming:
        use_rocksdb_state(events.sparkSession)
        src = events.withWatermark(ts_col, f"{watermark_minutes} minutes")
    return (
        src.groupBy(F.window(ts_col, f"{window_minutes} minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            # batch parquet reads ts as TIMESTAMP_NTZ; session tz is UTC
            # so the cast is exact and matches DuckDB's epoch_us
            F.unix_micros(F.col("window.start").cast("timestamp")).alias("window_start_us"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("total_value").cast("double").alias("total_value"),
        )
    )
