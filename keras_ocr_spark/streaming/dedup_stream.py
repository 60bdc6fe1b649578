"""Streaming deduplication with watermark-bounded state.

The third streaming shape a 10^12-turn ingest needs next to
sessionization and windowed rollups: EXACTLY-ONCE key emission over an
endless stream. At-least-once sources (Kafka replays, file re-lists,
upstream retries) deliver duplicates; the batch answer (groupBy /
dropDuplicates over the corpus) is unavailable mid-stream, and a naive
streaming ``dropDuplicates`` keeps one state row per key FOREVER —
unbounded state.

``dropDuplicatesWithinWatermark`` is the bounded form: a key's state
lives until the event-time watermark passes its first-seen time +
delay, so duplicates arriving within the horizon are dropped and state
is freed after it. The contract this module pins in tests:

- a duplicate of a key arriving while the key's state is live is
  DROPPED (never re-emitted), regardless of its own event time;
- once the watermark passes and the state is evicted, a fresh arrival
  of the same key IS re-emitted — deduplication is exact only within
  the horizon (the standard replay-window guarantee: size the delay to
  the source's maximum replay distance).

Scale shape: one shuffle on the dedup keys (same as batch distinct);
state bounded by keys-per-horizon, not stream length.

Reference analog: the in-pipeline de-dup set semantics of
``/root/reference/keras_ocr/detection.py:432-438`` (seen-box pruning
while scanning), made durable across an unbounded scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .state import use_rocksdb_state


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "60 minutes",
) -> DataFrame:
    """First occurrence per ``keys`` within the watermark horizon.

    On a streaming frame: ``withWatermark`` + ``dropDuplicatesWithinWatermark``
    (bounded state, replay-window guarantee above). On a batch frame the
    same call degrades to plain ``dropDuplicates(keys)`` — Spark rejects
    the WithinWatermark form outside streaming, and the batch semantics
    (global first-occurrence) are the horizon→∞ limit.
    """
    cols = list(keys)
    if stream.isStreaming:
        use_rocksdb_state(stream.sparkSession)
        return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)
    return stream.dropDuplicates(cols)


def distinct_key_counts(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Deterministic projection of a dedup stream: the surviving key set
    (one row per distinct key tuple) — invariant to arrival order, which
    is what a cross-engine value check can pin."""
    return df.select(*[F.col(k) for k in keys]).distinct()
