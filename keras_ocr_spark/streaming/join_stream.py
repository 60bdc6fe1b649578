"""Watermarked stream-stream join — the fourth streaming shape
(after sessionization, windowed aggs, dedup): correlating two live
event streams, here click→purchase attribution.

Spark buffers BOTH sides' rows in state until the event-time range
condition can no longer match them; the watermarks + the range bound
are what make that state finite — without them a stream-stream join
buffers both streams forever. State horizon per side =
watermark delay + join window.

Inner-join semantics are exactly-the-matched-pairs regardless of
arrival interleaving (each pair emits once, when both sides have
arrived), which is why the driver oracle can be the plain batch range
join. Outer stream-stream joins additionally emit nulls only after
watermark expiry — a different contract, documented here and not used
by the oracle query.

Scale shape: co-shuffled on the join key (user) like the batch join;
state bounded by events-per-horizon per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .state import use_rocksdb_state


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 30,
    watermark_minutes: int = 60,
) -> DataFrame:
    """click→purchase pairs for the same user with the purchase inside
    ``window_minutes`` after the click. On streaming frames both sides
    carry watermarks (bounded join state); on batch frames the same
    plan is a plain equi+range join (watermark is a no-op)."""
    if clicks.isStreaming or purchases.isStreaming:
        use_rocksdb_state(clicks.sparkSession)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", f"{watermark_minutes} minutes")
        p = p.withWatermark("p_ts", f"{watermark_minutes} minutes")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    out = c.join(p, cond, "inner")
    return out.select(
        F.col("c_user").alias("user_id"),
        "click_event_id",
        "purchase_event_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )
