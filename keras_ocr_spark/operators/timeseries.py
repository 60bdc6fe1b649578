"""Time-series primitives: dense resampling with forward fill, and
sweep-line interval concurrency.

Two operations every event/transcript pipeline eventually needs and
neither Spark nor the reference exposes directly:

- **resample + forward fill** — turn an irregular per-key event stream
  into a dense per-day series (``sequence`` + ``explode`` spine, left
  join, ``last(..., ignorenulls=True)`` carry-forward). The spine is
  generated from each key's OBSERVED span, so the fan-out is bounded by
  data, never by a global calendar; at 100 TB every shuffle is keyed by
  the series key (user), whose per-key row count is bounded — the
  classic safe-skew shape. This is the scale-out alternative to the
  range self-join ("latest value at or before t") that quadratically
  explodes on dense keys.

- **sweep-line max concurrency** — peak number of simultaneously open
  intervals per group. The textbook plan is one running sum of +1/−1
  deltas per group, which serializes each group into ONE window task
  (the token_budget_mix skew problem — a hot event type is half the
  corpus). This implementation reuses the skew-hardened bucketed
  prefix-sum device (``operators/curation.py::token_budget_mix``,
  ``operators/packing.py::with_global_cumsum``): fixed-width epoch-time
  buckets (monotone coarsening of the sweep order, ties on ``us``
  never split), a per-(group, bucket) local running sum, and a tiny
  per-bucket offset frame window-summed and broadcast-joined back —
  value-identical to the single-window form (pinned by the DuckDB
  oracle, which stays the partition-less ``SUM OVER``) while the hot
  group parallelizes ``span / bucket_width`` ways.

Reference analog: keras-ocr has no time axis; the nearest semantics are
the per-image box-overlap counting in ``evaluation.py`` (how many boxes
cover a point) — re-expressed here on the time line, distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.numeric import pround

DAY_US = 86_400_000_000


def resample_ffill_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense per-day series per key with forward-filled daily totals.

    Days with events carry ``day_value = round(sum(value), 2)``; gap
    days are synthesized from each key's observed [min_day, max_day]
    span (``sequence`` + ``explode`` — JVM-side, no Python) and inherit
    the last observed total via ``last(ignorenulls=True)`` over a
    per-key ordered window. ``filled_value`` is never NULL: the first
    spine day is the key's first event day by construction.

    Day indexes are exact integer division of epoch micros (``div``),
    NOT float ``floor(us / DAY)`` — epoch micros exceed double's 2^53
    integer range, and a midnight-adjacent row must not flip days.

    Output: ``(key, day_idx, filled_value, has_event)`` with
    ``has_event`` a BIGINT 0/1 flag.

    Scale notes: all four shuffles are keyed by the series key or
    (key, day); the spine explode fans out to observed-span days per
    key (bounded, data-derived). The ``daily`` subtree feeds both the
    span agg and the join probe and is recomputed — for a long-lived
    100 TB pipeline, persist or checkpoint ``daily`` upstream.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    daily = (
        df.select(
            F.col(key_col).cast("long").alias("key"),
            us.alias("_us"),
            F.col(value_col).alias("_v"),
        )
        .withColumn("day_idx", F.expr(f"_us div {DAY_US}L"))
        .groupBy("key", "day_idx")
        .agg(pround(F.sum("_v"), 2).alias("day_value"))
    )
    spans = daily.groupBy("key").agg(
        F.min("day_idx").alias("_d0"), F.max("day_idx").alias("_d1")
    )
    spine = spans.select(
        "key", F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias("day_idx")
    )
    joined = spine.join(daily, ["key", "day_idx"], "left")
    w = (
        W.partitionBy("key")
        .orderBy("day_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        F.col("key").cast("long").alias("key"),
        F.col("day_idx").cast("long").alias("day_idx"),
        F.last("day_value", ignorenulls=True).over(w).cast("double").alias("filled_value"),
        F.col("day_value").isNotNull().cast("long").alias("has_event"),
    )


def sweep_max_concurrency(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    duration_us: int = 600_000_000,
    bucket_width_us: int = 3_600_000_000,
) -> DataFrame:
    """Peak concurrent open intervals per group, sweep-line style.

    Each row opens an END-EXCLUSIVE interval ``[us, us + duration_us)``
    — two intervals that merely touch do not overlap, enforced by the
    sweep order ``(us, delta, id)`` where the −1 close sorts before the
    +1 open at the same instant. Concurrency is the running sum of
    deltas in that order; the per-group maximum and the EARLIEST time it
    is attained (always an open event) are returned.

    Skew hardening: the running sum is NOT one window partition per
    group. Points are bucketed by ``us div bucket_width_us`` (monotone
    in the leading sweep key, so ties never split across buckets), the
    sum runs locally per (group, bucket), and exact bucket-boundary
    offsets — a ``n_groups × n_active_buckets`` frame — are computed
    with a tiny prefix window and broadcast-joined back. Identical
    values to the naive single window (asserted in tests), but a hot
    group parallelizes across its time buckets instead of serializing
    into one task.

    Output: ``(group, max_concurrent, n_intervals, peak_us)``.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        F.col(group_col).alias("grp"),
        us.alias("_s"),
        F.col(id_col).cast("long").alias("_id"),
    )
    starts = base.select(
        "grp", F.col("_s").alias("us"), F.lit(1).alias("delta"), "_id"
    )
    ends = base.select(
        "grp",
        (F.col("_s") + F.lit(int(duration_us))).alias("us"),
        F.lit(-1).alias("delta"),
        "_id",
    )
    pts = starts.unionByName(ends).withColumn(
        "_rb", F.expr(f"us div {int(bucket_width_us)}L")
    )
    w_local = (
        W.partitionBy("grp", "_rb")
        .orderBy("us", "delta", "_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = pts.withColumn("_lc", F.sum("delta").over(w_local))
    w_prefix = W.partitionBy("grp").orderBy("_rb").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        pts.groupBy("grp", "_rb")
        .agg(F.sum("delta").alias("_bt"))
        .withColumn("_off", F.coalesce(F.sum("_bt").over(w_prefix), F.lit(0)))
        .select("grp", "_rb", "_off")
    )
    sweep = local.join(F.broadcast(offsets), ["grp", "_rb"]).withColumn(
        "cum", (F.col("_off") + F.col("_lc")).cast("long")
    )
    # argmax via one map-side-combinable struct max: highest cum, then
    # highest -us == earliest us among peak ties.
    pk = F.max(F.struct(F.col("cum").alias("c"), (-F.col("us")).alias("nus")))
    return (
        sweep.groupBy("grp")
        .agg(
            F.max("cum").cast("long").alias("max_concurrent"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
            pk.alias("_pk"),
        )
        .select(
            "grp",
            "max_concurrent",
            "n_intervals",
            (-F.col("_pk.nus")).cast("long").alias("peak_us"),
        )
    )


def sweep_max_concurrency_naive(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    duration_us: int = 600_000_000,
) -> DataFrame:
    """Single-window reference form (one partition per group) — the
    textbook plan the bucketed version must equal value-for-value; used
    by tests only (it serializes each group into one task)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        F.col(group_col).alias("grp"),
        us.alias("_s"),
        F.col(id_col).cast("long").alias("_id"),
    )
    pts = base.select(
        "grp", F.col("_s").alias("us"), F.lit(1).alias("delta"), "_id"
    ).unionByName(
        base.select(
            "grp",
            (F.col("_s") + F.lit(int(duration_us))).alias("us"),
            F.lit(-1).alias("delta"),
            "_id",
        )
    )
    w = (
        W.partitionBy("grp")
        .orderBy("us", "delta", "_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sweep = pts.withColumn("cum", F.sum("delta").over(w).cast("long"))
    pk = F.max(F.struct(F.col("cum").alias("c"), (-F.col("us")).alias("nus")))
    return (
        sweep.groupBy("grp")
        .agg(
            F.max("cum").cast("long").alias("max_concurrent"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
            pk.alias("_pk"),
        )
        .select(
            "grp",
            "max_concurrent",
            "n_intervals",
            (-F.col("_pk.nus")).cast("long").alias("peak_us"),
        )
    )
