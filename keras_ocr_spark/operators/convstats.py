"""Conversation-level rollups with two-phase salted aggregation.

The skew story's second half (SURVEY.md §7 step 3): per-turn work is
skew-free by design (the unit of work is a turn), but CONVERSATION-level
aggregates group by ``conv_id`` — and one 10^6-turn conversation is a hot
key. For algebraic aggregates (count/sum/min/max) the fix is classic
two-phase salting:

    phase 1: groupBy(conv_id, salt)  -> partial aggregates  (hot key
             spread over n_salt reducers; shuffle carries partials)
    phase 2: groupBy(conv_id)        -> merge partials      (n_salt rows
             per conversation, trivially small)

Spark's own map-side partial aggregation already gives this benefit when
upstream partitioning is random; explicit salting matters when the
input is clustered by conv_id (the common lakehouse layout) so map-side
combine can't help across partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conv_stats(df: DataFrame, n_salt: int = 0) -> DataFrame:
    """Per-conversation stats: turn count, char count, role breadth,
    time extent. ``n_salt`` > 0 uses the two-phase salted plan."""
    if n_salt <= 0:
        return (
            df.groupBy("conv_id")
            .agg(
                F.count("*").alias("n_turns"),
                F.sum(F.length("text")).alias("n_chars"),
                F.countDistinct("role").alias("n_roles"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
            )
        )
    salted = df.withColumn("_salt", F.pmod(F.col("turn_idx"), F.lit(n_salt)))
    partial = salted.groupBy("conv_id", "_salt").agg(
        F.count("*").alias("_n"),
        F.sum(F.length("text")).alias("_chars"),
        F.collect_set("role").alias("_roles"),
        F.min("ts").alias("_min_ts"),
        F.max("ts").alias("_max_ts"),
    )
    return partial.groupBy("conv_id").agg(
        F.sum("_n").alias("n_turns"),
        F.sum("_chars").alias("n_chars"),
        F.size(F.array_distinct(F.flatten(F.collect_list("_roles")))).alias("n_roles"),
        F.min("_min_ts").alias("first_ts"),
        F.max("_max_ts").alias("last_ts"),
    )


def conv_profile(df: DataFrame) -> DataFrame:
    """Per-conversation profile via grouped-map ``applyInPandas`` — the
    ``compute_maps``-style per-group kernel surface
    (``/root/reference/keras_ocr/detection.py:106-198`` runs a Python
    kernel per training sample; here the group is a conversation).

    Use sparingly: per-conversation grouping re-concentrates skew, so
    anything expressible as plain aggregates should use
    :func:`conv_stats` instead. This exists for genuinely imperative
    per-group logic (here: inter-turn gap statistics needing ordered
    diffs).
    """
    import pandas as pd

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        gaps = pdf["ts"].diff().dt.total_seconds().dropna()
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "mean_gap_sec": [float(gaps.mean()) if len(gaps) else 0.0],
                "max_gap_sec": [float(gaps.max()) if len(gaps) else 0.0],
            }
        )

    return df.groupBy("conv_id").applyInPandas(
        profile, schema="conv_id string, n_turns long, mean_gap_sec double, max_gap_sec double"
    )
