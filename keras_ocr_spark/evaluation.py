"""Corpus evaluation: precision/recall over (true, pred) span sets.

Re-expresses ``/root/reference/keras_ocr/evaluation.py:56-147`` as
DataFrame joins + aggregations (no per-row Python anywhere):

reference (nested Python loops)            | here
-------------------------------------------|---------------------------
per image_id, nested-loop match true x     | equi-join on turn_id +
pred with IoU >= iou_threshold (:90-104)   | 1-D span-IoU expression
text similarity 1 - editdistance/maxlen    | built-in ``levenshtein``
(:116-123)                                 |
greedy one-match-per-truth (:93,104)       | row_number over (truth)
                                           | ordered by (iou desc, pred)
unmatched pred -> FP (:132-136)            | left_anti join
unmatched true -> FN (:128-131)            | left_anti join
ignore flag exclusions (:107-112,128)      | filters
precision/recall counting (:137-147)       | countDistinct aggregates

Span IoU in 1-D is pure arithmetic (no pyclipper):
``overlap / union = max(0, min(e1,e2) - max(s1,s2)) /
(max(e1,e2) - min(s1,s2))`` — golden values 0.25 / 0.0 mirror
``/root/reference/tests/test_evaluation.py:4-10``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def span_iou_expr(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """1-D interval IoU (the polygon IoU of evaluation.py:13-53 degenerates
    to interval arithmetic for character spans)."""
    overlap = F.greatest(F.least(e1, e2) - F.greatest(s1, s2), F.lit(0))
    union = F.greatest(e1, e2) - F.least(s1, s2)
    return F.when(union > 0, overlap / union).otherwise(F.lit(0.0))


def text_similarity_expr(a: Column, b: Column) -> Column:
    """1 - editdistance/maxlen (evaluation.py:116-123), via built-in
    levenshtein."""
    maxlen = F.greatest(F.length(a), F.length(b))
    return F.when(maxlen > 0, 1.0 - F.levenshtein(a, b) / maxlen).otherwise(F.lit(1.0))


def match_spans(
    true_df: DataFrame,
    pred_df: DataFrame,
    iou_threshold: float = 0.5,
    similarity_threshold: float = 0.5,
) -> DataFrame:
    """Greedy true<->pred matching per turn.

    Inputs both shaped (turn_id, span_id, start, end, text[, ignore]).
    Output: one row per matched (turn_id, true_span_id, pred_span_id).
    Greedy = each truth takes its best-IoU prediction, each prediction is
    spent on at most one truth (mirrors the matched-set bookkeeping of
    evaluation.py:93-104).
    """
    t = true_df.alias("t")
    p = pred_df.alias("p")
    iou = span_iou_expr(F.col("t.start"), F.col("t.end"), F.col("p.start"), F.col("p.end"))
    sim = text_similarity_expr(F.col("t.text"), F.col("p.text"))
    cand = (
        t.join(p, F.col("t.turn_id") == F.col("p.turn_id"))
        .where((iou >= iou_threshold) & (sim >= similarity_threshold))
        .select(
            F.col("t.turn_id").alias("turn_id"),
            F.col("t.span_id").alias("true_span_id"),
            F.col("p.span_id").alias("pred_span_id"),
            iou.alias("iou"),
        )
    )
    # Best pred per truth, then best truth per pred — deterministic
    # tie-breaks on ids (the greedy one-to-one assignment).
    w_true = W.partitionBy("turn_id", "true_span_id").orderBy(F.desc("iou"), F.asc("pred_span_id"))
    best_for_true = cand.withColumn("rn", F.row_number().over(w_true)).filter(F.col("rn") == 1).drop("rn")
    w_pred = W.partitionBy("turn_id", "pred_span_id").orderBy(F.desc("iou"), F.asc("true_span_id"))
    return best_for_true.withColumn("rn", F.row_number().over(w_pred)).filter(F.col("rn") == 1).drop("rn")


def score(
    true_df: DataFrame,
    pred_df: DataFrame,
    iou_threshold: float = 0.5,
    similarity_threshold: float = 0.5,
) -> dict:
    """Precision/recall (evaluation.py:137-147 semantics).

    ``ignore``-flagged truths are excluded from FN counting and their
    matched predictions from FP counting (:107-112,128).
    """
    if "ignore" not in true_df.columns:
        true_df = true_df.withColumn("ignore", F.lit(False))
    matches = match_spans(true_df, pred_df, iou_threshold, similarity_threshold).cache()

    t_keys = ["turn_id", "span_id"]
    matched_true = matches.select("turn_id", F.col("true_span_id").alias("span_id"))
    matched_pred = matches.select("turn_id", F.col("pred_span_id").alias("span_id"))

    ignored_true = true_df.filter(F.col("ignore")).select(*t_keys)
    real_true = true_df.filter(~F.col("ignore")).select(*t_keys)

    tp = matched_true.join(ignored_true, t_keys, "left_anti").count()
    fn = real_true.join(matched_true, t_keys, "left_anti").count()
    # Predictions matched to ignored truths are neither TP nor FP.
    matched_to_ignored = (
        matches.join(
            ignored_true.withColumnRenamed("span_id", "true_span_id"),
            ["turn_id", "true_span_id"],
            "left_semi",
        ).select("turn_id", F.col("pred_span_id").alias("span_id"))
    )
    fp = (
        pred_df.select(*t_keys)
        .join(matched_pred, t_keys, "left_anti")
        .join(matched_to_ignored, t_keys, "left_anti")
        .count()
    )
    matches.unpersist()
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall}
