"""Corpus evaluation: precision/recall over (true, pred) span sets.

Re-expresses ``/root/reference/keras_ocr/evaluation.py:56-147`` as
DataFrame joins + aggregations (no per-row Python anywhere), with the
reference's EXACT counting semantics:

reference (nested Python loops)            | here
-------------------------------------------|---------------------------
per image_id, nested-loop: every pred with | equi-join on turn_id +
IoU >= iou_threshold matches the truth     | 1-D span-IoU expression;
(:96-104) — candidacy is IoU ONLY          | NO similarity in candidacy
a pred may match many truths and a truth   | no one-to-one assignment —
many preds; pred_matched marks preds       | flags aggregated per truth
(:104), TP = DISTINCT matched truths       | and per pred
passing similarity (:124-125,139-144)      |
IoU-matched but similarity below threshold | near-TP: truth is NOT an
(:126-127)                                 | FN, pred is NOT an FP
unmatched pred -> FP (:132-136)            | left_anti join on candidates
truth with NO IoU match -> FN (:128-131)   | left_anti join on candidates
ignore flag: matched pred not FP, truth    | ignore column carried into
not TP/near/FN (:107-112,128)              | the flag aggregation
text similarity 1 - editdistance/maxlen    | built-in ``levenshtein``
(:116-123)                                 |

Span IoU in 1-D is pure arithmetic (no pyclipper):
``overlap / union = max(0, min(e1,e2) - max(s1,s2)) /
(max(e1,e2) - min(s1,s2))`` — golden values 0.25 / 0.0 mirror
``/root/reference/tests/test_evaluation.py:4-10``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def iou_candidates(
    true_df: DataFrame,
    pred_df: DataFrame,
    iou_threshold: float = 0.5,
) -> DataFrame:
    """All (truth, pred) pairs on the same turn with IoU >= threshold —
    the reference's match set (:96-104). Candidacy is IoU ONLY; text
    similarity is evaluated on candidates and carried as a column for
    the TP/near-TP split downstream.

    Inputs both shaped (turn_id, span_id, start, end, text[, ignore]).
    The join is equi on turn_id with the IoU range predicate on top —
    bounded per turn, never cartesian across turns.
    """
    t = true_df.alias("t")
    p = pred_df.alias("p")
    iou = span_iou_expr(F.col("t.start"), F.col("t.end"), F.col("p.start"), F.col("p.end"))
    sim = text_similarity_expr(F.col("t.text"), F.col("p.text"))
    return (
        t.join(p, F.col("t.turn_id") == F.col("p.turn_id"))
        .where(iou >= iou_threshold)
        .select(
            F.col("t.turn_id").alias("turn_id"),
            F.col("t.span_id").alias("true_span_id"),
            F.col("p.span_id").alias("pred_span_id"),
            iou.alias("iou"),
            sim.alias("sim"),
        )
    )


def score_by_turn(
    true_df: DataFrame,
    pred_df: DataFrame,
    iou_threshold: float = 0.5,
    similarity_threshold: float = 0.5,
) -> DataFrame:
    """Per-turn (turn_id, tp, fp, fn, near_tp) with the reference's
    counting rules (evaluation.py:90-147):

    - tp      = distinct non-ignored truths with >=1 IoU-match whose
                similarity passes (:124-125, distinct at :139-144)
    - near_tp = distinct non-ignored truths IoU-matched but with NO
                similarity-passing match (:126-127) — neither TP nor FN
    - fn      = non-ignored truths with NO IoU match at all (:128-131)
    - fp      = preds never IoU-matched by ANY truth (ignored ones
                included — :104,107-112) (:132-136)
    """
    if "ignore" not in true_df.columns:
        true_df = true_df.withColumn("ignore", F.lit(False))
    cand = iou_candidates(true_df, pred_df, iou_threshold)

    # Per-truth: did any candidate pass similarity?
    truth_flags = cand.groupBy("turn_id", "true_span_id").agg(
        F.max((F.col("sim") >= similarity_threshold).cast("int")).alias("any_sim")
    )
    truth_status = true_df.select("turn_id", "span_id", "ignore").join(
        truth_flags.withColumnRenamed("true_span_id", "span_id"),
        ["turn_id", "span_id"],
        "left",
    )
    truth_counts = truth_status.groupBy("turn_id").agg(
        F.sum(((~F.col("ignore")) & (F.col("any_sim") == 1)).cast("long")).alias("tp"),
        F.sum(((~F.col("ignore")) & (F.col("any_sim") == 0)).cast("long")).alias("near_tp"),
        F.sum(((~F.col("ignore")) & F.col("any_sim").isNull()).cast("long")).alias("fn"),
    )

    # Per-pred: ever IoU-matched by any truth (ignored or not)?
    matched_pred = cand.select("turn_id", F.col("pred_span_id").alias("span_id")).distinct()
    fp_counts = (
        pred_df.select("turn_id", "span_id")
        .join(matched_pred, ["turn_id", "span_id"], "left_anti")
        .groupBy("turn_id")
        .agg(F.count("*").alias("fp"))
    )

    turns = true_df.select("turn_id").union(pred_df.select("turn_id")).distinct()
    return (
        turns.join(truth_counts, "turn_id", "left")
        .join(fp_counts, "turn_id", "left")
        .select(
            "turn_id",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
            F.coalesce("near_tp", F.lit(0)).alias("near_tp"),
        )
    )


def score(
    true_df: DataFrame,
    pred_df: DataFrame,
    iou_threshold: float = 0.5,
    similarity_threshold: float = 0.5,
) -> dict:
    """Corpus precision/recall (evaluation.py:137-147). Sums the per-turn
    counts (turns partition the span sets, so per-turn distinct == global
    distinct)."""
    totals = (
        score_by_turn(true_df, pred_df, iou_threshold, similarity_threshold)
        .agg(
            F.sum("tp").alias("tp"),
            F.sum("fp").alias("fp"),
            F.sum("fn").alias("fn"),
            F.sum("near_tp").alias("near_tp"),
        )
        .collect()[0]
    )
    tp, fp, fn, near = (int(totals[c] or 0) for c in ("tp", "fp", "fn", "near_tp"))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "near_tp": near, "precision": precision, "recall": recall}
