"""Stage 2 — distributed span decoding (the "recognizer").

Graft analog of ``Recognizer.recognize_from_boxes``
(``/root/reference/keras_ocr/recognition.py:491-537``), fully JVM-side:

reference                                  | here
-------------------------------------------|---------------------------
flatten all crops across images with       | ``posexplode_outer(spans)``
(start,end) offsets (:504-526)             | — unit of work becomes a
                                           | SPAN, not a conversation
                                           | (the skew fix: ragged groups
                                           | load-balance as rows)
warpBox crop each box (:511-519)           | ``substring`` crop
CRNN + CTC decode (:527-535)               | regexp/replace/trim chain
                                           | (whole-stage codegen, no
                                           | Python worker)
drop blank labels (:483-488)               | filter out empty decodes
                                           | while keeping zero-span
                                           | turns (outer explode)

Output: one row per (turn, span) plus one null-span row per turn that
proposed nothing, so downstream reassembly preserves every turn (the
blank-image negative control must yield an empty string, not a missing
row — ``tests/test_pipeline.py:9-12``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import crop_expr, decode_expr


def decode(detected: DataFrame) -> DataFrame:
    """Explode spans and decode each one JVM-side.

    Input: ``detect()`` output (transcript columns + ``spans``).
    Output columns: conv_id, turn_idx, span_idx, span_start, span_end,
    span_score, clean — where ``clean`` is NULL for empty/zero-span rows
    (dropped later by the reassembly's collect, which skips nulls).
    """
    exploded = detected.select(
        "conv_id",
        "turn_idx",
        F.posexplode_outer("spans").alias("span_idx", "span"),
        "text",
    )
    cropped = exploded.select(
        "conv_id",
        "turn_idx",
        "span_idx",
        F.col("span.start").alias("span_start"),
        F.col("span.end").alias("span_end"),
        F.col("span.score").alias("span_score"),
        decode_expr(crop_expr(F.col("text"), F.col("span.start"), F.col("span.end"))).alias("clean"),
    )
    # Blank-label drop: a span that decodes to '' is nulled so the
    # reassembly's collect_list skips it (recognition.py:483-488).
    return cropped.withColumn("clean", F.when(F.length("clean") > 0, F.col("clean")))
