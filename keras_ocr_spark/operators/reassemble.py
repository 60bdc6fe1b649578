"""Stage 3 — ordered reassembly under the stable (conv_id, turn_idx) contract.

Graft analog of the reference's re-association + reading-order steps:
``tools.fix_line`` stable in-group ordering (``tools.py:584-600``),
``combine_line`` concat-in-order (``tools.py:124-147``) and
``convert_lines_to_paragraph`` newline join
(``data_generation.py:273-276``), plus the prediction<->box positional
zip of ``pipeline.py:66-75`` — here made explicit by carrying
``span_idx`` through both stages and sorting on it (Spark guarantees no
ordering after a shuffle, so the order key is explicit, never assumed).

One shuffle: groupBy (conv_id, turn_idx). The group key is a TURN, so
conversation-length skew does not concentrate work (a 700-turn
conversation is 700 small groups, not one huge one). Map-side partial
aggregation applies to collect_list as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reassemble(decoded: DataFrame) -> DataFrame:
    """(turn, span) rows -> one row per turn with ordered clean text.

    Output: conv_id, turn_idx, clean_text, spans
    (array<struct<start:int,end:int>>, document order). Zero-span turns
    yield ``clean_text=''`` and ``spans=[]``.
    """
    # collect_list SKIPS nulls: null-clean rows (zero-span turns from
    # posexplode_outer, or blank-decode spans) keep the turn in the group
    # while contributing no piece — ONE shuffle total, no re-join.
    pieces = F.sort_array(
        F.collect_list(
            F.when(
                F.col("clean").isNotNull(),
                F.struct(
                    F.col("span_idx").alias("idx"),
                    F.col("span_start").alias("start"),
                    F.col("span_end").alias("end"),
                    F.col("clean").alias("clean"),
                ),
            )
        )
    )
    return (
        decoded.groupBy("conv_id", "turn_idx")
        .agg(pieces.alias("pieces"))
        .select(
            "conv_id",
            "turn_idx",
            F.array_join(F.transform("pieces", lambda p: p["clean"]), "\n").alias("clean_text"),
            F.transform(
                "pieces", lambda p: F.struct(p["start"].alias("start"), p["end"].alias("end"))
            ).alias("spans"),
        )
    )
