"""Span geometry filters — the 1-D recast of the reference's box
geometry (``/root/reference/keras_ocr/tools.py``).

The reference's augmentation keeps a box only if enough of it survives
the crop: clip to the image, then ``area_after / area_before >=
area_threshold`` and ``area_after > min_area``
(``tools.py:301-311`` box_inside_image). For character spans the areas
are lengths and the clip is interval intersection — pure arithmetic,
whole-stage-codegen'd, map-only at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clip_span_expr(start: Column, end: Column, lo: int, hi: int) -> tuple:
    """Clip [start, end) to the window [lo, hi) — np.clip per coordinate
    (tools.py:306-308)."""
    return F.greatest(start, F.lit(lo)), F.least(end, F.lit(hi))


def inclusion_filter(
    df: DataFrame,
    lo: int,
    hi: int,
    area_threshold: float = 0.5,
    min_len: int = 0,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Keep spans where the clipped length is >= ``area_threshold`` of
    the original AND > ``min_len`` (tools.py:309-311). Adds the clipped
    coordinates and the survival ratio; zero-length inputs are dropped
    (the reference returns False for zero-area boxes, :303-304)."""
    s, e = F.col(start_col), F.col(end_col)
    cs, ce = clip_span_expr(s, e, lo, hi)
    len_before = e - s
    len_after = F.greatest(ce - cs, F.lit(0))
    ratio = len_after.cast("double") / len_before
    return (
        df.filter(len_before > 0)
        .withColumn("clip_start", cs)
        .withColumn("clip_end", ce)
        .withColumn("keep_ratio", ratio)
        .filter((ratio >= area_threshold) & (len_after > min_len))
    )
