"""Semi-structured (JSON) column extraction.

Transcript/event tables at web scale carry per-row JSON payloads
(tool-call arguments, crawler metadata, annotation sidecars) next to
the typed columns. The reference keeps analogous per-sample metadata as
Python dicts riding its generators (e.g. the COCO/BornDigital loaders'
per-image attribute dicts, ``/root/reference/keras_ocr/datasets.py``);
here the same information lives in a JSON string column and must be
extracted *inside the plan* so Catalyst can prune and push around it.

Scale shape: ``get_json_object`` is a JVM intrinsic evaluated map-side
during the scan projection — no Python, no extra pass; the rollup is
then an ordinary partial-agg groupBy (ONE exchange on the group key).
At 100 TB the JSON parse cost is embedded in the scan stage and
parallelizes with it; nothing here is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import pround


def json_field_rollup(
    df: DataFrame,
    json_col: str = "props",
    field: str = "k",
    group_col: str = "event_type",
) -> DataFrame:
    """Extract an integer field from a JSON string column and roll it up
    per group: count / coverage / min / max / floor-rounded mean.

    ``get_json_object`` returns NULL for missing keys and malformed
    JSON, so dirty rows degrade to the ``n_events - n_with_field`` gap
    instead of failing the task; the cast to long likewise NULLs
    non-numeric values.
    """
    k = F.get_json_object(F.col(json_col), f"$.{field}").cast("long")
    return (
        df.select(F.col(group_col), k.alias("_k"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("_k").cast("long").alias("n_with_field"),
            F.min("_k").alias("min_val"),
            F.max("_k").alias("max_val"),
            pround(F.avg("_k"), 6).alias("avg_val"),
        )
    )
