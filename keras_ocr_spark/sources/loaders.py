"""Dataset loaders — Spark recasts of the reference's corpus scans
(``/root/reference/keras_ocr/datasets.py``).

Each loader mirrors one reference code path with explicit schemas (no
inference in prod paths) and returns a DataFrame:

- :func:`load_csv_labels` — BornDigital-style CSV label scan
  (``datasets.py:20-37,128-191``: ``split(',')``, strip quotes, union of
  train/test splits = ``unionByName``);
- :func:`load_json_annotations` — COCO-Text/ICDAR19-style JSON scan with
  language/legibility filters and ``limit`` (``datasets.py:40-125``:
  filters at :116-119, limit at :81-88);
- :func:`load_grouped_text` — ICDAR13-style multi-file text scan where
  blank lines delimit groups (``datasets.py:215-278``): group id = a
  running sum of blank-line markers over a per-file window — the same
  run-length segmentation primitive as stage-1 span proposal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

CSV_LABEL_SCHEMA = "filepath string, start int, end int, word string"
JSON_ANN_SCHEMA = (
    "image_id string, text string, language string, legibility string, percent_complete double"
)


def load_csv_labels(spark: SparkSession, *paths: str) -> DataFrame:
    """CSV label files -> one DataFrame (splits unioned, quotes stripped).

    ``data.extend`` across splits (datasets.py:163-190) = unionByName.
    """
    parts = [
        spark.read.schema(CSV_LABEL_SCHEMA).option("quote", '"').csv(p).withColumn(
            "split", F.lit(i)
        )
        for i, p in enumerate(paths)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("word", F.trim("word"))


def load_json_annotations(
    spark: SparkSession,
    path: str,
    english_only: bool = True,
    legible_only: bool = True,
    min_complete: float = 0.5,
    limit: int | None = None,
) -> DataFrame:
    """JSON annotation scan with the reference's filters.

    english/legible predicates (datasets.py:116-119), the ICDAR-2019
    ``percent_complete > 0.5`` filter (datasets.py:303), and ``limit``
    (datasets.py:81-88).
    """
    df = spark.read.schema(JSON_ANN_SCHEMA).json(path)
    if english_only:
        df = df.filter(F.col("language") == "english")
    if legible_only:
        df = df.filter(F.col("legibility") == "legible")
    df = df.filter(F.col("percent_complete") > min_complete)
    if limit is not None:
        df = df.limit(limit)
    return df


def load_grouped_text(spark: SparkSession, path: str) -> DataFrame:
    """Blank-line-delimited text files -> (file, group_id, lines array).

    The reference walks lines accumulating until a blank (datasets.py:
    236-249); distributed recast: ``group_id = sum(is_blank) OVER
    (PARTITION BY file ORDER BY line_idx)`` then groupBy — the windowed
    run-length grouping that also powers stage-1 components.

    NOTE: per-file line numbering needs a stable line index; Spark's
    text source doesn't expose one, so this uses a per-file window over
    a monotonic id — valid because each file is read as one split here
    (label files are small; big files would need a custom source).
    """
    raw = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("mono", F.monotonically_increasing_id())
    )
    w = W.partitionBy("file").orderBy("mono")
    lines = raw.withColumn("line_idx", F.row_number().over(w)).withColumn(
        "is_blank", (F.length(F.trim("value")) == 0).cast("int")
    )
    grouped = lines.withColumn(
        "group_id", F.sum("is_blank").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        grouped.filter(F.col("is_blank") == 0)
        .groupBy("file", "group_id")
        .agg(F.sort_array(F.collect_list(F.struct("line_idx", "value"))).alias("_ordered"))
        .select(
            "file",
            "group_id",
            F.transform("_ordered", lambda s: s["value"]).alias("lines"),
        )
    )
