"""Output layout management: compaction + clustering for the sink side.

At 100 TB the writer's file layout decides every later scan's cost:
- **small-files compaction** — a streaming/checkpointed writer leaves
  thousands of tiny files per partition; readers pay per-file open cost
  and planners per-file metadata. Compaction rewrites to
  ~``target_file_mb`` files.
- **clustering** — range-partitioning by the access keys
  (``conv_id, turn_idx``) plus an in-file sort gives readers contiguous
  conversations and parquet min/max pruning on the cluster keys (the
  poor man's Z-order for a 1-D-dominant access pattern; real Iceberg
  would express this as a sort order in table metadata — same seam as
  ``TableIO``).

Sizing uses the actual on-disk bytes of the input (driver-side file
listing — cheap metadata, no data read), so the target holds for any
compression ratio.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_bytes(path: str) -> int:
    return sum(p.stat().st_size for p in Path(path).rglob("*.parquet"))


def plan_num_files(input_bytes: int, target_file_mb: int) -> int:
    return max(1, math.ceil(input_bytes / (target_file_mb * 1024 * 1024)))


def compact(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    target_file_mb: int = 128,
    cluster_cols: list | None = None,
) -> dict:
    """Rewrite ``input_path`` into ~``target_file_mb`` parquet files,
    optionally range-clustered + sorted on ``cluster_cols``.

    Range partitioning puts each key range in exactly one file (global
    clustering); the within-partition sort makes parquet row-group
    min/max statistics tight on the cluster keys, so later scans with
    key predicates prune files AND row groups.

    Returns {files_before, files_after, bytes, planned_files}.
    """
    df = spark.read.parquet(input_path)
    n_before = len(list(Path(input_path).rglob("*.parquet")))
    total = dir_bytes(input_path)
    n_files = plan_num_files(total, target_file_mb)
    if cluster_cols:
        cols = [F.col(c) for c in cluster_cols]
        out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(output_path)
    n_after = len(list(Path(output_path).rglob("*.parquet")))
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes": total,
        "planned_files": n_files,
    }


def cluster_stats(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Per-file min/max of ``key`` — the pruning evidence: after
    clustering, file ranges are (nearly) disjoint, so a key predicate
    touches ~1 file."""
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    return df.groupBy("_file").agg(
        F.min(key).alias("key_min"), F.max(key).alias("key_max"), F.count("*").alias("rows")
    )
