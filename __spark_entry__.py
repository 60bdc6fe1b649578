"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship two-stage detect-then-extract pipeline
(stage-1 pandas-UDF span proposal + stage-2 JVM decode + windowed
reassembly — see ``keras_ocr_spark/plans/pipeline.py``) over transcripts
synthesized deterministically from the sf0.001 documents table.

``queries()`` / ``oracle_sql()`` expose one entry per implemented
operator from SURVEY.md §2 plus the training-data-pipeline operators
(dedup, similarity search, text analysis); the registry lives in
``keras_ocr_spark/driver_queries.py`` with exact DuckDB oracles.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from keras_ocr_spark.driver_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["extract_documents"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
