"""Write-time audit metrics via Spark's Observation API — QA for free.

A pipeline that writes 100 TB and THEN runs an audit query pays a
second full scan for the audit. ``Observation`` attaches aggregate
metrics to the frame itself: they are computed by the SAME tasks that
execute the write and become available the moment the action finishes —
zero extra jobs, zero extra IO (exactly-once semantics per action,
unlike accumulators which double-count task retries).

``write_with_audit`` wires this to the expectation-suite idiom of
``operators/expectations.py``: pass named SQL expressions (counts, null
counts, violation sums) and get their values back WITH the write. The
strict NULL handling and rule grammar mirror check_expectations, so the
same contract can gate an ingest either way: pre-write (a cheap extra
pass at small scale) or in-flight (free at 100 TB).

Caveat (documented, tested): observed metrics are computed on the rows
as the observe node sees them — attach the observation to the FINAL
frame (after every filter/projection), or the audit describes an
intermediate result, not what landed in the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def write_with_audit(
    df: DataFrame,
    path: str,
    metrics: dict[str, str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` to ``path`` while collecting ``metrics`` — a mapping
    of name -> aggregate SQL expression (e.g. ``{"n": "count(*)",
    "null_text": "sum(cast(text is null as bigint))"}``) — in the SAME
    job. Returns the observed values. One scan total."""
    if not metrics:
        raise ValueError("at least one metric is required")
    obs = Observation("write_audit")
    observed = df.observe(obs, *[F.expr(e).alias(n) for n, e in metrics.items()])
    observed.write.format(fmt).mode(mode).save(path)
    return dict(obs.get)
