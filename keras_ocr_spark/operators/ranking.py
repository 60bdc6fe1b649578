"""Distributed exact global rank / ntile — no global-order window.

``ntile(n) OVER (ORDER BY ...)`` (and any partition-less ordered
window) funnels EVERY row through one task in Spark — fine at test
scale, a hard wall at 100 TB. This module computes the identical
result three-phase, the textbook distributed total-order rank:

1. **range-bucket** rows by approx quantiles of the leading order key
   (a driver-side sample action, cheap and scale-free), assigned as a
   plain projection;
2. **local rank** inside each range bucket with an ordinary partitioned
   window — P parallel tasks, each holding ~N/P rows;
3. **prefix offsets**: per-bucket counts (tiny — P rows) collected and
   re-emitted as a literal map; global_rank = offset[bucket] + local
   rank, and the ntile bucket is then a pure per-row formula.

Exactness: the range buckets respect the value order (every row in
bucket b sorts <= every row in bucket b+1; boundary ties land in one
bucket), so offset + local rank IS the global rank; the ntile formula
reproduces Spark/DuckDB semantics bit-for-bit — the first (N mod n)
buckets get ceil(N/n) rows (asserted against F.ntile on randomized
inputs in tests).

Cost: two tiny driver actions (quantile sample, P-row count collect)
plus ONE hash exchange on the bucket key — vs the single-task sort of
the naive form. Skewed leading keys degrade bucket balance, not
correctness (AQE skew handling still applies to the exchange).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _range_bucket_expr(value: Column, splits: List[float]) -> Column:
    """0-based range bucket: count of split points strictly below the
    value (monotone in the value, ties share a bucket)."""
    bucket = F.lit(0)
    for s in splits:
        bucket = bucket + F.when(value > F.lit(s), 1).otherwise(0)
    return bucket


def _ranked(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str,
    n_range_buckets: int | None,
) -> tuple:
    """(ranked DataFrame, total row count) — shared core; the total
    falls out of the same tiny per-bucket count pass."""
    spark = df.sparkSession
    n_range = n_range_buckets or spark.sparkContext.defaultParallelism
    lead = F.col(order_cols[0]).cast("double")
    splits: List[float] = []
    if n_range > 1:
        qs = [i / n_range for i in range(1, n_range)]
        got = df.select(lead.alias("_v")).approxQuantile("_v", qs, 0.001)
        splits = sorted(set(got))
    staged = df.withColumn("_rb", _range_bucket_expr(lead, splits))
    w = W.partitionBy("_rb").orderBy(*[F.col(c) for c in order_cols])
    local = staged.withColumn("_lr", F.row_number().over(w))
    counts = {
        int(r["_rb"]): int(r["n"])
        for r in staged.groupBy("_rb").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    if offsets:
        off_map = F.create_map(*[F.lit(x) for b, o in offsets.items() for x in (b, o)])
        ranked = local.withColumn(rank_col, (F.col("_lr") + off_map[F.col("_rb")]).cast("long"))
    else:  # empty input
        ranked = local.withColumn(rank_col, F.col("_lr").cast("long"))
    return ranked.drop("_rb", "_lr"), acc


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "global_rank",
    n_range_buckets: int | None = None,
) -> DataFrame:
    """Adds an exact 1-based row_number over the total order
    ``order_cols`` (which must be a unique key sequence for a
    deterministic result) without a partition-less window."""
    ranked, _ = _ranked(df, order_cols, rank_col, n_range_buckets)
    return ranked


def exact_ntile(
    df: DataFrame,
    n: int,
    order_cols: Sequence[str],
    ntile_col: str = "q",
    n_range_buckets: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY order_cols)`` with identical semantics
    (first N mod n buckets get the extra row) as a three-phase
    distributed plan. ``order_cols`` must be a unique key for ties to
    be deterministic (same requirement the window form has)."""
    ranked, n_rows = _ranked(df, order_cols, "_gr", n_range_buckets)
    size, extra = divmod(n_rows, n)
    gr = F.col("_gr")
    if size == 0:
        # fewer rows than buckets: bucket == rank
        q = gr
    else:
        cut = (size + 1) * extra
        q = F.when(gr <= F.lit(cut), F.ceil(gr / F.lit(size + 1))).otherwise(
            F.lit(extra) + F.ceil((gr - F.lit(cut)) / F.lit(size))
        )
    return ranked.withColumn(ntile_col, q.cast("long")).drop("_gr")
