#!/usr/bin/env python
"""Scale stress for the r5 data-quality quartet: profile_table,
check_expectations, skew_report, mad_outlier_report over a 50M-row
expression-synthesized fact (one decade above the sf0.1 bench inputs).

What it evidences (the 100 TB claims, one decade up):
- profiler: ONE scan for 6 columns incl. two exact count(DISTINCT)
  (Expand x-factor paid after pruning) and the approx/HLL mode holding
  a flat single pass;
- expectations: 5 rules in one conditional-sum aggregate (no Expand);
- skew_report: the per-key count shuffle stays flat under a planted
  80%-hot key (map-side combine collapses it before the exchange) —
  the report's own skew-immunity claim;
- mad_outlier_report: histogram boundedness — 50M rows collapse to a
  cents-domain histogram regardless of row count.

All inputs synthesized with pure Spark expressions (no driver-side
data). Prints one JSON line per op: rows, wall seconds, and the check
that proves the run did real work.

Usage: python BENCH/stress_quality_ops.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from keras_ocr_spark.operators.expectations import check_expectations  # noqa: E402
from keras_ocr_spark.operators.profile import profile_table  # noqa: E402
from keras_ocr_spark.operators.robust import mad_outlier_report  # noqa: E402
from keras_ocr_spark.operators.skewjoin import skew_report  # noqa: E402


def synth(spark, n: int):
    """50M-ish fact: 80%-hot user key, 5 event types, heavy-tailed
    value with planted far outliers on one type."""
    df = spark.range(n).withColumn(
        "user_id",
        F.when(F.pmod(F.xxhash64("id"), 10) < 8, F.lit(7)).otherwise(
            F.pmod(F.xxhash64(F.col("id") + 3), 100000)
        ),
    )
    df = df.withColumn(
        "event_type",
        F.concat(F.lit("t"), F.pmod(F.xxhash64(F.col("id") + 11), 5).cast("string")),
    )
    base = (F.pmod(F.xxhash64(F.col("id") + 19), 10000) / 100.0) + 1.0
    df = df.withColumn(
        "value",
        F.when(
            (F.col("event_type") == "t0") & (F.pmod(F.xxhash64(F.col("id") + 23), 1000) == 0),
            base * 1000,  # 0.1% planted far outliers on t0
        ).otherwise(base),
    )
    return df.withColumn("label", F.when(F.pmod("id", 97) == 0, F.lit(None).cast("string")).otherwise(F.lit("ok")))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    spark = None
    from keras_ocr_spark.plans.session import build_session

    spark = build_session(
        app_name="stress-quality", master="local[32]", shuffle_partitions=64
    )
    df = synth(spark, n)
    out = {"n_rows": n}

    t = time.time()
    prof = profile_table(df, ["user_id", "event_type", "value", "label"]).collect()
    out["profile_exact_sec"] = round(time.time() - t, 1)
    out["profile_user_distinct"] = next(r.n_distinct for r in prof if r.col_name == "user_id")
    out["profile_label_nulls"] = next(r.n_null for r in prof if r.col_name == "label")

    t = time.time()
    prof_a = profile_table(
        df, ["user_id", "event_type", "value", "label"], approx_distinct=True
    ).collect()
    out["profile_hll_sec"] = round(time.time() - t, 1)
    approx_u = next(r.n_distinct for r in prof_a if r.col_name == "user_id")
    out["profile_hll_user_distinct"] = approx_u
    assert abs(approx_u - out["profile_user_distinct"]) <= 0.15 * out["profile_user_distinct"]

    t = time.time()
    exp = check_expectations(
        df,
        [
            ("value positive", "value > 0"),
            ("value sane", "value <= 100000"),
            ("label present", "label IS NOT NULL"),
            ("five types", "event_type IN ('t0','t1','t2','t3','t4')"),
            ("user nonneg", "user_id >= 0"),
        ],
    ).collect()
    out["expectations_sec"] = round(time.time() - t, 1)
    out["expectations_label_violations"] = next(
        r.n_violations for r in exp if r.rule_name == "label present"
    )
    assert out["expectations_label_violations"] == (n + 96) // 97

    t = time.time()
    rep = skew_report(df, "user_id", target_rows_per_task=1_000_000, top_k=3).collect()
    out["skew_report_sec"] = round(time.time() - t, 1)
    top = rep[0]
    out["hot_key_share_ppm"] = top.share_ppm
    out["hot_key_salt_factor"] = top.salt_factor
    assert top.key_repr == "7" and 780_000 < top.share_ppm < 820_000

    t = time.time()
    mad = mad_outlier_report(df, "event_type", "value", k=3).collect()
    out["mad_sec"] = round(time.time() - t, 1)
    by_t = {r.event_type: r for r in mad}
    out["t0_outliers"] = by_t["t0"].n_outliers
    out["t1_outliers"] = by_t["t1"].n_outliers
    # the planted 0.1% far tail on t0 must be flagged; clean types ~0
    assert by_t["t0"].n_outliers > 0.0005 * by_t["t0"].n_rows
    assert by_t["t1"].n_outliers < 0.01 * by_t["t1"].n_rows

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
