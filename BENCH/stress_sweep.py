#!/usr/bin/env python
"""Sweep-line concurrency skew stress: an event table where ONE group
holds 80% of the rows — the hot-event-type shape that makes a
per-group running-sum window serialize the dominant group into a
single task.

Runs the same sweep twice on the same input: the naive single-window
form (``sweep_max_concurrency_naive``, one window partition per group)
vs the shipped bucketed prefix-sum form (per-(group, time-bucket)
local running sums + broadcast bucket offsets), asserts the result
rows are IDENTICAL, and reports both walls. Input synthesized with
pure Spark expressions (no external data; timestamps spread over ~28
days so the hot group spans ~680 hour-buckets).

Usage: python BENCH/stress_sweep.py [n_events] [skew_frac]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from keras_ocr_spark.operators.timeseries import (  # noqa: E402
    sweep_max_concurrency,
    sweep_max_concurrency_naive,
)
from keras_ocr_spark.plans.session import build_session  # noqa: E402

COLD_TYPES = ["t1", "t2", "t3", "t4"]


def synth(spark, n: int, skew: float):
    """n events; `skew` fraction in hot type 't0', rest over 4 types.
    Start times deterministic in the id, spread over ~28 days at
    second granularity (collisions guaranteed at 4M+ rows)."""
    thresh = int(1000 * skew)
    etype = F.when(
        F.pmod(F.xxhash64(F.col("id")), 1000) < thresh, F.lit("t0")
    ).otherwise(
        F.element_at(
            F.array(*[F.lit(t) for t in COLD_TYPES]),
            (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(len(COLD_TYPES))) + 1).cast(
                "int"
            ),
        )
    )
    sec = F.pmod(F.xxhash64(F.col("id") + 13), F.lit(28 * 86_400))
    return (
        spark.range(n)
        .repartition(max(64, n // 100_000))
        .select(
            F.col("id").alias("event_id"),
            etype.alias("event_type"),
            F.timestamp_seconds(F.lit(1_700_000_000) + sec).alias("ts"),
        )
    )


def run_once(events, fn, **kw):
    t0 = time.time()
    rows = sorted(map(tuple, fn(events, **kw).collect()))
    return time.time() - t0, rows


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    skew = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    spark = build_session(
        app_name="stress_sweep",
        master="local[32]",
        shuffle_partitions=max(64, n // 40_000),
    )
    events = synth(spark, n, skew).persist()
    n_events = events.count()
    hot = events.filter(F.col("event_type") == "t0").count()

    # warm-up (JIT, shuffle service) on a slice, then timed runs
    run_once(events.limit(50_000), sweep_max_concurrency)
    t_naive, rows_naive = run_once(events, sweep_max_concurrency_naive)
    t_bucketed, rows_bucketed = run_once(events, sweep_max_concurrency)

    out = {
        "n_events": n_events,
        "skew_frac": skew,
        "hot_type_rows": hot,
        "naive_single_window_s": round(t_naive, 1),
        "bucketed_hourly_s": round(t_bucketed, 1),
        "speedup": round(t_naive / t_bucketed, 2),
        "results_identical": rows_naive == rows_bucketed,
        "peak_hot": next((r[1] for r in rows_naive if r[0] == "t0"), None),
    }
    print(json.dumps(out))
    return 0 if rows_naive == rows_bucketed else 1


if __name__ == "__main__":
    raise SystemExit(main())
