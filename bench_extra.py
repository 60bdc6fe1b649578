#!/usr/bin/env python
"""Round-6 optimization harness: per-query isolated timing with the
noop sink (guide §1.4 — forces every column of every row, no sink cost,
no optimizer pruning), separate from the FROZEN bench.py.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 --queries dedup_containment
  python bench_extra.py --queries all --reps 2

Prints one JSON line per query: {"query":..., "sec":..., "reps":[...]}
and a final summary line. Job descriptions are set per query so the
Spark UI attributes stages (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from keras_ocr_spark.driver_queries import QUERIES  # noqa: E402
from keras_ocr_spark.plans.session import build_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default="dedup_containment,dedup_prefix_filter")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--count", action="store_true", help="time .count() instead of noop write (bench.py parity)")
    args = ap.parse_args()

    spark = build_session(
        app_name="bench_extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    names = list(QUERIES) if args.queries == "all" else [q.strip() for q in args.queries.split(",") if q.strip()]
    results = {}
    for name in names:
        if name not in QUERIES:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = min(reps)
        print(json.dumps({"query": name, "sec": min(reps), "reps": reps}), flush=True)
    print(json.dumps({"total": round(sum(results.values()), 3), "queries": results, "sf_dir": args.sf_dir, "cpus": args.cpus}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
