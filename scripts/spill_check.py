#!/usr/bin/env python
"""Spill-awareness evidence: a shuffle+sort whose working set exceeds
executor memory must COMPLETE (UnsafeExternalSorter spills to disk) —
the 100 TB credibility check that no operator relies on data fitting in
memory.

Runs a deliberately memory-starved JVM (``--driver-memory`` via
PYSPARK_SUBMIT_ARGS — in local mode driver == executor) over ~1.5 GB of
synthetic rows, executes a global sort + wide aggregation, and reads the
per-stage spill counters from the Spark UI REST API. Prints ONE JSON
line: {completed, rows, memory_spilled_mb, disk_spilled_mb, heap_mb}.

Usage: python scripts/spill_check.py [--rows 12000000] [--heap 640m]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    # 12M x ~128B = ~1.5 GB of shuffle+sort data against a 1 GB heap:
    # guaranteed external sort. (640m/8-core starves the JVM into GC
    # thrash before the sorter can even spill — measured.)
    ap.add_argument("--rows", type=int, default=12_000_000)
    ap.add_argument("--heap", default="1g")
    ap.add_argument("--cpus", type=int, default=4)
    args = ap.parse_args()

    os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {args.heap} pyspark-shell"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("spill_check")
        .master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "40411")
        .getOrCreate()
    )

    # ~128 bytes of incompressible-ish payload per row -> rows * ~128B
    # of shuffle data, several x the heap.
    df = spark.range(args.rows).select(
        F.col("id"),
        F.concat(F.md5(F.col("id").cast("string")), F.md5((F.col("id") + 1).cast("string")),
                 F.md5((F.col("id") + 2).cast("string")), F.md5((F.col("id") + 3).cast("string"))).alias("payload"),
    )
    # Global sort on the payload (range partition + external sort),
    # MATERIALIZED by writing the sorted rows: an aggregate on top would
    # let Catalyst eliminate the sort entirely (order-insensitive
    # consumer) and the job would measure nothing.
    out_path = "/tmp/spill_check_out.parquet"
    df.orderBy("payload").write.mode("overwrite").parquet(out_path)
    out = spark.read.parquet(out_path).select(
        F.count("*").alias("n"), F.sum(F.crc32(F.col("payload"))).alias("crc")
    ).collect()[0]

    app_id = spark.sparkContext.applicationId
    mem_spill = disk_spill = 0
    try:
        with urllib.request.urlopen(f"http://localhost:40411/api/v1/applications/{app_id}/stages") as r:
            for st in json.load(r):
                mem_spill += st.get("memoryBytesSpilled", 0)
                disk_spill += st.get("diskBytesSpilled", 0)
    except Exception as e:  # noqa: BLE001
        print(f"WARN: UI metrics unavailable: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "completed": int(out["n"]) == args.rows,
                "rows": int(out["n"]),
                "memory_spilled_mb": round(mem_spill / 1e6, 1),
                "disk_spilled_mb": round(disk_spill / 1e6, 1),
                "heap": args.heap,
            }
        )
    )
    spark.stop()
    return 0 if int(out["n"]) == args.rows and disk_spill > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
