#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: throughput@4N / (4 x
throughput@N) >= 0.8, evidenced at local[8] vs local[32] — no real
cluster in this sandbox).

Runs the identical extraction job (same input parquet, same config) in
TWO FRESH spark-submit JVMs — one local[8], one local[32] — so neither
run inherits the other's JVM warmup, and reports turns/sec at both plus
the efficiency ratio into BENCH/BASELINE.md and BENCH/scaling.json.

Usage: python BENCH/run_scaling.py [--convs 20000] [--n 8 --four-n 32]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from keras_ocr_spark.plans.session import build_session
from keras_ocr_spark.plans.pipeline import extract

cores = int(sys.argv[1]); inp = sys.argv[2]; reps = int(sys.argv[3])
# Bench-scale inputs are ~100 MB: the 128 MB default maxPartitionBytes
# bin-packs the whole scan into 2-3 partitions, capping a MAP-ONLY plan
# at 3 concurrent tasks regardless of cores. Size split bytes to the SF
# so scan parallelism >= cores (at 100 TB the default is correct).
spark = build_session(app_name=f"scaling_{{cores}}", master=f"local[{{cores}}]",
                      shuffle_partitions=max(cores, 8),
                      extra_conf={{"spark.sql.files.maxPartitionBytes": "2m",
                                   "spark.sql.files.openCostInBytes": "512k"}})
src = spark.read.parquet(inp)
n_turns = src.count()

def force(df):
    # count() would let Catalyst PRUNE the decode work entirely —
    # checksum aggregates force full materialization of every column.
    row = df.select(F.count("*").alias("n"), F.sum(F.length("clean_text")).alias("chars"),
                    F.sum(F.size("spans")).alias("spans")).collect()[0]
    return row

# warmup x2: JIT + codegen + Python worker pool spin-up (same query shape).
# Default plan is MAP-ONLY (fused per-row decode+reassembly): no shuffle
# anywhere; the salted repartition stays the opt-in remedy for skewed
# INPUT LAYOUTS (exercised in tests/test_parity.py).
force(extract(src.limit(2000)))
force(extract(src.limit(2000)))
samples = []
for _ in range(reps):
    t0 = time.perf_counter()
    row = force(extract(src))
    dt = time.perf_counter() - t0
    assert row["n"] == n_turns, (row, n_turns)
    samples.append(dt)
    print(f"  sample local[{{cores}}]: {{dt:.2f}}s", file=sys.stderr, flush=True)
best = min(samples)
print("RESULT " + json.dumps({{"cores": cores, "sec": best, "samples": samples,
                               "turns": n_turns, "turns_per_sec": n_turns / best}}))
spark.stop()
"""


def run_at(cores: int, inp: str, reps: int = 3) -> dict:
    script = RUNNER.format(repo=str(REPO))
    proc = subprocess.run(
        [sys.executable, "-c", script, str(cores), inp, str(reps)],
        capture_output=True,
        text=True,
        timeout=3000,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> int:
    ap = argparse.ArgumentParser()
    # ~700k turns: large enough that per-stage fixed overheads (task
    # scheduling, codegen) are noise at both parallelism levels.
    ap.add_argument("--convs", type=int, default=100000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--four-n", type=int, default=32)
    args = ap.parse_args()

    from keras_ocr_spark.plans.session import build_session
    from keras_ocr_spark.sources.transcripts import generate_pandas

    inp = "/tmp/scaling_transcripts.parquet"
    print(f"generating {args.convs} conversations ...", flush=True)
    spark = build_session(app_name="gen", master="local[8]")
    pdf = generate_pandas(n_convs=args.convs, seed=42, make_skewed=True)
    spark.createDataFrame(
        pdf, schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(64).write.mode("overwrite").parquet(inp)
    n_turns = len(pdf)
    spark.stop()
    print(f"input: {n_turns} turns", flush=True)

    # Best-of-reps per level: this sandbox is a shared VM with noisy
    # neighbors; the minimum wall time is the least-contended sample of
    # identical work (standard noisy-host benchmarking practice). All
    # samples are recorded in scaling.json for transparency.
    t_start = time.strftime("%Y-%m-%d %H:%M:%S")
    lo = run_at(args.n, inp, args.reps)
    hi = run_at(args.four_n, inp, args.reps)
    ratio = args.four_n / args.n
    eff = hi["turns_per_sec"] / (ratio * lo["turns_per_sec"])
    result = {
        "timestamp": t_start,
        "turns": n_turns,
        "n_cores": args.n,
        "four_n_cores": args.four_n,
        "throughput_at_n": round(lo["turns_per_sec"], 1),
        "throughput_at_4n": round(hi["turns_per_sec"], 1),
        "sec_at_n": round(lo["sec"], 2),
        "sec_at_4n": round(hi["sec"], 2),
        "samples_at_n": [round(s, 2) for s in lo["samples"]],
        "samples_at_4n": [round(s, 2) for s in hi["samples"]],
        "scaling_efficiency": round(eff, 3),
        "target": ">= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(result, indent=2))
    (REPO / "BENCH/scaling.json").write_text(json.dumps(result, indent=2) + "\n")

    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

North rule: `throughput@4N / (4 x throughput@N) >= 0.8`. No real cluster
in this sandbox: the identical extraction job (same input parquet, same
config, fresh JVM each) runs at `local[{args.n}]` (N) and
`local[{args.four_n}]` (4N).

| run | cores | wall (s) | turns/sec |
|---|---|---|---|
| N  | {args.n} | {result['sec_at_n']} | {result['throughput_at_n']} |
| 4N | {args.four_n} | {result['sec_at_4n']} | {result['throughput_at_4n']} |

- input: {n_turns} turns (deterministic synthetic transcripts, seed=42,
  including the 700-turn skew conversation); best of {args.reps} runs per
  level (shared-VM noise; all samples in BENCH/scaling.json)
- plan: shuffle-free stage 1 (per-turn map) + single per-turn
  reassembly exchange; salted repartition is the opt-in skew remedy for
  skewed input layouts (exercised in tests/test_parity.py)
- **scaling efficiency = {result['scaling_efficiency']}** (target >= 0.8: {"PASS" if result['pass'] else "FAIL"})
- measured: {t_start}
"""
    (REPO / "BENCH/BASELINE.md").write_text(md)
    print("wrote BENCH/BASELINE.md, BENCH/scaling.json")
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
