#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: end-to-end extraction throughput in turns/sec for the
flagship detect-then-extract pipeline over a deterministic synthetic
transcript table (seed=42) sized to the sf — plus per-query wall times
for the operator suite over the sf tables.

Usage:
  python bench.py                      # sf0.1, local[32]
  SPARK_GRAFT_CPUS=8 python bench.py   # scaling-efficiency runs
  python bench.py --queries q1,q2      # subset
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
from keras_ocr_spark.plans.pipeline import extract  # noqa: E402
from keras_ocr_spark.plans.session import build_session  # noqa: E402
from keras_ocr_spark.sources.transcripts import generate_pandas  # noqa: E402

#: Headline operator queries benchmarked per round (a representative cut:
#: flagship extraction + the heavier shuffle/join/dedup paths).
BENCH_QUERIES = [
    "extract_documents",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "runlength_segments",
    "interval_join_events",
    "ordering_window",
    "quality_scores",
]

#: Added in round 2 (kept separate so the round-over-round TOTAL stays
#: comparable: r01_comparable_subtotal covers BENCH_QUERIES only).
BENCH_QUERIES_R2 = [
    "simhash_near_pairs",
    "embedding_neardup",
    "ann_topk_multiprobe",
    "eval_score",
]

#: Added in round 3: the dedup last mile (pair -> cluster resolution)
#: and the partition-pruned ANN store scan.
BENCH_QUERIES_R3 = [
    "dedup_resolve",
    "ann_topk_pruned",
    "curate_corpus",
    "gopher_repetition",
    "pack_sequences",
    "chunk_documents",
    "tpch_q3",
]

#: Added in round 4: substring-span dedup, trained-codebook IVF, and
#: the boilerplate miners.
BENCH_QUERIES_R4 = [
    "dedup_substring",
    "ann_topk_ivf_trained",
    "frequent_ngrams",
    "strip_boilerplate",
]

#: Added in round 5: bigram LM scoring, containment dedup, the
#: skew-hardened token-budget mix, and the three post-window-freeze
#: additions (JSON rollup, DSIR scoring, shingle PageRank — registered
#: outside the 50-slot driver window, oracle-checked locally, driver
#: attestation lands r6).
BENCH_QUERIES_R5 = [
    "bigram_logprob",
    "dedup_containment",
    "token_budget_mix",
    "quality_percentile_gate",
    "semantic_dedup",
    "unigram_kl_drift",
    "json_props_rollup",
    "dsir_importance",
    "shingle_pagerank",
    "funnel_stages",
    "bpe_pair_counts",
    "cohort_retention",
    "tfidf_top_terms",
    "weighted_sample",
    "hopping_window_counts",
    "dedup_prefix_filter",
    "hll_distinct_users",
    "cms_heavy_hitters",
    "bloom_membership",
    "incremental_agg_merge",
    "hdr_quantile_sketch",
    "quality_classifier",
    "bucketed_join_stats",
    "scd2_history",
    "zorder_cells",
    "profile_orders",
    "skew_report_events",
    "expectations_lineitem",
    "url_canonicalize",
    "mad_outliers",
    "referential_audit",
    "tpch_q5",
    "tpch_q10",
    "profile_drift_documents",
    "orc_roundtrip",
    "winsor_bounds",
    "dpp_event_rollup",
    "copurchase_lift",
    "time_travel_read",
    "snapshot_change_feed",
    "ols_moments_events",
    "sql_interface",
    "pseudonymize_events",
    "sentence_split",
    "resample_ffill_daily",
    "max_concurrency_events",
    "unpivot_brand_metrics",
]

#: Per-query repetitions; min wall is reported. This box shows 3x+
#: minute-to-minute noise (neighbor steal — ROUND_NOTES); a single-shot
#: bench read in a noisy window recorded a phantom +13% regression in
#: r3. min-of-2 keeps the harness honest without doubling much wall
#: (JVM/codegen warm by rep 2). In effect from r4.
REPS = 2

#: Synthetic transcript conversations per sf unit (sf0.1 -> 10000 convs,
#: ~70k turns + the 700-turn skew tail).
CONVS_PER_SF = 100000


def sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name  # e.g. sf0.1
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _load1() -> float:
    """1-minute load average (Linux /proc; os.getloadavg fallback)."""
    try:
        return float(Path("/proc/loadavg").read_text().split()[0])
    except Exception:  # noqa: BLE001
        return os.getloadavg()[0]


def wait_for_quiet_window(threshold: float, max_wait_sec: float, poll_sec: float = 30.0) -> dict:
    """Block until ambient 1-min load drops below ``threshold`` (or the
    wait budget runs out) and return the evidence dict stamped into the
    bench JSON.

    Why: this box shows 3x+ minute-to-minute neighbor noise
    (ROUND_NOTES); BENCH_r04 was captured in a busy window and recorded
    >2x phantom regressions on plan-unchanged queries (r4 verdict
    What's wrong #3). Sampling BEFORE the Spark session starts means
    the reading is genuinely ambient (our own executors aren't in it);
    the recorded artifact then carries the load evidence so a noisy
    capture is visible instead of masquerading as a regression.
    """
    samples = [_load1()]
    waited = 0.0
    while samples[-1] >= threshold and waited < max_wait_sec:
        time.sleep(poll_sec)
        waited += poll_sec
        samples.append(_load1())
    return {
        "threshold": threshold,
        "samples": [round(s, 2) for s in samples[-10:]],
        "waited_sec": round(waited, 1),
        "quiet": samples[-1] < threshold,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default=",".join(BENCH_QUERIES + BENCH_QUERIES_R2 + BENCH_QUERIES_R3 + BENCH_QUERIES_R4 + BENCH_QUERIES_R5))
    ap.add_argument("--skip-transcripts", action="store_true")
    ap.add_argument(
        "--quiet-threshold",
        type=float,
        default=float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "1.0")),
        help="ambient 1-min load below which the box counts as quiet",
    )
    ap.add_argument(
        "--quiet-max-wait",
        type=float,
        default=float(os.environ.get("SPARK_GRAFT_QUIET_MAX_WAIT", "600")),
        help="max seconds to wait for a quiet window before proceeding anyway",
    )
    args = ap.parse_args()

    # Quiet-window gate (r4 verdict Next #3): sample ambient load before
    # the JVM exists, wait (bounded) for the box to go quiet, and stamp
    # the evidence into the artifact either way.
    quiet_gate = wait_for_quiet_window(args.quiet_threshold, args.quiet_max_wait)

    sf = sf_from_dir(args.sf_dir)
    # Bench-scale scans must split finely enough to use every core (the
    # 128 MB default bins a ~100 MB input into ~3 partitions).
    spark = build_session(
        app_name="bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )

    queries: dict[str, float] = {}
    total = 0.0

    # --- headline: end-to-end extraction throughput (turns/sec) ---------
    turns = 0
    extract_sec = 0.0
    if not args.skip_transcripts:
        n_convs = max(int(CONVS_PER_SF * sf), 50)
        pdf = generate_pandas(n_convs=n_convs, seed=42, make_skewed=True)
        turns = len(pdf)
        tdf = spark.createDataFrame(pdf, schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
        tdf.write.mode("overwrite").parquet("/tmp/bench_transcripts.parquet")
        src = spark.read.parquet("/tmp/bench_transcripts.parquet")
        # Warmup: same query shape on a slice — pays JVM codegen/JIT and
        # Python-worker spin-up once, so the timed run is steady-state.
        # Default plan: NO pre-shuffle (stage 1 is a per-turn map; the
        # salted repartition is the opt-in remedy for skewed input
        # layouts and costs one full-data shuffle).
        # FORCED materialization: count() on the extract output PRUNES
        # the ArrowEvalPython node entirely (verified r4: 0.4s pruned vs
        # 4.7s forced at local[8]) — rounds 1-3 timed the pruned plan,
        # so their extract_transcripts line and the derived throughput
        # overstate the end-to-end rate. From r4 the timing forces every
        # stage via the checksum aggregate (same device as
        # BENCH/run_scaling.py); compare r4+ extract numbers only
        # against other forced numbers.
        from pyspark.sql import functions as F

        def _force(df):
            return df.select(
                F.count("*").alias("n"),
                F.sum(F.length("clean_text")).alias("c"),
                F.sum(F.size("spans")).alias("s"),
            ).collect()[0]

        _force(extract(src.limit(2000)))
        extract_sec = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            row = _force(extract(src))
            extract_sec = min(extract_sec, time.perf_counter() - t0)
            assert row["n"] == turns, f"row mismatch {row['n']} != {turns}"
        queries["extract_transcripts"] = round(extract_sec, 3)
        total += extract_sec

    # --- operator suite over the sf tables -------------------------------
    for name in [q.strip() for q in args.queries.split(",") if q.strip()]:
        if name not in QUERIES:
            continue
        fn, _ = QUERIES[name]
        if name == "ann_topk_pruned":
            # Untimed warm-up: builds the bucket-partitioned store (an
            # INGEST-time cost by design — queries then prune it); the
            # timed run below measures the steady-state pruned scan.
            fn(spark, args.sf_dir).count()
        dt = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.count()
            dt = min(dt, time.perf_counter() - t0)
        queries[name] = round(dt, 3)
        total += dt

    throughput = round(turns / extract_sec, 1) if extract_sec else None
    r01_subtotal = sum(
        v for k, v in queries.items()
        if k not in BENCH_QUERIES_R2 and k not in BENCH_QUERIES_R3 and k not in BENCH_QUERIES_R4 and k not in BENCH_QUERIES_R5
    )
    print(
        json.dumps(
            {
                "metric": "total bench seconds (extraction + operator suite)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": args.cpus,
                "turns": turns,
                "extraction_throughput_turns_per_sec": throughput,
                "extract_timing": "forced-materialization (r4+; r1-r3 timed a UDF-pruned count plan)",
                "reps_per_query": REPS,
                "rep_agg": "min",
                # r1-r3 published "r01_comparable_subtotal_sec", whose
                # extract component was a UDF-pruned plan; with the
                # forced timing that key would read as a phantom
                # multi-second regression, so it is RETIRED. The
                # operators-only key below is genuinely comparable
                # across all rounds; the full subtotal including the
                # (now honest) extract gets a new, unambiguous name.
                "r01_operators_only_subtotal_sec": round(
                    r01_subtotal - queries.get("extract_transcripts", 0.0), 3
                ),
                "r01_subtotal_with_forced_extract_sec": round(r01_subtotal, 3),
                # Ambient-load evidence: `quiet_gate` is sampled BEFORE
                # the Spark session starts (genuinely ambient);
                # `ambient_load_post` is the 1-min load at the end (our
                # own 32 threads are in it — context, not a gate).
                "quiet_gate": quiet_gate,
                "ambient_load_post": round(_load1(), 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
