#!/usr/bin/env python
"""Token-budget-mix skew stress (r4 verdict Next #4): a 1M-doc corpus
where ONE language holds 80% of the rows — the realistic hot-language
shape (English ≈ half a web corpus) that makes a per-language window
sort the dominant stratum in a single task.

Runs the same mix twice on the same input: n_order_buckets=1 (the
naive one-window-task-per-language shape) vs the default 64 (md5-prefix
range buckets + broadcast prefix offsets), asserts the kept sets are
IDENTICAL (count + sum + xor-ish checksum of (id, cum_tokens)), and
reports both walls. Input synthesized with pure Spark expressions.

Usage: python BENCH/stress_token_mix.py [n_docs] [skew_frac]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from keras_ocr_spark.operators.curation import token_budget_mix  # noqa: E402
from keras_ocr_spark.plans.session import build_session  # noqa: E402

LANGS = ["de", "es", "fr", "zh"]


def synth(spark, n: int, skew: float):
    """n docs; `skew` fraction in 'en', the rest spread over 4 langs.
    Token counts vary 20..120 words, deterministic in the id."""
    thresh = int(1000 * skew)
    lang = F.when(F.pmod(F.xxhash64(F.col("id")), 1000) < thresh, F.lit("en")).otherwise(
        F.element_at(
            F.array(*[F.lit(l) for l in LANGS]),
            (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(len(LANGS))) + 1).cast("int"),
        )
    )
    n_words = (F.lit(20) + F.pmod(F.xxhash64(F.col("id") + 13), F.lit(101))).cast("int")
    text = F.array_join(F.transform(F.sequence(F.lit(1), n_words), lambda i: F.lit("w")), " ")
    return (
        spark.range(n)
        .repartition(max(64, n // 100_000))
        .select(F.col("id").alias("doc_id"), lang.alias("lang"), text.alias("text"))
    )


def run_once(docs, budgets, default_budget, n_buckets: int):
    t0 = time.time()
    out = token_budget_mix(docs, budgets, default_budget, n_order_buckets=n_buckets)
    row = out.agg(
        F.count("*").alias("n"),
        F.sum("cum_tokens").alias("s"),
        # bit_xor: order-independent row-set digest, no ANSI long overflow
        F.expr("bit_xor(xxhash64(id, cum_tokens))").alias("x"),
    ).collect()[0]
    return time.time() - t0, (row["n"], row["s"], row["x"])


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    skew = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    spark = build_session(
        app_name="stress_token_mix", master="local[32]", shuffle_partitions=max(64, n // 40_000)
    )
    docs = synth(spark, n, skew).persist()
    n_docs = docs.count()
    by_lang = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # budgets sized so the hot language genuinely truncates (~60% kept)
    budgets = {"en": int(n * skew * 70 * 0.6)}
    default = int(n * (1 - skew) / len(LANGS) * 70 * 0.6)

    # warm-up (JIT, shuffle service) on a slice, then timed runs
    run_once(docs.limit(50_000), budgets, default, 64)
    t_naive, sig_naive = run_once(docs, budgets, default, 1)
    t_bucketed, sig_bucketed = run_once(docs, budgets, default, 64)

    out = {
        "n_docs": n_docs,
        "skew_frac": skew,
        "hot_lang_rows": by_lang.get("en", 0),
        "naive_single_window_s": round(t_naive, 1),
        "bucketed_64_s": round(t_bucketed, 1),
        "speedup": round(t_naive / t_bucketed, 2),
        "kept_sets_identical": sig_naive == sig_bucketed,
        "kept_rows": sig_naive[0],
    }
    print(json.dumps(out))
    return 0 if sig_naive == sig_bucketed else 1


if __name__ == "__main__":
    raise SystemExit(main())
