#!/usr/bin/env python
"""Prefix-filter (All-Pairs/PPJoin) exact-Jaccard stress at 10-100x the
bench corpus.

The sf corpora and the curation stress use tiny vocabularies, which is
the WORST case for exact all-pairs joins (every shingle is corpus-hot).
Real web text is the opposite — a Zipf head plus a long tail of rare
shingles — and prefix filtering's pruning power comes exactly from that
tail. This harness synthesizes a corpus with both regimes present:

- vocabulary: 30% of word draws come from a 100-word hot head, 70% from
  a 50k-word tail (pure Spark expressions, xxhash64-driven — no driver
  data);
- planted truth: ids with ``id % 50 < 3`` share their block's base body
  (40-80 words) plus a 1-3 word per-id mutation tail -> n/50 planted
  near-dup triples with pairwise Jaccard >= ~0.8.

Pass criteria: every planted pair is found at t=0.75 (the operator is
PROVEN equal to the naive join in pytest; the stress checks the pruned
plan holds that exactness at scale), candidate counts stay near the
planted truth (the hot head must NOT explode candidate generation —
hot shingles sort last in the frequency order and fall out of every
prefix), wall + counts recorded, no OOM.

Usage: python BENCH/stress_prefix_filter.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from keras_ocr_spark.operators import dedup as D  # noqa: E402
from keras_ocr_spark.plans.session import build_session  # noqa: E402

HEAD_WORDS = 100
TAIL_WORDS = 50_000
THRESHOLD = 0.75


def synth_docs(spark, n: int):
    """Zipf-ish corpus with planted near-dup triples (see module doc)."""
    base = F.when(F.col("id") % 50 < 3, F.col("id") - F.col("id") % 50).otherwise(F.col("id"))
    n_words = (F.lit(40) + F.pmod(base, F.lit(40))).cast("int")

    def word(seed_col, i):
        h = F.xxhash64(F.concat_ws("-", seed_col, i.cast("string")))
        hot = F.pmod(h, F.lit(10)) < 3
        idx = F.when(hot, F.pmod(F.shiftright(h, 4), F.lit(HEAD_WORDS))).otherwise(
            F.lit(HEAD_WORDS) + F.pmod(F.shiftright(h, 4), F.lit(TAIL_WORDS))
        )
        return F.concat(F.lit("w"), idx.cast("string"))

    body = F.transform(F.sequence(F.lit(1), n_words), lambda i: word(base.cast("string"), i))
    tail = F.transform(
        F.sequence(F.lit(1), (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")),
        lambda i: word(F.concat(F.lit("m"), F.col("id").cast("string")), i),
    )
    return (
        spark.range(n)
        .repartition(max(64, n // 100_000))
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", F.concat(body, tail)).alias("text"))
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    shuffle = max(64, min(512, n // 40_000))
    spark = build_session(app_name="stress_prefix", master="local[32]", shuffle_partitions=shuffle)
    docs = synth_docs(spark, n).persist()
    t0 = time.time()
    n_docs = docs.count()
    t_synth = time.time() - t0

    t0 = time.time()
    pairs = D.prefix_filter_jaccard_pairs(docs, threshold=THRESHOLD).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    # Planted-pair coverage, checked DISTRIBUTED: both ends in the same
    # 50-block with id % 50 < 3.
    planted_found = pairs.filter(
        (F.col("id_a") % 50 < 3)
        & (F.col("id_b") % 50 < 3)
        & (F.col("id_a") - F.col("id_a") % 50 == F.col("id_b") - F.col("id_b") % 50)
    ).count()
    n_blocks = n // 50
    expected = 3 * n_blocks
    background = n_pairs - planted_found

    out = {
        "n_docs": n_docs,
        "threshold": THRESHOLD,
        "wall_synth_s": round(t_synth, 1),
        "wall_pairs_s": round(t_pairs, 1),
        "pairs_total": n_pairs,
        "planted_expected": expected,
        "planted_found": planted_found,
        "planted_recall": round(planted_found / expected, 6) if expected else None,
        "background_pairs": background,
        "shuffle_partitions": shuffle,
    }
    print(json.dumps(out))
    ok = expected == 0 or planted_found == expected
    if not ok:
        print(f"FAIL: planted coverage {planted_found}/{expected}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
