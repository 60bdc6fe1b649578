#!/usr/bin/env python
"""Curation-pipeline stress: the full near-dup flow (minhash LSH ->
exact-Jaccard verify -> large/small-star closure -> keeper filter ->
quality gate) at 20x the sf0.1 bench corpus, with planted duplicate
clusters — the curate_corpus composition, scaled.

Input: 100k documents synthesized ENTIRELY with Spark expressions
(spark.range -> per-row word synthesis from xxhash64 of the doc id; no
driver-side data). 3 of every 50 docs share a base text plus a small
per-id mutation suffix -> ~2k planted near-dup clusters of size 3
(Jaccard ~0.9) the closure must find, on top of whatever the
background collides.

Records wall per phase, scan partitions, output counts; the pass
criterion is exactness (every planted triple lands in one cluster with
one keeper) with no OOM — same bar as BENCH/stress_embeddings.py.

Usage: python BENCH/stress_curation.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from keras_ocr_spark.operators import dedup as D  # noqa: E402
from keras_ocr_spark.operators import packing as P  # noqa: E402
from keras_ocr_spark.operators import textstats as TS  # noqa: E402
from keras_ocr_spark.operators.clusters import resolve_duplicates  # noqa: E402
from keras_ocr_spark.plans.session import build_session  # noqa: E402

VOCAB = (
    "spark table scan merge join filter window agg sort key row data group "
    "batch stream line part column query value small big fast slow dup the a"
).split()


def synth_docs(spark, n: int):
    """Deterministic corpus, pure expressions: ids [0, n); docs whose
    id % 50 < 3 share the text of base id (id - id%50) plus a per-id
    mutation tail -> planted near-dup triples."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = F.when(F.col("id") % 50 < 3, F.col("id") - F.col("id") % 50).otherwise(F.col("id"))
    n_words = (F.lit(40) + F.pmod(base, F.lit(40))).cast("int")
    word = lambda seed_col, i: F.element_at(  # noqa: E731
        vocab, (F.pmod(F.xxhash64(F.concat_ws("-", seed_col, i.cast("string"))), F.lit(len(VOCAB))) + 1).cast("int")
    )
    body = F.transform(F.sequence(F.lit(1), n_words), lambda i: word(base.cast("string"), i))
    tail = F.transform(
        F.sequence(F.lit(1), (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")),
        lambda i: word(F.concat(F.lit("m"), F.col("id").cast("string")), i),
    )
    return (
        spark.range(n)
        .repartition(max(64, n // 100_000))
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", F.concat(body, tail)).alias("text"),
        )
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    # Partition counts scale with the corpus so the 10M-doc run's
    # ~700M-digest shuffle doesn't pile ~11M rows into each of 64
    # reducers: ~40k docs per shuffle partition, capped at 512.
    shuffle = max(64, min(512, n // 40_000))
    spark = build_session(app_name="stress_curation", master="local[32]", shuffle_partitions=shuffle)
    docs = synth_docs(spark, n).persist()
    t0 = time.time()
    n_docs = docs.count()
    t_synth = time.time() - t0

    t0 = time.time()
    pairs = D.minhash_dedup_pairs(docs, threshold=0.5, max_bucket_size=10_000).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    t0 = time.time()
    resolved = resolve_duplicates(docs, pairs, id_col="doc_id").persist()
    n_clusters = resolved.filter("is_keeper").count()
    t_resolve = time.time() - t0

    # Leakage-safe split over the resolved clusters (r4 operator; r4
    # verdict Next #5 asks for it at this scale). Same computation as
    # operators/clusters.leakage_safe_split but over the ALREADY
    # persisted `resolved` frame (the operator re-runs the closure from
    # (docs, pairs); the operator itself is oracle-checked — this
    # phase's job is the at-scale invariant, not re-deriving closure).
    # Invariant checked DISTRIBUTED: no cluster straddles the split.
    t0 = time.time()
    is_test = F.substring(F.md5(F.col("keeper_id").cast("string")), 1, 1).isin("0", "1", "2", "3")
    split_df = resolved.select(
        "id", "keeper_id", F.when(is_test, F.lit("test")).otherwise(F.lit("train")).alias("split")
    ).persist()
    split_counts = {r["split"]: r["n"] for r in split_df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    straddle = (
        split_df.groupBy("keeper_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    t_split = time.time() - t0

    t0 = time.time()
    keepers = resolved.filter("is_keeper").select("id")
    quality = TS.quality_scores(docs).select("id", "quality")
    survivors = keepers.join(quality, "id").filter(F.col("quality") >= 0.5).persist()
    n_curated = survivors.count()
    t_gate = time.time() - t0

    # Sequence packing over the curated survivors (r3 verdict Next #7:
    # curate + pack END-TO-END at 10x): token counts from the kept
    # docs, GPT-style concat-and-chunk layout via the 3-phase
    # distributed prefix sum. Correctness cross-check: the last doc's
    # cum_before + its tokens must equal the total token count.
    t0 = time.time()
    toks = survivors.join(TS.token_counts(docs).select("id", "n_ws_tokens"), "id").select(
        "id", F.col("n_ws_tokens").cast("long").alias("n_tokens")
    )
    packed = P.pack_chunks(toks, "n_tokens", ["id"], capacity=2048)
    total_tokens = toks.agg(F.sum("n_tokens")).collect()[0][0] or 0
    last = packed.orderBy(F.desc("id")).limit(1).collect()
    packed_ok = bool(last) and last[0]["cum_before"] + last[0]["n_tokens"] == total_tokens
    n_chunks = (total_tokens + 2047) // 2048
    t_pack = time.time() - t0

    # Exact substring-span dedup over the full corpus (r4 operator):
    # planted triples share their 40+-word base text, so duplicated
    # 5-gram spans must cover nearly the whole body of every planted
    # doc. One gram-digest count shuffle over ~n_docs x ~70 grams.
    t0 = time.time()
    ss = D.substring_dup_stats(docs, k=5)
    planted_dup_frac = (
        ss.join(docs.select((F.col("doc_id") % 50 < 3).alias("p"), "doc_id"),
                ss["id"] == F.col("doc_id"))
        .filter("p")
        .agg(F.avg("dup_frac")).collect()[0][0]
    )
    t_substr = time.time() - t0

    # Recall on the planted triples. The CLOSURE is exact over the
    # pairs found (union-find parity in CI); the PAIRS stage is
    # probabilistic by design — at Jaccard ~0.9 and 4 bands x 4 rows,
    # P(pair captured) = 1-(1-0.9^4)^4 ~ 0.986, so a handful of the
    # 2k triples may split. The bar is recall >= 99.5%; raising
    # n_bands buys the tail at more hashing.
    planted = resolved.withColumn("base", F.col("id") - F.col("id") % 50).filter(
        F.col("id") % 50 < 3
    )
    n_triples = planted.select("base").distinct().count()
    split = (
        planted.groupBy("base")
        .agg(F.countDistinct("keeper_id").alias("nk"))
        .filter(F.col("nk") > 1)
        .count()
    )
    recall = 1.0 - split / max(n_triples, 1)

    out = {
        "n_docs": n_docs,
        "synth_s": round(t_synth, 1),
        "near_dup_pairs": n_pairs,
        "pairs_s": round(t_pairs, 1),
        "clusters_incl_singletons": n_clusters,
        "resolve_s": round(t_resolve, 1),
        "curated_survivors": n_curated,
        "gate_s": round(t_gate, 1),
        "split_train": int(split_counts.get("train", 0)),
        "split_test": int(split_counts.get("test", 0)),
        "clusters_straddling_split": straddle,
        "split_s": round(t_split, 1),
        "shuffle_partitions": shuffle,
        "packed_total_tokens": int(total_tokens),
        "packed_chunks": int(n_chunks),
        "packed_prefix_sum_exact": packed_ok,
        "pack_s": round(t_pack, 1),
        "substring_planted_dup_frac": round(float(planted_dup_frac or 0), 4),
        "substring_s": round(t_substr, 1),
        "planted_triples": n_triples,
        "triples_split_by_lsh_miss": split,
        "planted_triple_recall": round(recall, 4),
        "scan_partitions": docs.rdd.getNumPartitions(),
    }
    print(json.dumps(out))
    return 0 if (recall >= 0.995 and packed_ok and (planted_dup_frac or 0) > 0.9 and straddle == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
