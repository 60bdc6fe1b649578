#!/usr/bin/env python
"""10x+ embedding stress (r2 verdict Next #10): synthesize 1M vectors
(200x the sf0.1 embeddings table), run the headline ANN/near-dup paths
at that scale, and report wall time / candidate volumes / no-OOM.
Mirrors the 3.5M-turn extraction stress: same plan shapes as the
registered queries, just more data — with the ONE knob the design says
must scale with the corpus turned: the LSH plane count.

- **near-dup pairs**: numpy bucket kernel -> ONE equi-join on bucket ->
  exact cosine on candidates. At 1M vectors, 6 planes (64 buckets — the
  sf setting) would put ~15.6k vectors in every bucket and expand
  ~7.8e9 in-bucket pairs; the operator's scale story is buckets ∝ N, so
  the stress runs n_planes=16 (65,536 buckets, ~15 vectors/bucket).
- **multiprobe ANN**: UDF bucket column + bit_count(xor) <= 1 filter +
  integer-quantized top-k — the registered ann_topk_multiprobe shape.
- **bucket-partitioned store**: ingest write (n_planes=6: 64 partition
  directories — the partition key stays coarse; 2^16 dirs would be a
  small-files antipattern) + the partition-pruned probe query.

Usage: python BENCH/stress_embeddings.py [n_vectors] [dim]
Input parquet cached at /tmp/stress_embeddings.parquet.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from keras_ocr_spark.functions.hashing import quantized_dot_expr  # noqa: E402
from keras_ocr_spark.operators import similarity as S  # noqa: E402
from keras_ocr_spark.plans.session import build_session  # noqa: E402


def synth(spark, path: str, n: int, dim: int, seed: int = 7):
    """Deterministic near-dup-structured vectors: n/5 cluster
    directions, 5 jittered members each (so the candidate volume is
    realistic, not a planted worst case)."""
    if Path(path).exists():
        try:
            if spark.read.parquet(path).count() == n:
                return
        except Exception:  # noqa: BLE001
            pass
    rng = np.random.default_rng(seed)
    n_clusters = max(n // 5, 1)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    rows_per_chunk = 100_000
    mode = "overwrite"
    for start in range(0, n, rows_per_chunk):
        m = min(rows_per_chunk, n - start)
        cid = rng.integers(0, n_clusters, m)
        vecs = centers[cid] + 0.05 * rng.standard_normal((m, dim)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        pdf = pd.DataFrame({"vec_id": np.arange(start, start + m), "embedding": list(vecs)})
        spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>").write.mode(
            mode
        ).parquet(path)
        mode = "append"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = build_session(app_name="stress_embeddings", master="local[32]")
    path = "/tmp/stress_embeddings.parquet"
    t0 = time.perf_counter()
    synth(spark, path, n, dim)
    synth_sec = time.perf_counter() - t0

    emb = spark.read.parquet(path).repartition(64)
    out = {"n_vectors": n, "dim": dim, "synth_sec": round(synth_sec, 1)}

    # --- near-dup pairs: bucketed equi-join, planes scaled to N ----------
    t0 = time.perf_counter()
    pairs = S.all_pairs_above(emb, threshold=0.98, n_planes=16, seed=42, dim=dim)
    out["neardup_pairs"] = pairs.count()
    out["neardup_sec"] = round(time.perf_counter() - t0, 1)
    out["neardup_n_planes"] = 16

    # --- multiprobe ANN: registered-query shape at 1M --------------------
    qvec = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    qb = S.lsh_bucket_py(qvec, 16, 42)
    qcol = F.array(*[F.lit(float(x)) for x in qvec])
    t0 = time.perf_counter()
    topk = (
        emb.withColumn("bucket", S.lsh_bucket_udf(dim, 16, 42)(F.col("embedding")))
        .filter(F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qb))) <= 1)
        .select(F.col("vec_id").alias("id"), quantized_dot_expr(F.col("embedding"), qcol).alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc("id"))
        .limit(10)
    )
    rows = topk.collect()
    out["multiprobe_sec"] = round(time.perf_counter() - t0, 1)
    out["multiprobe_top1_id"] = int(rows[0]["id"])

    # --- bucket-partitioned store: ingest + pruned query ------------------
    store = "/tmp/stress_ann_store"
    t0 = time.perf_counter()
    S.write_bucketed_store(emb, store, dim=dim, n_planes=6, seed=42)
    out["store_write_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    pruned_rows = S.ann_topk_pruned(spark, store, qvec, k=10, n_planes=6, seed=42).collect()
    out["pruned_query_sec"] = round(time.perf_counter() - t0, 1)
    out["pruned_top1_id"] = int(pruned_rows[0]["id"])

    # --- SemDeDup at scale: k scaled so cells stay small ------------------
    # codebook = every Nth vector (deterministic sample), k = n/2000 so
    # the mean cell holds ~2000 vectors (the Gram kernel then does
    # ~2000^2/2 int64 multiply-adds per cell — the paper's regime where
    # k grows with N); with the 5-member jittered clusters in synth(),
    # threshold 0.95 collapses most clusters to their outlier member.
    k_cells = max(n // 2000, 16)
    stride = max(n // k_cells, 1)
    cb = (
        emb.filter((F.col("vec_id") % stride == 0) & (F.col("vec_id") < stride * k_cells))
        .select((F.col("vec_id") / stride).cast("long").alias("centroid_id"),
                F.col("embedding").alias("centroid"))
    )
    t0 = time.perf_counter()
    surv = S.semantic_dedup(emb, cb, threshold=0.95)
    out["semdedup_survivors"] = surv.count()
    out["semdedup_sec"] = round(time.perf_counter() - t0, 1)
    out["semdedup_k"] = k_cells
    out["semdedup_dropped"] = n - out["semdedup_survivors"]

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
