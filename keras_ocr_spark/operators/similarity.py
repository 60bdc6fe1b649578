"""Similarity search over an embedding column (``array<float>``).

Two paths, as a 100 TB pipeline needs both:

- **brute-force cosine top-k** — the exact baseline: one JVM-side pass
  computing dot/norms via higher-order functions (no Python), then a
  top-k. Correct at any scale, O(N) per query; use for small N or as
  the verifier for the bucketed path.
- **LSH-bucketed ANN** — random-hyperplane signs bucket vectors; queries
  only score their own bucket (and its neighbors). Hyperplanes are
  deterministic (seeded md5-derived pseudo-random components) so the
  index is reproducible and shippable via --py-files.

Also exact quantized-dot variants (integer arithmetic) used for the
cross-engine DuckDB oracles, where float summation order would otherwise
make hash-equality flaky.
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import dot_expr, norm_expr, quantized_dot_expr


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs one query vector.

    The query is a literal array (broadcast as part of the plan — no
    shuffle at all: scan -> project -> TakeOrderedAndProject, which does
    per-partition partial top-k then merges k rows on the driver).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine_expr(F.col(vec_col), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


def brute_force_topk_quantized(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Exact top-k by INTEGER-quantized dot product (cross-engine exact)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("id"),
        quantized_dot_expr(F.col(vec_col), q, scale).alias("qdot"),
    )
    return scored.orderBy(F.desc("qdot"), F.asc("id")).limit(k)


def _hyperplane(dim: int, seed: int) -> List[float]:
    """Deterministic pseudo-random unit hyperplane from md5 bytes
    (no RNG state, reproducible on every executor)."""
    vals: List[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        for j in range(0, 16, 2):
            if len(vals) >= dim:
                break
            u = int.from_bytes(h[j : j + 2], "big") / 65535.0  # [0,1]
            vals.append(2.0 * u - 1.0)
        i += 1
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


def lsh_bucket_expr(vec_col, dim: int, n_planes: int = 8, seed: int = 42):
    """Random-hyperplane LSH bucket id (0 .. 2^n_planes-1) as a column."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, seed * 1000 + p)])
        bucket = bucket + F.when(dot_expr(vec_col, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_topk_lsh(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket matches the
    query's bucket (candidate pruning — at 100 TB the bucket column is a
    partition key so non-matching files are never read)."""
    dim = len(query_vec)
    q_bucket = _lsh_bucket_py(list(query_vec), dim, n_planes, seed)
    bucketed = df.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), dim, n_planes, seed))
    cands = bucketed.filter(F.col("bucket") == F.lit(q_bucket))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cands.select(F.col(id_col).alias("id"), cosine_expr(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _lsh_bucket_py(vec: List[float], dim: int, n_planes: int, seed: int) -> int:
    bucket = 0
    for p in range(n_planes):
        plane = _hyperplane(dim, seed * 1000 + p)
        if sum(x * y for x, y in zip(vec, plane)) > 0:
            bucket |= 1 << p
    return bucket


def all_pairs_above(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket equi-join (NOT the
    quadratic cross join), then exact cosine filter on candidates."""
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_expr(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr(F.col("a.vec"), F.col("b.vec")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
