"""Duplicate-cluster resolution: candidate pairs -> connected components
-> one keeper per cluster.

The dedup family (``operators.dedup``, ``operators.similarity``) emits
near-duplicate PAIRS; an actual 100 TB curation pipeline must then drop
rows, which needs the transitive closure — if a~b and b~c, then {a,b,c}
is ONE cluster with ONE keeper, even though (a,c) may never have been a
candidate pair. Graft analog: the reference de-duplicates overlapping
detections with set semantics (``/root/reference/keras_ocr/detection.py:
432-438``); this lifts that from one image's boxes to a corpus-sized
graph.

Algorithm: **alternating large-star / small-star** iterated equi-joins
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) — the shuffle-friendly classic:

- ``large-star``: every node connects its LARGER neighbors to the
  minimum of its closed neighborhood.
- ``small-star``: every node connects its smaller-or-equal neighbors to
  that minimum.

Both are one ``groupBy(node).min`` plus one equi-join re-emitting edges
— no collects, no driver-side graph, no GraphFrames dependency. The
edge set only ever shrinks toward a star per component, converging in
O(log n) rounds even on adversarial chains (plain min-label
propagation needs O(diameter) rounds — a 10^6-long chain would need
10^6 shuffles; this needs ~20).

Scale notes:
- Each round is TWO shuffles (a groupBy and a join share the ``u``
  partitioning, Catalyst reuses the exchange) over the EDGE set, which
  for dedup is tiny relative to the corpus (pairs, not rows).
- Lineage is truncated per round (``localCheckpoint``) — without it
  the plan doubles per iteration and optimizer time explodes by round
  ~8. On a real cluster use a reliable ``checkpoint()`` dir instead;
  the seam is one flag.
- Convergence is detected by an order-independent edge-set checksum
  (count + xor of per-edge xxhash64), one tiny action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Edges as (u, v) with u > v, self-loops dropped, distinct."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"),
            F.least("u", "v").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def large_star(edges: DataFrame) -> DataFrame:
    """Large-star: for each node u, connect every neighbor v > u to
    m = min(N(u) + {u}). Emitted edges are (v, m). One groupBy + one
    equi-join on u."""
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("mv", "u").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient edges high->low; for each node u, connect
    every smaller neighbor v (and u itself) to m = min(N(u)). Emitted
    edges are (v, m) and (u, m)."""
    directed = _canonical(edges)  # u > v on every row
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    via = directed.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    own = mins.select("u", F.col("m").alias("v"))
    return via.union(own)


def _checksum(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("x"),
    ).collect()[0]
    return (row["n"], row["x"])


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """(id_a, id_b) pair DataFrame -> (id, component) with component =
    the minimum id in the connected component. Only ids that appear in
    at least one pair are returned (callers union in singletons — see
    :func:`resolve_duplicates`).

    ``max_iterations`` is a backstop: alternation converges in
    O(log n); 25 rounds covers >10^7-node components. Raises if the
    checksum still moves at the cap (never observed; indicates a
    non-deterministic id column).
    """
    edges = _canonical(pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")))
    if use_local_checkpoint:
        # Materialize the INPUT edges before iterating: each star round
        # references the edge set several times (union + both join
        # sides), so an expensive upstream pair pipeline (LSH candidates
        # + Jaccard verification) would otherwise recompute 4x inside
        # the first round's plan.
        edges = edges.localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iterations):
        edges = _canonical(small_star(large_star(edges)))
        if use_local_checkpoint:
            edges = edges.localCheckpoint(eager=True)
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")
    # Converged state is a star per component: every edge is
    # (member, root). The roots themselves are their own component.
    members = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    return members.union(roots)


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Full dedup resolution: every row of ``df`` gets its cluster
    keeper (the minimum id of its near-dup component; itself when it
    has no near-dups) and the cluster size.

    Output: (id, keeper_id, cluster_size, is_keeper). Downstream, a
    100 TB pipeline keeps ``is_keeper`` rows — one filter drops all
    duplicates. The join back to ``df`` is a left join on the id; the
    component side is pairs-sized (ids that had at least one
    candidate), so at corpus scale it is far smaller than ``df`` and
    usually broadcastable.
    """
    comp = connected_components(pairs, id_a, id_b)
    resolved = (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("keeper_id"))
    )
    sizes = resolved.groupBy("keeper_id").agg(F.count("*").alias("cluster_size"))
    return resolved.join(sizes, "keeper_id").select(
        "id",
        "keeper_id",
        "cluster_size",
        (F.col("id") == F.col("keeper_id")).alias("is_keeper"),
    )


def best_keeper(
    resolved: DataFrame,
    priority: DataFrame,
    priority_col: str = "quality",
) -> DataFrame:
    """Quality-aware keeper selection: re-elect each cluster's keeper
    as the member with the HIGHEST ``priority_col`` (id ascending as
    the tie-break) instead of the minimum id.

    A real curation pipeline keeps the best near-duplicate, not the
    numerically smallest one — the cleanest extraction of a re-crawled
    page, the longest of two truncations. Input: the output of
    :func:`resolve_duplicates` (``id, keeper_id, cluster_size,
    is_keeper``) plus a ``(id, priority_col)`` frame. One join + one
    ``max_by`` aggregation keyed by the cluster (partial aggregation
    shrinks the shuffle to one row per cluster); the min-id
    ``keeper_id`` stays as the stable CLUSTER LABEL, while
    ``best_id``/``is_best`` carry the election.

    Output: (id, keeper_id, cluster_size, best_id, is_best).
    """
    # LEFT joins throughout (r3 ADVICE): a document absent from the
    # priority frame scores NULL, which sorts below every non-null
    # priority in the max_by struct ordering — "missing = lowest
    # priority" — instead of being silently dropped from the output.
    # Ties among all-missing clusters fall through to the -id field
    # (lowest id wins), and coalesce(best_id, keeper_id) keeps the
    # contract that every input row appears exactly once even if the
    # aggregation ever yields no row for a cluster.
    scored = resolved.join(priority.select("id", priority_col), "id", "left")
    best = scored.groupBy("keeper_id").agg(
        F.max_by("id", F.struct(F.col(priority_col), (-F.col("id")).alias("_nid"))).alias("best_id")
    )
    return (
        resolved.join(best, "keeper_id", "left")
        .select(
            "id",
            "keeper_id",
            "cluster_size",
            F.coalesce("best_id", "keeper_id").alias("best_id"),
            (F.col("id") == F.coalesce("best_id", "keeper_id")).alias("is_best"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    test_nibbles: tuple = ("0", "1", "2", "3"),
) -> DataFrame:
    """Contamination-safe train/test split: the side is decided by the
    md5 of the CLUSTER label (the min-id keeper from
    :func:`resolve_duplicates`), so every member of a near-dup cluster
    lands on the SAME side — the split a real eval pipeline needs,
    because a random per-document split leaks near-duplicates of test
    documents into train (the failure mode contamination checks then
    have to catch after the fact).

    ``test_nibbles`` selects which first-md5-nibble values go to test
    (default 4/16 = 25% expected, deterministic and engine-stable).
    One extra projection over resolve_duplicates — no additional
    shuffle. Output: (id, keeper_id, split).
    """
    resolved = resolve_duplicates(df, pairs, id_col=id_col)
    is_test = F.substring(F.md5(F.col("keeper_id").cast("string")), 1, 1).isin(*test_nibbles)
    return resolved.select(
        "id",
        "keeper_id",
        F.when(is_test, F.lit("test")).otherwise(F.lit("train")).alias("split"),
    )
