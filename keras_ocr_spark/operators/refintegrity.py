"""Referential-integrity audit: FK orphan counts across a schema graph.

The multi-table sibling of ``operators/expectations.py``: for each
declared foreign-key edge ``fact.fk -> dim.key``, count the fact rows
whose non-NULL key has NO match in the dimension. The audit every
warehouse runs after ingest, before letting joins silently drop (inner)
or null-expand (outer) the orphans downstream.

Semantics per edge (SQL convention):
- a NULL foreign key is NOT an orphan — it's the absence of a
  reference; reported separately as ``n_null_fk`` so the contract
  "fk must also be NOT NULL" can be layered via check_expectations;
- ``n_orphans`` counts non-NULL keys missing from the dim;
- ``orphan_ppm`` is integer parts-per-million over the NON-NULL keys.

Shape per edge: one LEFT join of the fact's key column against the
DISTINCT dim keys (dedup is required for correctness — a duplicated
dim key would multiply fact rows and inflate every count), then a
single-row conditional aggregate; edges are unioned. Catalyst
broadcasts small dims; a big-dim edge degrades to a key-only shuffle
join — the fact side carries ONE column into it, so the exchange
payload is minimal at 100 TB. Rows never leave the JVM.
"""

from __future__ import annotations

from functools import reduce
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FkEdge(NamedTuple):
    name: str
    fact: DataFrame
    fk: str
    dim: DataFrame
    key: str


def referential_audit(edges: list[FkEdge]) -> DataFrame:
    """One row per declared edge, in declaration order:
    ``edge_idx, edge_name, n_rows, n_null_fk, n_orphans, orphan_ppm,
    passed`` (``passed`` = 1 iff zero orphans)."""
    if not edges:
        raise ValueError("at least one edge is required")
    names = [e.name for e in edges]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate edge names: {names}")
    parts = []
    for i, e in enumerate(edges):
        fact = e.fact.select(F.col(e.fk).alias("_fk"))
        dim = e.dim.select(F.col(e.key).alias("_dk")).distinct().withColumn(
            "_hit", F.lit(1)
        )
        joined = fact.join(dim, fact["_fk"] == dim["_dk"], "left")
        orphan = F.col("_fk").isNotNull() & F.col("_hit").isNull()
        parts.append(
            joined.agg(
                F.count(F.lit(1)).alias("_n"),
                F.coalesce(
                    F.sum(F.col("_fk").isNull().cast("long")), F.lit(0)
                ).alias("_nn"),
                F.coalesce(F.sum(orphan.cast("long")), F.lit(0)).alias("_no"),
            ).select(
                F.lit(i).cast("long").alias("edge_idx"),
                F.lit(e.name).alias("edge_name"),
                F.col("_n").cast("long").alias("n_rows"),
                F.col("_nn").cast("long").alias("n_null_fk"),
                F.col("_no").cast("long").alias("n_orphans"),
                F.expr(
                    "if(_n - _nn = 0, 0L, _no * 1000000L div (_n - _nn))"
                ).alias("orphan_ppm"),
                F.expr("if(_no = 0, 1L, 0L)").alias("passed"),
            )
        )
    return reduce(DataFrame.unionByName, parts)
