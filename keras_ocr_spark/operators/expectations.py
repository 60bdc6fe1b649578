"""Data-contract expectation suite: rule violations in ONE scan.

The validation sibling of ``operators/profile.py``: where the profiler
describes a table, this CHECKS it against declared rules — the
great-expectations-style gate a pipeline runs on every ingest batch
before letting 100 TB flow downstream. Rules are SQL predicate strings
(portable: the same text runs on Spark and on the DuckDB oracle); all
rules evaluate in ONE aggregate over ONE scan (a rule per job is N
scans), then the single result row pivots long via ``stack`` — rows =
rules, driver-light, no collect.

Null semantics are the strict gate form: a row where the predicate is
NULL (e.g. a NULL operand) counts as a VIOLATION — ``NOT coalesce(pred,
false)`` — because a contract a row cannot prove is a contract it does
not meet. Document rules accordingly (add explicit ``IS NULL`` arms to
permit nulls).

Scale shape: no Expand (no distinct-aggregates), no shuffle beyond the
single-row final aggregate; every predicate stays inside whole-stage
codegen. ``violation_ppm`` is integer parts-per-million (``div``) so
the report is engine-portable with no float rendering.

Reference analog: the dataset sanity checks the reference performs
before training (label legibility/alphabet filters,
/root/reference/keras_ocr/datasets.py:438-444), generalized to a
declarative rule table.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Evaluate ``rules`` — ``(rule_name, sql_predicate)`` pairs — in one
    scan. Returns one row per rule, in declaration order:
    ``rule_idx, rule_name, n_rows, n_violations, violation_ppm, passed``
    (``passed`` = 1 when the rule has zero violations, else 0).
    """
    if not rules:
        raise ValueError("at least one rule is required")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    for n in names:
        # names are spliced into the stack() literal list — keep them
        # identifier-like so a quote can't break the expression.
        if not _re.fullmatch(r"[A-Za-z0-9_.\- ]+", n):
            raise ValueError(f"rule name must be identifier-like: {n!r}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, pred) in enumerate(rules):
        bad = ~F.coalesce(F.expr(pred), F.lit(False))
        # coalesce: sum over ZERO rows is NULL, not 0 — an empty batch
        # must report 0 violations / passed, not a NULL row.
        aggs.append(F.coalesce(F.sum(bad.cast("long")), F.lit(0)).alias(f"_v{i}"))
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"{i}L, '{name}', _v{i}" for i, (name, _) in enumerate(rules)
    )
    return (
        one.select(
            "_n",
            F.expr(
                f"stack({len(rules)}, {stacked}) as (rule_idx, rule_name, n_violations)"
            ),
        )
        .select(
            "rule_idx",
            "rule_name",
            F.col("_n").cast("long").alias("n_rows"),
            F.col("n_violations").cast("long").alias("n_violations"),
            F.expr(
                "if(_n = 0, 0L, n_violations * 1000000L div _n)"
            ).alias("violation_ppm"),
            F.expr("if(n_violations = 0, 1L, 0L)").alias("passed"),
        )
    )
