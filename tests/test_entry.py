"""Driver-contract smoke: entry() runs and returns rows; every query is
callable; oracle keys are a subset of query keys (the driver pairs them).
The full Spark-vs-DuckDB value comparison lives in
scripts/check_oracles.py (run separately — it is the driver's gate)."""

import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location("spark_entry", REPO / "__spark_entry__.py")
entry_mod = importlib.util.module_from_spec(spec)
sys.modules["spark_entry"] = entry_mod
spec.loader.exec_module(entry_mod)

SF_SMOKE = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"conv_id", "turn_idx", "clean_text", "n_spans"}


def test_queries_and_oracles_align(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 62
    assert set(oracles) <= set(qs)
    # Every registered query carries an exact DuckDB oracle, except the
    # genuinely non-SQL-expressible ones (driver runs rows-only there).
    ROWS_ONLY = {"compression_ratio"}  # zlib deflate: DuckDB has no equal
    assert set(qs) - set(oracles) == ROWS_ONLY


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_each_query_is_lazy_plannable(spark, name):
    # Building the plan must not error (execution checked by check_oracles).
    df = entry_mod.queries()[name](spark, SF_SMOKE)
    assert df.columns


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_documents_shape_precondition_for_extract_oracle(sf):
    """The extract_documents / eval_score oracles assume the synthetic
    documents (a) contain no markup chars ('<', '&') so the decode chain
    is the identity beyond ws-collapse, and (b) are long enough that
    every doc survives the size threshold and the eval span offsets
    (>= 41 chars). If the testdata generator ever changes shape, THIS
    test names the oracles to revisit instead of letting them silently
    rot (ADVICE.md round-1, item 5)."""
    import duckdb

    path = f"/root/testdata/{sf}/documents.parquet"
    if not Path(path).exists():
        pytest.skip(f"no {sf} testdata")
    bad, minlen = duckdb.sql(
        f"SELECT sum(CASE WHEN text LIKE '%<%' OR text LIKE '%&%' THEN 1 ELSE 0 END), min(length(text)) "
        f"FROM read_parquet('{path}')"
    ).fetchone()
    assert bad == 0, "documents now contain markup chars: extract_documents oracle is invalid"
    assert minlen >= 41, "documents shorter than eval_score span offsets: eval oracle is invalid"
