"""copurchase_pairs: values are driver-attested (`copurchase_lift`,
full DuckDB mirror incl. the integer lift contract). These pin the
pair math against a Python reference, the whole-basket cap exclusion,
dedup of repeated items, and the plan (no cartesian; the one BNLJ is
the 1-row n_baskets broadcast)."""

import itertools
from collections import Counter

import pytest

from keras_ocr_spark.operators.basket import copurchase_pairs

BASKETS = {
    "o1": ["a", "b", "c"],
    "o2": ["a", "b"],
    "o3": ["a", "b", "b"],  # repeated item -> counted once
    "o4": ["c"],
    "o5": ["a", "b", "c", "d"],
}


def _py_pairs(baskets, cap):
    kept = {b: sorted(set(i)) for b, i in baskets.items() if len(set(i)) <= cap}
    n = len(kept)
    ic = Counter(i for items in kept.values() for i in items)
    pc = Counter(p for items in kept.values() for p in itertools.combinations(items, 2))
    out = {}
    for (a, b), c in pc.items():
        out[(a, b)] = (c, ic[a], ic[b], n, c * 1_000_000 // ic[a] * n // ic[b])
    return out


@pytest.fixture(scope="module")
def df(spark):
    rows = [(b, i) for b, items in BASKETS.items() for i in items]
    return spark.createDataFrame(rows, "basket string, item string")


class TestCopurchasePairs:
    def test_matches_python_reference(self, spark, df):
        want = _py_pairs(BASKETS, cap=100)
        got = copurchase_pairs(df, "basket", "item", top_k=100).collect()
        assert len(got) == len(want)
        for r in got:
            assert want[(r.item_a, r.item_b)] == (
                r.pair_count, r.count_a, r.count_b, r.n_baskets, r.lift_x1e6
            ), (r.item_a, r.item_b)

    def test_cap_excludes_whole_basket(self, spark, df):
        # cap=3 drops o5 (4 distinct items) ENTIRELY: no (c, d) pair and
        # every count recomputed without o5.
        want = _py_pairs(BASKETS, cap=3)
        got = {(r.item_a, r.item_b): r for r in
               copurchase_pairs(df, "basket", "item", max_items_per_basket=3, top_k=100).collect()}
        assert ("c", "d") not in got
        assert got[("a", "b")].pair_count == want[("a", "b")][0] == 3
        assert got[("a", "b")].n_baskets == 4

    def test_ordering_and_top_k(self, spark, df):
        rows = copurchase_pairs(df, "basket", "item", top_k=2).collect()
        assert [(r.item_a, r.item_b) for r in rows] == [("a", "b"), ("a", "c")]

    def test_plan_no_cartesian_one_bnlj(self, spark):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        out = copurchase_pairs(li, "l_orderkey", "l_partkey")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_validation(self, spark, df):
        with pytest.raises(ValueError):
            copurchase_pairs(df, "basket", "item", max_items_per_basket=1)
        with pytest.raises(ValueError):
            copurchase_pairs(df, "basket", "item", top_k=0)
