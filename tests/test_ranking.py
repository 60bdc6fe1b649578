"""Distributed exact rank / ntile (operators/ranking.py): bit-parity
with the single-task window forms on randomized inputs (ties, N mod n
!= 0, few-rows-than-buckets), plus the plan audit — no single-partition
exchange anywhere."""

import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from keras_ocr_spark.operators.ranking import exact_ntile, with_global_rank


def _random_df(spark, n, n_distinct_values):
    random.seed(n * 31 + n_distinct_values)
    rows = [(i, float(random.randint(0, n_distinct_values))) for i in range(n)]
    random.shuffle(rows)
    return spark.createDataFrame(rows, "id long, val double")


class TestGlobalRank:
    def test_matches_row_number_window(self, spark):
        for n, dv in [(200, 50), (97, 5), (64, 64)]:
            df = _random_df(spark, n, dv)
            want = {
                r.id: r.rn
                for r in df.withColumn("rn", F.row_number().over(W.orderBy("val", "id"))).collect()
            }
            got = {r.id: r.global_rank for r in with_global_rank(df, ["val", "id"]).collect()}
            assert got == want, (n, dv)

    def test_empty(self, spark):
        df = spark.createDataFrame([], "id long, val double")
        assert with_global_rank(df, ["val", "id"]).count() == 0


class TestExactNtile:
    def test_matches_ntile_window(self, spark):
        # Covers uneven buckets (N mod n != 0) and heavy ties.
        for n, n_tiles in [(103, 4), (100, 4), (7, 10), (50, 3)]:
            df = _random_df(spark, n, 6)
            want = {
                r.id: r.q
                for r in df.withColumn("q", F.ntile(n_tiles).over(W.orderBy("val", "id"))).collect()
            }
            got = {r.id: r.q for r in exact_ntile(df, n_tiles, ["val", "id"]).collect()}
            assert got == want, (n, n_tiles)

    def test_no_single_partition_exchange(self, spark):
        df = _random_df(spark, 100, 10)
        plan = exact_ntile(df, 4, ["val", "id"])._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        # the one wide op is the hash exchange for the bucketed window
        assert "Window" in plan
