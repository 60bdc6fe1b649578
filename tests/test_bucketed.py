"""Bucketed-table co-located joins: the value contract is driver-
attested (`bucketed_join_stats` vs a flat DuckDB join). These pin what
the oracle can't see — the PLAN: a same-key same-N bucketed join has NO
Exchange on either input, and layout mismatches degrade to a correct
(shuffled) plan instead of wrong answers."""

import pytest
from pyspark.sql import functions as F

from keras_ocr_spark.sources import bucketed as B

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bkt"))
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey", "o_totalprice")
    c = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey", "c_mktsegment")
    B.write_bucketed(o, "t_bkt_o8", f"{root}/o8", "o_custkey", 8)
    B.write_bucketed(c, "t_bkt_c8", f"{root}/c8", "c_custkey", 8)
    B.write_bucketed(c, "t_bkt_c4", f"{root}/c4", "c_custkey", 4)
    return o, c


def _join_agg(o, c):
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


class TestBucketedJoin:
    def test_join_inputs_are_exchange_free(self, spark, tables):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("t_bkt_o8").join(
                spark.table("t_bkt_c8"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # neither side shuffles
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_post_join_agg_shuffles_only_on_its_own_key(self, spark, tables):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            agg = _join_agg(spark.table("t_bkt_o8"), spark.table("t_bkt_c8"))
            plan = agg._jdf.queryExecution().executedPlan().toString()
            exchanges = [l for l in plan.splitlines() if "Exchange" in l]
            assert len(exchanges) == 1 and "c_mktsegment" in exchanges[0]
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_values_identical_to_flat_join(self, spark, tables):
        o, c = tables
        flat = {r.c_mktsegment: r.n for r in _join_agg(o, c).collect()}
        bkt = {
            r.c_mktsegment: r.n
            for r in _join_agg(spark.table("t_bkt_o8"), spark.table("t_bkt_c8")).collect()
        }
        assert flat == bkt

    def test_mismatched_bucket_counts_stay_correct(self, spark, tables):
        o, c = tables
        flat = {r.c_mktsegment: r.n for r in _join_agg(o, c).collect()}
        mixed = {
            r.c_mktsegment: r.n
            for r in _join_agg(spark.table("t_bkt_o8"), spark.table("t_bkt_c4")).collect()
        }
        assert flat == mixed

    def test_ensure_bucketed_is_idempotent(self, spark, tables, tmp_path):
        calls = []

        def build():
            calls.append(1)
            return spark.read.parquet(f"{SF}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            )

        for _ in range(2):
            B.ensure_bucketed(spark, build, "t_bkt_idem", str(tmp_path / "i"), "c_custkey", 4)
        assert len(calls) == 1  # second call reused the catalog entry

    def test_validation(self, spark, tables):
        o, _ = tables
        with pytest.raises(ValueError):
            B.write_bucketed(o, "t_bad", "/tmp/x", "o_custkey", 0)
