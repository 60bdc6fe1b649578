"""Mergeable-sketch properties: HLL (distinct) and Count-Min (frequency).

The cross-engine VALUE contract is attested by the driver oracles
(`hll_distinct_users`, `cms_heavy_hitters` — every register/cell and the
HLL estimator reproduce bit-for-bit in DuckDB).  These tests pin the
sketch-theoretic guarantees the oracle can't express: error bounds,
mergeability, overestimate-only behavior, and bounded sketch size.
"""

import pytest
from pyspark.sql import functions as F

from keras_ocr_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def ids(spark):
    # 2000 distinct user ids, each appearing 1-3 times (duplicates must
    # not move the registers).
    rows = [(i % 2000,) for i in range(4700)]
    return spark.createDataFrame(rows, "user_id long").withColumn("g", F.lit("all"))


class TestHLL:
    def test_estimate_within_standard_error_band(self, spark, ids):
        out = SK.hll_distinct(ids, ["g"], "user_id", b=6).collect()[0]
        # m=64 -> relative standard error ~1.04/sqrt(64) = 13%; allow 3 sigma.
        assert abs(out.hll_estimate - 2000) / 2000 < 0.39
        assert out.n_buckets == 64  # 2000 >> 64 buckets: all occupied

    def test_duplicates_do_not_move_registers(self, spark, ids):
        once = ids.dropDuplicates(["user_id"])
        r_dup = {(r.bucket): r.reg for r in SK.hll_registers(ids, ["g"], "user_id").collect()}
        r_once = {(r.bucket): r.reg for r in SK.hll_registers(once, ["g"], "user_id").collect()}
        assert r_dup == r_once

    def test_merge_equals_sketch_of_union(self, spark, ids):
        a = ids.filter(F.col("user_id") < 1200)
        b = ids.filter(F.col("user_id") >= 800)  # overlapping shards
        ra = SK.hll_registers(a, ["g"], "user_id")
        rb = SK.hll_registers(b, ["g"], "user_id")
        merged = {r.bucket: r.reg for r in SK.hll_merge(ra, rb, ["g"]).collect()}
        union = {r.bucket: r.reg for r in SK.hll_registers(ids, ["g"], "user_id").collect()}
        assert merged == union

    def test_b_validation(self, spark, ids):
        with pytest.raises(ValueError):
            SK.hll_registers(ids, ["g"], "user_id", b=0)

    def test_register_count_bounded(self, spark, ids):
        assert SK.hll_registers(ids, ["g"], "user_id", b=4).count() <= 16


@pytest.fixture(scope="module")
def corpus(spark):
    # 'hot' appears 500 times; w0..w199 appear 1-8 times each.
    rows = [(0, " ".join(["hot"] * 500))]
    rows += [(i + 1, " ".join(f"w{j}" for j in range(200) if j % (i + 1) == 0)) for i in range(8)]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCMS:
    def test_never_undercounts_and_finds_planted_hitter(self, spark, corpus):
        tok = corpus.select(F.explode(F.split("text", " ")).alias("word"))
        truth = {r.word: r.n for r in tok.groupBy("word").agg(F.count("*").alias("n")).collect()}
        top = SK.cms_heavy_hitters(corpus, "text", d=4, w=256, top_n=5).collect()
        assert top[0].word == "hot" and top[0].cms_count >= 500
        est = SK.cms_estimate(
            tok.distinct(), SK.cms_sketch(tok, "word"), "word"
        ).collect()
        for r in est:
            assert r.cms_count >= truth[r.word]  # CMS never undercounts

    def test_sketch_size_bounded_by_d_times_w(self, spark, corpus):
        tok = corpus.select(F.explode(F.split("text", " ")).alias("word"))
        assert SK.cms_sketch(tok, "word", d=3, w=64).count() <= 3 * 64

    def test_shard_sketches_add(self, spark, corpus):
        tok = corpus.select(F.explode(F.split("text", " ")).alias("word"))
        sa = SK.cms_sketch(corpus.filter("doc_id < 4").select(F.explode(F.split("text", " ")).alias("word")), "word")
        sb = SK.cms_sketch(corpus.filter("doc_id >= 4").select(F.explode(F.split("text", " ")).alias("word")), "word")
        merged = {(r.row, r.bucket): r.cnt for r in SK.cms_merge(sa, sb).collect()}
        full = {(r.row, r.bucket): r.cnt for r in SK.cms_sketch(tok, "word").collect()}
        assert merged == full

    def test_probe_plan_broadcasts_the_sketch(self, spark, corpus):
        plan = (
            SK.cms_heavy_hitters(corpus, "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    def test_validation(self, spark, corpus):
        tok = corpus.select(F.explode(F.split("text", " ")).alias("word"))
        with pytest.raises(ValueError):
            SK.cms_sketch(tok, "word", d=0)
