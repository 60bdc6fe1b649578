"""Physical-plan shape audits — the scale story, checked in CI.

Asserts properties of `.explain()` output that matter at 100 TB:
- column pruning reaches the parquet scan (ReadSchema carries only what
  the plan needs);
- exactly ONE Python boundary (stage-1 ArrowEvalPython); stage 2 and the
  reassembly prep stay JVM-side;
- pure-expression operators (textstats, simhash, minhash signatures)
  have NO exchange and NO Python nodes at all;
- the flagship (fused) plan is MAP-ONLY — zero exchanges; the exploded
  variant keeps exactly one (the per-turn aggregation) with map-side
  partial aggregation before it.
"""

import re

import pytest
from pyspark.sql import functions as F

from keras_ocr_spark.operators import dedup as D
from keras_ocr_spark.operators import textstats as TS
from keras_ocr_spark.plans.pipeline import extract


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def n_nodes(plan: str, name: str) -> int:
    """Count physical nodes by their detail headers — the formatted
    explain prints each node twice (tree + '(k) Name' detail)."""
    return len(re.findall(rf"\(\d+\) {name}\b", plan))


@pytest.fixture(scope="module")
def transcripts_path(spark, tmp_path_factory):
    from keras_ocr_spark.sources.transcripts import generate_pandas

    p = str(tmp_path_factory.mktemp("plan") / "t.parquet")
    spark.createDataFrame(
        generate_pandas(n_convs=5, make_skewed=False),
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).write.parquet(p)
    return p


class TestFlagshipPlan:
    def test_column_pruning_reaches_scan(self, spark, transcripts_path):
        df = extract(spark.read.parquet(transcripts_path))
        plan = plan_of(df)
        m = re.search(r"ReadSchema: (\S+)", plan)
        assert m, plan
        read_schema = m.group(1)
        assert "text" in read_schema and "conv_id" in read_schema
        # role/tool/ts must NOT be read — 3 of 6 columns pruned at the scan.
        assert "role" not in read_schema and "tool" not in read_schema and "ts" not in read_schema

    def test_single_python_boundary(self, spark, transcripts_path):
        df = extract(spark.read.parquet(transcripts_path))
        plan = plan_of(df)
        assert n_nodes(plan, "ArrowEvalPython") == 1  # stage 1 only
        assert "BatchEvalPython" not in plan  # no row-at-a-time Python

    def test_default_plan_is_map_only(self, spark, transcripts_path):
        # The fused plan has NO shuffle: a turn's spans sit together in
        # one array cell, so re-association is per-row.
        df = extract(spark.read.parquet(transcripts_path))  # n_salt=0
        plan = plan_of(df)
        assert n_nodes(plan, "Exchange") == 0

    def test_exploded_variant_single_shuffle_with_partial_agg(self, spark, transcripts_path):
        # The span-row variant keeps the flatten-then-re-slice shape:
        # one exchange, with map-side partial collect_list BEFORE it.
        from keras_ocr_spark.plans.pipeline import extract_exploded

        plan = plan_of(extract_exploded(spark.read.parquet(transcripts_path)))
        assert n_nodes(plan, "Exchange") == 1
        assert "partial_collect_list" in plan
        exchange_id = int(re.search(r"\((\d+)\) Exchange\b", plan).group(1))
        partial_block = plan[: plan.index("partial_collect_list")]
        partial_id = int(re.findall(r"\((\d+)\) \w+", partial_block)[-1])
        assert partial_id < exchange_id

    def test_salting_adds_exactly_one_exchange(self, spark, transcripts_path):
        df = extract(spark.read.parquet(transcripts_path), n_salt=8)
        plan = plan_of(df)
        assert n_nodes(plan, "Exchange") == 1

    def test_wholestage_codegen_covers_decode(self, spark, transcripts_path):
        # Codegen-mode explain lists the fused subtrees (AQE hides them
        # pre-execution, so toggle it off just for the inspection).
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            df = extract(spark.read.parquet(transcripts_path))
            cg = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
        assert m and int(m.group(1)) >= 1, cg[:500]


class TestExpressionOperatorsStayJvmSide:
    @pytest.fixture(scope="class")
    def docs(self, spark, tmp_path_factory):
        # Parquet-backed (a createDataFrame source would put
        # 'applySchemaToPythonRDD' in the scan node and trip the
        # no-Python assertion for the wrong reason).
        p = str(tmp_path_factory.mktemp("docs") / "docs.parquet")
        spark.createDataFrame(
            [(i, f"word{i} alpha beta gamma delta") for i in range(10)], "doc_id int, text string"
        ).write.parquet(p)
        return spark.read.parquet(p)

    @pytest.mark.parametrize(
        "build",
        [
            lambda d: TS.lang_scores(d),
            lambda d: TS.quality_scores(d),
            lambda d: TS.token_counts(d),
            lambda d: TS.fingerprints(d),
            lambda d: D.minhash_signatures_sql(d),
            lambda d: D.simhash_fingerprints_sql(d),
        ],
        ids=["lang", "quality", "tokens", "fingerprint", "minhash_sigs", "simhash_sql_twin"],
    )
    def test_no_python_no_shuffle(self, docs, build):
        plan = plan_of(build(docs))
        assert "Python" not in plan  # pure JVM expressions
        assert "Exchange" not in plan  # map-only: scan -> project


class TestSinglePandasUdfEvaluation:
    """Regression pins for the r3 double-evaluation wastes: a pandas-UDF
    projection filtered on its OWN output gets its null-filter pushed
    below an upstream exchange by Catalyst, duplicating the
    ArrowEvalPython node (observed python=2 for minhash, python=4 for
    the near-dup self-join). Both operators now avoid it structurally."""

    @pytest.fixture(scope="class")
    def docs(self, spark, tmp_path_factory):
        p = str(tmp_path_factory.mktemp("udfdocs") / "docs.parquet")
        spark.createDataFrame(
            [(i, f"word{i} alpha beta gamma delta epsilon") for i in range(20)],
            "doc_id int, text string",
        ).write.parquet(p)
        return spark.read.parquet(p)

    def test_minhash_signatures_single_arrow_node_under_repartition(self, spark, docs):
        # The registered query repartitions before signing (_docs());
        # reproduce that shape and assert exactly ONE Arrow boundary.
        df = D.minhash_signatures(docs.repartition(8))
        plan = plan_of(df)
        assert n_nodes(plan, "ArrowEvalPython") == 1, plan
        # Filter must act on the raw input, not the UDF output.
        assert "BatchEvalPython" not in plan

    def test_minhash_precondition_matches_kernel_nulls(self, spark, docs):
        # The input-side precondition (non-null text, >= k words) must
        # exclude exactly the rows the kernel would map to NULL.
        edge = docs.union(
            spark.createDataFrame(
                [(100, None), (101, "two words"), (102, "a b c")], "doc_id int, text string"
            )
        )
        out = D.minhash_signatures(edge, k=3)
        ids = {r.id for r in out.select("id").collect()}
        assert 100 not in ids and 101 not in ids  # null / too short dropped
        assert 102 in ids and 0 in ids
        assert out.filter(F.col("signature").isNull()).count() == 0

    def test_all_pairs_above_join_plan_has_no_python(self, spark):
        from keras_ocr_spark.operators import similarity as S

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        df = S.all_pairs_above(emb, threshold=0.8, fast=True)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the bucket kernel is materialized once via lazy localCheckpoint;
        # the self-join scans the RDD — zero Python nodes in the join plan
        assert "EvalPython" not in plan, plan[:1500]
        assert "CartesianProduct" not in plan
        # and values are unchanged vs the pure-expression twin
        slow = S.all_pairs_above(emb, threshold=0.8, fast=False)
        assert sorted(map(tuple, df.collect())) == sorted(map(tuple, slow.collect()))


class TestFilterPushdown:
    def test_predicate_reaches_parquet(self, spark, transcripts_path):
        df = spark.read.parquet(transcripts_path).filter(F.col("role") == "user").select("conv_id")
        plan = plan_of(df)
        assert "PushedFilters: [IsNotNull(role), EqualTo(role,user)]" in plan


class TestNoAccidentalCartesian:
    """Blanket guarantee over the ENTIRE driver contract: no query plan
    contains a CartesianProduct, and BroadcastNestedLoopJoin appears only
    where a single-row broadcast side is the intended plan (the ANN
    queries broadcast the 1-row query vector / probe-cell list)."""

    #: Queries where a BNLJ against a broadcast 1-row side is the design.
    ALLOW_BNLJ = {
        "ann_cosine_topk",
        "ann_topk_quantized",
        "ann_topk_multiprobe",
        "ann_topk_ivf",
        # same 1-row-broadcast BNLJ design (query vector + probe cells)
        # over the Lloyd-refined codebook.
        "ann_topk_ivf_trained",
        # single-row broadcast of the corpus stats (N, avgdl, dfs) —
        # the same 1-row-side BNLJ design as the ANN queries.
        "bm25_search",
        # r6: string min/max split into a grouping-free 1-row aggregate
        # attached by a 1-row broadcast, so the Expand multi-distinct
        # aggregate stays hash-based (string agg buffers forced the
        # whole aggregate to SortAggregate).
        "profile_orders",
        "profile_drift_documents",
        # 1-row broadcast of the unigram grand total onto the
        # vocabulary-sized frequency table (both tiny).
        "unigram_logprob",
        # 1-row broadcast of the vocabulary size onto the scoring join
        # (same shape as unigram_logprob's grand-total broadcast).
        "bigram_logprob",
        # 1-row broadcast of (n_a, n_b, V) totals onto the
        # vocabulary-sized counts frame (same 1-row-side shape).
        "unigram_kl_drift",
        # 1-row broadcast of (n_t, n_all) totals onto the
        # n_buckets-row term table (same 1-row-side shape).
        "dsir_importance",
        # 1-row broadcast of the corpus size N onto the tf⋈df frame
        # (same 1-row-side shape).
        "tfidf_top_terms",
        # 1-row broadcast of the (n_rows, n_keys) totals onto the
        # <= top_k heavy-hitter rows (same 1-row-side shape).
        "skew_report_events",
        # 1-row broadcast of n_baskets onto the pair-count frame
        # (same 1-row-side shape).
        "copurchase_lift",
    }
    #: Execute a streaming job on invocation — plans inspected in their own tests.
    SKIP = {
        "sessionize_stateful",
        "stream_windowed_counts",
        "stream_dedup_keys",
        "stream_stream_attribution",
    }

    def test_no_cartesian_any_query(self, spark):
        from keras_ocr_spark.driver_queries import QUERIES

        bad = []
        for name, (fn, _sql) in QUERIES.items():
            if name in self.SKIP:
                continue
            plan = fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
            if "CartesianProduct" in plan:
                bad.append((name, "CartesianProduct"))
            if "BroadcastNestedLoopJoin" in plan and name not in self.ALLOW_BNLJ:
                bad.append((name, "BroadcastNestedLoopJoin"))
        assert not bad, bad


class TestBucketPartitionedAnnPruning:
    """The pruned-scan half of the ANN scale story (r2 verdict
    Missing #2): a bucket-partitioned store + a driver-side probe list
    must reach the parquet scan as PartitionFilters pruning to exactly
    n_planes+1 of the 2^n_planes bucket directories."""

    def test_partition_filters_prune_probe_set(self, spark, tmp_path):
        from keras_ocr_spark.operators import similarity as S

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        store = str(tmp_path / "ann_store")
        S.write_bucketed_store(emb.filter(F.col("vec_id") != 0), store, dim=64, n_planes=6, seed=42)
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
        out = S.ann_topk_pruned(spark, store, qvec, k=10, n_planes=6, seed=42, max_hamming=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[bucket#\d+ IN \(([\d,]+)\)\]", plan)
        assert m, plan[:1500]
        probes = {int(x) for x in m.group(1).split(",")}
        assert len(probes) == 7  # n_planes + 1 of 2^6 = 64 buckets
        assert probes == set(S.probe_buckets(S.lsh_bucket_py(qvec, 6, 42), 6, 1))
        # and the pruned result equals the full-scan multiprobe answer
        # (same scoring: integer-quantized dot, ties to lowest id)
        from keras_ocr_spark.functions.hashing import quantized_dot_expr

        qb = S.lsh_bucket_py(qvec, 6, 42)
        qcol = F.array(*[F.lit(float(x)) for x in qvec])
        full = (
            emb.filter(F.col("vec_id") != 0)
            .withColumn("bucket", S.lsh_bucket_udf(64, 6, 42)(F.col("embedding")))
            .filter(F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qb))) <= 1)
            .select(F.col("vec_id").alias("id"), quantized_dot_expr(F.col("embedding"), qcol).alias("qdot"))
            .orderBy(F.desc("qdot"), F.asc("id"))
            .limit(10)
        )
        got = [(r.id, r.qdot) for r in out.collect()]
        want = [(r.id, r.qdot) for r in full.collect()]
        assert got == want


class TestAqeSkewJoin:
    def test_skewed_join_is_split_by_aqe(self, spark, tmp_path):
        """The north rule's runtime skew remedy: a join where 90% of the
        probe side shares one key must show skew=true (split partitions)
        in the FINAL adaptive plan. Thresholds are scaled down to fire
        at test size; the same knobs govern the 100 TB configuration."""
        # Runtime-settable AQE knobs on the shared session; restored after.
        knobs = {
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        saved = {k: spark.conf.get(k, None) for k in knobs}
        for k, v in knobs.items():
            spark.conf.set(k, v)
        try:
            left = spark.range(200000).select(
                F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            )
            right = spark.range(1000).select(
                F.col("id").alias("k"), F.md5((F.col("id") + 5).cast("string")).alias("dim")
            )
            j = left.join(right, "k").select(F.count("*").alias("n"), F.sum(F.crc32("payload")).alias("c"))
            row = j.collect()[0]  # executing THIS DataFrame finalizes ITS adaptive plan
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert row["n"] == 200000
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestDynamicPartitionPruning:
    """dpp_event_rollup's scale claim: the fact scan is pruned at
    RUNTIME by the dim's broadcast result, not statically."""

    def test_dpp_expression_reaches_partition_filters(self, spark, tmp_path):
        import re

        from pyspark.sql import functions as F

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        path = str(tmp_path / "ev_by_type")
        ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
        fact = spark.read.parquet(path)
        dim = ev.filter(F.col("value") > 400).select("event_type").distinct()
        j = fact.join(dim, "event_type").groupBy("event_type").count()
        matched = [r.event_type for r in dim.collect()]
        got = [r.event_type for r in j.collect()]
        assert sorted(got) == sorted(matched)
        plan = j._jdf.queryExecution().executedPlan().toString()
        pf = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
        assert pf and "dynamicpruningexpression" in pf.group(0), plan[:2000]


class TestJoinStrategyHints:
    """The three join strategies on the SAME equi-join, selected via
    hints, all value-identical: the knob a 100 TB pipeline turns when
    Catalyst's size estimates are wrong (e.g. a post-filter fact that
    statistics still size at scan bytes). SHUFFLE_HASH beats SORT_MERGE
    when one side fits a per-partition hash map (no sort); BROADCAST
    removes the fact-side exchange entirely."""

    @pytest.fixture(scope="class")
    def sides(self, spark):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        return li.select("l_orderkey", "l_quantity"), orders.select("o_orderkey", "o_orderpriority")

    def _join(self, li, orders, hint):
        return li.join(orders.hint(hint) if hint else orders,
                       li["l_orderkey"] == orders["o_orderkey"])

    @pytest.mark.parametrize(
        "hint,node",
        [
            ("broadcast", "BroadcastHashJoin"),
            ("shuffle_hash", "ShuffledHashJoin"),
            ("merge", "SortMergeJoin"),
        ],
    )
    def test_hint_selects_strategy_and_values_agree(self, spark, sides, hint, node):
        li, orders = sides
        j = self._join(li, orders, hint)
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert node in plan, (hint, plan[:800])
        chk = j.agg(
            F.expr("count(*)"), F.expr("bit_xor(xxhash64(l_orderkey, l_quantity, o_orderpriority))")
        ).collect()[0]
        base = self._join(li, orders, None).agg(
            F.expr("count(*)"), F.expr("bit_xor(xxhash64(l_orderkey, l_quantity, o_orderpriority))")
        ).collect()[0]
        assert tuple(chk) == tuple(base)
