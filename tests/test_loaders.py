"""Dataset-loader tests (datasets.py recasts): CSV scan + split union,
JSON scan + filters + limit, blank-line sessionized text grouping."""

import pytest

from keras_ocr_spark.sources.loaders import load_csv_labels, load_grouped_text, load_json_annotations


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("loaders")
    (d / "train.csv").write_text('img1.jpg,0,5,"hello"\nimg2.jpg,3,9,"world"\n')
    (d / "test.csv").write_text('img3.jpg,1,4,"abc"\n')
    (d / "anns.json").write_text(
        "\n".join(
            [
                '{"image_id":"a","text":"hi","language":"english","legibility":"legible","percent_complete":0.9}',
                '{"image_id":"b","text":"lo","language":"french","legibility":"legible","percent_complete":0.9}',
                '{"image_id":"c","text":"xx","language":"english","legibility":"illegible","percent_complete":0.9}',
                '{"image_id":"d","text":"yy","language":"english","legibility":"legible","percent_complete":0.2}',
                '{"image_id":"e","text":"zz","language":"english","legibility":"legible","percent_complete":0.8}',
            ]
        )
    )
    (d / "gt.txt").write_text("line one\nline two\n\nline three\n\n\nline four\nline five\n")
    return d


def test_csv_union_splits(spark, data_dir):
    df = load_csv_labels(spark, str(data_dir / "train.csv"), str(data_dir / "test.csv"))
    rows = sorted((r.filepath, r.word, r.split) for r in df.collect())
    assert rows == [("img1.jpg", "hello", 0), ("img2.jpg", "world", 0), ("img3.jpg", "abc", 1)]


def test_json_filters_and_limit(spark, data_dir):
    df = load_json_annotations(spark, str(data_dir / "anns.json"))
    assert sorted(r.image_id for r in df.collect()) == ["a", "e"]
    assert load_json_annotations(spark, str(data_dir / "anns.json"), limit=1).count() == 1
    loose = load_json_annotations(
        spark, str(data_dir / "anns.json"), english_only=False, legible_only=False, min_complete=0.0
    )
    assert loose.count() == 5


def test_grouped_text_sessionization(spark, data_dir):
    df = load_grouped_text(spark, str(data_dir / "gt.txt"))
    groups = sorted([tuple(r.lines) for r in df.collect()])
    assert groups == [("line four", "line five"), ("line one", "line two"), ("line three",)]


class TestLayout:
    def test_compaction_hits_target_and_clusters(self, spark, tmp_path):
        """Small-files compaction: 64 tiny files -> ~planned file count;
        clustering makes per-file conv_id ranges disjoint (file pruning
        evidence for key predicates)."""
        from keras_ocr_spark.sources.layout import cluster_stats, compact, plan_num_files
        from keras_ocr_spark.sources.transcripts import generate_pandas

        src = str(tmp_path / "fragmented")
        out = str(tmp_path / "compacted")
        pdf = generate_pandas(n_convs=300, make_skewed=False)
        spark.createDataFrame(
            pdf, schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        ).repartition(64).write.parquet(src)

        res = compact(spark, src, out, target_file_mb=1, cluster_cols=["conv_id", "turn_idx"])
        assert res["files_before"] == 64
        assert res["files_after"] == res["planned_files"] == plan_num_files(res["bytes"], 1)
        assert res["files_after"] < res["files_before"]

        # same rows, exactly once
        assert spark.read.parquet(out).count() == len(pdf)

        # clustering: per-file conv_id ranges must be non-overlapping
        # (range partitioning) -> a conv_id predicate touches ~1 file.
        ranges = sorted(
            (r.key_min, r.key_max) for r in cluster_stats(spark, out, "conv_id").collect()
        )
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, (hi1, lo2)

    def test_compact_without_clustering(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from keras_ocr_spark.sources.layout import compact

        src = str(tmp_path / "frag2")
        out = str(tmp_path / "comp2")
        spark.range(10000).withColumn("s", F.md5(F.col("id").cast("string"))).repartition(
            32
        ).write.parquet(src)
        res = compact(spark, src, out, target_file_mb=64)
        assert res["files_after"] == 1  # tiny data -> one file
        assert spark.read.parquet(out).count() == 10000


class TestOrcRoundtrip:
    def test_lossless_and_filter_pushed(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from keras_ocr_spark.sources.tableio import read_orc, write_orc

        src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        path = str(tmp_path / "docs_orc")
        write_orc(src, path)
        back = read_orc(spark, path)
        # lossless: same rows, same schema, same content checksum
        assert back.schema == src.schema
        chk = lambda df: df.select(  # noqa: E731
            F.expr(f"bit_xor(xxhash64({', '.join(sorted(df.columns))}))").alias("x")
        ).collect()[0].x
        assert back.count() == src.count() and chk(back) == chk(src)
        # predicate reaches the ORC scan (min/max pushdown works)
        plan = (
            back.filter(F.col("n_chars") >= 100)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(n_chars), GreaterThanOrEqual(n_chars,100)]" in plan


class TestJsonlCorruptRows:
    """read_jsonl's documented malformed-row contract, exercised: in
    PERMISSIVE mode with an explicit schema a corrupt line becomes an
    all-NULL row unless the schema appends _corrupt_record (then the
    raw line is captured there); FAILFAST aborts on the first bad
    line."""

    @pytest.fixture()
    def dirty_path(self, tmp_path):
        p = tmp_path / "dirty.jsonl"
        p.write_text(
            '{"doc_id": 1, "text": "ok one"}\n'
            "{this is not json}\n"
            '{"doc_id": 3, "text": "ok three"}\n'
        )
        return str(p)

    def test_permissive_captures_corrupt_record(self, spark, dirty_path):
        from keras_ocr_spark.sources.tableio import read_jsonl

        df = read_jsonl(
            spark, dirty_path, "doc_id long, text string, _corrupt_record string"
        ).cache()  # Spark requires caching to query _corrupt_record alone
        try:
            bad = df.filter("_corrupt_record IS NOT NULL").collect()
            good = df.filter("_corrupt_record IS NULL").collect()
            assert len(bad) == 1 and bad[0]._corrupt_record.startswith("{this")
            assert sorted(r.doc_id for r in good) == [1, 3]
        finally:
            df.unpersist()

    def test_failfast_aborts(self, spark, dirty_path):
        with pytest.raises(Exception) as ei:
            spark.read.schema("doc_id long, text string").option(
                "mode", "FAILFAST"
            ).json(dirty_path).collect()
        assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
