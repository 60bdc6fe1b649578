"""Streaming pipeline smoke: file-stream source -> stages 1+2 ->
foreachBatch reassembly sink, driven synchronously with availableNow
(the guide's local pattern). Output must equal the batch pipeline on the
same input — streaming and batch share the same operator code."""

import pytest

from keras_ocr_spark.plans.pipeline import extract
from keras_ocr_spark.sources.transcripts import generate_pandas
from keras_ocr_spark.streaming import read_transcript_stream, start_extraction, turn_rate_monitor


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    pdf = generate_pandas(n_convs=8, make_skewed=False)
    sdf = spark.createDataFrame(
        pdf, schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    sdf.repartition(3).write.mode("overwrite").parquet(str(d / "transcripts"))
    return d


def test_stream_equals_batch(spark, landing, tmp_path):
    src = str(landing / "transcripts")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = start_extraction(read_transcript_stream(spark, src, max_files_per_trigger=1), out, ckpt)
    q.awaitTermination(120)

    stream_rows = {
        (r.conv_id, r.turn_idx): r.clean_text for r in spark.read.parquet(out).collect()
    }
    batch_rows = {
        (r.conv_id, r.turn_idx): r.clean_text for r in extract(spark.read.parquet(src)).collect()
    }
    assert stream_rows == batch_rows


def test_replayed_epoch_is_idempotent(spark, landing, tmp_path):
    """A micro-batch replay (failure between write and offset commit)
    re-invokes the sink with the SAME epoch_id — the per-epoch overwrite
    must leave exactly one copy, not append a duplicate."""
    from pyspark.sql import functions as F

    from keras_ocr_spark.operators.decode import decode
    from keras_ocr_spark.operators.detect import detect
    from keras_ocr_spark.streaming.extract_stream import epoch_sink

    src = str(landing / "transcripts")
    out = str(tmp_path / "replay_out")
    spans = decode(detect(spark.read.parquet(src).select("conv_id", "turn_idx", "text")))
    epoch_sink(spans, 0, out)
    once = spark.read.parquet(out).count()
    epoch_sink(spans, 0, out)  # replay of the same epoch
    again = spark.read.parquet(out)
    assert again.count() == once
    assert again.select("conv_id", "turn_idx").distinct().count() == once
    assert again.select(F.col("epoch_id")).distinct().count() == 1


def test_watermarked_monitor_plan(spark, landing):
    stream = read_transcript_stream(spark, str(landing / "transcripts"))
    agg = turn_rate_monitor(stream)
    assert agg.isStreaming
    assert "window" in agg.columns and "n_turns" in agg.columns
