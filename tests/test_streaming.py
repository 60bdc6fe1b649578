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


def test_stateful_sessionize_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted by
    the stream equal the batch window sessionization minus each user's
    final (still-open) session. Files arrive in time order (3 chunks)
    so state genuinely carries sessions ACROSS micro-batches."""
    import time as _time
    from pathlib import Path

    import duckdb
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from keras_ocr_spark.streaming.sessionize import sessionize_batch, sessionize_stream

    src = str(tmp_path / "events_landing")
    Path(src).mkdir()
    # Split the sf0.001 events into 3 time-ordered parquet FILES with
    # increasing mtimes (the file source processes oldest-first).
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev AS SELECT user_id, ts, value FROM read_parquet('/root/testdata/sf0.001/events.parquet') ORDER BY ts"
    )
    n = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    cut1, cut2 = n // 3, 2 * n // 3
    for i, (lo, hi) in enumerate([(0, cut1), (cut1, cut2), (cut2, n)]):
        con.execute(
            f"COPY (SELECT * FROM ev ORDER BY ts LIMIT {hi - lo} OFFSET {lo}) TO '{src}/chunk{i}.parquet' (FORMAT PARQUET)"
        )
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_minutes=30, timeout_ms=600_000)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events, round(r.total_value, 2))
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }

    batch = sessionize_batch(spark.read.parquet(src), gap_minutes=30)
    w_last = F.max("session_start_us").over(Window.partitionBy("user_id"))
    all_but_open = batch.withColumn("_last", w_last).filter(F.col("session_start_us") != F.col("_last"))
    expect = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events, round(r.total_value, 2))
        for r in all_but_open.collect()
    }
    assert got == expect
    assert len(got) > 50  # non-trivial session count
