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
