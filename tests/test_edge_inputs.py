"""Edge-input hardening: nulls, empty strings, whitespace-only and
single-char texts must flow through every text operator without
crashing, with sensible (documented) outputs. A 100 TB corpus always
contains these rows; an operator that throws on them kills the stage."""

import pytest
from pyspark.sql import functions as F

from keras_ocr_spark.operators import dedup as D
from keras_ocr_spark.operators import encode as E
from keras_ocr_spark.operators import textstats as TS
from keras_ocr_spark.plans.pipeline import extract


@pytest.fixture(scope="module")
def edge_docs(spark):
    rows = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "x"),
        (4, "a perfectly ordinary sentence with enough words to extract and shingle nicely"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestEdgeTexts:
    def test_extract_pipeline(self, spark, edge_docs):
        t = edge_docs.select(
            F.concat(F.lit("c"), F.col("doc_id").cast("string")).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            "text",
        )
        rows = {r.conv_id: (r.clean_text, len(r.spans)) for r in extract(t).collect()}
        assert len(rows) == 5  # every row survives, including null text
        assert rows["c0"] == ("", 0) and rows["c1"] == ("", 0)  # null/empty -> blank turn
        assert rows["c4"][1] == 1  # the real sentence extracts

    def test_dedup_family(self, edge_docs):
        assert D.exact_dedup(edge_docs).count() >= 4  # null hashes to null key, no crash
        sigs = {r.id for r in D.minhash_signatures(edge_docs).collect()}
        # Whitespace-only text splits into >= k empty "words" and signs
        # with degenerate shingles — all-whitespace docs bucket together
        # (they ARE near-dups); the pandas kernel and the SQL twin agree.
        assert sigs == {2, 4}
        twin = {r.id for r in D.minhash_signatures_sql(edge_docs).collect()}
        assert twin == sigs
        fps = {r.id: r.simhash for r in D.simhash_fingerprints(edge_docs).collect()}
        assert fps[0] is None  # null text -> null fingerprint
        assert all(v is not None for k, v in fps.items() if k != 0)
        pairs = D.ngram_jaccard_pairs(edge_docs, threshold=0.1).collect()
        assert all(r.id_a < r.id_b for r in pairs)

    def test_textstats_family(self, edge_docs):
        nn = edge_docs.filter(F.col("text").isNotNull())
        assert TS.lang_scores(nn).count() == 4
        assert TS.quality_scores(nn).count() == 4
        assert TS.token_counts(nn).count() == 4
        assert TS.fingerprints(nn).count() == 4
        # empty text: zero-ish features, never a crash or NaN
        q = {r.id: r for r in TS.quality_scores(nn).collect()}
        assert q[1].n_chars == 0 and q[1].quality is not None

    def test_encode_family(self, edge_docs):
        nn = edge_docs.filter(F.col("text").isNotNull())
        enc = {r.id: (r.label_length, r.labels) for r in E.vocab_encode(nn, max_len=8).collect()}
        assert enc[1] == (0, [-1] * 8)  # empty -> all-pad
        assert enc[3][0] == 1 and enc[3][1][0] >= 0  # single char encodes
        shuf = E.epoch_shuffle(nn, seed=3)
        assert sorted(r.shuffle_pos for r in shuf.collect()) == [1, 2, 3, 4]

    def test_pdf_null_payload(self, spark):
        from keras_ocr_spark.operators.multimodal import pdf_extract_text

        df = spark.createDataFrame([(0, None), (1, bytearray(b"BT (ok) Tj ET"))], "id long, payload binary")
        rows = {r.id: (r.pdf_text, r.n_bytes) for r in pdf_extract_text(df).collect()}
        assert rows[0] == (None, 0)
        assert rows[1] == ("ok", 13)
