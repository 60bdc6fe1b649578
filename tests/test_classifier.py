"""Hashed linear classifier: value contract is driver-attested
(`quality_classifier` — every hash/weight/logit reproduces in DuckDB).
These pin what the oracle can't: the zero-shuffle plan shape, bit
equality against an independent Python reference, and the short-doc
bigram guard."""

import hashlib

import pytest
from pyspark.sql import functions as F

from keras_ocr_spark.operators import classifier as CLF


def _py_h52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _py_logit(text: str, n_buckets: int = 1024) -> int:
    toks = text.split(" ")
    feats = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    total = 0
    for f_ in feats:
        bucket = _py_h52(f_) % n_buckets
        total += _py_h52(f"w:{bucket}") % 2001 - 1000
    return total


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "one"),  # 1 token: bigram guard path
        (3, "spam spam spam spam spam"),  # repeated features vote again
        (4, "a b"),
        (5, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestClassifier:
    def test_matches_python_reference_bit_for_bit(self, spark, docs):
        out = {r.doc_id: r for r in CLF.score_documents(docs).collect()}
        for row in docs.collect():
            exp = _py_logit(row.text)
            assert out[row.doc_id].logit_milli == exp
            assert out[row.doc_id].quality_label == int(exp > 0)
            assert out[row.doc_id].n_tokens == len(row.text.split(" "))

    def test_single_token_doc_has_no_bigrams(self, spark, docs):
        one = docs.filter(F.col("doc_id") == 2)
        got = CLF.score_documents(one).collect()[0]
        # Logit is exactly the unigram weight — no phantom bigram from
        # a descending sequence(1, 0).
        assert got.logit_milli == _py_h52(f"w:{_py_h52('one') % 1024}") % 2001 - 1000

    def test_repeated_features_accumulate(self, spark, docs):
        got = CLF.score_documents(docs.filter(F.col("doc_id") == 3)).collect()[0]
        w_uni = _py_h52(f"w:{_py_h52('spam') % 1024}") % 2001 - 1000
        w_bi = _py_h52(f"w:{_py_h52('spam_spam') % 1024}") % 2001 - 1000
        assert got.logit_milli == 5 * w_uni + 4 * w_bi

    def test_plan_is_zero_shuffle_no_python(self, spark, docs):
        plan = CLF.score_documents(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan  # pure expressions, no UDF

    def test_validation(self, spark, docs):
        with pytest.raises(ValueError):
            CLF.score_documents(docs, n_buckets=1000)  # not a power of two
