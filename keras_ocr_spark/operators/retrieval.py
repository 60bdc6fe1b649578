"""Text retrieval scoring — BM25 over a document corpus.

The curation-side search primitive (find training docs matching a
probe query, score seed sets, build eval slices). Spark-first shape,
no inverted index materialization needed for a fixed query:

1. ONE corpus pass computes per-doc term frequencies for the (few)
   query terms as pure array expressions — ``size(filter(words,
   w -> w = term))`` per term — plus the doc length;
2. ONE tiny grand-total aggregate yields N, avgdl and per-term
   document frequencies (a single row);
3. that row is broadcast back (``crossJoin(broadcast(...))``) and the
   BM25 score is a per-row projection; top-k is
   TakeOrderedAndProject.

Total cost: one scan + one 1-row aggregate + one map pass — no
shuffle proportional to the corpus beyond the partial agg. At 100 TB
with ad-hoc queries you'd materialize the posting lists once
(explode -> groupBy term) and prune by term instead; for the
fixed-probe scoring this form reads MORE THAN 10x less than an
explode-based plan (no row multiplication by document length).

Float determinism: the score is an explicit left-to-right sum of
per-term contributions (both engines evaluate + left-to-right) and ln
comes from the same libm, so the DuckDB oracle matches bit-for-bit
before the final defensive rounding.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bm25) for every document with a positive score against the
    query terms. Okapi BM25 with the standard Robertson-Sparck-Jones
    idf = ln(1 + (N - df + 0.5) / (df + 0.5))."""
    words = F.split(F.col(text_col), " ")

    def tf_expr(term: str) -> Column:
        # NB: a one-ARG lambda is required — a default-arg closure
        # (lambda w, t=term: ...) reads as the (value, index) form and
        # silently compares words against positions.
        return F.size(F.filter(words, lambda w: w == F.lit(term)))

    base = df.select(
        F.col(id_col).alias("id"),
        F.size(words).cast("double").alias("dl"),
        *[tf_expr(t).cast("double").alias(f"tf_{i}") for i, t in enumerate(query_terms)],
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))

    def term_score(i: int) -> Column:
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5)) / (F.col(f"df_{i}") + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        return idf * (tf * F.lit(k1 + 1.0)) / denom

    score = term_score(0)
    for i in range(1, len(query_terms)):
        score = score + term_score(i)
    return scored.select("id", score.alias("bm25")).filter(F.col("bm25") > 0)


def bm25_sql(
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The DuckDB twin of :func:`bm25_scores` — same per-term
    left-to-right summation, same idf formula."""
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(words, x -> x = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(query_terms)
    )
    df_cols = ",\n             ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1.0 ELSE 0.0 END) AS df_{i}" for i in range(len(query_terms))
    )
    terms = " + ".join(
        f"(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (tf_{i} * {k1 + 1.0}) / (tf_{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl)))"
        for i in range(len(query_terms))
    )
    return f"""
    WITH w AS (SELECT {id_col} AS id, string_split({text_col}, ' ') AS words FROM {table}),
    base AS (
      SELECT id, CAST(len(words) AS DOUBLE) AS dl,
             {tf_cols}
      FROM w),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
             {df_cols}
      FROM base)
    SELECT id, ({terms}) AS bm25
    FROM base, stats
    WHERE ({terms}) > 0
    """


def inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Materialized posting lists: ``(term, df, postings)`` with
    postings sorted by doc id.

    The ad-hoc-query counterpart to :func:`bm25_scores` (whose
    fixed-probe form deliberately avoids this): ONE explode of the
    per-doc DISTINCT vocabulary + ONE groupBy(term) shuffle — the
    minimal plan for index construction. At 100 TB the term key is
    Zipf-skewed; AQE skew-join/partition splitting handles the head,
    and stop-word terms are exactly the rows a real deployment would
    prune with a df ceiling before writing.
    """
    words = F.split(F.col(text_col), " ")
    pairs = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(F.array_distinct(words)).alias("term"),
    )
    return pairs.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sort_array(F.collect_list("id")).alias("postings"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: the top ``k`` terms of each
    document by TF-IDF, ``score = tf * ln((N+1)/(df+1))`` quantized to
    int64 micro-units (the repo's cross-engine float discipline — the
    per-term product is floor-rounded BEFORE ranking, so rank order is
    integer-decided in any engine). Returns ``(id, term, score, rk)``
    with ``rk`` 1-based and ties cut by term ASC (total order).

    The materialized complement of :func:`bm25_scores` (which scans for
    a FIXED query): this explodes the corpus once into (doc, term, tf),
    derives document frequencies from that same frame, broadcasts the
    1-row corpus size back (the whitelisted 1-row-broadcast shape), and
    ranks inside each document's partition — no global sort, no
    corpus-sized window. Explode -> two partial-agg shuffles + one
    doc-key window; keyword extraction at word-count cost.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.length("term") > 0)
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    score = F.floor(
        F.col("tf") * F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    scored = (
        tf.join(dfs, "term")
        .crossJoin(F.broadcast(n))
        .select("id", "term", score.alias("score"))
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )
