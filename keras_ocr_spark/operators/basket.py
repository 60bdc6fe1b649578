"""Market-basket co-occurrence: item pairs + integer lift.

The co-purchase analysis every commerce warehouse runs ("parts bought
together"), and — renamed — the co-occurrence mining a training-data
pipeline runs on (tools used in one conversation, domains cited in one
document). The shape is the interesting part at scale: pairs come from
a SELF-JOIN of the basket's item list on the basket key, which is
quadratic in basket size — so basket size must be BOUNDED before the
join, not discovered after it. One degenerate basket (a crawler
session touching 10^5 items) would otherwise emit 10^10 pairs from a
single key.

Plan: distinct (basket, item) -> per-basket size filter (the cap is an
explicit, logged contract, not a silent truncation: baskets over the
cap are EXCLUDED whole, because a partial basket would produce biased
pair counts) -> self equi-join on the basket key with ``item_a <
item_b`` -> pair counts. Lift is carried as an integer contract,
``lift_x1e6 = ((pair_cnt * 1e6) div cnt_a * n_baskets) div cnt_b`` —
the division order is part of the contract (documented, mirrored in
the oracle); > 1e6 means the pair co-occurs more than independence
predicts.

Reference analog: `get_balanced_weights` co-occurrence balancing over
(font, text) pairs — /root/reference/keras_ocr/data_generation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_items_per_basket: int = 100,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` co-occurring item pairs:
    ``item_a, item_b, pair_count, count_a, count_b, n_baskets,
    lift_x1e6`` ordered by (pair_count desc, item_a, item_b).
    ``count_a``/``count_b`` are basket counts AFTER the size cap, so
    lift is internally consistent."""
    if max_items_per_basket < 2:
        raise ValueError("max_items_per_basket must be >= 2")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    items = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    sizes = items.groupBy("_b").agg(F.count(F.lit(1)).alias("_sz"))
    kept = items.join(
        sizes.filter(F.col("_sz") <= max_items_per_basket).select("_b"), "_b"
    )
    n_baskets = kept.select("_b").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    item_counts = kept.groupBy("_i").agg(F.count(F.lit(1)).alias("_cnt"))
    a = kept.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = kept.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
    )
    out = (
        pairs.join(
            item_counts.select(F.col("_i").alias("item_a"), F.col("_cnt").alias("count_a")),
            "item_a",
        )
        .join(
            item_counts.select(F.col("_i").alias("item_b"), F.col("_cnt").alias("count_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.col("count_a").cast("long").alias("count_a"),
            F.col("count_b").cast("long").alias("count_b"),
            "n_baskets",
            F.expr(
                "(pair_count * 1000000L div count_a * n_baskets) div count_b"
            ).alias("lift_x1e6"),
        )
    )
    return out.orderBy(F.desc("pair_count"), "item_a", "item_b").limit(top_k)
