"""Item-item collaborative filtering on implicit feedback.

The classic "customers also bought" neighborhood model (Sarwar et al.
WWW'01 / the Amazon item-to-item paper): score item pairs by the
cosine of their basket-membership vectors, keep each item's top-k
neighbours. Complements the existing market-basket lift entry (lift
ranks PAIRS globally; this builds a per-item neighbour LIST — the
serving artifact a recommender actually reads).

Scale shape (the basket_lift argument): the pair join is a self
equi-join on the basket key, so candidate volume is Σ|basket|²/2 —
bounded by the small per-basket item count, never corpus². Supports
are item-sized aggregates; the final top-k is one window over the
co-occurrence table. Mega-baskets are the hot-LSH-band hazard class;
cap or split them upstream (dedup.py ``max_bucket`` discipline).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_item_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_co: int = 1,
) -> DataFrame:
    """Per-item top-k neighbours by basket-cosine:
    cos(i, j) = co(i,j) / sqrt(n_i · n_j) over DISTINCT (basket, item)
    membership. Counts are exact integers off two aggregates; the
    cosine is one float expression (supports cast to double BEFORE the
    product — the int64-overflow rule) rounded to 6dp BEFORE the rank
    window so tie-breaks are cross-engine deterministic
    (sim desc, neighbor asc — the bm25 discipline).

    Output: (item, neighbor, n_co, cosine, rank ≤ k), both directions
    of every qualifying pair.
    """
    from pyspark.sql.window import Window

    li = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(b, "_b")
        .filter(F.col("a._i") < F.col("b._i"))
        .groupBy(
            F.col("a._i").alias("ia"), F.col("b._i").alias("ib")
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= min_co)
    )
    supp = li.groupBy(F.col("_i").alias("item")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    both = co.select(
        F.col("ia").alias("item"),
        F.col("ib").alias("neighbor"),
        "n_co",
    ).unionByName(
        co.select(
            F.col("ib").alias("item"),
            F.col("ia").alias("neighbor"),
            "n_co",
        )
    )
    joined = (
        both.join(supp, "item")
        .join(
            supp.select(
                F.col("item").alias("neighbor"),
                F.col("n_item").alias("n_nb"),
            ),
            "neighbor",
        )
        .select(
            "item",
            "neighbor",
            "n_co",
            F.round(
                F.col("n_co")
                / F.sqrt(
                    F.col("n_item").cast("double")
                    * F.col("n_nb").cast("double")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cosine"), F.col("neighbor")
    )
    return joined.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
