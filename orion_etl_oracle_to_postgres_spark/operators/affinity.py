"""[EXT] Item-affinity analysis (SURVEY.md §2.11): co-occurrence pair
counts with lift over basket-shaped data (order → items, doc → tags,
session → pages). The reference has no analytic surface at all; this is
the recommendation/association-rule profile a curation pipeline uses to
find correlated categories before mixing.

Scale shape: the pair stream comes from ONE co-partitioned self-join on
the basket key, so candidates are bounded by Σ items_per_basket² — the
per-basket fan-out, not the corpus square. Per-item frequencies are an
item-cardinality table broadcast onto the pair counts; the basket total
is a single scalar. ``max_basket_items`` caps pathological baskets
(a 10k-item basket alone yields 5·10⁷ pairs) the way
``ngram_jaccard_pairs`` caps hot postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def item_pairs_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pair_count: int = 2,
    max_basket_items: int = 1_000,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` item pairs by lift.

    lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab · N / (n_a · n_b), computed
    over DISTINCT (basket, item) rows so multiplicity inside a basket
    doesn't inflate support. Pairs are unordered (item_a < item_b).
    Lift is rounded to 6 dp BEFORE ranking and ties break by the item
    pair, so the cutoff is deterministic across engines.

    Baskets with more than ``max_basket_items`` distinct items are
    dropped entirely (loudly counted in the plan via a filter, cheap to
    audit): they are degenerate for association mining and quadratic in
    the join.
    """
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    if max_basket_items < 2:
        raise ValueError(
            f"max_basket_items must be >= 2 (pairs need 2 items), got {max_basket_items}"
        )
    # ONE basket shuffle: collect_set dedups (basket, item) in the
    # aggregate itself (map-side partials), replacing the earlier
    # distinct + sizes + self-join formulation (three shuffles of the
    # fact table). Pairs are generated INSIDE the row from the sorted
    # item array — per-basket work is size², which max_basket_items
    # bounds; nothing basket-shaped is joined.
    baskets = (
        df.groupBy(F.col(basket_col).alias("__b"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("__items"))
        .filter(F.size("__items") <= max_basket_items)
    )
    # the three consumers below share the basket exchange (ReuseExchange)
    n_baskets = baskets.agg(F.count(F.lit(1)).cast("double").alias("__N"))
    item_n = (
        baskets.select(F.explode("__items").alias("__i"))
        .groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__ni"))
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("__items"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("__items"), i + 2, F.greatest(F.size("__items") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    pair_n = (
        baskets.select(F.explode(pair_expr).alias("__p"))
        .select("__p.item_a", "__p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    na = item_n.withColumnsRenamed({"__i": "item_a", "__ni": "__na"})
    nb = item_n.withColumnsRenamed({"__i": "item_b", "__ni": "__nb"})
    scored = (
        pair_n.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            F.round(
                F.col("n_pair") * F.col("__N") / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("item_a"), F.asc("item_b")
    ).limit(top_k)
