"""[EXT] Market-basket item affinity: pair counts and lift."""

from __future__ import annotations

from orion_etl_oracle_to_postgres_spark.operators.affinity import item_pairs_lift


def _baskets(spark):
    # 4 baskets: A+B together twice, A+C once, D alone
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "D"),
    ]
    return spark.createDataFrame(rows, "b int, i string")


def test_item_pairs_lift_values(spark):
    df = _baskets(spark)
    out = item_pairs_lift(df, "b", "i", min_pair_count=2, top_k=10).collect()
    assert len(out) == 1
    r = out[0]
    # lift(A,B) = n_ab * N / (n_a * n_b) = 2 * 4 / (3 * 2)
    assert (r["item_a"], r["item_b"], r["n_pair"]) == ("A", "B", 2)
    assert abs(r["lift"] - round(2 * 4 / (3 * 2), 6)) < 1e-9


def test_item_pairs_min_support_filters(spark):
    df = _baskets(spark)
    out = item_pairs_lift(df, "b", "i", min_pair_count=1, top_k=10).collect()
    pairs = {(r["item_a"], r["item_b"]) for r in out}
    assert pairs == {("A", "B"), ("A", "C")}


def test_item_pairs_duplicate_rows_do_not_inflate_support(spark):
    rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B")]
    df = spark.createDataFrame(rows, "b int, i string")
    out = item_pairs_lift(df, "b", "i", min_pair_count=1, top_k=10).collect()
    assert out[0]["n_pair"] == 2  # distinct (basket, item) first


def test_item_pairs_basket_cap_drops_degenerate(spark):
    rows = [(1, f"I{k}") for k in range(12)] + [(2, "I0"), (2, "I1")]
    df = spark.createDataFrame(rows, "b int, i string")
    out = item_pairs_lift(
        df, "b", "i", min_pair_count=1, max_basket_items=10, top_k=100
    ).collect()
    # basket 1 (12 items) dropped entirely → only basket 2's single pair,
    # and N counts only surviving baskets
    assert len(out) == 1
    assert out[0]["n_pair"] == 1
    assert out[0]["lift"] == 1.0


def test_item_pairs_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([(1, "A")], "b int, i string")
    with pytest.raises(ValueError, match="min_pair_count"):
        item_pairs_lift(df, "b", "i", min_pair_count=0)
    with pytest.raises(ValueError, match="top_k"):
        item_pairs_lift(df, "b", "i", top_k=0)
    with pytest.raises(ValueError, match="max_basket_items"):
        item_pairs_lift(df, "b", "i", max_basket_items=1)
