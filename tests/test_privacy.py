"""[EXT] k-anonymity privacy audit."""

from __future__ import annotations

import pytest

from orion_etl_oracle_to_postgres_spark.operators.privacy import (
    k_anonymity_report,
    k_anonymity_stats,
)


def _df(spark):
    # (zip, year): AA×3 (safe at k=3), BB×1 and CC×2 (below k=3)
    rows = [("A", 1990)] * 3 + [("B", 1991)] + [("C", 1992)] * 2
    return spark.createDataFrame(rows, "zip string, yr int")


def test_report_lists_small_groups_only(spark):
    out = k_anonymity_report(_df(spark), ["zip", "yr"], k=3).collect()
    assert [(r["zip"], r["group_size"]) for r in out] == [("B", 1), ("C", 2)]


def test_stats_summary(spark):
    r = k_anonymity_stats(_df(spark), ["zip", "yr"], k=3).collect()[0]
    assert r["n_groups"] == 3
    assert r["groups_below_k"] == 2
    assert r["rows_at_risk"] == 3
    assert r["min_group_size"] == 1


def test_anonymous_dataset_gives_empty_report(spark):
    df = spark.createDataFrame([("A", 1)] * 5 + [("B", 2)] * 5, "z string, y int")
    assert k_anonymity_report(df, ["z", "y"], k=5).count() == 0
    assert k_anonymity_stats(df, ["z", "y"], k=5).collect()[0]["groups_below_k"] == 0


def test_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity_report(df, [], k=3)
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_stats(df, ["zip"], k=1)


def test_l_diversity_homogeneous_group_flagged(spark):
    from orion_etl_oracle_to_postgres_spark.operators.privacy import (
        l_diversity_report,
    )
    import pytest as _pt

    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "x"), ("a", 1, "x"),   # big but homogeneous
         ("b", 2, "x"), ("b", 2, "y"),                   # diverse
         ("c", 3, None), ("c", 3, "z")],                 # NULL isn't a value
        "seg string, nat int, s string",
    )
    out = l_diversity_report(df, ["seg", "nat"], "s", l=2).collect()
    flagged = {(r.seg, r.nat): (r.group_size, r.n_sensitive) for r in out}
    # 'a' homogeneous; 'c' has one non-null value -> flagged too
    assert flagged == {("a", 1): (3, 1), ("c", 3): (2, 1)}
    with _pt.raises(ValueError, match="l must be"):
        l_diversity_report(df, ["seg"], "s", l=1)
    with _pt.raises(ValueError, match="quasi_cols"):
        l_diversity_report(df, [], "s")


def test_t_closeness_hand_case(spark):
    from orion_etl_oracle_to_postgres_spark.operators.privacy import (
        t_closeness_report,
    )
    from pyspark.sql import functions as F

    # global: a×6, b×2 → p = (0.75, 0.25)
    # g1: 3a,1b → p_g = (0.75, 0.25) → TVD 0
    # g2: 3a,1b missing? make g2: 3b? no: rows g2: a×3? design:
    # g2: 1a,1b (0.5, 0.5) → TVD = 0.5*(|0.5-0.75|+|0.5-0.25|) = 0.25
    rows = [("g1", "a")] * 3 + [("g1", "b")] + [("g2", "a")] * 3 + [("g2", "b")]
    # adjust: global a=6,b=2; g2 same as g1 → both TVD 0; replace g2
    rows = [("g1", "a")] * 3 + [("g1", "b")] + [("g2", "a"), ("g2", "b")] * 2
    df = spark.createDataFrame(rows, "g string, s string")
    # global: a=5, b=3 → p=(0.625, 0.375); g1=(0.75,0.25) TVD=0.125;
    # g2=(0.5,0.5) TVD=0.125 — lower threshold to catch both
    out = t_closeness_report(df, ["g"], "s", t=0.1).collect()
    got = {r.g: (r.group_size, r.tvd) for r in out}
    assert got == {"g1": (4, 0.125), "g2": (4, 0.125)}
    # NULL sensitive rows excluded
    df2 = df.union(spark.createDataFrame([("g1", None)], "g string, s string"))
    out2 = {r.g: r.tvd for r in t_closeness_report(df2, ["g"], "s", t=0.1).collect()}
    assert out2 == {"g1": 0.125, "g2": 0.125}
