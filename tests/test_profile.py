"""Table profiling: null accounting, cardinality modes, one-scan plan."""

import pytest

from orion_etl_oracle_to_postgres_spark.operators.profile import profile_table


@pytest.fixture()
def df(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", None),
        (3, None, 30.0),
        (4, "b", 30.0),
    ]
    return spark.createDataFrame(rows, "id long, tag string, val double")


def test_profile_counts_and_bounds(spark, df):
    out = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert set(out) == {"id", "tag", "val"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert (out["tag"]["n_nulls"], out["tag"]["null_frac"]) == (1, 0.25)
    assert out["tag"]["n_distinct"] == 2  # NULL not counted
    assert (out["val"]["min_value"], out["val"]["max_value"]) == ("10.0", "30.0")
    assert (out["id"]["min_value"], out["id"]["max_value"]) == ("1", "4")


def test_profile_hll_mode_close_enough(spark, df):
    out = {r["column"]: r for r in profile_table(df).collect()}
    # 2-3 distinct values: HLL is exact at this cardinality
    assert out["val"]["n_distinct"] == 2
    assert out["id"]["n_distinct"] == 4


def test_profile_column_subset_and_errors(spark, df):
    assert profile_table(df, ["id"]).count() == 1
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_table(df, [])


def test_profile_is_single_scan(spark, df):
    """All per-column aggregates pack into one aggregation over one
    scan — no per-column jobs, no join of partial profiles."""
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") == 1
    assert "Join" not in plan


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, dead string")
    out = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert (out["dead"]["n_nulls"], out["dead"]["null_frac"]) == (2, 1.0)
    assert out["dead"]["n_distinct"] == 0
    assert out["dead"]["min_value"] is None and out["dead"]["max_value"] is None


def test_profile_handles_awkward_column_names(spark):
    from orion_etl_oracle_to_postgres_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "x"), (2, None)], ["order count", "it's"]
    )
    out = {r["column"]: r["n_nulls"] for r in profile_table(df).collect()}
    assert out == {"order count": 0, "it's": 1}


def test_profile_histogram_counts_and_edges(spark):
    from orion_etl_oracle_to_postgres_spark.operators.profile import profile_histogram

    df = spark.createDataFrame([(float(v),) for v in range(100)], ["v"])
    h = {r["bin"]: r for r in profile_histogram(df, "v", n_bins=4).collect()}
    assert set(h) == {0, 1, 2, 3}
    assert sum(r["n"] for r in h.values()) == 100
    # max value (99.0) folds into the LAST bin, not an overflow bucket
    assert h[3]["n"] == 25 and h[0]["n"] == 25  # 99.0 folds into bin 3
    assert h[0]["lo"] == 0.0 and h[3]["hi"] == 99.0


def test_profile_histogram_constant_column_and_null_handling(spark):
    from orion_etl_oracle_to_postgres_spark.operators.profile import profile_histogram

    df = spark.createDataFrame([(5.0,), (5.0,), (None,)], ["v"])
    rows = profile_histogram(df, "v", n_bins=3).collect()
    assert sum(r["n"] for r in rows) == 2  # NULLs excluded


def test_profile_join_skew_hand_computed(spark):
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.profile import (
        profile_join_skew,
    )

    # key 'a' x6, 'b' x2, NULL x2 -> total 10, 3 distinct keys
    rows = [("a",)] * 6 + [("b",)] * 2 + [(None,)] * 2
    df = spark.createDataFrame(rows, "k string")
    out = [tuple(r) for r in profile_join_skew(df, "k", top_n=3).collect()]
    assert out[0] == ("a", 6, 0.6, 1.8)  # 6/10 share, 6*3/10 skew
    assert out[1][1] == 2  # 'b' or NULL row
    # NULL keys are a reported key, not silently dropped
    keys = {r[0] for r in out}
    assert None in keys or "None" in keys or sum(1 for r in out if r[1] == 2) == 2
    # deterministic under repartition
    again = [tuple(r) for r in profile_join_skew(df.repartition(4), "k", top_n=3).collect()]
    assert out == again
    import pytest

    with pytest.raises(ValueError, match="top_n"):
        profile_join_skew(df, "k", top_n=0)


def test_layout_advisor_verdicts(spark):
    from orion_etl_oracle_to_postgres_spark.operators.profile import layout_advisor
    import pytest as _pt

    df = spark.createDataFrame(
        [(i, "hot" if i < 150 else f"v{i}", i % 5,
          None if i % 2 else f"n{i % 7}", 1)
         for i in range(200)],
        "id int, skewcol string, okcol int, nullcol string, onecol int",
    )
    out = {r.column: r.verdict
           for r in layout_advisor(
               df, ["id", "skewcol", "okcol", "nullcol", "onecol"],
               target_partitions=10,
           ).collect()}
    assert out["id"] == "too_many_values"    # 200 distinct > 10x10
    assert out["skewcol"] == "skewed"        # 'hot' holds 75%
    assert out["okcol"] == "ok"              # 5 values, no nulls, 20% top
    assert out["nullcol"] == "ok_with_nulls"
    assert out["onecol"] == "too_few_values"
    with _pt.raises(ValueError, match="candidate"):
        layout_advisor(df, ["nope"])
    with _pt.raises(ValueError, match="non-empty"):
        layout_advisor(df, [])


def test_correlation_matrix_upper_triangle(spark):
    from orion_etl_oracle_to_postgres_spark.operators.profile import (
        correlation_matrix,
    )
    import pytest as _pt

    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i)) for i in range(50)],
        "a double, b double, c double",
    )
    out = {(r.col_a, r.col_b): r.corr
           for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")] == 1.0 and out[("a", "c")] == -1.0
    with _pt.raises(ValueError, match=">= 2"):
        correlation_matrix(df, ["a"])
    with _pt.raises(ValueError, match="not in"):
        correlation_matrix(df, ["a", "zz"])


def test_correlation_matrix_degenerate_pair_is_null_row(spark):
    from orion_etl_oracle_to_postgres_spark.operators.profile import (
        correlation_matrix,
    )

    df = spark.createDataFrame(
        [(float(i), 7.0) for i in range(10)], "a double, const double"
    )
    out = correlation_matrix(df, ["a", "const"]).collect()
    assert len(out) == 1 and out[0].corr is None  # report, don't crash


def test_chi_square_independent_and_dependent(spark):
    from orion_etl_oracle_to_postgres_spark.operators.profile import (
        chi_square_independence,
    )

    # perfectly dependent: b == a -> V = 1
    dep = spark.createDataFrame(
        [(str(i % 3), str(i % 3)) for i in range(90)], "x string, y string"
    )
    r = chi_square_independence(dep, "x", "y").collect()[0]
    assert r.cramers_v == 1.0 and r.dof == 4 and r.n == 90
    # perfectly balanced independent table -> chi2 = 0
    ind = spark.createDataFrame(
        [(str(i % 2), str(j % 3)) for i in range(2) for j in range(3)
         for _ in range(5)],
        "x string, y string",
    )
    r2 = chi_square_independence(ind, "x", "y").collect()[0]
    assert r2.chi2 == 0.0 and r2.cramers_v == 0.0
    # NULLs drop
    withnull = dep.union(
        spark.createDataFrame([(None, "0")], "x string, y string")
    )
    assert chi_square_independence(withnull, "x", "y").collect()[0].n == 90


def test_benford_report_exact_shares_and_exclusions(spark):
    """A perfectly Benford-weighted toy column yields ~zero chi terms;
    zeros/NULLs carry no leading digit and are excluded; digits come
    from exact integer cents (no double->string)."""
    import math

    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.profile import (
        benford_report,
    )

    # 1000 values distributed to the rounded Benford counts per digit
    counts = {d: round(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)}
    rows = [(float(d) * 10.0,) for d, n in counts.items() for _ in range(n)]
    rows += [(0.0,), (None,)]  # excluded: no leading digit
    df = spark.createDataFrame(rows, "x double")
    out = {r["digit"]: r for r in benford_report(df, "x").collect()}
    assert set(out) == set(range(1, 10))
    total = sum(r["n_values"] for r in out.values())
    assert total == sum(counts.values())  # zero/NULL dropped
    assert out[1]["n_values"] == counts[1]
    for d in range(1, 10):
        assert abs(out[d]["observed_share"] - out[d]["expected_share"]) < 2e-3
        assert out[d]["chi_term"] < 0.02
    # fractional values find their first significant digit via cents
    frac = benford_report(
        spark.createDataFrame([(0.042,)], "x double"), "x"
    ).collect()
    assert len(frac) == 1 and frac[0]["digit"] == 4

    with pytest.raises(ValueError, match="scale_decimals"):
        benford_report(df, "x", scale_decimals=-1)
