"""Two-phase global-order primitives (operators/ranks.py): bit-parity
with the naive unpartitioned window, plus the scale contract — NO
single-partition window exchange anywhere in the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from orion_etl_oracle_to_postgres_spark.operators.ranks import (
    global_ntile,
    global_row_number,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_global_window(df) -> None:
    """A single-partition window prints as Window <- Sort <- Exchange
    SinglePartition; scalar aggregates also use Exchange SinglePartition
    (legitimately, over partial-agg rows), so pin the Window-consumer
    pattern, not the exchange itself."""
    lines = _plan(df).splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            above = "\n".join(lines[max(0, i - 3) : i])
            assert "Window" not in above, "\n".join(lines)


def _values(spark, n=257, dup_every=5):
    # deliberate ties (v repeats every dup_every rows) + negative range
    rows = [(i, (i % 97) - 40 if i % dup_every else 13) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long")


def test_global_row_number_matches_naive_window(spark):
    df = _values(spark).repartition(7)
    got = global_row_number(
        df, F.col("v"), [F.col("id")], out_col="rn", n_buckets=8
    )
    naive = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id")).cast("long")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_global_row_number_descending(spark):
    df = _values(spark, n=100)
    got = global_row_number(
        df, F.col("v"), [F.col("id")], out_col="rn",
        descending=True, n_buckets=5,
    )
    naive = df.withColumn(
        "rn",
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), F.col("id")))
        .cast("long"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


@pytest.mark.parametrize("n,k", [(3, 5), (5, 5), (257, 5), (100, 7)])
def test_global_ntile_matches_sql_ntile(spark, n, k):
    df = _values(spark, n=n)
    got = global_ntile(
        df, F.col("v"), [F.col("id")], k, out_col="t", n_buckets=4
    )
    naive = df.withColumn(
        "t", F.ntile(k).over(Window.orderBy("v", "id"))
    )
    assert sorted(map(tuple, got.select("id", "v", "t").collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_global_row_number_constant_key_single_bucket(spark):
    # degenerate range (max == min): everything lands in bucket 0 but
    # the result is still the exact global row number
    df = spark.createDataFrame([(i, 7) for i in range(20)], "id long, v long")
    got = global_row_number(df, F.col("v"), [F.col("id")], out_col="rn")
    assert [r.rn for r in got.orderBy("id").collect()] == list(range(1, 21))


def test_no_single_partition_window_in_two_phase_plans(spark):
    df = _values(spark)
    assert_no_global_window(
        global_row_number(df, F.col("v"), [F.col("id")], out_col="rn")
    )
    assert_no_global_window(
        global_ntile(df, F.col("v"), [F.col("id")], 5, out_col="t")
    )


def test_ks_and_mwu_plans_have_no_global_window(spark):
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        ks_statistic,
        mannwhitney_u,
    )

    a = _values(spark, n=120).select(F.col("v").cast("double").alias("x"))
    b = _values(spark, n=80).select((F.col("v") + 3).cast("double").alias("x"))
    assert_no_global_window(ks_statistic(a, b, "x"))
    assert_no_global_window(mannwhitney_u(a, b, "x"))


def test_ks_known_value(spark):
    # disjoint samples: KS must be 1.0; identical samples: 0.0
    a = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    b = spark.createDataFrame([(float(i + 100),) for i in range(7)], "x double")
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        ks_statistic,
    )

    row = ks_statistic(a, b, "x").collect()[0]
    assert (row.ks_stat, row.n_a, row.n_b) == (1.0, 10, 7)
    same = ks_statistic(a, a, "x").collect()[0]
    assert same.ks_stat == 0.0


def test_mwu_matches_scipy_formula_hand_case(spark):
    # a = [1,2,3], b = [2,3,4]: pooled midranks 1, 2.5, 2.5, 4.5, 4.5, 6
    # R_b = 2.5 + 4.5 + 6 = 13 → U = 13 - 3*4/2 = 7
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        mannwhitney_u,
    )

    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    b = spark.createDataFrame([(2.0,), (3.0,), (4.0,)], "x double")
    row = mannwhitney_u(a, b, "x").collect()[0]
    assert (row.n_a, row.n_b, row.u_stat) == (3, 3, 7.0)


def test_customer_window_queries_have_no_global_window(spark, sf_dir):
    from orion_etl_oracle_to_postgres_spark import queries as q

    for name in (
        "window_revenue_pareto",
        "agg_revenue_gini",
        "window_rfm_segments",
    ):
        assert_no_global_window(q.QUERIES[name](spark, sf_dir))


def test_stable_ids_plan_has_no_global_window(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        assign_stable_ids,
    )

    df = _values(spark, n=50).select(F.col("id").cast("string").alias("id"))
    assert_no_global_window(assign_stable_ids(df, "id", n_buckets=4))


def test_curriculum_order_deterministic_and_phased(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        curriculum_order,
    )

    df = _values(spark, n=103).select(
        F.col("id").alias("doc"), (F.col("v") / 10.0).alias("score")
    )
    out = curriculum_order(df, "doc", "score", phases=4)
    rows = {r.doc: (r.curriculum_idx, r.phase) for r in out.collect()}
    # bit-identical under a different partitioning
    rows2 = {
        r.doc: (r.curriculum_idx, r.phase)
        for r in curriculum_order(df.repartition(13), "doc", "score", phases=4).collect()
    }
    assert rows == rows2
    idxs = sorted(i for i, _ in rows.values())
    assert idxs == list(range(103))  # dense 0-based
    # easy-first: the doc with the max score gets index 0
    top = df.orderBy(F.col("score").desc(), F.col("doc")).first().doc
    assert rows[top][0] == 0 and rows[top][1] == 1
    # ntile sizes: 103 = 3*26 + 1*25
    from collections import Counter

    sizes = Counter(p for _, p in rows.values())
    assert sorted(sizes.values()) == [25, 26, 26, 26]
    assert_no_global_window(out)


def test_exact_quantiles_match_sorted_values(spark):
    from orion_etl_oracle_to_postgres_spark.operators.quantiles import (
        exact_quantiles,
    )

    import math

    vals = [((i * 37) % 101) / 7.0 for i in range(101)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(9)
    got = {r.q: r.value for r in exact_quantiles(df, "x", [0.0, 0.1, 0.5, 1.0]).collect()}
    s = sorted(vals)
    want = {
        q: round(s[max(1, math.ceil(q * len(s))) - 1], 6)
        for q in (0.0, 0.1, 0.5, 1.0)
    }
    assert got == want
    assert_no_global_window(exact_quantiles(df, "x", [0.5]))


def test_global_row_number_null_keys_rank_last_both_directions(spark):
    """NULL order keys get the dedicated trailing bucket and rank after
    every value (SQL/DuckDB NULLS LAST) in BOTH directions, ordered by
    the tiebreaks — never dropped, never nulls-first (Spark's asc
    default)."""
    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.5), (3, None), (4, 0.7), (5, None)],
        "id long, score double",
    ).repartition(5)
    for desc in (False, True):
        out = global_row_number(
            df, F.col("score"), [F.col("id")], out_col="rn", descending=desc
        )
        rows = {r.id: r.rn for r in out.collect()}
        assert len(rows) == 5, "NULL-key rows must be kept"
        # NULLs last, id tiebreak among them
        assert rows[3] == 4 and rows[5] == 5
        vals = {1: 0.9, 2: 0.5, 4: 0.7}
        order = sorted(vals, key=lambda i: (-vals[i] if desc else vals[i], i))
        assert [rows[i] for i in order] == [1, 2, 3]


def test_exact_quantiles_integer_rank_arithmetic(spark):
    """ceil(q*n) must be exact: double 0.07*100 rounds to 7.0000…01 and
    a float ceil returns rank 8 — the rational-arithmetic target stays
    at the true type-1 rank 7."""
    from orion_etl_oracle_to_postgres_spark.operators.quantiles import (
        exact_quantiles,
    )

    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    got = {r.q: r.value for r in exact_quantiles(df, "v", [0.07, 0.3]).collect()}
    assert got == {0.07: 7.0, 0.3: 30.0}
