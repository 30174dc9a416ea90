"""Snapshot reconciliation: classification, null-safety, errors."""

import pytest

from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
    diff_summary,
    snapshot_diff,
)


def test_classification_matrix(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, None, 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["diff_status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "same",
        2: "changed",   # s differs
        3: "removed",
        4: "same",      # NULL == NULL is same (null-safe compare)
        5: "added",
    }
    summary = {r["diff_status"]: r["n"] for r in
               diff_summary(snapshot_diff(old, new, ["k"])).collect()}
    assert summary == {"same": 2, "changed": 1, "removed": 1, "added": 1}


def test_null_key_rows_match_across_sides(spark):
    old = spark.createDataFrame([(None, "x")], "k string, v string")
    new = spark.createDataFrame([(None, "x")], "k string, v string")
    rows = snapshot_diff(old, new, ["k"]).collect()
    # NULL keys join null-safely: present on both sides, same payload
    assert [(r["k"], r["diff_status"]) for r in rows] == [(None, "same")]


def test_compare_cols_subset_and_errors(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "ZZZ", 1.0)], "k long, s string, v double")
    # comparing only v: the s difference is ignored
    got = snapshot_diff(old, new, ["k"], compare_cols=["v"]).collect()
    assert got[0]["diff_status"] == "same"
    with pytest.raises(ValueError, match="at least one key"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="lacks key columns"):
        snapshot_diff(old, new, ["nope"])
    with pytest.raises(ValueError, match="lacks columns"):
        snapshot_diff(old, new, ["k"], compare_cols=["nope"])


def test_distribution_drift_identical_is_zero(spark):
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        distribution_drift,
    )

    df = spark.createDataFrame([(float(v),) for v in range(1000)], ["v"])
    rep = distribution_drift(df, df, "v", n_bins=5, exact=True).collect()
    assert len(rep) == 5
    assert all(r["psi_term"] == 0.0 for r in rep)
    assert all(abs(r["frac_old"] - 0.2) < 0.01 for r in rep)


def test_distribution_drift_detects_shift(spark):
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        distribution_drift,
    )

    old = spark.createDataFrame([(float(v),) for v in range(1000)], ["v"])
    new = spark.createDataFrame([(float(v),) for v in range(800, 1800)], ["v"])
    rep = distribution_drift(old, new, "v", n_bins=5, exact=True).collect()
    psi = sum(r["psi_term"] for r in rep)
    assert psi > 0.25  # rule-of-thumb "shifted" threshold
    # every new row lands in old's top bin (or above): bin 4 dominates
    top = {r["bin"]: r["n_new"] for r in rep}
    assert top[4] >= 800


def test_table_checksum_detects_value_and_duplicate_changes(spark):
    """The sign-off must flag a single changed value, a dropped row, and
    a row duplicated an even number of times (the xor channel alone is
    blind to the last one — the modular-sum channel catches it)."""
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        table_checksum,
    )

    base = spark.createDataFrame(
        [(i, f"name{i}") for i in range(100)], "id long, name string"
    )

    def report(df):
        return {
            r["bucket"]: (r["n_rows"], r["xor_checksum"], r["sum_checksum"])
            for r in table_checksum(df, ["id", "name"], n_buckets=4).collect()
        }

    ref = report(base)
    assert report(base.repartition(7)) == ref  # order-independent
    # every report carries the serialization-scheme version marker so
    # persisted baselines from an older scheme fail loudly (ADVICE r10)
    lay = table_checksum(base, ["id"], n_buckets=2).select("layout").distinct()
    assert [r["layout"] for r in lay.collect()] == ["md5x60/lenprefix-v2"]
    changed = base.withColumn(
        "name", F.when(F.col("id") == 50, "NAME50").otherwise(F.col("name"))
    )
    assert report(changed) != ref
    assert report(base.filter("id != 50")) != ref
    # duplicate one row TWICE: counts and xor of that bucket shift,
    # and even if counts were compared alone per bucket the sum channel
    # must differ from a world where two OTHER rows were dropped
    dup = base.union(base.filter("id = 50")).union(base.filter("id = 50"))
    rep_dup = report(dup)
    assert rep_dup != ref
    # xor channel alone is blind to the even duplicate (x^x = 0) — pin
    # that the sum/count channels are what differ
    diffs = {
        b: tuple(x != y for x, y in zip(rep_dup[b], ref[b]))
        for b in ref
        if rep_dup[b] != ref[b]
    }
    assert all(d[0] and not d[1] and d[2] for d in diffs.values())
    # NULLs are encoded distinctly from the string 'NULL'
    a = spark.createDataFrame([(1, None)], "id long, name string")
    b = spark.createDataFrame([(1, "NULL")], "id long, name string")
    assert report(a) != report(b)
    import pytest

    with pytest.raises(ValueError, match="cols"):
        table_checksum(base, [])


def test_referential_integrity_counts_orphans_and_nulls(spark):
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        referential_integrity,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = {
        r["fk_name"]: r
        for r in referential_integrity(
            [("child.fk->parent", child, "fk", parent, "pk")]
        ).collect()
    }
    r = out["child.fk->parent"]
    assert r["n_child_rows"] == 4
    assert r["n_null_fk"] == 1  # optional FK, not a violation
    assert r["n_orphans"] == 1  # fk=99
    assert abs(r["orphan_frac"] - round(1 / 3, 6)) < 1e-9


def test_ks_statistic_known_values(spark):
    """Identical samples -> 0; disjoint samples -> 1; ties across sides
    never fake a gap (the RANGE frame evaluates after equal values)."""
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import ks_statistic

    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    same = ks_statistic(a, a, "v").collect()[0]
    assert same.ks_stat == 0.0 and same.n_a == 10 and same.n_b == 10
    b = spark.createDataFrame([(float(i) + 100.0,) for i in range(10)], "v double")
    disj = ks_statistic(a, b, "v").collect()[0]
    assert disj.ks_stat == 1.0
    # half-shifted: KS = 0.5 for a shift of half the support
    c = spark.createDataFrame([(float(i) + 5.0,) for i in range(10)], "v double")
    half = ks_statistic(a, c, "v").collect()[0]
    assert abs(half.ks_stat - 0.5) < 1e-9
    # NULLs excluded from both counts
    d = spark.createDataFrame([(None,), (1.0,)], "v double")
    nn = ks_statistic(d, d, "v").collect()[0]
    assert nn.n_a == 1 and nn.ks_stat == 0.0


def test_mannwhitney_known_values(spark):
    """Identical samples -> z = 0, U = n^2/2 with mid-ranks; a fully
    shifted sample gives U = n_a * n_b (max) and positive z."""
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        mannwhitney_u,
    )

    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    same = mannwhitney_u(a, a, "v").collect()[0]
    assert same.z == 0.0 and same.u_stat == 50.0  # n*n/2 under ties
    hi = spark.createDataFrame([(float(i) + 100.0,) for i in range(10)], "v double")
    shift = mannwhitney_u(a, hi, "v").collect()[0]
    assert shift.u_stat == 100.0  # every b beats every a
    assert shift.z > 3.0
    # direction flips when sides swap
    assert mannwhitney_u(hi, a, "v").collect()[0].u_stat == 0.0


def test_js_divergence_bounds_and_symmetry(spark):
    import math

    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        js_divergence,
    )

    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    b = spark.createDataFrame([(float(i % 10) + 100.0,) for i in range(50)], "x double")
    # disjoint supports → JSD = 1 bit
    r = js_divergence(a, b, "x", n_bins=4).collect()[0]
    assert (r.js_divergence, r.n_a, r.n_b) == (1.0, 100, 50)
    # identical samples → 0
    same = js_divergence(a, a, "x", n_bins=8).collect()[0]
    assert same.js_divergence == 0.0
    # symmetry
    ab = js_divergence(a, b, "x", n_bins=8).collect()[0].js_divergence
    ba = js_divergence(b, a, "x", n_bins=8).collect()[0].js_divergence
    assert math.isclose(ab, ba, abs_tol=1e-9)


def test_quantile_drift_detects_shift_and_keeps_null_keys(spark):
    """A scaled side shows quantile diffs + positive linf; identical
    sides show ~zero; NULL-key groups survive the null-safe join; a
    key on only one side reports with NULL stats, never dropped."""
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        quantile_drift,
    )

    a = spark.range(0, 6000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    ).withColumn("k", F.when(F.col("k") == "2", None).otherwise(F.col("k")))
    kw = dict(lo=0.0, hi=1500.0, n_buckets=50)
    same = {
        r.k: r
        for r in quantile_drift(a, a, "v", ["k"], **kw).collect()
    }
    assert set(same) == {None, "0", "1"}  # NULL group survives
    for r in same.values():
        assert r["q_0_5_diff"] == 0.0 and r["linf"] == 0.0
    shifted = a.withColumn("v", F.col("v") * 1.2)
    drift = {
        r.k: r
        for r in quantile_drift(a, shifted, "v", ["k"], **kw).collect()
    }
    for r in drift.values():
        assert r["q_0_9_diff"] > 100 and r["linf"] > 0.01
    # one-sided key: reported with NULLs, not dropped
    b = a.filter(F.col("k") == "0")
    one = {
        r.k: r
        for r in quantile_drift(a, b, "v", ["k"], **kw).collect()
    }
    assert set(one) == {None, "0", "1"}
    assert one["1"]["n_b"] is None and one["1"]["linf"] is None
    assert one["0"]["linf"] == 0.0


def test_checksum_drilldown_finds_all_diff_classes(spark):
    """checksum_drilldown: identical tables -> empty (phase 1 only);
    modified/inserted/deleted rows all surface with multiset counts;
    NULL values diff like values; duplicate rows diff by count."""
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        checksum_drilldown,
    )

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d"), (4, "d")],
        "k long, v string",
    )
    # identical -> empty, and the empty frame keeps the full schema
    same = checksum_drilldown(left, left, ["k", "v"], n_buckets=8)
    assert same.count() == 0
    assert same.columns == ["k", "v", "n_left", "n_right"]
    right = spark.createDataFrame(
        [
            (1, "a"),        # unchanged
            (2, "B"),        # modified
            (3, "x"),        # NULL -> value
            (4, "d"),        # one of the duplicates dropped
            (9, "new"),      # inserted
        ],
        "k long, v string",
    )
    out = {
        (r.k, r.v): (r.n_left, r.n_right)
        for r in checksum_drilldown(left, right, ["k", "v"], n_buckets=8).collect()
    }
    assert out == {
        (2, "b"): (1, 0),
        (2, "B"): (0, 1),
        (3, None): (1, 0),
        (3, "x"): (0, 1),
        (4, "d"): (2, 1),
        (9, "new"): (0, 1),
    }


def test_checksum_drilldown_prunes_to_bad_buckets(spark):
    """Phase 2 must scan only the mismatched buckets: with one
    corrupted row among many, the value-diff join processes a strict
    subset of each side (pinned by injecting the bucket filter's
    selectivity into the row counts the groupBys see)."""
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        _row_hash,
        checksum_drilldown,
    )

    n, buckets = 2000, 64
    left = spark.range(n).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    right = left.withColumn(
        "v", F.when(F.col("k") == 123, F.lit("CORRUPT")).otherwise(F.col("v"))
    )
    out = checksum_drilldown(left, right, ["k", "v"], n_buckets=buckets)
    rows = {(r.k, r.v) for r in out.collect()}
    assert rows == {(123, "v123"), (123, "CORRUPT")}
    # the two differing row VERSIONS land in (at most) two buckets —
    # the filter the drill applies keeps ~2/64 of the table
    h = _row_hash(["k", "v"])
    bad_l = left.where(F.col("k") == 123).select((h % buckets).alias("b"))
    bad_r = right.where(F.col("k") == 123).select((h % buckets).alias("b"))
    bad = {r.b for r in bad_l.collect()} | {r.b for r in bad_r.collect()}
    kept = left.where((h % buckets).isin(list(bad))).count()
    assert kept < n / 8  # pruning is real, not a full scan


def test_checksum_drilldown_validation(spark):
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        checksum_drilldown,
    )

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="non-empty"):
        checksum_drilldown(df, df, [])
    with pytest.raises(ValueError, match="n_buckets"):
        checksum_drilldown(df, df, ["k"], n_buckets=0)


def test_row_hash_serialization_is_injective(spark):
    """Regression for the separator/NULL-sentinel aliasing class: a
    plain separator-joined concat would hash ('a\\x1fb','c') equal to
    ('a','b\\x1fc') and a literal sentinel string equal to SQL NULL —
    with the length-prefixed encoding both pairs DIFF, so a checksum
    can never 'hide' them."""
    from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
        checksum_drilldown,
    )

    left = spark.createDataFrame(
        [("a\x1fb", "c"), ("\x00NULL", "z")], "x string, y string"
    )
    right = spark.createDataFrame(
        [("a", "b\x1fc"), (None, "z")], "x string, y string"
    )
    out = checksum_drilldown(left, right, ["x", "y"], n_buckets=4)
    assert out.count() == 4  # all four row versions surface
