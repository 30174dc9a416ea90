"""Snapshot reconciliation — the migration-validation diff.

The reference's whole purpose is moving tables between databases, yet
it offers no way to answer "did the load produce the same table?"
beyond per-batch row counts (``/root/reference/pipeline.py:100,116``).
``snapshot_diff`` is that missing check as one relational plan: a
full-outer join of two snapshots on the key columns, each row
classified ``added`` (only in the new snapshot), ``removed`` (only in
the old), ``changed`` (key present in both, any compared column
differs, null-safe), or ``same``.

Scale shape: ONE full-outer hash join on the keys (both sides shuffle
once on the same key — co-partitioned/bucketed layouts make it
shuffle-free), and the per-column comparison is a null-safe conjunction
evaluated inside the join's projection. The summary aggregate
(``diff_summary``) is a 4-row groupBy. 100 TB note: compare
fingerprints, not wide rows — pass ``compare_cols=["__fp"]`` with a
hash column computed on each side to cut the shuffled payload to
(key, hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    compare_cols: list[str] | None = None,
    check_duplicates: bool = True,
) -> DataFrame:
    """→ ``(keys..., diff_status)`` for every key in either snapshot.

    ``compare_cols`` defaults to all shared non-key columns; comparison
    is null-safe (NULL == NULL counts as same — a difference report,
    not SQL ternary logic). Duplicate keys within a side would multiply
    rows through the full-outer join and skew ``diff_summary`` counts,
    so by default each side is asserted duplicate-free up front (one
    groupBy-count with ``limit(1)`` per side — cheap relative to the
    join; pass ``check_duplicates=False`` to skip the eager probe when
    keys are known unique, e.g. a primary-keyed JDBC snapshot)."""
    if not keys:
        raise ValueError("snapshot_diff needs at least one key column")
    for side, df in (("old", old), ("new", new)):
        missing = [k for k in keys if k not in df.columns]
        if missing:
            raise ValueError(f"{side} snapshot lacks key columns {missing}")
    if check_duplicates:
        for side, df in (("old", old), ("new", new)):
            dup = (
                df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .limit(1)
                .count()
            )
            if dup:
                raise ValueError(
                    f"{side} snapshot has duplicate keys on {keys} — "
                    "dedup it first or diff on a truly unique key"
                )
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - set(keys)
        )
    else:
        for side, df in (("old", old), ("new", new)):
            missing = [c for c in compare_cols if c not in df.columns]
            if missing:
                raise ValueError(f"{side} snapshot lacks columns {missing}")

    # explicit presence markers, NOT isNotNull on key values — a row
    # whose key VALUE is NULL is still present on its side (eqNullSafe
    # matches NULL keys across sides)
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_n"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")

    in_old = F.coalesce(F.col("__in_o"), F.lit(False))
    in_new = F.coalesce(F.col("__in_n"), F.lit(False))
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
            for k in keys
        ],
        status.alias("diff_status"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """→ ``(diff_status, n)`` — the 4-row report a migration signs off
    on (all-same ⇒ the load reproduced the table)."""
    return diff.groupBy("diff_status").agg(F.count(F.lit(1)).alias("n"))


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    *,
    n_bins: int = 10,
    exact: bool = False,
    eps: float = 1e-6,
    decimals: int = 6,
) -> DataFrame:
    """Population-stability drift report between two snapshots of a
    numeric column — the STATISTICAL complement to ``snapshot_diff``
    (which is exact row algebra): after a migration or between two
    ingestion epochs, "same rows" can still hide a shifted distribution
    upstream sampling would care about.

    Bins come from the OLD side's equal-frequency quantile boundaries
    (``quantiles.group_quantile_bounds`` — approx sketch by default,
    exact for the differential gate; boundaries rounded so engines
    agree), both sides are bucketed by boundary-count, and each bin
    reports ``psi_term = (q−p)·ln((q+eps)/(p+eps))`` — Σ psi_term is
    the standard PSI (rule of thumb: < 0.1 stable, > 0.25 shifted).

    Plan: one bounds aggregate on old, one bucket-count aggregate per
    side (map-side partials), a full-outer join over ≤ n_bins rows, and
    broadcast 1-row totals — nothing driver-side, nothing quadratic.
    Output: ``(bin, n_old, n_new, frac_old, frac_new, psi_term)``.
    """
    from .quantiles import group_quantile_bounds

    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = group_quantile_bounds(
        old.select(F.lit(1).alias("__g"), F.col(value_col)),
        ["__g"],
        value_col,
        qs,
        exact=exact,
        decimals=4,
    ).select("__qb")

    def bucket_counts(df: DataFrame, out: str) -> DataFrame:
        bin_expr = F.aggregate(
            F.col("__qb"),
            F.lit(0),
            lambda acc, b: acc + F.when(F.col(value_col) > b, 1).otherwise(0),
        )
        return (
            # NULL values would otherwise fold into bin 0 (every `> b`
            # is false) while the quantile bounds exclude them — drift
            # is a report over the NON-NULL population on both sides;
            # compare null RATES with profile_table/expectations
            df.select(F.col(value_col))
            .filter(F.col(value_col).isNotNull())
            .join(F.broadcast(bounds))
            .select(bin_expr.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    o = bucket_counts(old, "n_old")
    n = bucket_counts(new, "n_new")
    j = o.join(n, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    totals = j.agg(
        F.sum("n_old").alias("__to"), F.sum("n_new").alias("__tn")
    )
    p = F.col("n_old") / F.col("__to")
    q = F.col("n_new") / F.col("__tn")
    return (
        j.join(F.broadcast(totals))
        .select(
            "bin",
            "n_old",
            "n_new",
            F.round(p, decimals).alias("frac_old"),
            F.round(q, decimals).alias("frac_new"),
            F.round(
                (q - p) * F.log((q + F.lit(eps)) / (p + F.lit(eps))), decimals
            ).alias("psi_term"),
        )
    )
