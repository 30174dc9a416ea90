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
