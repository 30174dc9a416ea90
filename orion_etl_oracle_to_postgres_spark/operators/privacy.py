"""[EXT] Privacy auditing (SURVEY.md §2.11): k-anonymity over
quasi-identifier columns. The reference moves PII with at most a
per-column hash/mask (`/root/reference/` has no audit surface at all);
a migration that pseudonymizes direct identifiers can still leak
identity through COMBINATIONS of innocuous columns — (zip, birth year,
segment) famously re-identifies most of a population. This operator
measures that risk before publish.

Scale shape: one groupBy over the quasi-identifier tuple (map-side
combined word-count shape) and a tiny ordered report; nothing else
shuffles. Pairs with the `hash`/`mask`/`encrypt` transform ops and the
quarantine policy: audit → generalize or suppress → re-audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """The ``top_n`` smallest quasi-identifier groups with size < ``k``
    — the rows whose combination of 'harmless' attributes makes them
    re-identifiable. Empty result ⇔ the dataset IS k-anonymous for
    these columns. Deterministic ordering: size asc, then the quasi
    values."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("group_size"))
    return (
        groups.filter(F.col("group_size") < k)
        .orderBy(F.asc("group_size"), *[F.asc(c) for c in quasi_cols])
        .limit(top_n)
    )


def k_anonymity_stats(df: DataFrame, quasi_cols: list[str], *, k: int = 5) -> DataFrame:
    """One-row summary: total groups, groups below k, rows at risk, and
    the minimum group size — the publish-gate number ('is min_k >= k?')
    without materializing the offending rows."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__n"))
    # coalesce the sums: on an EMPTY input they'd be NULL and a publish
    # gate comparing == 0 would silently misbehave (min stays NULL —
    # "no groups" has no meaningful minimum); matches the DuckDB oracle
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(
            F.sum(F.when(F.col("__n") < k, 1).otherwise(0)), F.lit(0)
        ).alias("groups_below_k"),
        F.coalesce(
            F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0)), F.lit(0)
        ).alias("rows_at_risk"),
        F.min("__n").alias("min_group_size"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    l: int = 2,
    top_n: int = 100,
) -> DataFrame:
    """Distinct-l-diversity audit — k-anonymity's necessary companion:
    a group can be large (k-anonymous) yet carry ONE sensitive value,
    so membership alone discloses it (the homogeneity attack). Reports
    the ``top_n`` least-diverse quasi-identifier groups with fewer than
    ``l`` distinct sensitive values (NULLs don't count as a value).
    Empty result ⇔ every group is distinct-l-diverse. One groupBy with
    an exact count_distinct (per-group cardinality is bounded by the
    sensitive domain, not the corpus — no sketch needed), deterministic
    ordering."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
    )
    return (
        groups.filter(F.col("n_sensitive") < l)
        .orderBy(
            F.asc("n_sensitive"),
            F.desc("group_size"),
            *[F.asc(c) for c in quasi_cols],
        )
        .limit(top_n)
    )
