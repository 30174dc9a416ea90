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


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    t: float = 0.2,
    top_n: int = 100,
    decimals: int = 6,
) -> DataFrame:
    """t-closeness audit (categorical, total-variation distance) — the
    third leg after k-anonymity and l-diversity: a group can be large
    AND diverse yet still leak by SKEW (90% of one diagnosis in a group
    vs 10% globally tells an attacker plenty). Reports the ``top_n``
    quasi-identifier groups whose sensitive-value distribution sits
    further than ``t`` from the global distribution:
    ``TVD(P_g, P) = ½ Σ_v |p_g(v) − p(v)|``, NULL sensitive values
    excluded (as in the l-diversity audit). Empty result ⇔ the dataset
    is t-close for these columns.

    Engine-exact arithmetic: with integer counts, TVD_g =
    [Σ_{v∈g} |c_gv·n − c_v·c_g| + c_g·(n − Σ_{v∈g} c_v)] / (2·c_g·n)
    — numerator and denominator are exact int64 (the second term is
    the mass of values ABSENT from the group), so the only float op is
    one final division + round and the DuckDB oracle reproduces it
    bit-for-bit. (int64 bound: c·n ≤ n², fine to ~3·10⁹ audited rows;
    beyond that switch the products to double.)

    Scale shape: one (quasi, value) aggregate, the global value table
    broadcast back, a window PARTITIONED by the quasi tuple for the
    group size, then one group aggregate + bounded ordered report —
    shuffles carry (quasi, value, count) rows only.
    """
    from pyspark.sql.window import Window

    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if not 0.0 <= t <= 1.0:
        raise ValueError(f"t must be in [0, 1], got {t}")
    base = df.filter(F.col(sensitive_col).isNotNull()).select(
        *quasi_cols, F.col(sensitive_col).alias("__s")
    )
    gv = base.groupBy("__s").agg(F.count(F.lit(1)).alias("__cv"))
    n_tot = base.agg(F.count(F.lit(1)).alias("__n"))
    grp_val = base.groupBy(*quasi_cols, "__s").agg(
        F.count(F.lit(1)).alias("__cgv")
    )
    w = Window.partitionBy(*quasi_cols)
    joined = (
        grp_val.join(F.broadcast(gv), "__s")
        .crossJoin(F.broadcast(n_tot))
        .withColumn("__cg", F.sum("__cgv").over(w))
    )
    stats = joined.groupBy(*quasi_cols).agg(
        F.max("__cg").alias("group_size"),
        F.sum(
            F.abs(F.col("__cgv") * F.col("__n") - F.col("__cv") * F.col("__cg"))
        ).alias("__present"),
        F.sum("__cv").alias("__sv"),
        F.max("__n").alias("__nn"),
    )
    tvd = F.round(
        (
            F.col("__present")
            + F.col("group_size") * (F.col("__nn") - F.col("__sv"))
        )
        / (2.0 * F.col("group_size") * F.col("__nn")),
        decimals,
    )
    return (
        stats.withColumn("tvd", tvd)
        .filter(F.col("tvd") > float(t))
        .select(*quasi_cols, "group_size", "tvd")
        .orderBy(F.desc("tvd"), *[F.asc(c) for c in quasi_cols])
        .limit(top_n)
    )
