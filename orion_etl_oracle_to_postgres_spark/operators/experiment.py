"""[EXT] Experiment analysis (SURVEY.md §2.11): deterministic A/B
assignment + Welch's two-sample t-test over an event stream — the
"did the variant move the metric" readout every product-analytics
deployment of an engine like this ends up running. The reference has
no statistics surface at all; this is the minimal inferential layer on
top of the aggregate machinery (regression/MAD-outlier kin live in
``queries.py`` / ``quantiles.py``).

Built entirely from JVM-side aggregates: per-unit metric rollup (one
hash aggregate), then ONE global conditional aggregate computing both
variants' n/mean/sample-variance side by side — no pivot, no second
shuffle, a single row out. Welch (unequal variances) rather than
pooled Student: traffic splits and variant behavior are never
variance-homogeneous in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import md5_hash60

_BUCKETS = 1000


def ab_assign(
    df: DataFrame, unit_col: str, *, salt: str, treat_per_mille: int = 500
) -> DataFrame:
    """Deterministic unit-level bucketing: ``variant`` 1 (treatment)
    for units whose portable ``md5_60(unit || ':' || salt) % 1000``
    falls under ``treat_per_mille``, else 0. Every event of a unit
    lands in the same arm on every engine and every re-run — the
    property that makes the test replayable (and the assignment
    auditable) with no assignment table to store or join. Pure
    projection, zero shuffles.
    """
    if not 0 <= treat_per_mille <= _BUCKETS:
        raise ValueError(
            f"treat_per_mille must be in [0, {_BUCKETS}], got {treat_per_mille}"
        )
    h = md5_hash60(F.concat(F.col(unit_col).cast("string"), F.lit(":" + salt)))
    return df.withColumn(
        "variant", F.when(h % _BUCKETS < treat_per_mille, 1).otherwise(0)
    )


def ab_welch_ttest(
    df: DataFrame,
    unit_col: str,
    metric_col: str,
    *,
    salt: str,
    treat_per_mille: int = 500,
) -> DataFrame:
    """Welch's t-test on a per-unit metric between hash-assigned arms.

    Stages (all one plan): ``ab_assign`` → per-unit metric = SUM of
    ``metric_col`` over the unit's events (units with no events simply
    don't exist in an event table — both arms are event-defined) → one
    global aggregate with conditional ``count/avg/var_samp`` per arm →
    the Welch statistic and Satterthwaite degrees of freedom as a
    closing projection:

        t  = (m1 - m0) / sqrt(v1/n1 + v0/n0)
        df = (v1/n1 + v0/n0)^2 / ((v1/n1)^2/(n1-1) + (v0/n0)^2/(n0-1))

    Returns ONE row: (n_0, n_1, mean_0, mean_1, var_0, var_1, t_stat,
    dof). p-values need the t CDF — out of scope for a SQL-replayable
    surface; at the usual unit counts dof is large and t is read
    against the normal table anyway.

    100 TB shape: the per-unit rollup is the only real shuffle (keyed
    on the unit id — uniform by construction); the final aggregate is
    map-side combined into a single row. Nothing wide ever moves.
    """
    per_unit = (
        ab_assign(df, unit_col, salt=salt, treat_per_mille=treat_per_mille)
        .groupBy(F.col(unit_col).alias("__u"), "variant")
        .agg(F.sum(metric_col).alias("__m"))
    )
    t = F.when(F.col("variant") == 1, F.col("__m"))
    c = F.when(F.col("variant") == 0, F.col("__m"))
    # internal __-names throughout the stats row: Spark 4 lateral column
    # aliases mean `round(x, 6) AS x` SHADOWS x for later expressions in
    # the same select — t_stat must see the RAW means, not the rounded
    # display copies
    stats = per_unit.agg(
        F.count(c).alias("__n0"),
        F.count(t).alias("__n1"),
        F.avg(c).alias("__m0"),
        F.avg(t).alias("__m1"),
        F.var_samp(c).alias("__v0"),
        F.var_samp(t).alias("__v1"),
    )
    se0 = F.col("__v0") / F.col("__n0")
    se1 = F.col("__v1") / F.col("__n1")
    return stats.select(
        F.col("__n0").alias("n_0"),
        F.col("__n1").alias("n_1"),
        F.round("__m0", 6).alias("mean_0"),
        F.round("__m1", 6).alias("mean_1"),
        F.round("__v0", 6).alias("var_0"),
        F.round("__v1", 6).alias("var_1"),
        F.round(
            (F.col("__m1") - F.col("__m0")) / F.sqrt(se0 + se1), 6
        ).alias("t_stat"),
        F.round(
            F.pow(se0 + se1, F.lit(2.0))
            / (
                F.pow(se0, F.lit(2.0)) / (F.col("__n0") - 1)
                + F.pow(se1, F.lit(2.0)) / (F.col("__n1") - 1)
            ),
            2,
        ).alias("dof"),
    )


def ab_cuped_ttest(
    df: DataFrame,
    unit_col: str,
    metric_col: str,
    ts_col: str,
    split_ts: str,
    *,
    salt: str,
    treat_per_mille: int = 500,
) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM'13): each
    unit's PRE-period metric (events before ``split_ts``) is used as a
    covariate — ``adj = post - theta * (pre - mean(pre))`` with
    ``theta = cov(pre, post) / var(pre)`` pooled over BOTH arms (the
    standard, assignment-independent estimator) — then Welch's t runs
    on the adjusted metric. Same decision, tighter confidence: the
    variance shrinks by the squared pre/post correlation, which is why
    every large experimentation platform ships this next to the plain
    t-test.

    One unit-keyed shuffle (the pre/post rollup), then a 1-row pooled
    stats aggregate broadcast into the closing 1-row conditional
    aggregate — nothing wide moves. Units with no pre-period events
    have pre = 0 (a real zero, not a NULL — absence of activity IS the
    covariate value). Degenerate var(pre) = 0 → theta = 0 (plain
    t-test)."""
    cut = F.lit(split_ts).cast("timestamp")
    per_unit = (
        ab_assign(df, unit_col, salt=salt, treat_per_mille=treat_per_mille)
        .groupBy(F.col(unit_col).alias("__u"), "variant")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col(ts_col) < cut, F.col(metric_col))), F.lit(0.0)
            ).alias("__pre"),
            F.coalesce(
                F.sum(F.when(F.col(ts_col) >= cut, F.col(metric_col))), F.lit(0.0)
            ).alias("__post"),
        )
    )
    pooled = per_unit.agg(
        F.avg("__pre").alias("__mp"),
        F.var_samp("__pre").alias("__vp"),
        F.covar_samp("__pre", "__post").alias("__cv"),
    )
    theta = F.when(F.col("__vp") > 0, F.col("__cv") / F.col("__vp")).otherwise(
        F.lit(0.0)
    )
    adj = per_unit.crossJoin(F.broadcast(pooled)).select(
        "variant",
        (
            F.col("__post") - theta * (F.col("__pre") - F.col("__mp"))
        ).alias("__m"),
    )
    t = F.when(F.col("variant") == 1, F.col("__m"))
    c = F.when(F.col("variant") == 0, F.col("__m"))
    stats = adj.agg(
        F.count(c).alias("__n0"),
        F.count(t).alias("__n1"),
        F.avg(c).alias("__m0"),
        F.avg(t).alias("__m1"),
        F.var_samp(c).alias("__v0"),
        F.var_samp(t).alias("__v1"),
    )
    se0 = F.col("__v0") / F.col("__n0")
    se1 = F.col("__v1") / F.col("__n1")
    return stats.select(
        F.col("__n0").alias("n_0"),
        F.col("__n1").alias("n_1"),
        F.round("__m0", 6).alias("adj_mean_0"),
        F.round("__m1", 6).alias("adj_mean_1"),
        F.round("__v0", 6).alias("adj_var_0"),
        F.round("__v1", 6).alias("adj_var_1"),
        F.round(
            (F.col("__m1") - F.col("__m0")) / F.sqrt(se0 + se1), 6
        ).alias("t_stat"),
    )


# Poisson(1) pmf quantized to per-mille cumulative thresholds — the
# deterministic stand-in for the Poisson bootstrap's random weights
# (hash bucket < 368 -> w=0, < 736 -> 1, < 920 -> 2, ...). Replayable
# by any engine from the same literals.
_POISSON_CUM_PM = (368, 736, 920, 981, 996, 999)


def bootstrap_mean_ci(
    df: DataFrame,
    unit_col: str,
    metric_col: str,
    *,
    n_replicas: int = 100,
    seed: str = "bs0",
    ci: float = 0.95,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-unit metric
    mean (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams"): each replica reweights every unit by an independent
    Poisson(1) draw — here a DETERMINISTIC per-mille hash of
    (unit, replica, seed) against the quantized pmf, so the whole
    resample is replayable bit-for-bit by any engine (no RNG state, no
    driver loop). Returns one row: point estimate, bootstrap SE, and
    the exact-percentile CI over the replica means.

    100 TB shape: one unit rollup shuffle, then an in-row explode to
    (unit × n_replicas) lightweight rows feeding ONE replica-keyed
    aggregate (map-side combined; n_replicas ~ 100 keys), closed by a
    tiny exact-percentile aggregate over n_replicas values. The corpus
    is never duplicated on disk and nothing wide shuffles."""
    if not 1 <= n_replicas <= 10_000:
        raise ValueError(f"n_replicas must be in [1, 10000], got {n_replicas}")
    if not 0.5 <= ci < 1.0:
        raise ValueError(f"ci must be in [0.5, 1), got {ci}")
    per_unit = df.groupBy(F.col(unit_col).alias("__u")).agg(
        F.sum(metric_col).alias("__m")
    )
    reps = per_unit.withColumn(
        "__b", F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1)))
    )
    h = md5_hash60(
        F.concat(
            F.col("__u").cast("string"),
            F.lit(":"),
            F.col("__b").cast("string"),
            F.lit(":" + seed),
        )
    ) % _BUCKETS
    w = F.lit(len(_POISSON_CUM_PM))
    for i in reversed(range(len(_POISSON_CUM_PM))):
        w = F.when(h < _POISSON_CUM_PM[i], F.lit(i)).otherwise(w)
    replica_means = (
        reps.withColumn("__w", w)
        .groupBy("__b")
        .agg(
            (F.sum(F.col("__w") * F.col("__m")) / F.sum("__w")).alias("__rm")
        )
    )
    lo_p, hi_p = (1.0 - ci) / 2.0, 1.0 - (1.0 - ci) / 2.0
    point = per_unit.agg(F.avg("__m").alias("__pt"))
    return (
        replica_means.crossJoin(F.broadcast(point))
        .agg(
            F.round(F.first("__pt"), 6).alias("point_est"),
            F.round(F.stddev_samp("__rm"), 6).alias("boot_se"),
            F.round(F.expr(f"percentile(__rm, {lo_p})"), 6).alias("ci_lo"),
            F.round(F.expr(f"percentile(__rm, {hi_p})"), 6).alias("ci_hi"),
            F.count(F.lit(1)).alias("n_replicas"),
        )
    )
