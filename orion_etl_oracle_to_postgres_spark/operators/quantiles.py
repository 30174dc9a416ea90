"""Per-group quantiles at scale.

The exact form (``percentile`` / SQL ``percentile_cont``) buffers every
value of a group in executor memory — correct, and the differential
oracle gate, but a scale-killer on a 100 TB group-by (a hot group's
values must fit on one executor). The scale path is
``approx_percentile``: Spark's Greenwald-Khanna quantile summary keeps a
bounded sketch per group (size O(accuracy), independent of group row
count) with rank error ≤ 1/accuracy, and sketches merge associatively in
the partial aggregate — memory stays flat as rows grow 100×.

Motivating workload (VERDICT r2): corpus-quality cutoffs — "drop
documents below the per-language p10 quality score" — are exactly
per-group percentile queries over trillions of rows.

No counterpart in the reference (it has no aggregation at all —
SURVEY.md §2.8); this extends the engine's aggregate surface alongside
``queries.agg_exact_percentiles``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_group_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
    prefix: str = "p",
) -> DataFrame:
    """Bounded-memory per-group quantiles.

    Returns one row per key combination with columns ``<prefix><q*100>``
    (e.g. ``p50``, ``p99``) and ``n``. One shuffle, map-side partial
    sketches, O(accuracy) state per group — the plan survives 100×.
    """
    qs = ", ".join(repr(float(q)) for q in quantiles)
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.expr(
            f"approx_percentile({value_col}, array({qs}), {int(accuracy)})"
        ).alias("_aq"),
        F.count(F.lit(1)).alias("n"),
    )
    cols = [F.col(k) for k in keys]
    for i, q in enumerate(quantiles):
        name = f"{prefix}{int(round(q * 100))}"
        cols.append(F.col("_aq").getItem(i).alias(name))
    cols.append(F.col("n"))
    return agg.select(*cols)


def group_quantile_bounds(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    quantiles: Sequence[float],
    *,
    exact: bool = False,
    accuracy: int = 10000,
    decimals: int = 6,
) -> DataFrame:
    """Per-group quantile boundary frame ``(keys..., __qb array<double>)``.

    ``exact=False`` (default) uses the bounded-memory approx sketch —
    the 100 TB path; ``exact=True`` uses ``percentile`` (per-group value
    buffering — gate/oracle use only). Boundaries are ROUNDED to
    ``decimals`` so downstream comparisons (clip/bucket) agree across
    engines: two engines interpolating the same quantile can differ in
    the last ulp, and an unrounded boundary would flip rows that land
    inside that ulp."""
    qs = ", ".join(repr(float(q)) for q in quantiles)
    fn = "percentile" if exact else f"approx_percentile"
    acc = "" if exact else f", {int(accuracy)}"
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.transform(
            F.expr(f"{fn}({value_col}, array({qs}){acc})"),
            lambda b: F.round(b, decimals),
        ).alias("__qb")
    )


def _nullsafe_join_back(df: DataFrame, stats: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Broadcast ``stats`` back onto ``df`` matching NULL group keys
    too: a plain ``join(..., keys)`` uses NULL-rejecting equality, so
    rows whose group key is NULL would silently vanish from the output
    even though the groupBy produced a NULL-key stats row (review
    finding r4). ``eqNullSafe`` keys keep the join a broadcast hash
    equi-join."""
    renamed = stats
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__sk_{k}")
    cond = None
    for k in keys:
        eq = df[k].eqNullSafe(F.col(f"__sk_{k}"))
        cond = eq if cond is None else cond & eq
    return df.join(F.broadcast(renamed), cond).drop(*[f"__sk_{k}" for k in keys])


def winsorize(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    *,
    exact: bool = False,
    accuracy: int = 10000,
    out_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-group winsorization (outlier clipping): values below the
    group's ``lo`` quantile / above its ``hi`` quantile are clamped to
    those bounds — the standard robustness transform before training on
    heavy-tailed measures. All input columns pass through plus
    ``<value_col>_wins`` (or ``out_col``).

    Plan: one aggregate builds the per-group bounds (rows = #groups),
    broadcast-joined back — no second shuffle of the data. Bounds come
    from the approx sketch by default (bounded memory at 100 TB);
    ``exact=True`` for the differential gate."""
    bounds = group_quantile_bounds(
        df, keys, value_col, (lo, hi),
        exact=exact, accuracy=accuracy, decimals=decimals,
    )
    out = out_col or f"{value_col}_wins"
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("__qb").getItem(0)),
        F.col("__qb").getItem(1),
    )
    return (
        _nullsafe_join_back(df, bounds, keys)
        .withColumn(out, clipped)
        .drop("__qb")
    )


def frequency_bins(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_bins: int = 10,
    *,
    exact: bool = False,
    accuracy: int = 10000,
    out_col: str = "bin",
    decimals: int = 4,
) -> DataFrame:
    """Per-group equal-frequency binning: bin b = number of interior
    quantile boundaries strictly below the value (0-based, ``n_bins``
    buckets) — quantile-bucketed balancing for mixing/stratification.

    Differs from ``ntile`` deliberately: ntile needs a TOTAL ORDER of
    each group (full sort, and ties split arbitrarily across bins —
    engine-dependent); boundary-counting is a pure per-row projection
    against a broadcast bounds frame — deterministic, no sort, and the
    same row always lands in the same bin under any partitioning.

    Boundary membership: ``F.aggregate`` over the bounds array (JVM
    fold, no UDF). Bounds are rounded (see ``group_quantile_bounds``)
    so both engines in a differential pair bucket identically."""
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = group_quantile_bounds(
        df, keys, value_col, qs, exact=exact, accuracy=accuracy, decimals=decimals
    )
    bin_expr = F.aggregate(
        F.col("__qb"),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(value_col) > b, 1).otherwise(0),
    )
    return (
        _nullsafe_join_back(df, bounds, keys)
        .withColumn(out_col, bin_expr)
        .drop("__qb")
    )


def normalize_columns(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    *,
    method: str = "zscore",
    decimals: int = 6,
    suffix: str = "_norm",
) -> DataFrame:
    """Per-group feature normalization: ``zscore`` ((x − mean)/stddev,
    population stddev; 0.0 for constant groups) or ``minmax``
    ((x − min)/(max − min); 0.0 for constant groups). Appends
    ``<col><suffix>`` per value column.

    Plan: ONE aggregate computes every column's group statistics
    (rows = #groups), broadcast back — the same
    bounds-aggregate-then-project shape as ``winsorize``; the data
    never shuffles."""
    if method not in ("zscore", "minmax"):
        raise ValueError(f"method must be zscore|minmax, got {method!r}")
    aggs = []
    for c in value_cols:
        if method == "zscore":
            aggs += [
                F.avg(c).alias(f"__m_{c}"),
                F.stddev_pop(c).alias(f"__s_{c}"),
            ]
        else:
            aggs += [
                F.min(c).alias(f"__lo_{c}"),
                F.max(c).alias(f"__hi_{c}"),
            ]
    stats = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    out = _nullsafe_join_back(df, stats, keys)
    for c in value_cols:
        if method == "zscore":
            expr = F.when(
                F.col(f"__s_{c}") > 0,
                (F.col(c) - F.col(f"__m_{c}")) / F.col(f"__s_{c}"),
            ).otherwise(F.lit(0.0))
        else:
            rng = F.col(f"__hi_{c}") - F.col(f"__lo_{c}")
            expr = F.when(
                rng > 0, (F.col(c) - F.col(f"__lo_{c}")) / rng
            ).otherwise(F.lit(0.0))
        out = out.withColumn(f"{c}{suffix}", F.round(expr, decimals))
    drop = [col for c in value_cols for col in (
        (f"__m_{c}", f"__s_{c}") if method == "zscore" else (f"__lo_{c}", f"__hi_{c}")
    )]
    return out.drop(*drop)


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    *,
    n_buckets: int = 64,
    decimals: int = 6,
) -> DataFrame:
    """EXACT global quantiles, distributed: the value at global rank
    ``max(1, ceil(q·n))`` for each requested q — the discrete
    ("type 1") quantile, no interpolation, so the answer is always an
    observed value and engine-portable (interpolated percentile_cont
    differs in float association across engines).

    Where ``approx_group_quantiles`` trades rank error for flat memory,
    this is the audit-grade companion: exact, but still never a
    single-partition sort — the global rank comes from the two-phase
    range-bucket + partitioned row_number + broadcast prefix counts in
    ``operators/ranks.py``, and each quantile is then ONE equality
    probe against the ranked stream (all qs resolved in the same pass).
    NULLs are excluded (they have no rank). Returns (q, value), one row
    per q, value rounded to ``decimals``.

    100 TB shape: one min/max pass, one n_buckets-reducer rank shuffle,
    one broadcast of the (q, target_rank) table — no collect of data
    rows, no full sort on one task.
    """
    from fractions import Fraction

    from .ranks import global_row_number

    qlist = sorted(set(float(x) for x in qs))
    if not qlist or not all(0.0 <= x <= 1.0 for x in qlist):
        raise ValueError(f"qs must be fractions in [0, 1], got {qs!r}")
    vals = df.select(F.col(value_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    n_tot = vals.agg(F.count(F.lit(1)).alias("__n"))
    # ceil(q*n) in EXACT integer arithmetic: double ceil(0.07 * 100)
    # gives 8 (the product rounds to 7.000000000000001), off by one
    # observation. Each q becomes the exact rational p/den of its
    # decimal repr, and ceil(p*n/den) = (p*n + den - 1) div den —
    # computed in DECIMAL(38,0): a q like 1/3 has p ≈ 3.3e15, so the
    # long product would overflow past ~2767 rows (silent wrap under
    # non-ANSI, ARITHMETIC_OVERFLOW under ANSI); 38 decimal digits
    # hold p·n exactly up to 10^38.
    fracs = [
        (x, Fraction(str(x)).numerator, Fraction(str(x)).denominator)
        for x in qlist
    ]
    targets = (
        vals.sparkSession.createDataFrame(
            fracs, "q double, __p long, __den long"
        )
        .crossJoin(F.broadcast(n_tot))
        .select(
            "q",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    "CAST((CAST(__p AS DECIMAL(38,0)) * __n + __den - 1) "
                    "div __den AS BIGINT)"
                ),
            ).alias("__target"),
        )
    )
    ranked = global_row_number(
        vals, F.col("__v"), [], out_col="__rn", n_buckets=n_buckets
    )
    return (
        ranked.join(F.broadcast(targets), F.col("__rn") == F.col("__target"))
        .select("q", F.round(F.col("__v"), decimals).alias("value"))
        .orderBy("q")
    )
