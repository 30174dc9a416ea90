"""[EXT] Mergeable aggregate state (SURVEY.md §2.11): build / merge /
finalize partial aggregates so a continuously-ingesting pipeline can
maintain per-key statistics WITHOUT rescanning history — the batch
analogue of a streaming state store, and the algebraic foundation of
every map-side combine.

The state for each value column is the classic commutative monoid
(count, sum, sum-of-squares, min, max): any two states merge with
sums/min/max, so daily increments fold into the running state in one
key-partitioned shuffle over STATE rows (keys × columns), never over
the raw history. At 100 TB this is the difference between an O(day)
and an O(lifetime) nightly job.

Precision note: variance finalized from (Σx², Σx, n) loses ~half the
mantissa to cancellation when stddev ≪ mean; fine for monitoring-grade
stats (the unit test pins a 1e-6 relative tolerance), but exact-gated
comparisons should stick to the exactly-mergeable count/sum/avg/min/max
(what the driver query exposes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SUFFIXES = ("cnt", "sum", "ssq", "min", "max")


def _state_cols(value_cols: list[str]) -> list[str]:
    return [f"{c}__{s}" for c in value_cols for s in _SUFFIXES]


def build_agg_state(
    df: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """One state row per key tuple: for each value column, its
    (count, sum, sum-of-squares, min, max) over non-null values."""
    if not keys or not value_cols:
        raise ValueError("keys and value_cols must be non-empty")
    aggs = []
    for c in value_cols:
        v = F.col(c).cast("double")
        aggs += [
            F.count(v).alias(f"{c}__cnt"),
            F.sum(v).alias(f"{c}__sum"),
            F.sum(v * v).alias(f"{c}__ssq"),
            F.min(v).alias(f"{c}__min"),
            F.max(v).alias(f"{c}__max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    states: list[DataFrame], keys: list[str], value_cols: list[str]
) -> DataFrame:
    """Fold any number of state frames into one: union → one key-
    partitioned aggregate (sums for cnt/sum/ssq, min/max for bounds).
    Keys present in only some states merge correctly — absent rows
    simply contribute nothing."""
    if not states:
        raise ValueError("states must be non-empty")
    cols = keys + _state_cols(value_cols)
    missing = [c for s in states for c in cols if c not in s.columns]
    if missing:
        raise ValueError(f"state frames missing columns: {sorted(set(missing))}")
    u = states[0].select(cols)
    for s in states[1:]:
        u = u.unionByName(s.select(cols))
    aggs = []
    for c in value_cols:
        aggs += [
            F.sum(f"{c}__cnt").alias(f"{c}__cnt"),
            F.sum(f"{c}__sum").alias(f"{c}__sum"),
            F.sum(f"{c}__ssq").alias(f"{c}__ssq"),
            F.min(f"{c}__min").alias(f"{c}__min"),
            F.max(f"{c}__max").alias(f"{c}__max"),
        ]
    return u.groupBy(*keys).agg(*aggs)


def finalize_agg_state(
    state: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """State → human statistics: n, total, avg, min, max (+ var_samp /
    stddev_samp derived from the sum-of-squares — see the module
    precision note)."""
    out = [F.col(k) for k in keys]
    for c in value_cols:
        n, s, q = F.col(f"{c}__cnt"), F.col(f"{c}__sum"), F.col(f"{c}__ssq")
        # clamp at 0: cancellation in (q - s²/n) can go slightly negative
        # for (near-)constant groups, which would finalize as a negative
        # variance and a NaN stddev
        var = F.when(n > 1, F.greatest(q - s * s / n, F.lit(0.0)) / (n - 1))
        out += [
            n.alias(f"{c}_n"),
            s.alias(f"{c}_total"),
            F.when(n > 0, s / n).alias(f"{c}_avg"),
            F.col(f"{c}__min").alias(f"{c}_min"),
            F.col(f"{c}__max").alias(f"{c}_max"),
            var.alias(f"{c}_var"),
            F.sqrt(var).alias(f"{c}_stddev"),
        ]
    return state.select(*out)


def build_hll_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key HyperLogLog sketch state (Apache DataSketches via Spark's
    ``hll_sketch_agg``) — the DISTINCT-COUNT member of the mergeable-
    state family: the monoid states above handle count/sum/min/max, but
    count-distinct is not algebraic over raw counts; the HLL sketch is
    its mergeable form (union = merge), with ~1.6%/sqrt(2^(lg_k-12))
    standard error at fixed O(2^lg_k) bytes per key. Returns one row
    per key with a ``binary`` sketch column — persist it (parquet) and
    each day's increment folds in WITHOUT rescanning history, exactly
    like ``merge_agg_states``."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k))).alias("hll_state")
    )


def merge_hll_states(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    *,
    allow_different_lg_k: bool = True,
) -> DataFrame:
    """Fold two HLL state tables (full outer on keys; a key missing on
    one side keeps the other's sketch). Sketch union is associative and
    commutative, so daily states fold in any order to the identical
    estimate the full-history sketch would give — the property the unit
    test pins.

    lg_k contract: Spark's ``hll_union`` default refuses sketches built
    with different ``lg_k`` — a cryptic runtime error deep in the merge
    job if one day's state was built with a different precision. The
    default here flips that to ``allowDifferentLgConfigK=true``, where
    DataSketches soundly downgrades to the SMALLER lg_k (a wider error
    bar, never a wrong merge). Pass ``allow_different_lg_k=False`` to
    make a precision drift fail loudly instead — then persist ``lg_k``
    beside the state table and assert it before folding."""
    au = a.select(*keys, F.col("hll_state").alias("__ha"))
    bu = b.select(*keys, F.col("hll_state").alias("__hb"))
    both = au.join(bu, keys, "full_outer")
    merged = F.when(
        F.col("__ha").isNull(), F.col("__hb")
    ).when(
        F.col("__hb").isNull(), F.col("__ha")
    ).otherwise(
        F.hll_union(
            F.col("__ha"), F.col("__hb"), bool(allow_different_lg_k)
        )
    )
    return both.select(*keys, merged.alias("hll_state"))


def finalize_hll_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """→ (keys..., approx_distinct) from a sketch state table."""
    return state.select(
        *keys,
        F.hll_sketch_estimate(F.col("hll_state")).alias("approx_distinct"),
    )
