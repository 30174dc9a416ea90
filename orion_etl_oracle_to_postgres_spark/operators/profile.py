"""Table profiling: per-column quality statistics in ONE scan.

The reference engine has no profiling step — rows flow source→sink
blind. A data-quality profile (null rate, cardinality, bounds) is what
an ETL operator needs before choosing validation rules, and what a
training pipeline runs before trusting a new corpus drop. Citation (as
specification of the gap): Dims24/orion-etl-oracle-to-postgres
`plugins/default_validation.py` validates row-by-row but never surveys
a table.

Formulation: ALL per-column aggregates are packed into a single wide
``agg`` row — one pass, one job, no per-column scans — then unpivoted
to ``(column, stat...)`` rows via ``stack``. At 100 TB this is exactly
one map-side-combined aggregation regardless of column count; the
cost is k× aggregate buffers per task, not k× scans. Cardinality is
``approx_count_distinct`` by default (HLL, bounded memory) with an
exact opt-in for oracle gating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions import lit_double_array
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) → one row per column:
    ``(column, n_rows, n_nulls, null_frac, n_distinct, min_value,
    max_value)``. min/max are rendered as strings so heterogeneous
    column types fit one result schema (NULL when a type has no
    ordering or the column is all-NULL).

    ``exact_distinct=True`` swaps HLL for exact ``count(DISTINCT)`` —
    still one logical pass (Spark plans a single multi-distinct
    aggregate via Expand), but memory grows with true cardinality; the
    default HLL path is the 100 TB setting.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    # staging aliases are INDEX-based, never derived from user column
    # names — a name with spaces/quotes would corrupt the generated
    # stack() expression (names only appear as escaped string literals)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nulls_{i}"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"__nd_{i}")
        )
        aggs.append(F.min(col).cast("string").alias(f"__min_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{i}"))
    wide = df.agg(*aggs)

    # stack(k, 'name1', nulls1, nd1, min1, max1, ...) → long form
    stack_args: list[str] = []
    for i, c in enumerate(cols):
        label = c.replace("\\", "\\\\").replace("'", "\\'")
        stack_args.append(f"'{label}', __nulls_{i}, __nd_{i}, __min_{i}, __max_{i}")
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, "
            + ", ".join(stack_args)
            + ") AS (column, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def profile_histogram(
    df: DataFrame,
    column: str,
    n_bins: int = 10,
    *,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-WIDTH histogram of a numeric column — the visual-profiling
    companion to ``profile_table``'s scalars and the equi-FREQUENCY
    ``quantiles.frequency_bins`` (width bins show shape; frequency bins
    balance load). → ``(bin, lo, hi, n)``, one row per non-empty bin.

    Bounds default to the column's min/max (one tiny aggregate);
    ``width_bucket`` assigns bins JVM-side. Out-of-range values (only
    possible with caller-supplied bounds) and values exactly AT the
    upper bound fold into the edge bins (under/overflow buckets merged
    inward) so ``n`` always sums to the non-null row count. Map-side
    partial counting — the exchange carries ≤ n_bins rows per
    partition."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if lo is None or hi is None:
        row = df.agg(
            F.min(column).alias("lo"), F.max(column).alias("hi")
        ).collect()[0]
        if row["lo"] is None or row["hi"] is None:
            raise ValueError(
                f"profile_histogram: column {column!r} has no non-null "
                "values to bound — pass explicit lo/hi or profile a "
                "non-empty column"
            )
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0  # degenerate constant column: one bin holds all
    width = (hi - lo) / n_bins
    bucket = F.least(
        F.greatest(
            F.width_bucket(F.col(column), F.lit(lo), F.lit(hi), F.lit(n_bins)),
            F.lit(1),
        ),
        F.lit(n_bins),
    )
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(bucket.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            (F.col("bin") - 1).cast("int").alias("bin"),
            F.round(F.lit(lo) + (F.col("bin") - 1) * F.lit(width), 6).alias("lo"),
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("hi"),
            "n",
        )
    )


def profile_join_skew(
    df: DataFrame,
    key_col: str,
    *,
    top_n: int = 10,
) -> DataFrame:
    """Join-key skew diagnosis — the report you run BEFORE deciding
    whether a join needs ``skew.salted_join`` or AQE's skew handling:
    the ``top_n`` heaviest key values with their row share and a skew
    factor (rows at the key ÷ mean rows per key; ~1 means uniform,
    ≫1 means this key serializes one reducer). NULL keys are reported
    as a key too — a NULL-heavy foreign key is the single most common
    real-world skew.

    Returns (key string, n_rows, share, skew_x), heaviest first, key
    asc on ties — deterministic.

    100 TB shape: ONE map-side-combined groupBy(key) — the exchange
    carries distinct keys, not rows — a 2-row stats aggregate over the
    counts, broadcast back, and a TakeOrderedAndProject top-n. The
    report costs one word-count-shaped pass, far cheaper than the
    skewed join it prevents.
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("__k")
    ).agg(F.count(F.lit(1)).alias("__n"))
    stats = counts.agg(
        F.sum("__n").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            F.col("__k").alias("key"),
            F.col("__n").alias("n_rows"),
            F.round(F.col("__n") / F.col("__total"), 6).alias("share"),
            F.round(
                # double FIRST: n * nkeys as int64 wraps at ~1e9 rows on
                # a key over ~1e10 distinct keys — exactly the corpus
                # this report exists for
                F.col("__n").cast("double") * F.col("__nkeys") / F.col("__total"),
                6,
            ).alias("skew_x"),
        )
        # NULLS LAST explicitly: Spark's asc default is nulls FIRST,
        # DuckDB's is nulls LAST — a NULL key tying at the LIMIT
        # boundary would otherwise diverge from the oracle
        .orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
        .limit(int(top_n))
    )


def layout_advisor(
    df: DataFrame,
    candidate_cols: list[str],
    *,
    target_partitions: int = 1000,
) -> DataFrame:
    """Partition-layout advisor: for each candidate partition column —
    distinct values, null fraction, the heaviest value's row share
    (skew), and a verdict against the classic hive-partitioning rules:
    too many distinct values ⇒ small-file explosion
    (``too_many_values``), a dominant value ⇒ one giant partition
    (``skewed``), nulls present ⇒ a __HIVE_DEFAULT_PARTITION__ bucket
    worth knowing about (``ok_with_nulls``), else ``ok``. ``ok`` means
    "within 10×: enough partitions to parallelize, few enough that
    files stay big" relative to ``target_partitions``.

    The report that decides ``partition_by`` BEFORE a 100 TB rewrite.
    One exact per-column aggregate pass per candidate (exact
    count_distinct keeps the report differential-testable; candidates
    are FEW by construction — this is an advisor, not a profiler of
    every column)."""
    if not candidate_cols:
        raise ValueError("candidate_cols must be non-empty")
    spark = df.sparkSession
    rows = []
    total = df.count()
    for c in candidate_cols:
        if c not in df.columns:
            raise ValueError(f"candidate {c!r} not in {df.columns}")
        agg = df.agg(
            F.countDistinct(F.col(c)).alias("nd"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("nn"),
        ).collect()[0]
        top = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col(c))
            .limit(1)
            .collect()
        )
        top_share = (top[0]["n"] / total) if (top and total) else 0.0
        null_frac = (agg["nn"] or 0) / total if total else 0.0
        nd = agg["nd"]
        # ladder order matters: a constant column is both skewed and
        # too-few — too_few_values is the actionable verdict, so the
        # cardinality checks fire before the skew check
        if nd > 10 * target_partitions:
            verdict = "too_many_values"
        elif nd < max(2, target_partitions // 10):
            verdict = "too_few_values"
        elif top_share > 0.5:
            verdict = "skewed"
        elif null_frac > 0:
            verdict = "ok_with_nulls"
        else:
            verdict = "ok"
        rows.append(
            (c, int(nd), round(null_frac, 6), round(top_share, 6), verdict)
        )
    return spark.createDataFrame(
        rows,
        "column string, n_distinct bigint, null_frac double, "
        "top_value_share double, verdict string",
    )


def correlation_matrix(
    df: DataFrame, num_cols: list[str], *, decimals: int = 6
) -> DataFrame:
    """Pairwise Pearson correlations over the named numeric columns in
    ONE aggregate pass — the profiler half of the regression surface
    (`queries.agg_price_qty_regression` fits one pair; this surveys all
    of them to find which pairs are WORTH fitting). Emits the upper
    triangle as (col_a, col_b, corr) rows. n(n-1)/2 corr aggregates
    ride a single map-side-combined scan; n is the caller's shortlist,
    not the schema."""
    if len(num_cols) < 2:
        raise ValueError("correlation_matrix needs >= 2 columns")
    for c in num_cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    pairs = [
        (a, b) for i, a in enumerate(num_cols) for b in num_cols[i + 1 :]
    ]
    aggs = [
        F.round(F.corr(F.col(a), F.col(b)), decimals).alias(f"__c{i}")
        for i, (a, b) in enumerate(pairs)
    ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    # corr of a zero-variance (or empty) pair is NULL — report it as a
    # NULL row rather than crashing: degenerate columns are exactly what
    # a profiler must surface
    return spark.createDataFrame(
        [
            (
                a,
                b,
                None if row[f"__c{i}"] is None else float(row[f"__c{i}"]),
            )
            for i, (a, b) in enumerate(pairs)
        ],
        "col_a string, col_b string, corr double",
    )


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str, *, decimals: int = 6
) -> DataFrame:
    """Chi-square test of independence between two categorical columns,
    with Cramér's V effect size — "are these dimensions related at
    all", the categorical sibling of ``correlation_matrix`` (which only
    sees numerics). NULL in either column drops the row (no category).

    chi2 = Σ (obs - exp)² / exp over the contingency cells with
    exp = row_total · col_total / n; dof = (r-1)(c-1);
    V = sqrt(chi2 / (n · min(r-1, c-1))). One contingency groupBy +
    two broadcast marginal joins + a one-row aggregate — cells ~ r·c,
    tiny by construction.
    """
    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
    obs = base.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__o"))
    ra = obs.groupBy("__a").agg(F.sum("__o").alias("__rt"))
    rb = obs.groupBy("__b").agg(F.sum("__o").alias("__ct"))
    n = obs.agg(
        F.sum("__o").alias("__n"),
        F.countDistinct("__a").alias("__r"),
        F.countDistinct("__b").alias("__c"),
    )
    # the FULL r×c grid, not just observed pairs: an empty cell still
    # contributes (0 - exp)²/exp — omitting it understates chi2 (the
    # perfect-diagonal case would read V≈0.82 instead of 1.0)
    cells = (
        ra.crossJoin(rb)
        .join(obs, ["__a", "__b"], "left")
        .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0)))
    )
    joined = cells.crossJoin(F.broadcast(n))
    exp = F.col("__rt") * F.col("__ct") / F.col("__n")
    chi2 = F.sum(F.pow(F.col("__o") - exp, F.lit(2.0)) / exp)
    return joined.agg(
        F.round(chi2, decimals).alias("chi2"),
        ((F.first("__r") - 1) * (F.first("__c") - 1)).alias("dof"),
        F.first("__n").alias("n"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.first("__n")
                    * F.least(F.first("__r") - 1, F.first("__c") - 1)
                )
            ),
            decimals,
        ).alias("cramers_v"),
    )


def benford_report(
    df: DataFrame,
    col: str,
    *,
    scale_decimals: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """Benford's-law conformance of a numeric column → one row per
    leading significant digit: ``(digit, n_values, observed_share,
    expected_share, chi_term)``. Naturally-occurring amounts (prices,
    populations, file sizes) follow ``P(d) = log10(1 + 1/d)``;
    fabricated, capped, or template-generated columns don't — the
    classic forensic data-quality screen for financial tables. Sum
    ``chi_term`` and compare against χ²(8df) to get the verdict.

    Digit extraction is EXACT-INTEGER for engine parity: the value is
    scaled to integer units (``round(|x| · 10^scale_decimals)`` — a
    2-dp price lands far from any .5 boundary) and the digit read off
    the integer's decimal string; doubles are never string-formatted
    (Spark and DuckDB disagree on double→string, they agree on
    int→string). Expected shares are Python-computed literals rounded
    before use, so the χ² terms are built from identical inputs on
    both engines. Zero/NULL values carry no leading digit and are
    excluded.

    100 TB shape: one projection + a 9-group map-side-combined count;
    the only exchange is the 9-row digit table, the total a broadcast
    1-row aggregate."""
    import math

    if scale_decimals < 0:
        raise ValueError(f"scale_decimals must be >= 0, got {scale_decimals}")
    exp = [
        round(math.log10(1.0 + 1.0 / d), decimals) for d in range(1, 10)
    ]
    ival = F.round(F.abs(F.col(col)) * (10**scale_decimals)).cast("long")
    base = (
        df.filter(F.col(col).isNotNull())
        .select(ival.alias("__iv"))
        .filter(F.col("__iv") > 0)
        .select(
            F.substring(F.col("__iv").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    counts = base.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_values")
    )
    tot = F.broadcast(counts.agg(F.sum("n_values").alias("__tot")))
    exp_c = F.element_at(lit_double_array(exp), F.col("digit"))
    obs_r = F.round(F.col("n_values") / F.col("__tot"), decimals)
    return counts.crossJoin(tot).select(
        "digit",
        "n_values",
        obs_r.alias("observed_share"),
        exp_c.alias("expected_share"),
        F.round(
            F.col("__tot") * F.pow(obs_r - exp_c, F.lit(2)) / exp_c, decimals
        ).alias("chi_term"),
    )
