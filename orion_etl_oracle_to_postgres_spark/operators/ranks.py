"""Distributed global-order primitives — two-phase rank / prefix-sum.

``Window.orderBy(...)`` with no ``partitionBy`` funnels EVERY row
through one task: the classic single-partition scale-killer (Spark even
warns ``WindowExec: No Partition Defined``). Yet global order shows up
constantly — row numbers, CDFs, rank-sum tests, Lorenz curves, ntile
scores. ``df.orderBy`` scales because Spark range-partitions the sort;
these helpers recreate that trick for window semantics:

1. **Bucket** (``range_buckets``): cut the order key's value range into
   ``n_buckets`` fixed slices. The slice id is a monotone function of
   the sort key, so slice order == global order between slices. (Uses a
   one-row min/max aggregate — the same extra pass Spark's own
   ``RangePartitioner`` spends on sampling.)
2. **Offsets** (``bucket_offsets``): per-slice totals (counts, sums)
   and each slice's prefix over strictly-lower slices — an
   ``n_buckets``-row table computed with a tiny self-join (no window at
   all) and broadcast back.
3. **Local + offset**: rank / running-sum within each slice under a
   normal PARTITIONED window, plus the slice's broadcast offset. Ties
   of the bucketing key always land in one slice (the id is a function
   of the value), so rank(), row_number(), and range-frame running
   counts all come out BIT-IDENTICAL to the unpartitioned window —
   executed across ``n_buckets`` reducers instead of one.

``curation.assign_stable_ids`` pioneered the pattern (hash-keyed, so it
slices a known [0, 16^15) range with no stats pass); this module is the
generalization for arbitrary numeric order keys. Consumers:
``reconcile.ks_statistic`` / ``mannwhitney_u`` (pooled-value CDF/rank),
``window_revenue_pareto`` / ``agg_revenue_gini`` / ``window_rfm_segments``
(customer-cardinality rankings — fine at TPC-H scale, single-task death
on a 10^9-customer corpus).

Reference parity note: the reference engine has no distributed ordering
at all (row-loop Python, e.g. ``/root/reference/pipeline.py:96-118``);
this module exists so the Spark re-expression keeps its window-shaped
EXT analytics 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ORD = "__ord"
BUCKET = "__bk"


def range_buckets(
    df: DataFrame,
    order_expr: Column,
    *,
    n_buckets: int = 64,
    descending: bool = False,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Add ``__ord`` (double sort key, ascending == requested order) and
    ``__bk`` (int slice id, monotone non-decreasing in ``__ord``).

    ``order_expr`` must be numeric; NULL keys (no position on the
    value axis) go to a dedicated bucket ``n_buckets`` AFTER every
    value bucket — SQL NULLS LAST in both directions, matching the
    DuckDB oracles' default — where only the consumer's tiebreaks
    order them. Pass ``lo``/``hi`` when the key's range is known a
    priori (e.g. hash keys) to skip the min/max pass. Equal values
    always share a bucket, so tie-sensitive frames (range frames,
    rank) survive the split. Skewed keys skew the buckets —
    correctness never depends on balance, only the reducer fan-out
    does; raise ``n_buckets`` for heavy skew.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    o = order_expr.cast("double")
    if descending:
        o = -o
    b = df.withColumn(ORD, o)
    if lo is not None and hi is not None:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    else:
        stats = b.agg(F.min(ORD).alias("__lo"), F.max(ORD).alias("__hi"))
        b = b.crossJoin(F.broadcast(stats))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    width = (hi_c - lo_c) / F.lit(float(n_buckets))
    bk = F.when(F.col(ORD).isNull(), F.lit(n_buckets)).otherwise(
        F.when(
            width > 0,
            F.least(
                F.floor((F.col(ORD) - lo_c) / width), F.lit(n_buckets - 1)
            ),
        ).otherwise(F.lit(0))
    )
    return b.withColumn(BUCKET, bk.cast("int")).drop("__lo", "__hi")


def bucket_offsets(
    bucketed: DataFrame,
    measures: dict[str, Column],
    *,
    bucket_col: str = BUCKET,
) -> DataFrame:
    """Per-bucket prefix sums: for each bucket id present, the sum of
    every measure over STRICTLY LOWER buckets (0 for the lowest).

    Computed as per-bucket aggregate (map-side combine over the big
    side) then a ``<= n_buckets``-row broadcast self-join — deliberately
    no window, so consumers can pin "zero unpartitioned windows" on the
    whole physical plan. Join the result back broadcast on the bucket id.
    """
    per = bucketed.groupBy(bucket_col).agg(
        *[F.sum(c).alias(n) for n, c in measures.items()]
    )
    a, b = per.alias("__a"), per.alias("__b")
    return (
        a.join(
            F.broadcast(b),
            F.col(f"__b.{bucket_col}") < F.col(f"__a.{bucket_col}"),
            "left",
        )
        .groupBy(F.col(f"__a.{bucket_col}").alias(bucket_col))
        .agg(
            *[
                F.coalesce(F.sum(f"__b.{n}"), F.lit(0)).alias(n)
                for n in measures
            ]
        )
    )


def global_row_number(
    df: DataFrame,
    order_expr: Column,
    tiebreaks: list[Column],
    *,
    out_col: str,
    descending: bool = False,
    n_buckets: int = 64,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_expr [DESC], tiebreaks...)``
    without the single-partition window: bucket → partitioned
    row_number → + broadcast prefix count. 1-based, bit-identical to
    the naive form. ``tiebreaks`` must make the order total (standard
    id tiebreak) for the result to be deterministic."""
    b = range_buckets(
        df, order_expr, n_buckets=n_buckets, descending=descending
    )
    off = bucket_offsets(b, {"__offn": F.lit(1)})
    # Within the bucket, order by the EXACT original expression, not the
    # double-cast __ord: two distinct longs beyond 2^53 collapse to one
    # double (same bucket — monotone, so bucketing stays correct), and
    # only the exact key reproduces the naive window's order for them.
    # nulls_last on BOTH directions pins NULLS LAST (SQL/DuckDB default)
    # independent of Spark's asc-nulls-first default; NULL keys are all
    # in the trailing bucket anyway, ordered purely by the tiebreaks.
    exact = (
        order_expr.desc_nulls_last()
        if descending
        else order_expr.asc_nulls_last()
    )
    w = Window.partitionBy(BUCKET).orderBy(exact, *tiebreaks)
    return (
        b.join(F.broadcast(off), BUCKET)
        .withColumn(
            out_col,
            (F.col("__offn") + F.row_number().over(w)).cast("long"),
        )
        .drop(BUCKET, ORD, "__offn")
    )


def ntile_expr(rn: Column, n: Column, k: int) -> Column:
    """SQL ``ntile(k)`` from a precomputed 1-based row number and total
    count: the first ``n mod k`` tiles get ``n div k + 1`` rows, the
    rest ``n div k`` — pure exact long arithmetic (double division of
    longs can mis-round across a tile boundary at billions of rows)."""

    def idiv(a: Column, b: Column) -> Column:
        # (a - a % b) is divisible by b, and an integer double quotient
        # < 2^53 is exact — unlike floor(a / b)
        return ((a - a % b) / b).cast("long")

    q = idiv(n, F.lit(k))
    r = n % k
    big = r * (q + 1)  # rows covered by the size-(q+1) tiles
    # ceil(a / b) for positive longs == (a + b - 1) div b
    return F.when(rn <= big, idiv(rn + q, q + 1)).otherwise(
        r + idiv(rn - big + q - 1, F.greatest(q, F.lit(1)))
    ).cast("int")


def global_ntile(
    df: DataFrame,
    order_expr: Column,
    tiebreaks: list[Column],
    k: int,
    *,
    out_col: str,
    descending: bool = False,
    n_buckets: int = 64,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY ...)`` via the two-phase row number +
    the ntile closed form (first ``n % k`` tiles get ``n//k + 1`` rows,
    the rest ``n//k``) — pure integer arithmetic on (row_number, n), so
    it matches SQL ntile exactly without any global window."""
    rn_col = f"__rn_{out_col}"
    ranked = global_row_number(
        df,
        order_expr,
        tiebreaks,
        out_col=rn_col,
        descending=descending,
        n_buckets=n_buckets,
    )
    n_tot = F.broadcast(df.agg(F.count(F.lit(1)).alias("__ntot")))
    return (
        ranked.crossJoin(n_tot)
        .withColumn(out_col, ntile_expr(F.col(rn_col), F.col("__ntot"), k))
        .drop(rn_col, "__ntot")
    )
