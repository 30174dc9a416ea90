"""[EXT] As-of (temporal) join — for each left row, the most recent
right row with the same key at-or-before the left row's timestamp
(SURVEY.md §2.11; the classic attribution / point-in-time-lookup join
that plain SQL needs a correlated subquery or range join for).

Spark-first formulation — union-tag + running ``last(ignorenulls)``:

1. stack both sides into ONE relation tagged with ``__side``
   (right = 0, left = 1), right payload carried as a struct;
2. one window sorted by ``(ts, __side)`` per key takes the running
   ``last`` non-null payload — at equal timestamps the right row sorts
   first, so ``left.ts >= right.ts`` matches inclusively;
3. keep the left rows, unpack the struct.

Cost: ONE shuffle (the window's hash partition by key) and a per-key
sort — no per-row range probe, no candidate explosion, O(1) running
state per row. The equivalent join-then-argmax plan shuffles twice and
materializes every (left, right-candidate) pair; at 100 TB the
candidate blowup is the difference between finishing and not. Per-key
skew behaves like any windowed op — a hot key sorts in one task; salt
upstream if one key dominates (``operators.skew``).

Reference parity note: the reference engine has no temporal join; this
is part of the [EXT] training-pipeline surface (event attribution,
point-in-time feature lookup). Oracle: DuckDB's native ``ASOF LEFT
JOIN`` — an independent implementation of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int | None = None,
    rsuffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row, joined to the latest
    ``right`` row with the same ``on`` key whose ``right_ts`` <=
    ``left_ts`` (inclusive). Unmatched left rows keep nulls (left-join
    semantics). ``tolerance_us`` optionally voids matches older than
    the given microsecond horizon (match → nulls, row stays).

    Right payload columns keep their names unless they collide with a
    left column; collisions get ``rsuffix`` appended. If several right
    rows share one ``(key, right_ts)`` the winner is unspecified —
    pre-aggregate the right side if that matters.
    """
    rpay = [c for c in right.columns if c != on]
    out_names = {c: (c + rsuffix if c in left.columns else c) for c in rpay}

    # a NULL right timestamp can never be "the most recent at-or-before"
    # — but asc() sorts nulls FIRST, which would make such a row the
    # running match for every left row with no earlier real right row
    # (DuckDB ASOF evaluates the NULL comparison as no-match)
    right = right.filter(F.col(right_ts).isNotNull())

    r_rows = right.select(
        F.col(on),
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(out_names[c]) for c in rpay]).alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
    )
    l_rows = left.select(
        F.col(on),
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_rows.schema["__pay"].dataType).alias("__pay"),
        *[F.col(c) for c in left.columns if c != on],
    )

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ats").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__pay", ignorenulls=True).over(w)
    if tolerance_us is not None:
        rt_type = right.schema[right_ts].dataType
        ts_of = epoch_us(matched[out_names.get(right_ts, right_ts)], rt_type)
        matched = F.when(
            epoch_us(F.col("__ats"), left.schema[left_ts].dataType) - ts_of
            <= F.lit(tolerance_us),
            matched,
        )

    return (
        r_rows.unionByName(l_rows)
        .withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .select(
            F.col(on),
            *[F.col(c) for c in left.columns if c != on],
            *[F.col("__m")[out_names[c]].alias(out_names[c]) for c in rpay],
        )
    )
