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
