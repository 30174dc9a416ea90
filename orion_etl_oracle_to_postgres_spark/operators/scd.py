"""Slowly-changing-dimension Type 2 merge as a batch DataFrame operator.

The reference engine's only load mode is truncate-and-replace
(Dims24/orion-etl-oracle-to-postgres `plugins/default_loader.py:38-45`)
— history is destroyed on every run. SCD2 is the standard upgrade: each
key keeps a CHAIN of versions with validity intervals, so downstream
consumers (and reproducible training snapshots) can ask "what did this
dimension look like at time T?".

Formulation — set algebra over two inputs, no MERGE statement needed:

  dim     (key, attrs..., valid_from, valid_to NULL=open)
  updates (key, attrs...)  applied at effective time ``eff_ts``

  closed   = open dim rows whose key has a CHANGED update
             → valid_to := eff_ts
  carried  = all other dim rows (history + unchanged open rows)
  opened   = changed + brand-new updates → [eff_ts, NULL)

One hash join on key (updates side broadcast when small) + one union —
nothing quadratic, no window over the full dim. Unchanged updates are
no-ops (no empty versions), deletions are out of scope (absent keys
keep their open row), and applying the same batch twice is idempotent:
the second application finds no attribute diffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_ts: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one batch of ``updates`` (key + attrs, one row per key) to
    an SCD2 ``dim`` (key + attrs + validity interval) at effective
    timestamp ``eff_ts`` (an ISO string or timestamp literal). Returns
    the new full dimension table.

    NULL-safe attribute comparison (``<=>``): NULL → value and value →
    NULL both count as changes, NULL → NULL does not. Raises if
    ``updates`` carries duplicate keys — "last write wins inside one
    batch" is a silent-corruption footgun, so the caller must
    pre-aggregate instead.
    """
    if not attrs:
        raise ValueError("scd2_apply: attrs must be non-empty")
    eff = F.lit(eff_ts).cast("timestamp")

    # loud duplicate-key guard (one tiny aggregate over the small side)
    dup = (
        updates.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"scd2_apply: updates contain duplicate key {dup[0][key]!r}; "
            "pre-aggregate to one row per key (last-write-wins must be explicit)"
        )

    u = updates.select(
        F.col(key).alias("__uk"), *[F.col(a).alias(f"__u_{a}") for a in attrs]
    )
    open_rows = dim.filter(F.col(valid_to).isNull())
    closed_hist = dim.filter(F.col(valid_to).isNotNull())

    changed_cond = None
    for a in attrs:
        diff = ~F.col(a).eqNullSafe(F.col(f"__u_{a}"))
        changed_cond = diff if changed_cond is None else (changed_cond | diff)

    joined = open_rows.join(u, open_rows[key] == F.col("__uk"), "left")
    # open rows with a changed update: close the interval at eff_ts
    closed_now = joined.filter(
        F.col("__uk").isNotNull() & changed_cond
    ).select(*dim.columns).withColumn(valid_to, eff)
    # open rows that are unchanged or untouched: carried forward as-is
    carried_open = joined.filter(
        F.col("__uk").isNull() | ~changed_cond
    ).select(*dim.columns)

    # new open versions: changed keys + keys not in dim at all
    open_keys = open_rows.select(F.col(key).alias("__ok"))
    u_vs_dim = u.join(
        open_rows.select(
            F.col(key).alias("__ok"), *[F.col(a).alias(f"__d_{a}") for a in attrs]
        ),
        F.col("__uk") == F.col("__ok"),
        "left",
    )
    new_cond = None
    for a in attrs:
        diff = ~F.col(f"__d_{a}").eqNullSafe(F.col(f"__u_{a}"))
        new_cond = diff if new_cond is None else (new_cond | diff)
    opened = u_vs_dim.filter(F.col("__ok").isNull() | new_cond).select(
        F.col("__uk").alias(key),
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        eff.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
    ).select(*dim.columns)

    return closed_hist.unionByName(closed_now).unionByName(carried_open).unionByName(opened)


def scd2_initial(
    snapshot: DataFrame,
    key: str,
    attrs: list[str],
    eff_ts: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Bootstrap an SCD2 dimension from a plain snapshot: every row
    becomes an open version effective at ``eff_ts``."""
    return snapshot.select(
        key,
        *attrs,
        F.lit(eff_ts).cast("timestamp").alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
    )


def scd2_as_of(
    dim: DataFrame,
    ts: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time view: the version of each key valid AT ``ts``
    (``valid_from <= ts < valid_to``, open intervals unbounded). A pure
    filter — at scale, partition the dim by a date bucket of
    ``valid_from`` and this prunes."""
    t = F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    ).drop(valid_from, valid_to)
