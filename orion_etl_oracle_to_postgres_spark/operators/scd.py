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


def scd1_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
) -> DataFrame:
    """SCD Type 1 — overwrite in place, no history: update rows replace
    the dimension row with the same key, new keys insert. The in-plan
    relational form of ``sinks/maintenance.merge_upsert`` (which is the
    storage-level variant): one anti-join + union, so callers composing
    a bigger plan don't pay a write+swap.

    ``updates`` must be one row per key (same loud guard as scd2).
    Dimension columns NOT listed in ``attrs`` are carried unchanged for
    existing keys and NULL-filled for inserted keys — updating one
    attribute of a wide dimension never discards the rest."""
    if not attrs:
        raise ValueError("scd1_apply: attrs must be non-empty")
    dup = (
        updates.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"scd1_apply: updates contain duplicate key {dup[0][key]!r}"
        )
    dtypes = dict(dim.dtypes)
    u = updates.select(
        F.col(key).alias("__uk"), *[F.col(a).alias(f"__u_{a}") for a in attrs]
    )
    merged = dim.join(u, dim[key] == F.col("__uk"), "left").select(
        *[
            F.when(F.col("__uk").isNotNull(), F.col(f"__u_{c}")).otherwise(F.col(c)).alias(c)
            if c in attrs
            else F.col(c)
            for c in dim.columns
        ]
    )
    inserted = u.join(
        dim.select(F.col(key).alias("__dk")), F.col("__uk") == F.col("__dk"), "left_anti"
    ).select(
        *[
            F.col("__uk").alias(key)
            if c == key
            else (
                F.col(f"__u_{c}").alias(c)
                if c in attrs
                else F.lit(None).cast(dtypes[c]).alias(c)
            )
            for c in dim.columns
        ]
    )
    return merged.unionByName(inserted)


def scd3_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    *,
    prev_prefix: str = "prev_",
) -> DataFrame:
    """SCD Type 3 — limited history IN COLUMNS: each tracked attribute
    keeps its current value plus ONE previous value (``prev_<attr>``).
    A changed update shifts current → prev and installs the new value;
    unchanged attributes keep their prev; new keys start with NULL
    prevs. The middle ground between Type 1 (no history) and Type 2
    (full version chains) — one wide row per key forever, so downstream
    joins never fan out.

    ``dim`` must already carry the ``prev_`` columns (bootstrap with
    ``scd3_initial``). One left-outer key join; null-safe comparisons.
    """
    if not attrs:
        raise ValueError("scd3_apply: attrs must be non-empty")
    dup = (
        updates.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"scd3_apply: updates contain duplicate key {dup[0][key]!r}"
        )
    u = updates.select(
        F.col(key).alias("__uk"), *[F.col(a).alias(f"__u_{a}") for a in attrs]
    )
    existing = dim.join(u, dim[key] == F.col("__uk"), "left")
    dtypes = dict(dim.dtypes)
    prev_of = {f"{prev_prefix}{a}": a for a in attrs}
    cols = []
    for c in dim.columns:  # dim order preserved; untracked columns carried
        if c in attrs:
            changed = F.col("__uk").isNotNull() & ~F.col(c).eqNullSafe(
                F.col(f"__u_{c}")
            )
            cols.append(F.when(changed, F.col(f"__u_{c}")).otherwise(F.col(c)).alias(c))
        elif c in prev_of:
            a = prev_of[c]
            changed = F.col("__uk").isNotNull() & ~F.col(a).eqNullSafe(
                F.col(f"__u_{a}")
            )
            cols.append(F.when(changed, F.col(a)).otherwise(F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    kept = existing.select(*cols)
    new_keys = u.join(dim.select(F.col(key).alias("__dk")), F.col("__uk") == F.col("__dk"), "left_anti")
    opened = new_keys.select(
        *[
            F.col("__uk").alias(key)
            if c == key
            else (
                F.col(f"__u_{c}").alias(c)
                if c in attrs
                else F.lit(None).cast(dtypes[c]).alias(c)
            )
            for c in dim.columns
        ]
    )
    return kept.unionByName(opened)


def scd3_initial(
    snapshot: DataFrame,
    key: str,
    attrs: list[str],
    *,
    prev_prefix: str = "prev_",
) -> DataFrame:
    """Bootstrap an SCD3 dimension: current values from the snapshot,
    all ``prev_`` columns NULL."""
    return snapshot.select(
        key,
        *[
            c
            for a in attrs
            for c in (
                F.col(a),
                F.lit(None).cast(dict(snapshot.dtypes)[a]).alias(f"{prev_prefix}{a}"),
            )
        ],
    )


def scd2_pit_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_key: str,
    ts_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Per-row point-in-time join: each fact row picks up the dim
    version valid at the fact's OWN timestamp (``valid_from <= ts <
    valid_to``, open version unbounded) — the lookup every
    fact-vs-versioned-dimension report needs (``scd2_as_of`` answers
    "the dim AS OF one fixed instant"; this answers "each fact at ITS
    instant"). Facts before the key's first version (or unmatched keys)
    keep NULL attrs under the default left join; ``how='inner'`` drops
    them.

    Plan shape: an EQUI join on the dimension key with the interval
    predicate as a join-condition residual — Spark executes key-equi +
    filter, NOT a range cross-product, and per-key fan-out is bounded
    by that key's version count (SCD2 dims version slowly by
    construction, so the residual filters a handful of rows per fact).
    One shuffle per side on the key — same cost as any fact-dim join —
    and the dim side broadcasts when it fits. No window over the fact
    table, no sort. Validity intervals produced by ``scd2_apply`` are
    non-overlapping per key, so at most ONE version survives per fact
    row (a left join cannot duplicate facts).
    """
    a = fact.alias("f")
    d = dim.alias("d")
    ts = F.col(f"f.{ts_col}")
    cond = (
        (F.col(f"f.{fact_key}") == F.col(f"d.{key}"))
        & (F.col(f"d.{valid_from}") <= ts)
        & (F.col(f"d.{valid_to}").isNull() | (F.col(f"d.{valid_to}") > ts))
    )
    return a.join(d, cond, how).drop(F.col(f"d.{key}")).drop(
        F.col(f"d.{valid_from}"), F.col(f"d.{valid_to}")
    )
