"""Lookup operators J1-J3 — the reference's per-row SQL probes
re-expressed as joins (the single biggest scale fix, SURVEY.md §2.5).

Reference: ``/root/reference/plugins/default_lookup.py`` (J1 external
``:44-95``, J2 self-lookup ``:97-109`` + finalize UPDATE
``/root/reference/plugins/default_loader.py:109-154``); existence-check
J3 lives in ``validations.py``.

Scale notes: a lookup dimension is broadcast by default (one
materialization instead of one SQL probe per row per rule); set
``broadcast=False`` for large dimensions and let AQE pick the strategy.
First-match semantics: the reference's ``fetchone()`` without ORDER BY is
order-nondeterministic on duplicate keys (SURVEY.md §7.4.2); we resolve
deterministically as min-by-value via ``groupBy(key).agg(min(value))``.
Text-normalized keys: the reference casts both sides to text
(``default_lookup.py:60-68``) so ``1`` matches ``'1'``; reproduced here.

Semantic reconciliation (documented): the reference reads the lookup key
from ``row[rule.source]``, but in its own pipeline the preceding
transform stage has already renamed fields to target names
(``pipeline.py:74-75`` chains row dicts), so the key it actually sees is
the *mapped target column's* pre-lookup value. We join on that mapped
column, which is also what J2 does explicitly (``:99``).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spec import LookupSpec

logger = logging.getLogger(__name__)


def _versioned_dim(
    dim: DataFrame, lookup: LookupSpec, value_column: str, *, check: bool
) -> DataFrame:
    """Dimension → (key, value, from, to) for the point-in-time path —
    NO per-key dedup (versions are the point). When ``check``, assert
    the validity intervals are disjoint per key first: an overlapping
    dim would silently DUPLICATE fact rows through the left join, the
    one failure mode worse than a wrong value. The assertion is one
    window pass over the dim alone (lookup dims are small by the same
    argument that lets them broadcast)."""
    d = dim.select(
        F.col(lookup.key_column).cast("string").alias("__lk_k"),
        F.col(value_column).alias("__lk_v"),
        F.col(lookup.valid_from_column).alias("__lk_f"),
        F.col(lookup.valid_to_column).alias("__lk_t"),
    )
    if check:
        from pyspark.sql import Window

        w = Window.partitionBy("__lk_k").orderBy("__lk_f")
        bad = (
            d.withColumn("__prev_t", F.lag("__lk_t").over(w))
            .withColumn("__prev_f", F.lag("__lk_f").over(w))
            .filter(
                F.col("__prev_f").isNotNull()
                & (F.col("__prev_t").isNull() | (F.col("__prev_t") > F.col("__lk_f")))
            )
            .count()
        )
        if bad > 0:
            raise RuntimeError(
                f"versioned lookup {lookup.table}.{lookup.key_column}: "
                f"{bad} overlapping validity interval(s) — a PIT join over "
                "them would duplicate fact rows; fix the dimension "
                "(scd2_apply output is always disjoint)"
            )
    return d


def _first_match_dim(
    dim: DataFrame, key_column: str, value_column: str, text_keys: bool
) -> DataFrame:
    """Dimension → (key, value) with deterministic first-match semantics
    (min value per key)."""
    key = F.col(key_column).cast("string") if text_keys else F.col(key_column)
    return (
        dim.select(key.alias("__lk_k"), F.col(value_column).alias("__lk_v"))
        .groupBy("__lk_k")
        .agg(F.min("__lk_v").alias("__lk_v"))
    )


def external_lookup(
    df: DataFrame,
    target: str,
    lookup: LookupSpec,
    dim: DataFrame,
    broadcast: bool = True,
    cast_values_to_text: bool = True,
    eager_errors: bool = True,
) -> DataFrame:
    """J1: left-outer equi-join replacing the per-row
    ``SELECT CAST(val AS text) FROM lkp WHERE CAST(key AS text)=%s`` probe.

    The mapped column ``target`` currently holds the key; after the join
    it holds the looked-up value (cast to text for parity with
    ``default_lookup.py:61`` unless ``cast_values_to_text=False``).
    NULL keys bypass the lookup entirely (ref ``:52-53``) — they keep
    NULL and are NOT subject to on_missing.

    on_missing ladder (ref ``:76-89``, default ``error``):
    ``null`` → leave NULL; ``skip`` → drop row; ``default:X`` → X;
    anything else → fail fast (eager anti-join count, before any write —
    SURVEY.md §7.4.1).
    """
    value_column = lookup.value_column or lookup.key_column
    versioned = lookup.ts_column is not None
    if versioned:
        if lookup.ts_column not in df.columns:
            raise ValueError(
                f"versioned lookup needs ts_column {lookup.ts_column!r} in "
                f"the pipeline output {df.columns}"
            )
        for c in (lookup.valid_from_column, lookup.valid_to_column):
            if c not in dim.columns:
                raise ValueError(
                    f"versioned lookup dim {lookup.table!r} lacks interval "
                    f"column {c!r} (has {dim.columns})"
                )
        d = _versioned_dim(dim, lookup, value_column, check=eager_errors)
    else:
        d = _first_match_dim(dim, lookup.key_column, value_column, text_keys=True)
    if cast_values_to_text:
        d = d.withColumn("__lk_v", F.col("__lk_v").cast("string"))
    if broadcast:
        d = F.broadcast(d)

    probe = F.col(target).cast("string")
    if versioned:
        # key-equi + interval residual: the version valid at the row's
        # own timestamp. NULL ts ⇒ no version ⇒ the on_missing ladder.
        ts = F.col(lookup.ts_column)
        cond = (
            (probe == F.col("__lk_k"))
            & (F.col("__lk_f") <= ts)
            & (F.col("__lk_t").isNull() | (F.col("__lk_t") > ts))
        )
    else:
        cond = probe == F.col("__lk_k")
    # lowercase the policy keyword only — a default:<value> payload keeps
    # its case (the reference compares the raw string, default_lookup.py:76-89)
    raw_policy = lookup.on_missing or "error"
    on_missing = raw_policy.lower()
    if on_missing.startswith("default:"):
        on_missing = "default:" + raw_policy.split(":", 1)[1]

    if on_missing == "skip":
        # matched rows ∪ NULL-key rows (NULL bypasses the lookup), as
        # ONE left join + filter — an inner-join ∪ separate null-filter
        # would scan the fact side twice (a real 2× cost at 100 TB).
        # The dimension is keyed unique (_first_match_dim groupBy), so
        # the left join never multiplies rows.
        joined = df.join(d, cond, "left")
        hit = F.col("__lk_k").isNotNull()
        return (
            joined.filter(hit | F.col(target).isNull())
            .withColumn(target, F.col("__lk_v"))  # NULL keys stay NULL
            .drop("__lk_k", "__lk_v", "__lk_f", "__lk_t")
        )

    if on_missing not in ("null",) and not on_missing.startswith("default:"):
        # error policy: abort if any non-null key misses. The eager
        # count is skipped in plan-review mode (``runner --explain``
        # promises NO execution — ``eager_errors=False``); the plan
        # itself is identical either way.
        if eager_errors:
            n = (
                df.filter(F.col(target).isNotNull())
                .join(d, cond, "left_anti")
                .count()
            )
            if n > 0:
                raise RuntimeError(
                    f"lookup failed: {n} rows of {target!r} not found in "
                    f"{lookup.table}.{lookup.key_column}"
                )
        on_missing = "null"  # all present; fall through to plain join

    joined = df.join(d, cond, "left")
    hit = F.col("__lk_k").isNotNull()
    was_null = F.col(target).isNull()
    if on_missing.startswith("default:"):
        default_lit = F.lit(on_missing.split(":", 1)[1])
        replacement = F.when(hit, F.col("__lk_v")).when(was_null, F.lit(None)).otherwise(default_lit)
    else:  # null
        replacement = F.when(hit, F.col("__lk_v")).otherwise(F.lit(None))
    return joined.withColumn(target, replacement).drop(
        "__lk_k", "__lk_v", "__lk_f", "__lk_t"
    )


def self_lookup(df: DataFrame, target: str, lookup: LookupSpec) -> DataFrame:
    """J2: intra-table FK resolution (hierarchies) as ONE pre-write
    self-join — replaces the reference's tmp-column + post-load
    ``UPDATE ... FROM`` protocol (``default_loader.py:109-154``), with
    identical semantics: match the stashed natural key in ``target``
    against the table's own ``key_column``; set ``target`` to the
    matching row's ``value_column`` (non-NULL matches only); no match →
    NULL. Because the join sees the complete DataFrame, parents that
    "arrive" after children resolve correctly (SURVEY.md §7.4.7).
    """
    value_column = lookup.value_column or lookup.key_column
    dim = (
        df.filter(F.col(value_column).isNotNull())
        .select(F.col(lookup.key_column).alias("__sl_k"), F.col(value_column).alias("__sl_v"))
        .groupBy("__sl_k")
        .agg(F.min("__sl_v").alias("__sl_v"))
    )
    out = df.join(F.broadcast(dim), F.col(target) == F.col("__sl_k"), "left")
    return out.withColumn(target, F.col("__sl_v")).drop("__sl_k", "__sl_v")
