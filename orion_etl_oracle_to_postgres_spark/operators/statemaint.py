"""[EXT] Declarative mergeable-state maintenance — the dispatch layer
between the YAML ``state:`` block (``spec.AggStateSpec``) and the
mergeable-state family in ``operators/aggstate.py``.

The batch twin of the streaming monitor modules (``streaming/
bloom_monitor.py`` et al.): every nightly run of an
``incremental.mode: batch`` table builds ONE bounded state increment
from the rows it loaded and appends it under a per-watermark-window
subdirectory (``mark=<sanitized new-mark>``) with mode("overwrite") —
a retried run over the same window replaces its own piece instead of
double-counting, which is what keeps the NON-duplicate-proof folds
(cms cell-sums, stats moments, hist buckets) honest under
at-least-once batch semantics; the duplicate-proof folds (kmv /
sample / bloom) get the same contract for free.

Fold-on-read: ``read_folded_state`` reads every increment in one scan
and folds with the family's ``merge_*`` — each of which validates the
layout columns travelling in the rows and fails LOUDLY on drift (a
``state:`` block whose k/seed/width/... changed between nights).
``finalize_state_report`` turns the fold into the human-readable
read side the ``--state`` verb prints.

No counterpart in the reference (row-loop ETL only); the pattern is
the standard mergeable-summary contract (Agarwal et al. 2012,
"Mergeable summaries").

100 TB shape: each increment is one map-side-combined aggregate over
tonight's rows (integers/doubles only — never payloads, the aggstate
shuffle contract); the persisted state is ≤ state-size × nights rows
until folded, ≤ state-size after — reading it never touches the
loaded history.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..spec import AggStateSpec
from . import aggstate as A


def sanitize_mark(mark) -> str:
    """Directory-safe watermark-window label: timestamps carry spaces
    and colons; anything outside [A-Za-z0-9._-] becomes '_' (windows
    are monotonic, so sanitized labels stay unique in practice)."""
    return re.sub(r"[^A-Za-z0-9._-]", "_", str(mark)) or "none"


def build_state_increment(df: DataFrame, st: AggStateSpec) -> DataFrame:
    """Tonight's rows → one bounded state increment (kind dispatch)."""
    k, seed = st.effective_k, st.effective_seed
    if st.kind == "kmv":
        return A.build_kmv_state(df, list(st.keys), st.value_column, k=k, seed=seed)
    if st.kind == "sample":
        return A.build_sample_state(
            df, list(st.keys), st.value_column, k=k, seed=seed,
            carry=list(st.carry),
        )
    if st.kind == "stats":
        return A.build_agg_state(df, list(st.keys), [st.value_column])
    if st.kind == "hist":
        return A.build_hist_state(
            df,
            list(st.keys),
            st.value_column,
            lo=float(st.lo),
            hi=float(st.hi),
            n_buckets=st.n_buckets,
            weight_col=st.weight_column,
        )
    if st.kind == "bloom":
        return A.build_bloom_state(
            df, st.value_column, m_bits=st.m_bits, k=k, seed=seed
        )
    if st.kind == "cms":
        return A.build_cms_state(
            df,
            st.value_column,
            width=st.width,
            depth=st.depth,
            seed=seed,
            weight_col=st.weight_column,
        )
    raise ValueError(f"unknown state kind {st.kind!r}")  # spec-validated


def write_state_increment(
    df: DataFrame, st: AggStateSpec, state_path: str, mark
) -> str:
    """Build + persist tonight's increment under its watermark-window
    subdirectory (overwrite = replay-safe); returns the directory."""
    path = f"{state_path}/mark={sanitize_mark(mark)}"
    build_state_increment(df, st).write.mode("overwrite").parquet(path)
    return path


def read_folded_state(
    spark: SparkSession, state_path: str, st: AggStateSpec
) -> DataFrame:
    """One scan over every appended increment, folded to the lifetime
    state by the kind's ``merge_*`` — which probes the layout columns
    and REFUSES drifted increments (the family contract)."""
    raw = spark.read.parquet(state_path)
    if st.kind == "kmv":
        return A.merge_kmv_states([raw], list(st.keys))
    if st.kind == "sample":
        return A.merge_sample_states(
            [raw], list(st.keys), st.value_column, carry=list(st.carry)
        )
    if st.kind == "stats":
        return A.merge_agg_states([raw], list(st.keys), [st.value_column])
    if st.kind == "hist":
        return A.merge_hist_states([raw], list(st.keys))
    if st.kind == "bloom":
        return A.merge_bloom_states([raw])
    if st.kind == "cms":
        return A.merge_cms_states([raw])
    raise ValueError(f"unknown state kind {st.kind!r}")


def finalize_state_report(
    spark: SparkSession, state_path: str, st: AggStateSpec
) -> DataFrame:
    """Folded state → the human-readable report the ``--state`` verb
    prints: per-key distinct estimates (kmv), the uniform panel
    (sample — or range-free nearest-rank quantiles of the first
    carried column when the block declares a ``carry``), moments
    (stats), interpolated quantiles (hist; weighted when the block
    names a ``weight_column``), filter saturation + implied distinct
    estimate (bloom), or sketch totals (cms). Every branch is
    driver-bounded: keyed kinds are key-cardinality rows; bloom/cms
    reduce to ONE summary row."""
    from pyspark.sql import functions as F

    state = read_folded_state(spark, state_path, st)
    keys = list(st.keys)
    if st.kind == "kmv":
        return A.finalize_kmv(state, keys)
    if st.kind == "sample":
        if st.carry:
            # carried payload → range-free nearest-rank quantiles of
            # the FIRST carry column (the declared read-side contract)
            return A.finalize_sample_quantiles(
                state, keys, st.value_column, st.carry[0],
                list(st.quantiles),
            )
        return A.finalize_sample(state, keys, st.value_column)
    if st.kind == "stats":
        return A.finalize_agg_state(state, keys, [st.value_column])
    if st.kind == "hist":
        return A.finalize_hist_quantiles(state, keys, list(st.quantiles))
    if st.kind == "bloom":
        # popcount the folded words: fill ratio + the standard
        # occupancy-inversion distinct estimate n̂ = -(m/k)·ln(1 - X/m)
        m, kk = st.m_bits, st.effective_k
        bits = state.agg(
            F.sum(F.bit_count("word")).cast("long").alias("bits_set")
        )
        return bits.select(
            F.lit(int(m)).alias("m_bits"),
            F.lit(int(kk)).alias("k_hashes"),
            "bits_set",
            F.round(F.col("bits_set") / F.lit(float(m)), 6).alias("fill_ratio"),
            F.round(
                F.when(
                    F.col("bits_set") < F.lit(int(m)),  # saturated → unknown
                    -(F.lit(float(m)) / F.lit(float(kk)))
                    * F.log(F.lit(1.0) - F.col("bits_set") / F.lit(float(m))),
                ),
                0,
            )
            .cast("long")
            .alias("approx_distinct"),
        )
    if st.kind == "cms":
        # every sketch row holds the full inserted mass: total = the
        # row-0 cell sum (exact); occupancy signals saturation
        return state.where(F.col("row_idx") == 0).agg(
            F.first("__w").cast("int").alias("width"),
            F.first("__d").cast("int").alias("depth"),
            F.sum("cnt").cast("long").alias("total_weight"),
            F.count(F.lit(1)).cast("long").alias("occupied_cells"),
            F.max("cnt").cast("long").alias("max_cell"),
        )
    raise ValueError(f"unknown state kind {st.kind!r}")
