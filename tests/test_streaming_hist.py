"""Streaming histogram-quantile state (streaming/hist_monitor.py):
append-only increments, fold-on-read — BATCH PARITY: quantiles from
the streamed state must be bit-identical to a single batch build over
the union of all micro-batches (bucket-count sums are exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
    build_hist_state,
    finalize_hist_quantiles,
)
from orion_etl_oracle_to_postgres_spark.streaming.foreach_sink import (
    idempotent_foreach_batch,
)
from orion_etl_oracle_to_postgres_spark.streaming.hist_monitor import (
    folded_hist_state,
    hist_increment_writer,
    hist_quantiles,
)

KW = dict(lo=0.0, hi=1000.0, n_buckets=50)


def _batches(spark):
    df = spark.range(0, 9000).select(
        (F.col("id") % 3).alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
        F.col("id"),
    )
    return df, [df.filter(F.col("id") % 4 == i).drop("id") for i in range(4)]


def test_streamed_state_matches_batch_build(spark, tmp_path):
    df, parts = _batches(spark)
    state = str(tmp_path / "state")
    write = hist_increment_writer(
        ["k"], "v", state_path=state, **KW
    )
    for i, p in enumerate(parts):
        write(p, i)
    folded = {
        r.k: (r.hist, r.n, r.vmin, r.vmax)
        for r in folded_hist_state(spark, state, ["k"]).collect()
    }
    full = {
        r.k: (r.hist, r.n, r.vmin, r.vmax)
        for r in build_hist_state(df.drop("id"), ["k"], "v", **KW).collect()
    }
    assert folded == full  # exact fold: stream == one-shot batch
    sq = {
        r.k: (r["q_0_5"], r["q_0_99"])
        for r in hist_quantiles(spark, state, ["k"], [0.5, 0.99]).collect()
    }
    bq = {
        r.k: (r["q_0_5"], r["q_0_99"])
        for r in finalize_hist_quantiles(
            build_hist_state(df.drop("id"), ["k"], "v", **KW), ["k"], [0.5, 0.99]
        ).collect()
    }
    assert sq == bq  # quantiles bit-identical through either path


def test_replayed_micro_batch_is_skipped(spark, tmp_path):
    """A replayed batch id must not double the bucket counts — the
    idempotent ledger wrapper makes the append exactly-once."""
    _, parts = _batches(spark)
    state = str(tmp_path / "state")
    ledger = str(tmp_path / "ledger")
    write = idempotent_foreach_batch(
        hist_increment_writer(["k"], "v", state_path=state, **KW), ledger
    )
    write(parts[0], 0)
    n1 = {r.k: r.n for r in folded_hist_state(spark, state, ["k"]).collect()}
    write(parts[0], 0)  # replay: skipped by the ledger
    n2 = {r.k: r.n for r in folded_hist_state(spark, state, ["k"]).collect()}
    assert n1 == n2
    write(parts[1], 1)  # a NEW id still lands
    n3 = {r.k: r.n for r in folded_hist_state(spark, state, ["k"]).collect()}
    assert all(n3[k] > n2[k] for k in n2)


def test_layout_drift_fails_loudly_at_fold(spark, tmp_path):
    import pytest

    _, parts = _batches(spark)
    state = str(tmp_path / "state")
    hist_increment_writer(["k"], "v", state_path=state, **KW)(parts[0], 0)
    hist_increment_writer(
        ["k"], "v", state_path=state, lo=0.0, hi=500.0, n_buckets=50
    )(parts[1], 1)
    with pytest.raises(ValueError, match="incompatible layouts"):
        folded_hist_state(spark, state, ["k"])
