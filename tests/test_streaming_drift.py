"""Streaming drift monitor (streaming/drift.py): per-micro-batch PSI vs
a static baseline, with BATCH PARITY against
reconcile.distribution_drift — the same (reference, batch) pair must
score the same PSI through either path."""

from __future__ import annotations

from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.reconcile import (
    distribution_drift,
)
from orion_etl_oracle_to_postgres_spark.streaming.drift import (
    baseline_histogram,
    batch_psi,
    drift_monitor_stream,
)
from orion_etl_oracle_to_postgres_spark.streaming.incremental import (
    stream_source,
)


def _ref_and_shifted(spark):
    ref = spark.createDataFrame(
        [(float((i * 13) % 97),) for i in range(400)], "v double"
    )
    shifted = spark.createDataFrame(
        [(float((i * 13) % 97) * 2 + 40,) for i in range(200)], "v double"
    )
    return ref, shifted


def test_batch_psi_matches_distribution_drift(spark):
    ref, shifted = _ref_and_shifted(spark)
    bounds, fracs = baseline_histogram(ref, "v", n_bins=8, exact=True)
    got = batch_psi(shifted, "v", bounds, fracs)
    want = (
        distribution_drift(ref, shifted, "v", n_bins=8, exact=True)
        .agg(F.round(F.sum("psi_term"), 6).alias("psi"))
        .collect()[0]
        .psi
    )
    assert got == want
    # identical populations: drift ~0
    assert abs(batch_psi(ref, "v", bounds, fracs)) < 1e-6
    # empty/all-NULL batch: no score, not a fake zero
    empty = spark.createDataFrame([], "v double")
    assert batch_psi(empty, "v", bounds, fracs) is None


def test_drift_monitor_stream_scores_micro_batches(spark, tmp_path):
    ref, shifted = _ref_and_shifted(spark)
    land = tmp_path / "landing"
    land.mkdir()
    shifted.write.parquet(str(land / "b0"))

    bounds, fracs = baseline_histogram(ref, "v", n_bins=8, exact=True)
    results = []
    stream = stream_source(
        spark, str(land / "b0"), fmt="parquet", schema=shifted.schema
    )
    q = drift_monitor_stream(
        stream,
        "v",
        bounds,
        fracs,
        lambda bid, psi, n: results.append((psi, n)),
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(results) == 1
    psi, n = results[0]
    assert n == 200
    want = (
        distribution_drift(ref, shifted, "v", n_bins=8, exact=True)
        .agg(F.round(F.sum("psi_term"), 6).alias("psi"))
        .collect()[0]
        .psi
    )
    assert psi == want
    assert psi > 0.25  # the shifted batch must actually alarm
