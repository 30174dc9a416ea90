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


def _text_frames(spark):
    ref = spark.createDataFrame(
        [(i, "alpha beta gamma common words flow here") for i in range(50)],
        "id long, text string",
    )
    same = spark.createDataFrame(
        [(i, "alpha beta gamma common words flow here") for i in range(20)],
        "id long, text string",
    )
    shifted = spark.createDataFrame(
        [(i, "delta epsilon zeta strange tokens appear now") for i in range(20)],
        "id long, text string",
    )
    return ref, same, shifted


def test_batch_vocab_jsd_scores_token_shift(spark):
    from orion_etl_oracle_to_postgres_spark.streaming.drift import (
        baseline_vocab,
        batch_vocab_jsd,
    )

    ref, same, shifted = _text_frames(spark)
    vocab, fracs = baseline_vocab(ref, "text", top_n=10)
    assert len(vocab) == 7 and abs(sum(fracs) - 1.0) < 1e-9
    assert batch_vocab_jsd(same, "text", vocab, fracs) == 0.0
    hot = batch_vocab_jsd(shifted, "text", vocab, fracs)
    assert hot == 1.0  # disjoint vocabularies: maximal log2 JSD
    # token-less batch: no score
    empty = spark.createDataFrame([(1, None)], "id long, text string")
    assert batch_vocab_jsd(empty, "text", vocab, fracs) is None
    import pytest

    with pytest.raises(ValueError, match="top_n"):
        baseline_vocab(ref, "text", top_n=0)


def test_vocab_drift_monitor_stream_matches_batch_scorer(spark, tmp_path):
    from orion_etl_oracle_to_postgres_spark.streaming.drift import (
        baseline_vocab,
        batch_vocab_jsd,
        vocab_drift_monitor_stream,
    )

    ref, _, shifted = _text_frames(spark)
    land = tmp_path / "landing_v"
    land.mkdir()
    shifted.write.parquet(str(land / "b0"))
    vocab, fracs = baseline_vocab(ref, "text", top_n=10)
    results = []
    stream = stream_source(
        spark, str(land / "b0"), fmt="parquet", schema=shifted.schema
    )
    q = vocab_drift_monitor_stream(
        stream,
        "text",
        vocab,
        fracs,
        lambda bid, jsd, n: results.append((jsd, n)),
        checkpoint=str(tmp_path / "ckpt_v"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(results) == 1
    jsd, n = results[0]
    assert n == 20 * 7  # 7 tokens per doc
    assert jsd == batch_vocab_jsd(shifted, "text", vocab, fracs)
    assert jsd > 0.5  # the shifted batch must actually alarm


def test_baseline_vocab_null_text_does_not_corrupt_total(spark):
    """NULL-text reference rows must contribute 0 tokens, not -1
    (non-ANSI size(NULL)) — fractions must stay a probability mass."""
    from orion_etl_oracle_to_postgres_spark.streaming.drift import (
        baseline_vocab,
    )

    ref = spark.createDataFrame(
        [(1, "a a b"), (2, None), (3, None), (4, "a b c")],
        "id long, text string",
    )
    vocab, fracs = baseline_vocab(ref, "text", top_n=5)
    assert vocab[0] == "a" and abs(sum(fracs) - 1.0) < 1e-9
    assert abs(fracs[0] - 3 / 6) < 1e-9


def test_contamination_monitor_stream_matches_batch_gate(spark, tmp_path):
    """Per micro-batch the monitor reports exactly what the batch
    semantic gate flags: the parallel vector alarms with its cosine,
    the orthogonal batch row stays clean; an all-clean batch reports
    zero with max_cosine None; the bench guard fires once at attach."""
    import pytest

    from orion_etl_oracle_to_postgres_spark.streaming.contamination import (
        contamination_monitor_stream,
    )
    from orion_etl_oracle_to_postgres_spark.streaming.incremental import (
        stream_source,
    )

    bench = spark.createDataFrame(
        [(9, [2.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    batch = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    land = tmp_path / "landing_c"
    land.mkdir()
    batch.write.parquet(str(land / "b0"))
    results = []
    stream = stream_source(
        spark, str(land / "b0"), fmt="parquet", schema=batch.schema
    )
    q = contamination_monitor_stream(
        stream,
        bench,
        lambda bid, nf, mc, n: results.append((nf, mc, n)),
        checkpoint=str(tmp_path / "ckpt_c"),
        threshold=0.9,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert results == [(1, 1.0, 2)]

    # clean batch: zero flags, no max cosine
    clean = spark.createDataFrame(
        [(5, [0.0, 0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    land2 = tmp_path / "landing_c2"
    land2.mkdir()
    clean.write.parquet(str(land2 / "b0"))
    results2 = []
    q2 = contamination_monitor_stream(
        stream_source(spark, str(land2 / "b0"), fmt="parquet", schema=clean.schema),
        bench,
        lambda bid, nf, mc, n: results2.append((nf, mc, n)),
        checkpoint=str(tmp_path / "ckpt_c2"),
        threshold=0.9,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert results2 == [(0, None, 1)]

    # oversized benchmark refused at ATTACH, before any batch runs
    with pytest.raises(ValueError, match="broadcast_limit"):
        contamination_monitor_stream(
            stream_source(spark, str(land / "b0"), fmt="parquet", schema=batch.schema),
            bench,
            lambda *a: None,
            checkpoint=str(tmp_path / "ckpt_c3"),
            broadcast_limit=0,
        )
