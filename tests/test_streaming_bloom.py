"""Streaming first-sighting monitor (streaming/bloom_monitor.py):
append-only Bloom increments, fold-on-read — BATCH PARITY: the probed
state before batch N is bit-identical to one batch build over batches
0..N−1 (set union is exact), so per-batch verdicts are reproducible
from the increments alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
    build_bloom_state,
    probe_bloom,
)
from orion_etl_oracle_to_postgres_spark.streaming.bloom_monitor import (
    bloom_increment_writer,
    first_sighting_report,
    folded_bloom_state,
)
from orion_etl_oracle_to_postgres_spark.streaming.foreach_sink import (
    idempotent_foreach_batch,
)

KW = dict(m_bits=1 << 12, k=5, seed="sb")


def _batches(spark):
    # batch i carries keys [100*i, 100*i+150): each batch overlaps the
    # previous by 50 keys, so from batch 1 on there ARE prior sightings
    return [
        spark.range(100 * i, 100 * i + 150).select(F.col("id").alias("key"))
        for i in range(3)
    ]


def test_reports_and_state_match_batch_twin(spark, tmp_path):
    parts = _batches(spark)
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    write = bloom_increment_writer(
        "key", state_path=state, report_path=report, **KW
    )
    for i, p in enumerate(parts):
        write(p, i)

    rep = {r["batch_id"]: r for r in
           first_sighting_report(spark, report).collect()}
    assert rep[0]["n_rows"] == 150 and rep[0]["n_definite_new"] == 150
    # batches 1, 2: 50 keys repeat from the previous batch. Bloom can
    # only ADD false positives on the 100 fresh keys, never miss a
    # repeat — the one-sided guarantee, stated as bounds:
    for i in (1, 2):
        assert rep[i]["n_maybe_seen"] >= 50
        assert rep[i]["n_definite_new"] <= 100
        assert rep[i]["n_rows"] == 150

    # exact parity: folded stream state == one-shot batch build over
    # the union of all batches
    union = parts[0].union(parts[1]).union(parts[2])
    rows = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("word_idx", "word").collect())
    )
    assert rows(folded_bloom_state(spark, state)) == rows(
        build_bloom_state(union, "key", **KW)
    )

    # per-batch verdict parity: batch 2's counts replay exactly from a
    # batch-mode probe against the prior-union state
    prior = build_bloom_state(parts[0].union(parts[1]), "key", **KW)
    twin = probe_bloom(parts[2], "key", prior, out_col="m").agg(
        F.sum(F.when(F.col("m"), 1).otherwise(0)).alias("maybe")
    ).collect()[0]["maybe"]
    assert rep[2]["n_maybe_seen"] == twin


def test_replayed_batch_is_skipped(spark, tmp_path):
    parts = _batches(spark)
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    ledger = str(tmp_path / "ledger")
    write = idempotent_foreach_batch(
        bloom_increment_writer(
            "key", state_path=state, report_path=report, **KW
        ),
        ledger,
    )
    write(parts[0], 0)
    write(parts[0], 0)  # replay: must not double report or increment
    assert first_sighting_report(spark, report).count() == 1
    n_words = folded_bloom_state(spark, state).count()
    write(parts[0], 0)
    assert folded_bloom_state(spark, state).count() == n_words


def test_layout_drift_fails_loudly_at_fold(spark, tmp_path):
    parts = _batches(spark)
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    bloom_increment_writer(
        "key", state_path=state, report_path=report, **KW
    )(parts[0], 0)
    bloom_increment_writer(
        "key", state_path=state, report_path=report,
        m_bits=1 << 12, k=5, seed="OTHER",
    )(parts[1], 1)
    with pytest.raises(ValueError, match="incompatible layouts"):
        folded_bloom_state(spark, state)


def test_null_keys_counted_but_unjudged(spark, tmp_path):
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    batch = spark.createDataFrame([(1,), (None,), (2,)], "key long")
    bloom_increment_writer(
        "key", state_path=state, report_path=report, **KW
    )(batch, 0)
    r = first_sighting_report(spark, report).collect()[0]
    assert r["n_rows"] == 3
    assert r["n_definite_new"] == 2 and r["n_maybe_seen"] == 0


def test_probe_on_raw_increments_never_false_negative(spark, tmp_path):
    """Probing the appended increments DIRECTLY (no merge fold) must
    still honor the no-false-negatives guarantee: duplicate word_idx
    rows OR together in the probe's word array, never last-write-wins."""
    parts = _batches(spark)
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    write = bloom_increment_writer(
        "key", state_path=state, report_path=report, **KW
    )
    for i, p in enumerate(parts):
        write(p, i)
    raw = spark.read.parquet(state)  # increments, NOT folded
    union = parts[0].union(parts[1]).union(parts[2])
    out = probe_bloom(union, "key", raw).collect()
    assert all(r["maybe_seen"] is True for r in out)


def test_crash_between_writes_replay_is_clean(spark, tmp_path):
    """Simulated crash AFTER the report write but BEFORE the increment
    write: the replay must leave exactly one report row for the batch
    and a state identical to a never-crashed run (per-batch overwrite
    subdirs, not appends)."""
    parts = _batches(spark)
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    write = bloom_increment_writer(
        "key", state_path=state, report_path=report, **KW
    )
    write(parts[0], 0)
    # simulate the torn batch 1: report landed, increment did not
    import shutil

    write(parts[1], 1)
    shutil.rmtree(f"{state}/batch_id=1")
    # replay batch 1 (ledger was never marked)
    write(parts[1], 1)
    rep = first_sighting_report(spark, report)
    assert rep.filter(F.col("batch_id") == 1).count() == 1
    # state after replay == clean two-batch build
    union = parts[0].union(parts[1])
    rows = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("word_idx", "word").collect())
    )
    assert rows(folded_bloom_state(spark, state)) == rows(
        build_bloom_state(union, "key", **KW)
    )
