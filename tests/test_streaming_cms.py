"""Streaming frequency-cap monitor (streaming/cms_monitor.py):
append-only CMS increments, fold-on-read — BATCH PARITY: the estimated
state before batch N is cell-identical to one batch build over batches
0..N−1 (count addition is exact), so per-batch verdicts are
reproducible from the increments alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
    build_cms_state,
    estimate_cms,
)
from orion_etl_oracle_to_postgres_spark.streaming.cms_monitor import (
    cms_increment_writer,
    folded_cms_state,
    frequency_cap_report,
)
from orion_etl_oracle_to_postgres_spark.streaming.foreach_sink import (
    idempotent_foreach_batch,
)

KW = dict(width=1 << 10, depth=4, seed="sc", cap=2)


def _batches(spark):
    # every batch carries keys 0..99 once, plus key 7 twice more: after
    # two batches key 7 has been seen 6 times, the others 2 times each
    base = spark.range(0, 100).select(F.col("id").alias("key"))
    extra = spark.createDataFrame([(7,), (7,)], "key long")
    return [base.union(extra) for _ in range(3)]


def test_reports_and_state_match_batch_twin(spark, tmp_path):
    parts = _batches(spark)
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    write = cms_increment_writer(
        "key", state_path=state, report_path=report, **KW
    )
    for i, p in enumerate(parts):
        write(p, i)

    rep = {r["batch_id"]: r for r in
           frequency_cap_report(spark, report).collect()}
    # batch 0: empty prior -> everything under cap
    assert rep[0]["n_rows"] == 102 and rep[0]["n_keys"] == 100
    assert rep[0]["n_over_cap"] == 0 and rep[0]["n_under_cap"] == 100
    # batch 1: prior frequency of key 7 is 3 >= cap=2; the other 99
    # keys sit at 1 < cap, but CMS over-cap verdicts may gain collision
    # mass — one-sided bounds, like the Bloom twin's test
    assert rep[1]["n_over_cap"] >= 1
    assert rep[1]["n_under_cap"] <= 99
    # batch 2: every key's prior frequency is >= 2 -> all over cap,
    # and under-cap verdicts are PROOFS, so exactly zero remain
    assert rep[2]["n_over_cap"] == 100 and rep[2]["n_under_cap"] == 0

    # exact parity: folded stream state == one-shot batch build
    union = parts[0].union(parts[1]).union(parts[2])
    cells = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("row_idx", "col_idx", "cnt").collect())
    )
    bkw = {k: v for k, v in KW.items() if k != "cap"}
    assert cells(folded_cms_state(spark, state)) == cells(
        build_cms_state(union, "key", **bkw)
    )

    # per-batch verdict parity: batch 2's over-cap count replays
    # exactly from a batch-mode estimate against the prior-union state
    prior = build_cms_state(parts[0].union(parts[1]), "key", **bkw)
    twin = (
        estimate_cms(
            parts[2].select("key").distinct(), "key", prior, out_col="e"
        )
        .agg(F.sum(F.when(F.col("e") >= KW["cap"], 1).otherwise(0)).alias("o"))
        .collect()[0]["o"]
    )
    assert rep[2]["n_over_cap"] == twin


def test_replayed_batch_is_skipped(spark, tmp_path):
    parts = _batches(spark)
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    ledger = str(tmp_path / "ledger")
    write = idempotent_foreach_batch(
        cms_increment_writer(
            "key", state_path=state, report_path=report, **KW
        ),
        ledger,
    )
    write(parts[0], 0)
    write(parts[0], 0)  # replay: must not double report or increment
    assert frequency_cap_report(spark, report).count() == 1
    total = folded_cms_state(spark, state).agg(F.sum("cnt")).collect()[0][0]
    write(parts[0], 0)
    assert (
        folded_cms_state(spark, state).agg(F.sum("cnt")).collect()[0][0]
        == total
    )


def test_crash_between_writes_replay_is_clean(spark, tmp_path):
    """Replay after a crash between the report and increment writes
    overwrites both per-batch subdirs — state identical to a
    never-crashed run, exactly one report row."""
    parts = _batches(spark)
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    write = cms_increment_writer(
        "key", state_path=state, report_path=report, **KW
    )
    write(parts[0], 0)
    # simulate the crash: batch 1's report landed, increment did not
    import shutil

    write(parts[1], 1)
    shutil.rmtree(f"{state}/batch_id=1")
    write(parts[1], 1)  # replay
    assert frequency_cap_report(spark, report).count() == 2
    union = parts[0].union(parts[1])
    bkw = {k: v for k, v in KW.items() if k != "cap"}
    cells = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("row_idx", "col_idx", "cnt").collect())
    )
    assert cells(folded_cms_state(spark, state)) == cells(
        build_cms_state(union, "key", **bkw)
    )


def test_layout_drift_fails_loudly_at_fold(spark, tmp_path):
    parts = _batches(spark)
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    cms_increment_writer(
        "key", state_path=state, report_path=report, **KW
    )(parts[0], 0)
    cms_increment_writer(
        "key", state_path=state, report_path=report,
        width=1 << 10, depth=4, seed="OTHER", cap=2,
    )(parts[1], 1)
    with pytest.raises(ValueError, match="incompatible layouts"):
        folded_cms_state(spark, state)


def test_null_keys_counted_but_unjudged(spark, tmp_path):
    state, report = str(tmp_path / "state"), str(tmp_path / "report")
    batch = spark.createDataFrame([(1,), (None,), (2,)], "key long")
    cms_increment_writer(
        "key", state_path=state, report_path=report, **KW
    )(batch, 0)
    r = frequency_cap_report(spark, report).collect()[0]
    assert r["n_rows"] == 3 and r["n_keys"] == 2
    assert r["n_over_cap"] == 0 and r["n_under_cap"] == 2
