"""Streaming KMV distinct-count monitor (streaming/kmv_monitor.py):
append-only bottom-k increments, fold-on-read — BATCH PARITY is
HASH-EXACT: the folded stream state equals one batch build over the
union of all batches hash-for-hash (the KMV fold property), so the
running distinct estimates replay value-exactly across restarts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
    build_kmv_state,
)
from orion_etl_oracle_to_postgres_spark.streaming.foreach_sink import (
    idempotent_foreach_batch,
)
from orion_etl_oracle_to_postgres_spark.streaming.kmv_monitor import (
    folded_kmv_state,
    kmv_distinct,
    kmv_increment_writer,
)

KW = dict(k=16, seed="sk")


def _batches(spark):
    # group 'small': 5 distinct values spread over the batches (< k ->
    # exact); group 'big': 120 distinct values (> k -> estimate), with
    # overlap across batches so the distinct-union fold is exercised
    rows = []
    for b in range(3):
        rows.append(
            [("small", v) for v in range(3 + b)]
            + [("big", v) for v in range(b * 30, b * 30 + 60)]
        )
    return [
        spark.createDataFrame(r, "g string, v long") for r in rows
    ]


def _hashes(state):
    return sorted(map(tuple, state.select("g", "__hv").collect()))


def test_folded_stream_state_is_hash_exact_batch_twin(spark, tmp_path):
    parts = _batches(spark)
    state = str(tmp_path / "state")
    write = kmv_increment_writer(["g"], "v", state_path=state, **KW)
    for i, p in enumerate(parts):
        write(p, i)

    union = parts[0].union(parts[1]).union(parts[2])
    assert _hashes(folded_kmv_state(spark, state, ["g"])) == _hashes(
        build_kmv_state(union, ["g"], "v", **KW)
    )
    # estimates replay exactly too: exact below k, estimator above
    est = {r["g"]: r for r in kmv_distinct(spark, state, ["g"]).collect()}
    assert est["small"]["n_kept"] == 5
    assert est["small"]["approx_distinct"] == 5
    assert est["big"]["n_kept"] == 16
    truth = union.where("g = 'big'").select("v").distinct().count()
    assert abs(est["big"]["approx_distinct"] - truth) / truth < 0.8


def test_replayed_batch_folds_to_nothing_new(spark, tmp_path):
    """KMV's distinct-union fold is duplicate-proof: even WITHOUT the
    ledger a replayed increment changes nothing; with the ledger the
    replay work is skipped entirely."""
    parts = _batches(spark)
    state = str(tmp_path / "state")
    raw = kmv_increment_writer(["g"], "v", state_path=state, **KW)
    raw(parts[0], 0)
    before = _hashes(folded_kmv_state(spark, state, ["g"]))
    raw(parts[0], 0)  # unledgered replay: overwrite, state unchanged
    assert _hashes(folded_kmv_state(spark, state, ["g"])) == before

    ledgered = idempotent_foreach_batch(
        raw, str(tmp_path / "ledger")
    )
    ledgered(parts[1], 1)
    after = _hashes(folded_kmv_state(spark, state, ["g"]))
    ledgered(parts[1], 1)  # ledger skips the replay
    assert _hashes(folded_kmv_state(spark, state, ["g"])) == after


def test_layout_drift_fails_loudly_at_fold(spark, tmp_path):
    parts = _batches(spark)
    state = str(tmp_path / "state")
    kmv_increment_writer(["g"], "v", state_path=state, **KW)(parts[0], 0)
    kmv_increment_writer(["g"], "v", state_path=state, k=32, seed="OTHER")(
        parts[1], 1
    )
    with pytest.raises(ValueError, match="incompatible layouts"):
        folded_kmv_state(spark, state, ["g"]).collect()


def test_crash_replay_overwrites_half_written_increment(spark, tmp_path):
    """A crash that left a half-written batch subdir is healed by the
    replay's overwrite — state identical to a never-crashed run."""
    parts = _batches(spark)
    state = str(tmp_path / "state")
    write = kmv_increment_writer(["g"], "v", state_path=state, **KW)
    write(parts[0], 0)
    # simulate the half-write: batch 1's subdir holds a TRUNCATED
    # increment (only group 'small' landed before the crash)
    build_kmv_state(
        parts[1].where("g = 'small'"), ["g"], "v", **KW
    ).write.mode("overwrite").parquet(f"{state}/batch_id=1")
    write(parts[1], 1)  # replay overwrites the partial piece
    union = parts[0].union(parts[1])
    assert _hashes(folded_kmv_state(spark, state, ["g"])) == _hashes(
        build_kmv_state(union, ["g"], "v", **KW)
    )


def test_null_values_contribute_nothing(spark, tmp_path):
    state = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 1)], "g string, v long"
    )
    kmv_increment_writer(["g"], "v", state_path=state, **KW)(batch, 0)
    r = kmv_distinct(spark, state, ["g"]).collect()[0]
    assert r["n_kept"] == 1 and r["approx_distinct"] == 1


def test_sample_panel_stream_matches_batch_and_is_prefix_consistent(
    spark, tmp_path
):
    """The sample-panel twin: increments fold to the row-for-row batch
    panel; the panel only changes when a smaller hash arrives; rank<=j
    prefixes are the j-panels."""
    from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
        build_sample_state,
        finalize_sample,
    )
    from orion_etl_oracle_to_postgres_spark.streaming.kmv_monitor import (
        current_panel,
        folded_sample_state,
        sample_increment_writer,
    )

    parts = _batches(spark)
    state = str(tmp_path / "pstate")
    write = sample_increment_writer(["g"], "v", k=8, seed="p", state_path=state)
    for i, p in enumerate(parts):
        write(p, i)
    union = parts[0].union(parts[1]).union(parts[2])
    twin = build_sample_state(union, ["g"], "v", k=8, seed="p")
    rows = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("g", "v", "__hv").collect())
    )
    assert rows(folded_sample_state(spark, state, ["g"], "v")) == rows(twin)
    panel = current_panel(spark, state, ["g"], "v")
    batch_panel = finalize_sample(twin, ["g"], "v")
    key = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("g", "sample_rank", "v").collect())
    )
    assert key(panel) == key(batch_panel)
    # prefix consistency through the stream state too
    small = build_sample_state(union, ["g"], "v", k=4, seed="p")
    assert {tuple(r) for r in small.select("g", "v").collect()} == {
        (r["g"], r["v"])
        for r in panel.where("sample_rank <= 4").collect()
    }


def test_panel_quantiles_carry_stream_matches_batch(spark, tmp_path):
    """A carried value payload flows through the stream increments and
    the quantile read equals a one-shot batch build + finalize over
    the union — the streaming face of the range-free quantile state
    (fold == full-build, then identical nearest-rank picks)."""
    from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
        build_sample_state,
        finalize_sample_quantiles,
    )
    from orion_etl_oracle_to_postgres_spark.streaming.kmv_monitor import (
        panel_quantiles,
        sample_increment_writer,
    )

    def mk(rows):
        return spark.createDataFrame(
            [(g, v, (v * 37) % 1000) for g, v in rows],
            "g string, v long, c long",
        )

    parts = [
        mk([("a", v) for v in range(40)] + [("b", v) for v in range(4)]),
        mk([("a", v) for v in range(20, 70)] + [("b", v) for v in range(2, 6)]),
    ]
    state = str(tmp_path / "qstate")
    write = sample_increment_writer(
        ["g"], "v", k=8, seed="q", state_path=state, carry=["c"]
    )
    for i, p in enumerate(parts):
        write(p, i)
    got = panel_quantiles(
        spark, state, ["g"], "v", "c", [0.5, 0.9], carry=["c"]
    )
    union = parts[0].union(parts[1])
    want = finalize_sample_quantiles(
        build_sample_state(union, ["g"], "v", k=8, seed="q", carry=["c"]),
        ["g"], "v", "c", [0.5, 0.9],
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # group 'b' kept < k ids -> its quantiles are the exact population
    # nearest-rank picks
    import math

    vals = sorted((v * 37) % 1000 for v in range(6))
    row = {r["g"]: r for r in got.collect()}["b"]
    assert row["n_kept"] == 6
    assert row["q_0_5"] == vals[math.ceil(0.5 * 6) - 1]
    assert row["q_0_9"] == vals[math.ceil(0.9 * 6) - 1]
