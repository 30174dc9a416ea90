"""Declarative mergeable-state maintenance (``state:`` block —
spec.AggStateSpec / operators/statemaint.py / compiler wiring /
``--state`` verb): nightly increments fold to the full-history state
exactly, retried windows overwrite instead of double-counting, layout
drift refuses loudly, and the spec/compile contracts fail friendly."""

from __future__ import annotations

import json
import textwrap

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators import statemaint as SM
from orion_etl_oracle_to_postgres_spark.operators import aggstate as A
from orion_etl_oracle_to_postgres_spark.runner import main
from orion_etl_oracle_to_postgres_spark.spec import AggStateSpec


def _docs(spark, n=40):
    return spark.createDataFrame(
        [(i, f"d{i % 4}", i * 10 % 7, float(i % 11)) for i in range(n)],
        "id long, grp string, uid long, val double",
    )


# ---------------- pure fold parity (library dispatch) ----------------


@pytest.mark.parametrize(
    "st",
    [
        AggStateSpec(kind="kmv", value_column="uid", keys=["grp"], k=8),
        AggStateSpec(kind="sample", value_column="id", keys=["grp"], k=5),
        AggStateSpec(
            kind="sample", value_column="id", keys=["grp"], k=5,
            carry=["val"], quantiles=[0.5, 0.9],
        ),
        AggStateSpec(kind="stats", value_column="val", keys=["grp"]),
        AggStateSpec(
            kind="hist", value_column="val", keys=["grp"],
            lo=0.0, hi=11.0, n_buckets=11,
        ),
        AggStateSpec(kind="bloom", value_column="uid", m_bits=256, k=3),
        AggStateSpec(kind="cms", value_column="uid", width=64, depth=3),
    ],
    ids=lambda s: s.kind,
)
def test_fold_equals_full_build_every_kind(spark, tmp_path, st):
    """Increments over ANY split of the data fold to the identical
    state a one-shot full-history build produces — the family property
    the declarative block inherits, pinned per kind through the
    dispatch layer (three uneven nightly windows here)."""
    df = _docs(spark)
    path = str(tmp_path / "state")
    bounds = [(0, 13), (13, 14), (14, 40)]  # uneven + one tiny window
    for i, (lo, hi) in enumerate(bounds):
        SM.write_state_increment(
            df.where((F.col("id") >= lo) & (F.col("id") < hi)), st, path, i
        )
    folded = SM.read_folded_state(spark, path, st)
    full = SM.build_state_increment(df, st)
    rows = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    assert rows(folded) == rows(full)
    # the report side executes and is non-empty for every kind
    rep = SM.finalize_state_report(spark, path, st)
    assert rep.count() >= 1


def test_retried_window_overwrites_not_doubles(spark, tmp_path):
    """Re-writing the SAME window (a crash-replayed night) replaces its
    subdirectory — the non-duplicate-proof folds (stats: plain sums)
    must come out exact, not doubled."""
    st = AggStateSpec(kind="stats", value_column="val", keys=["grp"])
    df = _docs(spark)
    path = str(tmp_path / "state")
    SM.write_state_increment(df.where(F.col("id") < 20), st, path, "w1")
    SM.write_state_increment(df.where(F.col("id") >= 20), st, path, "w2")
    # replay window 2
    SM.write_state_increment(df.where(F.col("id") >= 20), st, path, "w2")
    got = SM.finalize_state_report(spark, path, st)
    want = A.finalize_agg_state(
        A.build_agg_state(df, ["grp"], ["val"]), ["grp"], ["val"]
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_layout_drift_refuses_loudly(spark, tmp_path):
    """An increment written under a changed layout (k drifted between
    nights) fails at FOLD time with the family's loud error."""
    df = _docs(spark)
    path = str(tmp_path / "state")
    SM.write_state_increment(
        df, AggStateSpec(kind="kmv", value_column="uid", keys=["grp"], k=8),
        path, "n1",
    )
    SM.write_state_increment(
        df, AggStateSpec(kind="kmv", value_column="uid", keys=["grp"], k=16),
        path, "n2",
    )
    with pytest.raises(ValueError, match="incompatible layouts"):
        SM.read_folded_state(
            spark, path,
            AggStateSpec(kind="kmv", value_column="uid", keys=["grp"], k=8),
        ).collect()


def test_sample_carry_quantile_report(spark, tmp_path):
    """A sample state with a carry flips the --state read side from
    panel to range-free nearest-rank quantiles of the first carried
    column — equal to finalizing a one-shot full-history build, with
    the declared-quantile column labels."""
    st = AggStateSpec(
        kind="sample", value_column="id", keys=["grp"], k=6,
        carry=["val"], quantiles=[0.5, 0.9],
    )
    df = _docs(spark)
    path = str(tmp_path / "state")
    SM.write_state_increment(df.where(F.col("id") < 17), st, path, "n1")
    SM.write_state_increment(df.where(F.col("id") >= 17), st, path, "n2")
    got = SM.finalize_state_report(spark, path, st)
    assert set(got.columns) == {"grp", "n_kept", "q_0_5", "q_0_9"}
    want = A.finalize_sample_quantiles(
        SM.build_state_increment(df, st), ["grp"], "id", "val", [0.5, 0.9]
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_mark_sanitization():
    assert SM.sanitize_mark("2024-01-02 03:04:05") == "2024-01-02_03_04_05"
    assert SM.sanitize_mark(17) == "17"
    assert SM.sanitize_mark("") == "none"


# ---------------- spec contracts ----------------


def test_spec_refusals():
    from orion_etl_oracle_to_postgres_spark.spec import (
        IncrementalSpec,
        TableSpec,
    )

    with pytest.raises(ValueError, match="needs keys"):
        AggStateSpec(kind="kmv", value_column="v")
    with pytest.raises(ValueError, match="takes no keys"):
        AggStateSpec(kind="bloom", value_column="v", keys=["a"])
    with pytest.raises(ValueError, match="lo \\+ hi"):
        AggStateSpec(kind="hist", value_column="v", keys=["a"])
    with pytest.raises(ValueError, match="weight_column only applies"):
        AggStateSpec(
            kind="kmv", value_column="v", keys=["a"], weight_column="w"
        )
    with pytest.raises(ValueError, match="power of two"):
        AggStateSpec(kind="cms", value_column="v", width=100)
    with pytest.raises(ValueError, match="carry only applies"):
        AggStateSpec(kind="kmv", value_column="v", keys=["a"], carry=["c"])
    with pytest.raises(ValueError, match="collide with"):
        AggStateSpec(
            kind="sample", value_column="v", keys=["a"], carry=["v"]
        )
    with pytest.raises(ValueError, match="duplicate state carry"):
        AggStateSpec(
            kind="sample", value_column="v", keys=["a"], carry=["c", "c"]
        )
    with pytest.raises(ValueError, match="kind must be one of"):
        AggStateSpec(kind="hll", value_column="v", keys=["a"])
    # table-level: batch-incremental only
    with pytest.raises(ValueError, match="state requires incremental"):
        TableSpec(
            source_table="s", target_table="t",
            state={"kind": "kmv", "value_column": "v", "keys": ["k"]},
        )
    with pytest.raises(ValueError, match="monitor blocks"):
        TableSpec(
            source_table="s", target_table="t", write_mode="append",
            incremental=IncrementalSpec(watermark_column="id", mode="streaming"),
            state={"kind": "kmv", "value_column": "v", "keys": ["k"]},
        )


def test_compile_time_column_check(spark, tmp_path):
    """A state column missing from the OUTGOING frame fails at compile
    (so --explain catches it), with the target-side-names hint."""
    from orion_etl_oracle_to_postgres_spark.compiler import (
        JobContext,
        compile_table,
    )
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        IncrementalSpec,
        MappingSpec,
        TableSpec,
    )

    src = tmp_path / "src"
    (src / "t").mkdir(parents=True)
    _docs(spark, 5).write.mode("overwrite").parquet(str(src / "t"))
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=str(src)),
            target_files=FilesConnectorSpec(base_path=str(tmp_path / "out")),
        )
    )
    spec = TableSpec(
        source_table="t", target_table="t2", write_mode="append",
        incremental=IncrementalSpec(
            watermark_column="id", state_path=str(tmp_path / "hwm.json")
        ),
        mappings=[MappingSpec(source="id", target="id")],
        state={"kind": "kmv", "value_column": "uid", "keys": ["grp"]},
    )
    with pytest.raises(ValueError, match="state block column.*target-side"):
        compile_table(JobContext(spark, g), spec)


# ---------------- declarative e2e through the runner ----------------


def _write_cfg(tmp_path, src, state_k=8):
    (tmp_path / "tables").mkdir(exist_ok=True)
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [s.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {tmp_path / 'out'}}}
            """
        )
    )
    (tmp_path / "tables" / "s.yaml").write_text(
        textwrap.dedent(
            f"""
            source_table: land
            target_table: t_s
            write_mode: append
            incremental:
              watermark_column: id
              state_path: {tmp_path / 'hwm.json'}
            mappings:
              - {{source: id, target: id}}
              - {{source: grp, target: grp}}
              - {{source: uid, target: user_id}}
            state:
              kind: kmv
              keys: [grp]
              value_column: user_id
              k: {state_k}
              state_path: {tmp_path / 'aggstate'}
            """
        )
    )
    return str(tmp_path / "config.yaml")


def test_declarative_state_nightly_e2e(spark, tmp_path, capsys):
    """Two nightly incremental runs each append one bounded increment;
    --state folds them into exactly the full-history finalize; a
    replayed window (mark rolled back) overwrites its own piece; the
    empty-state error fires before the first run; a no-new-rows run
    appends nothing new."""
    src = tmp_path / "src"
    (src / "land").mkdir(parents=True)
    df = _docs(spark)
    night1, night2 = df.where("id < 25"), df.where("id >= 25")
    night1.coalesce(1).write.mode("append").parquet(str(src / "land"))
    cfg = _write_cfg(tmp_path, src)

    with pytest.raises(SystemExit, match="no drained batches recorded yet"):
        main(["--config", cfg, "--state", "t_s"])

    assert main(["--config", cfg]) == 0
    night2.coalesce(1).write.mode("append").parquet(str(src / "land"))
    assert main(["--config", cfg]) == 0

    state_dir = tmp_path / "aggstate"
    marks = sorted(p.name for p in state_dir.iterdir() if p.name.startswith("mark="))
    assert marks == ["mark=24", "mark=39"]

    assert main(["--config", cfg, "--state", "t_s"]) == 0
    out = capsys.readouterr().out
    want = {
        tuple(r)
        for r in A.finalize_kmv(
            A.build_kmv_state(
                df.select("grp", F.col("uid").alias("user_id")),
                ["grp"], "user_id", k=8,
            ),
            ["grp"],
        ).collect()
    }
    for grp, n_kept, est in want:
        assert f"grp='{grp}', n_kept={n_kept}, approx_distinct={est}" in out
    assert "state: kmv, 4 rows" in out

    # roll the mark back and replay night 2: same window, same dir,
    # NO duplicate increment, fold unchanged
    hwm = tmp_path / "hwm.json"
    stored = json.loads(hwm.read_text())
    key = next(iter(stored))
    stored[key] = "24"
    hwm.write_text(json.dumps(stored))
    assert main(["--config", cfg]) == 0
    marks2 = sorted(p.name for p in state_dir.iterdir() if p.name.startswith("mark="))
    assert marks2 == marks
    assert main(["--config", cfg, "--state", "t_s"]) == 0
    assert "state: kmv, 4 rows" in capsys.readouterr().out

    # nothing new landed: the run appends no increment
    assert main(["--config", cfg]) == 0
    marks3 = sorted(p.name for p in state_dir.iterdir() if p.name.startswith("mark="))
    assert marks3 == marks

    # a drifted layout (k changed in the YAML) refuses at the next fold
    night3 = spark.createDataFrame([(99, "d0", 1, 1.0)], "id long, grp string, uid long, val double")
    night3.coalesce(1).write.mode("append").parquet(str(src / "land"))
    _write_cfg(tmp_path, src, state_k=16)
    assert main(["--config", cfg]) == 0
    with pytest.raises(ValueError, match="incompatible layouts"):
        main(["--config", cfg, "--state", "t_s"])


def test_state_verb_refused_without_block(spark, tmp_path):
    src = tmp_path / "src"
    (src / "land").mkdir(parents=True)
    _docs(spark, 5).coalesce(1).write.mode("append").parquet(str(src / "land"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [s.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {tmp_path / 'out'}}}
            """
        )
    )
    (tmp_path / "tables" / "s.yaml").write_text(
        textwrap.dedent(
            """
            source_table: land
            target_table: t_n
            mappings:
              - {source: id, target: id}
            """
        )
    )
    with pytest.raises(SystemExit, match="declares no\\s+state block"):
        main([
            "--config", str(tmp_path / "config.yaml"), "--state", "t_n"
        ])


def test_state_dirs_resolution_and_collision():
    """Default increment dirs: a single block keeps the historical
    ``agg_state`` (existing states keep folding); multiple pathless
    blocks get kind+column suffixes; two blocks resolving to the same
    dir refuse at compile with the explicit-path hint."""
    from orion_etl_oracle_to_postgres_spark.compiler import (
        default_state_dir,
        state_dirs,
    )
    from orion_etl_oracle_to_postgres_spark.spec import (
        IncrementalSpec,
        MappingSpec,
        TableSpec,
    )

    def mk(state):
        return TableSpec(
            source_table="s", target_table="t", write_mode="append",
            incremental=IncrementalSpec(watermark_column="id"),
            mappings=[MappingSpec(source="id", target="id")],
            state=state,
        )

    one = mk({"kind": "kmv", "value_column": "v", "keys": ["g"]})
    assert default_state_dir(one) == ".state/s__t/agg_state"
    # a 1-element list behaves like the single mapping
    assert default_state_dir(
        mk([{"kind": "kmv", "value_column": "v", "keys": ["g"]}])
    ) == ".state/s__t/agg_state"

    two = mk([
        {"kind": "kmv", "value_column": "v", "keys": ["g"]},
        {"kind": "hist", "value_column": "w", "keys": ["g"],
         "lo": 0, "hi": 10},
    ])
    dirs = [d for _, d in state_dirs(two)]
    assert dirs == [
        ".state/s__t/agg_state_kmv_v",
        ".state/s__t/agg_state_hist_w",
    ]

    clash = mk([
        {"kind": "kmv", "value_column": "v", "keys": ["g"]},
        {"kind": "kmv", "value_column": "v", "keys": ["g"], "k": 32},
    ])
    with pytest.raises(ValueError, match="same[\\s\\S]*increment directory"):
        state_dirs(clash)

    with pytest.raises(ValueError, match="empty list"):
        mk([])

    # weight_column now valid on hist, still refused elsewhere
    AggStateSpec(
        kind="hist", value_column="v", keys=["g"], lo=0, hi=10,
        weight_column="w",
    )
    with pytest.raises(ValueError, match="weight_column only applies"):
        AggStateSpec(
            kind="sample", value_column="v", keys=["g"], weight_column="w"
        )


def test_multi_state_blocks_nightly_e2e(spark, tmp_path, capsys):
    """A state: LIST maintains several sketches of the same nightly
    load: each block appends to its own directory every night, --state
    prints every report under a kind header, and each fold equals the
    full-history build (weighted hist included — weight_column on
    kind: hist)."""
    import textwrap

    src = tmp_path / "src"
    (src / "land").mkdir(parents=True)
    df = _docs(spark)
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [m.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {tmp_path / 'out'}}}
            """
        )
    )
    (tmp_path / "tables" / "m.yaml").write_text(
        textwrap.dedent(
            f"""
            source_table: land
            target_table: t_m
            write_mode: append
            incremental:
              watermark_column: id
              state_path: {tmp_path / 'hwm.json'}
            mappings:
              - {{source: id, target: id}}
              - {{source: grp, target: grp}}
              - {{source: uid, target: uid}}
              - {{source: val, target: val}}
            state:
              - kind: kmv
                keys: [grp]
                value_column: uid
                k: 8
                state_path: {tmp_path / 'st_kmv'}
              - kind: hist
                keys: [grp]
                value_column: val
                lo: 0.0
                hi: 11.0
                n_buckets: 11
                weight_column: uid
                quantiles: [0.5]
                state_path: {tmp_path / 'st_hist'}
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    from orion_etl_oracle_to_postgres_spark.runner import main

    df.where("id < 20").coalesce(1).write.mode("append").parquet(
        str(src / "land")
    )
    assert main(["--config", cfg]) == 0
    df.where("id >= 20").coalesce(1).write.mode("append").parquet(
        str(src / "land")
    )
    assert main(["--config", cfg]) == 0
    # both dirs got both nightly increments
    for d in ("st_kmv", "st_hist"):
        marks = sorted(
            p.name for p in (tmp_path / d).iterdir()
            if p.name.startswith("mark=")
        )
        assert marks == ["mark=19", "mark=39"], d

    assert main(["--config", cfg, "--state", "t_m"]) == 0
    out = capsys.readouterr().out
    assert "-- state kind=kmv value=uid" in out
    assert "-- state kind=hist value=val" in out

    # each fold equals the one-shot full-history build + finalize
    kmv_want = {
        tuple(r)
        for r in A.finalize_kmv(
            A.build_kmv_state(df, ["grp"], "uid", k=8, seed="kmv"),
            ["grp"],
        ).collect()
    }
    hist_want = {
        tuple(r)
        for r in A.finalize_hist_quantiles(
            A.build_hist_state(
                df, ["grp"], "val", lo=0.0, hi=11.0, n_buckets=11,
                weight_col="uid",
            ),
            ["grp"], [0.5],
        ).collect()
    }
    for want in (kmv_want, hist_want):
        for row in want:
            frag = f"{row[1]!r}"
            assert frag in out  # every report value surfaced


def test_state_verb_out_materializes_reports(spark, tmp_path, capsys):
    """--state --out writes the finalized report(s) as parquet next to
    printing them: single block writes PATH directly, multiple blocks
    write PATH/<kind>_<value_column>; --out without a report verb
    refuses; the written frame equals the printed one."""
    import textwrap

    src = tmp_path / "src"
    (src / "land").mkdir(parents=True)
    df = _docs(spark)
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [m.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {tmp_path / 'out'}}}
            """
        )
    )
    (tmp_path / "tables" / "m.yaml").write_text(
        textwrap.dedent(
            f"""
            source_table: land
            target_table: t_o
            write_mode: append
            incremental:
              watermark_column: id
              state_path: {tmp_path / 'hwm.json'}
            mappings:
              - {{source: id, target: id}}
              - {{source: grp, target: grp}}
              - {{source: uid, target: uid}}
            state:
              - kind: kmv
                keys: [grp]
                value_column: uid
                k: 8
                state_path: {tmp_path / 'st_kmv'}
              - kind: stats
                keys: [grp]
                value_column: uid
                state_path: {tmp_path / 'st_stats'}
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    df.coalesce(1).write.mode("append").parquet(str(src / "land"))
    assert main(["--config", cfg]) == 0

    dest = str(tmp_path / "reports")
    assert main(["--config", cfg, "--state", "t_o", "--out", dest]) == 0
    out = capsys.readouterr().out
    assert f"state written: {dest}/kmv_uid" in out
    assert f"state written: {dest}/stats_uid" in out
    kmv = spark.read.parquet(f"{dest}/kmv_uid")
    want = A.finalize_kmv(
        A.build_kmv_state(df, ["grp"], "uid", k=8, seed="kmv"), ["grp"]
    )
    assert sorted(map(tuple, kmv.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert spark.read.parquet(f"{dest}/stats_uid").count() == 4

    with pytest.raises(SystemExit, match="only applies to"):
        main(["--config", cfg, "--out", dest])
