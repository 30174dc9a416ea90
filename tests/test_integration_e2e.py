"""Kitchen-sink integration: one YAML job exercising where-pushdown,
transforms, external lookup, quarantine validation, declarative dedup,
and a hive-partitioned sink TOGETHER, driven through runner.main (the
CLI path a real user runs). Feature interactions are the point — each
stage is unit-tested alone elsewhere."""

import textwrap

import pytest

from orion_etl_oracle_to_postgres_spark.runner import main


def test_cli_job_with_all_stages(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    # source: events-like rows; dup ids for dedup; bad codes for quarantine
    rows = [
        # id, code,  nation_key, val
        (1, " aa ", 0, 10.0),
        (1, " aa ", 0, 10.0),   # exact dup of id 1 -> dedup drops one
        (2, "bb",   1, 20.0),
        (3, "??",   0, 30.0),   # regex reject -> quarantine
        (4, "cc",   9, -1.0),   # range reject -> quarantine
        (5, "dd",   2, 50.0),
        (6, "ee",   3, 60.0),   # filtered by where (val >= 60)
    ]
    spark.createDataFrame(
        rows, ["id", "code", "nation_key", "val"]
    ).write.parquet(str(src / "t.parquet"))
    spark.createDataFrame(
        [(0, "ZERO"), (1, "ONE"), (2, "TWO"), (3, "THREE")], ["k", "name"]
    ).write.parquet(str(src / "dim.parquet"))

    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )
    (tmp_path / "tables" / "t.yaml").write_text(
        textwrap.dedent(
            """
            source_table: t
            target_table: t_clean
            quarantine_table: t_rejects
            where: "val < 60"
            dedup: {method: exact, columns: [id], id_column: id}
            partition_by: [nation]
            mappings:
              - source: id
                target: id
              - source: code
                target: code
                transform: strip,upper
                validation:
                  - type: regex
                    pattern: "[A-Z]+"
                    on_fail: quarantine
              - source: val
                target: val
                validation:
                  - type: range
                    pattern: "0-100"
                    on_fail: quarantine
              - source: nation_key
                target: nation
                lookup:
                  table: dim
                  key_column: k
                  value_column: name
                  on_missing: default:UNKNOWN
            """
        )
    )
    rc = main(["--config", str(tmp_path / "config.yaml"), "--master", "local[4]"])
    assert rc == 0

    clean = {r["id"]: r for r in spark.read.parquet(str(out / "t_clean")).collect()}
    # id6 where-filtered; 3,4 quarantined; 1 deduped to one row
    assert sorted(clean) == [1, 2, 5]
    assert clean[1]["code"] == "AA"            # strip+upper ran
    assert clean[1]["nation"] == "ZERO"        # lookup hit
    assert clean[4 if 4 in clean else 5]["nation"] == "TWO"
    # partitioned layout on the looked-up column
    assert (out / "t_clean" / "nation=ZERO").exists()

    rej = {r["id"]: r["_quarantine_rules"] for r in
           spark.read.parquet(str(out / "t_rejects")).collect()}
    assert rej == {3: "regex:code", 4: "range:val"}
    # quarantined row 4 still got its lookup default applied upstream
    rej_rows = {r["id"]: r["nation"] for r in
                spark.read.parquet(str(out / "t_rejects")).collect()}
    assert rej_rows[4] == "UNKNOWN"


def test_csv_and_json_sources_roundtrip(spark, tmp_path):
    from orion_etl_oracle_to_postgres_spark.sources.files import read_file_table
    from orion_etl_oracle_to_postgres_spark.spec import FilesConnectorSpec

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    df.write.option("header", "true").csv(str(tmp_path / "t.csv"))
    df.write.json(str(tmp_path / "t.json"))

    csv_back = read_file_table(
        spark, FilesConnectorSpec(base_path=str(tmp_path), format="csv"), "t"
    )
    json_back = read_file_table(
        spark, FilesConnectorSpec(base_path=str(tmp_path), format="json"), "t"
    )
    assert sorted((r["id"], r["s"]) for r in csv_back.collect()) == [(1, "a"), (2, "b")]
    assert sorted((r["id"], r["s"]) for r in json_back.collect()) == [(1, "a"), (2, "b")]


def test_cli_tables_filter_and_parallel_job(spark, tmp_path):
    """--tables runs only the named subset (unknown names fail loudly);
    table_parallelism>1 runs independent tables concurrently with the
    same results."""
    import textwrap

    import pytest

    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "v"]).write.parquet(
        str(src / "ta.parquet")
    )
    spark.createDataFrame([(3, "x"), (4, "y"), (5, "z")], ["id", "s"]).write.parquet(
        str(src / "tb.parquet")
    )
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [a.yaml, b.yaml]
              table_parallelism: 2
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )
    (tmp_path / "tables" / "a.yaml").write_text(
        "source_table: ta\ntarget_table: out_a\n"
        "mappings:\n  - {source: id, target: id}\n  - {source: v, target: v}\n"
    )
    (tmp_path / "tables" / "b.yaml").write_text(
        "source_table: tb\ntarget_table: out_b\n"
        "mappings:\n  - {source: id, target: id}\n  - {source: s, target: s}\n"
    )
    cfg = str(tmp_path / "config.yaml")
    # full parallel job
    assert main(["--config", cfg]) == 0
    assert spark.read.parquet(str(out / "out_a")).count() == 2
    assert spark.read.parquet(str(out / "out_b")).count() == 3
    # subset: only out_b reruns (delete out_a first to prove it)
    import shutil

    shutil.rmtree(out / "out_a")
    assert main(["--config", cfg, "--tables", "out_b"]) == 0
    assert not (out / "out_a").exists()
    assert spark.read.parquet(str(out / "out_b")).count() == 3
    with pytest.raises(SystemExit, match="no configured table"):
        main(["--config", cfg, "--tables", "nope"])


def test_cli_compact_and_profile_verbs(spark, tmp_path, capsys):
    """--compact rewrites a fragmented target in place; --profile prints
    the column report. Both exit without running the job."""
    import textwrap

    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame([(1, 1.0)], ["id", "v"]).write.parquet(str(src / "t.parquet"))
    # fragmented target: 8 tiny files
    spark.createDataFrame(
        [(i, float(i)) for i in range(80)], ["id", "v"]
    ).repartition(8).write.parquet(str(out / "frag"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )
    (tmp_path / "tables" / "t.yaml").write_text(
        "source_table: t\ntarget_table: t_out\n"
        "mappings:\n  - {source: id, target: id}\n"
    )
    cfg = str(tmp_path / "config.yaml")
    assert main(["--config", cfg, "--compact", "frag"]) == 0
    got = spark.read.parquet(str(out / "frag"))
    assert got.count() == 80
    assert len(got.inputFiles()) < 8  # fewer, bigger files
    assert not (out / "t_out").exists()  # the job itself did NOT run

    assert main(["--config", cfg, "--profile", "frag"]) == 0
    assert "null_frac" in capsys.readouterr().out


def test_cli_reconcile_verb(spark, tmp_path, capsys):
    """--reconcile: after a clean load the summary is all-same (exit 0);
    after tampering with the target it reports the divergence (exit 1)."""
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id int, v double"
    ).write.parquet(str(src / "t.parquet"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )
    (tmp_path / "tables" / "t.yaml").write_text(
        textwrap.dedent(
            """
            source_table: t
            target_table: t_out
            mappings:
              - source: id
                target: id
              - source: v
                target: v
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    assert main(["--config", cfg]) == 0
    assert main(["--config", cfg, "--reconcile", "t_out", "--keys", "id"]) == 0
    outtxt = capsys.readouterr().out
    assert "same: 3" in outtxt

    # tamper: drop a row and change another
    tampered = (
        spark.read.parquet(str(out / "t_out"))
        .filter("id != 3")
        .withColumn("v", F.expr("CASE WHEN id = 1 THEN v + 1 ELSE v END"))
    )
    tampered.write.mode("overwrite").parquet(str(out / "t_out_new"))
    import shutil

    shutil.rmtree(str(out / "t_out"))
    shutil.move(str(out / "t_out_new"), str(out / "t_out"))
    assert main(["--config", cfg, "--reconcile", "t_out", "--keys", "id"]) == 1
    outtxt = capsys.readouterr().out
    assert "changed: 1" in outtxt and "removed: 1" in outtxt


def test_cli_retention_verb(spark, tmp_path, capsys):
    import textwrap

    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame(
        [(i, f"2024-02-{d:02d}") for d in (1, 2, 3) for i in range(4)],
        "id int, day string",
    ).write.parquet(str(src / "ev.parquet"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [ev.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )
    (tmp_path / "tables" / "ev.yaml").write_text(
        textwrap.dedent(
            """
            source_table: ev
            target_table: ev_out
            partition_by: [day]
            mappings:
              - source: id
                target: id
              - source: day
                target: day
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    assert main(["--config", cfg]) == 0
    assert (
        main(
            [
                "--config", cfg, "--retention", "ev_out",
                "--keep-from", "2024-02-02", "--retention-type", "date",
            ]
        )
        == 0
    )
    assert "deleted: 1 kept: 2" in capsys.readouterr().out
    days = {
        str(r["day"])
        for r in spark.read.parquet(str(out / "ev_out")).select("day").distinct().collect()
    }
    assert days == {"2024-02-02", "2024-02-03"}


def test_cli_lineage_verb(spark, tmp_path, capsys):
    import textwrap

    src = tmp_path / "src"
    src.mkdir()
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
            """
        )
    )
    (tmp_path / "tables" / "t.yaml").write_text(
        textwrap.dedent(
            """
            source_table: t
            target_table: t_out
            dedup: {method: exact, columns: [id], id_column: id}
            mappings:
              - source: id
                target: id
              - source: code
                target: code
                transform: strip,upper
                validation:
                  - type: regex
                    pattern: "[A-Z]+"
                    on_fail: skip
              - source: nation_key
                target: nation
                lookup: {table: dim, key_column: k, value_column: name}
            """
        )
    )
    assert main(["--config", str(tmp_path / "config.yaml"), "--lineage"]) == 0
    out = capsys.readouterr().out
    assert "t -> t_out" in out
    assert "code" in out and "transform: strip,upper" in out
    assert "lookup: dim.name on k" in out
    assert "validate: regex on_fail=skip" in out
    assert "dedup: exact" in out


def test_cli_checksum_verb(spark, tmp_path, capsys):
    """--checksum: clean load matches (exit 0); a tampered target
    diverges with the differing buckets printed (exit 1); float columns
    are excluded from the hashed column set."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(40)], "id int, name string, v double"
    ).write.parquet(str(src / "t.parquet"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )
    (tmp_path / "tables" / "t.yaml").write_text(
        textwrap.dedent(
            """
            source_table: t
            target_table: t_out
            mappings:
              - source: id
                target: id
              - source: name
                target: name
              - source: v
                target: v
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    assert main(["--config", cfg]) == 0
    assert main(["--config", cfg, "--checksum", "t_out"]) == 0
    assert "OK (0 buckets differ)" in capsys.readouterr().out

    # tamper one string value -> exactly the affected bucket diverges
    import shutil

    from pyspark.sql import functions as F

    tampered = spark.read.parquet(str(out / "t_out")).withColumn(
        "name", F.expr("CASE WHEN id = 7 THEN 'TAMPERED' ELSE name END")
    )
    tampered.write.mode("overwrite").parquet(str(out / "t_out_new"))
    shutil.rmtree(str(out / "t_out"))
    shutil.move(str(out / "t_out_new"), str(out / "t_out"))
    assert main(["--config", cfg, "--checksum", "t_out"]) == 1
    outtxt = capsys.readouterr().out
    assert "DIVERGED" in outtxt and "bucket " in outtxt


def test_cli_expect_verb(spark, tmp_path, capsys):
    """--expect: standalone data-contract dry run — report printed, exit
    0 when all checks pass, 1 when any fails, no write happens."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "id int, v double"
    ).write.parquet(str(src / "t.parquet"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )

    def table_yaml(max_null_frac):
        (tmp_path / "tables" / "t.yaml").write_text(
            textwrap.dedent(
                f"""
                source_table: t
                target_table: t_out
                mappings:
                  - source: id
                    target: id
                  - source: v
                    target: v
                expectations:
                  - type: row_count
                    min: 1
                  - type: not_null
                    columns: [v]
                    max_null_frac: {max_null_frac}
                """
            )
        )

    cfg = str(tmp_path / "config.yaml")
    table_yaml(0.5)
    assert main(["--config", cfg, "--expect", "t_out"]) == 0
    assert "2/2 passed" in capsys.readouterr().out
    # nothing was written by the dry run
    assert not (out / "t_out").exists()
    table_yaml(0.0)
    assert main(["--config", cfg, "--expect", "t_out"]) == 1
    got = capsys.readouterr().out
    assert "FAIL" in got and "1/2 passed" in got


def test_cli_layout_verb(spark, tmp_path, capsys):
    """--layout: prints the small-file report JSON for a files target."""
    import json

    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame([(1, 1.0)], "id int, v double").write.parquet(
        str(src / "t.parquet")
    )
    spark.range(0, 100).repartition(4).write.parquet(str(out / "frag"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )
    (tmp_path / "tables" / "t.yaml").write_text(
        textwrap.dedent(
            """
            source_table: t
            target_table: t_out
            mappings:
              - source: id
                target: id
            """
        )
    )
    assert main(["--config", str(tmp_path / "config.yaml"), "--layout", "frag"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_files"] == 4 and rep["small_frac"] == 1.0


def test_cli_drift_verb(spark, tmp_path, capsys):
    """--drift: distribution sign-off — a freshly-loaded target is
    drift-free (exit 0); a value-shifted target trips the PSI bar
    (exit 1) even though row counts still match."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    rows = [(i, float((i * 13) % 97)) for i in range(300)]
    spark.createDataFrame(rows, "id int, v double").write.parquet(
        str(src / "t.parquet")
    )
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )
    (tmp_path / "tables" / "t.yaml").write_text(
        textwrap.dedent(
            """
            source_table: t
            target_table: t_out
            mappings:
              - source: id
                target: id
              - source: v
                target: v
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    assert main(["--config", cfg]) == 0
    assert main(["--config", cfg, "--drift", "t_out", "--columns", "v"]) == 0
    assert "OK" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="not present on both sides"):
        main(["--config", cfg, "--drift", "t_out", "--columns", "missing"])

    # shift the target distribution (same row count) -> PSI trips
    import shutil

    from pyspark.sql import functions as F

    shifted = spark.read.parquet(str(out / "t_out")).withColumn(
        "v", F.col("v") * 3 + 500
    )
    shifted.write.mode("overwrite").parquet(str(out / "t_out_new"))
    shutil.rmtree(str(out / "t_out"))
    shutil.move(str(out / "t_out_new"), str(out / "t_out"))
    assert main(["--config", cfg, "--drift", "t_out", "--columns", "v"]) == 1
    outtxt = capsys.readouterr().out
    assert "DRIFT" in outtxt and "psi=" in outtxt
    # the order-statistics view rides along: a 3x+500 shift moves the
    # median by ~its magnitude and the L-inf bucket distance is large
    import re

    p50d = float(re.search(r"p50d=([0-9.]+)", outtxt).group(1))
    linf = float(re.search(r"linf=([0-9.]+)", outtxt).group(1))
    assert p50d > 100 and linf > 0.05


def test_cli_lineage_covers_round6_stages(spark, tmp_path, capsys):
    """The static --lineage report names the decontaminate / gopher-gate
    / augment stages, and the YAML dialect round-trips their blocks."""
    import textwrap

    src = tmp_path / "src"
    src.mkdir()
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
            """
        )
    )
    (tmp_path / "tables" / "t.yaml").write_text(
        textwrap.dedent(
            """
            source_table: docs
            target_table: docs_out
            mappings:
              - source: id
                target: id
              - source: body
                target: body
            decontaminate:
              benchmark_table: bench
              text_column: body
              id_column: id
              ngram: 13
            quality_filter: {text_column: body, method: gopher}
            augment:
              text_column: body
              id_column: id
              span_tokens: 3
            """
        )
    )
    from orion_etl_oracle_to_postgres_spark.runner import main

    assert main(["--config", str(tmp_path / "config.yaml"), "--lineage"]) == 0
    out = capsys.readouterr().out
    assert "decontaminate: 13-grams vs bench" in out
    assert "quality gate: gopher" in out
    assert "augment: span_corruption -> columns 'input_text'/'target_text'" in out


def test_cli_diff_verb(spark, tmp_path, capsys):
    """--diff: clean load is multiset-identical (exit 0); a tampered
    target prints BOTH versions of the differing row with per-side
    counts (exit 1) — the drill-down complement of --checksum's
    bucket-only report."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(40)], "id int, name string"
    ).write.parquet(str(src / "t.parquet"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {out}}}
            """
        )
    )
    (tmp_path / "tables" / "t.yaml").write_text(
        textwrap.dedent(
            """
            source_table: t
            target_table: t_out
            mappings:
              - source: id
                target: id
              - source: name
                target: name
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    assert main(["--config", cfg]) == 0
    assert main(["--config", cfg, "--diff", "t_out"]) == 0
    assert "diff: OK" in capsys.readouterr().out

    import shutil

    from pyspark.sql import functions as F

    tampered = spark.read.parquet(str(out / "t_out")).withColumn(
        "name", F.expr("CASE WHEN id = 7 THEN 'TAMPERED' ELSE name END")
    )
    tampered.write.mode("overwrite").parquet(str(out / "t_out_new"))
    shutil.rmtree(str(out / "t_out"))
    shutil.move(str(out / "t_out_new"), str(out / "t_out"))
    assert main(["--config", cfg, "--diff", "t_out"]) == 1
    outtxt = capsys.readouterr().out
    assert "DIVERGED" in outtxt
    assert "'n7'" in outtxt and "'TAMPERED'" in outtxt
    assert "pipeline×1 target×0" in outtxt and "pipeline×0 target×1" in outtxt


def test_cli_freqcap_verb(spark, tmp_path, capsys):
    """--freqcap: prints the per-drained-batch frequency-cap report of
    a `frequency_cap:` streaming table; a table without the block is
    refused loudly."""
    import textwrap as _tw

    src = tmp_path / "src"
    (src / "land").mkdir(parents=True)
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, key string"
    ).coalesce(1).write.mode("append").parquet(str(src / "land"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        _tw.dedent(
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
        _tw.dedent(
            f"""
            source_table: land
            target_table: t_cap
            write_mode: append
            incremental:
              watermark_column: id
              mode: streaming
              state_path: {tmp_path / 'state'}
            mappings:
              - {{source: id, target: id}}
              - {{source: key, target: key}}
            frequency_cap:
              key_column: key
              cap: 2
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    assert main(["--config", cfg]) == 0          # drain batch 0
    assert main(["--config", cfg, "--freqcap", "t_cap"]) == 0
    out = capsys.readouterr().out
    assert "batch 0: rows=3 keys=2 over_cap=0 under_cap=2" in out
    assert "cap=2" in out

    # a table without the block refuses
    (tmp_path / "tables" / "s.yaml").write_text(
        _tw.dedent(
            """
            source_table: land
            target_table: t_cap
            mappings:
              - {source: id, target: id}
            """
        )
    )
    import pytest as _pt

    with _pt.raises(SystemExit, match="declares no"):
        main(["--config", cfg, "--freqcap", "t_cap"])


def test_cli_sightings_verb(spark, tmp_path, capsys):
    """--sightings: prints the per-drained-batch first-sighting report;
    a table without the block is refused loudly."""
    import textwrap as _tw

    src = tmp_path / "src"
    (src / "land").mkdir(parents=True)
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, key string"
    ).coalesce(1).write.mode("append").parquet(str(src / "land"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        _tw.dedent(
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
        _tw.dedent(
            f"""
            source_table: land
            target_table: t_fs
            write_mode: append
            incremental:
              watermark_column: id
              mode: streaming
              state_path: {tmp_path / 'state'}
            mappings:
              - {{source: id, target: id}}
              - {{source: key, target: key}}
            first_sighting:
              key_column: key
              m_bits: 1024
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    assert main(["--config", cfg]) == 0
    assert main(["--config", cfg, "--sightings", "t_fs"]) == 0
    out = capsys.readouterr().out
    assert "batch 0: rows=2 definite_new=2 maybe_seen=0" in out

    (tmp_path / "tables" / "s.yaml").write_text(
        _tw.dedent(
            """
            source_table: land
            target_table: t_fs
            mappings:
              - {source: id, target: id}
            """
        )
    )
    import pytest as _pt

    with _pt.raises(SystemExit, match="declares no"):
        main(["--config", cfg, "--sightings", "t_fs"])


def test_cli_panel_verb(spark, tmp_path, capsys):
    """--panel: prints the folded current eval panel of a
    `sample_panel:` streaming table; refused without the block; the
    friendly empty-state error fires before any drain."""
    import textwrap as _tw

    src = tmp_path / "src"
    (src / "land").mkdir(parents=True)
    spark.createDataFrame(
        [(i, "en") for i in range(6)], "id long, grp string"
    ).coalesce(1).write.mode("append").parquet(str(src / "land"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        _tw.dedent(
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
        _tw.dedent(
            f"""
            source_table: land
            target_table: t_p
            write_mode: append
            incremental:
              watermark_column: id
              mode: streaming
              state_path: {tmp_path / 'state'}
            mappings:
              - {{source: id, target: id}}
              - {{source: grp, target: grp}}
            sample_panel:
              group_columns: [grp]
              id_column: id
              k: 3
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    import pytest as _pt

    # before any drain: friendly empty-state error, not a raw
    # AnalysisException
    with _pt.raises(SystemExit, match="no drained batches recorded yet"):
        main(["--config", cfg, "--panel", "t_p"])
    assert main(["--config", cfg]) == 0
    assert main(["--config", cfg, "--panel", "t_p"]) == 0
    out = capsys.readouterr().out
    assert "panel: 3 members" in out and "grp='en' #1:" in out


def test_cli_budget_verb(spark, tmp_path, capsys):
    """--budget: per-group admitted totals with open/CLOSED status;
    friendly empty-state error before any drain; refused without the
    block."""
    import textwrap as _tw

    src = tmp_path / "src"
    (src / "land").mkdir(parents=True)
    spark.createDataFrame(
        [(1, "a", 80), (2, "b", 10)], "id long, dom string, toks long"
    ).coalesce(1).write.mode("append").parquet(str(src / "land"))
    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        _tw.dedent(
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
        _tw.dedent(
            f"""
            source_table: land
            target_table: t_b
            write_mode: append
            incremental:
              watermark_column: id
              mode: streaming
              state_path: {tmp_path / 'state'}
            mappings:
              - {{source: id, target: id}}
              - {{source: dom, target: dom}}
              - {{source: toks, target: toks}}
            token_budget:
              group_columns: [dom]
              weight_column: toks
              budget: 50
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    import pytest as _pt

    with _pt.raises(SystemExit, match="no drained batches recorded yet"):
        main(["--config", cfg, "--budget", "t_b"])
    assert main(["--config", cfg]) == 0
    assert main(["--config", cfg, "--budget", "t_b"]) == 0
    out = capsys.readouterr().out
    assert "dom='a': 80/50 CLOSED" in out
    assert "dom='b': 10/50 open" in out


def test_cli_overlap_verb(spark, tmp_path, capsys):
    """--overlap: all-pairs segment overlap / containment from a
    persisted KMV state, sketch-space only; a floor > 0 flips the exit
    code into a disjointness sign-off; friendly errors for a missing
    path, a non-KMV parquet, and a multi-key state."""
    import textwrap as _tw

    from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
        build_kmv_state,
    )

    (tmp_path / "tables").mkdir()
    (tmp_path / "config.yaml").write_text(
        _tw.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: []
              connectors:
                source_files: {{base_path: {tmp_path}}}
                target_files: {{base_path: {tmp_path / 'out'}}}
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")

    # a ⊃-ish b (5 of 15 union shared), c disjoint — k far above the
    # cardinalities so every estimate sits on the exact branch
    rows = (
        [("a", v) for v in range(1, 11)]
        + [("b", v) for v in range(6, 16)]
        + [("c", v) for v in range(100, 106)]
    )
    df = spark.createDataFrame(rows, "seg string, uid long")
    state_path = str(tmp_path / "kmv_state")
    build_kmv_state(df, ["seg"], "uid", k=64).write.parquet(state_path)

    with pytest.raises(SystemExit, match="no KMV state at"):
        main(["--config", cfg, "--overlap", str(tmp_path / "nowhere")])

    assert main(["--config", cfg, "--overlap", state_path]) == 0
    out = capsys.readouterr().out
    assert "'a' ~ 'b': union=15 intersect=5 jaccard=0.333333" in out
    assert "contain_g1=0.5 contain_g2=0.5" in out
    assert "c" not in [ln.split("'")[1] for ln in out.splitlines() if ln.startswith("'")]
    assert "overlap: 1 pairs at jaccard floor 0" in out

    # floor above the pair's jaccard: nothing prints, DISJOINT, exit 0
    assert main(
        ["--config", cfg, "--overlap", state_path, "--jaccard-floor", "0.5"]
    ) == 0
    assert "overlap: DISJOINT" in capsys.readouterr().out
    # floor below it: the sign-off FAILS (exit 1)
    assert main(
        ["--config", cfg, "--overlap", state_path, "--jaccard-floor", "0.2"]
    ) == 1

    with pytest.raises(SystemExit, match="jaccard-floor must be in"):
        main(["--config", cfg, "--overlap", state_path, "--jaccard-floor", "2"])

    # not a KMV state: friendly shape error
    bad = str(tmp_path / "plain")
    df.write.parquet(bad)
    with pytest.raises(SystemExit, match="not a KMV state"):
        main(["--config", cfg, "--overlap", bad])

    # multi-key state: refuse with the rebuild hint
    multi = str(tmp_path / "multi")
    build_kmv_state(
        df.withColumn("day", df.uid % 2), ["seg", "day"], "uid", k=64
    ).write.parquet(multi)
    with pytest.raises(SystemExit, match="exactly ONE group column"):
        main(["--config", cfg, "--overlap", multi])


def test_cli_overlap_verb_resolves_table_state_block(spark, tmp_path, capsys):
    """--overlap also accepts a job TABLE name whose state: block
    maintains a KMV state — it folds that table's nightly increments
    from the default state dir (UX parity with the other monitor
    verbs); a table without a kmv state block refuses friendly."""
    import textwrap as _tw

    from orion_etl_oracle_to_postgres_spark.operators.statemaint import (
        write_state_increment,
    )
    from orion_etl_oracle_to_postgres_spark.spec import AggStateSpec

    (tmp_path / "tables").mkdir()
    state_dir = tmp_path / "segstate"
    (tmp_path / "tables" / "seg.yaml").write_text(
        _tw.dedent(
            f"""
            source_table: seg_src
            target_table: seg_out
            write_mode: append
            incremental:
              watermark_column: uid
              state_path: {tmp_path / 'hwm.json'}
            mappings:
              - {{source: seg, target: seg}}
              - {{source: uid, target: uid}}
            state:
              kind: kmv
              keys: [seg]
              value_column: uid
              k: 64
              state_path: {state_dir}
            """
        )
    )
    (tmp_path / "tables" / "plain.yaml").write_text(
        "source_table: p_src\ntarget_table: p_out\n"
        "mappings:\n  - {source: a, target: a}\n"
    )
    (tmp_path / "config.yaml").write_text(
        _tw.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [seg.yaml, plain.yaml]
              connectors:
                source_files: {{base_path: {tmp_path}}}
                target_files: {{base_path: {tmp_path / 'out'}}}
            """
        )
    )
    cfg = str(tmp_path / "config.yaml")
    st = AggStateSpec(
        kind="kmv", keys=["seg"], value_column="uid", k=64,
        state_path=str(state_dir),
    )
    rows = (
        [("a", v) for v in range(1, 11)]
        + [("b", v) for v in range(6, 16)]
    )
    df = spark.createDataFrame(rows, "seg string, uid long")
    # two "nights" of increments under the table's declared state dir
    write_state_increment(df.where("uid < 9"), st, str(state_dir), "n1")
    write_state_increment(df.where("uid >= 9"), st, str(state_dir), "n2")

    assert main(["--config", cfg, "--overlap", "seg_out"]) == 0
    out = capsys.readouterr().out
    assert "'a' ~ 'b': union=15 intersect=5 jaccard=0.333333" in out

    # a table without a kmv state block refuses with the hint
    with pytest.raises(SystemExit, match="declares no"):
        main(["--config", cfg, "--overlap", "p_out"])
    # a stream's batch_id=-layout state path works too (the other
    # documented increment layout — batch_id is provenance, not a key)
    from orion_etl_oracle_to_postgres_spark.streaming.kmv_monitor import (
        kmv_increment_writer,
    )

    stream_state = str(tmp_path / "streamstate")
    w = kmv_increment_writer(["seg"], "uid", k=64, state_path=stream_state)
    w(df.where("uid < 9"), 0)
    w(df.where("uid >= 9"), 1)
    assert main(["--config", cfg, "--overlap", stream_state]) == 0
    assert (
        "'a' ~ 'b': union=15 intersect=5 jaccard=0.333333"
        in capsys.readouterr().out
    )

    # a kmv table whose increments never landed gets the friendly
    # empty-state error, naming the resolved dir
    import shutil

    shutil.rmtree(state_dir)
    with pytest.raises(SystemExit, match="no KMV state at"):
        main(["--config", cfg, "--overlap", "seg_out"])
