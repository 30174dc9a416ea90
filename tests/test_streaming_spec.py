"""Declarative ``incremental.mode: streaming`` — the config-driven
streaming ETL the reference README claims but never shipped (SURVEY.md
§1.1 'Stream'). Each run_job call drains the files that landed since
the last run through the compiled plan (availableNow trigger +
file-source checkpoint), appending to the target exactly once."""

from __future__ import annotations

import pytest

import orion_etl_oracle_to_postgres_spark.spec as spec_mod
from orion_etl_oracle_to_postgres_spark.compiler import JobContext, run_job, run_table


def _global(src, out):
    return spec_mod.GlobalSpec(
        connectors=spec_mod.ConnectorsSpec(
            source_files=spec_mod.FilesConnectorSpec(base_path=str(src)),
            target_files=spec_mod.FilesConnectorSpec(base_path=str(out)),
        )
    )


def _spec(state_dir, **kw):
    return spec_mod.TableSpec(
        source_table="land",
        target_table="t_stream",
        write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="ts", mode="streaming", state_path=str(state_dir)
        ),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="name", target="name", transform="strip,upper"),
            spec_mod.MappingSpec(source="val", target="val"),
        ],
        **kw,
    )


def test_streaming_spec_drains_increments_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    out = tmp_path / "out"

    import datetime as dt

    def feed(rows):
        rows = [(i, dt.datetime.fromisoformat(t), n, v) for i, t, n, v in rows]
        spark.createDataFrame(rows, "id long, ts timestamp, name string, val double") \
            .coalesce(1).write.mode("append").parquet(str(land))

    feed([(1, "2024-01-01 00:00:00", " a ", 1.0), (2, "2024-01-01 00:01:00", "b", 2.0)])
    job = spec_mod.JobSpec(
        global_spec=_global(src, out), tables=[_spec(tmp_path / "state")]
    )
    res1 = run_job(spark, job)
    assert res1 == {"t_stream": 2}
    got1 = {r["id"]: r["name"] for r in spark.read.parquet(str(out / "t_stream")).collect()}
    assert got1 == {1: "A", 2: "B"}

    # second drain with NO new files: zero rows, no duplicates
    res2 = run_job(spark, job)
    assert res2 == {"t_stream": 0}
    assert spark.read.parquet(str(out / "t_stream")).count() == 2

    # new file lands -> only the increment flows
    feed([(3, "2024-01-01 00:02:00", "c", 3.0)])
    res3 = run_job(spark, job)
    assert res3 == {"t_stream": 1}
    got3 = {r["id"] for r in spark.read.parquet(str(out / "t_stream")).collect()}
    assert got3 == {1, 2, 3}


def test_streaming_spec_rejects_unsupported_stages(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    import datetime as dt

    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "a", 1.0)],
        "id long, ts timestamp, name string, val double",
    ).write.parquet(str(src / "land"))
    out = tmp_path / "out"
    ctx = JobContext(spark=spark, global_spec=_global(src, out))

    bad_dedup = _spec(
        tmp_path / "s1",
        dedup=spec_mod.DedupSpec(method="exact"),  # no key columns
    )
    with pytest.raises(ValueError, match="key columns"):
        run_table(ctx, bad_dedup)

    bad_mode = _spec(tmp_path / "s2")
    bad_mode.write_mode = "overwrite"
    with pytest.raises(ValueError, match="append"):
        run_table(ctx, bad_mode)

    bad_val = _spec(tmp_path / "s3")
    bad_val.mappings[2].validation = [
        spec_mod.ValidationSpec(type="range", pattern="0-10", on_fail="quarantine")
    ]
    with pytest.raises(ValueError, match="quarantine"):
        run_table(ctx, bad_val)


def test_streaming_spec_rejects_failfast_lookup_and_validation(spark, tmp_path):
    """Fail-fast semantics can't run on a stream: the default lookup
    on_missing=error and any non-filter validation policy must be
    REFUSED, not silently downgraded to write-NULL (review r4 #3)."""
    import datetime as dt

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "a", 1.0)],
        "id long, ts timestamp, name string, val double",
    ).write.parquet(str(src / "land"))
    spark.createDataFrame([(1, "X")], ["k", "v"]).write.parquet(str(src / "dim"))
    ctx = JobContext(spark=spark, global_spec=_global(src, tmp_path / "out"))

    with_lookup = _spec(tmp_path / "s4")
    with_lookup.mappings[0].lookup = spec_mod.LookupSpec(
        table="dim", key_column="k", value_column="v"
    )
    with pytest.raises(ValueError, match="on_missing=error"):
        run_table(ctx, with_lookup)

    # explicit streamable policy compiles
    with_lookup2 = _spec(tmp_path / "s5")
    with_lookup2.mappings[0].lookup = spec_mod.LookupSpec(
        table="dim", key_column="k", value_column="v", on_missing="default:NONE"
    )
    run_table(ctx, with_lookup2)

    bad_abort = _spec(tmp_path / "s6")
    bad_abort.mappings[2].validation = [
        spec_mod.ValidationSpec(type="range", pattern="0-10", on_fail="abort")
    ]
    with pytest.raises(ValueError, match="abort"):
        run_table(ctx, bad_abort)


def test_streaming_backpressure_bounds_micro_batches(spark, tmp_path):
    """max_files_per_trigger splits a backlog into bounded micro-batches
    — the ledger records one entry per batch, results identical."""
    import datetime as dt
    import json

    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    for i in range(4):  # 4 separate files land before the first drain
        spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1, 0, i), f"n{i}", float(i))],
            "id long, ts timestamp, name string, val double",
        ).coalesce(1).write.mode("append").parquet(str(land))
    state = tmp_path / "state"
    t = _spec(state)
    t.incremental.max_files_per_trigger = 1
    ctx = JobContext(spark=spark, global_spec=_global(src, tmp_path / "out"))
    run_table(ctx, t)
    assert ctx.stream_counts["t_stream"] == 4
    out = spark.read.parquet(str(tmp_path / "out" / "t_stream"))
    assert out.count() == 4
    ledger = [
        json.loads(line)
        for line in (state / "ledger.jsonl").read_text().splitlines()
    ]
    assert len(ledger) >= 4  # one bounded micro-batch per file (not one giant)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dedup in streaming mode compiles to watermarked streaming dedup:
    re-delivered keys inside the horizon are dropped across drains;
    minhash refuses."""
    import datetime as dt

    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)

    def feed(rows):
        spark.createDataFrame(
            rows, "id long, ts timestamp, name string, val double"
        ).coalesce(1).write.mode("append").parquet(str(land))

    t0 = dt.datetime(2024, 1, 1)
    feed([(1, t0, "a", 1.0), (2, t0, "b", 2.0)])
    t = _spec(tmp_path / "state")
    t.dedup = spec_mod.DedupSpec(method="exact", columns=["id"])
    ctx = JobContext(spark=spark, global_spec=_global(src, tmp_path / "out"))
    run_table(ctx, t)
    # same ids re-land inside the horizon + one new id
    feed([(1, t0 + dt.timedelta(minutes=1), "a2", 9.0), (3, t0 + dt.timedelta(minutes=1), "c", 3.0)])
    run_table(ctx, t)
    got = spark.read.parquet(str(tmp_path / "out" / "t_stream"))
    ids = sorted(r["id"] for r in got.collect())
    assert ids == [1, 2, 3]  # the re-delivery of id 1 was dropped

    bad = _spec(tmp_path / "s_mh")
    bad.dedup = spec_mod.DedupSpec(method="minhash", text_column="name", id_column="id")
    with pytest.raises(ValueError, match="batch-only"):
        run_table(ctx, bad)


def test_streaming_fingerprint_dedup_null_passthrough_and_column_safety(spark, tmp_path):
    """NULL-text rows all pass through streaming fingerprint dedup (the
    batch contract — NULL keys must never collapse as duplicates of
    each other), and a real source column named 'fingerprint' survives."""
    import datetime as dt

    src = tmp_path / "src"
    land = src / "land"
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (1, t0, "same text", 1.0, "FP1"),
            (2, t0, "same  TEXT", 2.0, "FP2"),  # normalized dup of 1
            (3, t0, None, 3.0, "FP3"),
            (4, t0, None, 4.0, "FP4"),          # both NULLs must survive
        ],
        "id long, ts timestamp, name string, val double, fingerprint string",
    ).coalesce(1).write.parquet(str(land))
    t = spec_mod.TableSpec(
        source_table="land",
        target_table="t_fp",
        write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="ts", mode="streaming",
            state_path=str(tmp_path / "state"),
        ),
        dedup=spec_mod.DedupSpec(method="fingerprint", text_column="name"),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="fingerprint", target="fingerprint"),
        ],
    )
    ctx = JobContext(spark=spark, global_spec=_global(src, tmp_path / "out"))
    run_table(ctx, t)
    got = {r["id"]: r["fingerprint"] for r in spark.read.parquet(
        str(tmp_path / "out" / "t_fp")).collect()}
    assert set(got) & {1, 2} and len(set(got) & {1, 2}) == 1  # one survivor
    assert {3, 4} <= set(got)                                  # NULLs pass
    assert got[3] == "FP3" and got[4] == "FP4"                 # column intact


def test_batch_lineage_plus_fullrow_distinct_refused(spark, tmp_path):
    src = tmp_path / "src"
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.parquet(str(src / "t.parquet"))
    ctx = JobContext(spark=spark, global_spec=_global(src, tmp_path / "out"))
    t = spec_mod.TableSpec(
        source_table="t",
        target_table="t_d",
        lineage=True,
        dedup=spec_mod.DedupSpec(method="exact"),
        mappings=[spec_mod.MappingSpec(source="id", target="id")],
    )
    with pytest.raises(ValueError, match="full-row DISTINCT"):
        run_table(ctx, t)


def test_streaming_refuses_top_fraction_and_span_rewrite(spark, tmp_path):
    """Window-over-group and corpus-wide stages must be refused loudly
    in streaming mode, not fail at runtime with a planner error."""
    import pytest as _pt

    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        IncrementalSpec,
        MappingSpec,
        QualityFilterSpec,
        RewriteSpec,
        TableSpec,
    )

    src = tmp_path / "ss"
    spark.createDataFrame(
        [(1, "text here", "a")], "id long, body string, grp string"
    ).write.parquet(str(src / "t.parquet"))
    ctx = JobContext(
        spark,
        GlobalSpec(
            connectors=ConnectorsSpec(
                source_files=FilesConnectorSpec(base_path=str(src))
            )
        ),
    )

    def mk(**kw):
        return TableSpec(
            source_table="t",
            target_table="t2",
            mappings=[
                MappingSpec(source="id", target="id"),
                MappingSpec(source="body", target="body"),
                MappingSpec(source="grp", target="grp"),
            ],
            incremental=IncrementalSpec(watermark_column="id", mode="streaming"),
            **kw,
        )

    with _pt.raises(ValueError, match="top_fraction"):
        compile_table(ctx, mk(quality_filter=QualityFilterSpec(
            text_column="body", top_fraction=0.5,
            id_column="id", group_column="grp",
        )))
    with _pt.raises(ValueError, match="repeated_spans"):
        compile_table(ctx, mk(rewrite=RewriteSpec(
            text_column="body", method="repeated_spans", id_column="id",
        )))


def test_streaming_gopher_gate_matches_batch(spark, tmp_path):
    """quality_filter method=gopher is a pure projection, so it streams;
    each micro-batch keeps exactly the rows the batch gate would."""
    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    out = tmp_path / "out"

    good = ("the data and that have with a filter "
            "scan merge join scan merge join scan merge join")
    bad = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    spark.createDataFrame(
        [(1, good), (2, bad)], "id long, body string"
    ).coalesce(1).write.mode("append").parquet(str(land))

    t = spec_mod.TableSpec(
        source_table="land",
        target_table="t_gated",
        write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming",
            state_path=str(tmp_path / "state"),
        ),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="body", target="body"),
        ],
        quality_filter=spec_mod.QualityFilterSpec(
            text_column="body", method="gopher"
        ),
    )
    job = spec_mod.JobSpec(global_spec=_global(src, out), tables=[t])
    assert run_job(spark, job) == {"t_gated": 1}
    assert [r["id"] for r in spark.read.parquet(str(out / "t_gated")).collect()] == [1]

    # reject_table still refused on streams (needs a second eager write)
    with pytest.raises(ValueError, match="reject_table"):
        run_job(
            spark,
            spec_mod.JobSpec(
                global_spec=_global(src, out),
                tables=[
                    t.model_copy(
                        update={
                            "quality_filter": spec_mod.QualityFilterSpec(
                                text_column="body",
                                method="gopher",
                                reject_table="rej",
                            ),
                            "target_table": "t2",
                        }
                    )
                ],
            ),
        )


def test_streaming_frequency_cap_routes_and_matches_batch_twin(spark, tmp_path):
    """`frequency_cap:` on a streaming table: keys whose RUNNING
    ingested frequency reached the cap stop flowing to the target from
    the next micro-batch on (cross-batch verdicts — within-batch
    repeats all estimate against the pre-batch state); the maybe-over
    sliver routes to overflow_table (strict exact-check routing); NULL
    keys always pass; the folded state is cell-identical to one batch
    build over everything ingested (the monitor parity, through the
    declarative path)."""
    from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
        build_cms_state,
    )
    from orion_etl_oracle_to_postgres_spark.streaming.cms_monitor import (
        folded_cms_state,
        frequency_cap_report,
    )

    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    out = tmp_path / "out"
    state = tmp_path / "state"

    def feed(rows):
        spark.createDataFrame(rows, "id long, key string").coalesce(
            1
        ).write.mode("append").parquet(str(land))

    t = spec_mod.TableSpec(
        source_table="land",
        target_table="t_capped",
        write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming", state_path=str(state)
        ),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="key", target="key"),
        ],
        frequency_cap=spec_mod.FrequencyCapSpec(
            key_column="key", cap=2, width=1 << 10, depth=4,
            overflow_table="t_overflow",
        ),
    )
    job = spec_mod.JobSpec(global_spec=_global(src, out), tables=[t])

    # batch 0: 'a' twice (within-batch repeats judge against the EMPTY
    # prior state -> both kept), 'b' once, one NULL key (always kept)
    feed([(1, "a"), (2, "a"), (3, "b"), (4, None)])
    assert run_job(spark, job) == {"t_capped": 4}

    # batch 1: 'a' has prior ingested count 2 >= cap=2 -> routed to
    # overflow; 'b' sits at 1 < cap -> kept; 'c' is new -> kept
    feed([(5, "a"), (6, "b"), (7, "c")])
    assert run_job(spark, job) == {"t_capped": 2}
    kept = spark.read.parquet(str(out / "t_capped"))
    assert sorted(r["id"] for r in kept.collect()) == [1, 2, 3, 4, 6, 7]
    over = spark.read.parquet(str(out / "t_overflow"))
    assert [r["id"] for r in over.collect()] == [5]

    # batch 2: now 'b' (2) and 'c' (1)... 'b' over, 'c' still under;
    # NULL keys keep passing no matter how many were ingested
    feed([(8, "b"), (9, "c"), (10, None)])
    assert run_job(spark, job) == {"t_capped": 2}
    assert sorted(
        r["id"] for r in spark.read.parquet(str(out / "t_capped")).collect()
    ) == [1, 2, 3, 4, 6, 7, 9, 10]
    assert sorted(
        r["id"] for r in spark.read.parquet(str(out / "t_overflow")).collect()
    ) == [5, 8]

    # per-drain reports landed
    rep = frequency_cap_report(spark, str(state / "freqcap_report"))
    assert rep.count() == 3

    # monitor parity through the declarative path: folded state ==
    # one-shot batch build over ALL ingested rows (over-cap included)
    all_rows = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("a",), ("b",), ("c",), ("b",), ("c",)],
        "key string",
    )
    cells = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("row_idx", "col_idx", "cnt").collect())
    )
    assert cells(folded_cms_state(spark, str(state / "freqcap_state"))) == cells(
        build_cms_state(all_rows, "key", width=1 << 10, depth=4, seed="cms")
    )


def test_streaming_frequency_cap_contracts(spark, tmp_path):
    """Parse/compile contracts: batch tables refuse the block, layout
    knobs validate at spec load (the sibling-knob rule), and a typo'd
    key_column fails with the friendly pre-drain error."""
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, "a")], "id long, key string").write.parquet(
        str(src / "land")
    )
    out = tmp_path / "out"
    fc = spec_mod.FrequencyCapSpec(key_column="key", cap=1)

    # batch mode (no incremental at all) refuses at spec load
    with pytest.raises(ValueError, match="requires incremental.mode: streaming"):
        spec_mod.TableSpec(
            source_table="land", target_table="t",
            mappings=[spec_mod.MappingSpec(source="id", target="id")],
            frequency_cap=fc,
        )
    # incremental but non-streaming refuses too
    with pytest.raises(ValueError, match="requires incremental.mode: streaming"):
        spec_mod.TableSpec(
            source_table="land", target_table="t",
            incremental=spec_mod.IncrementalSpec(watermark_column="id"),
            mappings=[spec_mod.MappingSpec(source="id", target="id")],
            frequency_cap=fc,
        )
    # layout knobs mirror _cms_validate at parse time
    with pytest.raises(ValueError, match="power of two"):
        spec_mod.FrequencyCapSpec(key_column="key", width=100)
    with pytest.raises(ValueError, match=r"depth must be in \[1, 8\]"):
        spec_mod.FrequencyCapSpec(key_column="key", depth=9)
    with pytest.raises(ValueError, match="collected-probe cap"):
        spec_mod.FrequencyCapSpec(key_column="key", width=1 << 16, depth=8)
    with pytest.raises(Exception, match="cap"):
        spec_mod.FrequencyCapSpec(key_column="key", cap=0)

    # typo'd key_column: friendly error BEFORE the drain starts
    t = spec_mod.TableSpec(
        source_table="land", target_table="t_cap2", write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming",
            state_path=str(tmp_path / "s2"),
        ),
        mappings=[spec_mod.MappingSpec(source="id", target="id")],
        frequency_cap=spec_mod.FrequencyCapSpec(key_column="key", cap=1),
    )
    ctx = JobContext(spark=spark, global_spec=_global(src, out))
    with pytest.raises(ValueError, match="'key' not in pipeline output"):
        run_table(ctx, t)


def test_streaming_refuses_nb_and_ccnet_gates(spark, tmp_path):
    """VERDICT r10 ask #7: the nb refusal (eager model mounts + token
    aggregation + verdict join-back) and the ccnet refusal (fires via
    the spec-pinned top_fraction rule) must each be EXPLICITLY tested
    on `mode: streaming`, like the other batch-only methods."""
    from orion_etl_oracle_to_postgres_spark.compiler import compile_table

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, "some body text", "g")], "id long, body string, grp string"
    ).write.parquet(str(src / "land"))
    ctx = JobContext(
        spark=spark, global_spec=_global(src, tmp_path / "out")
    )

    def mk(qf):
        return spec_mod.TableSpec(
            source_table="land", target_table="t", write_mode="append",
            incremental=spec_mod.IncrementalSpec(
                watermark_column="id", mode="streaming"
            ),
            mappings=[
                spec_mod.MappingSpec(source="id", target="id"),
                spec_mod.MappingSpec(source="body", target="body"),
                spec_mod.MappingSpec(source="grp", target="grp"),
            ],
            quality_filter=qf,
        )

    with pytest.raises(ValueError, match="method=nb"):
        compile_table(ctx, mk(spec_mod.QualityFilterSpec(
            text_column="body", method="nb", id_column="id",
            nb_model_table="m", nb_priors_table="p", keep_labels=["x"],
        )))
    with pytest.raises(ValueError, match="top_fraction"):
        compile_table(ctx, mk(spec_mod.QualityFilterSpec(
            text_column="body", method="ccnet", id_column="id",
            group_column="grp", top_fraction=0.5,
        )))


def test_streaming_first_sighting_routes_and_matches_batch_twin(
    spark, tmp_path
):
    """`first_sighting:` on a streaming table: keys PROVEN new by the
    folded Bloom index flow to the target; cross-drain re-ingests (and
    any ε false positives) route to overflow_table; within-batch
    repeats all pass (cross-batch verdicts — pair with dedup: for the
    within-horizon exactness); NULL keys always pass; the folded index
    is word-identical to one batch build over everything ingested."""
    from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
        build_bloom_state,
    )
    from orion_etl_oracle_to_postgres_spark.streaming.bloom_monitor import (
        first_sighting_report,
        folded_bloom_state,
    )

    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    out = tmp_path / "out"
    state = tmp_path / "state"

    def feed(rows):
        spark.createDataFrame(rows, "id long, key string").coalesce(
            1
        ).write.mode("append").parquet(str(land))

    t = spec_mod.TableSpec(
        source_table="land",
        target_table="t_new",
        write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming", state_path=str(state)
        ),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="key", target="key"),
        ],
        first_sighting=spec_mod.FirstSightingSpec(
            key_column="key", m_bits=1 << 10, k=4,
            overflow_table="t_reingested",
        ),
    )
    job = spec_mod.JobSpec(global_spec=_global(src, out), tables=[t])

    # batch 0: 'a' twice (within-batch repeats probe the EMPTY prior
    # index -> both pass), 'b', and a NULL key (always passes)
    feed([(1, "a"), (2, "a"), (3, "b"), (4, None)])
    assert run_job(spark, job) == {"t_new": 4}

    # batch 1: 'a' and 'b' are re-ingests -> routed; 'c' is new
    feed([(5, "a"), (6, "c"), (7, "b"), (8, None)])
    assert run_job(spark, job) == {"t_new": 2}
    kept = sorted(
        r["id"] for r in spark.read.parquet(str(out / "t_new")).collect()
    )
    assert kept == [1, 2, 3, 4, 6, 8]
    routed = sorted(
        r["id"]
        for r in spark.read.parquet(str(out / "t_reingested")).collect()
    )
    assert routed == [5, 7]

    # reports landed per drain
    rep = {r["batch_id"]: r for r in first_sighting_report(
        spark, str(state / "sighting_report")).collect()}
    assert rep[0]["n_definite_new"] == 3 and rep[0]["n_maybe_seen"] == 0
    assert rep[1]["n_maybe_seen"] == 2 and rep[1]["n_definite_new"] == 1

    # index parity through the declarative path: folded state ==
    # one-shot batch build over ALL ingested keys (both verdicts)
    all_keys = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("a",), ("c",), ("b",)], "key string"
    )
    words = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("word_idx", "word").collect())
    )
    assert words(folded_bloom_state(spark, str(state / "sighting_state"))) \
        == words(build_bloom_state(all_keys, "key", m_bits=1 << 10, k=4))


def test_streaming_first_sighting_contracts_and_composition(spark, tmp_path):
    """Parse/compile contracts + the composed fs->fc gate order."""
    from orion_etl_oracle_to_postgres_spark.compiler import run_table

    # batch mode refuses at spec load
    with pytest.raises(ValueError, match="requires incremental.mode: streaming"):
        spec_mod.TableSpec(
            source_table="land", target_table="t",
            mappings=[spec_mod.MappingSpec(source="id", target="id")],
            first_sighting=spec_mod.FirstSightingSpec(key_column="key"),
        )
    # layout knobs mirror _bloom_validate at parse time
    with pytest.raises(ValueError, match="power of two"):
        spec_mod.FirstSightingSpec(key_column="k", m_bits=100)
    with pytest.raises(ValueError, match=r"k must be in \[1, 16\]"):
        spec_mod.FirstSightingSpec(key_column="k", k=0)

    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    out = tmp_path / "out"
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")], "id long, key string"
    ).coalesce(1).write.mode("append").parquet(str(land))
    ctx = JobContext(spark=spark, global_spec=_global(src, out))

    # typo'd key_column: friendly pre-drain error
    bad = spec_mod.TableSpec(
        source_table="land", target_table="t_b", write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming",
            state_path=str(tmp_path / "sb"),
        ),
        mappings=[spec_mod.MappingSpec(source="id", target="id")],
        first_sighting=spec_mod.FirstSightingSpec(key_column="key"),
    )
    with pytest.raises(ValueError, match="first_sighting key_column 'key'"):
        run_table(ctx, bad)

    # composed: first_sighting on key + frequency_cap cap=2 on key.
    # Within one batch: fs passes everything (empty prior index), fc
    # passes everything (empty prior sketch) -> 4 rows; a second drain
    # of the same keys routes them all at the fs stage.
    both = spec_mod.TableSpec(
        source_table="land", target_table="t_both", write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming",
            state_path=str(tmp_path / "s2"),
        ),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="key", target="key"),
        ],
        first_sighting=spec_mod.FirstSightingSpec(
            key_column="key", m_bits=1 << 10,
            overflow_table="t_both_seen",
        ),
        frequency_cap=spec_mod.FrequencyCapSpec(key_column="key", cap=2),
    )
    run_table(ctx, both)
    assert spark.read.parquet(str(out / "t_both")).count() == 4
    spark.createDataFrame(
        [(5, "a"), (6, "b"), (7, "c")], "id long, key string"
    ).coalesce(1).write.mode("append").parquet(str(land))
    run_table(ctx, both)
    # 'a','b' re-ingests route at fs; 'c' is new and passes fc (prior
    # count 0 < 2)
    assert sorted(
        r["id"] for r in spark.read.parquet(str(out / "t_both")).collect()
    ) == [1, 2, 3, 4, 7]
    assert sorted(
        r["id"]
        for r in spark.read.parquet(str(out / "t_both_seen")).collect()
    ) == [5, 6]


def test_streaming_sample_panel_matches_batch_and_contracts(spark, tmp_path):
    """`sample_panel:` on a streaming table: rows flow to the target
    unchanged while each drain appends a bottom-k id sample of the
    KEPT rows; the folded panel is row-for-row the batch build over
    everything kept; contracts (batch refusal, empty groups, typo'd
    columns) fail loudly."""
    from orion_etl_oracle_to_postgres_spark.compiler import run_table
    from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
        build_sample_state,
        finalize_sample,
    )
    from orion_etl_oracle_to_postgres_spark.streaming.kmv_monitor import (
        current_panel,
    )

    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    out = tmp_path / "out"
    state = tmp_path / "state"

    def feed(rows):
        spark.createDataFrame(rows, "id long, grp string").coalesce(
            1
        ).write.mode("append").parquet(str(land))

    t = spec_mod.TableSpec(
        source_table="land", target_table="t_pan", write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming", state_path=str(state)
        ),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="grp", target="grp"),
        ],
        sample_panel=spec_mod.SamplePanelSpec(
            group_columns=["grp"], id_column="id", k=4, seed="pp"
        ),
    )
    ctx = JobContext(spark=spark, global_spec=_global(src, out))
    feed([(i, "en" if i % 2 else "de") for i in range(10)])
    run_table(ctx, t)
    feed([(i, "en" if i % 2 else "de") for i in range(10, 24)])
    run_table(ctx, t)
    # rows flowed unchanged
    assert spark.read.parquet(str(out / "t_pan")).count() == 24
    # folded panel == batch build over everything kept
    panel = current_panel(spark, str(state / "panel_state"), ["grp"], "id")
    twin = finalize_sample(
        build_sample_state(
            spark.read.parquet(str(out / "t_pan")), ["grp"], "id",
            k=4, seed="pp",
        ),
        ["grp"], "id",
    )
    key = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("grp", "sample_rank", "id").collect())
    )
    assert key(panel) == key(twin)
    assert panel.count() == 8  # k=4 per group, 2 groups

    # contracts
    with pytest.raises(ValueError, match="requires incremental.mode: streaming"):
        spec_mod.TableSpec(
            source_table="land", target_table="t",
            mappings=[spec_mod.MappingSpec(source="id", target="id")],
            sample_panel=spec_mod.SamplePanelSpec(
                group_columns=["grp"], id_column="id"
            ),
        )
    with pytest.raises(ValueError, match="group_columns must be non-empty"):
        spec_mod.SamplePanelSpec(group_columns=[], id_column="id")
    bad = t.model_copy(update={
        "sample_panel": spec_mod.SamplePanelSpec(
            group_columns=["nope"], id_column="id"
        ),
        "target_table": "t_pan2",
    })
    with pytest.raises(ValueError, match="sample_panel column 'nope'"):
        run_table(ctx, bad)


def test_streaming_token_budget_gates_and_folds_exactly(spark, tmp_path):
    """`token_budget:` on a streaming table: a group stops flowing the
    drain AFTER its running admitted total reaches the budget (exact
    integer fold; one-batch overshoot bound); over rows route to the
    overflow table; NULL groups always pass; the folded totals equal
    the sum over everything kept."""
    from orion_etl_oracle_to_postgres_spark.compiler import run_table
    from orion_etl_oracle_to_postgres_spark.streaming.budget_monitor import (
        budget_report,
        budget_totals,
    )

    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    out = tmp_path / "out"
    state = tmp_path / "state"

    def feed(rows):
        spark.createDataFrame(
            rows, "id long, dom string, toks long"
        ).coalesce(1).write.mode("append").parquet(str(land))

    t = spec_mod.TableSpec(
        source_table="land", target_table="t_bud", write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming", state_path=str(state)
        ),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="dom", target="dom"),
            spec_mod.MappingSpec(source="toks", target="toks"),
        ],
        token_budget=spec_mod.TokenBudgetSpec(
            group_columns=["dom"], weight_column="toks", budget=100,
            overflow_table="t_bud_over",
        ),
    )
    ctx = JobContext(spark=spark, global_spec=_global(src, out))

    # drain 0: domain a admits 90 (under 100), b admits 30, NULL passes
    feed([(1, "a", 60), (2, "a", 30), (3, "b", 30), (4, None, 999)])
    run_table(ctx, t)
    # drain 1: a's prior total 90 < 100 -> still open, admits 50 more
    # (the one-batch overshoot); b stays open; NULL passes again
    feed([(5, "a", 50), (6, "b", 10), (7, None, 1)])
    run_table(ctx, t)
    # drain 2: a's prior total 140 >= 100 -> CLOSED, rows route; b open
    feed([(8, "a", 5), (9, "b", 20)])
    run_table(ctx, t)
    kept = sorted(
        r["id"] for r in spark.read.parquet(str(out / "t_bud")).collect()
    )
    assert kept == [1, 2, 3, 4, 5, 6, 7, 9]
    over = sorted(
        r["id"]
        for r in spark.read.parquet(str(out / "t_bud_over")).collect()
    )
    assert over == [8]
    # folded totals: exact sums over admitted non-NULL-group rows
    tot = {
        r["dom"]: r["tokens_admitted"]
        for r in budget_totals(spark, str(state / "budget_state"), ["dom"]).collect()
    }
    assert tot == {"a": 140, "b": 60}
    rep = {r["batch_id"]: r for r in budget_report(
        spark, str(state / "budget_report")).collect()}
    assert rep[0]["n_kept"] == 4 and rep[0]["tokens_admitted"] == 120
    assert rep[2]["n_over_budget"] == 1

    # contracts: batch refusal, empty groups, typo'd column
    with pytest.raises(ValueError, match="requires incremental.mode: streaming"):
        spec_mod.TableSpec(
            source_table="land", target_table="t",
            mappings=[spec_mod.MappingSpec(source="id", target="id")],
            token_budget=spec_mod.TokenBudgetSpec(
                group_columns=["dom"], weight_column="toks", budget=10,
            ),
        )
    with pytest.raises(ValueError, match="group_columns must be non-empty"):
        spec_mod.TokenBudgetSpec(
            group_columns=[], weight_column="toks", budget=10
        )
    bad = t.model_copy(update={
        "token_budget": spec_mod.TokenBudgetSpec(
            group_columns=["nope"], weight_column="toks", budget=10,
        ),
        "target_table": "t_bud2",
    })
    with pytest.raises(ValueError, match="token_budget column 'nope'"):
        run_table(ctx, bad)


def test_streaming_sample_panel_carry_quantile_read(spark, tmp_path):
    """A `sample_panel:` with `carry:` keeps the payload in each drain
    increment and flips the read side from member listing to
    range-free nearest-rank quantiles of the first carried column —
    equal to a batch build over everything kept (fold == full-build);
    carry contracts fail loudly at spec parse and compile."""
    from orion_etl_oracle_to_postgres_spark.compiler import run_table
    from orion_etl_oracle_to_postgres_spark.operators.aggstate import (
        build_sample_state,
        finalize_sample_quantiles,
    )
    from orion_etl_oracle_to_postgres_spark.streaming.kmv_monitor import (
        panel_quantiles,
    )

    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    out = tmp_path / "out"
    state = tmp_path / "state"

    def feed(rows):
        spark.createDataFrame(
            rows, "id long, grp string, nch long"
        ).coalesce(1).write.mode("append").parquet(str(land))

    t = spec_mod.TableSpec(
        source_table="land", target_table="t_panq", write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming", state_path=str(state)
        ),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="grp", target="grp"),
            spec_mod.MappingSpec(source="nch", target="nch"),
        ],
        sample_panel=spec_mod.SamplePanelSpec(
            group_columns=["grp"], id_column="id", k=6, seed="pq",
            carry=["nch"], quantiles=[0.5, 0.9],
        ),
    )
    ctx = JobContext(spark=spark, global_spec=_global(src, out))
    mkrows = lambda lo, hi: [  # noqa: E731 — nch pure function of id
        (i, "en" if i % 2 else "de", (i * 37) % 1000) for i in range(lo, hi)
    ]
    feed(mkrows(0, 12))
    run_table(ctx, t)
    feed(mkrows(12, 30))
    run_table(ctx, t)
    got = panel_quantiles(
        spark, str(state / "panel_state"), ["grp"], "id", "nch",
        [0.5, 0.9], carry=["nch"],
    )
    want = finalize_sample_quantiles(
        build_sample_state(
            spark.read.parquet(str(out / "t_panq")), ["grp"], "id",
            k=6, seed="pq", carry=["nch"],
        ),
        ["grp"], "id", "nch", [0.5, 0.9],
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert set(got.columns) == {"grp", "n_kept", "q_0_5", "q_0_9"}

    # contracts: collision, duplicate, bad quantile, typo'd carry col
    with pytest.raises(ValueError, match="collide with"):
        spec_mod.SamplePanelSpec(
            group_columns=["grp"], id_column="id", carry=["id"]
        )
    with pytest.raises(ValueError, match="duplicate sample_panel carry"):
        spec_mod.SamplePanelSpec(
            group_columns=["grp"], id_column="id", carry=["c", "c"]
        )
    with pytest.raises(ValueError, match="quantiles must be"):
        spec_mod.SamplePanelSpec(
            group_columns=["grp"], id_column="id", carry=["c"],
            quantiles=[0.0],
        )
    bad = t.model_copy(update={
        "sample_panel": spec_mod.SamplePanelSpec(
            group_columns=["grp"], id_column="id", carry=["nope"]
        ),
        "target_table": "t_panq2",
    })
    with pytest.raises(ValueError, match="sample_panel column 'nope'"):
        run_table(ctx, bad)


def test_panel_verb_out_materializes_dataset(spark, tmp_path, capsys):
    """--panel --out writes the current eval panel as parquet (the
    panel's actual downstream use: a dataset, not console output) —
    row-for-row the printed panel."""
    src = tmp_path / "src"
    land = src / "land"
    land.mkdir(parents=True)
    state = tmp_path / "state"
    t = spec_mod.TableSpec(
        source_table="land", target_table="t_po", write_mode="append",
        incremental=spec_mod.IncrementalSpec(
            watermark_column="id", mode="streaming", state_path=str(state)
        ),
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="grp", target="grp"),
        ],
        sample_panel=spec_mod.SamplePanelSpec(
            group_columns=["grp"], id_column="id", k=4, seed="po"
        ),
    )
    from orion_etl_oracle_to_postgres_spark.compiler import run_table

    spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(20)],
        "id long, grp string",
    ).coalesce(1).write.mode("append").parquet(str(land))
    ctx = JobContext(spark=spark, global_spec=_global(src, tmp_path / "out"))
    run_table(ctx, t)

    import textwrap

    (tmp_path / "tables").mkdir()
    (tmp_path / "tables" / "t.yaml").write_text(
        textwrap.dedent(
            f"""
            source_table: land
            target_table: t_po
            write_mode: append
            incremental:
              watermark_column: id
              mode: streaming
              state_path: {state}
            mappings:
              - {{source: id, target: id}}
              - {{source: grp, target: grp}}
            sample_panel:
              group_columns: [grp]
              id_column: id
              k: 4
              seed: po
            """
        )
    )
    (tmp_path / "config.yaml").write_text(
        textwrap.dedent(
            f"""
            global:
              tables_folder: tables
              table_files: [t.yaml]
              connectors:
                source_files: {{base_path: {src}}}
                target_files: {{base_path: {tmp_path / 'out'}}}
            """
        )
    )
    from orion_etl_oracle_to_postgres_spark.runner import main

    dest = str(tmp_path / "panel_ds")
    assert main(
        ["--config", str(tmp_path / "config.yaml"), "--panel", "t_po",
         "--out", dest]
    ) == 0
    out = capsys.readouterr().out
    assert f"panel written: {dest}" in out
    ds = spark.read.parquet(dest)
    assert ds.count() == 8 and set(ds.columns) == {"grp", "sample_rank", "id"}
