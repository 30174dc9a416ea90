"""Incremental / Structured Streaming operators (SURVEY.md §2.9) —
high-water-mark batch increments and a file-stream → watermark →
windowed-agg → sink pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.streaming.incremental import (
    HighWaterMark,
    incremental_read,
    stream_source,
)


def test_high_water_mark_state(tmp_path):
    s = HighWaterMark(str(tmp_path / "state.json"))
    assert s.get("t.col") is None
    s.set("t.col", "2024-01-01")
    s.set("u.col", "42")
    assert s.get("t.col") == "2024-01-01"
    # fresh handle reads the same file
    assert HighWaterMark(str(tmp_path / "state.json")).get("u.col") == "42"


def test_incremental_read_advances_only_on_commit(spark, tmp_path):
    src = str(tmp_path / "src")
    state = HighWaterMark(str(tmp_path / "hwm.json"))
    spark.range(0, 10).withColumn("seq", F.col("id")).write.parquet(src)

    read = lambda: spark.read.parquet(src)  # noqa: E731
    df1, commit1 = incremental_read(read, "seq", state, "t.seq")
    assert df1.count() == 10

    # without commit the mark does not move: same rows again
    df_again, _ = incremental_read(read, "seq", state, "t.seq")
    assert df_again.count() == 10

    commit1()
    # new data lands; only rows past the mark are read
    spark.range(10, 15).withColumn("seq", F.col("id")).write.mode("append").parquet(src)
    df2, commit2 = incremental_read(read, "seq", state, "t.seq")
    assert sorted(r["seq"] for r in df2.select("seq").collect()) == [10, 11, 12, 13, 14]
    commit2()
    assert state.get("t.seq") == "14"

    # empty increment: commit keeps the old mark (max of empty = None)
    df3, commit3 = incremental_read(read, "seq", state, "t.seq")
    assert df3.count() == 0
    commit3()
    assert state.get("t.seq") == "14"


def test_incremental_commit_is_snapshot_bounded(spark, tmp_path):
    """Rows arriving AFTER the increment was read must not advance the
    mark (re-computing max at commit time against the live source would
    silently drop them from every future increment); they belong to the
    next increment."""
    src = str(tmp_path / "src_sb")
    state = HighWaterMark(str(tmp_path / "hwm_sb.json"))
    spark.range(0, 5).withColumn("seq", F.col("id")).write.parquet(src)

    df, commit = incremental_read(lambda: spark.read.parquet(src), "seq", state, "k")
    # late arrivals land between the read and the commit
    spark.range(5, 8).withColumn("seq", F.col("id")).write.mode("append").parquet(src)
    commit()
    assert state.get("k") == "4"  # snapshot bound, NOT the live max (7)

    # the late rows are picked up by the next increment, not lost
    df2, _ = incremental_read(lambda: spark.read.parquet(src), "seq", state, "k")
    assert sorted(r["seq"] for r in df2.select("seq").collect()) == [5, 6, 7]


def test_incremental_predicate_reaches_scan(spark, tmp_path):
    """The watermark filter must push into the parquet scan (min-max row
    -group pruning at scale), not run as a post-scan Filter only."""
    src = str(tmp_path / "src2")
    spark.range(0, 100).withColumn("seq", F.col("id")).write.parquet(src)
    state = HighWaterMark(str(tmp_path / "hwm2.json"))
    state.set("k", "50")
    df, _ = incremental_read(lambda: spark.read.parquet(src), "seq", state, "k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(seq" in plan


def test_stream_windowed_agg_to_sink(spark, tmp_path):
    """File landing → event-time watermark → tumbling-window count →
    append sink: the full Structured Streaming path on real files."""
    land = tmp_path / "landing"
    land.mkdir()
    rows = [
        ("2024-01-01 00:00:05", "a"),
        ("2024-01-01 00:00:30", "a"),
        ("2024-01-01 00:01:10", "b"),
        ("2024-01-01 00:05:00", "late-window-closer"),
    ]
    static = spark.createDataFrame(rows, "ts_s string, k string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "k"
    )
    static.write.parquet(str(land / "batch0"))

    stream = stream_source(
        spark,
        str(land / "batch0"),
        fmt="parquet",
        schema=static.schema,
        watermark_column="ts",
        delay="1 minute",
    )
    agg = stream.groupBy(F.window("ts", "1 minute").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")  # append requires the watermark to close windows
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (r["w"]["start"].strftime("%H:%M"), r["n"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    # windows 00:00 (2 rows) and 00:01 (1 row) are closed by the
    # 00:05 event under the 1-minute watermark; 00:05 stays open
    assert out == {("00:00", 2), ("00:01", 1)}


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions close when a
    later event exceeds the gap (inline) or when the event-time
    watermark passes the close time (state timeout)."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.streaming.sessionize import (
        sessionize_stream,
    )

    land = tmp_path / "sess_land"
    land.mkdir()
    schema = "user_id long, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(land)
        )

    feed([(1, t0, 1.0), (1, t0 + dt.timedelta(minutes=10), 2.0)])
    stream = spark.readStream.schema(schema).parquet(str(land))
    out = sessionize_stream(stream, gap_minutes=60)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # 5h later: exceeds the 60-min gap, closes session 1 inline
        feed([(1, t0 + dt.timedelta(hours=5), 3.0)])
        q.processAllAvailable()
        # two far-future batches: advance the watermark so session 2
        # closes via EventTimeTimeout (no further user-1 data)
        feed([(2, t0 + dt.timedelta(days=2), 1.0)])
        q.processAllAvailable()
        feed([(2, t0 + dt.timedelta(days=3), 1.0)])
        q.processAllAvailable()
        rows = {
            (r.user_id, r.session_start, r.n_events, round(r.total_value, 3))
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
    finally:
        q.stop()

    assert (1, t0, 2, 3.0) in rows  # session 1: two events, closed inline
    assert (1, t0 + dt.timedelta(hours=5), 1, 3.0) in rows  # closed by timeout
    assert (2, t0 + dt.timedelta(days=2), 1, 1.0) in rows  # closed inline by day-3 event
    # session-end = last event + gap
    ends = {r.session_start: r.session_end for r in spark.sql("SELECT * FROM sess_out").collect()}
    assert ends[t0] == t0 + dt.timedelta(minutes=10) + dt.timedelta(minutes=60)


def test_stateful_sessionize_straggler_not_fused(spark, tmp_path):
    """A late event OLDER than the open session's start−gap must become
    its own session — a signed gap check would fuse it and emit one
    session spanning an internal silence larger than the gap."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.streaming.sessionize import (
        sessionize_stream,
    )

    land = tmp_path / "sess_strag"
    land.mkdir()
    schema = "user_id long, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1, 6, 0, 0)

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(land)
        )

    feed([(1, t0, 1.0)])  # open session at 06:00
    stream = spark.readStream.schema(schema).parquet(str(land))
    # huge allowed lateness so the straggler is delivered, not dropped
    out = sessionize_stream(stream, gap_minutes=60, watermark_delay="2 days")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_strag")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        feed([(1, t0 - dt.timedelta(hours=5), 9.0)])  # 01:00 straggler
        q.processAllAvailable()
        rows = {
            (r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM sess_strag").collect()
        }
    finally:
        q.stop()
    gap = dt.timedelta(minutes=60)
    t_late = t0 - dt.timedelta(hours=5)
    # the straggler was emitted as its own closed singleton session
    assert (t_late, t_late + gap, 1) in rows
    # and nothing fused 01:00..06:00 into one session
    assert not any(s == t_late and e > t_late + gap for s, e, _ in rows)


def test_stateful_sessionize_stragglers_merge_with_each_other(spark, tmp_path):
    """Two stragglers within gap of each other in ONE batch must form a
    single merged session (what batch F.session_window computes), not
    two singletons (ADVICE r2)."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.streaming.sessionize import (
        sessionize_stream,
    )

    land = tmp_path / "sess_strag2"
    land.mkdir()
    schema = "user_id long, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1, 6, 0, 0)
    t_late = t0 - dt.timedelta(hours=5)
    gap = dt.timedelta(minutes=60)

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(land)
        )

    feed([(1, t0, 1.0)])  # open session at 06:00
    stream = spark.readStream.schema(schema).parquet(str(land))
    out = sessionize_stream(stream, gap_minutes=60, watermark_delay="2 days")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_strag2")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # one batch, two stragglers 30 min apart (within the 60-min gap)
        feed([(1, t_late, 9.0), (1, t_late + dt.timedelta(minutes=30), 1.0)])
        q.processAllAvailable()
        rows = {
            (r.session_start, r.session_end, r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM sess_strag2").collect()
        }
    finally:
        q.stop()
    # ONE merged straggler session covering both late events
    assert (t_late, t_late + dt.timedelta(minutes=30) + gap, 2, 10.0) in rows
    # no singleton straggler sessions leaked out
    assert not any(n == 1 and s < t0 for s, _, n, _ in rows)


def test_sessionize_stream_matches_batch_session_window(spark, tmp_path):
    """End-to-end parity (VERDICT r2 #8): drive sessionize_stream with a
    multi-batch file stream and assert the closed-session set is
    IDENTICAL to batch F.session_window over the same rows — covering
    the state/timeout wiring, not just the fold function. Events arrive
    in event-time order (the in-order contract; cross-batch straggler
    divergence is separately tested and documented), split so that many
    sessions straddle micro-batch boundaries."""
    import datetime as dt
    import random

    from orion_etl_oracle_to_postgres_spark.streaming.sessionize import (
        sessionize_stream,
    )

    rng = random.Random(7)
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for user in range(1, 7):
        ts = t0 + dt.timedelta(minutes=rng.randint(0, 120))
        for _ in range(40):
            # gaps straddle the 60-min threshold: ~1/3 open a new session
            step = rng.choice([5, 10, 20, 45, 90, 150])
            ts = ts + dt.timedelta(minutes=step)
            rows.append((user, ts, rng.randint(1, 40) * 0.25))
    rows.sort(key=lambda r: r[1])

    schema = "user_id long, ts timestamp, value double"
    gap_min = 60
    df = spark.createDataFrame(rows, schema)

    batch = {
        (r.user_id, r.start, r.end, r.n, r.total)
        for r in df.groupBy(
            "user_id", F.session_window("ts", f"{gap_min} minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select("user_id", F.col("w.start").alias("start"), F.col("w.end").alias("end"), "n", "total")
        .collect()
    }

    land = tmp_path / "sess_parity"
    land.mkdir()

    def feed(chunk):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("append").parquet(
            str(land)
        )

    stream = spark.readStream.schema(schema).parquet(str(land))
    out = sessionize_stream(stream, gap_minutes=gap_min)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("append")
        .start()
    )
    try:
        # 5 time-ordered micro-batches, then two far-future sentinel
        # batches (user 999) to push the watermark past every close time
        n = len(rows)
        for i in range(5):
            feed(rows[i * n // 5 : (i + 1) * n // 5])
            q.processAllAvailable()
        feed([(999, t0 + dt.timedelta(days=30), 1.0)])
        q.processAllAvailable()
        feed([(999, t0 + dt.timedelta(days=31), 1.0)])
        q.processAllAvailable()
        streamed = {
            (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 2))
            for r in spark.sql(
                "SELECT * FROM sess_parity WHERE user_id < 999"
            ).collect()
        }
    finally:
        q.stop()

    assert streamed == batch


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark-backed streaming dedup: redelivered
    keys inside the horizon are dropped across micro-batches; state for
    watermark-expired keys is released (bounded state)."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.streaming.dedup_stream import dedup_stream

    land = tmp_path / "dd_land"
    land.mkdir()
    schema = "k long, ts timestamp, v double"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(land)
        )

    feed([(1, t0, 1.0), (1, t0 + dt.timedelta(seconds=30), 2.0), (2, t0, 3.0)])
    stream = spark.readStream.schema(schema).parquet(str(land))
    out = dedup_stream(stream, ["k"], delay="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # same keys again in a later batch, still inside the horizon
        feed([(1, t0 + dt.timedelta(minutes=2), 9.0), (2, t0 + dt.timedelta(minutes=2), 9.0), (3, t0, 4.0)])
        q.processAllAvailable()
        rows = [tuple(r) for r in spark.sql("SELECT k, v FROM dd_out ORDER BY k").collect()]
    finally:
        q.stop()
    # exactly one survivor per key, first delivery wins
    assert rows == [(1, 1.0), (2, 3.0), (3, 4.0)]


def test_stream_fingerprint_dedup_matches_batch_fingerprint(spark, tmp_path):
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.operators.dedup import fingerprint_dedup
    from orion_etl_oracle_to_postgres_spark.streaming.dedup_stream import (
        fingerprint_dedup_stream,
    )

    land = tmp_path / "fp_land"
    schema = "doc_id long, ts timestamp, text string"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, "Hello,   World!"),
        (2, t0 + dt.timedelta(seconds=10), "hello world"),  # same normalized
        (3, t0 + dt.timedelta(seconds=20), "entirely different"),
    ]

    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(land))
    stream = spark.readStream.schema(schema).parquet(str(land))
    out = fingerprint_dedup_stream(stream, "text", delay="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("fp_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM fp_out").collect()}
    finally:
        q.stop()
    assert len(got) == 2 and 3 in got and len(got & {1, 2}) == 1
    # batch twin groups the same two docs under one fingerprint
    batch = fingerprint_dedup(
        spark.createDataFrame(rows, schema), "text", "doc_id"
    ).collect()
    assert sorted(r["dup_count"] for r in batch) == [1, 2]


def test_idempotent_foreach_batch_skips_replays(spark, tmp_path):
    """Replayed micro-batch ids (restart recovery) must not re-run the
    writer; new ids must. Driven through a real writeStream."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.streaming.foreach_sink import (
        idempotent_foreach_batch,
    )

    land = tmp_path / "fb_land"
    out_dir = tmp_path / "fb_out"
    out_dir.mkdir()
    ledger = str(tmp_path / "ledger.jsonl")
    schema = "k long, ts timestamp"
    t0 = dt.datetime(2024, 1, 1)

    calls: list[int] = []

    def writer(df, batch_id):
        calls.append(batch_id)
        df.write.mode("append").parquet(str(out_dir / f"b{batch_id}"))

    wrapped = idempotent_foreach_batch(writer, ledger)

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(land))

    feed([(1, t0)])
    q = (
        spark.readStream.schema(schema)
        .parquet(str(land))
        .writeStream.foreachBatch(wrapped)
        .start()
    )
    try:
        q.processAllAvailable()
        feed([(2, t0)])
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(calls) == [0, 1]

    # simulate recovery replay: same ids again -> writer NOT called
    n_before = len(calls)
    wrapped(spark.createDataFrame([(1, t0)], schema), 0)
    wrapped(spark.createDataFrame([(2, t0)], schema), 1)
    assert len(calls) == n_before
    # a genuinely new batch id still writes
    wrapped(spark.createDataFrame([(3, t0)], schema), 7)
    assert calls[-1] == 7


def test_upsert_sql_shape():
    from orion_etl_oracle_to_postgres_spark.streaming.foreach_sink import upsert_sql

    sql = upsert_sql("public.t", "public.t_stage", ["id", "v", "w"], ["id"])
    assert sql == (
        "INSERT INTO public.t (id, v, w) SELECT id, v, w FROM public.t_stage "
        "ON CONFLICT (id) DO UPDATE SET v = EXCLUDED.v, w = EXCLUDED.w"
    )
    assert "DO NOTHING" in upsert_sql("t", "s", ["id"], ["id"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in column list"):
        upsert_sql("t", "s", ["v"], ["id"])


def test_stream_interval_join_matches_batch_range_join(spark, tmp_path):
    """Stream-stream interval join (streaming/joins.py): clicks joined
    to errors within a 2-minute window, driven through real file
    streams — the emitted pairs must equal the static batch join of
    the same data."""
    from orion_etl_oracle_to_postgres_spark.streaming.joins import (
        stream_interval_join,
    )

    clicks = [
        (1, "2024-01-01 00:00:10"),
        (1, "2024-01-01 00:03:00"),
        (2, "2024-01-01 00:00:30"),
        (3, "2024-01-01 00:09:00"),  # no error within window
    ]
    errors = [
        (1, "2024-01-01 00:01:00"),  # catches click@00:00:10
        (1, "2024-01-01 00:04:30"),  # catches click@00:03:00
        (2, "2024-01-01 00:05:00"),  # too late for click@00:00:30
    ]
    c_static = spark.createDataFrame(clicks, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("c_ts")
    )
    e_static = spark.createDataFrame(errors, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("e_ts")
    )
    (tmp_path / "c").mkdir(); (tmp_path / "e").mkdir()
    c_static.write.parquet(str(tmp_path / "c" / "b0"))
    e_static.write.parquet(str(tmp_path / "e" / "b0"))

    c_stream = (
        spark.readStream.schema(c_static.schema).parquet(str(tmp_path / "c" / "b0"))
    )
    e_stream = (
        spark.readStream.schema(e_static.schema).parquet(str(tmp_path / "e" / "b0"))
    )
    joined = stream_interval_join(
        c_stream,
        e_stream,
        "user_id",
        left_ts="c_ts",
        right_ts="e_ts",
        interval="2 MINUTES",
        watermark_delay="10 seconds",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sj"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], str(r["c_ts"]), str(r["r_e_ts"]))
        for r in spark.sql("SELECT * FROM sj_out").collect()
    }
    want = {
        (r["user_id"], str(r["c_ts"]), str(r["e_ts"]))
        for r in c_static.join(
            e_static,
            (c_static.user_id == e_static.user_id)
            & (c_static.c_ts >= e_static.e_ts - F.expr("INTERVAL 2 MINUTES"))
            & (c_static.c_ts <= e_static.e_ts),
        ).select(c_static.user_id, "c_ts", "e_ts").collect()
    }
    assert got == want and len(got) == 2


def test_stream_interval_join_refuses_batch_inputs(spark):
    from orion_etl_oracle_to_postgres_spark.streaming.joins import (
        stream_interval_join,
    )

    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError, match="requires two streaming"):
        stream_interval_join(
            df, df, "user_id", left_ts="a", right_ts="b", interval="1 MINUTE"
        )


def test_windowed_counts_stream_matches_batch_and_drops_late(spark, tmp_path):
    """Watermarked tumbling-window aggregation: closed windows from the
    stream equal the batch run over the ACCEPTED rows, and a row later
    than the watermark is dropped (never re-opens an emitted window)."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.streaming.windows import (
        windowed_event_counts,
    )

    land = tmp_path / "win_land"
    land.mkdir()
    schema = "ts timestamp, event_type string, value double"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(land)
        )

    accepted = [
        (t0 + dt.timedelta(minutes=5), "click", 1.0),
        (t0 + dt.timedelta(minutes=20), "click", 2.0),
        (t0 + dt.timedelta(minutes=40), "view", 3.0),
        # in-watermark late row for hour-0 (arrives in batch 2)
        (t0 + dt.timedelta(minutes=50), "click", 4.0),
    ]
    feed(accepted[:3])
    stream = spark.readStream.schema(schema).parquet(str(land))
    out = windowed_event_counts(
        stream, duration="1 hour", watermark="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        feed([accepted[3]])  # late but within watermark: must count
        q.processAllAvailable()
        # advance watermark far past hour 0 so its windows close
        feed([(t0 + dt.timedelta(days=1), "view", 0.5)])
        q.processAllAvailable()
        # WAY-late row for hour 0 — behind the watermark: must be dropped
        feed([(t0 + dt.timedelta(minutes=59), "click", 100.0)])
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
    finally:
        q.stop()

    # batch run over the accepted rows is the oracle (same function)
    batch = windowed_event_counts(
        spark.createDataFrame(accepted, schema), duration="1 hour"
    )
    exp = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got[(t0, "click")] == exp[(t0, "click")] == (3, 7.0)
    assert got[(t0, "view")] == exp[(t0, "view")] == (1, 3.0)
    # the 100.0 row was dropped: hour-0 click window emitted exactly once
    assert all(v[1] != 107.0 for v in got.values())


def test_sliding_windows_multiply_membership(spark):
    """Sliding windows: each event lands in duration/slide buckets —
    checked on the batch path (identical plan to streaming)."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.streaming.windows import (
        windowed_event_counts,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)
    df = spark.createDataFrame(
        [(t0, "click", 1.0)], "ts timestamp, event_type string, value double"
    )
    out = windowed_event_counts(
        df, duration="1 hour", slide="30 minutes"
    ).collect()
    assert len(out) == 2  # 00:00-01:00 and 00:30-01:30


def test_native_session_window_stream_matches_custom_sessionize(spark, tmp_path):
    """Spark's built-in session_window on a stream must close the same
    sessions as the custom applyInPandasWithState operator — two
    independent implementations of the gap semantics agreeing end-to-end."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.streaming.sessionize import (
        sessionize_stream,
    )

    land = tmp_path / "nsw_land"
    land.mkdir()
    schema = "user_id long, ts timestamp, value double"
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(land)
        )

    feed(
        [
            (1, t0, 1.0),
            (1, t0 + dt.timedelta(minutes=30), 2.0),  # same session (gap 60)
            (2, t0 + dt.timedelta(minutes=5), 5.0),
        ]
    )

    from pyspark.sql import functions as F

    def native(stream):
        return (
            stream.withWatermark("ts", "1 minute")
            .groupBy(F.session_window("ts", "60 minutes"), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                "n_events",
                "total_value",
            )
        )

    stream = spark.readStream.schema(schema).parquet(str(land))
    q1 = (
        native(stream)
        .writeStream.format("memory")
        .queryName("nsw_native")
        .outputMode("append")
        .start()
    )
    q2 = (
        sessionize_stream(stream, gap_minutes=60)
        .select("user_id", "session_start", "n_events", "total_value")
        .writeStream.format("memory")
        .queryName("nsw_custom")
        .outputMode("append")
        .start()
    )
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        # far-future event closes every open session in both engines
        feed([(3, t0 + dt.timedelta(days=5), 0.0)])
        q1.processAllAvailable()
        q2.processAllAvailable()
        nat = {
            (r.user_id, r.session_start, r.n_events, round(r.total_value, 3))
            for r in spark.sql("SELECT * FROM nsw_native").collect()
            if r.user_id in (1, 2)
        }
        cus = {
            (r.user_id, r.session_start, r.n_events, round(r.total_value, 3))
            for r in spark.sql("SELECT * FROM nsw_custom").collect()
            if r.user_id in (1, 2)
        }
    finally:
        q1.stop()
        q2.stop()
    assert nat == cus == {(1, t0, 2, 3.0), (2, t0 + dt.timedelta(minutes=5), 1, 5.0)}


def test_zscore_anomaly_stream_matches_batch_semantics(spark, tmp_path):
    """streaming/anomaly.py parity: the spike hour must be flagged with
    exactly the batch query's baseline (trailing-24h hours-with-events,
    current excluded), gates, and rounding; quiet hours emit nothing."""
    import datetime as dt
    import math

    from orion_etl_oracle_to_postgres_spark.streaming.anomaly import (
        zscore_anomaly_stream,
    )

    T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    land = tmp_path / "anom_land"
    land.mkdir()
    schema = "event_type string, ts timestamp"

    def hour_rows(h, n):
        # n events inside hour h (spread across minutes)
        return [("click", T0 + dt.timedelta(hours=h, minutes=m % 60)) for m in range(n)]

    counts = {h: (h % 3) + 4 for h in range(29)}  # 4,5,6 pattern -> sd > 0
    counts[29] = 50                               # the spike
    counts[30], counts[31] = 5, 6

    rows1 = [r for h in range(30) for r in hour_rows(h, counts[h])]
    rows2 = [r for h in (30, 31) for r in hour_rows(h, counts[h])]

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(land))

    feed(rows1)
    stream = spark.readStream.schema(schema).parquet(str(land))
    out = zscore_anomaly_stream(stream, flag_z=2.0, min_hours=12, grace_hours=2)
    q = (
        out.writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        feed(rows2)
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM anom_out").collect()
    finally:
        q.stop()

    # hand-computed batch expectation for the spike hour 29: baseline =
    # hours 5..28 (24 hours, all present), mean/stddev_samp of the
    # 4/5/6 pattern
    base = [counts[h] for h in range(5, 29)]
    mean = sum(base) / len(base)
    sd = math.sqrt(sum((x - mean) ** 2 for x in base) / (len(base) - 1))
    z = (50 - mean) / sd

    assert len(got) == 1  # ONLY the spike hour is anomalous
    r = got[0]
    assert r["event_type"] == "click"
    assert r["hour"] == T0 + dt.timedelta(hours=29)
    assert r["cnt"] == 50
    assert r["mean_prev"] == round(mean, 3)
    assert r["z"] == round(z, 3)


def test_zscore_anomaly_stream_respects_min_hours_gate(spark, tmp_path):
    """Too little history -> no emission even for a huge spike."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.streaming.anomaly import (
        zscore_anomaly_stream,
    )

    T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    land = tmp_path / "anom_land2"
    schema = "event_type string, ts timestamp"
    rows = [
        ("buy", T0 + dt.timedelta(hours=h, minutes=m))
        for h, n in [(0, 4), (1, 6), (2, 40), (3, 5), (4, 5), (5, 5)]
        for m in range(n)
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(land))
    stream = spark.readStream.schema(schema).parquet(str(land))
    out = zscore_anomaly_stream(stream, flag_z=2.0, min_hours=12, grace_hours=2)
    q = (
        out.writeStream.format("memory")
        .queryName("anom_out2")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM anom_out2").count() == 0
    finally:
        q.stop()
