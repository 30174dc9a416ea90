"""Spark 4 Python DataSource: determinism, partition planning, pushdown."""

from orion_etl_oracle_to_postgres_spark.sources.pydatasource import register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partition_independent_determinism(spark):
    a = sorted(map(tuple, _read(spark, rows=500, numPartitions=7).collect()))
    b = sorted(map(tuple, _read(spark, rows=500, numPartitions=1).collect()))
    assert a == b and len(a) == 500
    # schema is the events shape
    assert [f.name for f in _read(spark, rows=1).schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]


def test_reader_plans_distributed_partitions(spark):
    df = _read(spark, rows=1000, numPartitions=5)
    assert df.rdd.getNumPartitions() == 5


def test_event_type_filter_pushed_into_generator(spark):
    full = _read(spark, rows=800, numPartitions=4)
    clicks_pushed = _read(spark, rows=800, numPartitions=4).filter(
        "event_type = 'click'"
    )
    expected = [r for r in full.collect() if r["event_type"] == "click"]
    got = clicks_pushed.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
    assert len(got) > 0
    # IN filter too
    two = _read(spark, rows=800).filter("event_type IN ('click','error')").collect()
    exp2 = [r for r in full.collect() if r["event_type"] in ("click", "error")]
    assert sorted(map(tuple, two)) == sorted(map(tuple, exp2))


def test_usable_as_fetcher_plugin(spark):
    """The DataSource slots into the engine as a custom fetcher —
    the Spark-native FetcherPlugin."""
    from orion_etl_oracle_to_postgres_spark import registry
    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table
    from orion_etl_oracle_to_postgres_spark.spec import (
        GlobalSpec,
        MappingSpec,
        TableSpec,
    )

    @registry.register("fetcher", "synthetic_events_fetcher")
    def _fetch(ctx, spec):
        register(ctx.spark)
        return ctx.spark.read.format("synthetic_events").option("rows", 300).load()

    ctx = JobContext(spark, GlobalSpec())
    spec = TableSpec(
        source_table="ignored",
        target_table="evt",
        fetcher_plugin="synthetic_events_fetcher",
        mappings=[
            MappingSpec(source="event_id", target="event_id"),
            MappingSpec(source="event_type", target="event_type", transform="upper"),
        ],
    )
    out = compile_table(ctx, spec).df.collect()
    assert len(out) == 300
    assert all(r["event_type"].isupper() for r in out)


def test_streaming_reader_deterministic_batches(spark, tmp_path):
    """readStream over the Python source: micro-batches advance the
    offset by batchRows and rows match the batch source exactly —
    the replayable-offset contract."""
    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("batchRows", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM pyds_stream").first()["c"] >= 100:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = {r["event_id"]: tuple(r) for r in spark.sql("SELECT * FROM pyds_stream").collect()}
    assert len(got) >= 100
    batch = {r["event_id"]: tuple(r) for r in _read(spark, rows=len(got)).collect()}
    for eid in list(got)[:200]:
        assert got[eid] == batch[eid]


def test_jsonl_writer_commit_protocol(spark, tmp_path):
    """Custom Python sink: staged part files publish atomically on
    commit with a _SUCCESS manifest; overwrite replaces prior files."""
    import json
    import os

    register(spark)
    d = str(tmp_path / "out")
    os.makedirs(d)
    df = spark.range(100).selectExpr("id", "CAST(id % 3 AS STRING) AS g")
    df.repartition(4).write.format("jsonl_dir").option("path", d).mode(
        "append"
    ).save()

    files = [f for f in os.listdir(d) if f.endswith(".jsonl")]
    assert len(files) == 4
    assert not os.path.exists(os.path.join(d, "_staging"))
    rows = []
    for f in files:
        with open(os.path.join(d, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(int(r["id"]) for r in rows) == list(range(100))
    manifest = json.load(open(os.path.join(d, "_SUCCESS")))
    assert manifest["rows_committed"] == 100

    # overwrite mode replaces the committed files
    spark.range(10).selectExpr("id", "'x' AS g").coalesce(1).write.format(
        "jsonl_dir"
    ).option("path", d).mode("overwrite").save()
    files2 = [f for f in os.listdir(d) if f.endswith(".jsonl")]
    assert len(files2) == 1
    assert json.load(open(os.path.join(d, "_SUCCESS")))["rows_committed"] == 10


def test_conjoined_pushed_filters_intersect(spark):
    full = _read(spark, rows=600)
    both = (
        _read(spark, rows=600)
        .filter("event_type IN ('click','view')")
        .filter("event_type = 'view'")
    )
    exp = [r for r in full.collect() if r["event_type"] == "view"]
    assert sorted(map(tuple, both.collect())) == sorted(map(tuple, exp))
    # contradictory conjunction -> empty, not the last filter's rows
    none = (
        _read(spark, rows=600)
        .filter("event_type = 'click'")
        .filter("event_type = 'view'")
    )
    assert none.count() == 0


def test_zero_rows_is_empty_not_error(spark):
    assert _read(spark, rows=0).count() == 0
