"""SparkSession factory.

The reference runs one process / one thread / one DB connection for the
whole run (``/root/reference/pipeline.py:25,39``). Here a single
SparkSession drives distributed execution; the defaults below are the
scale-relevant knobs (AQE on, sane shuffle partitioning, Arrow for any
pandas interchange).

Local testing uses ``local[N]``; on a real cluster the same code runs
unchanged under YARN/K8s — nothing in the engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32]/128GiB test harness; on a production
# cluster these are expected to be overridden by spark-submit conf. AQE
# coalesces small shuffle partitions and switches join strategies at
# runtime, so a generous static shuffle-partition count is safe.
_DEFAULT_CONF = {
    # Spark 4 enables ANSI mode by default; the reference's ETL semantics
    # are permissive (bad cast → NULL, e.g. float(val) failures pass
    # validation — SURVEY.md §2.7), so run with ANSI off.
    "spark.sql.ansi.enabled": "false",
    # Blocking SecureRandom (/dev/random) stalls the FIRST write action
    # 30-150s in entropy-starved containers (parquet commit UUIDs);
    # /dev/urandom is the standard server-side fix.
    "spark.driver.extraJavaOptions": "-Djava.security.egd=file:/dev/./urandom",
    "spark.executor.extraJavaOptions": "-Djava.security.egd=file:/dev/./urandom",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # AQE sizes post-shuffle partitions by BYTES, which misprices
    # compute-dense stages whose work explodes after the exchange (pair
    # verification joins, per-pair Levenshtein/vector dots): with the
    # default 1m floor a 2 MB shuffle feeding millions of generated
    # pairs coalesces to 1-2 tasks and serializes minutes of CPU on one
    # core (measured at sf0.1: semdedup's pair stage = 2.1 s on ONE
    # task). parallelismFirst (default true) already targets
    # defaultParallelism and only the minPartitionSize floor stops it on
    # small shuffles — lower the floor so small-byte/heavy-compute
    # stages stay wide. Scale-inert by construction: any shuffle
    # ≳ cores × advisory bytes never consults the floor, so production
    # plans are unchanged; locally it tracks $SPARK_GRAFT_CPUS via
    # defaultParallelism (the driver's lower-core bench scales with it).
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # Parquet TIMESTAMP(NANOS) columns (e.g. pandas-written event data)
    # are unreadable by Spark's vectorized reader; read them as raw
    # nanosecond longs instead. The read paths (sources/files.py,
    # queries._t) also set this at runtime so they work under sessions
    # built elsewhere; ns→µs conversion happens at those read sites.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": "8g",
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "orion-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session. ``master`` defaults to
    ``local[$SPARK_GRAFT_CPUS]`` locally, or whatever the cluster
    submission already configured."""
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
