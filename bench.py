"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion (count/collect) with the result sizes
kept small, so the timing measures scan+compute, not driver transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orion_etl_oracle_to_postgres_spark import queries as q
from orion_etl_oracle_to_postgres_spark.session import get_spark

# Headline set: the flagship ETL pipeline, the shuffle-heavy analytics,
# and the scale-relevant LLM-data ops.
BENCH_QUERIES = [
    "etl_customer_pipeline",
    "etl_where_pushdown",
    "agg_pricing_summary",
    "agg_revenue_top10",
    "window_top_orders_per_cust",
    "agg_events_hourly",
    "json_extract_events",
    "dedup_fingerprint",
    "dedup_minhash",
    "text_stats",
    "text_quality",
    "doc_fingerprint",
    "emb_topk_query",
    "emb_near_dup_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen path AND the Python worker pool once so
    # per-query numbers measure the engine, not one-time process spawn
    # (32 workers importing pandas ≈ 15 s, paid once per session)
    spark.range(1000).count()
    import pandas as pd  # noqa: F401

    spark.range(0, 3200, 1, 32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = q.QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
