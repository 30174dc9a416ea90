"""Per-query profiler (optimization guide §1): run named registry
queries with the bench methodology (same session factory, warmup,
count() action) under a Spark event log, then attribute jobs/stages to
each query via setJobDescription and report where the time goes —
number of jobs (driver round-trips / eager actions), number of stages
(shuffle boundaries), per-stage wall, task counts and shuffle bytes.

Usage: PYTHONPATH=/root/repo python tools/profile_query.py [--explain]
           [--sf SF_DIR] name [name ...]

--explain additionally writes `.explain("formatted")` for each query to
plans/<round>/<name>_before.txt (or _after.txt with --tag after;
--round controls the directory, default r13).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from orion_etl_oracle_to_postgres_spark import queries as q  # noqa: E402
from orion_etl_oracle_to_postgres_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--tag", default="before", choices=["before", "after"])
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--round", default="r13")
    args = ap.parse_args()

    unknown = [n for n in args.names if n not in q.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    evdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    t0 = time.time()
    bench.warmup(spark)
    print(f"# warmup {time.time() - t0:.1f}s", file=sys.stderr)

    walls: dict[str, list[float]] = {n: [] for n in args.names}
    for attempt in range(args.passes):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"PROF::{name}::p{attempt}")
            t0 = time.time()
            df = q.QUERIES[name](spark, args.sf)
            n = df.count()
            dt = time.time() - t0
            walls[name].append(dt)
            print(f"# pass{attempt} {name}: {n} rows in {dt:.3f}s", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)

    if args.explain:
        os.makedirs(f"/root/repo/plans/{args.round}", exist_ok=True)
        for name in args.names:
            df = q.QUERIES[name](spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = f"/root/repo/plans/{args.round}/{name}_{args.tag}.txt"
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(txt)
            print(f"# wrote {path}", file=sys.stderr)

    spark.stop()

    # ---- parse the event log ------------------------------------------
    logs = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    latest = logs[-1]
    if os.path.isdir(latest):  # Spark 4 rolling event-log directory
        parts = sorted(
            p
            for p in glob.glob(os.path.join(latest, "*"))
            if os.path.basename(p).startswith("events_")
        )
    else:
        parts = [latest]
    events = []
    for part in parts:
        with open(part, encoding="utf-8") as fh:
            for line in fh:
                try:
                    events.append(json.loads(line))
                except ValueError:
                    pass

    job_desc: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    job_times: dict[int, list[float]] = {}
    stage_info: dict[int, dict] = {}
    for ev in events:
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            job_desc[jid] = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            job_stages[jid] = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
            job_times[jid] = [ev.get("Submission Time", 0) / 1000.0, 0.0]
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in job_times:
                job_times[jid][1] = ev.get("Completion Time", 0) / 1000.0
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            acc = {
                a["Name"]: a.get("Value")
                for a in si.get("Accumulables", [])
                if str(a.get("Name", "")).startswith("internal.metrics.")
            }
            stage_info[si["Stage ID"]] = {
                "tasks": si.get("Number of Tasks", 0),
                "wall": (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                / 1000.0,
                "sr": int(acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0)
                + int(acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0),
                "sw": int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0),
                "in": int(acc.get("internal.metrics.input.bytesRead", 0) or 0),
                "cpu": int(acc.get("internal.metrics.executorCpuTime", 0) or 0) / 1e9,
                "run": int(acc.get("internal.metrics.executorRunTime", 0) or 0) / 1000.0,
            }

    for name in args.names:
        print(f"\n=== {name}  walls={['%.3f' % w for w in walls[name]]}")
        for p in range(args.passes):
            tag = f"PROF::{name}::p{p}"
            jids = [j for j, d in job_desc.items() if d == tag]
            if not jids:
                continue
            njobs = len(jids)
            sids = sorted({s for j in jids for s in job_stages[j] if s in stage_info})
            tot_sr = sum(stage_info[s]["sr"] for s in sids)
            tot_sw = sum(stage_info[s]["sw"] for s in sids)
            tot_in = sum(stage_info[s]["in"] for s in sids)
            gap = walls[name][p] - sum(
                max(0.0, job_times[j][1] - job_times[j][0]) for j in jids
            )
            print(
                f"  pass{p}: jobs={njobs} stages={len(sids)} "
                f"input={tot_in/1e6:.1f}MB shuffleR={tot_sr/1e6:.2f}MB "
                f"shuffleW={tot_sw/1e6:.2f}MB driver_gap={gap:.3f}s"
            )
            if p == args.passes - 1:
                big = sorted(sids, key=lambda s: -stage_info[s]["wall"])[:12]
                for s in big:
                    i = stage_info[s]
                    if i["wall"] < 0.02:
                        continue
                    print(
                        f"    stage {s}: {i['wall']:.3f}s tasks={i['tasks']} "
                        f"cpu={i['cpu']:.2f}s run={i['run']:.2f}s "
                        f"in={i['in']/1e6:.1f}MB sr={i['sr']/1e6:.2f}MB sw={i['sw']/1e6:.2f}MB"
                    )


if __name__ == "__main__":
    main()
