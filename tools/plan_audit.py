"""Plan-hygiene audit: compile EVERY registered query at a given sf dir
and scan its physical plan for the scale anti-patterns this repo bans:

* ``CartesianProduct`` — a non-broadcast cross join (the broadcast
  one-row stats pattern compiles to BroadcastNestedLoopJoin and is
  allowed);
* a ``Window`` fed by ``Exchange SinglePartition`` — the unpartitioned
  global window (single-task sort), the pattern ``operators/ranks.py``
  exists to eliminate (scalar aggregates legitimately use a
  single-partition exchange, so only the Window-consumer shape is
  flagged — same heuristic as ``tests/test_ranks.assert_no_global_window``);
* row-at-a-time Python UDFs (``BatchEvalPython``) — Arrow-batched
  pandas UDFs (``ArrowEvalPython`` / ``MapInPandas``) are the allowed
  Python path.

Usage::

    python tools/plan_audit.py [sf_dir] [--json out.json]

Compiles plans only — nothing executes beyond the eager statistics
passes some operators take by design (layout caches, checkpoints).
Exit 1 if any query is flagged. One line per flagged query; a summary
line either way.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the §2.8 coverage demo documents its global window as intentional
# (the scaled alternative is in its docstring); everything else must
# be clean. Maps query -> the ONE flag type forgiven — any other flag
# on the same query still fails the audit.
ALLOWLIST = {
    "window_order_gaps": "single-partition-window",
}


def audit_plan(plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("cartesian-product")
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            above = "\n".join(lines[max(0, i - 3) : i])
            if "Window" in above:
                flags.append("single-partition-window")
                break
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time-python-udf")
    return flags


def main() -> int:
    argv = sys.argv[1:]
    out_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: plan_audit.py [sf_dir] [--json out.json]")
            return 2
        out_path = argv[i + 1]
        del argv[i : i + 2]  # the flag's VALUE must not become sf_dir
    if any(a.startswith("--") for a in argv):
        print("usage: plan_audit.py [sf_dir] [--json out.json]")
        return 2
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from orion_etl_oracle_to_postgres_spark.session import get_spark

    spark = get_spark()
    results: dict[str, list[str]] = {}
    failed: dict[str, str] = {}
    fired: set[str] = set()
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # compile failure is its own flag
            failed[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        flags = audit_plan(plan)
        if name in ALLOWLIST and ALLOWLIST[name] in flags:
            flags = [f for f in flags if f != ALLOWLIST[name]]
            fired.add(name)
        if flags:
            results[name] = flags
            print(f"FLAG  {name}: {', '.join(flags)}")
    for name, err in failed.items():
        print(f"ERROR {name}: {err}")
    n = len(entry.queries())
    stale = sorted(set(ALLOWLIST) - fired)
    print(
        f"plan audit: {n - len(results) - len(failed)}/{n} clean, "
        f"{len(results)} flagged, {len(failed)} failed to compile "
        f"({len(fired)} allowlist entries fired"
        + (f"; STALE allowlist: {stale}" if stale else "")
        + ")"
    )
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            json.dump(
                {"flagged": results, "errors": failed, "total": n}, fh, indent=1
            )
    return 1 if (results or failed) else 0


if __name__ == "__main__":
    raise SystemExit(main())
