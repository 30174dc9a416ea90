"""Plan-hygiene gate, in-suite (VERDICT r6 ask #3): every registered
query must compile to a scale-safe physical plan — no cartesian
products, no single-partition global windows, no row-at-a-time Python
UDFs. This is ``tools/plan_audit.py`` promoted into pytest so a
regressing query cannot land: the tool was judge/builder-run only.

The scanner itself is imported from the tool (one implementation, two
entry points), and a negative-control test proves each flag fires on a
deliberately bad plan — so a silent scanner regression can't turn the
gate green by matching nothing.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_audit import ALLOWLIST, audit_plan  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scanner_catches_bad_plans(spark):
    """Negative controls: each banned shape is actually detected."""
    a = spark.range(0, 10).repartition(4)
    b = spark.range(0, 10).repartition(4).withColumnRenamed("id", "jd")
    cross = a.hint("SHUFFLE_REPLICATE_NL").join(  # force non-broadcast
        b, F.col("id") < F.col("jd")
    )
    assert "cartesian-product" in audit_plan(_plan(cross))

    gw = a.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert "single-partition-window" in audit_plan(_plan(gw))

    ud = F.udf(lambda x: x + 1, "bigint")
    slow = a.select(ud(F.col("id")).alias("y"))
    assert "row-at-a-time-python-udf" in audit_plan(_plan(slow))

    # and a clean shape stays clean
    ok = a.groupBy((F.col("id") % 2).alias("k")).agg(F.sum("id").alias("s"))
    assert audit_plan(_plan(ok)) == []


def test_every_registered_query_compiles_scale_safe(spark):
    """The full-registry sweep (compile-only; sf0.001 keeps the eager
    statistics passes some operators take by design cheap). Gathers
    every violation before failing so a red run names them all."""
    import __spark_entry__ as entry

    from pyspark.sql.types import ArrayType, MapType, StructType

    flagged: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    fired: set[str] = set()
    complex_out: dict[str, list[str]] = {}
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF)
            flags = audit_plan(_plan(df))
        except Exception as exc:  # compile failure is its own flag
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        if name in ALLOWLIST and ALLOWLIST[name] in flags:
            flags = [f for f in flags if f != ALLOWLIST[name]]
            fired.add(name)
        if flags:
            flagged[name] = flags
        # the driver's correctness gate canonicalizes results with pandas
        # sort_values -> factorize, which CRASHES on list/dict cells — a
        # registered query exposing array/map/struct columns is a query
        # the hard gate cannot check (the one r7 driver-red, emb_whiten).
        # Serialize or posexplode vectors before registering.
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            complex_out[name] = bad
    assert not errors, f"queries failed to compile: {errors}"
    assert not flagged, f"scale anti-patterns: {flagged}"
    assert not complex_out, (
        f"non-canonicalizable (array/map/struct) output columns: {complex_out}"
    )
    # an allowlist entry whose flag no longer fires is stale — prune it
    assert fired == set(ALLOWLIST), (
        f"stale allowlist entries: {sorted(set(ALLOWLIST) - fired)}"
    )


def test_bench_covers_full_registry():
    """Every registered query is a promise — a perf regression in an
    unbenched one is invisible (VERDICT r8 ask #4). BENCH_QUERIES is a
    hand-ordered list (the head doubles as the documented headline
    set), so pin it to the registry mechanically: the first round-10
    registration that forgets a bench entry fails here, not in a
    judge's coverage diff."""
    import importlib

    bench = importlib.import_module("bench")
    from orion_etl_oracle_to_postgres_spark.queries import QUERIES

    missing = set(QUERIES) - set(bench.BENCH_QUERIES)
    extra = set(bench.BENCH_QUERIES) - set(QUERIES)
    dupes = len(bench.BENCH_QUERIES) - len(set(bench.BENCH_QUERIES))
    assert not missing, f"registered but unbenched: {sorted(missing)}"
    assert not extra, f"benched but unregistered: {sorted(extra)}"
    assert dupes == 0, "duplicate BENCH_QUERIES entries"


def test_registry_split_preserves_contract():
    """The r11 per-family split (queries_* modules + the aggregating
    queries.py) must be invisible to every consumer: registry keys are
    function __name__s (the globals() re-export depends on it), the
    pinned _REGISTRY_ORDER is exactly the pre-split registration order
    (a deleted query must be removed from the pin too — a stale name
    there would silently shift the order restore), QUERIES/ORACLE lead
    with that order, and the helper/function attribute re-exports the
    tests and the driver entry rely on resolve."""
    from orion_etl_oracle_to_postgres_spark import queries as q

    assert all(fn.__name__ == k for k, fn in q.QUERIES.items())
    # the order pin names only real registrations, with no duplicates
    assert len(q._REGISTRY_ORDER) == len(set(q._REGISTRY_ORDER))
    stale = [n for n in q._REGISTRY_ORDER if n not in q.QUERIES]
    assert not stale, f"stale _REGISTRY_ORDER entries: {stale}"
    # registry leads with the pinned order; later registrations append
    n = len(q._REGISTRY_ORDER)
    assert list(q.QUERIES)[:n] == q._REGISTRY_ORDER
    assert list(q.ORACLE)[: len([k for k in q._REGISTRY_ORDER if k in q.ORACLE])] == [
        k for k in q._REGISTRY_ORDER if k in q.ORACLE
    ]
    # attribute passthroughs: query functions and shared helpers
    assert q.etl_customer_pipeline is q.QUERIES["etl_customer_pipeline"]
    assert callable(q._ctx) and callable(q._t)
