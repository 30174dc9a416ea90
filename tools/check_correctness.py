"""Local replica of the driver's t2 differential gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given sf dir; compare row count, column names, and an order-insensitive
value multiset (floats rounded to 9 sig figs before compare).

Usage: PYTHONPATH=/root/repo python tools/check_correctness.py [--stock] [sf_dir] [name ...]

``--stock`` builds a plain SparkSession (ANSI on — the Spark 4 default —
no legacy confs) exactly like the driver's harness does, instead of the
engine's own ``session.get_spark``. Queries must pass BOTH ways.
"""

from __future__ import annotations

import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from orion_etl_oracle_to_postgres_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_value(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if v != v:  # NaN
            return "NaN"
        return float(f"{v:.9g}")
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    return v


def df_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--stock"]
    stock = "--stock" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if stock:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config(
                "spark.driver.extraJavaOptions",
                "-Djava.security.egd=file:/dev/./urandom",
            )
            .getOrCreate()
        )
    else:
        spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            sm, dm = df_multiset(srows, scols), df_multiset(drows, dcols)
            if sm != dm:
                diff_s = list((sm - dm).items())[:3]
                diff_d = list((dm - sm).items())[:3]
                print(f"FAIL  {name}: value mismatch\n  spark-only: {diff_s}\n  duck-only:  {diff_d}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
