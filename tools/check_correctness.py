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

import re
import sys
import time
from collections import Counter
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from orion_etl_oracle_to_postgres_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_value(v):
    """Normalize a cell for order-insensitive compare, TAGGED with its
    Python type family so an int/float divergence (e.g. DuckDB HUGEINT
    canonicalized to float by the driver vs Spark bigint) is a mismatch
    here too — Counter would otherwise hash 6 == 6.0 to the same key,
    which is how the HUGEINT oracle-typing bug shipped red twice
    (VERDICT r3 'What's wrong' #3)."""
    if v is None:
        return ("n", None)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if v != v:  # NaN
            return ("f", "NaN")
        return ("f", float(f"{v:.9g}"))
    if isinstance(v, Decimal):
        f = float(v)
        return ("d", "NaN" if f != f else float(f"{f:.9g}"))
    if isinstance(v, (list, tuple)):
        return ("a",) + tuple(norm_value(x) for x in v)
    return v


# ---- schema type-family check (DuckDB DESCRIBE vs Spark df.dtypes) ----
# The driver canonicalizes values through pandas, where DuckDB HUGEINT
# becomes float64 while Spark BIGINT stays int64 — invisible to a
# Python-level fetchall() compare (duckdb returns HUGEINT as int).
# Comparing declared column types catches the class regardless of how
# any particular fetch path converts.

_DUCK_FAMILY = [
    (r"^(U?TINYINT|U?SMALLINT|U?INTEGER|U?BIGINT|INT\d*)$", "int"),
    (r"^U?HUGEINT$", "hugeint"),  # never matches a Spark family → always flagged
    (r"^(FLOAT|REAL|DOUBLE)$", "float"),
    (r"^DECIMAL", "decimal"),
    (r"^BOOLEAN$", "bool"),
    (r"^(VARCHAR|TEXT|STRING|CHAR)", "str"),
    (r"^DATE$", "date"),
    (r"^TIMESTAMP", "ts"),
    (r"^TIME", "ts"),
    (r"^(BLOB|BYTEA|BINARY|VARBINARY)$", "bin"),
    (r"^(LIST|ARRAY)", "array"),
    (r"^(STRUCT|ROW)", "struct"),
    (r"^MAP", "map"),
]

_SPARK_FAMILY = [
    (r"^(tinyint|smallint|int|bigint)$", "int"),
    (r"^(float|double)$", "float"),
    (r"^decimal", "decimal"),
    (r"^boolean$", "bool"),
    (r"^string$", "str"),
    (r"^date$", "date"),
    (r"^timestamp", "ts"),
    (r"^binary$", "bin"),
    (r"^array", "array"),
    (r"^struct", "struct"),
    (r"^map", "map"),
    (r"^void$", "null"),
]


def duck_family(t: str) -> str:
    t = t.strip()
    if t.endswith("[]"):
        return "array"
    tu = t.upper()
    for pat, fam in _DUCK_FAMILY:
        if re.match(pat, tu):
            return fam
    return f"?{t}"


def spark_family(t: str) -> str:
    for pat, fam in _SPARK_FAMILY:
        if re.match(pat, t.strip().lower()):
            return fam
    return f"?{t}"


def type_mismatches(spark_dtypes, duck_schema):
    """Return [(col, spark_family, duck_family)] for columns whose type
    families differ. ``spark_dtypes`` is df.dtypes; ``duck_schema`` is
    [(name, type)] from DESCRIBE <query>."""
    sp = {c: spark_family(t) for c, t in spark_dtypes}
    du = {c: duck_family(t) for c, t in duck_schema}
    bad = []
    for c in sp:
        if c in du and sp[c] != du[c]:
            bad.append((c, sp[c], du[c]))
    return bad


def df_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


def compare_result(scols, srows, sdtypes, dcols, drows, dschema) -> list[str]:
    """EVERY comparison layer — column set, declared type families, row
    count, order-insensitive value multiset — runs independently
    whenever its prerequisites hold, and every failure is reported.
    (A round-4 edit accidentally chained the type check as
    ``if ok: types elif rows else values``, which silently skipped the
    row/value comparison for every healthy query — caught in
    self-review and pinned by ``tests/test_checker_compare.py``; keep
    these as separate guarded blocks.)"""
    problems: list[str] = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        return problems  # later layers are meaningless on different columns
    bad_types = type_mismatches(sdtypes, dschema)
    if bad_types:
        problems.append(f"type-family mismatch {bad_types}")
    if len(srows) != len(drows):
        problems.append(f"rows spark={len(srows)} duck={len(drows)}")
        return problems
    sm, dm = df_multiset(srows, scols), df_multiset(drows, dcols)
    if sm != dm:
        diff_s = list((sm - dm).items())[:3]
        diff_d = list((dm - sm).items())[:3]
        problems.append(
            f"value mismatch\n  spark-only: {diff_s}\n  duck-only:  {diff_d}"
        )
    return problems


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
        try:
            dschema = [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()]
        except Exception:  # noqa: BLE001 - DESCRIBE can choke on some CTEs; value check still runs
            dschema = []
        problems = compare_result(scols, srows, sdf.dtypes, dcols, drows, dschema)
        if problems:
            for p in problems:
                print(f"FAIL  {name}: {p}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
