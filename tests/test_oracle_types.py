"""Type-audit sweep over every registered oracle (VERDICT r3 ask #5).

For each ``queries()`` entry with an ``oracle_sql()`` twin, compare the
Spark result schema's type *families* against DuckDB's ``DESCRIBE`` of
the oracle SQL. This is the gate that makes the HUGEINT class (DuckDB
integer ``sum()`` -> HUGEINT, canonicalized to float64 by the driver
while Spark stays int64) impossible to ship a third time: a local
fetchall() value-compare can't see it because duckdb returns HUGEINT as
a Python int, but the declared types always diverge.

Runs at sf0.001 so the whole sweep is cheap; only ``df.dtypes`` is
needed from Spark (no collect) — queries whose builders run internal
actions (codebook probes etc.) stay fast at this scale.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import __spark_entry__ as entry_mod
from check_correctness import TABLES, type_mismatches

SF_DIR = "/root/testdata/sf0.001"

_ORACLES = entry_mod.oracle_sql()
_QUERIES = entry_mod.queries()
_NAMES = sorted(n for n in _QUERIES if n in _ORACLES)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_type_families_match(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR)
    dschema = [(r[0], r[1]) for r in duck.execute(
        f"DESCRIBE {_ORACLES[name]}"
    ).fetchall()]
    assert sorted(c for c, _ in dschema) == sorted(sdf.columns), (
        f"column sets differ: duck={sorted(c for c, _ in dschema)} "
        f"spark={sorted(sdf.columns)}"
    )
    bad = type_mismatches(sdf.dtypes, dschema)
    assert not bad, (
        f"type-family mismatch (col, spark, duck): {bad} — cast the oracle "
        f"SQL (e.g. ::BIGINT on integer sums) or the Spark column so the "
        f"driver's pandas canonicalization sees the same family"
    )


def test_hugeint_class_is_caught():
    """Failing-before/green-after regression for VERDICT r3 #1: an
    uncast DuckDB integer sum (HUGEINT) against a Spark bigint column
    must be reported as a mismatch by the checker."""
    con = duckdb.connect()
    dschema = [
        (r[0], r[1])
        for r in con.execute("DESCRIBE SELECT sum(x) AS n FROM (VALUES (1), (2)) t(x)").fetchall()
    ]
    assert dschema[0][1].upper() == "HUGEINT"
    assert type_mismatches([("n", "bigint")], dschema) == [("n", "int", "hugeint")]
    # and the cast version is clean
    dschema2 = [
        (r[0], r[1])
        for r in con.execute(
            "DESCRIBE SELECT sum(x)::BIGINT AS n FROM (VALUES (1), (2)) t(x)"
        ).fetchall()
    ]
    assert type_mismatches([("n", "bigint")], dschema2) == []
    con.close()
