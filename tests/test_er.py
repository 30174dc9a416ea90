"""[EXT] Entity resolution: blocking + Levenshtein fuzzy join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.er import (
    default_block_key,
    fuzzy_join,
)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "acme widgets"), (2, "ACME widgetz"), (3, "zenith gears")],
        "lid int, name string",
    )
    right = spark.createDataFrame(
        [(10, "acme widgets"), (11, "zenith gear"), (12, "other thing")],
        "rid int, name string",
    )
    return left, right


def test_fuzzy_join_matches_within_bound(spark):
    left, right = _frames(spark)
    out = fuzzy_join(left, right, "name", "name", max_distance=1).collect()
    got = {(r["lid"], r["rid"]): r["distance"] for r in out}
    assert got[(1, 10)] == 0          # exact
    assert (3, 11) in got and got[(3, 11)] == 1  # deletion within bound
    assert all(rid != 12 for (_, rid) in got)  # different block, never compared


def test_fuzzy_join_verify_is_case_sensitive(spark):
    # blocking is case-insensitive (ACME and acme share a block) but the
    # verify distance runs on the RAW strings: 'ACME widgetz' vs
    # 'acme widgets' = 4 case edits + 1 substitution = 5 > 1 -> no match.
    # Callers wanting case-blind matching lowercase the columns first.
    left, right = _frames(spark)
    out = fuzzy_join(left, right, "name", "name", max_distance=1).collect()
    pairs = {(r["lid"], r["rid"]) for r in out}
    assert (2, 10) not in pairs


def test_fuzzy_join_block_cap_drops_degenerate(spark):
    left = spark.createDataFrame([(1, "x a")], "lid int, name string")
    right = spark.createDataFrame(
        [(i, "x b") for i in range(5)], "rid int, name string"
    )
    out = fuzzy_join(left, right, "name", "name",
                     max_distance=1, max_block_size=4).collect()
    assert out == []  # block 'x' has 5 right rows > cap -> dropped


def test_fuzzy_join_guards(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(left, right, "name", "name", max_distance=-1)
    with pytest.raises(ValueError, match="max_block_size"):
        fuzzy_join(left, right, "name", "name", max_block_size=0)


def test_default_block_key_first_token_lower(spark):
    df = spark.createDataFrame([("  Acme  Widgets ",)], "s string")
    assert df.select(default_block_key(F.col("s")).alias("b")).collect()[0]["b"] == "acme"


def test_fuzzy_join_custom_block_fn(spark):
    # block on the LAST token instead: 'acme widgets' vs 'best widgets'
    # share a block and are 4 edits apart -> matched at bound 4
    left = spark.createDataFrame([(1, "acme widgets")], "lid int, name string")
    right = spark.createDataFrame([(9, "best widgets")], "rid int, name string")
    last_tok = lambda c: F.element_at(F.split(F.trim(c), r"\s+"), -1)  # noqa: E731
    out = fuzzy_join(
        left, right, "name", "name", max_distance=4, block_fn=last_tok
    ).collect()
    assert [(r["lid"], r["rid"], r["distance"]) for r in out] == [(1, 9, 4)]


def test_fuzzy_join_rename_collision_is_resolved(spark):
    # left already has name_r: the right 'name' must get a fresh suffix,
    # not collide into a duplicate name_r
    left = spark.createDataFrame(
        [(1, "acme widgets", "decoy")], "lid int, name string, name_r string"
    )
    right = spark.createDataFrame([(9, "acme widgets")], "rid int, name string")
    out = fuzzy_join(left, right, "name", "name", max_distance=0)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["distance"] == 0
    assert len(set(out.columns)) == len(out.columns)  # all names unique


def test_resolve_entities_clusters_and_canonical(spark):
    from orion_etl_oracle_to_postgres_spark.operators.er import resolve_entities

    rows = [
        (1, "acme widgets"),
        (2, "acme widgetz"),   # 1 edit from 1
        (3, "acme widgets!"),  # 1 edit from 1 (and 2 edits from 2: transitive)
        (4, "zenith gears"),
    ]
    df = spark.createDataFrame(rows, "id int, name string")
    out = {r["id"]: r for r in
           resolve_entities(df, "id", "name", max_distance=1).collect()}
    assert out[1]["entity_id"] == 1 and out[1]["is_canonical"]
    assert out[2]["entity_id"] == 1 and not out[2]["is_canonical"]
    assert out[3]["entity_id"] == 1  # via the transitive chain through 1
    assert out[4]["entity_id"] == 4 and out[4]["is_canonical"]
