"""Heavy hitters: exactness proof gate, MG merge bound, determinism."""

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.freq import heavy_hitters_exact


def _freqs(spark, pairs, parts=4):
    rows = [(key,) for key, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, ["k"]).repartition(parts)


def test_matches_plain_aggregate(spark):
    pairs = [(f"w{i}", 1 + (i * 7) % 23) for i in range(300)]
    df = _freqs(spark, pairs)
    got = [(r["k"], r["n"]) for r in heavy_hitters_exact(df, "k", k=10, counters=512).collect()]
    exp = [
        (r["k"], r["n"])
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("k")).limit(10).collect()
    ]
    assert got == exp


def test_small_dictionary_no_eviction_is_exact(spark):
    # fewer distinct keys than k: exact because nothing was ever evicted
    df = _freqs(spark, [("a", 5), ("b", 3), ("c", 1)])
    got = [(r["k"], r["n"]) for r in heavy_hitters_exact(df, "k", k=10, counters=64).collect()]
    assert got == [("a", 5), ("b", 3), ("c", 1)]


def test_unprovable_raises(spark):
    # 600 distinct keys, all count 1, tiny counter budget: the k-th
    # count (1) can never beat the miss bound -> must refuse
    df = _freqs(spark, [(f"u{i}", 1) for i in range(600)], parts=2)
    with pytest.raises(ValueError, match="cannot prove"):
        heavy_hitters_exact(df, "k", k=5, counters=16)


def test_skewed_keys_survive_small_budget(spark):
    # a few heavy keys over uniform noise: the classic MG win
    pairs = [("hot1", 400), ("hot2", 300), ("hot3", 200)] + [
        (f"n{i}", 1) for i in range(200)
    ]
    df = _freqs(spark, pairs, parts=8)
    got = [(r["k"], r["n"]) for r in heavy_hitters_exact(df, "k", k=3, counters=128).collect()]
    assert got == [("hot1", 400), ("hot2", 300), ("hot3", 200)]


def test_bad_params(spark):
    df = _freqs(spark, [("a", 1)])
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "k", k=0)
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "k", k=10, counters=10)
