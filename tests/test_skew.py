"""Salted skew-join: result equivalence with a plain join, salt key
distribution, and hot-key-only replication."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on key 0 (power-law hot key), the rest uniform 1..99
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    return big, dim


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_matches_plain_join(spark, skewed):
    big, dim = skewed
    plain = big.join(dim, ["k"])
    salted = salted_join(big, dim, ["k"], salt=8)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_left_matches_plain_join(spark, skewed):
    big, dim = skewed
    # drop some dim keys so left-join null rows exist
    dim2 = dim.filter(F.col("k") < 50)
    plain = big.join(dim2, ["k"], "left")
    salted = salted_join(big, dim2, ["k"], "left", salt=8)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_hot_key_restricted_salting(spark, skewed):
    big, dim = skewed
    hot = spark.createDataFrame([(0,)], "k long")
    plain = big.join(dim, ["k"])
    salted = salted_join(big, dim, ["k"], salt=8, hot_keys=hot)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salt_spreads_hot_key(spark, skewed):
    """The hot key's rows must land on several (key, salt) reducer keys."""
    big, _ = skewed
    s = big.withColumn("__salt", (F.rand(42) * 8).cast("int"))
    n = (
        s.filter(F.col("k") == 0)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n == 8


def test_right_join_rejected(spark, skewed):
    big, dim = skewed
    with pytest.raises(ValueError):
        salted_join(big, dim, ["k"], "right")
