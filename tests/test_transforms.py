"""Unit tests for the scalar transform mini-language (T1-T6, SURVEY.md
§2.6) — one test per op + chain-order semantics (§7.4.4)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.transforms import (
    apply_transform_chain,
    parse_op_token,
)


def _apply(spark, rows, ops, dtype="string"):
    df = spark.createDataFrame([(r,) for r in rows], f"v {dtype}")
    out = df.select(apply_transform_chain(F.col("v"), ops, dtype).alias("v"))
    return [r["v"] for r in out.collect()]


def test_strip(spark):
    assert _apply(spark, ["  a b  ", "x"], ["strip"]) == ["a b", "x"]


def test_trim_alias(spark):
    assert _apply(spark, [" y "], ["trim"]) == ["y"]


def test_upper_lower(spark):
    assert _apply(spark, ["aB"], ["upper"]) == ["AB"]
    assert _apply(spark, ["aB"], ["lower"]) == ["ab"]


def test_capitalize(spark):
    assert _apply(spark, ["hello world"], ["capitalize"]) == ["Hello World"]


def test_to_bool_ladder(spark):
    # ref default_transform.py:26-32: N/0→False, Y/1→True; else NULL (documented deviation)
    assert _apply(spark, ["Y", "N", "1", "0", "true", "x", None], ["to_bool"]) == [
        True, False, True, False, True, None, None,
    ]


def test_to_bool_string_hack(spark):
    # any op name containing true/false routes to to_bool (§7.4.10)
    assert _apply(spark, ["Y"], ["make_true_false"]) == [True]


def test_insert_constant_and_null(spark):
    assert _apply(spark, ["a", "b"], ["insert:XX"]) == ["XX", "XX"]
    assert _apply(spark, ["a"], ["insert:null"]) == [None]


def test_to_int_permissive(spark):
    assert _apply(spark, ["12", "x", None], ["to_int"]) == [12, None, None]


def test_to_date(spark):
    assert _apply(spark, ["2024-01-31"], ["to_date"]) == [datetime.date(2024, 1, 31)]
    assert _apply(spark, ["31/01/2024"], ["to_date:dd/MM/yyyy"]) == [
        datetime.date(2024, 1, 31)
    ]


def test_to_decimal(spark):
    import decimal

    assert _apply(spark, ["1.5"], ["to_decimal:10.2"]) == [decimal.Decimal("1.50")]


def test_chain_order_sensitive(spark):
    # strip then upper ≠ upper of padded string with trailing marker
    assert _apply(spark, ["  ab  "], ["strip", "upper"]) == ["AB"]
    assert _apply(spark, ["ab"], ["upper", "insert:z"]) == ["z"]


def test_unknown_op_is_identity(spark):
    # ref default_transform.py:38-39 — forgiving miss
    assert _apply(spark, ["q"], ["no_such_op"]) == ["q"]


def test_string_ops_skipped_on_non_string(spark):
    # reference checks isinstance(val, str) per row; we skip by column type
    assert _apply(spark, [5], ["upper"], dtype="int") == [5]


def test_parse_op_token():
    assert parse_op_token("insert:ACTIVE") == ("insert", "ACTIVE")
    assert parse_op_token("insert:a:b") == ("insert", "a:b")
    assert parse_op_token(" trim ") == ("trim", None)


def test_hash_op_salted_null_safe(spark):
    from orion_etl_oracle_to_postgres_spark.operators.transforms import op_hash

    df = spark.createDataFrame([("x",), (None,)], ["v"])
    out = df.select(op_hash(F.col("v"), "s").alias("h"), op_hash(F.col("v")).alias("h0")).collect()
    import hashlib

    assert out[0]["h"] == hashlib.sha256(b"s:x").hexdigest()
    assert out[0]["h0"] == hashlib.sha256(b"x").hexdigest()
    assert out[1]["h"] is None and out[1]["h0"] is None


def test_mask_op_lengths(spark):
    from orion_etl_oracle_to_postgres_spark.operators.transforms import op_mask

    df = spark.createDataFrame(
        [("1234567890",), ("abc",), ("abcd",), (None,)], ["v"]
    )
    got = [r["m"] for r in df.select(op_mask(F.col("v")).alias("m")).collect()]
    assert got == ["******7890", "***", "****", None]
    got2 = [r["m"] for r in df.select(op_mask(F.col("v"), "2").alias("m")).collect()]
    assert got2 == ["********90", "*bc", "**cd", None]


def test_to_decimal_precision_only_and_bad_args(spark):
    from orion_etl_oracle_to_postgres_spark.operators.transforms import op_to_decimal

    df = spark.createDataFrame([("12.5",)], ["v"])
    out = df.select(op_to_decimal(F.col("v"), "12").alias("d")).collect()
    assert str(out[0]["d"]) in ("13", "12")  # decimal(12,0) — rounded int
    import pytest as _pt

    with _pt.raises(ValueError, match="precision.scale"):
        op_to_decimal(F.col("v"), "abc")


def test_to_decimal_not_treated_as_string_downstream(spark):
    from orion_etl_oracle_to_postgres_spark.operators.transforms import (
        apply_transform_chain,
    )

    df = spark.createDataFrame([("  12.50  ",)], ["v"])
    out = df.select(
        apply_transform_chain(F.col("v"), ["strip", "to_decimal:12.2", "strip"], "string").alias("d")
    )
    # the SECOND strip must be skipped (decimal, not string): dtype stays decimal
    assert dict(out.dtypes)["d"] == "decimal(12,2)"


def test_encrypt_decrypt_round_trip_and_joinability(spark):
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.transforms import (
        apply_transform_chain,
    )

    key = "0123456789abcdef"  # 16-byte AES key
    df = spark.createDataFrame(
        [("alice",), ("bob",), ("alice",), (None,)], ["name"]
    )
    enc = df.select(
        apply_transform_chain(F.col("name"), [f"encrypt:{key}"], "string").alias("c")
    )
    rows = enc.collect()
    assert rows[3]["c"] is None  # NULL passthrough
    assert rows[0]["c"] == rows[2]["c"]  # ECB: equal plaintexts joinable
    assert rows[0]["c"] != rows[1]["c"] and rows[0]["c"] != "alice"
    dec = enc.select(
        apply_transform_chain(F.col("c"), [f"decrypt:{key}"], "string").alias("p")
    )
    assert [r["p"] for r in dec.collect()] == ["alice", "bob", "alice", None]


def test_encrypt_rejects_bad_keys(spark):
    import pytest
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.transforms import (
        apply_transform_chain,
    )

    with pytest.raises(ValueError, match="16/24/32"):
        apply_transform_chain(F.col("x"), ["encrypt:short"], "string")
    with pytest.raises(ValueError, match="needs a key"):
        apply_transform_chain(F.col("x"), ["encrypt"], "string")


def test_normalize_unicode_nfc_roundtrip(spark):
    import unicodedata

    from orion_etl_oracle_to_postgres_spark.operators.transforms import (
        op_normalize_unicode,
    )
    from pyspark.sql import functions as F

    decomposed = "Café"          # e + combining accent
    composed = unicodedata.normalize("NFC", decomposed)  # é as one codepoint
    df = spark.createDataFrame([(decomposed,), (None,)], "s string")
    got = [r["n"] for r in df.select(op_normalize_unicode(F.col("s")).alias("n")).collect()]
    assert got[0] == composed and got[0] != decomposed
    assert got[1] is None

    # NFKD form + bad form rejection
    import pytest

    with pytest.raises(ValueError, match="normalize_unicode"):
        op_normalize_unicode(F.col("s"), "bogus")


def test_normalize_unicode_in_transform_chain(spark):
    """The op resolves from the registry through the compiler chain."""
    from orion_etl_oracle_to_postgres_spark.operators.transforms import (
        apply_transform_chain,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("  Caf\u00e9  ",)], "s string")
    out = df.select(
        apply_transform_chain(
            F.col("s"), ["strip", "normalize_unicode:NFC", "upper"], "string"
        ).alias("v")
    ).collect()[0]["v"]
    assert out == "CAF\u00c9"


def test_extract_replace_lpad_ops(spark):
    from orion_etl_oracle_to_postgres_spark.operators.transforms import (
        op_extract,
        op_lpad,
        op_replace,
    )
    import pytest as _pt

    df = spark.createDataFrame(
        [("ORD-00123",), ("nope",), (None,)], "s string"
    )
    got = df.select(
        op_extract(F.col("s"), r"([0-9]+)").alias("x"),
        op_replace(F.col("s"), r"[0-9]|#").alias("r"),
        op_lpad(F.col("s"), "12,*").alias("p"),
    ).collect()
    assert got[0].x == "00123" and got[1].x is None and got[2].x is None
    assert got[0].r == "ORD-#####"
    assert got[0].p == "***ORD-00123" and got[1].p == "********nope"
    # whole-match when the pattern has no group
    assert df.select(op_extract(F.col("s"), r"[A-Z]+").alias("m")).collect()[0].m == "ORD"
    # lpad never truncates (SQL LPAD would)
    assert df.select(op_lpad(F.col("s"), "3").alias("t")).collect()[0].t == "ORD-00123"
    with _pt.raises(ValueError, match="regex"):
        op_extract(F.col("s"), None)
    with _pt.raises(ValueError, match="replace"):
        op_replace(F.col("s"), "no-pipe")
    with _pt.raises(ValueError, match="width"):
        op_lpad(F.col("s"), "zero")


def test_replace_op_escaped_pipe_in_pattern(spark):
    from orion_etl_oracle_to_postgres_spark.operators.transforms import op_replace

    df = spark.createDataFrame([("a|b|c",)], "s string")
    # pattern '\|' (escaped pipe) matches literal pipes; replacement '-'
    got = df.select(op_replace(F.col("s"), r"\|" + "|-").alias("r")).collect()[0].r
    assert got == "a-b-c"
