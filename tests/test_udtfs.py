"""[EXT] Spark 4 Python UDTF surface (functions/udtfs.py)."""

from __future__ import annotations

from orion_etl_oracle_to_postgres_spark.functions.udtfs import register_udtfs


def test_split_sentences_lateral(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [
            (1, "Hello there. How are you?  Fine!"),
            (2, None),          # NULL -> no rows
            (3, "..."),         # only delimiters -> no rows
            (4, " solo "),
        ],
        ["doc_id", "text"],
    )
    df.createOrReplaceTempView("udtf_t")
    out = spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence "
        "FROM udtf_t d, LATERAL split_sentences(d.text, '[.!?]+') s"
    )
    rows = {(r["doc_id"], r["sent_idx"], r["sentence"]) for r in out.collect()}
    assert rows == {
        (1, 1, "Hello there"),
        (1, 2, "How are you"),
        (1, 3, "Fine"),
        (4, 1, "solo"),
    }


def test_register_idempotent(spark):
    register_udtfs(spark)
    register_udtfs(spark)
    assert spark.sql(
        "SELECT * FROM split_sentences('a.b', '[.]')"
    ).count() == 2
