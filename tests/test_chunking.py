"""Token-window chunking: boundary semantics, determinism, plan shape."""

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.chunking import (
    chunk_by_tokens,
    chunk_stats,
)


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return chunk_by_tokens(df, "text", "doc_id", **kw)


def test_window_stride_coverage(spark):
    # 10 tokens, window 4, stride 3 -> starts 0,3,6,9
    text = " ".join(f"t{i}" for i in range(10))
    out = _chunks(spark, [(1, text)], window=4, stride=3).collect()
    got = [(r["chunk_idx"], r["token_start"], r["chunk_text"], r["n_tokens"]) for r in out]
    assert got == [
        (0, 0, "t0 t1 t2 t3", 4),
        (1, 3, "t3 t4 t5 t6", 4),
        (2, 6, "t6 t7 t8 t9", 4),
        (3, 9, "t9", 1),
    ]
    # every token appears in at least one chunk; consecutive chunks
    # overlap by window - stride = 1 token
    assert set(" ".join(c[2] for c in got).split()) == {f"t{i}" for i in range(10)}


def test_short_and_empty_docs(spark):
    out = _chunks(
        spark, [(1, "only three tokens"), (2, ""), (3, "   .,;  ")], window=8, stride=8
    ).collect()
    assert [(r["doc_id"], r["chunk_text"], r["n_tokens"]) for r in out] == [
        (1, "only three tokens", 3)
    ]  # empty / punctuation-only docs produce no chunks


def test_no_overlap_stride_equals_window(spark):
    text = " ".join(f"w{i}" for i in range(9))
    out = _chunks(spark, [(1, text)], window=3, stride=3).collect()
    texts = [r["chunk_text"] for r in out]
    assert texts == ["w0 w1 w2", "w3 w4 w5", "w6 w7 w8"]
    # partition: no token duplicated when stride == window
    all_tokens = " ".join(texts).split()
    assert len(all_tokens) == len(set(all_tokens)) == 9


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="positive"):
        chunk_by_tokens(df, "text", "doc_id", window=0, stride=1)
    with pytest.raises(ValueError, match="drop tokens"):
        chunk_by_tokens(df, "text", "doc_id", window=4, stride=5)


def test_chunk_stats(spark):
    text = " ".join(f"t{i}" for i in range(10))
    chunks = _chunks(spark, [(1, text), (2, "a b")], window=4, stride=3)
    stats = {r["doc_id"]: r for r in chunk_stats(chunks, "doc_id").collect()}
    assert (stats[1]["n_chunks"], stats[1]["total_tokens"], stats[1]["last_chunk_tokens"]) == (4, 13, 1)
    assert (stats[2]["n_chunks"], stats[2]["total_tokens"], stats[2]["last_chunk_tokens"]) == (1, 2, 2)


def test_chunking_plan_has_no_exchange(spark):
    """Chunking is a flat-map projection — repartitioning the corpus
    must not appear anywhere in its plan."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = chunk_by_tokens(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- packing


def _pack(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from orion_etl_oracle_to_postgres_spark.operators.chunking import pack_sequences

    return pack_sequences(df, "text", "doc_id", **kw)


def test_pack_greedy_next_fit_semantics(spark):
    # one shard so the fold order is just doc_id order; budget 5 tokens
    rows = [
        (1, "a b c"),        # 3 tokens -> bin 0 (fill 3)
        (2, "d e"),          # 2 tokens -> bin 0 (fill 5, exactly budget)
        (3, "f"),            # 1 token  -> bin 1 (5+1 > 5)
        (4, "g h i j k l"),  # 6 tokens, oversize -> bin 2 alone
        (5, "m"),            # 1 token  -> bin 3 (6+1 > 5)
    ]
    out = {r["doc_id"]: r["bin_id"] for r in _pack(spark, rows, budget=5, n_shards=1).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3}


def test_pack_deterministic_across_partitioning(spark):
    rows = [(i, "tok " * (1 + i % 7)) for i in range(60)]
    df1 = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(13)
    df8 = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
    from orion_etl_oracle_to_postgres_spark.operators.chunking import pack_sequences

    a = sorted(map(tuple, pack_sequences(df1, "text", "doc_id", budget=16, n_shards=4).collect()))
    b = sorted(map(tuple, pack_sequences(df8, "text", "doc_id", budget=16, n_shards=4).collect()))
    assert a == b and len(a) == 60


def test_pack_budget_respected_except_oversize(spark):
    rows = [(i, "w " * (1 + (i * 37) % 11)) for i in range(80)]
    from orion_etl_oracle_to_postgres_spark.operators.chunking import (
        pack_sequences,
        pack_stats,
    )

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = pack_sequences(df, "text", "doc_id", budget=12, n_shards=3)
    stats = pack_stats(packed, budget=12).collect()
    # every doc here is <= 11 tokens < budget, so every bin obeys it
    assert all(r["fill"] <= 12 for r in stats)
    # bins are reasonably full: waste only when the next doc didn't fit
    assert all(r["n_docs"] >= 1 for r in stats)


def test_pack_rejects_bad_params(spark):
    import pytest as _pt

    with _pt.raises(ValueError):
        _pack(spark, [(1, "a")], budget=0)
    with _pt.raises(ValueError):
        _pack(spark, [(1, "a")], n_shards=0)


def test_pack_string_ids(spark):
    rows = [(f"doc-{i}", "tok " * (1 + i % 5)) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from orion_etl_oracle_to_postgres_spark.operators.chunking import pack_sequences

    out = pack_sequences(df, "text", "doc_id", budget=8, n_shards=2).collect()
    assert len(out) == 30
    assert all(isinstance(r["doc_id"], str) for r in out)


def test_length_bucket_batches_semantics(spark):
    from orion_etl_oracle_to_postgres_spark.operators.chunking import (
        length_bucket_batches,
    )

    rows = [(i, "w " * (5 if i < 6 else 40)) for i in range(10)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = length_bucket_batches(
        df, "text", "doc_id", bucket_tokens=10, batch_size=2
    ).collect()
    got = {r["doc_id"]: r for r in out}
    # NULL text dropped
    assert 99 not in got
    # short docs (5 tokens) in bucket 0, long (40) in bucket 4
    assert all(got[i]["bucket"] == 0 for i in range(6))
    assert all(got[i]["bucket"] == 4 for i in range(6, 10))
    # batches never mix buckets and never exceed batch_size
    from collections import Counter

    per_batch = Counter(r["batch_id"] for r in out)
    assert all(v <= 2 for v in per_batch.values())
    buckets_per_batch = {}
    for r in out:
        buckets_per_batch.setdefault(r["batch_id"], set()).add(r["bucket"])
    assert all(len(s) == 1 for s in buckets_per_batch.values())
    # determinism under repartitioning
    again = {
        r["doc_id"]: r["batch_id"]
        for r in length_bucket_batches(
            df.repartition(5), "text", "doc_id", bucket_tokens=10, batch_size=2
        ).collect()
    }
    assert again == {k: v["batch_id"] for k, v in got.items()}
