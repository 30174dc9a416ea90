"""As-of join + dataset-curation operators ([EXT], SURVEY.md §2.11) —
edge cases the DuckDB-differential queries can't reach: tolerance
horizons, name collisions, split-weight validation, short documents."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark.operators.asof import asof_join
from orion_etl_oracle_to_postgres_spark.operators.curation import (
    contamination_check,
    hash_split,
    weighted_sample,
)
from orion_etl_oracle_to_postgres_spark.operators.text import repetition_signals

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3"), (3, _ts(50), "p4")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(10), 2.0), (1, _ts(25), 3.0), (2, _ts(7), 4.0)],
        "k long, ts timestamp, value double",
    )
    return left, right


def test_asof_basic_and_inclusive_tie(sides):
    left, right = sides
    out = {
        r["tag"]: (r["ts_r"], r["value"])
        for r in asof_join(left, right, on="k").collect()
    }
    # equal timestamps match (>= semantics): p1 takes the ts=10 click
    assert out["p1"] == (_ts(10), 2.0)
    assert out["p2"] == (_ts(25), 3.0)
    # right row later than the left row never matches
    assert out["p3"] == (None, None)
    # key with no right rows at all: left-join null, row retained
    assert out["p4"] == (None, None)


def test_asof_tolerance_voids_stale_matches(sides):
    left, right = sides
    out = {
        r["tag"]: r["value"]
        for r in asof_join(
            left, right, on="k", tolerance_us=4 * 60 * 1_000_000
        ).collect()
    }
    # p2's nearest click is 5 min old — outside the 4-min horizon
    assert out["p1"] == 2.0 and out["p2"] is None
    assert out["p3"] is None and out["p4"] is None


def test_asof_no_collision_keeps_right_names(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, lts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 9.0)], "k long, rts timestamp, v double"
    )
    row = asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()[0]
    assert row["rts"] == _ts(5) and row["v"] == 9.0 and row["lts"] == _ts(10)


def test_hash_split_deterministic_and_seed_sensitive(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    assert a == b  # deterministic across invocations
    c = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", seed="s1").collect()}
    assert a != c  # a new seed re-deals
    # rates approximate the weights (md5 buckets ≈ uniform)
    from collections import Counter

    n = Counter(a.values())
    assert 0.85 <= n["train"] / 2000 <= 0.95
    assert 0.02 <= n["val"] / 2000 <= 0.08
    assert 0.02 <= n["test"] / 2000 <= 0.08
    assert n["train"] + n["val"] + n["test"] == 2000


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "doc_id", weights={"a": 0.5, "b": 0.6})


def test_repetition_signals_short_and_templated_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "one"),                      # < 2 tokens: zero bigram stats
            (2, "spam spam spam spam"),      # one bigram repeated
            (3, "all words fully distinct"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(df, "text", "doc_id").collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["top_bigram_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 1.0 and out[2]["distinct_word_frac"] == 0.25
    assert out[3]["top_bigram_frac"] < 1.0 and out[3]["distinct_word_frac"] == 1.0


def test_contamination_detects_verbatim_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # verbatim
            (2, "completely unrelated words about training data"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in contamination_check(
            corpus, bench, id_col="doc_id", text_col="text", shingle_n=5
        ).collect()
    }
    assert out[1]["contamination"] == 1.0
    assert out[2]["contamination"] == 0.0 and out[2]["n_matched"] == 0


def test_weighted_sample_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(4000)],
        "doc_id long, grp string",
    )
    out = weighted_sample(df, "doc_id", "grp", {"a": 1.0, "b": 0.25}).collect()
    again = weighted_sample(df, "doc_id", "grp", {"a": 1.0, "b": 0.25}).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)
    a = sum(1 for r in out if r["grp"] == "a")
    b = sum(1 for r in out if r["grp"] == "b")
    assert a == 2000  # rate 1.0 keeps everything
    assert 0.18 <= b / 2000 <= 0.32  # rate 0.25 ± hash noise
    # groups not in rates use default_rate (here: dropped entirely)
    none = weighted_sample(df, "doc_id", "grp", {"a": 0.5}).collect()
    assert all(r["grp"] == "a" for r in none)


def test_weighted_sample_rejects_bad_rate(spark):
    df = spark.range(1).withColumnRenamed("id", "doc_id").withColumn("g", F.lit("x"))
    with pytest.raises(ValueError, match="not in"):
        weighted_sample(df, "doc_id", "g", {"x": 1.5})


def test_range_join_window_boundaries(spark):
    from orion_etl_oracle_to_postgres_spark.operators.ranges import range_join

    left = spark.createDataFrame([(1, _ts(10), "L")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [
            (1, _ts(0)),    # exactly lower bound: EXCLUDED (exclusive)
            (1, _ts(3)),    # inside
            (1, _ts(10)),   # exactly upper bound: INCLUDED
            (1, _ts(11)),   # after: excluded
            (2, _ts(5)),    # other key
        ],
        "k long, ts timestamp",
    )
    out = range_join(
        left, right, on="k", lower_us=-10 * 60 * 1_000_000, upper_us=0
    ).collect()
    assert sorted(r["ts_r"] for r in out) == [_ts(3), _ts(10)]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    """Right rows near bucket edges must pair exactly once (each right
    row lives in one bucket; only the left side explodes)."""
    from orion_etl_oracle_to_postgres_spark.operators.ranges import range_join

    left = spark.createDataFrame(
        [(1, _ts(m), f"L{m}") for m in range(0, 120, 7)],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(m)) for m in range(0, 120)], "k long, ts timestamp"
    )
    out = range_join(
        left, right, on="k", lower_us=-5 * 60 * 1_000_000, upper_us=0
    ).collect()
    pairs = [(r["tag"], r["ts_r"]) for r in out]
    assert len(pairs) == len(set(pairs))
    # window (m-5, m] over whole minutes = {m-4..m}: itself + up to 4
    # predecessors, clipped at the data's start
    from collections import Counter

    per_left = Counter(tag for tag, _ in pairs)
    assert all(per_left[f"L{m}"] == min(m, 4) + 1 for m in range(0, 120, 7))


def test_range_join_rejects_empty_window(spark):
    from orion_etl_oracle_to_postgres_spark.operators.ranges import range_join

    df = spark.createDataFrame([(1, _ts(0))], "k long, ts timestamp")
    with pytest.raises(ValueError, match="empty window"):
        range_join(df, df, on="k", lower_us=0, upper_us=0)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    from orion_etl_oracle_to_postgres_spark import queries as q

    exact = {
        r["day"]: r["n_users"]
        for r in q.QUERIES["agg_distinct_users_daily"](spark, sf_dir).collect()
    }
    approx_rows = q.QUERIES["agg_approx_distinct_users_daily"](
        spark, sf_dir
    ).collect()
    approx = {r["day"]: r for r in approx_rows}
    assert exact.keys() == approx.keys()
    for day, n in exact.items():
        r = approx[day]
        # the query now carries its own bounded-error audit (the oracle
        # pins within_error_bound TRUE); verify the exact twin matches
        # the independently computed exact counts too
        assert r["n_users_exact"] == n
        assert r["within_error_bound"] is True


def test_asof_join_randomized_vs_reference(spark):
    """300×300 seeded-random rows against a pure-Python reference
    (argmax over right ts <= left ts per key) — exact match."""
    import random

    rng = random.Random(42)
    keys = list(range(8))
    right_rows = []
    seen = set()
    for _ in range(300):
        k, m = rng.choice(keys), rng.randint(0, 5000)
        if (k, m) in seen:
            continue
        seen.add((k, m))
        right_rows.append((k, _ts(m), float(rng.randint(1, 99))))
    left_rows = [
        (rng.choice(keys + [99]), _ts(rng.randint(0, 5000)), i)
        for i in range(300)
    ]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, value double")

    got = {
        r["lid"]: (r["ts_r"], r["value"])
        for r in asof_join(left, right, on="k").collect()
    }
    by_key: dict = {}
    for k, ts, v in right_rows:
        by_key.setdefault(k, []).append((ts, v))
    for k, lst in by_key.items():
        lst.sort()
    for k, lts, lid in left_rows:
        cands = [(ts, v) for ts, v in by_key.get(k, []) if ts <= lts]
        want = max(cands) if cands else (None, None)
        assert got[lid] == want, f"lid={lid}"


def test_range_join_randomized_vs_reference(spark):
    """Seeded-random interval join vs the quadratic reference —
    identical pair multisets, including bucket-boundary cases."""
    import random

    from orion_etl_oracle_to_postgres_spark.operators.ranges import range_join

    rng = random.Random(43)
    left_rows = [
        (rng.randint(0, 5), _ts(rng.randint(0, 2000)), i) for i in range(250)
    ]
    right_rows = [
        (rng.randint(0, 5), _ts(rng.randint(0, 2000)), 1000 + i)
        for i in range(250)
    ]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, rid long")
    lower, upper = -37 * 60 * 1_000_000, 11 * 60 * 1_000_000

    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join(
            left, right, on="k", lower_us=lower, upper_us=upper
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for (lk, lts, lid) in left_rows
        for (rk, rts, rid) in right_rows
        if lk == rk
        and (rts - lts).total_seconds() * 1_000_000 > lower
        and (rts - lts).total_seconds() * 1_000_000 <= upper
    )
    assert got == want


def test_curate_corpus_stages_compose(spark):
    """Duplicates lose to their min-id survivor BEFORE quality gating;
    groups mix at their rates; every surviving row gets a split."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import curate_corpus

    good = "this is a perfectly reasonable training document " * 4
    rows = [
        (1, good, "en"),
        (2, good.upper(), "en"),       # dup of 1 after normalization
        (3, "x! @# $%", "en"),         # junk: fails the quality gate
        (4, good + " different tail words here", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r
        for r in curate_corpus(
            df,
            id_col="doc_id",
            text_col="text",
            group_col="lang",
            rates={"en": 1.0, "de": 1.0},
        ).collect()
    }
    assert set(out) == {1, 4}  # 2 deduped away, 3 quality-dropped
    assert all(r["split"] in {"train", "val", "test"} for r in out.values())
    assert out[1]["quality"] >= 0.5 and out[4]["lang"] == "de"


def test_stratified_sample_exact_counts_and_determinism(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import stratified_sample

    rows = [(i, "en" if i % 3 else "de") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "doc_id", "lang", 5)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
    ).collect()}
    assert counts == {"en": 5, "de": 5}
    # deterministic across repartitionings
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in stratified_sample(df.repartition(7), "doc_id", "lang", 5).collect()}
    assert a == b
    # undersized group: returns the whole group, not an error
    tiny = spark.createDataFrame([(1, "fr"), (2, "fr")], "doc_id long, lang string")
    assert stratified_sample(tiny, "doc_id", "lang", 5).count() == 2


def test_stratified_sample_seed_redeals(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import stratified_sample

    df = spark.createDataFrame([(i, "en") for i in range(200)], "doc_id long, lang string")
    a = {r["doc_id"] for r in stratified_sample(df, "doc_id", "lang", 20, seed="s1").collect()}
    b = {r["doc_id"] for r in stratified_sample(df, "doc_id", "lang", 20, seed="s2").collect()}
    assert len(a) == len(b) == 20 and a != b


def test_stratified_sample_rejects_bad_n(spark):
    import pytest as _pytest
    from orion_etl_oracle_to_postgres_spark.operators.curation import stratified_sample

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with _pytest.raises(ValueError, match="positive"):
        stratified_sample(df, "doc_id", "lang", 0)


def test_split_leakage_flags_cross_split_duplicates(spark):
    """Constructed leak: identical text under many different ids MUST
    eventually straddle a split boundary; unique texts never flagged."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        hash_split,
        split_leakage,
    )

    dup = "the same leaked document body repeated verbatim"
    rows = [(i, dup) for i in range(40)] + [(100 + i, f"unique text {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # ground truth: which splits did the dup cluster actually land in?
    splits = {
        r["split"]
        for r in hash_split(df.filter("doc_id < 40"), "doc_id").select("split").collect()
    }
    assert len(splits) > 1  # 40 ids over a 90/5/5 deal: crossing is certain here
    leaks = split_leakage(df, "doc_id", "text").collect()
    assert len(leaks) == 1
    row = leaks[0]
    assert row["n_docs"] == 40
    assert row["n_splits"] == len(splits)
    assert set(row["splits"].split(",")) == splits


def test_declarative_sample_split_spec(spark, tmp_path):
    """SampleSpec + SplitSpec compile into the pipeline; bad columns
    fail loudly at compile time."""
    import pytest as _pt

    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        MappingSpec,
        SampleSpec,
        SplitSpec,
        TableSpec,
    )

    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(200)], ["id", "lang"]
    ).write.parquet(str(src / "t.parquet"))
    ctx = JobContext(
        spark,
        GlobalSpec(connectors=ConnectorsSpec(source_files=FilesConnectorSpec(base_path=str(src)))),
    )

    def mkspec(**kw):
        return TableSpec(
            source_table="t",
            target_table="t2",
            mappings=[MappingSpec(source="id", target="id"), MappingSpec(source="lang", target="lang")],
            **kw,
        )

    spec = mkspec(
        sample=SampleSpec(id_column="id", group_column="lang", rates={"en": 1.0, "de": 0.4}),
        split=SplitSpec(id_column="id", column_name="fold"),
    )
    out = compile_table(ctx, spec).df
    rows = out.collect()
    assert set(out.columns) == {"id", "lang", "fold"}
    # all en kept, ~40% de kept, deterministically
    n_en = sum(1 for r in rows if r["lang"] == "en")
    n_de = sum(1 for r in rows if r["lang"] == "de")
    assert n_en == 100 and 20 <= n_de <= 60
    assert set(r["fold"] for r in rows) <= {"train", "val", "test"}
    # re-compile gives the identical sample (determinism)
    again = compile_table(ctx, spec).df.collect()
    assert sorted(r["id"] for r in again) == sorted(r["id"] for r in rows)

    with _pt.raises(ValueError, match="sample column"):
        compile_table(ctx, mkspec(sample=SampleSpec(id_column="nope", group_column="lang", rates={})))
    with _pt.raises(ValueError, match="split id_column"):
        compile_table(ctx, mkspec(split=SplitSpec(id_column="nope")))


def test_asof_ignores_null_right_timestamps(spark):
    from orion_etl_oracle_to_postgres_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100), (1, 200)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, None, "NULLROW"), (1, 150, "ok")], "k long, ts long, tag string"
    )
    out = {r["ts"]: r["tag"] for r in asof_join(left, right, on="k").collect()}
    # ts=100 has NO earlier real right row -> null match, never NULLROW
    assert out == {100: None, 200: "ok"}


def test_hash_split_rejects_out_of_range_weights(spark):
    import pytest as _pt

    from orion_etl_oracle_to_postgres_spark.operators.curation import hash_split

    df = spark.createDataFrame([(1,)], ["id"])
    with _pt.raises(ValueError, match="not in \\[0, 1\\]"):
        hash_split(df, "id", weights={"train": 1.05, "test": -0.05})


def test_sample_n_exact_and_partition_stable(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import sample_n

    rows = [(i, f"d{i}") for i in range(500)]
    a = sample_n(
        spark.createDataFrame(rows, ["id", "x"]).repartition(17), "id", 25
    ).collect()
    b = sample_n(
        spark.createDataFrame(rows, ["id", "x"]).coalesce(1), "id", 25
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) == 25
    # different seed re-deals
    c = sample_n(
        spark.createDataFrame(rows, ["id", "x"]), "id", 25, seed="other"
    ).collect()
    assert sorted(r["id"] for r in c) != sorted(r["id"] for r in a)
    import pytest as _pt

    with _pt.raises(ValueError):
        sample_n(spark.createDataFrame(rows, ["id", "x"]), "id", 0)


def test_balance_groups_minority_size(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import balance_groups

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(7)]
    df = spark.createDataFrame(rows, ["id", "g"])
    out = balance_groups(df, "id", "g")
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert counts == {"big": 7, "small": 7}
    # deterministic under repartitioning
    out2 = balance_groups(df.repartition(13), "id", "g")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in out2.collect()}


def test_assign_stable_ids_dense_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.curation import assign_stable_ids

    df = spark.createDataFrame([(i,) for i in range(500)], ["id"])
    out = assign_stable_ids(df, "id", n_buckets=16)
    ids = sorted(r["stable_id"] for r in out.collect())
    assert ids == list(range(500))  # dense 0..n-1, no gaps/dups
    # invariant under input partitioning, equals the naive global window
    out2 = assign_stable_ids(df.repartition(7), "id", n_buckets=3)
    m1 = {r["id"]: r["stable_id"] for r in out.collect()}
    m2 = {r["id"]: r["stable_id"] for r in out2.collect()}
    assert m1 == m2
    from orion_etl_oracle_to_postgres_spark.functions import md5_hash60
    from pyspark.sql.window import Window

    naive = df.withColumn(
        "sid",
        F.row_number().over(
            Window.orderBy(
                md5_hash60(F.concat(F.col("id").cast("string"), F.lit(":sid0"))),
                F.col("id"),
            )
        )
        - 1,
    )
    m3 = {r["id"]: r["sid"] for r in naive.collect()}
    assert m1 == m3


def test_priority_sample_exact_k_and_weight_bias(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        priority_sample,
    )

    # 200 light rows (w=1) + 200 heavy rows (w=50): heavy ids must
    # dominate the sample under A-ES
    rows = [(i, 1.0) for i in range(200)] + [(i, 50.0) for i in range(200, 400)]
    df = spark.createDataFrame(rows, "id int, w double")
    got = priority_sample(df, "id", "w", 40).collect()
    assert len(got) == 40
    heavy = sum(1 for r in got if r["id"] >= 200)
    assert heavy > 30  # w-ratio 50:1 → expect nearly all heavy

    # deterministic: identical result on re-run
    again = priority_sample(df, "id", "w", 40).collect()
    assert [r["id"] for r in got] == [r["id"] for r in again]
    # different seed re-deals
    other = priority_sample(df, "id", "w", 40, seed="prio1").collect()
    assert [r["id"] for r in got] != [r["id"] for r in other]


def test_priority_sample_guards(spark):
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        priority_sample,
    )

    df = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, -1.0), (4, 0.0)], "id int, w double"
    )
    with pytest.raises(ValueError, match="k must be positive"):
        priority_sample(df, "id", "w", 0)
    # null/zero/negative weights excluded -> only id 1 eligible
    got = priority_sample(df, "id", "w", 10).collect()
    assert [r["id"] for r in got] == [1]


# ---------------------------------------------------------------------------
# token_budget_sample
# ---------------------------------------------------------------------------


def test_token_budget_sample_prefix_semantics(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        token_budget_sample,
    )

    rows = [
        (1, "g1", "a b c d e"),          # 5 tokens
        (2, "g1", "f g h"),              # 3 tokens
        (3, "g1", "i j k l"),            # 4 tokens
        (4, "g2", "one two"),            # 2 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id int, grp string, text string")
    out = token_budget_sample(df, "text", "doc_id", "grp", 6)
    got = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    # g2's single doc always kept (before-sum 0 < 6)
    assert got[4] == 2
    # g1: docs in hash order are taken until cumulative >= 6; exactly
    # the prefix whose before-sum < 6 survives -> kept token total in
    # [6, 6 + max_doc) unless the group ran out
    kept_g1 = [got[k] for k in got if k != 4]
    assert sum(kept_g1) >= 6 or len(kept_g1) == 3
    # determinism: same seed -> same selection
    again = {
        r["doc_id"]
        for r in token_budget_sample(df, "text", "doc_id", "grp", 6).collect()
    }
    assert again == set(got)


def test_token_budget_sample_rejects_bad_budget(spark):
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        token_budget_sample,
    )

    df = spark.createDataFrame([(1, "g", "x")], "doc_id int, grp string, text string")
    with pytest.raises(ValueError, match="positive"):
        token_budget_sample(df, "text", "doc_id", "grp", 0)


def test_declarative_token_budget_sample(spark, tmp_path):
    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        MappingSpec,
        SampleSpec,
        TableSpec,
    )
    import pytest as _pt
    from pydantic import ValidationError

    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "tok " * (i % 7 + 1)) for i in range(60)],
        ["id", "lang", "body"],
    ).write.parquet(str(src / "t.parquet"))
    ctx = JobContext(
        spark,
        GlobalSpec(
            connectors=ConnectorsSpec(
                source_files=FilesConnectorSpec(base_path=str(src))
            )
        ),
    )
    spec = TableSpec(
        source_table="t",
        target_table="t2",
        mappings=[
            MappingSpec(source="id", target="id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="body", target="body"),
        ],
        sample=SampleSpec(
            method="token_budget",
            id_column="id",
            group_column="lang",
            text_column="body",
            budget_tokens=20,
        ),
    )
    out = compile_table(ctx, spec).df
    rows = out.collect()
    assert "n_tokens" in out.columns
    per_group = {}
    for r in rows:
        per_group.setdefault(r["lang"], 0)
        per_group[r["lang"]] += r["n_tokens"]
    # every group reaches its budget (plenty of rows available)
    assert all(v >= 20 for v in per_group.values())

    # validation: missing budget fields fail at spec build time
    with _pt.raises(ValidationError, match="token_budget"):
        SampleSpec(method="token_budget", id_column="id")
    # compile-time: text column absent from the pipeline output
    bad = TableSpec(
        source_table="t",
        target_table="t2",
        mappings=[MappingSpec(source="id", target="id")],
        sample=SampleSpec(
            method="token_budget",
            id_column="id",
            group_column="lang",
            text_column="body",
            budget_tokens=20,
        ),
    )
    with _pt.raises(ValueError, match="sample column"):
        compile_table(ctx, bad)


def test_token_budget_sample_null_text(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(1, "g", None), (2, "g", "a b c"), (3, "g", "d e f")],
        "doc_id int, grp string, text string",
    )
    out = {r["doc_id"]: r["n_tokens"] for r in token_budget_sample(df, "text", "doc_id", "grp", 4).collect()}
    # NULL doc carries NULL n_tokens and consumes no budget (never -1
    # crediting a token back); budget still caps the text docs
    assert out.get(1, "absent") in (None, "absent")
    kept_text = [v for k, v in out.items() if k != 1]
    assert sum(v for v in kept_text) >= 3


def test_temperature_mix_upweights_small_groups(spark):
    """alpha=0.5 must give the small group a HIGHER keep rate than the
    large one (rate ∝ n^-0.5), with the expected total near the budget,
    and the whole mix must be a broadcast-joined projection (the corpus
    never shuffles)."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        temperature_mix,
    )

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = temperature_mix(df, "id", "g", budget_rows=500, alpha=0.5)
    got = out.groupBy("g").count().collect()
    by_g = {r["g"]: r["count"] for r in got}
    # exact expected thresholds: w_big = floor(30*1000)=30000,
    # w_small = 10000, sw = 40000;
    # thr_big = floor(500*1000*30000/(40000*900)) = floor(416.66) = 416
    # thr_small = floor(500*1000*10000/(40000*100)) = 1000 (capped)
    assert by_g["small"] == 100  # rate 1.0: every small row kept
    assert 0 < by_g["big"] < 900
    # keep RATE of small strictly above big's
    assert by_g["small"] / 100 > by_g["big"] / 900
    # deterministic across repartition
    again = temperature_mix(
        df.repartition(7), "id", "g", budget_rows=500, alpha=0.5
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_temperature_mix_alpha_bounds_and_budget(spark):
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        temperature_mix,
    )

    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, "id", "g", budget_rows=1, alpha=1.5)
    with pytest.raises(ValueError, match="budget_rows"):
        temperature_mix(df, "id", "g", budget_rows=-1)
    # zero budget keeps nothing
    assert temperature_mix(df, "id", "g", budget_rows=0).count() == 0


def test_declarative_temperature_sample(spark, tmp_path):
    import pytest as _pt
    from pydantic import ValidationError

    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        temperature_mix,
    )
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        MappingSpec,
        SampleSpec,
        TableSpec,
    )

    src = tmp_path / "src"
    df = spark.createDataFrame(
        [(i, "big" if i < 450 else "small") for i in range(500)], ["id", "grp"]
    )
    df.write.parquet(str(src / "t.parquet"))
    ctx = JobContext(
        spark,
        GlobalSpec(
            connectors=ConnectorsSpec(
                source_files=FilesConnectorSpec(base_path=str(src))
            )
        ),
    )
    spec = TableSpec(
        source_table="t",
        target_table="t2",
        mappings=[
            MappingSpec(source="id", target="id"),
            MappingSpec(source="grp", target="grp"),
        ],
        sample=SampleSpec(
            method="temperature", id_column="id", group_column="grp",
            budget_rows=200,
        ),
    )
    got = {tuple(r) for r in compile_table(ctx, spec).df.collect()}
    want = {
        tuple(r)
        for r in temperature_mix(
            df.withColumnRenamed("grp", "grp"), "id", "grp",
            budget_rows=200, alpha=0.5, seed="mix0",
        ).collect()
    }
    assert got == want and got  # compiler gate == operator, rows kept
    with _pt.raises(ValidationError, match="temperature"):
        SampleSpec(method="temperature", id_column="id")
    with _pt.raises(ValidationError, match="alpha"):
        SampleSpec(
            method="temperature", id_column="id", group_column="grp",
            budget_rows=10, alpha=2.0,
        )


# --- epoch_mix / keep_top_fraction / experiment ------------------------


def test_epoch_mix_integer_epochs_exact_copies(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import epoch_mix

    df = spark.createDataFrame(
        [(i, "a") for i in range(10)] + [(100 + i, "b") for i in range(10)],
        "doc_id int, lang string",
    )
    out = epoch_mix(df, "doc_id", "lang", epochs={"a": 3.0, "b": 0.0}).collect()
    # a: exactly 3 copies of each row, epochs 0..2; b: dropped entirely
    assert len(out) == 30
    assert all(r.lang == "a" for r in out)
    per = {}
    for r in out:
        per.setdefault(r.doc_id, []).append(r.epoch)
    assert all(sorted(v) == [0, 1, 2] for v in per.values())


def test_epoch_mix_fractional_epoch_is_deterministic_subset(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import epoch_mix

    df = spark.createDataFrame(
        [(i, "a") for i in range(200)], "doc_id int, lang string"
    )
    out1 = {(r.doc_id, r.epoch) for r in
            epoch_mix(df, "doc_id", "lang", epochs={"a": 1.5}).collect()}
    out2 = {(r.doc_id, r.epoch) for r in
            epoch_mix(df, "doc_id", "lang", epochs={"a": 1.5}).collect()}
    assert out1 == out2
    # every row appears at epoch 0; roughly half get epoch 1
    assert all((i, 0) in out1 for i in range(200))
    extra = sum(1 for (_, e) in out1 if e == 1)
    assert 60 <= extra <= 140


def test_epoch_mix_guards(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import epoch_mix

    df = spark.createDataFrame([(1, "a")], "doc_id int, lang string")
    with pytest.raises(ValueError, match="non-empty"):
        epoch_mix(df, "doc_id", "lang", epochs={})
    with pytest.raises(ValueError, match="must be in"):
        epoch_mix(df, "doc_id", "lang", epochs={"a": 101.0})
    with pytest.raises(ValueError, match="must be in"):
        epoch_mix(df, "doc_id", "lang", epochs={"a": -0.5})


def test_epoch_mix_is_zero_shuffle(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import epoch_mix

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("lang")
    )
    plan = (
        epoch_mix(df, "doc_id", "lang", epochs={"a": 2.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_keep_top_fraction_exact_quota_and_tiebreak(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        keep_top_fraction,
    )

    # group a: 5 rows scores 5,4,3,2,2 -> ceil(0.4*5)=2 keeps scores 5,4
    # group b: 3 equal scores -> ceil(0.4*3)=2 keeps the two SMALLEST ids
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 4), (3, "a", 3), (4, "a", 2), (5, "a", 2),
         (11, "b", 7), (12, "b", 7), (13, "b", 7)],
        "doc_id int, grp string, score int",
    )
    kept = {r.doc_id for r in
            keep_top_fraction(df, "doc_id", "grp", "score", fraction=0.4).collect()}
    assert kept == {1, 2, 11, 12}
    # fraction=1 keeps everything; fraction=0 keeps nothing
    assert keep_top_fraction(df, "doc_id", "grp", "score", fraction=1.0).count() == 8
    assert keep_top_fraction(df, "doc_id", "grp", "score", fraction=0.0).count() == 0
    with pytest.raises(ValueError, match="fraction"):
        keep_top_fraction(df, "doc_id", "grp", "score", fraction=1.2)


def test_ab_assign_unit_consistent_and_deterministic(spark):
    from orion_etl_oracle_to_postgres_spark.operators.experiment import ab_assign

    df = spark.createDataFrame(
        [(u, i) for u in range(50) for i in range(3)], "user_id int, x int"
    )
    out = ab_assign(df, "user_id", salt="s1").collect()
    arms = {}
    for r in out:
        arms.setdefault(r.user_id, set()).add(r.variant)
    # every unit in exactly one arm, same on re-run
    assert all(len(v) == 1 for v in arms.values())
    again = {r.user_id: r.variant
             for r in ab_assign(df, "user_id", salt="s1").collect()}
    assert all(again[u] == next(iter(v)) for u, v in arms.items())
    # a different salt re-deals at least one unit (50 units, p~2^-50)
    other = {r.user_id: r.variant
             for r in ab_assign(df, "user_id", salt="s2").collect()}
    assert any(other[u] != again[u] for u in again)
    with pytest.raises(ValueError, match="treat_per_mille"):
        ab_assign(df, "user_id", salt="s", treat_per_mille=1001)


def test_ab_welch_matches_closed_form(spark):
    from orion_etl_oracle_to_postgres_spark.operators.experiment import (
        ab_assign,
        ab_welch_ttest,
    )
    import math

    df = spark.createDataFrame(
        [(u, float(u % 7) + 1.0) for u in range(100)], "user_id int, value double"
    )
    row = ab_welch_ttest(df, "user_id", "value", salt="w1").collect()[0]
    # recompute from the same assignment driver-side
    arms = {r.user_id: r.variant
            for r in ab_assign(df, "user_id", salt="w1").collect()}
    m = {0: [], 1: []}
    for u in range(100):
        m[arms[u]].append(float(u % 7) + 1.0)
    n0, n1 = len(m[0]), len(m[1])
    m0, m1 = sum(m[0]) / n0, sum(m[1]) / n1
    v0 = sum((x - m0) ** 2 for x in m[0]) / (n0 - 1)
    v1 = sum((x - m1) ** 2 for x in m[1]) / (n1 - 1)
    assert (row.n_0, row.n_1) == (n0, n1)
    assert abs(row.t_stat - (m1 - m0) / math.sqrt(v0 / n0 + v1 / n1)) < 1e-5
    se = v0 / n0 + v1 / n1
    dof = se * se / ((v0 / n0) ** 2 / (n0 - 1) + (v1 / n1) ** 2 / (n1 - 1))
    assert abs(row.dof - dof) < 0.05


def test_declarative_epoch_mix(spark, tmp_path):
    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        MappingSpec,
        SampleSpec,
        TableSpec,
    )
    import pytest as _pt
    from pydantic import ValidationError

    src = tmp_path / "srce"
    spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(40)], ["id", "lang"]
    ).write.parquet(str(src / "t.parquet"))
    ctx = JobContext(
        spark,
        GlobalSpec(
            connectors=ConnectorsSpec(
                source_files=FilesConnectorSpec(base_path=str(src))
            )
        ),
    )

    def mk(sample):
        return TableSpec(
            source_table="t",
            target_table="t2",
            mappings=[
                MappingSpec(source="id", target="id"),
                MappingSpec(source="lang", target="lang"),
            ],
            sample=sample,
        )

    out = compile_table(
        ctx,
        mk(SampleSpec(method="epochs", id_column="id", group_column="lang",
                      epochs={"a": 2.0}, default_epochs=0.0)),
    ).df
    rows = out.collect()
    assert "epoch" in out.columns
    # a-rows duplicated exactly twice (epochs 0 and 1), b-rows dropped
    assert {r["lang"] for r in rows} == {"a"}
    assert len(rows) == 40  # 20 'a' ids x 2 epochs
    assert sorted({r["epoch"] for r in rows}) == [0, 1]

    with _pt.raises(ValidationError, match="epochs"):
        SampleSpec(method="epochs", id_column="id", group_column="lang")
    with _pt.raises(ValidationError, match="epochs"):
        SampleSpec(method="epochs", id_column="id", epochs={"a": 1.0})


def test_hash_kfold_partition_and_determinism(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import hash_kfold

    df = spark.createDataFrame([(i,) for i in range(500)], "id int")
    out = {r.id: r.fold for r in hash_kfold(df, "id", k=5).collect()}
    assert set(out.values()) == {0, 1, 2, 3, 4}
    # near-uniform: each fold within ±40% of 100
    from collections import Counter

    c = Counter(out.values())
    assert all(60 <= v <= 140 for v in c.values())
    # deterministic + append-stable: a subset gets identical folds
    sub = {r.id: r.fold
           for r in hash_kfold(df.filter(F.col("id") < 100), "id", k=5).collect()}
    assert all(out[i] == f for i, f in sub.items())
    with pytest.raises(ValueError, match="k must be"):
        hash_kfold(df, "id", k=1)
    with pytest.raises(ValueError, match="fold"):
        hash_kfold(hash_kfold(df, "id", k=2), "id", k=2)


def test_epoch_mix_preview_is_exact(spark):
    """The preview's out_rows equals the materializing run's count per
    group — a guarantee, not an estimate."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        epoch_mix,
        epoch_mix_preview,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)], "doc_id int, lang string"
    )
    params = dict(epochs={"a": 1.7, "b": 0.3}, default_epochs=1.0, seed="pv1")
    preview = {r.grp: r.out_rows
               for r in epoch_mix_preview(df, "doc_id", "lang", **params).collect()}
    from collections import Counter

    actual = Counter(
        r.lang for r in epoch_mix(df, "doc_id", "lang", **params).collect()
    )
    assert preview == dict(actual)


def test_ab_cuped_reduces_variance_when_pre_predicts_post(spark):
    """When post = pre + noise, CUPED's adjusted variance is far below
    the raw variance (theta ~ 1); t verdict matches a driver replay."""
    import datetime as dt

    from orion_etl_oracle_to_postgres_spark.operators.experiment import (
        ab_cuped_ttest,
        ab_welch_ttest,
    )

    pre_t = dt.datetime(2023, 12, 1)
    post_t = dt.datetime(2024, 2, 1)
    rows = []
    for u in range(80):
        base = float(u % 13) * 3.0 + 5.0
        rows.append((u, base, pre_t))             # pre-period event
        rows.append((u, base + 1.0, post_t))      # post ~ pre + const
    df = spark.createDataFrame(rows, "user_id int, value double, ts timestamp")
    raw = ab_welch_ttest(
        df.filter(F.col("ts") >= dt.datetime(2024, 1, 1)), "user_id", "value",
        salt="cu1",
    ).collect()[0]
    adj = ab_cuped_ttest(
        df, "user_id", "value", "ts", "2024-01-01", salt="cu1"
    ).collect()[0]
    assert (adj.n_0, adj.n_1) == (raw.n_0, raw.n_1)
    # pre explains nearly all post variance -> adjusted variance collapses
    assert adj.adj_var_0 < raw.var_0 / 100
    assert adj.adj_var_1 < raw.var_1 / 100


def test_bootstrap_ci_covers_point_and_is_deterministic(spark):
    from orion_etl_oracle_to_postgres_spark.operators.experiment import (
        bootstrap_mean_ci,
    )
    import pytest as _pt

    df = spark.createDataFrame(
        [(u, float(u % 11) + 1.0) for u in range(200)], "user_id int, value double"
    )
    r1 = bootstrap_mean_ci(df, "user_id", "value", n_replicas=50, seed="t1").collect()[0]
    r2 = bootstrap_mean_ci(df, "user_id", "value", n_replicas=50, seed="t1").collect()[0]
    assert r1 == r2  # fully deterministic
    assert r1.n_replicas == 50
    assert r1.ci_lo <= r1.point_est <= r1.ci_hi
    assert 0 < r1.boot_se < 2.0  # sane scale for mean ~6 over 200 units
    with _pt.raises(ValueError, match="n_replicas"):
        bootstrap_mean_ci(df, "user_id", "value", n_replicas=0)
    with _pt.raises(ValueError, match="ci must"):
        bootstrap_mean_ci(df, "user_id", "value", ci=0.3)


def test_cap_per_group_caps_and_determinism(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        cap_per_group,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 40 else ("small" if i < 45 else None))
         for i in range(50)],
        "id long, grp string",
    )
    out = cap_per_group(df, "id", "grp", cap=10)
    from collections import Counter

    got = Counter(r.grp for r in out.collect())
    # big capped at 10; small (5 rows) intact; NULL group (5) is a
    # group of its own, kept intact under the cap
    assert got["big"] == 10 and got["small"] == 5 and got[None] == 5
    ids = sorted(r.id for r in out.collect())
    ids2 = sorted(
        r.id for r in cap_per_group(df.repartition(7), "id", "grp", cap=10).collect()
    )
    assert ids == ids2, "survivors must be partitioning-independent"
    import pytest

    with pytest.raises(ValueError, match="cap"):
        cap_per_group(df, "id", "grp", cap=0)


def test_cap_per_group_plan_pre_limits(spark):
    """The constant cap must compile to WindowGroupLimit (per-task
    pre-limit before the exchange) — the property that keeps the
    shuffle at cap × groups × tasks rows instead of the corpus."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        cap_per_group,
    )

    df = spark.createDataFrame(
        [(i, str(i % 3)) for i in range(30)], "id long, grp string"
    )
    plan = (
        cap_per_group(df, "id", "grp", cap=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_dsir_select_prefers_target_like_docs(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        dsir_select,
    )

    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quick brown fox and lazy dog in the field"),
            (2, "stock prices fell sharply amid market turmoil today"),
            (3, "the quick brown fox jumps over the lazy dog again"),
            (4, None),  # no grams: carries no evidence, never selected
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = dsir_select(raw, target, "doc_id", "text", k=2)
    rows = out.collect()
    scores = [r.dsir_score for r in rows]
    assert scores == sorted(scores, reverse=True)  # order is score desc
    picked = {r.doc_id for r in rows}
    assert picked == {1, 3}, f"target-like docs must win, got {picked}"
    assert all(r.dsir_score > 0 for r in rows)
    # deterministic across partitioning
    out2 = dsir_select(raw.repartition(3), target, "doc_id", "text", k=2)
    assert {(r.doc_id, r.dsir_score) for r in out2.collect()} == {
        (r.doc_id, r.dsir_score) for r in rows
    }


def test_dsir_select_guards(spark):
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        dsir_select,
    )

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must"):
        dsir_select(df, df, "doc_id", "text", k=0)
    with pytest.raises(ValueError, match="n_features"):
        dsir_select(df, df, "doc_id", "text", k=1, n_features=0)


def test_rank_ensemble_positions_and_null_handling(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        rank_ensemble,
    )

    df = spark.createDataFrame(
        [
            (1, 0.1, 10.0),
            (2, 0.5, None),   # missing one signal: mean over the other
            (3, 0.9, 30.0),
            (4, None, None),  # missing all: NULL ensemble
            (5, 0.3, 20.0),
        ],
        "id long, a double, b double",
    )
    out = {r.id: r for r in rank_ensemble(df, "id", ["a", "b"]).collect()}
    # a: 4 non-null → positions 0, 1/3, 2/3, 1 for ids 1,5,2,3
    assert out[1].a_rank == 0.0 and out[3].a_rank == 1.0
    assert abs(out[5].a_rank - 0.333333) < 1e-9  # micro-unit round-half-up
    assert abs(out[2].a_rank - 0.666667) < 1e-9
    # b: 3 non-null → 0, 0.5, 1 for ids 1,5,3
    assert out[1].b_rank == 0.0 and out[5].b_rank == 0.5 and out[3].b_rank == 1.0
    assert out[2].b_rank is None and out[4].a_rank is None
    # ensemble: mean of available positions, exact integer rounding
    assert out[1].ensemble_score == 0.0
    assert out[3].ensemble_score == 1.0
    assert abs(out[5].ensemble_score - 0.416667) < 1e-9  # (1/3+1/2)/2 h-up
    assert out[2].ensemble_score == out[2].a_rank  # only signal available
    assert out[4].ensemble_score is None
    # partitioning-independent
    out2 = {
        r.id: r.ensemble_score
        for r in rank_ensemble(df.repartition(4), "id", ["a", "b"]).collect()
    }
    assert out2 == {i: out[i].ensemble_score for i in out}
    import pytest

    with pytest.raises(ValueError, match="score_cols"):
        rank_ensemble(df, "id", [])


def test_rank_ensemble_handles_non_identifier_column_names(spark):
    """Generated expr temp names must backtick-escape the caller's
    column name — 'flesch-kincaid' would otherwise parse as a
    subtraction inside F.expr."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        rank_ensemble,
    )

    df = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.5)], ["id", "flesch-kincaid"]
    )
    out = {r.id: r for r in rank_ensemble(df, "id", ["flesch-kincaid"]).collect()}
    assert out[2].ensemble_score == 1.0 and out[1].ensemble_score == 0.0


def test_cluster_safe_split_co_travels_near_dups(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        cluster_safe_split,
        hash_split,
    )

    df = spark.createDataFrame(
        [(i, "x") for i in range(200)], "doc_id long, grp string"
    )
    # three dup groups + the rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id_i long, id_j long"
    )
    out = {r.doc_id: r for r in cluster_safe_split(df, "doc_id", pairs).collect()}
    assert len(out) == 200, "every row ships"
    # near-dup groups share one split label
    assert out[1].split == out[2].split == out[3].split
    assert out[10].split == out[11].split
    assert out[20].split == out[21].split
    assert out[1].cluster_id == 1 and out[11].cluster_id == 10
    # singletons match a plain hash_split under the same seed
    plain = {
        r.doc_id: r.split
        for r in hash_split(df, "doc_id", seed="css0").collect()
    }
    clustered_ids = {1, 2, 3, 10, 11, 20, 21}
    for i in set(out) - clustered_ids:
        assert out[i].split == plain[i]
    # all three splits populated at 200 rows
    from collections import Counter

    shares = Counter(r.split for r in out.values())
    assert set(shares) == {"train", "val", "test"}


def test_ccnet_buckets_per_lang_cuts(spark):
    """Per-language quantile cuts: each language's docs split ~25/50/25
    regardless of absolute perplexity scale; zero-token docs are
    excluded; the cutoff table broadcasts."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        ccnet_buckets,
    )

    rows = []
    # lang a: common words repeated -> low ppl; 8 docs with a spread
    for i in range(8):
        rows.append((i, "a", "the cat sat " + ("the cat sat " * (i % 4))
                     + f"rare{i} " * (i % 3)))
    for i in range(8, 16):
        rows.append((i, "b", f"completely different tokens t{i} u{i} v{i} "
                     + "w common w common " * (i % 4)))
    rows.append((99, "a", ""))  # zero tokens -> excluded
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = ccnet_buckets(df, "doc_id", "text", "lang")
    got = out.collect()
    assert all(r.doc_id != 99 for r in got)  # no LM evidence, no bucket
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert {r.ppl_bucket for r in rs} <= {"head", "middle", "tail"}
        # every doc at or below its lang's head cut is labeled head
        for r in rs:
            if r.ppl_proxy <= r.cut_head:
                assert r.ppl_bucket == "head"
            elif r.ppl_proxy <= r.cut_tail:
                assert r.ppl_bucket == "middle"
            else:
                assert r.ppl_bucket == "tail"
        # cuts are the lang's own quantiles: head cut <= tail cut
        assert rs[0].cut_head <= rs[0].cut_tail
    # the two languages get DIFFERENT cutoffs (per-lang, not global)
    assert by_lang["a"][0].cut_head != by_lang["b"][0].cut_head
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # cutoff table broadcast back
    import pytest as _pt

    with _pt.raises(ValueError, match="head < tail"):
        ccnet_buckets(df, "doc_id", "text", "lang", head=0.8, tail=0.2)


def test_shard_plan_balanced_and_deterministic(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        shard_plan,
    )

    df = spark.range(0, 1003).withColumnRenamed("id", "doc_id")
    out = shard_plan(df, "doc_id", n_shards=4).collect()
    again = shard_plan(df, "doc_id", n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    from collections import Counter

    sizes = Counter(r.shard_id for r in out)
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # balanced ±1
    # positions within each shard are dense 0..size-1 (streamable)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r.pos_in_shard)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # round-robin over hash order: consecutive source ids scatter
    shard_of = {r.doc_id: r.shard_id for r in out}
    assert len({shard_of[i] for i in range(16)}) > 1
    import pytest as _pt

    with _pt.raises(ValueError, match="n_shards"):
        shard_plan(df, "doc_id", n_shards=0)


def test_fim_transform_reassembles_and_passthrough(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import (
        fim_transform,
    )

    df = spark.createDataFrame(
        [(i, f"document number {i} with some fill in the middle text")
         for i in range(200)] + [(999, None)],
        "doc_id long, text string",
    )
    out = fim_transform(df, "doc_id", "text", rate=0.5).collect()
    by_id = {r.doc_id: r for r in out}
    applied = [r for r in out if r.fim_applied and r.doc_id != 999]
    plain = [r for r in out if not r.fim_applied and r.doc_id != 999]
    assert applied and plain  # rate 0.5 hits both classes
    for r in applied:
        # PSM reassembles to the original byte-for-byte
        assert r.prefix + r.middle + r.suffix == \
            f"document number {r.doc_id} with some fill in the middle text"
    for r in plain:
        assert r.middle == "" and r.suffix == ""
        assert r.prefix == \
            f"document number {r.doc_id} with some fill in the middle text"
    assert by_id[999].prefix == ""  # NULL text treated as empty
    # rate=0 never applies; rate=1 always applies
    all_on = fim_transform(df, "doc_id", "text", rate=1.0).collect()
    assert all(r.fim_applied for r in all_on)
    import pytest as _pt

    with _pt.raises(ValueError, match="rate"):
        fim_transform(df, "doc_id", "text", rate=1.5)


def test_length_balance_flattens_buckets(spark):
    """Every length bucket ends at the minority bucket's size; NULL
    text counts as zero tokens (bucket 0), never -1/-NULL."""
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark import queries as q

    rows = [(i, "en", "tok " * (10 if i % 5 else 200)) for i in range(50)]
    rows.append((999, "en", None))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.createOrReplaceTempView("__lb_docs")
    from orion_etl_oracle_to_postgres_spark.functions import token_count
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        balance_groups,
    )

    b = df.select(
        "doc_id",
        F.least(
            (token_count(F.coalesce(F.col("text"), F.lit(""))) / 64)
            .cast("int"),
            F.lit(7),
        ).cast("int").alias("len_bucket"),
    )
    out = balance_groups(b, "doc_id", "len_bucket", seed="lenbal0")
    from collections import Counter

    sizes = Counter(r.len_bucket for r in out.collect())
    assert len(set(sizes.values())) == 1  # flattened: all equal
    # the NULL-text doc landed in bucket 0 (zero tokens), not -1/None
    assert {r.len_bucket for r in b.filter("doc_id = 999").collect()} == {0}


def test_unimax_mixture_water_fill_exact(spark):
    """Hand-computed water-fill: caps [4,10,20,40] (max_epochs=2 over
    token counts [2,5,10,20]), budget 30 → pivot at the 10-cap source:
    4 is capped, remaining 26 splits 3 ways = base 8 rem 2, dealt to
    the two smallest uncapped sources → allocs [4,9,9,8]; sums to the
    budget exactly. Budget above total capacity → everyone capped.
    Zero budget → all zeros."""
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        unimax_mixture,
    )

    rows = []
    for src, n in [("a", 2), ("b", 5), ("c", 10), ("d", 20)]:
        rows += [(src, 1)] * n
    df = spark.createDataFrame(rows, "source string, tok long")

    out = {
        r["source"]: r
        for r in unimax_mixture(
            df, "source", "tok", total_budget=30, max_epochs=2
        ).collect()
    }
    assert {s: out[s]["cap_tokens"] for s in out} == {
        "a": 4, "b": 10, "c": 20, "d": 40
    }
    assert {s: out[s]["alloc_tokens"] for s in out} == {
        "a": 4, "b": 9, "c": 9, "d": 8
    }
    assert sum(r["alloc_tokens"] for r in out.values()) == 30
    assert out["a"]["epochs"] == 2.0  # capped source hits max_epochs
    assert out["b"]["epochs"] == 1.8

    # budget >= total capacity: every source capped, total = capacity
    over = unimax_mixture(
        df, "source", "tok", total_budget=1000, max_epochs=2
    ).collect()
    assert all(r["alloc_tokens"] == r["cap_tokens"] for r in over)
    assert sum(r["alloc_tokens"] for r in over) == 74

    # zero budget: all-zero allocation (level 0)
    zero = unimax_mixture(
        df, "source", "tok", total_budget=0, max_epochs=2
    ).collect()
    assert all(r["alloc_tokens"] == 0 for r in zero)

    # guards
    import pytest

    with pytest.raises(ValueError, match="total_budget"):
        unimax_mixture(df, "source", "tok", total_budget=-1)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_mixture(df, "source", "tok", total_budget=1, max_epochs=0)

    # plan hygiene: no unpartitioned window anywhere (prefix sums run
    # through the windowless self-join)
    plan = (
        unimax_mixture(df, "source", "tok", total_budget=30, max_epochs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan or "Window" not in plan


def test_unimax_mixture_exact_beyond_double_precision(spark):
    """The water-fill's base-level division is TRUE integer division
    (Spark `div`), exact past 2^53 where the old double round-trip
    drifted (ADVICE r8). Three uncapped sources share a ~2^60 budget:
    base = budget div 3 and the remainder deals to the lowest ranks —
    checked against Python big-int arithmetic."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        unimax_mixture,
    )

    rows = [("a", 10**17), ("b", 10**17), ("c", 10**17)]
    df = spark.createDataFrame(rows, "source string, tok long")
    budget = 2**60 + 1  # odd, far beyond 2^53, not divisible by 3
    out = {
        r["source"]: r["alloc_tokens"]
        for r in unimax_mixture(
            df, "source", "tok", total_budget=budget, max_epochs=10
        ).collect()
    }
    caps = 10**18  # each source caps at 10 epochs * 1e17
    assert all(a <= caps for a in out.values())
    base, rem = divmod(budget, 3)
    expect = {
        s: base + (1 if i < rem else 0)
        for i, s in enumerate(sorted(out))  # rank order = hash-free k order
    }
    assert sum(out.values()) == budget
    assert out == expect


def test_unimax_sample_applies_per_group_allocation(spark):
    """unimax_sample keeps each group's hash-order prefix to its OWN
    water-filled budget: the small group is fully kept (capped at
    max_epochs, target_epochs > 1), the big group trims to the level;
    NULL-text docs consume nothing and are never kept."""
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        unimax_sample,
    )

    # group a: 3 docs x 2 tokens = 6; group b: 40 docs x 2 tokens = 80
    rows = [(i, "a", "w w") for i in range(3)]
    rows += [(100 + i, "b", "w w") for i in range(40)]
    rows += [(999, "a", None)]  # NULL text: no budget, never kept
    df = spark.createDataFrame(rows, "id long, src string, body string")
    # budget 30, max_epochs 2: caps a=12, b=160; level fills a fully
    # (12) and b gets 18 tokens -> 9 docs
    out = unimax_sample(
        df, "body", "id", "src", total_budget=30, max_epochs=2
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    assert len(by_src["a"]) == 3  # whole group kept (alloc = cap 12)
    assert len(by_src["b"]) == 9  # 18 tokens / 2 per doc
    assert all(r["n_tokens"] == 2 for r in out)
    assert by_src["a"][0]["target_epochs"] == 2.0  # 12 alloc / 6 tokens
    assert abs(by_src["b"][0]["target_epochs"] - round(18 / 80, 6)) < 1e-9
    assert not [r for r in out if r["id"] == 999]

    # declarative twin: spec validation catches missing knobs
    import pytest

    import orion_etl_oracle_to_postgres_spark.spec as spec_mod

    with pytest.raises(ValueError, match="method=unimax needs"):
        spec_mod.SampleSpec(method="unimax", id_column="id")


def test_unimax_mixture_null_group_ranks_nulls_last(spark):
    """A NULL source is a legitimate mixture group: it must hold a
    total rank (SQL NULLS LAST on ties) instead of three-valued-logic
    dropping out of every prefix sum while still being counted in n —
    which would deflate the water level and under-spend the budget."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        unimax_mixture,
    )

    rows = [(None, 1)] * 10 + [("b", 1)] * 10 + [("c", 1)] * 100
    df = spark.createDataFrame(rows, "source string, tok long")
    # caps (max_epochs=1): null=10, b=10, c=100; budget 50:
    # pivot at k=3 (c): base = (50-20)/1 = 30 -> allocs 10/10/30
    out = {
        r["source"]: r["alloc_tokens"]
        for r in unimax_mixture(
            df, "source", "tok", total_budget=50, max_epochs=1
        ).collect()
    }
    assert out == {None: 10, "b": 10, "c": 30}
    # an all-NULL-token group ranks as capacity 0, not NULL poison
    rows2 = [("a", None), ("b", 4)]
    df2 = spark.createDataFrame(rows2, "source string, tok long")
    out2 = {
        r["source"]: (r["cap_tokens"], r["alloc_tokens"])
        for r in unimax_mixture(
            df2, "source", "tok", total_budget=3, max_epochs=1
        ).collect()
    }
    assert out2 == {"a": (0, 0), "b": (4, 3)}


def test_mixture_reweight_hand_computed(spark):
    """Linearized MW replay by hand: domain a has losses [1.0, 0.0]
    (avg 0.5), domain b is all-NULL (avg 0). One round, eta=1, no
    smoothing:
    u=[.5·1.5, .5·1.0]=[0.75, 0.5], Z=1.25 → w=[0.6, 0.4]. With
    smoothing 0.5 the same round gives [0.55, 0.45]. Clamp, NULL-loss
    exclusion, NULL group ordering, guards, empty input."""
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        mixture_reweight,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 0.0), ("b", None), ("b", None)],
        "src string, loss double",
    )
    out = {r["src"]: r for r in
           mixture_reweight(df, "src", "loss", eta=1.0, rounds=1,
                            smoothing=0.0).collect()}
    assert out["a"]["n_examples"] == 2 and out["b"]["n_examples"] == 2
    assert out["a"]["avg_excess_loss"] == 0.5
    assert out["b"]["avg_excess_loss"] == 0.0  # all-NULL domain -> 0
    assert out["a"]["weight"] == 0.6 and out["b"]["weight"] == 0.4

    sm = {r["src"]: r["weight"] for r in
          mixture_reweight(df, "src", "loss", eta=1.0, rounds=1,
                           smoothing=0.5).collect()}
    assert sm["a"] == 0.55 and sm["b"] == 0.45

    # negative losses clamp to 0 (excess loss is floored, DoReMi-style)
    neg = spark.createDataFrame(
        [("a", -2.0), ("b", 1.0)], "src string, loss double"
    )
    nw = {r["src"]: r for r in
          mixture_reweight(neg, "src", "loss", eta=1.0, rounds=1,
                           smoothing=0.0).collect()}
    assert nw["a"]["avg_excess_loss"] == 0.0
    assert nw["a"]["weight"] < nw["b"]["weight"]

    # NULL group is a legitimate domain, ordered last; weights sum ~1
    withnull = spark.createDataFrame(
        [("a", 1.0), (None, 0.5)], "src string, loss double"
    )
    rows = mixture_reweight(withnull, "src", "loss").collect()
    assert {r["src"] for r in rows} == {"a", None}
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6

    # guards + empty input
    with pytest.raises(ValueError, match="rounds"):
        mixture_reweight(df, "src", "loss", rounds=0)
    with pytest.raises(ValueError, match="eta"):
        mixture_reweight(df, "src", "loss", eta=-1)
    with pytest.raises(ValueError, match="smoothing"):
        mixture_reweight(df, "src", "loss", smoothing=1.0)
    empty = mixture_reweight(
        df.filter("src = 'zzz'"), "src", "loss"
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "src", "n_examples", "avg_excess_loss", "weight",
    ]


def test_doremi_sample_applies_learned_allocation(spark):
    """doremi_sample: MW weights -> floor(weight * budget) per-domain
    targets -> hash-order prefix kept; under-fill bounded by one row
    per domain; higher-loss domains get MORE rows."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        doremi_sample,
        mixture_reweight,
    )

    rows = (
        [(i, "hard", 0.9) for i in range(40)]
        + [(100 + i, "easy", 0.1) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "id long, dom string, loss double")
    out = doremi_sample(
        df, "id", "dom", "loss", budget_rows=40, eta=1.0, seed="t"
    )
    got = out.groupBy("dom").count().collect()
    counts = {r["dom"]: r["count"] for r in got}
    w = {
        r["dom"]: r["weight"]
        for r in mixture_reweight(
            df.select("dom", "loss"), "dom", "loss", eta=1.0
        ).collect()
    }
    import math

    # kept counts are exactly the floors of the learned shares
    assert counts == {
        d: math.floor(w[d] * 40) for d in w if math.floor(w[d] * 40) > 0
    }
    # up-weight the laggard (8 rounds at eta=1 can floor "easy" to 0)
    assert counts["hard"] > counts.get("easy", 0)
    assert sum(counts.values()) <= 40            # floor never overshoots
    assert sum(counts.values()) >= 40 - len(w)   # under-fill < 1 row/domain
    # audit columns present and consistent
    r0 = out.filter(F.col("dom") == "hard").select(
        "domain_weight", "target_rows"
    ).distinct().collect()
    assert len(r0) == 1 and r0[0]["target_rows"] == counts["hard"]

    import pytest

    with pytest.raises(ValueError, match="budget_rows"):
        doremi_sample(df, "id", "dom", "loss", budget_rows=-1)
    with pytest.raises(ValueError, match="adds"):
        doremi_sample(
            df.withColumn("target_rows", F.lit(1)),
            "id", "dom", "loss", budget_rows=10,
        )


def test_doremi_sample_null_group_is_a_domain(spark):
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        doremi_sample,
    )

    rows = [(1, None, 0.5), (2, None, 0.5), (3, "a", 0.5), (4, "a", 0.5)]
    df = spark.createDataFrame(rows, "id long, dom string, loss double")
    out = doremi_sample(df, "id", "dom", "loss", budget_rows=4, eta=0.0)
    # eta=0 -> uniform weights 0.5/0.5 -> 2 rows per domain incl. NULL
    counts = {r["dom"]: r["count"] for r in out.groupBy("dom").count().collect()}
    assert counts == {None: 2, "a": 2}


def test_declarative_doremi_sample_and_explain_stub(spark, tmp_path):
    import pytest

    import orion_etl_oracle_to_postgres_spark.spec as spec_mod
    from orion_etl_oracle_to_postgres_spark.compiler import (
        JobContext,
        compile_table,
    )

    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, "hard" if i < 40 else "easy", 0.9 if i < 40 else 0.1)
         for i in range(80)],
        "id long, dom string, loss double",
    ).write.parquet(str(src / "t.parquet"))
    g = spec_mod.GlobalSpec(
        connectors=spec_mod.ConnectorsSpec(
            source_files=spec_mod.FilesConnectorSpec(base_path=str(src))
        )
    )
    t = spec_mod.TableSpec(
        source_table="t",
        target_table="t_mix",
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="dom", target="dom"),
            spec_mod.MappingSpec(source="loss", target="loss"),
        ],
        sample=spec_mod.SampleSpec(
            method="doremi", id_column="id", group_column="dom",
            loss_column="loss", budget_rows=40, eta=1.0,
        ),
    )
    out = compile_table(JobContext(spark=spark, global_spec=g), t).df
    assert {"domain_weight", "target_rows"} <= set(out.columns)
    assert 0 < out.count() <= 40
    # --explain: stage skipped, placeholder columns keep the schema
    exp = compile_table(
        JobContext(spark=spark, global_spec=g, explain_only=True), t
    ).df
    assert {"domain_weight", "target_rows"} <= set(exp.columns)
    # spec contract: missing loss_column refused at parse time
    with pytest.raises(ValueError, match="doremi"):
        spec_mod.SampleSpec(
            method="doremi", id_column="id", group_column="dom",
            budget_rows=40,
        )


def test_doremi_token_sample_budget_semantics(spark):
    """Token-unit DoReMi: per-domain token allocation = floor(weight *
    budget); prefix kept until the running total BEFORE the doc reaches
    it (overshoot bounded by one doc); NULL-text docs consume nothing."""
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        doremi_token_sample,
        mixture_reweight,
    )

    rows = (
        [(i, "hard", "five words in this text", 0.9) for i in range(30)]
        + [(100 + i, "easy", "five words in this text", 0.1)
           for i in range(30)]
        + [(999, "hard", None, 0.9)]  # NULL text: kept, consumes nothing
    )
    df = spark.createDataFrame(
        rows, "id long, dom string, text string, loss double"
    )
    out = doremi_token_sample(
        df, "text", "id", "dom", "loss", budget_tokens=100, eta=0.2,
    )
    got = out.collect()
    w = {
        r["dom"]: r["weight"]
        for r in mixture_reweight(
            df.select("dom", "loss"), "dom", "loss", eta=0.2
        ).collect()
    }
    import math

    per_dom_tokens = {}
    for r in got:
        if r["n_tokens"] is not None:
            per_dom_tokens[r["dom"]] = (
                per_dom_tokens.get(r["dom"], 0) + r["n_tokens"]
            )
        assert r["target_tokens"] == math.floor(w[r["dom"]] * 100)
    for dom, total in per_dom_tokens.items():
        target = math.floor(w[dom] * 100)
        assert total < target + 5   # overshoot < one 5-token doc
        assert total >= target - 4  # docs remained, so never undershoots
    assert per_dom_tokens["hard"] > per_dom_tokens["easy"]
    # the NULL-text doc rides along without consuming budget
    assert any(r["id"] == 999 and r["n_tokens"] is None for r in got)

    import pytest

    with pytest.raises(ValueError, match="budget_tokens"):
        doremi_token_sample(df, "text", "id", "dom", "loss", budget_tokens=0)
    with pytest.raises(ValueError, match="adds"):
        doremi_token_sample(
            df.withColumn("n_tokens", F.lit(1)),
            "text", "id", "dom", "loss", budget_tokens=10,
        )


def test_declarative_doremi_tokens_and_explain_stub(spark, tmp_path):
    """`sample.method: doremi_tokens` — the declarative TOKEN twin of
    doremi: learned weights drive per-domain token allocations, the
    compiled result matches the standalone operator exactly, --explain
    stubs the three added columns, and the parse-time contract holds."""
    import pytest

    import orion_etl_oracle_to_postgres_spark.spec as spec_mod
    from orion_etl_oracle_to_postgres_spark.compiler import (
        JobContext,
        compile_table,
    )
    from orion_etl_oracle_to_postgres_spark.operators.curation import (
        doremi_token_sample,
    )

    src = tmp_path / "src"
    rows = [
        (i, "hard" if i < 40 else "easy",
         "some words repeated here " * ((i % 3) + 1),
         0.9 if i < 40 else 0.1)
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "id long, dom string, body string, loss double"
    )
    df.write.parquet(str(src / "t.parquet"))
    g = spec_mod.GlobalSpec(
        connectors=spec_mod.ConnectorsSpec(
            source_files=spec_mod.FilesConnectorSpec(base_path=str(src))
        )
    )
    t = spec_mod.TableSpec(
        source_table="t",
        target_table="t_mix",
        mappings=[
            spec_mod.MappingSpec(source="id", target="id"),
            spec_mod.MappingSpec(source="dom", target="dom"),
            spec_mod.MappingSpec(source="body", target="body"),
            spec_mod.MappingSpec(source="loss", target="loss"),
        ],
        sample=spec_mod.SampleSpec(
            method="doremi_tokens", id_column="id", group_column="dom",
            loss_column="loss", text_column="body", budget_tokens=120,
            eta=1.0, seed="dtt",
        ),
    )
    out = compile_table(JobContext(spark=spark, global_spec=g), t).df
    assert {"n_tokens", "domain_weight", "target_tokens"} <= set(out.columns)
    got = {r["id"] for r in out.collect()}
    want = {
        r["id"]
        for r in doremi_token_sample(
            df.withColumnRenamed("body", "__b"), "__b", "id", "dom", "loss",
            budget_tokens=120, eta=1.0, seed="dtt",
        ).collect()
    }
    assert got == want and got
    # --explain: stage skipped, placeholder columns keep the schema
    exp = compile_table(
        JobContext(spark=spark, global_spec=g, explain_only=True), t
    ).df
    assert {"n_tokens", "domain_weight", "target_tokens"} <= set(exp.columns)
    # spec contract: token budget + text column demanded at parse time
    with pytest.raises(ValueError, match="doremi_tokens"):
        spec_mod.SampleSpec(
            method="doremi_tokens", id_column="id", group_column="dom",
            loss_column="loss", budget_tokens=120,
        )
    with pytest.raises(ValueError, match="doremi_tokens"):
        spec_mod.SampleSpec(
            method="doremi_tokens", id_column="id", group_column="dom",
            loss_column="loss", text_column="body",
        )
