"""[EXT] Text analysis: stats, quality, language ID, fingerprints."""

from __future__ import annotations

from orion_etl_oracle_to_postgres_spark.operators import text


def test_text_stats_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world 42!")], "doc_id int, text string")
    r = text.text_stats(df, "text", "doc_id").collect()[0]
    assert r["n_chars"] == 16
    assert r["n_ws_tokens"] == 3
    # Hello , world 42 ! → 5 BPE-ish tokens
    assert r["n_re_tokens"] == 5
    assert abs(r["digit_ratio"] - 2 / 16) < 1e-6
    assert abs(r["alpha_ratio"] - 10 / 16) < 1e-6
    assert abs(r["punct_ratio"] - 2 / 16) < 1e-6


def test_text_stats_empty_string_safe(spark):
    df = spark.createDataFrame([(1, "")], "doc_id int, text string")
    r = text.text_stats(df, "text", "doc_id").collect()[0]
    assert r["n_chars"] == 0 and r["n_ws_tokens"] == 0 and r["digit_ratio"] == 0.0


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [(1, "a good plain sentence with normal words repeated a few times over"),
         (2, "!!! ### $$$ %%%"),
         (3, "x")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in text.quality_score(df, "text", "doc_id").collect()}
    assert 0.0 <= rows[2]["quality"] <= 1.0
    assert rows[1]["quality"] > rows[2]["quality"]
    assert rows[1]["keep"] and not rows[2]["keep"]


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "der hund und die katze das ist gut"),
            (3, "xyzzy plugh"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r["pred_lang"] for r in text.language_id(df, "text", "doc_id").collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[3] == "und"


def test_language_id_tie_break_deterministic(spark):
    # 'de' here matches markers of es(de) and... construct exact tie:
    # 'the' (en=1) and 'der' (de=1) → tie 1-1 → declared order wins: en
    df = spark.createDataFrame([(1, "the der")], "doc_id int, text string")
    r = text.language_id(df, "text", "doc_id").collect()[0]
    assert r["pred_lang"] == "en" and r["marker_hits"] == 1


def test_doc_fingerprint_stable_and_normalized(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "Alpha  BETA gamma, delta!"), (3, "other words entirely here")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in text.doc_fingerprint(df, "text", "doc_id").collect()}
    assert rows[1] == rows[2]  # case/punct-insensitive
    assert rows[1] != rows[3]
    assert len(rows[1]) == 32  # md5 hex


def test_doc_fingerprint_short_text(spark):
    df = spark.createDataFrame([(1, "two words")], "doc_id int, text string")
    r = text.doc_fingerprint(df, "text", "doc_id").collect()[0]
    assert r["fingerprint"] is not None


def test_scrub_text_replaces_urls_emails_and_whitespace(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import scrub_documents

    rows = [
        (1, "see https://example.com/a?b=c and mail bob@corp.io  now"),
        (2, "no  noise   here"),
        (3, "two http://x.io http://y.io links, two a@b.co c@d.org mails"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_documents(df, "text", "doc_id").collect()}
    assert out[1]["clean_text"] == "see <URL> and mail <EMAIL> now"
    assert (out[1]["n_urls"], out[1]["n_emails"]) == (1, 1)
    assert out[2]["clean_text"] == "no noise here"
    assert (out[3]["n_urls"], out[3]["n_emails"]) == (2, 2)


def test_scrub_text_phone_opt_in(spark):
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.text import scrub_text

    df = spark.createDataFrame([("call +1 (555) 123-4567 now",)], "t string")
    out = df.select(scrub_text(F.col("t"), phone_token="<PHONE>").alias("c")).first()
    assert out["c"] == "call <PHONE> now"


def test_word_entropy_bounds_and_values(spark):
    import math

    from orion_etl_oracle_to_postgres_spark.operators.text import word_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),              # degenerate: H = 0
            (2, "a b c d"),              # uniform over 4: H = 2
            (3, "a a b"),                # H = 2/3·log2(3/2) + 1/3·log2(3)
            (4, ""),                     # no tokens -> absent from output
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in word_entropy(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["entropy"] == 0.0 and out[1]["norm_entropy"] == 0.0
    assert out[2]["entropy"] == 2.0 and out[2]["norm_entropy"] == 1.0
    expected = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(out[3]["entropy"] - round(expected, 6)) < 1e-9
    assert 0.0 <= out[3]["norm_entropy"] <= 1.0


def test_url_normalize_rules(spark):
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.text import url_normalize

    cases = [
        ("HTTP://ExAmple.COM:80/Path/Q", "http://example.com/Path/Q"),
        ("https://Host.com:443/", "https://host.com"),
        ("https://host.com:8443/x", "https://host.com:8443/x"),  # non-default kept
        ("http://a.com/p#frag", "http://a.com/p"),
        ("http://a.com/", "http://a.com"),
        ("not a url #tail", "not a url "),  # fragment-only handling
        ("ftp://Mixed.Case/KeepPath", "ftp://mixed.case/KeepPath"),
    ]
    df = spark.createDataFrame(cases, ["url", "want"])
    got = df.select("url", "want", url_normalize(F.col("url")).alias("c")).collect()
    for r in got:
        assert r["c"] == r["want"], (r["url"], r["c"], r["want"])


def test_bm25_rank_orders_and_scores(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, "data model data training"),
            (2, "data only here"),
            (3, "nothing relevant at all"),
            (4, "model model model model model model"),
        ],
        "doc_id int, text string",
    )
    out = text.bm25_rank(
        df, "text", "doc_id", ["data", "model"], k1=1.2, b=0.75, top_k=10
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 3 has no query terms → absent entirely
    assert 3 not in rows
    assert rows[1]["n_terms_hit"] == 2
    assert rows[2]["n_terms_hit"] == 1
    # hand-computed BM25 for doc 2 (term 'data': tf=1, df=2, N=4,
    # dl=3, avgdl=17/4)
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    denom = 1 + 1.2 * (1 - 0.75 + 0.75 * 3 / (17 / 4))
    expected = idf * 1 * 2.2 / denom
    assert abs(rows[2]["bm25"] - round(expected, 6)) < 1e-6
    # doc 1 hits both terms and must outrank doc 2's single weak hit
    assert rows[1]["bm25"] > rows[2]["bm25"]


def test_bm25_rank_rejects_empty_terms(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="query_terms"):
        text.bm25_rank(df, "text", "doc_id", [])


def test_bm25_rank_top_k_cutoff_deterministic(spark):
    # ten identical docs → identical scores; cutoff must break ties by id
    df = spark.createDataFrame(
        [(i, "data data data") for i in range(10)], "doc_id int, text string"
    )
    out = text.bm25_rank(df, "text", "doc_id", ["data"], top_k=4)
    assert [r["doc_id"] for r in out.collect()] == [0, 1, 2, 3]


def test_unigram_logprob_values(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b")], "doc_id int, text string"
    )
    # corpus: a→3, b→2, total 5
    out = {r["doc_id"]: r for r in
           text.unigram_logprob(df, "text", "doc_id").collect()}
    la, lb = math.log2(3 / 5), math.log2(2 / 5)
    m1 = (2 * la + lb) / 3
    m2 = (la + lb) / 2
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["mean_log2p"] - round(m1, 6)) < 1e-6
    assert abs(out[2]["mean_log2p"] - round(m2, 6)) < 1e-6
    # rarer-token doc scores lower (more negative)
    assert out[2]["mean_log2p"] < out[1]["mean_log2p"]
    assert out[1]["ppl_proxy"] == round(2 ** -m1, 4)


def test_ngram_novelty_unique_vs_shared(spark):
    shared = "one two three four five six"
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "seven eight nine ten eleven twelve")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in
            text.ngram_novelty(df, "text", "doc_id").collect()}
    # docs 1 and 2 share every shingle → zero novelty; doc 3 is all-new
    assert rows[1]["novelty"] == 0.0
    assert rows[2]["novelty"] == 0.0
    assert rows[3]["novelty"] == 1.0
    assert rows[3]["n_shingles"] == 4  # 6 tokens → 4 tri-gram shingles


def test_compression_ratio_values_and_ordering(spark):
    import zlib

    rows = [(1, "abc " * 200), (2, "the quick brown fox jumps over a lazy dog"),
            (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in
           text.compression_ratio(df, "text", "doc_id").collect()}
    for i in (1, 2):
        raw = rows[i - 1][1].encode()
        assert got[i]["compression_ratio"] == round(
            len(zlib.compress(raw, 6)) / len(raw), 6
        )
    # repetitive text compresses far better than natural prose
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
    assert got[3]["compression_ratio"] == 0.0
    assert got[4]["compression_ratio"] is None


def test_zipf_slope_near_minus_one_for_zipfian_input(spark):
    # synthetic corpus with freq(w_r) ∝ 1/r → slope ≈ −1, r2 ≈ 1
    words = []
    for r in range(1, 51):
        words += [f"w{r:03d}"] * (1000 // r)
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id int, text string")
    row = text.zipf_slope(df, "text", top_n=50).collect()[0]
    assert row["n_terms"] == 50
    assert -1.1 < row["zipf_slope"] < -0.9
    assert row["r2"] > 0.99


def test_bigram_logprob_values(spark):
    import math

    # corpus bigrams: (a,b)x2 from doc1+doc2, (b,a)x1, (b,c)x1
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b c"), (3, "x")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in
           text.bigram_logprob(df, "text", "doc_id").collect()}
    # prefixes: a -> {b:2} cp=2 ; b -> {a:1, c:1} cp=2
    p_ab, p_ba, p_bc = 2 / 2, 1 / 2, 1 / 2
    m1 = (math.log2(p_ab) + math.log2(p_ba)) / 2
    m2 = (math.log2(p_ab) + math.log2(p_bc)) / 2
    assert out[1]["n_bigrams"] == 2
    assert abs(out[1]["mean_log2p"] - round(m1, 6)) < 1e-9
    assert abs(out[2]["mean_log2p"] - round(m2, 6)) < 1e-9
    assert 3 not in out  # single-token doc: no bigrams


# ---------------------------------------------------------------------------
# hashed_linear_score (hashing-trick quality classifier)
# ---------------------------------------------------------------------------


def test_hashed_linear_score_bounds_and_null(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import hashed_linear_score

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha alpha"), (3, "   ")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in hashed_linear_score(df, "text", "doc_id").collect()}
    assert 0.0 < out[1]["qc_score"] < 1.0
    # repeated token -> score equals the single-token score (mean weight)
    one = hashed_linear_score(
        spark.createDataFrame([(9, "alpha")], "doc_id int, text string"),
        "text",
        "doc_id",
    ).collect()[0]
    assert abs(out[2]["qc_score"] - one["qc_score"]) < 1e-9
    # token-less doc scores NULL, not 0.5
    assert out[3]["qc_score"] is None and out[3]["n_tokens"] == 0


def test_hashed_linear_score_deterministic_and_pure(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import hashed_linear_score

    df = spark.createDataFrame(
        [(i, f"tok{i} common words here") for i in range(20)],
        "doc_id int, text string",
    )
    a = {r["doc_id"]: r["qc_score"] for r in hashed_linear_score(df, "text", "doc_id").collect()}
    b = {r["doc_id"]: r["qc_score"] for r in hashed_linear_score(df.repartition(7), "text", "doc_id").collect()}
    assert a == b
    plan = (
        hashed_linear_score(df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_hashed_linear_score_null_text(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import hashed_linear_score

    df = spark.createDataFrame([(1, None), (2, "word")], "doc_id int, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["qc_score"]) for r in hashed_linear_score(df, "text", "doc_id").collect()}
    # NULL text -> NULL count (oracle's len(ts) is NULL), never -1
    assert out[1] == (None, None)
    assert out[2][0] == 1 and out[2][1] is not None


def test_hashed_linear_expr_matches_score_operator(spark):
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.text import (
        hashed_linear_expr,
        hashed_linear_score,
    )

    df = spark.createDataFrame(
        [(i, f"alpha beta tok{i} gamma") for i in range(15)] + [(99, None)],
        "doc_id int, text string",
    )
    via_expr = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", hashed_linear_expr("text").alias("s")).collect()
    }
    via_op = {
        r["doc_id"]: r["qc_score"]
        for r in hashed_linear_score(df, "text", "doc_id").collect()
    }
    assert via_expr == via_op


def test_declarative_classifier_quality_gate(spark, tmp_path):
    import pytest as _pt
    from pydantic import ValidationError

    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table
    from orion_etl_oracle_to_postgres_spark.operators.text import hashed_linear_score
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        MappingSpec,
        QualityFilterSpec,
        TableSpec,
    )

    src = tmp_path / "src"
    rows = [(i, f"word{i} filler text sample number {i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "body"])
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
            MappingSpec(source="body", target="body"),
        ],
        quality_filter=QualityFilterSpec(
            text_column="body", method="classifier", min_quality=0.5
        ),
    )
    kept = {r["id"] for r in compile_table(ctx, spec).df.collect()}
    scores = {
        r["id"]: r["qc_score"]
        for r in hashed_linear_score(df, "body", "id").collect()
    }
    expect = {i for i, s in scores.items() if s is not None and s >= 0.5}
    assert kept == expect
    assert 0 < len(kept) < 40  # the gate actually splits this corpus

    with _pt.raises(ValidationError, match="heuristic|classifier"):
        QualityFilterSpec(text_column="body", method="nope")


def test_hashed_linear_expr_pre_tokenized_and_backticks(spark):
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.functions import tokens
    from orion_etl_oracle_to_postgres_spark.operators.text import (
        hashed_linear_expr,
        hashed_linear_score,
    )

    df = spark.createDataFrame(
        [(i, f"alpha beta tok{i}") for i in range(10)] + [(99, None)],
        "doc_id int, text string",
    )
    # staged-token form (what the compiler gate now emits) == inline form
    staged = {
        r["doc_id"]: r["s"]
        for r in df.withColumn("tk", tokens(F.col("text")))
        .select("doc_id", hashed_linear_expr("tk", pre_tokenized=True).alias("s"))
        .collect()
    }
    inline = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", hashed_linear_expr("text").alias("s")
        ).collect()
    }
    assert staged == inline and staged[99] is None
    # a backtick in the column name must be escaped, not break the expr
    odd = df.withColumnRenamed("text", "we`ird")
    via_odd = {
        r["doc_id"]: r["s"]
        for r in odd.select(
            "doc_id", hashed_linear_expr("we`ird").alias("s")
        ).collect()
    }
    assert via_odd == inline


def test_hashed_linear_trained_weights_roundtrip(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import (
        hashed_linear_score,
        train_hashed_linear,
    )

    # separable fixture: positives speak one vocabulary, negatives another
    rows = [(i, "good fine clean prose here", 1) for i in range(30)] + [
        (100 + i, "zzqx vvrk jjwp garbage", 0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, lab int")
    w, b = train_hashed_linear(
        df, "text", "lab", "doc_id", n_features=32, steps=25, lr=4.0
    )
    assert len(w) == 32 and any(v != 0.0 for v in w)
    # deterministic: same data, same model
    w2, b2 = train_hashed_linear(
        df, "text", "lab", "doc_id", n_features=32, steps=25, lr=4.0
    )
    assert w == w2 and b == b2
    scored = {
        r["doc_id"]: r["qc_score"]
        for r in hashed_linear_score(
            df, "text", "doc_id", n_features=32, weights=w, bias=b
        ).collect()
    }
    pos = [scored[i] for i in range(30)]
    neg = [scored[100 + i] for i in range(30)]
    assert min(pos) > 0.8 and max(neg) < 0.2  # the model actually learned
    # weight-vector length is validated
    import pytest as _pt

    with _pt.raises(ValueError, match="expected"):
        hashed_linear_score(df, "text", "doc_id", n_features=32, weights=[0.1])


def test_quality_filter_spec_weights_validation():
    import pytest as _pt
    from pydantic import ValidationError

    from orion_etl_oracle_to_postgres_spark.spec import QualityFilterSpec

    qf = QualityFilterSpec(
        text_column="body",
        method="classifier",
        n_features=4,
        weights=[0.1, -0.2, 0.3, 0.0],
        bias=0.25,
    )
    assert qf.weights is not None and qf.bias == 0.25
    with _pt.raises(ValidationError, match="expected n_features"):
        QualityFilterSpec(
            text_column="body", method="classifier", n_features=4, weights=[0.1]
        )
    with _pt.raises(ValidationError, match="requires method"):
        QualityFilterSpec(text_column="body", weights=[0.0] * 64)


def test_declarative_classifier_gate_trained_weights(spark, tmp_path):
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.compiler import JobContext, compile_table
    from orion_etl_oracle_to_postgres_spark.operators.text import hashed_linear_score
    from orion_etl_oracle_to_postgres_spark.spec import (
        ConnectorsSpec,
        FilesConnectorSpec,
        GlobalSpec,
        MappingSpec,
        QualityFilterSpec,
        TableSpec,
    )

    src = tmp_path / "src"
    rows = [(i, "good fine clean prose here") for i in range(10)] + [
        (100 + i, "zzqx vvrk jjwp garbage") for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["id", "body"])
    df.write.parquet(str(src / "t.parquet"))
    # hand weights: buckets of the 'good' vocab positive — enough that
    # the gate keeps exactly the positive-vocab rows
    from orion_etl_oracle_to_postgres_spark.operators.text import train_hashed_linear

    lab = df.withColumn("lab", (F.col("id") < 100).cast("int"))
    w, b = train_hashed_linear(
        lab, "body", "lab", "id", n_features=16, steps=25, lr=4.0
    )
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
            MappingSpec(source="body", target="body"),
        ],
        quality_filter=QualityFilterSpec(
            text_column="body",
            method="classifier",
            min_quality=0.5,
            n_features=16,
            weights=w,
            bias=b,
        ),
    )
    out = compile_table(ctx, spec).df
    kept = {r["id"] for r in out.collect()}
    assert kept == set(range(10))
    # the staged token temp column must not leak into the output
    assert all(not c.startswith("_qc_tokens") for c in out.columns)
    # parity with the operator form at the same model
    scores = {
        r["doc_id"]: r["qc_score"]
        for r in hashed_linear_score(
            df.withColumnRenamed("id", "doc_id"), "body", "doc_id",
            n_features=16, weights=w, bias=b,
        ).collect()
    }
    assert kept == {i for i, s in scores.items() if s is not None and s >= 0.5}


def test_bpe_pair_counts_hand_computed(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import bpe_pair_counts

    # words: "aba" x2 (via two docs), "ab" x1, "x" x1 (no pairs)
    df = spark.createDataFrame(
        [(1, "aba ab"), (2, "aba x")], "doc_id int, text string"
    )
    out = {(r["sym_a"], r["sym_b"]): r["n_pairs"] for r in bpe_pair_counts(df, "text", k=10).collect()}
    # 'ab': aba contributes 1 per occurrence (x2) + ab (x1) = 3
    # 'ba': aba x2 = 2 ; single-char word contributes nothing
    assert out == {("a", "b"): 3, ("b", "a"): 2}


def test_bpe_merges_hand_computed(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import bpe_merges

    # corpus words: "abab" x3, "ab" x2, "b" x1
    df = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "abab ab b")], "doc_id int, text string"
    )
    out = [tuple(r) for r in bpe_merges(df, "text", n_merges=3).collect()]
    # round 1: pairs ab: 3*2+2 = 8, ba: 3 -> merge (a,b)->ab, n=8
    # round 2: words now |ab|ab| x3, |ab| x2, |b|: pairs (ab,ab): 3
    # round 3: words |abab| x3, |ab| x2, |b| — no pairs left... except
    # none: every word is a single symbol -> training dries up at 2
    assert out[0] == (1, "a", "b", "ab", 8)
    assert out[1] == (2, "ab", "ab", "abab", 3)
    assert len(out) == 2  # dries up: no pairs remain


def test_bpe_merges_greedy_overlap(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import bpe_merges

    # "aaa": pairs (a,a) x2 -> merge (a,a). Greedy left-to-right
    # re-segmentation gives |aa|a| (NOT |a|aa|): round 2's top pair must
    # therefore be (aa, a).
    df = spark.createDataFrame([(1, "aaa aaa")], "doc_id int, text string")
    out = [tuple(r) for r in bpe_merges(df, "text", n_merges=2).collect()]
    assert out[0] == (1, "a", "a", "aa", 4)
    assert out[1] == (2, "aa", "a", "aaa", 2)


def test_bpe_merges_deterministic_and_empty(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import bpe_merges

    df = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(6)], "doc_id int, text string"
    )
    a = [tuple(r) for r in bpe_merges(df, "text", n_merges=4).collect()]
    b = [tuple(r) for r in bpe_merges(df.repartition(3), "text", n_merges=4).collect()]
    assert a == b and len(a) == 4
    # empty / NULL-text corpus -> zero rules, well-formed schema
    empty = spark.createDataFrame([(1, None)], "doc_id int, text string")
    out = bpe_merges(empty, "text", n_merges=2)
    assert out.columns == ["merge_rank", "sym_a", "sym_b", "merged", "n_pairs"]
    assert out.count() == 0


def test_bpe_pair_counts_deterministic_topk(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)], "doc_id int, text string"
    )
    a = [tuple(r) for r in bpe_pair_counts(df, "text", k=5).collect()]
    b = [tuple(r) for r in bpe_pair_counts(df.repartition(4), "text", k=5).collect()]
    assert a == b and len(a) == 5


def test_bpe_encode_reproduces_training_segmentation(spark):
    """Encoding a training word with the learned rules must reproduce
    the segmentation the final training round saw — the train/apply
    contract. 'merge' with rules [(e,r),(m,er)... ] exercises a
    multi-char second-order merge."""
    from orion_etl_oracle_to_postgres_spark.operators.text import (
        bpe_encode,
        bpe_merges,
    )

    df = spark.createDataFrame(
        [(1, "merge merge mermer"), (2, "merge rem")], "doc_id int, text string"
    )
    rules = [
        (r["sym_a"], r["sym_b"]) for r in bpe_merges(df, "text", n_merges=3).collect()
    ]
    # 'er' dominates ('merge' x3 + 'mermer' x2 + 'rem'? no: rem has no er)
    assert rules[0] == ("e", "r")
    out = {
        r["doc_id"]: r
        for r in bpe_encode(df, "text", "doc_id", rules).collect()
    }
    # replay the learned rules in python over 'merge': same chained
    # left-to-right replace on the double-delimited form
    seg = "||" + "".join(c + "||" for c in "merge")
    for a, b in rules:
        seg = seg.replace(f"|{a}||{b}|", f"|{a}{b}|")
    expected = [s for s in seg.split("|") if s]
    head = out[1]["head_subwords"].split(" ")
    assert head[: len(expected)] == expected
    assert out[1]["n_words"] == 3
    # ratio < word length: merges actually fired
    assert out[1]["subwords_per_word"] < 5.0
    assert len(expected) < 5  # 'merge' genuinely compressed


def test_bpe_encode_null_empty_and_plan(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import bpe_encode

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "aa")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in bpe_encode(df, "text", "doc_id", [("a", "a")]).collect()}
    assert out[1]["n_words"] is None and out[1]["subwords_per_word"] is None
    assert out[2]["n_words"] == 0 and out[2]["head_subwords"] == ""
    assert out[3]["head_subwords"] == "aa"
    plan = (
        bpe_encode(df, "text", "doc_id", [("a", "a")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure projection
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        bpe_encode(df, "text", "doc_id", [])


def test_span_corruption_full_mask_sentinels(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta echo foxtrot golf")],
        "doc_id int, text string",
    )
    r = text.span_corruption(
        df, "text", "doc_id", span_tokens=3, mask_permille=1000
    ).collect()[0]
    assert r["n_spans"] == 3  # ceil(7/3)
    assert r["n_masked"] == 3
    assert r["input_text"] == "<extra_id_0> <extra_id_1> <extra_id_2>"
    assert r["target_text"] == (
        "<extra_id_0> alpha beta gamma "
        "<extra_id_1> delta echo foxtrot <extra_id_2> golf"
    )


def test_span_corruption_no_mask_passthrough(spark):
    df = spark.createDataFrame(
        [(7, "One two THREE four")], "doc_id int, text string"
    )
    r = text.span_corruption(
        df, "text", "doc_id", span_tokens=2, mask_permille=0
    ).collect()[0]
    assert r["n_masked"] == 0
    assert r["input_text"] == "one two three four"  # tokens() lowercases
    assert r["target_text"] == ""


def test_span_corruption_drops_empty_and_is_zero_shuffle(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, None), (2, "   !!! "), (3, "word")], "doc_id int, text string"
    )
    out = text.span_corruption(df, "text", "doc_id", span_tokens=5)
    assert [r["doc_id"] for r in out.collect()] == [3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # entirely in-row
    with pytest.raises(ValueError, match="span_tokens"):
        text.span_corruption(df, "text", "doc_id", span_tokens=0)
    with pytest.raises(ValueError, match="mask_permille"):
        text.span_corruption(df, "text", "doc_id", mask_permille=1001)


def test_span_corruption_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta epsilon zeta eta") for i in range(20)],
        "doc_id int, text string",
    )
    a = text.span_corruption(df, "text", "doc_id", span_tokens=2).collect()
    b = text.span_corruption(df, "text", "doc_id", span_tokens=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # seed changes the mask pattern somewhere in 20 docs
    c = text.span_corruption(df, "text", "doc_id", span_tokens=2, seed="other").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_gopher_rules_each_rule_fires(spark):
    good = "the data and that have with a filter " + "scan merge join " * 4
    rows = [
        (1, good),                                   # passes everything
        (2, "the of and to a"),                      # too few words
        (3, "supercalifragilistic " * 12 + "the of and in to be"),  # long words
        (4, good + " ###########"),                  # symbol ratio
        (5, "- the one\n- of two\n- and three\n- that four\n"
            "- have five\n- with six\n- in seven\n- to eight\n"
            "- be nine\n- a ten\n- the eleven\n- of twelve"),  # all bullets
        (6, "the end is near...\nof more dots...\nand that have with in a b c d"),
        (7, "1 2 3 4 5 6 7 8 9 10 11 12 the of"),    # numeric words
        (8, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in text.gopher_rules(df, "text", "doc_id").collect()}
    assert out[1]["keep"] and out[1]["failed_rules"] == ""
    assert not out[2]["r_word_count"]
    assert not out[3]["r_mean_word_len"]
    assert not out[4]["r_symbol_ratio"]
    assert not out[5]["r_bullet_lines"]
    assert not out[6]["r_ellipsis_lines"]
    assert not out[7]["r_alpha_words"]
    assert not out[8]["r_stopwords"]
    assert out[8]["failed_rules"] == "stopwords"
    for i in range(2, 9):
        assert not out[i]["keep"]


def test_gopher_rules_null_text_and_plan(spark):
    df = spark.createDataFrame([(1, None)], "doc_id int, text string")
    r = text.gopher_rules(df, "text", "doc_id").collect()[0]
    assert r["n_words"] == 0 and not r["keep"]
    assert "word_count" in r["failed_rules"]
    # empty token list: mean-word-len rule is vacuously true, not NULL
    assert r["r_mean_word_len"] is True
    plan = (
        text.gopher_rules(df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # zero-shuffle projection


def test_readability_null_text_scores_null(spark):
    """NULL text must score NULL across the board — non-ANSI
    size(NULL) = -1 would otherwise fabricate n_words = -1 (the
    catalogued size-of-null bug class)."""
    from orion_etl_oracle_to_postgres_spark.operators.text import (
        readability_scores,
    )

    df = spark.createDataFrame(
        [(1, "Simple words read well."), (2, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in readability_scores(df, "text", "doc_id").collect()}
    assert rows[2].n_words is None
    assert rows[2].n_sentences is None
    assert rows[2].n_syllables is None
    assert rows[2].flesch is None
    assert rows[1].n_words == 4 and rows[1].flesch is not None


def test_vocab_divergence_detects_shifted_terms(spark):
    from orion_etl_oracle_to_postgres_spark.operators.text import (
        vocab_divergence,
    )

    a = spark.createDataFrame(
        [(i, "alpha beta gamma common words here") for i in range(10)],
        "id long, text string",
    )
    b = spark.createDataFrame(
        [(i, "delta epsilon zeta common words here") for i in range(10)],
        "id long, text string",
    )
    out = vocab_divergence(a, b, "text", top_terms=6)
    rows = out.collect()
    assert len(rows) == 6
    top = {r.term for r in rows}
    # the six one-sided terms dominate; shared terms contribute ~0
    assert top == {"alpha", "beta", "gamma", "delta", "epsilon", "zeta"}
    for r in rows:
        assert r.jsd_contrib > 0
        assert (r.n_a == 0) != (r.n_b == 0)
    # deterministic across partitioning
    out2 = vocab_divergence(a.repartition(3), b.repartition(2), "text", top_terms=6)
    assert [
        (r.term, r.jsd_contrib) for r in out2.collect()
    ] == [(r.term, r.jsd_contrib) for r in rows]
    import pytest

    with pytest.raises(ValueError, match="top_terms"):
        vocab_divergence(a, b, "text", top_terms=0)


def test_nb_train_score_separates_clear_classes(spark):
    """nb_train/nb_score: distinct vocabularies classify perfectly;
    priors dominate on no-evidence docs; margins are positive; NULL
    labels and token-less docs are excluded from training."""
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.text import (
        nb_score,
        nb_train,
    )

    train = spark.createDataFrame(
        [
            (1, "apple banana fruit sweet", "food"),
            (2, "banana apple tasty fruit", "food"),
            (3, "gear engine piston motor", "cars"),
            (4, "engine motor throttle gear", "cars"),
            (5, "ignored text", None),       # NULL label: excluded
            (6, "   ", "food"),              # token-less: excluded
        ],
        "id long, body string, cls string",
    )
    model, priors = nb_train(train, "body", "cls")
    p = {r["label"]: r for r in priors.collect()}
    assert set(p) == {"food", "cars"}
    assert p["food"]["n_docs"] == 2 and p["cars"]["n_docs"] == 2
    test = spark.createDataFrame(
        [
            (10, "sweet banana fruit"),
            (11, "piston engine gear"),
            (12, "zzz qqq vvv"),  # all unseen: priors + unseen mass decide
        ],
        "id long, body string",
    )
    out = {r["id"]: r for r in
           nb_score(test, "id", "body", model, priors).collect()}
    assert out[10]["predicted"] == "food" and out[10]["margin"] > 0
    assert out[11]["predicted"] == "cars" and out[11]["margin"] > 0
    # equal priors + all-unseen tokens: decided by the per-label unseen
    # mass (cars has the smaller vocabulary+token total here or ties);
    # the verdict must at least be deterministic with a margin >= 0
    assert out[12]["margin"] >= 0


def test_nb_score_counts_token_repeats(spark):
    """The multinomial model: a repeated token contributes its
    log-likelihood once PER OCCURRENCE, so repetition flips a doc
    whose single-occurrence evidence is balanced."""
    from orion_etl_oracle_to_postgres_spark.operators.text import (
        nb_score,
        nb_train,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta", "x"),
            (2, "alpha gamma", "y"),
        ],
        "id long, body string, cls string",
    )
    model, priors = nb_train(train, "body", "cls")
    test = spark.createDataFrame(
        [(10, "beta beta beta gamma")], "id long, body string"
    )
    out = nb_score(test, "id", "body", model, priors).collect()[0]
    assert out["predicted"] == "x"  # 3x beta outvotes 1x gamma
