"""[EXT] Similarity search: brute-force top-k, LSH bucketing, near-dup
pairs (SURVEY.md §2.11)."""

from __future__ import annotations

import math

from orion_etl_oracle_to_postgres_spark.operators import similarity


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
        (5, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_topk_query_order(spark):
    out = similarity.cosine_topk_query(_vecs(spark), [1.0, 0.0, 0.0], k=3)
    ids = [r["vec_id"] for r in out.collect()]
    assert ids == [1, 2, 5]


def test_topk_query_values(spark):
    out = similarity.cosine_topk_query(_vecs(spark), [1.0, 0.0, 0.0], k=5)
    sims = {r["vec_id"]: r["cosine_sim"] for r in out.collect()}
    assert abs(sims[1] - 1.0) < 1e-6
    assert abs(sims[3] - 0.0) < 1e-6
    assert abs(sims[4] + 1.0) < 1e-6
    assert abs(sims[5] - 0.7 / math.sqrt(0.98)) < 1e-4


def test_topk_pairs(spark):
    out = similarity.cosine_topk_pairs(_vecs(spark), k=1)
    best = {r["id_a"]: r["id_b"] for r in out.collect()}
    assert best[1] == 2  # closest to e_x is the 0.9/0.1 vector
    assert best[4] == 3  # -e_x: least-negative neighbor is the orthogonal one


def test_near_dups_exact(spark):
    out = similarity.embedding_near_dups(_vecs(spark), threshold=0.9, exact=True)
    pairs = {(r["id_i"], r["id_j"]) for r in out.collect()}
    assert (1, 2) in pairs
    assert all(i < j for i, j in pairs)


def test_near_dups_lsh_subset_of_exact(spark):
    exact = similarity.embedding_near_dups(_vecs(spark), threshold=0.9, exact=True)
    lsh = similarity.embedding_near_dups(
        _vecs(spark), threshold=0.9, exact=False, n_planes=4
    )
    exact_pairs = {(r["id_i"], r["id_j"]) for r in exact.collect()}
    lsh_pairs = {(r["id_i"], r["id_j"]) for r in lsh.collect()}
    assert lsh_pairs <= exact_pairs  # LSH may miss, never invents


def test_lsh_topk_contains_identical_vector(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in e.first()["embedding"]]
    qid = e.first()["vec_id"]
    out = similarity.lsh_topk(e, qv, k=5, n_planes=6)
    rows = out.collect()
    assert rows and rows[0]["vec_id"] == qid  # the query vector itself buckets with itself
    assert abs(rows[0]["cosine_sim"] - 1.0) < 1e-6


def test_planes_deterministic():
    a = similarity.make_planes(8, 4, seed=7)
    b = similarity.make_planes(8, 4, seed=7)
    assert (a == b).all()


def test_ivf_assign_deterministic_and_total(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = similarity.ivf_assign(e, n_centroids=8)
    rows = a.collect()
    # every vector assigned exactly once, to a valid centroid
    assert len(rows) == e.count()
    assert all(0 <= r["cluster_id"] < 8 for r in rows)
    # centroids assign to themselves (cosine(v, v) = 1 is the max)
    own = {r["vec_id"]: r["cluster_id"] for r in rows if r["vec_id"] < 8}
    assert own == {i: i for i in range(8)}


def test_ivf_topk_full_probe_is_exact(spark, sf_dir):
    """nprobe == n_centroids searches every cluster ⇒ identical to the
    brute-force ranking (precision check of the whole pipeline)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in e.filter("vec_id = 0").select("embedding").first()[0]]
    exact = [r["vec_id"] for r in similarity.cosine_topk_query(e, qv, k=5).collect()]
    ivf = [
        r["vec_id"]
        for r in similarity.ivf_topk(e, qv, k=5, n_centroids=8, nprobe=8).collect()
    ]
    assert ivf == exact


def test_ivf_topk_partial_probe_recall(spark, sf_dir):
    """nprobe < n_centroids is approximate but must keep decent recall
    and perfect precision (scores are exact for returned rows)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in e.filter("vec_id = 0").select("embedding").first()[0]]
    exact = {r["vec_id"] for r in similarity.cosine_topk_query(e, qv, k=10).collect()}
    approx = similarity.ivf_topk(e, qv, k=10, n_centroids=16, nprobe=4).collect()
    # the query vector itself lives in a probed cluster by construction
    assert 0 in {r["vec_id"] for r in approx}
    recall = len({r["vec_id"] for r in approx} & exact) / 10
    assert recall >= 0.5


def test_ivf_materialized_matches_runtime_and_prunes_partitions(spark, tmp_path):
    """The materialized-IVF layout (VERDICT r2 #6): same top-k as the
    runtime ivf_topk, and the probe is PARTITION PRUNING — the scan
    plans only the probed cluster_id= directories."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = rows[0][1]

    path = str(tmp_path / "ivf")
    similarity.ivf_materialize(df, path, n_centroids=8)

    mat = similarity.ivf_topk_materialized(spark, path, qv, k=5, nprobe=3)
    run = similarity.ivf_topk(df, qv, k=5, n_centroids=8, nprobe=3)
    assert [tuple(r) for r in mat.collect()] == [tuple(r) for r in run.collect()]

    plan = mat._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan

    # pruning is real: the scan's numFiles metric counts files actually
    # planned — nprobe=3 of 8 cluster directories, not all of them
    def files_read(d):
        d.collect()
        leaf = d._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return leaf.metrics().apply("numFiles").value()

    probes = similarity.ivf_probe_clusters(spark, path, qv, nprobe=3)
    assert len(probes) == 3
    pruned_scan = spark.read.parquet(path).filter(F.col("cluster_id").isin(probes))
    total = files_read(spark.read.parquet(path))
    probed = files_read(pruned_scan)
    # 3 of 8 clusters probed; file counts scale with directories planned
    assert 0 < probed < total


def test_ivf_materialize_centroid_codebook_hidden(spark, tmp_path):
    """_centroids lives inside the dataset dir but must be invisible to
    the data reader (underscore prefix)."""
    rows = [(i, [float(i), 1.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf2")
    similarity.ivf_materialize(df, path, n_centroids=4)
    data = spark.read.parquet(path)
    assert set(data.columns) == {"vec_id", "embedding", "cluster_id"}
    assert data.count() == 20
    cent = spark.read.parquet(path + "/_centroids")
    assert cent.count() == 4


def test_label_centroids_matches_numpy(spark):
    import numpy as np

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        label_centroids,
    )

    rng = np.random.default_rng(7)
    rows = [
        (int(i), int(i % 3), [float(x) for x in rng.normal(size=8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")
    got = {
        r["label"]: r["centroid"]
        for r in label_centroids(df, "label", "embedding").collect()
    }
    for lbl in range(3):
        want = np.mean([v for _, l, v in rows if l == lbl], axis=0)
        assert np.allclose(got[lbl], np.round(want, 6), atol=1e-9)


def test_ivf_train_recovers_blob_structure(spark):
    """Three well-separated Gaussian blobs, k=3, two Lloyd rounds:
    trained centroids land on the blob means and assignment through the
    trained codebook groups each blob together."""
    import numpy as np

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        ivf_assign,
        ivf_train,
    )

    rng = np.random.default_rng(11)
    blobs = [np.array([10.0, 0, 0, 0]), np.array([0, 10.0, 0, 0]), np.array([0, 0, 10.0, 0])]
    rows = []
    for i in range(90):
        b = i % 3
        v = blobs[b] + rng.normal(scale=0.3, size=4)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    code = ivf_train(df, n_centroids=3, iters=2)
    cents = {r["cluster_id"]: np.array(r["centroid"]) for r in code.collect()}
    assert len(cents) == 3
    # each blob mean is ~cosine-1 to exactly one trained centroid
    for b in blobs:
        sims = sorted(
            float(b @ c / (np.linalg.norm(b) * np.linalg.norm(c)))
            for c in cents.values()
        )
        assert sims[-1] > 0.99 and sims[-2] < 0.5

    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in ivf_assign(df, centroids=code).collect()
    }
    for b in range(3):
        ids = [i for i in range(90) if i % 3 == b]
        assert len({assign[i] for i in ids}) == 1


def test_knn_join_matches_numpy(spark):
    import numpy as np

    from orion_etl_oracle_to_postgres_spark.operators.similarity import knn_join

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter("vec_id < 3")
    out = knn_join(q, df, k=4)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for qi in range(3):
        order = sorted(range(40), key=lambda j: (-round(sims[qi, j], 6), j))
        for rank, j in enumerate(order[:4], start=1):
            assert got[(qi, rank)] == j


def test_knn_join_lsh_subset_of_exact_per_bucket(spark):
    """Every LSH result must also be an exact-scoring result computed
    over the SAME candidate bucket (precision 1 within candidates)."""
    import numpy as np

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        knn_join,
        knn_join_lsh,
    )

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter("vec_id % 20 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in knn_join(q, df, k=60).collect()
    }
    for r in knn_join_lsh(q, df, k=5, n_planes=3).collect():
        # sim values must agree with the exact join wherever both exist
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine_sim"]


def test_near_dups_exact_block_side_cached_per_plan(spark):
    """Repeated exact invocations over the SAME frame reuse the
    collected+broadcast comparison matrix (keyed by semantic hash,
    verified by sameSemantics — VERDICT r3 #3); a different frame or a
    tighter caller limit must NOT be served from the cache."""
    similarity._BLOCK_SIDE_CACHE.clear()
    d = _vecs(spark)
    r1 = {
        (r["id_i"], r["id_j"], r["cosine_sim"])
        for r in similarity.embedding_near_dups(d, threshold=0.5, exact=True).collect()
    }
    assert len(similarity._BLOCK_SIDE_CACHE) == 1
    payload1 = next(iter(similarity._BLOCK_SIDE_CACHE.values()))[2]
    r2 = {
        (r["id_i"], r["id_j"], r["cosine_sim"])
        for r in similarity.embedding_near_dups(d, threshold=0.5, exact=True).collect()
    }
    assert r1 == r2 and r1
    assert next(iter(similarity._BLOCK_SIDE_CACHE.values()))[2] is payload1
    # different frame → different cache entry, not a stale hit
    d2 = d.filter("vec_id <= 3")
    out2 = similarity.embedding_near_dups(d2, threshold=-1.0, exact=True)
    ids2 = {r["id_i"] for r in out2.collect()} | {r["id_j"] for r in out2.collect()}
    assert ids2 == {1, 2, 3}
    assert len(similarity._BLOCK_SIDE_CACHE) == 2
    # a tighter limit than the cached side's row count re-validates
    import pytest

    with pytest.raises(ValueError, match="broadcast_limit"):
        similarity.embedding_near_dups(d, threshold=0.5, exact=True, broadcast_limit=2)


def test_near_dups_exact_small_path_matches_distributed(spark, monkeypatch):
    """The driver-matmul fast path (inputs ≤ _SMALL_PAIRS_LIMIT) must
    return exactly the rows and sims of the distributed mapInPandas
    branch — forcing the limit to 0 exercises the distributed branch on
    the same data (VERDICT r4 ask #3)."""
    similarity._BLOCK_SIDE_CACHE.clear()
    d = _vecs(spark)
    small = {
        (r["id_i"], r["id_j"], r["cosine_sim"])
        for r in similarity.embedding_near_dups(d, threshold=0.3, exact=True).collect()
    }
    monkeypatch.setattr(similarity, "_SMALL_PAIRS_LIMIT", 0)
    dist = {
        (r["id_i"], r["id_j"], r["cosine_sim"])
        for r in similarity.embedding_near_dups(d, threshold=0.3, exact=True).collect()
    }
    assert small == dist and small
    # empty result still builds a well-formed frame on the small path
    monkeypatch.setattr(similarity, "_SMALL_PAIRS_LIMIT", 5000)
    empty = similarity.embedding_near_dups(d, threshold=1.1, exact=True)
    assert empty.columns == ["id_i", "id_j", "cosine_sim"]
    assert empty.count() == 0


def test_knn_join_broadcast_guard_raises(spark):
    """An oversized query side must fail loudly at plan-build time, not
    OOM an executor mid-broadcast (VERDICT r3 #2)."""
    import pytest

    d = _vecs(spark)
    with pytest.raises(ValueError, match="broadcast_limit"):
        similarity.knn_join(d, d, k=2, broadcast_limit=2)
    with pytest.raises(ValueError, match="broadcast_limit"):
        similarity.knn_join_lsh(d, d, k=2, broadcast_limit=2)
    # at/under the limit still works
    out = similarity.knn_join(d, d, k=1, broadcast_limit=5)
    assert out.count() == 5


def test_multi_family_lsh_is_superset_and_bucket_join(spark, sf_dir):
    """n_families>1 unions independent plane families: per-query
    candidate sets (and lsh_topk's) must contain the single-family
    ones, and the physical plan must stay a bucket equi-join (hash
    join on the exploded (family, bucket) keys — no cartesian)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter("vec_id % 53 = 0")
    one = similarity.knn_join_lsh(q, e, k=50, n_planes=6, n_families=1)
    two = similarity.knn_join_lsh(q, e, k=50, n_planes=6, n_families=2)
    pairs1 = {(r["query_id"], r["neighbor_id"]) for r in one.collect()}
    pairs2 = {(r["query_id"], r["neighbor_id"]) for r in two.collect()}
    assert pairs1 <= pairs2
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    qv = [float(x) for x in e.filter("vec_id = 0").select("embedding").first()[0]]
    t1 = {r["vec_id"] for r in similarity.lsh_topk(e, qv, k=500, n_planes=8).collect()}
    t2 = {
        r["vec_id"]
        for r in similarity.lsh_topk(e, qv, k=500, n_planes=8, n_families=3).collect()
    }
    assert t1 <= t2 and len(t2) >= len(t1)


def test_quantize_roundtrip_error_bound(spark):
    """int8 quantization reconstruction error is bounded by half a step
    (scale/254); zero vectors survive with scale 0; dot products
    recovered from codes stay close."""
    import math

    rows = [
        (1, [1.0, -0.5, 0.25]),
        (2, [0.0, 0.0, 0.0]),
        (3, [-2.0, 2.0, 1.999]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    err = {r["vec_id"]: r for r in similarity.quantization_error(df).collect()}
    assert err[2]["scale"] == 0.0 and err[2]["max_abs_err"] == 0.0
    for vid, vec in [(1, rows[0][1]), (3, rows[2][1])]:
        # + 5e-9: the report rounds to 8 decimals, which can tip a value
        # sitting exactly ON the bound just past it
        bound = max(abs(x) for x in vec) / 254 + 5e-9
        assert err[vid]["max_abs_err"] <= bound
    # dequantized dot vs true dot
    q = {r["vec_id"]: (r["scale"], list(r["qvec"])) for r in similarity.quantize_embeddings(df).collect()}
    s1, q1 = q[1]
    s3, q3 = q[3]
    approx = (s1 * s3 / (127.0 * 127.0)) * sum(a * b for a, b in zip(q1, q3))
    true = sum(a * b for a, b in zip(rows[0][1], rows[2][1]))
    assert math.isclose(approx, true, abs_tol=0.05)


def test_semantic_dedup_clusters_and_singletons(spark):
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        semantic_dedup,
    )

    # 1 and 2 nearly parallel (cosine ~1); 3 orthogonal-ish singleton
    rows = [
        (1, [1.0, 0.0, 0.0, 0.01]),
        (2, [0.99, 0.01, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(df, threshold=0.9, n_planes=4).collect()}
    assert len(out) == 3
    assert out[1]["cluster_id"] == 1 and out[1]["keep"]
    assert out[2]["cluster_id"] == 1 and not out[2]["keep"]
    assert out[3]["cluster_id"] == 3 and out[3]["keep"]


def test_near_dups_rejects_nonpositive_planes(spark):
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        embedding_near_dups,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="n_planes"):
        embedding_near_dups(df, n_planes=0)


def test_dedup_spec_rejects_nonpositive_planes():
    import pytest

    from orion_etl_oracle_to_postgres_spark.spec import DedupSpec

    with pytest.raises(ValueError, match="n_planes"):
        DedupSpec(method="semantic", vector_column="v", id_column="i", n_planes=0)


def test_centroid_drift_zero_for_identical_and_positive_for_shifted(spark):
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        centroid_drift,
    )

    rows = [(i, [1.0, 0.0, 0.5], 0) for i in range(4)] + [
        (i, [0.0, 1.0, 0.5], 1) for i in range(4, 8)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label int")
    # identical snapshots -> drift 0 for every label
    out = {r["label"]: r for r in
           centroid_drift(df, df, "label", "embedding").collect()}
    assert out[0]["cosine_drift"] == 0.0 and out[1]["cosine_drift"] == 0.0
    assert out[0]["n_old"] == out[0]["n_new"] == 4

    # rotate label 0's vectors in the 'new' snapshot -> positive drift
    import pyspark.sql.functions as F

    new = df.withColumn(
        "embedding",
        F.when(F.col("label") == 0, F.array(F.lit(0.0), F.lit(1.0), F.lit(0.5)))
        .otherwise(F.col("embedding")),
    )
    out2 = {r["label"]: r for r in
            centroid_drift(df, new, "label", "embedding").collect()}
    assert out2[0]["cosine_drift"] > 0.5
    assert out2[1]["cosine_drift"] == 0.0

    # label present on only one side is dropped
    only_old = df.filter("label = 0")
    out3 = centroid_drift(only_old, df.filter("label = 1"), "label", "embedding")
    assert out3.count() == 0


# ---------------------------------------------------------------------------
# product quantization (pq_encode / pq_adc_topk)
# ---------------------------------------------------------------------------


def _pq_vecs(spark):
    # dim 4, m=2 subspaces of 2; codebook = vec_id < 2
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [0.1, 0.0, 0.9, 1.1]),   # sub0 -> code 0, sub1 -> code 1
        (3, [1.2, 0.8, 0.0, 0.1]),   # sub0 -> code 1, sub1 -> code 0
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_pq_encode_codes_and_error(spark):
    out = {
        r["vec_id"]: (list(r["pq_codes"]), r["pq_err"])
        for r in similarity.pq_encode(_pq_vecs(spark), m=2, n_codes=2).collect()
    }
    assert out[0] == ([0, 0], 0.0)
    assert out[1] == ([1, 1], 0.0)
    assert out[2][0] == [0, 1]
    # err(2) = (0.1^2 + 0) + (0.1^2 + 0.1^2)
    assert math.isclose(out[2][1], 0.03, abs_tol=1e-9)
    assert out[3][0] == [1, 0]


def test_pq_encode_tie_breaks_to_lowest_code(spark):
    # codebook rows are identical -> every subdistance ties -> code 0
    rows = [(0, [1.0, 2.0]), (1, [1.0, 2.0]), (2, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {
        r["vec_id"]: list(r["pq_codes"])
        for r in similarity.pq_encode(df, m=2, n_codes=2).collect()
    }
    assert out == {0: [0, 0], 1: [0, 0], 2: [0, 0]}


def test_pq_encode_rejects_bad_geometry(spark):
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_encode(_pq_vecs(spark), m=3, n_codes=2)
    with pytest.raises(ValueError, match="codebook needs"):
        similarity.pq_encode(_pq_vecs(spark), m=2, n_codes=9)


def test_pq_encode_is_pure_projection(spark):
    # encoding must stay narrow: no exchange anywhere in the plan
    plan = (
        similarity.pq_encode(_pq_vecs(spark), m=2, n_codes=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pq_adc_topk_prefers_own_cell(spark):
    out = similarity.pq_adc_topk(
        _pq_vecs(spark), [0.05, 0.0, 1.0, 1.0], k=2, m=2, n_codes=2
    ).collect()
    # query sits in vec 2's cell (codes [0, 1]); vec 2 shares that cell
    ids = [r["vec_id"] for r in out]
    assert ids[0] in (0, 2)  # code-identical rows tie on ADC distance
    assert all(r["adc_dist"] >= 0 for r in out)


def test_ivf_pq_topk_subset_of_probed_cells(spark):
    # 8 vectors, dim 4, 2 centroids (ids 0/1), 2 codes, m=2.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.1, 0.0, 0.95, 0.0]),
        (4, [1.0, 0.1, 0.1, 0.0]),
        (5, [0.0, 0.1, 1.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = similarity.ivf_pq_topk(
        df, [1.0, 0.0, 0.0, 0.0], k=3, n_centroids=2, nprobe=1, m=2, n_codes=2
    ).collect()
    ids = {r["vec_id"] for r in out}
    # nprobe=1 towards the x-axis centroid: only cell-0 members rank
    assert ids <= {0, 2, 4}
    assert all(r["adc_dist"] >= 0 for r in out)


def test_pq_adc_topk_rejects_mis_sized_query(spark):
    import pytest

    with pytest.raises(ValueError, match="query_vec dim"):
        similarity.pq_adc_topk(_pq_vecs(spark), [0.1, 0.0], k=2, m=2, n_codes=2)


def test_pq_encode_raises_on_ragged_corpus(spark):
    # per-row dim guard: a vector of the wrong length must raise from
    # the plan, not silently mis-stride the codebook
    rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.5, 0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="vector dim"):
        similarity.pq_encode(df, m=2, n_codes=2, dim=2).collect()


def test_pq_materialize_roundtrip_matches_direct_adc(spark, tmp_path):
    path = str(tmp_path / "pq")
    df = _pq_vecs(spark)
    similarity.pq_materialize(df, path, m=2, n_codes=2)
    query = [0.05, 0.0, 1.0, 1.0]
    direct = similarity.pq_adc_topk(df, query, k=4, m=2, n_codes=2).collect()
    mat = similarity.pq_adc_topk_materialized(spark, path, query, k=4, m=2).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in mat] == [
        (r["vec_id"], r["adc_dist"]) for r in direct
    ]
    # codes + err persisted; codebook hidden from the data reader
    data = spark.read.parquet(path)
    assert set(data.columns) >= {"vec_id", "pq_codes", "pq_err"}
    import pytest

    with pytest.raises(ValueError, match="query_vec dim"):
        similarity.pq_adc_topk_materialized(spark, path, [1.0], k=2, m=2)


def test_int8_topk_matches_exact_on_separated_vectors(spark):
    """Quantized cosine ranks well-separated vectors like the exact
    path, and zero query vectors are refused."""
    import pytest as _pt

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        cosine_topk_query,
        int8_topk_query,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.05, 0.0, 0.0]
    exact = [r.vec_id for r in cosine_topk_query(df, q, k=4).collect()]
    quant = [r.vec_id for r in int8_topk_query(df, q, k=4).collect()]
    assert exact == quant  # ordering preserved on separated vectors
    with _pt.raises(ValueError, match="zero query"):
        int8_topk_query(df, [0.0, 0.0, 0.0, 0.0])


def test_int8_topk_is_zero_shuffle_take_ordered(spark):
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        int8_topk_query,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 50)],
        "vec_id long, embedding array<double>",
    )
    plan = (
        int8_topk_query(df, [1.0, 1.0], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_kcenter_sample_farthest_point_semantics(spark):
    """Greedy farthest-point: starts at min id, each pick maximizes the
    min distance to the selected set; k=1 returns just the seed."""
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        kcenter_sample,
    )
    import pytest as _pt

    rows = [
        (1, [0.0, 0.0]),
        (2, [0.1, 0.0]),   # near the seed
        (3, [10.0, 0.0]),  # farthest from seed -> picked 2nd
        (4, [0.0, 9.0]),   # farthest from {1,3} -> picked 3rd
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert [r.vec_id for r in kcenter_sample(df, 1).collect()] == [1]
    assert {r.vec_id for r in kcenter_sample(df, 3).collect()} == {1, 3, 4}
    assert kcenter_sample(df, 4).count() == 4
    with _pt.raises(ValueError, match="k must be"):
        kcenter_sample(df, 0)
    with _pt.raises(ValueError, match="empty"):
        kcenter_sample(df.filter("vec_id > 99"), 2)


def test_kcenter_k_exceeds_rows_raises(spark):
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        kcenter_sample,
    )
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with _pt.raises(ValueError, match="exceeds"):
        kcenter_sample(df, 3)
    # string ids keep their type
    sdf = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("b", [9.0, 0.0])], "vec_id string, embedding array<double>"
    )
    out = kcenter_sample(sdf, 2)
    assert out.schema["vec_id"].dataType.simpleString() == "string"
    assert {r.vec_id for r in out.collect()} == {"a", "b"}


def test_int8_topk_drops_zero_vectors(spark):
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        int8_topk_query,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    out = int8_topk_query(df, [1.0, 0.0], k=5).collect()
    assert {r.vec_id for r in out} == {1, 3}  # zero vector excluded, no NULL rows
    assert all(r.cosine_sim is not None for r in out)


def _labeled_vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], "a"),
        (2, [0.9, 0.1, 0.0], "a"),
        (3, [0.8, 0.2, 0.0], "b"),
        (4, [0.0, 1.0, 0.0], "b"),
        (5, [-1.0, 0.0, 0.0], None),
    ]
    return spark.createDataFrame(
        rows, "vec_id int, embedding array<double>, label string"
    )


def test_hard_negatives_cross_label_only(spark):
    df = _labeled_vecs(spark)
    out = similarity.hard_negative_mining(df, df, k=2)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    # query 1 (label a): negatives are b-labelled 3 then 4, never 2 (same
    # label), never 5 (NULL label), never itself
    n1 = sorted(by_q[1], key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in n1] == [3, 4]
    assert n1[0]["cosine_sim"] > n1[1]["cosine_sim"]
    # NULL-label vec 5 is excluded as a query too
    assert 5 not in by_q
    # every pair crosses labels
    labels = {1: "a", 2: "a", 3: "b", 4: "b"}
    for q, rs in by_q.items():
        for r in rs:
            assert labels[q] != labels[r["neighbor_id"]]


def test_hard_negatives_k_and_plan(spark):
    df = _labeled_vecs(spark)
    out = similarity.hard_negative_mining(df, df, k=1)
    rows = out.collect()
    assert all(r["rank"] == 1 for r in rows)
    assert len(rows) == 4  # one top negative per labelled query
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_dim_stats_known_values(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 2.0]), (2, [2.0, 2.0]), (3, None)],
        "vec_id int, embedding array<double>",
    )
    out = {r["dim"]: r for r in similarity.dim_stats(df, "embedding").collect()}
    assert out[0]["mean"] == 1.0 and out[0]["std"] == 1.0
    assert out[1]["mean"] == 2.0 and out[1]["std"] == 0.0  # constant dim


def test_whiten_zscores_and_zero_variance(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 2.0]), (2, [2.0, 2.0]), (3, None)],
        "vec_id int, embedding array<double>",
    )
    out = {r["vec_id"]: r["whitened"] for r in
           similarity.whiten(df, "vec_id", "embedding").collect()}
    assert out[1] == [-1.0, 0.0]  # dim0 z-scored; constant dim1 -> 0.0
    assert out[2] == [1.0, 0.0]
    assert 3 not in out  # NULL vectors dropped

    empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
    assert similarity.whiten(empty, "vec_id", "embedding").count() == 0


def test_matryoshka_dims_beyond_vector_width_refused(spark):
    """F.slice past the array end silently returns the full vector —
    an oversized d would report recall 1.0 labeled as truncated."""
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="exceed"):
        similarity.matryoshka_recall_audit(
            df, [1.0, 0.0, 0.0, 0.0], dims=(2, 8), k=1
        )


def test_hard_negatives_self_exclusion_scoped_to_self_mining(spark):
    """Mining a DISTINCT corpus whose id space coincides with the query
    table's must NOT veto corpus row id=i as a negative for query id=i;
    same-table mining keeps the exclusion (and the label predicate
    already kills true self-pairs)."""
    from orion_etl_oracle_to_postgres_spark.operators import similarity

    q = spark.createDataFrame(
        [(7, [1.0, 0.0], "a")], "vec_id long, embedding array<double>, label string"
    )
    c = spark.createDataFrame(
        [(7, [1.0, 0.0], "b"), (8, [0.9, 0.1], "b")],
        "vec_id long, embedding array<double>, label string",
    )
    got = similarity.hard_negative_mining(q, c, k=2)
    assert {r.neighbor_id for r in got.collect()} == {7, 8}
    # explicit override still available for id-aligned split tables
    got2 = similarity.hard_negative_mining(q, c, k=2, exclude_self=True)
    assert {r.neighbor_id for r in got2.collect()} == {8}


def test_vector_quality_report_flags_each_failure_mode(spark):
    from orion_etl_oracle_to_postgres_spark.operators import similarity

    df = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),            # healthy, norm 5
            (2, [0.0, 0.0]),            # zero norm
            (3, None),                  # NULL vector
            (4, [1.0]),                 # wrong width
            (5, [float("nan"), 1.0]),   # non-finite
            (6, [6.0, 8.0]),            # healthy, norm 10
        ],
        "vec_id long, embedding array<double>",
    )
    r = similarity.vector_quality_report(df, "embedding").collect()[0]
    assert r.n_vecs == 6 and r.n_null == 1 and r.n_wrong_dim == 1
    assert r.n_nonfinite == 1 and r.n_zero_norm == 1
    assert r.norm_mean == 7.5  # (5 + 10) / 2 over the healthy pair
    assert r.norm_std == 2.5
    # explicit contract width overrides the dominant-population default
    r2 = similarity.vector_quality_report(
        df, "embedding", expected_dim=1
    ).collect()[0]
    assert r2.n_wrong_dim == 4 and r2.norm_mean == 1.0


def test_label_noise_scan_flags_mislabels(spark):
    """A point labeled against its tight cluster is flagged; cluster-
    consistent points are not; a bucket-isolated point reports zero
    neighbors and is never flagged (no evidence != noise)."""
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        label_noise_scan,
    )

    rows = []
    # cluster A around +e1 (label 0) — one deliberately mislabeled as 1
    for i in range(6):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0], 1 if i == 0 else 0))
    # cluster B around -e1 (label 1), consistent
    for i in range(6, 12):
        rows.append((i, [-1.0, 0.01 * i, 0.0, 0.0], 1))
    # isolated point far from both in sign pattern
    rows.append((99, [0.0, 0.0, -1.0, 1.0], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r.vec_id: r for r in label_noise_scan(df, k=3, n_planes=4).collect()}
    assert len(out) == 13  # every input row reports
    assert out[0].flagged is True  # the planted mislabel
    assert out[0].disagreement == 1.0
    for i in range(1, 6):
        # neighbors within cluster A: one of them is the mislabeled 0
        assert out[i].flagged is False
    for i in range(6, 12):
        assert out[i].flagged is False and out[i].n_disagree == 0
    import pytest as _pt

    with _pt.raises(ValueError, match="min_disagreement"):
        label_noise_scan(df, min_disagreement=0.0)
    with _pt.raises(ValueError, match="k must be"):
        label_noise_scan(df, k=0)


def test_pca_power_recovers_dominant_direction(spark):
    """A cloud stretched along axis 0 (variance 100x the rest) must
    yield PC1 ~ e0 with near-total explained share; covariance entries
    are exact against hand computation; empty input returns an empty
    frame with the contract schema."""
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        covariance_matrix,
        pca_power,
    )

    # 4 points on axis 0 at +-10, tiny fixed noise on axis 1
    rows = [
        (0, [10.0, 0.1, 0.0]),
        (1, [-10.0, -0.1, 0.0]),
        (2, [10.0, -0.1, 0.0]),
        (3, [-10.0, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cov = {
        r["pos"]: r["cov"] for r in covariance_matrix(df, "embedding").collect()
    }
    # hand: var(axis0) = 100, var(axis1) = 0.01, cross-cov = 0
    assert cov[0 * 3 + 0] == 100.0
    assert cov[1 * 3 + 1] == 0.01
    assert cov[0 * 3 + 1] == 0.0 and cov[2 * 3 + 2] == 0.0

    out = {r["dim"]: r for r in pca_power(df, "embedding", iters=8).collect()}
    assert abs(abs(out[0]["loading"]) - 1.0) < 1e-6
    assert abs(out[1]["loading"]) < 1e-3 and out[2]["loading"] == 0.0
    assert abs(out[0]["eigenvalue"] - 100.0) < 0.01
    assert out[0]["explained_share"] > 0.999
    # eigenvalue/share constant across rows
    assert len({r["eigenvalue"] for r in out.values()}) == 1

    empty = pca_power(df.filter("vec_id < 0"), "embedding")
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "dim", "loading", "eigenvalue", "explained_share"
    ]


def test_semantic_contamination_flags_and_guard(spark):
    """Identical vector flagged at cosine 1.0; orthogonal corpus rows
    stay; benchmark side broadcast; oversized benchmark refused."""
    import pytest
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        semantic_contamination,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.9, 0.1, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_contamination(
            corpus, bench, threshold=0.9
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["max_cosine"] == 1.0 and out[1]["n_matches"] == 1
    assert 0.9 <= out[3]["max_cosine"] < 1.0

    plan = (
        semantic_contamination(corpus, bench, threshold=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

    with pytest.raises(ValueError, match="broadcast_limit"):
        semantic_contamination(corpus, bench, broadcast_limit=0)


def test_remove_top_component_kills_dominant_direction(spark):
    """After ABTT, the former dominant axis carries ~zero variance and
    the residual axis survives; adjusted vectors are orthogonal to v1
    (dot ~ 0); empty input keeps the contract schema."""
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        remove_top_component,
    )

    rows = [
        (0, [10.0, 1.0, 0.0]),
        (1, [-10.0, -1.0, 0.0]),
        (2, [10.0, -1.0, 0.0]),
        (3, [-10.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["adjusted"] for r in
           remove_top_component(df, "vec_id", "embedding").collect()}
    assert len(out) == 4
    # dominant axis (0) removed: residual |x0| tiny; axis 1 preserved
    for vid, adj in out.items():
        assert abs(adj[0]) < 0.05, adj
    assert abs(abs(out[0][1]) - 1.0) < 0.05
    # variance on the removed direction collapses
    var0 = sum(a[0] ** 2 for a in out.values()) / 4
    assert var0 < 0.001

    empty = remove_top_component(
        df.filter("vec_id < 0"), "vec_id", "embedding"
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["vec_id", "adjusted"]


def test_pca_power_degenerate_input_fails_loudly(spark):
    """A constant vector column has no principal direction; the SQL
    replay would divide by zero — the operator must refuse, not
    silently diverge from the oracle."""
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        pca_power,
    )

    df = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="zero covariance matvec"):
        pca_power(df, "embedding")


def test_pca_power_simplex_restart(spark):
    """Probability-simplex vectors (constant coordinate sum) put the
    all-ones start in the covariance null space — C·1 = 0 — even though
    a real principal component exists. The deterministic basis-vector
    restart must find it instead of raising (ADVICE r8)."""
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        pca_power,
    )

    # rows sum to 1.0; variance concentrates on the dim0-vs-dim1 axis
    rows = [
        (0, [0.9, 0.05, 0.05]),
        (1, [0.1, 0.85, 0.05]),
        (2, [0.8, 0.15, 0.05]),
        (3, [0.2, 0.75, 0.05]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["dim"]: r for r in pca_power(df, "embedding").collect()}
    assert len(out) == 3
    lam = out[0]["eigenvalue"]
    assert lam > 0
    # PC1 is the dim0/dim1 opposition (dim2 constant): |l0| ~ |l1|, l2 ~ 0
    l0, l1, l2 = (out[i]["loading"] for i in range(3))
    assert abs(abs(l0) - abs(l1)) < 0.05
    assert abs(l2) < 0.05
    assert l0 * l1 < 0  # opposite signs: mass shifts between dim0 and dim1


def test_pca_topk_recovers_two_axes(spark):
    """A cloud stretched along axis 0 (var 100) then axis 1 (var 1)
    yields PC1 ~ e0 and PC2 ~ e1 after deflation; eigenvalues order;
    shares sum below 1 plus rounding; k guards fire."""
    import pytest

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        pca_topk,
    )

    rows = [
        (0, [10.0, 1.0, 0.0]),
        (1, [-10.0, -1.0, 0.0]),
        (2, [10.0, -1.0, 0.0]),
        (3, [-10.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pca_topk(df, "embedding", k=2).collect()
    c1 = {r["dim"]: r for r in out if r["component"] == 1}
    c2 = {r["dim"]: r for r in out if r["component"] == 2}
    assert abs(abs(c1[0]["loading"]) - 1.0) < 1e-5
    assert abs(abs(c2[1]["loading"]) - 1.0) < 1e-5
    assert abs(c2[0]["loading"]) < 1e-3  # deflated axis gone
    assert c1[0]["eigenvalue"] > c2[0]["eigenvalue"]
    assert abs(c1[0]["eigenvalue"] - 100.0) < 0.01
    assert abs(c2[0]["eigenvalue"] - 1.0) < 0.01
    assert c1[0]["explained_share"] + c2[0]["explained_share"] <= 1.0 + 1e-6

    with pytest.raises(ValueError, match="k must be"):
        pca_topk(df, "embedding", k=0)
    with pytest.raises(ValueError, match="exceeds the vector dimension"):
        pca_topk(df, "embedding", k=4)
    # a rank-deficient cloud cannot yield 3 components: loud, like
    # pca_power's degenerate guard
    with pytest.raises(ValueError, match="zero covariance norm"):
        pca_topk(df, "embedding", k=3)


def test_semdedup_cells_survivor_is_least_prototypical(spark):
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        semdedup_cells,
    )

    rows = [
        (0, [1.0, 0.0]),     # centroid of cell 0
        (1, [0.0, 1.0]),     # centroid of cell 1
        (2, [4.0, 1.0]),     # cell 0, cos to c0 = 0.9701
        (3, [3.0, 1.5]),     # cell 0, cos to c0 = 0.8944 (least prototypical)
        (4, [1.0, 4.0]),     # cell 1, cos to c1 = 0.9701
        (5, [-5.0, -5.0]),   # equidistant from both centroids -> tie to cell 0
        (6, [0.0, 0.0]),     # zero-norm: excluded
        (7, None),           # NULL: excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup_cells(
        df, n_centroids=2, threshold=0.97
    ).collect()}

    assert set(out) == {0, 1, 2, 3, 4, 5}   # degenerate vectors excluded
    # cells: argmax cosine, ties to the lowest centroid id
    assert [out[i]["cell"] for i in range(6)] == [0, 1, 0, 0, 1, 0]
    # transitive group {0,2,3} via 0~2 and 2~3 (0~3 is below threshold)
    assert [out[i]["cluster_id"] for i in range(6)] == [0, 1, 0, 0, 1, 5]
    # the paper's rule: survivor = LOWEST centroid similarity in group
    assert [out[i]["keep"] for i in range(6)] == [
        False, False, False, True, True, True
    ]
    # cent_sim is the auditable survivor key, rounded to 6 dp
    assert abs(out[3]["cent_sim"] - 0.894427) <= 1e-6
    assert out[0]["cent_sim"] == 1.0

    # ids not starting near 0 -> empty default centroid set must fail
    # loudly, never silently dedup the corpus to nothing
    import pytest
    from pyspark.sql import functions as F

    shifted = df.where("vec_id >= 2 AND embedding IS NOT NULL").select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="no usable centroids"):
        semdedup_cells(shifted, n_centroids=2, threshold=0.97)


def test_semdedup_cells_skips_degenerate_centroid_slots(spark):
    """NULL/zero-norm vectors in the id < n_centroids range must not
    serve as centroids (the oracle draws centroids from the FILTERED
    vector set): assignment falls to the usable centroid slots only."""
    from pyspark.sql import functions as F  # noqa: F401

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        semdedup_cells,
    )

    rows = [
        (0, None),            # centroid slot, NULL: skipped
        (1, [0.0, 0.0]),      # centroid slot, zero-norm: skipped
        (2, [1.0, 0.0]),      # the ONLY usable centroid
        (3, [4.0, 1.0]),
        (4, [8.0, 2.0]),      # parallel to 3 -> duplicate pair
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup_cells(
        df, n_centroids=3, threshold=0.999
    ).collect()}
    # rows 0/1 excluded as members too; everyone lands in cell 2
    assert set(out) == {2, 3, 4}
    assert {out[i]["cell"] for i in (2, 3, 4)} == {2}
    # 3~4 duplicate group survives by LOWER cent_sim; tie -> lower id
    assert out[3]["keep"] and out[4]["keep"] is False
    assert out[2]["keep"]  # singleton


def test_mmr_diversify_defers_near_duplicates(spark):
    """MMR at moderate lambda must pick the diverse mid-relevance item
    over a near-clone of the winner; at lambda=1 it degenerates to
    pure relevance order."""
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        mmr_diversify,
    )

    cands = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0.99),   # winner
            (2, [0.999, 0.02, 0.0], 0.98),  # near-clone of winner
            (3, [0.0, 1.0, 0.0], 0.60),   # diverse
            (4, [0.0, 0.0, 1.0], 0.50),   # diverse
        ],
        "id long, v array<double>, rel double",
    )
    out = mmr_diversify(
        cands, vec_col="v", id_col="id", rel_col="rel", k=3, lam=0.5
    )
    picks = [r["id"] for r in out.orderBy("sel_rank").collect()]
    assert picks[0] == 1            # first = max relevance
    assert picks[1:] == [3, 4]      # the clone (2) loses to diversity
    pure = mmr_diversify(
        cands, vec_col="v", id_col="id", rel_col="rel", k=3, lam=1.0
    )
    assert [r["id"] for r in pure.orderBy("sel_rank").collect()] == [1, 2, 3]


def test_mmr_diversify_contracts(spark):
    import pytest
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        mmr_diversify,
    )

    cands = spark.createDataFrame(
        [(1, [1.0, 0.0], 0.9), (2, None, 0.8), (3, [0.0, 0.0], 0.7),
         (4, [0.0, 1.0], 0.6)],
        "id long, v array<double>, rel double",
    )
    # NULL / zero-norm vectors are excluded, k caps at the usable count
    out = mmr_diversify(
        cands, vec_col="v", id_col="id", rel_col="rel", k=10, lam=0.5
    ).collect()
    assert {r["id"] for r in out} == {1, 4}
    assert [r["sel_rank"] for r in sorted(out, key=lambda r: r["sel_rank"])] == [1, 2]
    with pytest.raises(ValueError, match="lam"):
        mmr_diversify(cands, vec_col="v", id_col="id", rel_col="rel", lam=1.5)
    with pytest.raises(ValueError, match="k must be"):
        mmr_diversify(cands, vec_col="v", id_col="id", rel_col="rel", k=0)
