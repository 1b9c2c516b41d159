"""Similarity-search tests: brute-force top-k vs numpy ground truth; blocked
(mapInPandas) variant agrees with expression variant; LSH recall sanity."""

import numpy as np
import pytest
from pyspark.sql import types as T

from etl_processes_spark.ops.similarity import (
    ann_cosine_lsh,
    cosine_topk,
    cosine_topk_blocked,
    cosine_topk_fast,
    embedding_near_dup_pairs,
)

DIM = 16
N = 60


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(3)
    mat = rng.randn(N, DIM).astype(np.float32)
    # plant a near-duplicate pair: 7 ≈ 3
    mat[7] = mat[3] + rng.randn(DIM).astype(np.float32) * 0.01
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(N)], schema
    )
    return df, mat


def _numpy_topk(mat, qids, k=5):
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    out = {}
    for q in qids:
        order = [
            i for i in np.argsort(-np.round(sims[q], 6), kind="stable") if i != q
        ][:k]
        out[q] = order
    return out


def test_cosine_topk_matches_numpy(emb):
    df, mat = emb
    res = cosine_topk(df, df.filter("vec_id < 5"), k=5).collect()
    expected = _numpy_topk(mat, range(5), 5)
    got = {}
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for q in range(5):
        assert got[q] == expected[q], f"query {q}"


def test_planted_neighbor_found(emb):
    df, _ = emb
    res = cosine_topk(df, df.filter("vec_id = 7"), k=1).collect()
    assert res[0]["neighbor_id"] == 3
    assert res[0]["cosine_sim"] > 0.99


def test_blocked_variant_agrees(emb):
    df, mat = emb
    qpdf = df.filter("vec_id < 5").toPandas()
    a = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(df, df.filter("vec_id < 5"), k=3).collect()
    }
    b = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_blocked(df, qpdf, k=3).collect()
    }
    assert a == b


def test_fast_variant_agrees_with_expression_variant(emb):
    df, _ = emb
    a = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in cosine_topk(df, df.filter("vec_id < 5"), k=4).collect()
    }
    b = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in cosine_topk_fast(df, df.filter("vec_id < 5"), k=4).collect()
    }
    assert a == b


def test_near_dup_exact_blocked_matches_numpy(emb):
    df, mat = emb
    got = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in embedding_near_dup_pairs(df, threshold=0.9).collect()
    }
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    expected = {
        (i, j): sims[i, j]
        for i in range(N)
        for j in range(i + 1, N)
        if sims[i, j] >= 0.9
    }
    assert set(got) == set(expected)
    for p in got:
        assert abs(got[p] - expected[p]) < 1e-9


def test_near_dup_lsh_path_finds_planted_pair(emb):
    df, _ = emb
    # force the LSH route; the planted pair (3,7) is ~0.9999 cosine, which
    # the band geometry must recover at near-dup thresholds
    res = embedding_near_dup_pairs(df, threshold=0.9, max_exact_rows=0).collect()
    assert any((r["id_a"], r["id_b"]) == (3, 7) for r in res)


def test_ann_lsh_high_recall_on_planted_pair(emb):
    df, _ = emb
    res = ann_cosine_lsh(
        df, df.filter("vec_id = 7"), k=3, num_planes=16, bands=8, dim=DIM
    ).collect()
    # near-identical vectors share (almost) all hyperplane signs
    assert any(r["neighbor_id"] == 3 for r in res)


def test_ann_ivf_recall_and_exactness_at_full_probe(emb):
    from etl_processes_spark.ops.similarity import ann_cosine_ivf

    df, mat = emb
    # full probe (n_probe == n_centroids) must equal the exact result
    res = ann_cosine_ivf(
        df, df.filter("vec_id < 5"), k=3, n_centroids=4, n_probe=4
    ).collect()
    expected = _numpy_topk(mat, range(5), 3)
    got = {}
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == {q: expected[q] for q in range(5)}

    # partial probe still finds the planted near-identical neighbor
    res = ann_cosine_ivf(
        df, df.filter("vec_id = 7"), k=3, n_centroids=8, n_probe=2
    ).collect()
    assert any(r["neighbor_id"] == 3 for r in res)


def test_ann_ivf_plan_is_cell_equijoin(spark, emb):
    from etl_processes_spark.ops.similarity import ann_cosine_ivf

    df, _ = emb
    plan_df = ann_cosine_ivf(df, df.filter("vec_id < 3"), k=2, n_centroids=4, n_probe=2)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "__cell" in plan


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def test_pq_exact_when_codebook_holds_every_vector(spark):
    """m=1 with ksub >= n degenerates to one codebook whose centroids ARE
    the (normalized) corpus vectors — ADC must then equal exact cosine."""
    from etl_processes_spark.ops.similarity import ann_cosine_pq

    rng = np.random.RandomState(11)
    mat = rng.randn(12, 8).astype(np.float32)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame([(i, mat[i].tolist()) for i in range(12)], schema)
    q = df.filter("vec_id < 3")
    pq = ann_cosine_pq(df, q, k=4, m=1, ksub=12).collect()
    ex = cosine_topk_fast(df, q, k=4).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted([(r["query_id"], r["neighbor_id"], r["cosine_sim"]) for r in pq]) == \
        sorted([(r["query_id"], r["neighbor_id"], r["cosine_sim"]) for r in ex])


def test_pq_recall_on_clustered_data(spark):
    """Three well-separated clusters: ADC over 4-byte codes must still rank
    same-cluster vectors on top (the structure PQ is built to preserve)."""
    from etl_processes_spark.ops.similarity import ann_cosine_pq

    rng = np.random.RandomState(5)
    centers = rng.randn(3, 16) * 10
    rows = []
    for i in range(60):
        c = i % 3
        rows.append((i, (centers[c] + rng.randn(16) * 0.1).astype(np.float32).tolist()))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    res = ann_cosine_pq(df, df.filter("vec_id < 6"), k=5, m=4, ksub=8).collect()
    same_cluster = sum(1 for r in res if r["neighbor_id"] % 3 == r["query_id"] % 3)
    assert same_cluster / len(res) >= 0.9


def test_pq_encode_shape_and_no_shuffle(spark, emb):
    from etl_processes_spark.ops.similarity import pq_encode, pq_train

    df, _ = emb
    books = pq_train(df, m=4, ksub=8, fit_sample=100)
    assert books.shape == (4, 8, DIM // 4)
    codes = pq_encode(df, books)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # encode is a narrow map — no shuffle
    rows = codes.collect()
    assert len(rows) == N
    for r in rows:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])


def test_pq_train_deterministic(emb):
    from etl_processes_spark.ops.similarity import pq_train

    df, _ = emb
    a = pq_train(df, m=4, ksub=8, fit_sample=100)
    b = pq_train(df, m=4, ksub=8, fit_sample=100)
    assert np.array_equal(a, b)


def test_ivf_pq_equals_pq_at_full_probe(spark, emb):
    # with every cell probed, IVF-PQ must EQUAL plain PQ search exactly —
    # the pruning layer can only remove candidates, and at full probe it
    # removes none
    from etl_processes_spark.ops.similarity import ann_cosine_ivf_pq, ann_cosine_pq

    df, _ = emb
    q = df.filter("vec_id < 6")
    full = sorted(
        map(tuple, ann_cosine_ivf_pq(
            df, q, k=5, n_centroids=8, n_probe=8, m=4, ksub=8, fit_sample=100
        ).collect())
    )
    pq = sorted(
        map(tuple, ann_cosine_pq(df, q, k=5, m=4, ksub=8, fit_sample=100).collect())
    )
    assert full == pq and len(full) == 30


def test_ivf_pq_recall_and_pruning(spark, emb):
    from pyspark.sql import functions as F

    from etl_processes_spark.ops.similarity import ann_cosine_ivf_pq

    df, mat = emb
    q = df.filter("vec_id < 6")
    got = ann_cosine_ivf_pq(
        df, q, k=5, n_centroids=8, n_probe=4, m=4, ksub=8, fit_sample=100
    )
    rows = got.collect()
    # each query returns at most k ranked neighbors, none of them itself
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
    for qid, rs in per_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, len(rs) + 1)
        )
    # probed-cell recall sanity vs exact cosine: the planted near-dup pair
    # (7 ~= 3) lands in the same cell with overwhelming likelihood
    exact = _numpy_topk(mat, list(range(6)), k=5)
    hit = sum(
        1 for r in rows if r["neighbor_id"] in set(exact[r["query_id"]])
    )
    assert hit / len(rows) >= 0.5
    # determinism
    again = ann_cosine_ivf_pq(
        df, q, k=5, n_centroids=8, n_probe=4, m=4, ksub=8, fit_sample=100
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_auto_centroids_scaling(spark):
    # default n_centroids derives from corpus size: ~target_cell_rows rows
    # per cell, floor 16, capped by the fit sample (>= ~4 rows/centroid)
    from etl_processes_spark.ops.similarity import _auto_centroids

    small = spark.range(100).withColumnRenamed("id", "vec_id")
    big = spark.range(1_000_000).withColumnRenamed("id", "vec_id")
    assert _auto_centroids(small, None, 10_000) == 16           # floor
    assert _auto_centroids(big, None, 10_000) == 50             # 1M / 20k
    assert _auto_centroids(big, None, 10_000, target_cell_rows=1000) == 1000
    assert _auto_centroids(big, None, 10_000, target_cell_rows=100) == 2500  # fit cap
    assert _auto_centroids(big, 64, 10_000) == 64               # explicit wins


def test_semantic_dedup_auto_matches_explicit_floor(spark, sf_dir):
    from etl_processes_spark.ops.similarity import semantic_dedup

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    auto = semantic_dedup(e, "vec_id", "embedding", threshold=0.5, seed=42)
    explicit = semantic_dedup(
        e, "vec_id", "embedding", threshold=0.5, n_centroids=16, seed=42
    )
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, explicit.collect()))


def test_pq_refine_improves_recall(spark, sf_dir):
    from etl_processes_spark.ops.similarity import (
        ann_cosine_ivf_pq,
        ann_cosine_pq,
        cosine_topk_fast,
    )
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    pairs = lambda df: {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
    truth = pairs(cosine_topk_fast(e, q, "vec_id", "embedding", k=5))

    plain = pairs(
        ann_cosine_pq(e, q, "vec_id", "embedding", k=5, m=8, ksub=16, refine=None)
    )
    ref = pairs(ann_cosine_pq(e, q, "vec_id", "embedding", k=5, m=8, ksub=16, refine=8))
    assert len(ref & truth) >= len(plain & truth)  # refine never hurts recall
    assert len(ref & truth) / len(truth) >= 0.5    # and actually recovers

    # ivf-pq refine: rank contract intact (k rows per query, ranks 1..k)
    ivfref = ann_cosine_ivf_pq(
        e, q, "vec_id", "embedding", k=5, n_centroids=8, n_probe=8,
        m=8, ksub=16, refine=8,
    )
    rows = ivfref.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_auto_lsh_geometry():
    import warnings

    from etl_processes_spark.ops.similarity import _auto_lsh_geometry

    # high threshold, big corpus: bounded bands, ~log2(n) planes per band
    planes, bands = _auto_lsh_geometry(20_000, 0.9)
    k = planes // bands
    assert 14 <= k <= 16 and 4 <= bands <= 32
    # random-pair collision odds per band ~ (1/2)^k -> spurious candidates
    # near-linear, not the 40%-of-all-pairs blowup of a static 4-plane band
    assert 0.5 ** k * bands * 20_000 < 50  # expected spurious per row << n

    # low threshold: cap binds, warns with estimated recall
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _auto_lsh_geometry(20_000, 0.5)
    assert any("semantic_dedup" in str(x.message) for x in w)


def test_near_dup_lsh_auto_params_still_finds_planted(emb):
    df, _ = emb
    res = embedding_near_dup_pairs(df, threshold=0.9, max_exact_rows=0).collect()
    assert any((r["id_a"], r["id_b"]) == (3, 7) for r in res)


def test_auto_topk_lsh_geometry_adapts_to_similarity_regime():
    import warnings

    from etl_processes_spark.ops.similarity import _auto_topk_lsh_geometry

    # high-similarity neighbors (near-dup regime): deep bands, few needed
    planes_hi, bands_hi = _auto_topk_lsh_geometry(100_000, 0.92)
    kp_hi = planes_hi // bands_hi
    # low-similarity neighbors (the synthetic-embedding regime): shallow
    # bands, more of them — and a loud warning that buckets barely prune
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        planes_lo, bands_lo = _auto_topk_lsh_geometry(2_000, 0.34)
    kp_lo = planes_lo // bands_lo
    assert kp_hi > kp_lo  # geometry follows the similarity regime
    assert any("ann_cosine_ivf" in str(x.message) for x in w)
    # both geometries' banding math reaches the 0.9 default target
    import math

    for tau, kp, b in [(0.92, kp_hi, bands_hi), (0.34, kp_lo, bands_lo)]:
        p = 1 - math.acos(tau) / math.pi
        assert 1 - (1 - p**kp) ** b >= 0.9 - 1e-9


def test_estimate_tau_k_matches_planted_tail():
    from etl_processes_spark.ops.similarity import _estimate_tau_k

    rng = np.random.RandomState(0)
    X = rng.randn(1000, 32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    tau = _estimate_tau_k(X, n=1000, k=5)
    # for random unit vectors the k/n tail of pair sims is well above the
    # mean (0) and below any near-dup level
    assert 0.2 < tau < 0.9


def test_calibrate_nprobe_full_and_partial():
    from etl_processes_spark.ops.similarity import (
        _calibrate_nprobe,
        _spherical_kmeans,
    )

    rng = np.random.RandomState(1)
    # 4 tight clusters: neighbors share cells, so 1 probe suffices
    centers = rng.randn(4, 16) * 10
    X = np.concatenate([centers[i % 4] + rng.randn(1, 16) * 0.05 for i in range(200)])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    C = _spherical_kmeans(X, 4, seed=42)
    assert _calibrate_nprobe(X, C, 0.9, k=3) == 1
    # target 1.0 never exceeds the number of cells
    assert _calibrate_nprobe(X, C, 1.0, k=3) <= 4


def test_ann_lsh_auto_geometry_recall(spark, sf_dir):
    """Default (auto) geometry must recover >=0.8 of exact top-5 on the
    real test corpus — the round-5 static default measured 0.39."""
    from pyspark.sql import functions as F

    from etl_processes_spark.ops.similarity import ann_cosine_lsh, cosine_topk_fast

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    pairs = lambda df: {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
    truth = pairs(cosine_topk_fast(e, q, "vec_id", "embedding", k=5))
    got = pairs(ann_cosine_lsh(e, q, "vec_id", "embedding", k=5))
    assert len(got & truth) / len(truth) >= 0.8


def test_ann_half_supplied_lsh_knobs_raise(spark, emb):
    from etl_processes_spark.ops.similarity import ann_cosine_lsh

    df, _ = emb
    with pytest.raises(ValueError, match="num_planes and bands"):
        ann_cosine_lsh(df, df.filter("vec_id < 2"), bands=4)


def test_pq_auto_params_and_default_refine_recall(spark, sf_dir):
    """Full-default PQ (auto m/ksub, refine on) must land >=0.8 recall on
    the real corpus where the old static m=8/ksub=16 raw ADC measured 0.10."""
    from pyspark.sql import functions as F

    from etl_processes_spark.ops.similarity import (
        ann_cosine_ivf,
        ann_cosine_ivf_pq,
        ann_cosine_pq,
        cosine_topk_fast,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    pairs = lambda df: {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
    truth = pairs(cosine_topk_fast(e, q, "vec_id", "embedding", k=5))
    for fn in (ann_cosine_pq, ann_cosine_ivf, ann_cosine_ivf_pq):
        got = pairs(fn(e, q, "vec_id", "embedding", k=5))
        assert len(got & truth) / len(truth) >= 0.8, fn.__name__


def test_auto_pq_m_prefers_4dim_subspaces():
    from etl_processes_spark.ops.similarity import _auto_pq_m

    assert _auto_pq_m(64) == 16
    assert _auto_pq_m(768) == 192
    assert _auto_pq_m(6) == 3    # falls back to 2-dim subspaces
    assert _auto_pq_m(7) == 1    # prime, <=8: single subspace


def test_near_dup_cells_route_subset_of_exact_with_high_recall(spark):
    # corpus of tight planted near-dup pairs: the cells route must return a
    # SUBSET of the exact pairs (precision 1, identical rounded sims) and
    # recover nearly all of them (only cell-boundary straddlers may drop)
    rng = np.random.RandomState(7)
    base = rng.randn(200, 16)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, v.tolist()))
        w = v + 1e-4 * rng.randn(16)  # planted near-dup of v
        rows.append((2 * i + 1, (w / np.linalg.norm(w)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pair_map = lambda res: {
        (r["id_a"], r["id_b"]): r["cosine_sim"] for r in res.collect()
    }
    exact = pair_map(
        embedding_near_dup_pairs(df, threshold=0.999, method="exact")
    )
    cells = pair_map(
        embedding_near_dup_pairs(
            df, threshold=0.999, method="cells", target_cell_rows=32,
        )
    )
    assert set(cells) <= set(exact)
    assert len(cells) >= 0.8 * len(exact) > 0
    for p, sim in cells.items():
        assert sim == exact[p]


def test_near_dup_auto_routes_clustered_corpus_to_cells(spark):
    # mid-threshold + clustered corpus + big-n hint: the sampled candidate
    # estimate must reject LSH, and the auto result must equal the explicit
    # cells route bit-for-bit (same seed, same quantizer)
    import warnings

    from etl_processes_spark.ops.similarity import (
        _auto_lsh_geometry,
        _estimate_lsh_candidates,
    )

    rng = np.random.RandomState(3)
    centers = rng.randn(5, 16)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.randint(0, 5, 300)
    M = centers[lab] + 0.05 * rng.randn(300, 16)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, M[i].tolist()) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    n_hint = 2_000_000
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        npl, b = _auto_lsh_geometry(n_hint, 0.5)
    est = _estimate_lsh_candidates(M, n_hint, npl, b)
    assert est > 64.0 * n_hint  # clustered corpus: LSH would not prune

    pair_set = lambda res: {(r["id_a"], r["id_b"]) for r in res.collect()}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        auto = pair_set(
            embedding_near_dup_pairs(df, threshold=0.5, n_rows=n_hint)
        )
    explicit = pair_set(
        embedding_near_dup_pairs(df, threshold=0.5, method="cells")
    )
    assert auto == explicit and len(auto) > 0

    # the tight near-dup regime on a NON-clustered sample keeps LSH:
    # random d=64 sims concentrate near 0, so candidates stay in budget
    Xr = rng.randn(512, 64)
    Xr /= np.linalg.norm(Xr, axis=1, keepdims=True)
    npl2, b2 = _auto_lsh_geometry(n_hint, 0.95)
    assert _estimate_lsh_candidates(Xr, n_hint, npl2, b2) <= 64.0 * n_hint


def test_near_dup_method_validation(spark):
    import pytest

    df = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="method"):
        embedding_near_dup_pairs(df, method="fast")


def test_ann_lsh_route_param_and_pinning(spark, sf_dir):
    """route="auto" may delegate to IVF in a non-pruning regime; route="lsh"
    pins the hyperplane path (warning fires instead) and still honors the
    output contract; a bogus route raises."""
    import warnings

    from pyspark.sql import functions as F

    from etl_processes_spark.ops.similarity import ann_cosine_lsh

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="route"):
        ann_cosine_lsh(e, q, "vec_id", "embedding", k=3, route="bogus")
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        pinned = ann_cosine_lsh(e, q, "vec_id", "embedding", k=3, route="lsh")
    rows = pinned.collect()
    assert {r["query_id"] for r in rows} <= {0, 1, 2}
    assert all(1 <= r["rank"] <= 3 for r in rows)


def test_calibrate_refine_scales_with_corpus_and_floors(spark):
    """Calibrated refine: (a) never below the log2 floor, (b) grows when the
    claimed corpus is 100x the sample (intruder count scales with n),
    (c) capped."""
    import numpy as np

    from etl_processes_spark.ops.similarity import (
        _auto_refine,
        _calibrate_refine,
        _pq_fit,
    )

    rng = np.random.RandomState(3)
    X = rng.randn(512, 16)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    books = _pq_fit(X, m=4, ksub=16)
    small = _calibrate_refine(X, books, n=512, k=5)
    big = _calibrate_refine(X, books, n=51_200, k=5)
    assert small >= _auto_refine(512)
    assert big >= small
    assert _calibrate_refine(X, books, n=10**9, k=5, cap=64) <= 64
