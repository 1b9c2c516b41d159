"""Similarity-search tests: brute-force top-k vs numpy ground truth; blocked
(mapInPandas) variant agrees with expression variant; LSH recall sanity."""

import numpy as np
import pytest
from pyspark.sql import types as T

from etl_processes_spark.ops.similarity import (
    ann_cosine_lsh,
    cosine_topk,
    cosine_topk_blocked,
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


def test_ann_lsh_high_recall_on_planted_pair(emb):
    df, _ = emb
    res = ann_cosine_lsh(
        df, df.filter("vec_id = 7"), k=3, num_planes=16, bands=8, dim=DIM
    ).collect()
    # near-identical vectors share (almost) all hyperplane signs
    assert any(r["neighbor_id"] == 3 for r in res)
