"""Text/embedding pipeline: tokenizer parity, deterministic vectorisation,
distributed moments/covariance vs numpy, MVN generation round-trip."""

import numpy as np
import pytest

from etl_processes_spark.profile.types import ColumnProfile
from etl_processes_spark.text.embedding import (
    MAX_TOKENS_PER_ENTRY,
    gen_text_column,
    text_profile,
    tokenize,
    tokenize_expr,
    token_vector,
    vectorise_entry,
)

TEXTS = [
    "spark processes data with partitions and shuffles",
    "the catalyst optimizer rewrites logical plans",
    "tungsten generates compact bytecode for expressions",
    "partitions shuffle data across the cluster network",
    "adaptive execution replans queries at runtime stages",
    "columnar parquet scans prune unused columns early",
] * 5


def test_tokenize_gensim_parity():
    # simple_preprocess semantics: lowercase, alphabetic, len in [2,15]
    assert tokenize("Hello, World! A x1 superlongtokenbeyondfifteen") == ["hello", "world"]
    assert tokenize(None) == []
    assert tokenize("The CAT_dog") == ["the", "cat_dog"]


def test_tokenize_expr_matches_python(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS[:6]], ["t"])
    from pyspark.sql import functions as F

    rows = df.select(tokenize_expr("t").alias("toks")).collect()
    for row, t in zip(rows, TEXTS[:6]):
        assert row["toks"] == tokenize(t)


def test_token_vector_deterministic():
    a, b = token_vector("spark"), token_vector("spark")
    assert np.array_equal(a, b)
    assert not np.array_equal(token_vector("spark"), token_vector("flink"))


def test_vectorise_entry_shape_and_padding():
    v = vectorise_entry("one two", vector_size=4)
    assert v.shape == (MAX_TOKENS_PER_ENTRY * 4,)
    assert np.any(v[:8] != 0) and np.all(v[8:] == 0)


@pytest.fixture(scope="module")
def profiled(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["body"])
    return df, text_profile(df, "body", vector_size=4)


def test_text_profile_matches_numpy(profiled):
    _, prof = profiled
    X = np.stack([vectorise_entry(t, 4) for t in TEXTS])
    assert prof["n_samples"] == len(TEXTS)
    assert prof["vector_dim"] == X.shape[1]
    np.testing.assert_allclose(prof["mean_vector"], X.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(prof["cov_matrix"], np.cov(X.T), rtol=1e-8, atol=1e-12)
    assert prof["overall_mean"] == pytest.approx(float(np.mean(X.mean(axis=0))), rel=1e-9)
    assert prof["overall_std"] == pytest.approx(float(np.mean(X.std(axis=0))), rel=1e-9)
    assert "spark" in prof["vocab"]


def test_gen_text_roundtrip_and_determinism(spark, profiled):
    _, prof = profiled
    cp = ColumnProfile("body", "text", None, prof)
    frame = spark.range(20)
    out1 = gen_text_column(spark, frame, "body", cp, seed=5).select("body").collect()
    out2 = gen_text_column(spark, frame, "body", cp, seed=5).select("body").collect()
    assert [r["body"] for r in out1] == [r["body"] for r in out2]
    texts = [r["body"] for r in out1]
    assert all(isinstance(t, str) and t for t in texts)
    # decoded words come from the learned vocabulary
    vocab = set(prof["vocab"])
    for t in texts[:5]:
        assert set(t.split()) <= vocab


def test_vocab_matrix_bit_identical_to_token_vector():
    import numpy as np

    from etl_processes_spark.text.embedding import _vocab_matrix, token_vector

    vocab = ["alpha", "beta", "gamma_1", "ünïcode", "x", "longertokenhere"]
    for vs in (4, 8):
        fast = _vocab_matrix(vocab, vs)
        slow = np.stack([token_vector(t, vs) for t in vocab])
        assert np.array_equal(fast, slow)


def test_knn_decode_chunked_matches_unchunked():
    import numpy as np

    import etl_processes_spark.text.embedding as emb

    rng = np.random.RandomState(3)
    vocab = [f"tok{i}" for i in range(200)]
    vmat = emb._vocab_matrix(vocab, 4)
    vecs = rng.randn(500, 4)
    full = emb.knn_decode(vecs, vocab, vmat)
    old = emb._KNN_CHUNK_CELLS
    try:
        emb._KNN_CHUNK_CELLS = 400  # force 2-row chunks
        chunked = emb.knn_decode(vecs, vocab, vmat)
    finally:
        emb._KNN_CHUNK_CELLS = old
    assert full == chunked


def test_embed_mean_reference_parity(spark):
    """embed_mean (reference dead code, Latanova_v1.py:23-43): mean of ALL
    token vectors (min_len=1, no 32-token cap), zeros for token-less."""
    import numpy as np

    from etl_processes_spark.text.embedding import (
        embed_entries_mean,
        token_vector,
        tokenize,
        vectorise_entry_mean,
    )

    text = "a quick brown fox " * 20  # 80 tokens incl. len-1 'a' > the 32 cap
    toks = tokenize(text, min_len=1)
    assert len(toks) == 80 and "a" in toks
    expect = np.mean([token_vector(t, 4) for t in toks], axis=0)
    np.testing.assert_allclose(vectorise_entry_mean(text, 4), expect, rtol=0, atol=0)
    assert (vectorise_entry_mean("", 4) == np.zeros(4)).all()
    assert (vectorise_entry_mean("123 456", 4) == np.zeros(4)).all()  # digits drop

    df = spark.createDataFrame([(1, text), (2, None), (3, "07 9")], ["id", "t"])
    got = {r["id"]: np.array(r["__vec"]) for r in embed_entries_mean(df, "t", 4).collect()}
    np.testing.assert_allclose(got[1], expect, rtol=0, atol=0)
    assert (got[2] == 0).all() and (got[3] == 0).all()


def test_medians_matches_spark_median(spark):
    """_medians (histogram-bracketed distributed selection — the no-explode
    100 TB path) must be BIT-IDENTICAL to F.median over the posexploded
    rows (the route it replaced, which spilled 27.2 GB at sf100). Covers:
    continuous values, odd/even n, negatives, constant dims, point masses
    (incl. half-constant dims that stall refinement), n=1, and tiny
    bins/per_dim_cap so multi-level refinement + the collect pass all run."""
    from pyspark.sql import functions as F

    from etl_processes_spark.text.embedding import _medians

    rng = np.random.default_rng(7)

    def check(X, bins, cap, levels):
        n, d = X.shape
        df = spark.createDataFrame(
            [(row.tolist(),) for row in X], ["__vec"]
        ).repartition(5).persist()
        try:
            got = _medians(
                df, d, n, X.min(axis=0), X.max(axis=0),
                bins=bins, per_dim_cap=cap, max_levels=levels,
            )
            want = np.array(
                [
                    r["m"]
                    for r in df.select(F.posexplode("__vec").alias("dim", "x"))
                    .groupBy("dim").agg(F.median("x").alias("m"))
                    .orderBy("dim").collect()
                ]
            )
            assert np.array_equal(got, want), f"{got} != {want}"
        finally:
            df.unpersist()

    # continuous, even n; negatives; one constant dim; one point-mass dim
    X = rng.normal(size=(200, 6)) * np.array([1, 10, 0.01, 1, 1, 1])
    X[:, 2] = 3.25  # constant dim
    X[:100, 4] = -1.5  # half point mass (stalls refinement at tiny cap)
    X[:, 5] = np.round(X[:, 5])  # few distinct values
    check(X, bins=8, cap=4, levels=6)
    # odd n, single level sufficient
    check(rng.normal(size=(31, 3)), bins=1024, cap=16384, levels=6)
    # n=1 and n=2 (frac=0 and frac=0.5 interpolation)
    check(rng.normal(size=(1, 3)), bins=8, cap=4, levels=6)
    check(rng.normal(size=(2, 3)), bins=8, cap=4, levels=6)
    # all dims constant
    check(np.full((9, 3), 2.5), bins=8, cap=4, levels=6)
    # extreme spread (huge magnitudes) — binning arithmetic stays monotone
    Y = rng.normal(size=(64, 4)) * np.array([1e12, 1e-12, 1e6, 1.0])
    check(Y, bins=4, cap=2, levels=6)
