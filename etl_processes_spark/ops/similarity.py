"""Embedding similarity search — brute-force cosine top-k (exact baseline)
and LSH-bucketed ANN (the scale path). No reference counterpart (the
reference's only similarity op is the k-NN vocabulary decode,
Latanova_v1.py:338); these are the driver-mandated extensions.

Scale notes:
 - Brute force is a broadcast nested-loop of queries × corpus — correct and
   cheap when ONE side is small (broadcast the queries). The dot product is a
   JVM-side ``aggregate(zip_with(...))`` expression — no Python in the loop.
 - ``ann_cosine_lsh`` buckets by random-hyperplane signature (SimHash for
   vectors): equi-join on (band, band-signature) so candidate generation is
   linear-ish; multiprobe = more bands. Recall/cost tunable via
   (num_planes, bands).
 - For massive query sets, ``cosine_topk_blocked`` does the matmul in numpy
   per Arrow batch (mapInPandas) against a broadcast corpus matrix — BLAS
   beats per-element codegen when both sides are dense float blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _as_double_array(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    """Sequential-order dot/norms — same summation order as the DuckDB
    oracle's list_cosine_similarity over DOUBLE[], so rounded values match."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    ndigits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cosine_sim,
    rank). Queries are broadcast; ranking uses the ROUNDED similarity with
    neighbor-id tie-break, so results are deterministic and oracle-stable.
    Self-matches are excluded when ids collide."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double_array(vec_col).alias("cv")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), ndigits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def cosine_topk_blocked(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k with the corpus STREAMED and the query matrix
    broadcast: per Arrow batch, one BLAS matmul scores the whole block.
    Partial top-k per partition, final top-k via groupBy — the classic
    scalable ANN-exact pattern (corpus never collected)."""
    spark = corpus.sparkSession
    qids = queries_pdf[id_col].to_numpy()
    qmat = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    b = spark.sparkContext.broadcast((qids, qmat))

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def score(batches):
        qids_, qmat_ = b.value
        for pdf in batches:
            cmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cmat /= np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
            sims = qmat_ @ cmat.T  # (nq, batch)
            nk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, nk - 1, axis=1)[:, :nk]
            rows = {
                "query_id": np.repeat(qids_, nk),
                "neighbor_id": pdf[id_col].to_numpy()[idx].ravel(),
                "cosine_sim": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        partial.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    ndigits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).
    Exact all-pairs — the correctness baseline; at scale swap the cross join
    for ann_cosine_lsh buckets and keep this exact predicate as the verify
    stage. Broadcast one side (dedup corpora that fit; otherwise LSH)."""
    a = corpus.select(F.col(id_col).alias("id_a"), _as_double_array(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), _as_double_array(vec_col).alias("vb"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), ndigits).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def hyperplane_signature(
    vec: Column, planes: np.ndarray
) -> Column:
    """Random-hyperplane bit signature as an array<int> of sign bits.
    Expression form (one HOF dot per plane) — fine for a handful of planes;
    `_band_hashes_udf` is the batched path the ANN join uses."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            1,
        )
        .otherwise(0)
        for plane in planes
    ]
    return F.array(*bits)


def _band_hashes_udf(planes: np.ndarray, bands: int):
    """Arrow-batched band signatures: one BLAS matmul per batch scores every
    plane at once, sign bits are packed per band into a single long. Returns
    a pandas_udf mapping embedding → array<long> of length `bands`.

    This replaces a (num_planes × dim)-literal expression tree whose Catalyst
    analysis+interpreted evaluation dominated runtime (~1 min on 500 rows);
    the matmul form is also the 100 TB design — per-task cost is one
    (batch × dim) @ (dim × planes) GEMM."""
    rows_per_band = planes.shape[0] // bands
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))[::-1]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_hashes(col: pd.Series) -> pd.Series:
        X = np.stack(col.to_numpy()).astype(np.float64)
        bits = (X @ planes.T >= 0).astype(np.int64)  # (n, num_planes)
        packed = bits.reshape(len(X), bands, rows_per_band) @ weights  # (n, bands)
        return pd.Series(list(packed))

    return band_hashes


def ann_cosine_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    ndigits: int = 6,
) -> DataFrame:
    """ANN via random-hyperplane LSH: candidates = bucket collisions on any
    band of the sign signature; exact cosine re-rank of candidates only.
    Approximate (recall < 1); the scale path when queries aren't small."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(num_planes, dim)
    sig_udf = _band_hashes_udf(planes, bands)

    def with_buckets(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(name),
            _as_double_array(vec_col).alias(f"{name}_v"),
            F.posexplode(sig_udf(F.col(vec_col))).alias("band", "bh"),
        )

    cb = with_buckets(corpus, "neighbor_id")
    qb = with_buckets(queries, "query_id")
    cand = (
        cb.join(qb, ["band", "bh"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("query_id_v"), F.col("neighbor_id_v")), ndigits).alias(
                "cosine_sim"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
