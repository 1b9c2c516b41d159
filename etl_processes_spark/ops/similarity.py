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
    ndigits: int = 6,
) -> DataFrame:
    """Brute-force top-k with the corpus STREAMED and the query matrix
    broadcast: per Arrow batch, one BLAS matmul scores the whole block.
    Partial top-k per partition, final top-k via a window — the classic
    scalable ANN-exact pattern (corpus never collected).

    Output contract matches ``cosine_topk`` exactly: (query_id, neighbor_id,
    cosine_sim rounded to ``ndigits``, rank), ranked by (rounded sim desc,
    neighbor_id asc). Partial selection inside the kernel uses the SAME total
    order (np-rounded sim desc, neighbor asc) plus a small slack so the
    global top-k is always contained in the union of per-batch top-k even
    when many sims tie at the rounded precision."""
    spark = corpus.sparkSession
    qids = queries_pdf[id_col].to_numpy().astype(np.int64)
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
    slack = 8  # absorbs np.round vs F.round divergence on exact rounding boundaries

    def score(batches):
        qids_, qmat_ = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy().astype(np.int64)
            cmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cmat /= np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
            sims = qmat_ @ cmat.T  # (nq, batch)
            rsims = np.round(sims, ndigits)
            rsims[qids_[:, None] == ids[None, :]] = -np.inf  # exclude self-match
            nk = min(k + slack, sims.shape[1])
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids_)):
                idx = np.lexsort((ids, -rsims[qi]))[:nk]
                idx = idx[rsims[qi][idx] > -np.inf]
                out_q.append(np.full(len(idx), qids_[qi], dtype=np.int64))
                out_n.append(ids[idx])
                out_s.append(sims[qi][idx])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine_sim": np.concatenate(out_s),
                }
            )

    # work per corpus MB scales with the query count (one GEMM row per
    # query), so the widen density does too: ~8 MB/task at 64 queries,
    # proportionally less input per task as the query matrix grows
    per_mb = max(0.25, min(8.0, 8.0 * 64.0 / max(1, len(qids))))
    partial = widen(corpus.select(id_col, vec_col), per_mb=per_mb).mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        partial.withColumn("cosine_sim", F.round(F.col("cosine_sim"), ndigits))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def cosine_topk_fast(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    ndigits: int = 6,
) -> DataFrame:
    """Drop-in replacement for ``cosine_topk`` (same inputs, same output
    schema/rounding/ranking) on the blocked BLAS path. The query side is
    collected to the driver — it must be small, which is already the contract
    of the broadcast in ``cosine_topk``."""
    qpdf = queries.select(id_col, vec_col).toPandas()
    return cosine_topk_blocked(corpus, qpdf, id_col, vec_col, k=k, ndigits=ndigits)


def cosine_pairs_udf():
    """Arrow-batched exact cosine over two array<double> columns — the
    re-rank kernel for candidate pairs (one einsum per batch; no interpreted
    higher-order functions in the hot path)."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=float)
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / np.maximum(den, 1e-300))

    return cos


from etl_processes_spark.partitioning import widen


def _estimate_rows(df: DataFrame) -> int | None:
    """Catalyst optimized-plan row-count statistic (free — no job). Defined
    for LocalRelations, CBO-analyzed tables and some file sources; None
    otherwise."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
    except Exception:
        pass
    return None


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    ndigits: int = 6,
    max_exact_rows: int = 10_000,
    num_planes: int | None = None,
    bands: int | None = None,
    seed: int = 42,
    n_rows: int | None = None,
    method: str = "auto",
    max_candidate_factor: float = 64.0,
    target_cell_rows: int = 4096,
    fit_sample: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, rounded cosine >=
    threshold). Routed by size AND by measured corpus geometry:

     - corpus <= ``max_exact_rows``: EXACT blocked all-pairs — one side
       broadcast as a normalized matrix, corpus streamed, one BLAS matmul per
       Arrow batch, only passing pairs emitted (never the n² pair set).
     - larger, high threshold: hyperplane-LSH bucketed candidates (equi-join
       on band signatures) + exact cosine verify of candidates only.
     - larger, when LSH buckets would NOT prune: k-means CELLS (the
       semantic_dedup quantizer) — within-cell blocked GEMM emitting passing
       pairs directly, cost bounded at n · target_cell_rows.

    The lsh/cells choice is MEASURED, not threshold-ruled: the expected
    candidate volume is estimated on the seeded fit sample (mean pairwise
    band-collision probability × n²/2 — see _estimate_lsh_candidates) and
    LSH is used only when that stays under ``max_candidate_factor``·n rows.
    The threshold alone can't decide this: at tau=0.5 a corpus of
    near-orthogonal vectors buckets fine, while a corpus concentrated in a
    few tight clusters collides ~20% of same-cluster pairs per band-set —
    at 2M vectors that is ~10^10 candidate rows, which filled 70 GB of
    spill and died before this route existed (sf100 measured). Cells bound
    that regime by construction.

    LSH geometry defaults to AUTO (``num_planes``/``bands`` = None): planes
    per band ~ log2(n) so a random (orthogonal) pair's collision odds are
    ~1/n per band, and the band count targets 90% recall at the threshold,
    capped at 32 (below-0.5 estimated recall warns). Passing both knobs
    explicitly pins the LSH route and skips auto entirely — existing
    callers keep their exact plan. ``method`` ("auto"/"exact"/"lsh"/
    "cells") overrides routing; exact/cells recall contracts match
    semantic_dedup's (cell-boundary pairs are missed).

    Routing reads ``n_rows`` (caller-supplied hint) first. Catalyst's
    optimized-plan row-count statistic is trusted only in the SAFE
    direction: a large estimate routes away from exact (correct even if
    stale — at worst a small corpus pays bucketing overhead); a small
    estimate is confirmed with a count() before committing to the
    broadcast-everything exact path, because a stale low estimate would
    broadcast an arbitrarily large matrix. At 100 TB the caller passes the
    size, so no probe runs.
    """
    if method not in ("auto", "exact", "lsh", "cells"):
        raise ValueError(f"method must be auto|exact|lsh|cells, got {method!r}")
    n = n_rows
    if n is None:
        est = _estimate_rows(corpus)
        if est is not None and est > max_exact_rows:
            n = est  # safe direction: over-threshold routes away from exact
        else:
            n = corpus.count()
    if (num_planes is None) != (bands is None):
        raise ValueError(
            "embedding_near_dup_pairs: num_planes and bands must be supplied "
            "together (or both left None for auto geometry); got "
            f"num_planes={num_planes!r}, bands={bands!r}"
        )
    if method == "exact" or (method == "auto" and n <= max_exact_rows):
        return _near_dup_exact_blocked(corpus, id_col, vec_col, threshold, ndigits)
    if method == "cells":
        return _near_dup_cells(
            corpus, id_col, vec_col, threshold, ndigits,
            target_cell_rows, fit_sample, seed,
        )
    if num_planes is None:
        num_planes, bands = _auto_lsh_geometry(n, threshold)
        if method == "auto":
            X = _sample_norm_matrix(corpus, vec_col, min(fit_sample, 2048), seed)
            est_cand = _estimate_lsh_candidates(X, n, num_planes, bands)
            if est_cand > max_candidate_factor * n:
                return _near_dup_cells(
                    corpus, id_col, vec_col, threshold, ndigits,
                    target_cell_rows, fit_sample, seed,
                )
    return _near_dup_lsh(
        corpus, id_col, vec_col, threshold, ndigits, num_planes, bands, seed
    )


def _estimate_lsh_candidates(
    X: np.ndarray, n: int, num_planes: int, bands: int
) -> float:
    """Expected LSH candidate-pair volume for an n-row corpus whose pairwise
    cosine distribution looks like the sample ``X`` (row-normalized): a pair
    at cosine s collides in one k-plane band with probability p(s)^k,
    p(s) = 1 - acos(s)/pi, hence in >= 1 of b bands with 1 - (1-p^k)^b; the
    expectation over all n(n-1)/2 pairs is the sample mean of that collision
    probability scaled up. This is the quantity that decides whether LSH
    prunes AT ALL on this corpus — the threshold/geometry math alone assumes
    random pairs are near-orthogonal, which clustered corpora violate."""
    S = X[: min(len(X), 1024)]
    sims = np.clip(S @ S.T, -1.0, 1.0)
    iu = np.triu_indices(len(S), k=1)
    p = 1.0 - np.arccos(sims[iu]) / np.pi
    k = max(1, num_planes // max(bands, 1))
    collide = 1.0 - (1.0 - p**k) ** bands
    return float(collide.mean()) * n * (n - 1) / 2.0


def _sample_norm_matrix(
    corpus: DataFrame, vec_col: str, n_sample: int, seed: int = 42
) -> np.ndarray:
    """Deterministic fit sample as a row-normalized (s, d) float64 matrix —
    the same seeded sample contract every driver-side quantizer fit uses, so
    DuckDB oracle twins can rebuild the identical matrix with pyarrow."""
    pdf = (
        corpus.select(vec_col)
        .sample(withReplacement=False, fraction=1.0, seed=seed)
        .limit(n_sample)
        .toPandas()
    )
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return X


def _estimate_tau_k(X: np.ndarray, n: int, k: int) -> float:
    """Estimate the typical k-th-neighbor cosine in an n-row corpus from a
    sample: the similarity tau at which the expected number of corpus points
    with sim >= tau is k, read off the sample's pairwise-sim tail quantile
    (1 - k/n). This is the quantity LSH geometry must target — static
    defaults can't know whether neighbors live at cosine 0.95 (near-dup
    regime) or 0.35 (synthetic/low-sim regime), and the band math differs
    by orders of magnitude between the two."""
    S = X[: min(len(X), 2048)]
    sims = S @ S.T
    np.fill_diagonal(sims, -np.inf)
    flat = sims[np.isfinite(sims)]
    frac = min(1.0, k / max(n, 1))
    return float(np.quantile(flat, 1.0 - frac))


def _auto_topk_lsh_geometry(
    n: int,
    tau: float,
    target_recall: float = 0.9,
    max_bands: int = 64,
    max_total_planes: int = 1024,
    nq: int = 20,
    warn: bool = True,
) -> tuple[int, int]:
    """Cost-optimal (num_planes, bands) for TOP-K hyperplane LSH at an
    estimated k-th-neighbor similarity ``tau``: per-band collision odds for
    a pair at cosine tau are p^kp with p = 1 - acos(tau)/pi; each candidate
    (kp, bands) pair that reaches ``target_recall`` is costed as explode
    rows (n*bands) plus expected random-candidate verifies
    (bands * n * 2^-kp per query), and the cheapest wins. Unlike the
    near-dup geometry (which assumes a HIGH threshold), this degrades
    gracefully in low-sim regimes by dropping planes-per-band — candidates
    grow toward a scan, but the recall contract holds; the near-exhaustive
    case warns so users pick IVF instead."""
    import math
    import warnings

    p = 1.0 - math.acos(max(-1.0, min(1.0, tau))) / math.pi
    best: tuple[float, int, int] | None = None
    for kp in range(2, 21):
        pk = p**kp
        if pk >= 1.0:
            continue
        b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pk))
        if b > max_bands or kp * b > max_total_planes:
            continue
        cost = b + b * (2.0**-kp) * nq
        if best is None or cost < best[0]:
            best = (cost, kp, b)
    if best is None:  # target unreachable under the caps: max effort
        kp, b = 2, max_bands
    else:
        _, kp, b = best
    if warn and b * 2.0**-kp > 0.25:
        warnings.warn(
            f"ann_cosine_lsh: at estimated neighbor similarity tau={tau:.2f} "
            f"the geometry ({b} bands x {kp} planes) expects to verify "
            f"~{min(1.0, b * 2.0 ** -kp):.0%} of the corpus per query to hold "
            f"recall>={target_recall}. Hyperplane buckets do not prune in "
            "this low-similarity regime - prefer ann_cosine_ivf.",
            stacklevel=3,
        )
    return kp * b, b


def _auto_lsh_geometry(
    n: int, threshold: float, target_recall: float = 0.9,
    max_bands: int = 32, max_planes_per_band: int = 20,
) -> tuple[int, int]:
    """Hyperplane-LSH geometry from corpus size and threshold. Per-band
    collision odds for a pair at angle theta are p^k with p = 1 - theta/pi
    and k planes; k = log2(n) makes a RANDOM pair (p = 1/2) collide with
    probability ~1/n per band, so expected spurious candidates stay
    ~bands*n. The band count then targets ``target_recall`` at the
    threshold: b = ln(1-R) / ln(1-p^k), capped. Warns with the estimated
    recall when the cap binds hard (recall < 0.5)."""
    import math
    import warnings

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    k = max(4, min(max_planes_per_band, math.ceil(math.log2(max(n, 2)))))
    pk = p**k
    if pk >= 1.0:
        bands = 4
    else:
        bands = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pk))
        bands = max(4, min(max_bands, bands))
    recall = 1.0 - (1.0 - pk) ** bands
    if recall < 0.5:
        warnings.warn(
            f"embedding_near_dup_pairs: LSH at threshold={threshold} reaches "
            f"estimated recall ~{recall:.0%} with {bands} bands x {k} planes "
            "(capped). Low/mid thresholds do not bucket under hyperplane "
            "LSH at this corpus size - use semantic_dedup (k-means cells) "
            "or raise max_exact_rows.",
            stacklevel=3,
        )
    return k * bands, bands


def _near_dup_exact_blocked(
    corpus: DataFrame, id_col: str, vec_col: str, threshold: float, ndigits: int
) -> DataFrame:
    spark = corpus.sparkSession
    pdf = corpus.select(id_col, vec_col).toPandas()
    ids_b = pdf[id_col].to_numpy().astype(np.int64)
    mat_b = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    mat_b /= np.maximum(np.linalg.norm(mat_b, axis=1, keepdims=True), 1e-12)
    b = spark.sparkContext.broadcast((ids_b, mat_b))
    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def score(batches):
        ids_, mat_ = b.value
        for pdf_ in batches:
            if len(pdf_) == 0:
                continue
            cids = pdf_[id_col].to_numpy().astype(np.int64)
            cmat = np.stack(pdf_[vec_col].to_numpy()).astype(np.float64)
            cmat /= np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
            sims = mat_ @ cmat.T  # (n_broadcast, batch)
            # each unordered pair is emitted exactly once: broadcast id < batch id
            mask = (np.round(sims, ndigits) >= threshold - 1e-9) & (
                ids_[:, None] < cids[None, :]
            )
            bi, ci = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": ids_[bi], "id_b": cids[ci], "cosine_sim": sims[bi, ci]}
            )

    # quadratic in corpus size (the whole ≤10k-row corpus is the broadcast
    # side of every batch's GEMM): per-row work is far above the cheap-op
    # density, so widen unconditionally like the other CPU-heavy stages
    out = widen(corpus.select(id_col, vec_col)).mapInPandas(score, schema=schema)
    return out.withColumn("cosine_sim", F.round(F.col("cosine_sim"), ndigits)).filter(
        F.col("cosine_sim") >= threshold
    )


def _near_dup_lsh(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    ndigits: int,
    num_planes: int,
    bands: int,
    seed: int,
) -> DataFrame:
    dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(num_planes, dim)
    sig_udf = _band_hashes_udf(planes, bands)
    bk = corpus.select(
        F.col(id_col).alias("id"), F.posexplode(sig_udf(F.col(vec_col))).alias("band", "bh")
    )
    a, b = bk.alias("a"), bk.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("id_a"), _as_double_array(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), _as_double_array(vec_col).alias("vb"))
    cos = cosine_pairs_udf()
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b", F.round(cos(F.col("va"), F.col("vb")), ndigits).alias("cosine_sim")
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _fit_and_assign_cells(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int | None,
    fit_sample: int,
    seed: int,
    target_cell_rows: int,
) -> tuple[DataFrame | None, int]:
    """Shared coarse-quantizer front end for the cell-based pair scans
    (semantic_dedup and the near-dup cells route): seeded driver-side fit
    sample → deterministic spherical k-means → broadcast-centroid GEMM
    assignment with NO shuffle. Returns (cells, n_centroids) where cells =
    (__cell int, id long, v array<double> row-normalized), localCheckpoint'd
    because every caller reads it at least twice; (None, 0) on an empty
    corpus."""
    spark = corpus.sparkSession
    sample_pdf = (
        corpus.select(vec_col)
        .sample(withReplacement=False, fraction=1.0, seed=seed)
        .limit(fit_sample)
        .toPandas()
    )
    if len(sample_pdf) == 0:
        return None, 0
    X = np.stack(sample_pdf[vec_col].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_centroids = _auto_centroids(corpus, n_centroids, fit_sample, target_cell_rows)
    C = _spherical_kmeans(X, n_centroids, seed)
    bC = spark.sparkContext.broadcast(C)

    assign_schema = T.StructType(
        [
            T.StructField("__cell", T.IntegerType()),
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )

    def assign(batches):
        C_ = bC.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(Mn @ C_.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "__cell": cell,
                    "id": pdf[id_col].to_numpy().astype(np.int64),
                    "v": [m.tolist() for m in Mn],
                }
            )

    assign_per_mb = max(0.5, min(8.0, 8.0 * 64.0 / max(1, n_centroids)))
    cells = widen(corpus.select(id_col, vec_col), per_mb=assign_per_mb).mapInPandas(
        assign, schema=assign_schema
    )
    from etl_processes_spark.partitioning import track_checkpoint

    return track_checkpoint(cells.localCheckpoint(eager=False)), n_centroids


def _cell_pair_scan(
    cells: DataFrame,
    threshold: float,
    ndigits: int,
    block_rows: int,
    with_sim: bool,
) -> DataFrame:
    """Within-cell passing-pair scan over ``cells`` from _fit_and_assign_cells:
    one shuffle on the cell id (applyInPandas), per-cell work blocked into
    (block_rows × |cell|) GEMMs so memory stays bounded even in a hot cell.
    Emits (id_a, id_b) with id_a < id_b — plus the rounded cosine when
    ``with_sim`` — for pairs whose rounded similarity meets the threshold;
    the n² pair set never materializes."""
    fields = [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    if with_sim:
        fields.append(T.StructField("cosine_sim", T.DoubleType()))
    edge_schema = T.StructType(fields)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        cols = ["id_a", "id_b"] + (["cosine_sim"] if with_sim else [])
        if n < 2:
            out = pd.DataFrame({c: [] for c in cols})
            return out.astype({"id_a": "int64", "id_b": "int64"})
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy().astype(np.int64)
        M = np.stack(pdf["v"].to_numpy())  # already normalized
        out_a, out_b, out_s = [], [], []
        for lo in range(0, n, block_rows):
            blk = M[lo : lo + block_rows]
            sims = np.round(blk @ M.T, ndigits)
            bi, ci = np.nonzero(sims >= threshold - 1e-9)
            keep_mask = (lo + bi) < ci  # id_a < id_b once, sorted order
            out_a.append(ids[lo + bi[keep_mask]])
            out_b.append(ids[ci[keep_mask]])
            if with_sim:
                out_s.append(sims[bi[keep_mask], ci[keep_mask]])
        data = {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        if with_sim:
            data["cosine_sim"] = np.concatenate(out_s)
        return pd.DataFrame(data)

    return cells.groupBy("__cell").applyInPandas(cell_pairs, schema=edge_schema)


def _near_dup_cells(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    ndigits: int,
    target_cell_rows: int,
    fit_sample: int,
    seed: int,
    block_rows: int = 4096,
) -> DataFrame:
    """Cells route for embedding_near_dup_pairs: semantic_dedup's coarse
    quantizer + within-cell blocked GEMM, but emitting (id_a, id_b,
    cosine_sim) pairs directly. Cost is bounded at ~n · target_cell_rows
    sims regardless of how the corpus clusters — the regime where
    hyperplane LSH emits ~all same-cluster pairs as candidates (measured:
    70 GB of spill at 2M clustered vectors). Approximate like
    semantic_dedup: pairs straddling a cell boundary are missed."""
    cells, _ = _fit_and_assign_cells(
        corpus, id_col, vec_col, None, fit_sample, seed, target_cell_rows
    )
    if cells is None:
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [], "id_a long, id_b long, cosine_sim double"
        )
    pairs = _cell_pair_scan(cells, threshold, ndigits, block_rows, with_sim=True)
    return pairs.filter(F.col("cosine_sim") >= threshold)


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
    num_planes: int | None = None,
    bands: int | None = None,
    dim: int | None = None,
    seed: int = 42,
    ndigits: int = 6,
    target_recall: float = 0.9,
    fit_sample: int = 2048,
    n_rows: int | None = None,
    route: str = "auto",
    max_verify_frac: float = 0.25,
) -> DataFrame:
    """ANN via random-hyperplane LSH: candidates = bucket collisions on any
    band of the sign signature; exact cosine re-rank of candidates only.
    Approximate (recall < 1); the scale path when queries aren't small.

    Geometry defaults to AUTO (``num_planes``/``bands`` = None): a seeded
    corpus sample estimates the typical k-th-neighbor cosine, and the
    cheapest (planes-per-band, bands) pair whose banding math reaches
    ``target_recall`` at that similarity is chosen — the round-5 static
    default (16 planes / 4 bands) measured recall 0.39 at sf0.1 because the
    test corpus's neighbors live near cosine 0.35 where 4-plane bands almost
    never collide. Pass both knobs to pin a geometry (the gate/oracle path);
    pass ``n_rows`` at scale to skip the count.

    ``route``: with "auto" (default) the MEASURED regime decides the
    algorithm, the way ``embedding_near_dup_pairs`` routes lsh/cells: if the
    chosen geometry's expected per-query verify volume exceeds
    ``max_verify_frac`` of the corpus (bands·2^-planes_per_band — the same
    quantity the old warning reported), hyperplane buckets are not pruning
    in this similarity regime and the call delegates to ``ann_cosine_ivf``
    (identical output contract, calibrated to the same ``target_recall``) —
    sf100 measured 188s non-pruning LSH vs 13-28s IVF at equal-or-better
    recall. "lsh" pins the hyperplane path (the old warning fires instead);
    explicit ``num_planes``/``bands`` also pin it."""
    if route not in ("auto", "lsh"):
        raise ValueError(f"route must be auto|lsh, got {route!r}")
    if (num_planes is None) != (bands is None):
        raise ValueError(
            "ann_cosine_lsh: num_planes and bands must be supplied together "
            "(or both left None for auto geometry); got "
            f"num_planes={num_planes!r}, bands={bands!r}"
        )
    if num_planes is None:
        n = n_rows
        if n is None:
            n = _estimate_rows(corpus)
        if n is None:
            n = corpus.count()
        X = _sample_norm_matrix(corpus, vec_col, fit_sample, seed)
        tau = _estimate_tau_k(X, n, k)
        num_planes, bands = _auto_topk_lsh_geometry(
            n, tau, target_recall, warn=(route != "auto")
        )
        kp = max(1, num_planes // max(bands, 1))
        if route == "auto" and bands * 2.0**-kp > max_verify_frac:
            # the algorithm switch must be observable in production runs:
            # identical calls can return different (recall-equivalent)
            # neighbor sets once the regime changes — callers needing
            # reproducible LSH output pin route="lsh" or explicit geometry
            import logging

            logging.getLogger(__name__).info(
                "ann_cosine_lsh(route='auto'): hyperplane buckets are not "
                "pruning in this similarity regime (expected verify fraction "
                "%.3f = bands*2^-planes_per_band > max_verify_frac=%.3f); "
                "delegating to ann_cosine_ivf at target_recall=%.2f. Pin "
                "route='lsh' or explicit num_planes/bands for reproducible "
                "LSH output.",
                bands * 2.0**-kp, max_verify_frac, target_recall,
            )
            return ann_cosine_ivf(
                corpus,
                queries,
                id_col,
                vec_col,
                k=k,
                seed=seed,
                ndigits=ndigits,
                target_recall=target_recall,
            )
        dim = X.shape[1]
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
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
    cos = cosine_pairs_udf()
    cand = (
        cb.join(qb, ["band", "bh"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_v", "neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])  # vectors identical per pair
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("query_id_v"), F.col("neighbor_id_v")), ndigits).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _auto_centroids(
    corpus: DataFrame,
    n_centroids: int | None,
    fit_sample: int,
    target_cell_rows: int = 20_000,
) -> int:
    """Resolve a centroid count: the explicit parameter wins; otherwise
    derive ``ceil(n / target_cell_rows)`` from the corpus size (Catalyst's
    free row-count statistic when defined, one count() otherwise) so cells
    hold ~10-50k rows at ANY corpus size — a static default at 100M+
    vectors would make the within-cell quadratic work catastrophic. Clamped
    to [16, fit_sample // 4] — the quantizer is fit on ``fit_sample`` rows,
    and fewer than ~4 sample rows per centroid stops estimating anything;
    callers pushing past ~10k centroids should raise fit_sample too."""
    if n_centroids is not None:
        return int(n_centroids)
    n = _estimate_rows(corpus)
    if n is None:
        n = corpus.count()
    k = max(16, -(-int(n) // target_cell_rows))
    return int(min(k, max(16, fit_sample // 4)))


def _spherical_kmeans(X: np.ndarray, n_centroids: int, seed: int, max_iter: int = 10) -> np.ndarray:
    """Deterministic spherical k-means on row-normalized X: centroids are
    renormalized member means; init picks evenly spaced rows of the (stable)
    sample order. Driver-side — the sample is small by contract. The member
    update is vectorized (np.add.at scatter + bincount) so large centroid
    counts don't pay a Python loop; empty clusters and degenerate sums keep
    their previous centroid, as before. DuckDB oracle twins import THIS
    function, so its exact arithmetic is the shared source of truth."""
    n = len(X)
    n_centroids = min(n_centroids, n)
    idx = (np.arange(n_centroids) * max(n // n_centroids, 1)) % n
    C = X[idx].copy()
    for _ in range(max_iter):
        assign = np.argmax(X @ C.T, axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, assign, X)
        norms = np.linalg.norm(sums, axis=1)
        upd = norms > 1e-12
        C[upd] = sums[upd] / norms[upd, None]
    return C


def _calibrate_nprobe(
    X: np.ndarray, C: np.ndarray, target_recall: float, k: int, nq_cal: int = 128
) -> int:
    """Resolve IVF ``n_probe`` against a recall target by MEASURING cell
    coverage on the fit sample: for ``nq_cal`` sample queries, find each true
    top-k neighbor's cell rank in the query's probe order, and return the
    smallest probe depth covering ``target_recall`` of those memberships.
    Driver-side numpy on the (already collected) fit sample — no extra jobs.
    A static n_probe can't self-scale: the right depth depends on how the
    quantizer's cells slice the neighbor structure, which this observes
    directly."""
    cells = np.argmax(X @ C.T, axis=1)
    nq = min(nq_cal, len(X))
    Q = X[:nq]
    sims = Q @ X.T
    sims[np.arange(nq), np.arange(nq)] = -np.inf
    kk = min(k, len(X) - 1)
    if kk <= 0:
        return 1
    topk = np.argsort(-sims, axis=1)[:, :kk]
    order = np.argsort(-(Q @ C.T), axis=1)  # (nq, nc) probe order per query
    cell_rank = np.empty((nq, len(C)), dtype=np.int64)
    rows = np.arange(nq)[:, None]
    cell_rank[rows, order] = np.arange(len(C))[None, :]
    nbr_ranks = np.sort(cell_rank[rows, cells[topk]].ravel())
    need = int(np.ceil(target_recall * len(nbr_ranks)))
    npb = int(nbr_ranks[need - 1]) + 1 if need else 1
    return max(1, min(npb, len(C)))


def ann_cosine_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int | None = None,
    n_probe: int | None = None,
    fit_sample: int = 10_000,
    seed: int = 42,
    ndigits: int = 6,
    target_recall: float = 0.9,
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse spherical-k-means quantizer is fit
    driver-side on a seeded corpus sample; every corpus vector is assigned
    to its nearest centroid in one Arrow/GEMM pass; each query probes its
    ``n_probe`` nearest cells and exact-reranks ONLY the vectors in those
    cells (an equi-join on the cell id — no cross join anywhere). Expected
    rerank cost per query is |corpus| * n_probe / n_centroids; recall rises
    with n_probe (n_probe == n_centroids is exact). ``n_probe`` defaults to
    AUTO: calibrated on the fit sample against ``target_recall`` (see
    _calibrate_nprobe) — a static depth silently decays as the corpus and
    the auto-scaled centroid count grow. The 100 TB shape: centroids
    broadcast, assignment is a narrow map, candidates shuffle on the cell
    id."""
    spark = corpus.sparkSession
    X = _sample_norm_matrix(corpus, vec_col, fit_sample, seed)
    n_centroids = _auto_centroids(corpus, n_centroids, fit_sample)
    C = _spherical_kmeans(X, n_centroids, seed)
    if n_probe is None:
        n_probe = _calibrate_nprobe(X, C, target_recall, k)
    bC = spark.sparkContext.broadcast(C)

    assign_schema = T.StructType(
        [
            T.StructField("__cell", T.IntegerType()),
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )

    def assign(batches):
        C_ = bC.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            cells = np.argmax(Mn @ C_.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "__cell": cells,
                    "id": pdf[id_col].to_numpy().astype(np.int64),
                    "v": [m.tolist() for m in M],
                }
            )

    # assignment cost per row scales with the centroid count: ~8 MB/task at
    # 64 centroids, proportionally less as the codebook grows
    assign_per_mb = max(0.5, min(8.0, 8.0 * 64.0 / max(1, n_centroids)))
    cells = widen(corpus.select(id_col, vec_col), per_mb=assign_per_mb).mapInPandas(
        assign, schema=assign_schema
    )

    qpdf = queries.select(id_col, vec_col).toPandas()
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, : min(n_probe, len(C))]
    q_rows = [
        (int(qid), int(cell), qv.tolist())
        for qid, qv, row in zip(qpdf[id_col], Q, probe)
        for cell in row
    ]
    q_cells = spark.createDataFrame(q_rows, ["query_id", "__cell", "qv"])

    cos = cosine_pairs_udf()
    cand = (
        cells.join(F.broadcast(q_cells), "__cell")
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(cos(F.col("qv"), F.col("v")), ndigits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int | None = None,
    fit_sample: int = 10_000,
    seed: int = 42,
    ndigits: int = 6,
    block_rows: int = 4096,
    target_cell_rows: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with a coarse quantizer, then look
    for near-duplicate pairs ONLY within each cluster — cosine across
    clusters is below threshold by construction of the quantizer, so the
    quadratic pair search shrinks from n² to Σ |cell|².

    Returns one row per corpus vector: (id_col, cluster_id, keep) where
    keep=false marks a semantic duplicate of a kept vector (survivor = min
    id per within-cluster duplicate component, via connected_components —
    the same keep-one policy the text dedup family uses).

    100 TB shape: the quantizer is fit driver-side on a seeded sample
    (identical to ann_cosine_ivf); assignment is a broadcast-centroid GEMM
    map with NO shuffle; the within-cell pair scan shuffles once on the
    cell id (applyInPandas), with per-cell work blocked into
    (block_rows × |cell|) GEMMs so memory stays bounded even in a hot cell.

    The within-cell scan is the quadratic term — Σ|cell|² ≈ n · cell_rows —
    so the auto centroid count targets CONSTANT per-row work: cells of
    ``target_cell_rows`` (default 4096 ≈ the GEMM block), giving LINEAR
    total cost in n. This target is deliberately ~5× smaller than the IVF
    quantizer's (20k): IVF pays its cell size only on probed cells per
    query, while dedup pays |cell|² on EVERY cell (sf10 measured, 200k
    vectors: 16 pinned cells = 27.1s and 100× pair work per 10× corpus;
    n/4096 cells holds per-row work flat). The duplicate-pair edge list is
    sparse, so the component pass is cheap. Approximate like the paper: a
    duplicate pair straddling a cell boundary is missed — more cells means
    more boundary, so raise ``target_cell_rows``/pin ``n_centroids`` when
    recall matters more than cost, or union a second, shifted-seed
    clustering."""
    cells, n_centroids = _fit_and_assign_cells(
        corpus, id_col, vec_col, n_centroids, fit_sample, seed, target_cell_rows
    )
    if cells is None:  # empty corpus: nothing to cluster or prune
        return corpus.select(
            F.col(id_col),
            F.lit(0).cast("int").alias("cluster_id"),
            F.lit(True).alias("keep"),
        )
    edges = _cell_pair_scan(cells, threshold, ndigits, block_rows, with_sim=False)

    from etl_processes_spark.ops.dedup import connected_components

    comp = connected_components(edges, "id_a", "id_b")
    return (
        cells.select(F.col("id").alias(id_col), F.col("__cell").alias("cluster_id"))
        .join(
            comp.select(
                F.col("node").alias(id_col), F.col("cluster_id").alias("__dup_min")
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "cluster_id",
            (F.col("__dup_min").isNull() | (F.col("__dup_min") == F.col(id_col))).alias(
                "keep"
            ),
        )
    )


# ---------------------------------------------------------------------------
# product quantization (PQ)
# ---------------------------------------------------------------------------


def _sq_dists(Xs: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Squared L2 distances (n, ksub) via one GEMM: ||x||² + ||c||² - 2x·c.
    Shared by _pq_fit, pq_encode and ivf_pq_index (and therefore, through
    _pq_fit, by the DuckDB oracle twins) so argmin ties resolve from the
    SAME floating-point values everywhere. ~100× faster than the broadcast
    (n, ksub, dsub) difference tensor at ksub=256."""
    x2 = np.einsum("ij,ij->i", Xs, Xs)[:, None]
    c2 = np.einsum("ij,ij->i", C, C)[None, :]
    return x2 + c2 - 2.0 * (Xs @ C.T)


def _auto_pq_m(d: int) -> int:
    """Subspace count from dimensionality: prefer 4-dim subspaces (the
    byte-code sweet spot at embedding dims ~64-1024 — measured recall 0.67
    raw / ~1.0 refined at d=64 vs 0.10 for the old 8-dim split), falling
    back to the smallest divisor of d that keeps subspaces at most 8 dims."""
    if d % 4 == 0:
        return d // 4
    for dsub in (2, 3, 5, 6, 7, 8):
        if d % dsub == 0:
            return d // dsub
    return 1


def _auto_refine(n: int) -> int:
    """Refine (over-fetch) multiple from corpus size: quantization-error
    intruders outrank true neighbors more often as the corpus grows, so the
    candidate multiple grows with log2(n) — measured: 11× at 2k rows and
    14× at 20k rows lift refined recall to ~1.0/0.97 where a static 8×
    reached 0.45. The refine stage reads only nq·refine·k true vectors, so
    generosity is cheap. This is the FLOOR; the auto paths calibrate on the
    fit sample instead (_calibrate_refine) because log2(n) undershoots on
    corpora where ADC rank quality is poor (measured recall slide
    1.0 → 0.95 → 0.89 across sf1 → sf10 → sf100)."""
    import math

    return max(8, int(round(math.log2(max(n, 2)))))


def _calibrate_refine(
    X: np.ndarray,
    books: np.ndarray,
    n: int,
    k: int,
    target_recall: float = 0.95,
    nq_cal: int = 128,
    cap: int = 512,
) -> int:
    """Resolve the refine (over-fetch) multiple by MEASURING ADC rank
    quality on the fit sample, the _calibrate_nprobe pattern: encode the
    sample with the trained codebooks, ADC-score ``nq_cal`` sample queries,
    and read off how deep in the ADC ranking the true (exact-cosine) top-k
    neighbors actually live. The ``target_recall``-quantile of those sample
    ranks scales LINEARLY with corpus size (an intruder is a vector whose
    quantization error lifts its ADC score above a true neighbor's; intruder
    count at fixed error density is proportional to n), so the sample rank
    is multiplied by n/|sample| before converting to a multiple of k.
    Clamped to [_auto_refine(n), cap] — the refine stage reads only
    nq·refine·k true vectors, so the cap binds cost, not recall, and a cap
    that binds hard means PQ itself is the wrong index for the corpus."""
    m, ksub, dsub = books.shape
    s = len(X)
    if s < 2:
        return _auto_refine(n)
    codes = np.empty((s, m), dtype=np.int64)
    for sub in range(m):
        Xs = X[:, sub * dsub : (sub + 1) * dsub]
        codes[:, sub] = np.argmin(_sq_dists(Xs, books[sub]), axis=1)
    nq = min(nq_cal, s)
    Q = X[:nq]
    tables = np.einsum("qsd,sjd->qsj", Q.reshape(nq, m, dsub), books)
    adc = np.zeros((nq, s), dtype=np.float64)
    for sub in range(m):
        adc += tables[:, sub, codes[:, sub]]
    exact = Q @ X.T
    diag = np.arange(nq)
    exact[diag, diag] = -np.inf  # query qi IS sample row qi
    adc[diag, diag] = -np.inf
    kk = min(k, s - 1)
    if kk <= 0:
        return _auto_refine(n)
    topk = np.argsort(-exact, axis=1)[:, :kk]
    adc_rank = np.argsort(np.argsort(-adc, axis=1), axis=1)  # 0-based positions
    ranks = np.sort(adc_rank[diag[:, None], topk].ravel())
    need = int(np.ceil(target_recall * len(ranks)))
    r_sample = int(ranks[need - 1]) + 1 if need else 1
    scaled = r_sample * max(1.0, n / s)
    refine = int(np.ceil(scaled / max(k, 1)))
    return max(_auto_refine(n), min(refine, cap))


def _pq_fit(X: np.ndarray, m: int, ksub: int, max_iter: int = 10) -> np.ndarray:
    """Deterministic per-subspace Euclidean k-means for PQ codebooks.
    ``X`` is the ROW-NORMALIZED (n, d) training sample; the d dims split
    into ``m`` contiguous subspaces of d/m dims, each quantized with its own
    ``ksub``-entry codebook. Same determinism contract as _spherical_kmeans:
    evenly spaced init over the (stable) sample order, first-min argmin
    tie-break, fixed iteration count, empty cluster keeps its previous
    centroid — so an oracle can refit bit-identical codebooks from the same
    sample with pure numpy. Returns (m, ksub, d//m) float64."""
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible into {m} subspaces")
    dsub = d // m
    ksub = min(ksub, n)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    idx = (np.arange(ksub) * max(n // ksub, 1)) % n
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        C = Xs[idx].copy()
        for _ in range(max_iter):
            # (n, ksub) squared L2 via the shared GEMM form; argmin ties
            # resolve to the FIRST (lowest code) — replayed in SQL as
            # ORDER BY distance, code. Member means via scatter-add +
            # bincount (vectorized; empty clusters keep their centroid).
            assign = np.argmin(_sq_dists(Xs, C), axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, Xs)
            counts = np.bincount(assign, minlength=ksub)
            nz = counts > 0
            C[nz] = sums[nz] / counts[nz, None]
        books[s] = C
    return books


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int | None = None,
    ksub: int | None = None,
    fit_sample: int = 10_000,
    seed: int = 42,
) -> np.ndarray:
    """Fit PQ codebooks on a seeded corpus sample (driver-side, same
    sampling contract as ann_cosine_ivf's coarse quantizer). Vectors are
    row-normalized first, so inner-product ADC approximates cosine.
    Defaults are AUTO: ``m`` from the dimensionality (4-dim subspaces, see
    _auto_pq_m) and ``ksub`` = 256 (the standard byte-code operating point;
    the old static 16 collapsed ADC rank quality — measured recall 0.10).
    Memory story at 100 TB: a 64-dim float32 vector is 256 B; its PQ code is
    m bytes, so a billion-vector index fits in executor memory where raw
    vectors cannot."""
    X = _sample_norm_matrix(corpus, vec_col, fit_sample, seed)
    if m is None:
        m = _auto_pq_m(X.shape[1])
    if ksub is None:
        ksub = min(256, len(X))
    return _pq_fit(X, m=m, ksub=ksub)


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize every corpus vector: (id, codes array<int> of length m).
    Broadcast codebooks + one Arrow/numpy pass — a narrow map with NO
    shuffle; the output is the compact index the ADC search scans."""
    spark = corpus.sparkSession
    bC = spark.sparkContext.broadcast(codebooks)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches):
        books = bC.value
        m, ksub, dsub = books.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(M), m), dtype=np.int32)
            for s in range(m):
                Ms = M[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = np.argmin(_sq_dists(Ms, books[s]), axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy().astype(np.int64),
                    "codes": [c.tolist() for c in codes],
                }
            )

    return widen(corpus.select(id_col, vec_col), per_mb=4.0).mapInPandas(
        encode, schema=schema
    )


def pq_topk(
    codes: DataFrame,
    queries_pdf: pd.DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    ndigits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: per query,
    an (m, ksub) inner-product lookup table is precomputed driver-side and
    broadcast; scoring a corpus item is m table lookups + a sum — no
    floating-point vector math per candidate. Output contract matches
    cosine_topk: (query_id, neighbor_id, cosine_sim, rank) where cosine_sim
    is the ADC APPROXIMATION of cosine (rounded), ranked (sim desc,
    neighbor_id asc). Partial top-k per partition (same slack trick as
    cosine_topk_blocked), final top-k via window.

    100 TB shape: the scanned side is the codes frame (m bytes/row), query
    tables are (nq, m, ksub) floats broadcast once, and the shuffle after
    partial selection is O(num_partitions * nq * k) rows."""
    spark = codes.sparkSession
    m, ksub, dsub = codebooks.shape
    qids = queries_pdf[id_col].to_numpy().astype(np.int64)
    Q = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # T[qi, s, j] = <q_sub, centroid>: summed over s in subspace order, the
    # same order the oracle's per-subspace contributions sum in
    tables = np.einsum(
        "qsd,sjd->qsj", Q.reshape(len(Q), m, dsub), codebooks
    )
    b = spark.sparkContext.broadcast((qids, tables))

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )
    slack = 8

    def score(batches):
        qids_, tables_ = b.value
        nq = len(qids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy().astype(np.int64)
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            # sims[qi, i] = sum_s tables[qi, s, C[i, s]]
            sims = np.zeros((nq, len(ids)), dtype=np.float64)
            for s in range(m):
                sims += tables_[:, s, C[:, s]]
            rsims = np.round(sims, ndigits)
            rsims[qids_[:, None] == ids[None, :]] = -np.inf
            nk = min(k + slack, sims.shape[1])
            out_q, out_n, out_s = [], [], []
            for qi in range(nq):
                idx = np.lexsort((ids, -rsims[qi]))[:nk]
                idx = idx[rsims[qi][idx] > -np.inf]
                out_q.append(np.full(len(idx), qids_[qi], dtype=np.int64))
                out_n.append(ids[idx])
                out_s.append(sims[qi][idx])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine_sim": np.concatenate(out_s),
                }
            )

    partial = codes.mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        partial.withColumn("cosine_sim", F.round(F.col("cosine_sim"), ndigits))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def exact_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    ndigits: int = 6,
) -> DataFrame:
    """The standard ANN "refine" stage (FAISS IndexRefineFlat): re-score a
    small candidate set — (query_id, neighbor_id) rows from an approximate
    stage — with EXACT cosine against the true corpus vectors, then keep
    the top-k. Compressed-domain scores (PQ/ADC) rank coarsely; fetching
    ~4-8x k candidates and re-ranking them exactly recovers most of the
    recall lost to quantization while still reading only nq x refine_k true
    vectors instead of the whole corpus.

    Plan shape: the candidate set (with query vectors attached) broadcasts
    into an equi-join against the corpus — a scan-side hash semi-probe, no
    shuffle of the corpus; the exact cosine is one Arrow einsum per batch;
    final top-k is a window over nq x refine_k rows."""
    spark = corpus.sparkSession
    qdf = spark.createDataFrame(
        [
            (int(r[id_col]), [float(x) for x in r[vec_col]])
            for _, r in queries_pdf.iterrows()
        ],
        "query_id long, qv array<double>",
    )
    cand = candidates.select("query_id", "neighbor_id").join(
        F.broadcast(qdf), "query_id"
    )
    corp = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double_array(vec_col).alias("cv")
    )
    cos = cosine_pairs_udf()
    scored = corp.join(F.broadcast(cand), "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round(cos(F.col("qv"), F.col("cv")), ndigits).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ann_cosine_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int | None = None,
    ksub: int | None = None,
    fit_sample: int = 10_000,
    seed: int = 42,
    ndigits: int = 6,
    refine: int | str | None = "auto",
    n_rows: int | None = None,
) -> DataFrame:
    """train + encode + ADC search in one call (the gate/bench entry point).
    For a persistent index, call pq_train/pq_encode once, save the codes
    frame, and run pq_topk per query batch. With ``refine`` = r, the ADC
    stage over-fetches r*k candidates and ``exact_rerank`` re-scores them
    against the true vectors — recall recovers toward exact at the cost of
    reading nq*r*k raw vectors. ``refine`` DEFAULTS ON ("auto": a
    corpus-scaled multiple, see _auto_refine) because raw ADC rank quality
    silently decays with corpus size; pass refine=None for the raw
    compressed-domain ranking."""
    books = pq_train(corpus, vec_col, m=m, ksub=ksub, fit_sample=fit_sample, seed=seed)
    codes = pq_encode(corpus, books, id_col, vec_col)
    qpdf = queries.select(id_col, vec_col).toPandas()
    if refine == "auto":
        n = n_rows
        if n is None:
            n = _estimate_rows(corpus)
        if n is None:
            n = corpus.count()
        # calibrated on the SAME seeded sample pq_train fit on (deterministic
        # by the shared _sample_norm_matrix contract) — log2(n) alone
        # undershot at sf100 (recall 0.89 and sliding one decade per ~0.05)
        X_fit = _sample_norm_matrix(corpus, vec_col, fit_sample, seed)
        refine = _calibrate_refine(X_fit, books, n, k)
    if refine is None:
        return pq_topk(codes, qpdf, books, id_col, vec_col, k=k, ndigits=ndigits)
    cand = pq_topk(
        codes, qpdf, books, id_col, vec_col, k=k * max(1, refine), ndigits=ndigits
    )
    return exact_rerank(cand, corpus, qpdf, id_col, vec_col, k=k, ndigits=ndigits)


def ivf_pq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    m: int | None = None,
    ksub: int | None = None,
    fit_sample: int = 10_000,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """The billion-scale ANN layout: coarse IVF cells for pruning + PQ codes
    for compression, built in ONE Arrow pass over the corpus. Returns
    (centroids, codebooks, index) where index = (cell, id, codes) — m bytes
    of payload per vector. Persist the index with ``io.clustered_sink``
    keyed on ``cell`` and a probe query's scan prunes to its cells at the
    parquet row-group level.

    Both quantizers fit driver-side on the SAME seeded sample (deterministic
    — the oracle refits them bit-identically); assignment + encoding are a
    broadcast-constants map with NO shuffle. ``m``/``ksub`` default to AUTO
    (see pq_train)."""
    spark = corpus.sparkSession
    X = _sample_norm_matrix(corpus, vec_col, fit_sample, seed)
    if m is None:
        m = _auto_pq_m(X.shape[1])
    if ksub is None:
        ksub = min(256, len(X))
    n_centroids = _auto_centroids(corpus, n_centroids, fit_sample)
    C = _spherical_kmeans(X, n_centroids, seed)
    books = _pq_fit(X, m=m, ksub=ksub)
    bC = spark.sparkContext.broadcast((C, books))

    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def build(batches):
        C_, books_ = bC.value
        m_, ksub_, dsub = books_.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            cells = np.argmax(M @ C_.T, axis=1).astype(np.int32)
            codes = np.empty((len(M), m_), dtype=np.int32)
            for s in range(m_):
                Ms = M[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = np.argmin(_sq_dists(Ms, books_[s]), axis=1)
            yield pd.DataFrame(
                {
                    "cell": cells,
                    "id": pdf[id_col].to_numpy().astype(np.int64),
                    "codes": [c.tolist() for c in codes],
                }
            )

    index = widen(corpus.select(id_col, vec_col), per_mb=4.0).mapInPandas(
        build, schema=schema
    )
    return C, books, index


def ann_cosine_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int | None = None,
    n_probe: int | None = None,
    m: int | None = None,
    ksub: int | None = None,
    fit_sample: int = 10_000,
    seed: int = 42,
    ndigits: int = 6,
    refine: int | str | None = "auto",
    target_recall: float = 0.95,
    n_rows: int | None = None,
) -> DataFrame:
    """IVF-PQ search: each query ADC-scores ONLY the PQ codes in its
    ``n_probe`` nearest cells — the pruning of IVF times the compression of
    PQ, the standard composition behind billion-vector indexes. Work per
    query ≈ |corpus|·n_probe/n_centroids candidates × m table lookups; the
    scanned payload is m bytes per vector, so a 10⁹-vector index fits where
    raw float vectors cannot, AND only ~n_probe/n_centroids of it is read.

    The scan-side filter (cell ∈ union of probed cells) is a codegen'd
    isin BEFORE any Python — on a cell-clustered index it prunes at the
    parquet row-group level. Per-query cell masks apply inside the scoring
    kernel (boolean table lookup, no vector math). Output contract matches
    cosine_topk/ann_cosine_pq: (query_id, neighbor_id, cosine_sim, rank),
    cosine_sim = ADC approximation, rank by (sim desc, neighbor_id asc).
    With ``refine`` = r, the ADC stage over-fetches r*k candidates per
    query and ``exact_rerank`` re-scores them against the true vectors.

    AUTO defaults: ``m``/``ksub`` from dim/sample (pq_train), ``refine`` ON
    with a corpus-scaled multiple (_auto_refine), and ``n_probe`` calibrated
    on the fit sample against sqrt(``target_recall``) — the probe stage and
    the ADC+refine stage multiply, so each targets the square root of the
    end-to-end goal. The default target is 0.95, NOT 0.9: the calibration
    is tight enough that a 0.9 target lands almost exactly at 0.90-0.91
    end-to-end (measured sf1: probe-all 0.97 x refine-all 0.94 ≈ 0.91
    combined), under the 0.92 recall floor the benchmark enforces for the
    refined lines; 0.95 measured 0.97+ across sf0.1-sf100."""
    spark = corpus.sparkSession
    if refine == "auto" or n_probe is None:
        n = n_rows
        if n is None:
            n = _estimate_rows(corpus)
        if n is None:
            n = corpus.count()
    k_out = k
    C, books, index = ivf_pq_index(
        corpus, id_col, vec_col, n_centroids, m, ksub, fit_sample, seed
    )
    n_centroids = len(C)  # resolved (auto-scaled and/or sample-clamped)
    m_, ksub_, dsub = books.shape
    if refine == "auto" or n_probe is None:
        Xs_fit = _sample_norm_matrix(corpus, vec_col, fit_sample, seed)
        if refine == "auto":
            # the probe stage and the ADC+refine stage multiply, so the
            # refine calibration targets sqrt of the end-to-end goal —
            # matched to the n_probe split below; measured on the sample,
            # scaled to the corpus (see _calibrate_refine)
            refine = _calibrate_refine(
                Xs_fit, books, n, k_out, target_recall=max(0.95, target_recall**0.5)
            )
        if n_probe is None:
            n_probe = _calibrate_nprobe(Xs_fit, C, target_recall**0.5, k_out)
    if refine is not None:
        k = k * max(1, refine)
    qpdf = queries.select(id_col, vec_col).toPandas()
    qids = qpdf[id_col].to_numpy().astype(np.int64)
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # probe cells: np.argmax ties resolve to the lowest cell; the full rank
    # uses (dot desc, cell asc) — same as the IVF oracle's row_number order
    qc = Q @ C.T
    order = np.lexsort((np.arange(n_centroids)[None, :].repeat(len(Q), 0), -qc))
    probed = order[:, :n_probe]  # (nq, n_probe)
    probe_mask = np.zeros((len(Q), n_centroids), dtype=bool)
    for qi in range(len(Q)):
        probe_mask[qi, probed[qi]] = True
    tables = np.einsum("qsd,sjd->qsj", Q.reshape(len(Q), m_, dsub), books)
    b = spark.sparkContext.broadcast((qids, tables, probe_mask))

    allowed = sorted({int(c) for c in probed.flatten()})
    cand = index.filter(F.col("cell").isin(allowed))

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )
    slack = 8

    def score(batches):
        qids_, tables_, mask_ = b.value
        nq = len(qids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy().astype(np.int64)
            cells = pdf["cell"].to_numpy().astype(np.int64)
            Cd = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            sims = np.zeros((nq, len(ids)), dtype=np.float64)
            for s in range(m_):
                sims += tables_[:, s, Cd[:, s]]
            rsims = np.round(sims, ndigits)
            rsims[~mask_[:, cells]] = -np.inf  # outside this query's probes
            rsims[qids_[:, None] == ids[None, :]] = -np.inf
            nk = min(k + slack, sims.shape[1])
            out_q, out_n, out_s = [], [], []
            for qi in range(nq):
                idx = np.lexsort((ids, -rsims[qi]))[:nk]
                idx = idx[rsims[qi][idx] > -np.inf]
                out_q.append(np.full(len(idx), qids_[qi], dtype=np.int64))
                out_n.append(ids[idx])
                out_s.append(sims[qi][idx])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine_sim": np.concatenate(out_s),
                }
            )

    partial = cand.mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    out = (
        partial.withColumn("cosine_sim", F.round(F.col("cosine_sim"), ndigits))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
    if refine is None:
        return out
    return exact_rerank(out, corpus, qpdf, id_col, vec_col, k=k_out, ndigits=ndigits)
