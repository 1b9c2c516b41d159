"""Text/embedding pipeline — reference Latanova_v1.py:19-62 (tokenize +
vectorise), :194-226 (text stats), :300-344 (MVN generation + k-NN decode).

The reference loads a pretrained FastText model that is ABSENT from the
snapshot (Latanova_v1.py:19; the script is non-runnable as shipped). This
engine replaces it with a DETERMINISTIC hash-seeded token embedding: every
token's vector is ``randn(V)`` drawn from a numpy RNG seeded by a stable hash
of the token. This simultaneously fixes the reference's unseeded-OOV
nondeterminism (SURVEY.md §2.11 Q5) — in-vocabulary and OOV tokens are the
same deterministic function; the "vocabulary" (for k-NN decode) is the
distinct token set of the profiled entries.

Scale design: vectorisation is an Arrow-batched pandas_udf (no per-row Python
dispatch); per-dimension moments come from one Arrow powersum pass;
per-dimension exact medians from histogram-bracketed distributed selection
(no posexplode — the explode+sort-agg route spilled 27.2 GB at sf100);
covariance is a distributed Gramian (Σ x·xᵀ tree-aggregated as a d²-length
array column), so raw n×d vectors are NEVER collected (unlike
Latanova_v1.py:223-224 which retains the full matrix in the stats dict). Generation draws z ~ N(0, I) with
a per-row-id-seeded RNG inside mapInPandas (deterministic under any
partitioning) and applies the driver-computed Cholesky factor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_processes_spark.profile.types import ColumnProfile

MAX_TOKENS_PER_ENTRY = 32  # Latanova_v1.py:21
VECTOR_SIZE = 8  # engine knob; reference model dim is unknowable (model absent)

# gensim simple_preprocess parity (Latanova_v1.py:29,48): unicode alphabetic
# runs (no digits), lowercased, 2 <= len <= 15.
_TOKEN_RE = re.compile(r"(?:(?!\d)\w)+", re.UNICODE)
MIN_TOKEN_LEN, MAX_TOKEN_LEN = 2, 15


def tokenize(text: str, min_len: int = MIN_TOKEN_LEN) -> list[str]:
    if text is None:
        return []
    return [
        t
        for t in _TOKEN_RE.findall(str(text).lower())
        if min_len <= len(t) <= MAX_TOKEN_LEN
    ]


def tokenize_expr(c: str | Column) -> Column:
    """Column-expression twin of tokenize() — JVM-side, for native pipelines.

    KNOWN DIVERGENCE (edge case): python ``\\w`` minus ``\\d`` also admits
    non-decimal numerics (e.g. '²', 'Ⅳ') that ``\\p{L}`` does not, so a
    token like 'x²' tokenizes differently between the twins. Plain-language
    corpora are unaffected; both the vocab build and the DuckDB oracles use
    THIS expression consistently, so gates cannot split on it."""
    col = F.col(c) if isinstance(c, str) else c
    toks = F.split(F.lower(col.cast("string")), r"[^\p{L}_]+")
    return F.filter(
        toks,
        lambda t: (F.length(t) >= MIN_TOKEN_LEN) & (F.length(t) <= MAX_TOKEN_LEN),
    )


def token_vector(token: str, vector_size: int = VECTOR_SIZE) -> np.ndarray:
    """Deterministic embedding via Box-Muller over md5 bytes: component c
    draws u1 from 16-bit hex slice c of md5(token) and u2 from the same
    slice of md5(token + chr(1)); z = sqrt(-2 ln u1) * cos(2 pi u2).

    Chosen over the earlier RandomState(md5-seed).randn because BOTH Spark
    (this code) and DuckDB (hex slices + ln/cos/sqrt SQL) compute the SAME
    doubles — which is what lets the whole text-profile statistics path be
    hash-gated against the oracle. Scalar math.* (libm) rather than numpy
    ufuncs for cross-engine bit parity; +0.5 keeps u1 off zero. Still
    deterministic for OOV/any token (SURVEY.md §2.11 Q5 fix)."""
    import math

    if vector_size > 8:
        raise ValueError("vector_size > 8 exceeds the 128-bit md5 slice budget")
    h1 = hashlib.md5(token.encode("utf-8")).hexdigest()
    h2 = hashlib.md5((token + "\x01").encode("utf-8")).hexdigest()
    out = np.empty(vector_size)
    for c in range(vector_size):
        u1 = (int(h1[4 * c : 4 * c + 4], 16) + 0.5) / 65536.0
        u2 = (int(h2[4 * c : 4 * c + 4], 16) + 0.5) / 65536.0
        out[c] = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)
    return out


def vectorise_entry(entry: str, vector_size: int = VECTOR_SIZE) -> np.ndarray:
    """Token vectors, truncated/zero-padded to MAX_TOKENS_PER_ENTRY, then
    concatenated to a fixed 32·V vector (Latanova_v1.py:45-62)."""
    toks = tokenize(entry)[:MAX_TOKENS_PER_ENTRY]
    out = np.zeros(MAX_TOKENS_PER_ENTRY * vector_size)
    for i, t in enumerate(toks):
        out[i * vector_size : (i + 1) * vector_size] = token_vector(t, vector_size)
    return out


def vectorise_udf(vector_size: int = VECTOR_SIZE):
    """Arrow-batched pandas_udf: string → array<double> (the 32·V entry vec).
    A per-executor token→vector cache amortizes the md5+randn derivation —
    corpora repeat tokens heavily (Zipf), so the hot path is a dict hit."""
    cache: dict[str, np.ndarray] = {}

    def tv(tok: str) -> np.ndarray:
        v = cache.get(tok)
        if v is None:
            if len(cache) > 500_000:  # bound executor memory
                cache.clear()
            v = cache[tok] = token_vector(tok, vector_size)
        return v

    def one(entry: str) -> list[float]:
        toks = tokenize(entry)[:MAX_TOKENS_PER_ENTRY]
        out = np.zeros(MAX_TOKENS_PER_ENTRY * vector_size)
        for i, t in enumerate(toks):
            out[i * vector_size : (i + 1) * vector_size] = tv(t)
        return out.tolist()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _vec(s: pd.Series) -> pd.Series:
        return s.map(one)

    return _vec


def vectorise_entry_mean(entry: str, vector_size: int = VECTOR_SIZE) -> np.ndarray:
    """Mean-pooled entry embedding — the reference's get_vectorised_entries
    (Latanova_v1.py:23-43; dead code there, implemented here for API
    completeness and because mean-pooling is the pooling that scales: a
    V-dim vector per entry instead of 32·V). Reference parity: tokens are
    simple_preprocess(min_len=1) — NOT the concat path's min_len=2 — with
    no 32-token truncation, and a token-less entry embeds as zeros(V)."""
    toks = tokenize(entry, min_len=1)
    if not toks:
        return np.zeros(vector_size)
    return np.mean([token_vector(t, vector_size) for t in toks], axis=0)


def vectorise_mean_udf(vector_size: int = VECTOR_SIZE):
    """Arrow-batched pandas_udf twin of vectorise_entry_mean (same
    per-executor token cache as the concat variant)."""
    cache: dict[str, np.ndarray] = {}

    def tv(tok: str) -> np.ndarray:
        v = cache.get(tok)
        if v is None:
            if len(cache) > 500_000:
                cache.clear()
            v = cache[tok] = token_vector(tok, vector_size)
        return v

    def one(entry: str) -> list[float]:
        toks = tokenize(entry, min_len=1)
        if not toks:
            return [0.0] * vector_size
        acc = np.zeros(vector_size)
        for t in toks:
            acc += tv(t)
        return (acc / len(toks)).tolist()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _vec(s: pd.Series) -> pd.Series:
        return s.map(one)

    return _vec


def embed_entries_mean(
    df: DataFrame, c: str, vector_size: int = VECTOR_SIZE
) -> DataFrame:
    """df + ``__vec`` of V doubles (mean-pooled; see vectorise_entry_mean)."""
    from etl_processes_spark.partitioning import widen

    return widen(df).withColumn(
        "__vec", vectorise_mean_udf(vector_size)(F.col(c).cast("string"))
    )


def embed_entries(df: DataFrame, c: str, vector_size: int = VECTOR_SIZE) -> DataFrame:
    """df + ``__vec`` column of 32·V doubles. The input is widened first:
    a single-row-group parquet arrives as ONE task, which would serialize
    the whole Arrow embedding pass onto one core (partitioning.widen is a
    no-op for already-wide inputs)."""
    from etl_processes_spark.partitioning import widen

    return widen(df).withColumn("__vec", vectorise_udf(vector_size)(F.col(c).cast("string")))


# ---------------------------------------------------------------------------
# distributed moments + covariance (never collects raw vectors)
# ---------------------------------------------------------------------------


def _medians(
    vec_df: DataFrame,
    d: int,
    n: int,
    mn: np.ndarray,
    mx: np.ndarray,
    bins: int = 1024,
    per_dim_cap: int = 16384,
    max_levels: int = 6,
    merge_partitions: int = 8,
) -> np.ndarray:
    """Per-dimension EXACT medians by histogram-bracketed distributed
    selection — the 100 TB path (round-11 verdict ask #2). The previous
    route (posexplode + groupBy(dim).median) exploded every vector into d
    rows and sort-aggregated them: n·d shuffled rows, 27.2 GB spill at
    sf100 (5 M docs × 128 dims = 640 M rows), linear in corpus size. This
    version never explodes and never shuffles anything proportional to n —
    it re-scans the already-persisted ``__vec`` column with Arrow kernels:

    1. HISTOGRAM pass: each partition bins its values per dim over the
       global [mn, mx] range into one d·bins int64 array (a single
       np.bincount per Arrow batch); partials merge through one
       ``merge_partitions``-way stage, so the driver receives O(d·bins),
       never O(n). Cumulative counts locate, per dim, the bin(s) holding
       the two flank ranks floor/ceil((n-1)/2) and the EXACT count of
       values below them — exact because the bin index
       clip(floor((x-lo)·inv)) is weakly monotone in x under IEEE
       rounding (subtraction of a constant, multiplication by a positive
       constant, and floor each preserve order), so every value in a
       lower bin sorts ≤ every value in the target bin.
    2. REFINE (only when a dim's bracket still holds > per_dim_cap
       values, i.e. n ≳ bins·per_dim_cap ≈ 16 M rows): re-histogram
       inside the bracket. Bracket membership is the CHAIN of bin-index
       predicates from prior levels (recomputed per batch), never a float
       range filter — the chain is deterministic, so below-counts stay
       exact across levels. Dims that stop shrinking (point masses) or
       whose bracket width degenerates go terminal instead of looping.
    3. COLLECT pass: bracketed values come back as per-partition
       (value, count) uniques — a point-mass dim collapses to one pair,
       so a half-constant dim cannot blow up the driver — and the driver
       selects the two flank ranks per dim and interpolates with Spark
       Percentile's exact ``lower*(1-f) + higher*f`` expression.

    Constant dims (mn == mx) resolve immediately. The result is
    BIT-IDENTICAL to F.median over the posexploded rows (pinned by
    test_text_embedding.py::test_medians_matches_spark_median, including
    point masses, negatives, and odd/even n)."""
    if n <= 0:
        return np.full(d, np.nan)
    import math

    mn = np.asarray(mn, dtype=np.float64)
    mx = np.asarray(mx, dtype=np.float64)
    k = (n - 1) * 0.5
    r_lo, r_hi, frac = math.floor(k), math.ceil(k), (n - 1) * 0.5 - math.floor(k)

    med = np.where(mx == mn, mn, np.nan)
    const = mx == mn
    terminal = const.copy()  # const dims never enter the selection
    cnt_below = np.zeros(d, dtype=np.int64)
    cnt_in = np.full(d, n, dtype=np.int64)
    cur_lo, cur_hi = mn.copy(), mx.copy()
    offsets = np.arange(d, dtype=np.int64) * bins

    # each level: (lo, inv, t0, t1) arrays of shape (d,). A value x is in
    # dim j's bracket iff clip(floor((x-lo_j)·inv_j), 0, bins-1) ∈
    # [t0_j, t1_j] at EVERY level. inv=0 ⇒ idx=0 for every finite x, so
    # (t0=0, t1=bins-1) is a vacuous pass-through for dims not refined at
    # that level and (t0=1, t1=0) an always-empty exclusion for const dims.
    levels: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []

    def _bin_idx(X: np.ndarray, lo: np.ndarray, inv: np.ndarray) -> np.ndarray:
        return np.clip(
            np.floor((X - lo[None, :]) * inv[None, :]), 0, bins - 1
        ).astype(np.int64)

    def _mask(X: np.ndarray, lvls) -> np.ndarray:
        m = np.ones(X.shape, dtype=bool)
        for lo, inv, t0, t1 in lvls:
            idx = _bin_idx(X, lo, inv)
            m &= (idx >= t0[None, :]) & (idx <= t1[None, :])
        return m

    hist_schema = T.StructType([T.StructField("h", T.ArrayType(T.LongType()))])

    def _histogram(lvls, lo_k, inv_k) -> np.ndarray:
        def part(batches):
            H = np.zeros(d * bins, dtype=np.int64)
            seen = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
                m = _mask(X, lvls)
                flat = (_bin_idx(X, lo_k, inv_k) + offsets[None, :])[m]
                if flat.size:
                    H += np.bincount(flat, minlength=d * bins)
                seen = True
            if seen:
                yield pd.DataFrame({"h": [H.tolist()]})

        def merge(batches):
            acc = None
            for pdf in batches:
                for h in pdf["h"]:
                    v = np.asarray(h, dtype=np.int64)
                    acc = v if acc is None else acc + v
            if acc is not None:
                yield pd.DataFrame({"h": [acc.tolist()]})

        partial = vec_df.select("__vec").mapInPandas(part, schema=hist_schema)
        merged = partial.repartition(merge_partitions).mapInPandas(
            merge, schema=hist_schema
        )
        rows = merged.toPandas()
        if rows.empty:
            return np.zeros((d, bins), dtype=np.int64)
        return np.sum(
            np.stack([np.asarray(h, dtype=np.int64) for h in rows["h"]]), axis=0
        ).reshape(d, bins)

    while len(levels) < max_levels:
        refining = np.nonzero(~terminal & (cnt_in > per_dim_cap))[0]
        if refining.size:
            width = cur_hi - cur_lo
            with np.errstate(divide="ignore"):
                inv_all = bins / width
            bad = ~np.isfinite(inv_all[refining]) | (width[refining] <= 0)
            terminal[refining[bad]] = True
            refining = refining[~bad]
        if refining.size == 0:
            break
        lo_k = cur_lo.copy()
        inv_k = np.zeros(d)
        inv_k[refining] = inv_all[refining]
        H = _histogram(levels, lo_k, inv_k)
        t0 = np.zeros(d, dtype=np.int64)
        t1 = np.full(d, bins - 1, dtype=np.int64)
        if not levels:  # level 0 also excludes the constant dims
            t0[const], t1[const] = 1, 0
        for j in refining:
            cum = np.cumsum(H[j])
            b0 = int(np.searchsorted(cum, (r_lo - cnt_below[j]) + 1))
            b1 = int(np.searchsorted(cum, (r_hi - cnt_below[j]) + 1))
            below_add = int(cum[b0 - 1]) if b0 > 0 else 0
            new_cnt = int(cum[b1]) - below_add
            if new_cnt >= cnt_in[j]:  # point mass: no shrink possible
                terminal[j] = True
            t0[j], t1[j] = b0, b1
            cnt_below[j] += below_add
            cnt_in[j] = new_cnt
            w = width[j] / bins
            cur_lo[j] = lo_k[j] + b0 * w
            cur_hi[j] = lo_k[j] + (b1 + 1) * w
        levels.append((lo_k, inv_k, t0, t1))
    if not levels and const.any():
        # no histogram ran (tiny n) but const dims still need excluding
        t0 = np.zeros(d, dtype=np.int64)
        t1 = np.full(d, bins - 1, dtype=np.int64)
        t0[const], t1[const] = 1, 0
        levels.append((mn.copy(), np.zeros(d), t0, t1))

    coll_schema = T.StructType(
        [
            T.StructField("dim", T.IntegerType()),
            T.StructField("u", T.ArrayType(T.DoubleType())),
            T.StructField("c", T.ArrayType(T.LongType())),
        ]
    )

    def coll(batches):
        per_dim: dict[int, list[np.ndarray]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            m = _mask(X, levels)
            for j in np.nonzero(m.any(axis=0))[0]:
                per_dim.setdefault(int(j), []).append(X[m[:, j], j])
        rows: dict[str, list] = {"dim": [], "u": [], "c": []}
        for j, chunks in per_dim.items():
            u, c = np.unique(np.concatenate(chunks), return_counts=True)
            rows["dim"].append(j)
            rows["u"].append(u.tolist())
            rows["c"].append(c.tolist())
        if rows["dim"]:
            yield pd.DataFrame(rows)

    collected = vec_df.select("__vec").mapInPandas(coll, schema=coll_schema).toPandas()
    merged_counts: dict[int, dict[float, int]] = {}
    for _, row in collected.iterrows():
        acc = merged_counts.setdefault(int(row["dim"]), {})
        for u, c in zip(row["u"], row["c"]):
            acc[float(u)] = acc.get(float(u), 0) + int(c)
    for j in np.nonzero(~const)[0]:
        items = sorted(merged_counts.get(int(j), {}).items())
        total = sum(c for _, c in items)
        if total != cnt_in[j]:  # exactness invariant — never silently wrong
            raise AssertionError(
                f"median selection dim {j}: bracket count {total} != "
                f"histogram count {int(cnt_in[j])}"
            )
        cum = 0
        l_lo, l_hi = r_lo - int(cnt_below[j]), r_hi - int(cnt_below[j])
        v_lo = v_hi = None
        for v, c in items:
            if v_lo is None and cum + c > l_lo:
                v_lo = v
            if cum + c > l_hi:
                v_hi = v
                break
            cum += c
        # lower*(1-f) + higher*f: Spark Percentile's exact IEEE expression
        med[j] = v_lo * (1.0 - frac) + v_hi * frac
    return med


_POWERSUM_FIELDS = ("s1", "s2", "s3", "s4", "gram", "mn", "mx")


def _powersums_and_gram(vec_df: DataFrame, d: int, merge_partitions: int = 8):
    """One pass, Arrow-batched end to end: per partition the vectors are
    stacked into an (n_i, d) matrix and reduced to [n, Σx, Σx², Σx³, Σx⁴,
    XᵀX, min, max] — matrix ops, no per-row Python and no RDD/Row
    deserialization (this replaces an .rdd.mapPartitions + treeReduce that
    paid a Python Row loop per vector). Partition partials are then merged
    through ONE repartition(merge_partitions) Arrow stage, so the driver
    receives at most merge_partitions accumulators (O(d²) each) regardless
    of input partition count — the same ingress bound treeReduce gave
    (collect() of raw partials would ship ~1 GB at 2000 partitions, d=256).
    Per-dim min/max ride along for free (two O(d) reductions on an already
    stacked matrix) — they seed _medians' histogram brackets, so the
    median selection needs no extra range-discovery pass."""
    _SUM = ("s1", "s2", "s3", "s4", "gram")
    schema = T.StructType(
        [T.StructField("n", T.LongType())]
        + [T.StructField(f, T.ArrayType(T.DoubleType())) for f in _POWERSUM_FIELDS]
    )

    def _acc_frame(n, s1, s2, s3, s4, gram, mn, mx):
        return pd.DataFrame(
            {
                "n": [n],
                "s1": [s1.tolist()],
                "s2": [s2.tolist()],
                "s3": [s3.tolist()],
                "s4": [s4.tolist()],
                "gram": [np.asarray(gram).ravel().tolist()],
                "mn": [mn.tolist()],
                "mx": [mx.tolist()],
            }
        )

    def part(batches):
        n = 0
        s1 = np.zeros(d)
        s2 = np.zeros(d)
        s3 = np.zeros(d)
        s4 = np.zeros(d)
        gram = np.zeros((d, d))
        mn = np.full(d, np.inf)
        mx = np.full(d, -np.inf)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            X2 = X * X
            n += X.shape[0]
            s1 += X.sum(axis=0)
            s2 += X2.sum(axis=0)
            s3 += (X2 * X).sum(axis=0)
            s4 += (X2 * X2).sum(axis=0)
            gram += X.T @ X
            np.minimum(mn, X.min(axis=0), out=mn)
            np.maximum(mx, X.max(axis=0), out=mx)
        if n:
            yield _acc_frame(n, s1, s2, s3, s4, gram, mn, mx)

    def merge(batches):
        n = 0
        acc: dict[str, np.ndarray] | None = None
        for pdf in batches:
            for _, row in pdf.iterrows():
                n += int(row["n"])
                vals = {
                    f: np.asarray(row[f], dtype=np.float64)
                    for f in _POWERSUM_FIELDS
                }
                if acc is None:
                    acc = vals
                else:
                    for f in _SUM:
                        acc[f] = acc[f] + vals[f]
                    acc["mn"] = np.minimum(acc["mn"], vals["mn"])
                    acc["mx"] = np.maximum(acc["mx"], vals["mx"])
        if acc is not None:
            yield _acc_frame(n, *(acc[f] for f in _POWERSUM_FIELDS))

    partial = vec_df.select("__vec").mapInPandas(part, schema=schema)
    merged = partial.repartition(merge_partitions).mapInPandas(merge, schema=schema)
    rows = merged.toPandas()
    if rows.empty:
        return None
    n = int(rows["n"].sum())
    s1, s2, s3, s4, gram_flat = (
        np.sum(np.stack(rows[f].to_numpy()), axis=0) for f in _SUM
    )
    mn = np.min(np.stack(rows["mn"].to_numpy()), axis=0)
    mx = np.max(np.stack(rows["mx"].to_numpy()), axis=0)
    return n, s1, s2, s3, s4, gram_flat.reshape(d, d), mn, mx


def _moments_from_powersums(n, s1, s2, s3, s4) -> np.ndarray:
    """Population mean/std/skew/kurt per dimension from raw power sums
    (same g1/g2 definitions as scipy bias=True/fisher=True)."""
    m = s1 / n
    m2 = np.maximum(s2 / n - m**2, 0.0)
    m3 = s3 / n - 3 * m * (s2 / n) + 2 * m**3
    m4 = s4 / n - 4 * m * (s3 / n) + 6 * m**2 * (s2 / n) - 3 * m**4
    with np.errstate(divide="ignore", invalid="ignore"):
        skew = np.where(m2 > 0, m3 / np.sqrt(m2) ** 3, 0.0)
        kurt = np.where(m2 > 0, m4 / m2**2 - 3, 0.0)
    return m, np.sqrt(m2), skew, kurt


def text_profile(
    df: DataFrame,
    c: str,
    vector_size: int = VECTOR_SIZE,
    build_vocab_limit: int = 100000,
    compute_medians: bool = True,
    build_vocab: bool = True,
) -> dict | None:
    """calculate_text_statistics (Latanova_v1.py:194-226) — same stats_dict
    keys, but vectorised_data/raw_entries are NOT retained (scale; the
    bootstrap/knn paths keep only the bounded vocabulary).

    ``compute_medians=False`` / ``build_vocab=False`` skip those Spark jobs
    for callers that only need the moment stats (validation re-embedding
    compares mean/std/skew/kurt only, Latanova_v1.py:433-446)."""
    base = df.filter(F.col(c).isNotNull())
    if build_vocab:
        # base feeds BOTH the embedding pass and the vocabulary build —
        # persist so the source scan+filter runs once, not twice (profile
        # inputs are bounded samples by contract, so caching text is safe)
        base = base.persist()
    vec_df = embed_entries(base, c, vector_size).persist()
    try:
        d = MAX_TOKENS_PER_ENTRY * vector_size
        sums = _powersums_and_gram(vec_df, d)
        if sums is None:
            return None
        n, s1, s2, s3, s4, gram, mn, mx = sums
        mean_vec, std_vec, skew_vec, kurt_vec = _moments_from_powersums(n, s1, s2, s3, s4)
        cov = (
            (gram - n * np.outer(mean_vec, mean_vec)) / (n - 1)
            if n > 1
            else np.zeros((d, d))
        )
        medians = _medians(vec_df, d, n, mn, mx) if compute_medians else None
        # Vocabulary for k-NN decode: distinct tokens of the profiled text.
        vocab: list[str] = []
        if build_vocab:
            vocab_rows = (
                base.select(F.explode(tokenize_expr(c)).alias("token"))
                .groupBy("token")
                .count()
                .orderBy(F.desc("count"), F.asc("token"))
                .limit(build_vocab_limit)
                .collect()
            )
            vocab = [r["token"] for r in vocab_rows]
        return {
            "overall_mean": float(np.mean(mean_vec)),
            "overall_std": float(np.mean(std_vec)),
            "std_of_means": float(np.std(mean_vec)),
            "mean_of_medians": float(np.mean(medians)) if medians is not None else None,
            "asymmetry_avg": float(np.mean(skew_vec)),
            "excess_avg": float(np.mean(kurt_vec)),
            "vector_dim": d,
            "mean_vector": mean_vec,
            "cov_matrix": cov,
            "cov_diagonal": np.diag(cov),
            "cov_trace": float(np.trace(cov)),
            "cov_det": float(np.linalg.det(cov + np.eye(d) * 1e-6)),
            "n_samples": int(n),
            "vocab": vocab,
            "vector_size": vector_size,
        }
    finally:
        vec_df.unpersist()
        if build_vocab:
            base.unpersist()


# ---------------------------------------------------------------------------
# k-NN decode + MVN generation
# ---------------------------------------------------------------------------


_BM_TABLES: tuple[np.ndarray, np.ndarray] | None = None


def _box_muller_tables() -> tuple[np.ndarray, np.ndarray]:
    """The Box-Muller factors only ever see u = (k + 0.5)/65536 for the
    65536 possible 16-bit digest slices, so both factors are precomputed
    once with the SAME scalar libm calls the per-value path used —
    table lookup + one IEEE multiply is bit-identical to computing each z
    inline, which is what keeps the DuckDB twin's replay exact."""
    global _BM_TABLES
    if _BM_TABLES is None:
        import math

        r = np.empty(65536)
        c = np.empty(65536)
        for k in range(65536):
            u = (k + 0.5) / 65536.0
            r[k] = math.sqrt(-2.0 * math.log(u))
            c[k] = math.cos(2.0 * math.pi * u)
        _BM_TABLES = (r, c)
    return _BM_TABLES


def mvn_z_matrix(seed: int, ids, d: int) -> np.ndarray:
    """(len(ids), d) standard normals via Box-Muller over md5 digest slices,
    keyed by (seed, row id, dim) — the same cross-engine primitive as
    token_vector, so DuckDB reproduces every draw bit-identically:

        block b of row r: h1 = md5("{seed}:mvn:{r}:{b}"), h2 = md5(same + 0x01)
        dim j in block:   u = (int(hex[4j:4j+4], 16) + 0.5) / 65536
                          z = sqrt(-2 ln u1) * cos(2 pi u2)

    Each md5 yields eight 16-bit slices, so a d-dim row costs 2*ceil(d/8)
    hashes. Values depend ONLY on (seed, id, dim): reproducible under any
    partitioning. Hex slice [4j:4j+4] == big-endian uint16 j of the raw
    digest, so the digests are concatenated per batch and decoded in one
    ``np.frombuffer`` pass; the transcendentals come from the precomputed
    scalar-math tables (bit parity per _box_muller_tables). ~20x faster
    than the per-dim Python loop this replaced, same bits out."""
    ids = np.asarray(ids)
    n = len(ids)
    n_blocks = (d + 7) // 8
    r_tab, c_tab = _box_muller_tables()
    md5 = hashlib.md5
    pre = f"{seed}:mvn:".encode("utf-8")
    d1 = bytearray()
    d2 = bytearray()
    blk_suffix = [f":{b}".encode("utf-8") for b in range(n_blocks)]
    for rid in ids:
        base = pre + str(int(rid)).encode("utf-8")
        for suf in blk_suffix:
            key = base + suf
            d1 += md5(key).digest()
            d2 += md5(key + b"\x01").digest()
    k1 = np.frombuffer(bytes(d1), dtype=">u2").reshape(n, n_blocks * 8)[:, :d]
    k2 = np.frombuffer(bytes(d2), dtype=">u2").reshape(n, n_blocks * 8)[:, :d]
    return r_tab[k1] * c_tab[k2]


def _vocab_matrix(vocab: list[str], vector_size: int) -> np.ndarray:
    """All vocabulary token vectors in one batched pass: token_vector's
    Box-Muller factors come from the same (k+0.5)/65536 digest-slice domain
    as mvn_z_matrix, so the precomputed scalar-math tables apply — one
    ``np.frombuffer`` over concatenated digests + two table lookups,
    bit-identical to per-token token_vector (pinned by tests), ~20× faster
    for large vocabularies."""
    if not vocab:
        return np.zeros((0, vector_size))
    if vector_size > 8:
        raise ValueError("vector_size > 8 exceeds the 128-bit md5 slice budget")
    r_tab, c_tab = _box_muller_tables()
    md5 = hashlib.md5
    d1 = b"".join(md5(t.encode("utf-8")).digest() for t in vocab)
    d2 = b"".join(md5((t + "\x01").encode("utf-8")).digest() for t in vocab)
    k1 = np.frombuffer(d1, dtype=">u2").reshape(len(vocab), 8)[:, :vector_size]
    k2 = np.frombuffer(d2, dtype=">u2").reshape(len(vocab), 8)[:, :vector_size]
    return r_tab[k1] * c_tab[k2]


_KNN_CHUNK_CELLS = 32_000_000  # ≤ ~256 MB similarity block per step


def knn_decode(
    vectors: np.ndarray, vocab: list[str], vocab_mat: np.ndarray, topn: int = 3
) -> list[str]:
    """similar_by_vector(topn=3) then first alphanumeric word
    (Latanova_v1.py:338-342): cosine similarity against the vocabulary.

    Memory-bounded: the (n_vectors × |vocab|) similarity matrix is never
    materialized whole — slot rows are processed in chunks sized so each
    block stays ≤ ~256 MB (a 100k-token vocabulary against a 10k-row Arrow
    batch would otherwise allocate hundreds of GB). Results are identical
    to the single-block computation (same dot products, same selection)."""
    if len(vocab) == 0:
        return ["" for _ in range(len(vectors))]
    norms = np.linalg.norm(vocab_mat, axis=1)
    norms[norms == 0] = 1.0
    vnorm = np.linalg.norm(vectors, axis=1)
    vnorm[vnorm == 0] = 1.0
    k = min(topn, len(vocab))
    out: list[str] = []
    chunk = max(1, _KNN_CHUNK_CELLS // max(1, len(vocab)))
    for lo in range(0, len(vectors), chunk):
        hi = min(lo + chunk, len(vectors))
        sims = (vectors[lo:hi] @ vocab_mat.T) / (
            vnorm[lo:hi, None] * norms[None, :]
        )
        for row in sims:
            idx = np.argpartition(-row, k - 1)[:k]
            idx = idx[np.argsort(-row[idx])]
            word = ""
            for j in idx:
                if vocab[j].isalnum():
                    word = vocab[j]
                    break
            out.append(word)
    return out


# Model broadcasts (Cholesky + vocab matrix, tens of MB for large vocabs)
# are cached by content fingerprint with unpersist-on-evict: a long-lived
# session calling generate() repeatedly reuses one broadcast per distinct
# model instead of leaking one per call (Spark broadcasts are only
# reclaimed when the Python handle is GC'd, which the task closure pins).
# Eviction uses unpersist (drops executor copies, re-ships on demand), not
# destroy — a lazily-built DataFrame may still reference an evicted model.
_MODEL_BCAST: "dict[tuple, object]" = {}
_MODEL_BCAST_MAX = 4


def _model_broadcast(spark, payload):
    chol, fallback, mu, vocab, vocab_mat = payload
    key = (
        None if chol is None else hash(chol.tobytes()),
        fallback,
        hash(mu.tobytes()),
        hash(tuple(vocab)),
    )
    b = _MODEL_BCAST.get(key)
    if b is None:
        while len(_MODEL_BCAST) >= _MODEL_BCAST_MAX:
            _, old = _MODEL_BCAST.popitem()
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass
        b = spark.sparkContext.broadcast(payload)
        _MODEL_BCAST[key] = b
    return b


def gen_text_column(
    spark: SparkSession,
    frame: DataFrame,
    out_col: str,
    prof: ColumnProfile,
    seed: int,
) -> DataFrame:
    """generate_synthetic_text (Latanova_v1.py:300-344): sample
    x ~ N(mu, C + 1e-6·I) per row, decode each of the 32 token slots to its
    nearest alphanumeric vocabulary word, space-join.

    Spark shape: Cholesky L of the d×d covariance is computed ONCE on the
    driver and broadcast with the vocabulary matrix. Each Arrow batch draws
    its whole Z block from md5 Box-Muller normals keyed (seed, row id, dim)
    (mvn_z_matrix — deterministic under any partitioning AND reproducible in
    DuckDB, which is what hash-gates this path), applies ONE
    (batch×d)@(d×d) GEMM for x = mu + Z Lᵀ, and decodes all batch·32 slots
    in ONE vectorised cosine k-NN call — no per-row Python RNG or matvec.
    Falls back to iid N(overall_mean, overall_std) when Cholesky fails
    (:327-332), drawing from the same Z block."""
    s = prof.stats
    d = int(s["vector_dim"])
    vector_size = int(s.get("vector_size", VECTOR_SIZE))
    vocab = list(s.get("vocab") or [])
    # Quantize the model parameters (and below, the generated x) to 9dp:
    # profile moments computed by different engines/summation orders agree
    # to ~1e-13, so after quantization they are bit-identical — which makes
    # generation a pure function of the quantized stats (Cholesky of an
    # ill-conditioned cov would otherwise amplify 1e-13 input noise into
    # visibly different draws). 1e-9 is far below statistical noise.
    mu = np.round(np.asarray(s["mean_vector"], dtype=float), 9)
    cov = np.round(np.asarray(s["cov_matrix"], dtype=float), 9) + np.eye(d) * 1e-6
    try:
        chol = np.linalg.cholesky(cov)
        fallback = None
    except np.linalg.LinAlgError:
        chol = None
        fallback = (float(s["overall_mean"]), float(s["overall_std"]))
    vocab_mat = _vocab_matrix(vocab, vector_size)
    b = _model_broadcast(spark, (chol, fallback, mu, vocab, vocab_mat))

    if "id" not in frame.columns:
        raise ValueError("gen_text_column expects the spark.range seed frame with an 'id' column")
    out_schema = T.StructType(
        [f for f in frame.schema.fields] + [T.StructField(out_col, T.StringType())]
    )

    def gen(batches):
        chol_, fb, mu_, vocab_, vmat = b.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            n = len(ids)
            if n == 0:
                yield pdf.assign(**{out_col: pd.Series([], dtype=str)})
                continue
            Z = mvn_z_matrix(seed, ids, len(mu_))
            if chol_ is not None:
                X = mu_[None, :] + Z @ chol_.T  # one GEMM per batch
            else:
                X = fb[0] + fb[1] * Z
            X = np.round(X, 9)  # quantized x: engine-independent decode input
            slots = X.reshape(n * MAX_TOKENS_PER_ENTRY, vector_size)
            words = knn_decode(slots, vocab_, vmat, topn=3)  # one batched k-NN
            texts = [
                " ".join(
                    w
                    for w in words[r * MAX_TOKENS_PER_ENTRY : (r + 1) * MAX_TOKENS_PER_ENTRY]
                    if w
                ).strip()
                for r in range(n)
            ]
            pdf = pdf.copy()
            pdf[out_col] = texts
            yield pdf

    return frame.mapInPandas(gen, schema=out_schema)
