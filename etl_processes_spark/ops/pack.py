"""Training-data assembly operators: stratified sampling and token-budget
packing (no reference counterpart; extension family — the last mile of an
LLM data pipeline after dedup/filter/score).

Both are deterministic by construction (md5 ranking / cumulative sums over
an explicit order), so re-runs and engine changes produce identical
selections — the same property the certified sampling/generation paths rely
on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen uniformly by md5
    rank of (key, seed) — the balanced-sampling step (per language, per
    source, per quality bucket) of a training-data mix.

    Plan shape: one shuffle on the stratum key + per-partition sort;
    row_number stops at n so the sort is bounded per group (a windowed
    top-n, not a global sort). Deterministic: depends only on key values
    and seed, not partitioning."""
    rank = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy(strata_col).orderBy(rank, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def pack_documents(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    order_col: str | None = None,
) -> DataFrame:
    """Assign documents to contiguous bins of ~``budget`` tokens (sequence
    packing for fixed-context training). Greedy cumulative packing in
    ``order_col`` order (default: the id): a document goes to bin
    floor(tokens_before / budget), so every bin holds a contiguous run and
    only the document straddling a boundary can overflow its bin — the
    standard streaming-pack tradeoff (exact first-fit is inherently
    sequential; this is one window pass).

    Output: (id, bin_id, offset_in_bin, n_tokens). An oversized document
    (> budget) starts in whatever bin its cumulative position lands in and
    spills across the following bin indices (bin boundaries are cumulative,
    so subsequent documents continue after it — no bin is ever assigned
    twice out of order). One shuffle (the window sort); at scale, partition
    by a coarse split (date/shard) first and pack within partitions to keep
    the sort bounded."""
    order = order_col or id_col
    w = Window.orderBy(F.col(order), F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).alias("__before")
    out = df.select(
        F.col(id_col),
        F.col(tokens_col).alias("n_tokens"),
        before,
    )
    return out.select(
        id_col,
        F.floor(F.col("__before") / budget).cast("long").alias("bin_id"),
        (F.col("__before") % budget).cast("long").alias("offset_in_bin"),
        "n_tokens",
    )
