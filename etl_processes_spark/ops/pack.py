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
    and seed, not partitioning — PROVIDED ``key_col`` is unique (the doc-id
    contract shared with the dedup family); rows duplicating a key value
    tie on both the md5 rank and the tiebreak, and a cutoff inside the tied
    group would select partition-order-dependently."""
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
    num_shards: int | None = None,
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
    twice out of order).

    Scale shape — two-phase prefix sum, no global single-partition sort:
    the frame is RANGE-partitioned on the pack order into ``num_shards``
    order-contiguous shards; phase 1 computes each row's shard-local
    cumulative sum (window partitioned BY SHARD — every shard sorts in
    parallel); phase 2 adds the total tokens of all earlier shards, a
    shard-indexed prefix computed from the tiny per-shard totals (one
    ``num_shards``-row aggregate, broadcast back). The result is the exact
    global cumulative sum. spark_partition_id() is safe as the shard key
    precisely because repartitionByRange makes shards order-contiguous and
    index-ordered: the global cumsum is invariant to WHERE the shard
    boundaries fall, so the output is deterministic even though the range
    sampler is not."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")  # / and % by 0 are null under non-ANSI
    order = order_col or id_col
    base = df.select(
        F.col(id_col),
        F.col(tokens_col).alias("n_tokens"),
        F.col(order).alias("__ord"),
    )
    if num_shards is None:
        try:
            num_shards = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):  # e.g. "auto" on managed platforms
            num_shards = df.sparkSession.sparkContext.defaultParallelism
    sh = base.repartitionByRange(num_shards, F.col("__ord"), F.col(id_col)).withColumn(
        "__shard", F.spark_partition_id()
    )
    # the shard ids come from a SAMPLING-based range partitioner: both plan
    # branches below (local cumsum + per-shard prefix) must observe the SAME
    # boundaries, which exchange-reuse usually — but not contractually —
    # guarantees. The lazy checkpoint makes it hold by construction.
    sh = sh.localCheckpoint(eager=False)
    w_local = (
        Window.partitionBy("__shard")
        .orderBy(F.col("__ord"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    local_before = F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    # per-shard totals → prefix of earlier shards (num_shards rows: the
    # single-partition window here is over the TINY aggregate, never the data)
    w_pref = Window.orderBy("__shard").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    prefix = (
        sh.groupBy("__shard")
        .agg(F.sum("n_tokens").alias("__tot"))
        .select(
            "__shard",
            F.coalesce(F.sum("__tot").over(w_pref), F.lit(0)).alias("__prefix"),
        )
    )
    out = sh.withColumn("__lb", local_before).join(F.broadcast(prefix), "__shard")
    before = F.col("__lb") + F.col("__prefix")
    return out.select(
        id_col,
        F.floor(before / budget).cast("long").alias("bin_id"),
        (before % budget).cast("long").alias("offset_in_bin"),
        "n_tokens",
    )
