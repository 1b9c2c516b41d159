"""Input-width hygiene for CPU-heavy per-row projections.

Parquet splits at row-group granularity: a small file with one row group
arrives as ONE task no matter what ``spark.sql.files.maxPartitionBytes``
says, so an expensive projection (shingling, md5 hashing, embedding) runs
on a single core of the cluster. ``widen`` adds one tiny round-robin
shuffle to spread such inputs across the default parallelism — and is a
NO-OP when the input is already wide, which is the 100 TB case (thousands
of row groups), so the guard never adds a shuffle where the scan already
parallelizes.

Only operators whose downstream math is partition-independent (integer/md5
arithmetic, min/count aggregates, per-row expressions) call this before
their heavy stage; order-sensitive double summations keep their natural
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# Logical operators whose presence means the frame is (a) already wide —
# its partitioning comes from a shuffle sized by spark.sql.shuffle.partitions
# — and (b) unsafe to probe via df.rdd: finalizing an AQE plan to read the
# partition count would eagerly EXECUTE the upstream shuffle stages, which
# then re-run at the real action (no shuffle reuse across QueryExecutions).
_SHUFFLE_TOKENS = (
    "Join",
    "Aggregate",
    "Window",
    "Sort",
    "Repartition",
    "Deduplicate",
    "GlobalLimit",
)


def widen(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition to the cluster's default parallelism when the
    input is a narrow scan-shaped frame with at least ``min_factor``× fewer
    partitions; otherwise df unchanged. Frames downstream of a shuffle
    (join/agg/window/sort/limit in the optimized plan) are returned as-is:
    they are already shuffle-partitioned wide, and probing them via df.rdd
    would force AQE finalization (eager upstream execution). Costs one
    shuffle of the (small, by construction) input when it does apply."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return df
    if any(tok in plan for tok in _SHUFFLE_TOKENS):
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df
