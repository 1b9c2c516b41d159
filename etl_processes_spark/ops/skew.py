"""Skew-mitigation utilities for 100 TB joins/aggregations.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these utilities cover the cases AQE can't re-plan:

 - ``salted_join``: explicit key-salting for a shuffle join where one key
   dominates (AQE splits partitions, but a single monster KEY still lands in
   one task per split boundary). Salts the big side N ways and explodes the
   small side N ways — classic, deterministic, works on any join type that
   reduces to inner/left on the salted key.
 - ``two_phase_count``: skew-proof groupBy for hot keys — partial aggregate
   on (key, salt) then re-aggregate on key, bounding any single task's input
   to ~1/N of the hottest key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``key`` with the big side salted N ways.

    The big side gets a deterministic per-row salt (xxhash64 of all columns,
    not rand() — reproducible plans); the small side is exploded ×N so every
    (key, salt) matches. Shuffle keys become (key, salt): the hottest key's
    rows spread over N tasks. Cost: small side duplicated N× — keep
    salt_buckets modest or the small side broadcastable."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salt_buckets).alias("__salt")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_count(df: DataFrame, key: str, salt_buckets: int = 32) -> DataFrame:
    """groupBy(key).count() that survives a single dominant key: partial
    count on (key, salt), final sum on key. (Spark's partial aggregation
    already does this map-side; the explicit salt guards reduce-side skew
    when upstream partitioning clusters the hot key.)"""
    salted = df.withColumn(
        "__salt", (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % salt_buckets)
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("count"))
