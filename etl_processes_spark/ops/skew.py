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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Join types for which exploding the small side ×N and dropping the salt is
# result-identical to the plain join. right/full outer would KEEP all N
# copies of an unmatched small-side row — silently wrong.
_SALT_SAFE_JOINS = frozenset({"inner", "left", "left_outer", "leftouter", "cross"})


def _row_salt(n_buckets: int) -> Column:
    """Per-row salt in [0, n_buckets): xxhash64 of the row's physical
    position (partition id is encoded in monotonically_increasing_id).
    Position-based — NOT content-based — so fully duplicated rows (the most
    common hot-key shape: dup-heavy corpora, key-only projections) still
    spread across all buckets; hashing the row's columns would send every
    duplicate to ONE bucket, reproducing exactly the skew being mitigated.
    Salt values vary with physical layout, but they only steer load
    placement: join/aggregate RESULTS are salt-invariant by construction
    (pinned by tests)."""
    return F.abs(F.xxhash64(F.monotonically_increasing_id())) % n_buckets


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``key`` with the big side salted N ways.

    The big side gets a per-row salt (physical-position hash — see
    _row_salt); the small side is exploded ×N so every (key, salt) matches.
    Shuffle keys become (key, salt): the hottest key's rows spread over N
    tasks. Cost: small side duplicated N× — keep salt_buckets modest or the
    small side broadcastable. Join types where the exploded small side
    would surface as duplicated unmatched rows (right/full outer) are
    rejected."""
    if how.lower().replace("_", "") not in {j.replace("_", "") for j in _SALT_SAFE_JOINS}:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_JOINS)} joins; {how!r} would "
            "duplicate unmatched small-side rows x salt_buckets"
        )
    big_s = big.withColumn("__salt", _row_salt(salt_buckets))
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
    salted = df.withColumn("__salt", _row_salt(salt_buckets))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("count"))
