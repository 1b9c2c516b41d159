"""Bucketized range (interval) join — join points to [lo, hi) bands without
a nested-loop plan (no reference counterpart; extension-family operator).

Spark has no native interval-join physical operator: a raw
``points JOIN bands ON v >= lo AND v < hi`` plans as
BroadcastNestedLoopJoin — O(|points| x |bands|) compares, a scale killer
when the band table stops being tiny. The classic fix: chunk the value
domain into buckets of width ``granularity``; each band explodes to the
buckets it overlaps, each point computes its single bucket, and the join
becomes an EQUI-join on bucket id (hash-partitioned, AQE-eligible) with a
residual ``lo <= v < hi`` filter. Cost: |bands| x (span/granularity) extra
band rows — pick granularity near the typical band width so the blow-up is
~1-2x. Overlapping bands are fine (a point matches every covering band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A single band wider than this many buckets explodes to that many join
# rows — almost always a mis-chosen granularity, not a real workload.
MAX_BUCKETS_PER_BAND = 1_000_000


def range_join_bucketized(
    points: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    granularity: float = 1.0,
    max_buckets_per_band: int = MAX_BUCKETS_PER_BAND,
) -> DataFrame:
    """Inner interval join: every (point, band) pair with
    lo <= point.value < hi. Output = point columns + band columns.

    Raises ValueError on granularity <= 0 (would yield NaN/garbage bucket
    ids and a silently wrong join). A band spanning more than
    ``max_buckets_per_band`` buckets fails the job with raise_error rather
    than exploding to millions of rows unnoticed."""
    g = float(granularity)
    if not g > 0:
        raise ValueError(f"granularity must be > 0, got {granularity}")
    lo_b = F.floor(F.col(lo_col) / g).cast("long")
    hi_b = F.floor(F.col(hi_col) / g).cast("long")
    # guarded upper bound: a band wider than the cap fails loudly instead of
    # exploding; the when-branch only evaluates raise_error on offenders
    hi_guarded = F.when(
        hi_b - lo_b >= int(max_buckets_per_band),
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join_bucketized: band spans >= "
                    f"{int(max_buckets_per_band)} buckets at granularity {g} — "
                    f"raise granularity or max_buckets_per_band (band ["
                ),
                F.col(lo_col).cast("string"), F.lit(", "),
                F.col(hi_col).cast("string"), F.lit("))"),
            )
        ).cast("long"),
    ).otherwise(hi_b)
    # inverted/empty band (hi < lo): zero matches by definition — emit an
    # empty bucket list (explode drops the row) instead of letting
    # sequence(start > stop) generate a DESCENDING run of junk buckets that
    # bypasses the width guard (hi_b - lo_b is negative there)
    buckets = F.when(hi_b >= lo_b, F.sequence(lo_b, hi_guarded)).otherwise(
        F.array().cast("array<long>")
    )
    b = bands.withColumn("__bucket", F.explode(buckets))
    p = points.withColumn("__bucket", F.floor(F.col(value_col) / g).cast("long"))
    v = F.col(value_col)
    return (
        p.join(b, "__bucket")
        .filter((v >= F.col(lo_col)) & (v < F.col(hi_col)))
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lo_left: str,
    hi_left: str,
    lo_right: str,
    hi_right: str,
    granularity: float = 1.0,
    max_buckets_per_band: int = MAX_BUCKETS_PER_BAND,
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair whose
    half-open intervals intersect (lo_l < hi_r AND lo_r < hi_l). The
    interval twin of ``range_join_bucketized`` — sessions × outages,
    ad slots × content windows, read alignments × genome features.

    Same bucketization, plus the CANONICAL-BUCKET trick: a pair whose
    intervals share k buckets would match k times on the bucket equi-join;
    instead of a distinct() (a full shuffle of the matched pairs), each
    pair is kept only in bucket floor(max(lo_l, lo_r)/g) — the first bucket
    both intervals cover — so every pair survives exactly once by
    construction. Column names must be disjoint across the two frames
    (alias/rename before calling, as with any natural Spark join)."""
    g = float(granularity)
    if not g > 0:
        raise ValueError(f"granularity must be > 0, got {granularity}")

    def bucketed(df: DataFrame, lo: str, hi: str) -> DataFrame:
        lo_b = F.floor(F.col(lo) / g).cast("long")
        hi_b = F.floor(F.col(hi) / g).cast("long")
        hi_guarded = F.when(
            hi_b - lo_b >= int(max_buckets_per_band),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_overlap_join: interval spans >= "
                        f"{int(max_buckets_per_band)} buckets at granularity {g} (["
                    ),
                    F.col(lo).cast("string"), F.lit(", "),
                    F.col(hi).cast("string"), F.lit("))"),
                )
            ).cast("long"),
        ).otherwise(hi_b)
        # empty/inverted interval -> no buckets (explode drops the row)
        buckets = F.when(
            (hi_b >= lo_b) & (F.col(hi) > F.col(lo)), F.sequence(lo_b, hi_guarded)
        ).otherwise(F.array().cast("array<long>"))
        return df.withColumn("__bucket", F.explode(buckets))

    l_b = bucketed(left, lo_left, hi_left)
    r_b = bucketed(right, lo_right, hi_right)
    overlap = (F.col(lo_left) < F.col(hi_right)) & (F.col(lo_right) < F.col(hi_left))
    canonical = F.col("__bucket") == F.floor(
        F.greatest(F.col(lo_left), F.col(lo_right)) / g
    ).cast("long")
    return l_b.join(r_b, "__bucket").filter(overlap & canonical).drop("__bucket")
