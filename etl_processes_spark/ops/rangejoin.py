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


def range_join_bucketized(
    points: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    granularity: float = 1.0,
) -> DataFrame:
    """Inner interval join: every (point, band) pair with
    lo <= point.value < hi. Output = point columns + band columns."""
    g = float(granularity)
    b = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / g).cast("long"),
                F.floor(F.col(hi_col) / g).cast("long"),
            )
        ),
    )
    p = points.withColumn("__bucket", F.floor(F.col(value_col) / g).cast("long"))
    v = F.col(value_col)
    return (
        p.join(b, "__bucket")
        .filter((v >= F.col(lo_col)) & (v < F.col(hi_col)))
        .drop("__bucket")
    )
