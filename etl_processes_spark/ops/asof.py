"""As-of (nearest-timestamp) join — the classic time-series/feature-pipeline
operator (no reference counterpart; driver-mandated extension family).

``asof_join(left, right, on, ...)`` attaches to each left row the right row
with the greatest timestamp <= left's timestamp (direction="backward", the
default; "forward" takes the smallest timestamp >= left's) within the same
key group.

Scale shape: NOT a range join (which explodes to |left|x|right| candidates
per key) and NOT a per-row subquery. Both sides are unioned into one frame,
shuffled ONCE on the join key, and a single window pass per key —
last(value, ignorenulls) over rows between unbounded preceding and current —
carries the most recent right-side values forward onto left rows. Cost is
one shuffle + one sort per key group, the same plan a sort-merge join pays,
with no candidate blow-up regardless of key skew in time. Equal timestamps:
the right row sorts before the left row, so matches are inclusive
(l.ts >= r.ts), matching DuckDB's ASOF JOIN semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_processes_spark.timeutil import epoch_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_r",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join. Right columns (except keys/timestamp) are appended
    with ``suffix``; the matched right timestamp arrives as ``<right_ts><suffix>``
    (epoch micros, long). Unmatched left rows keep nulls (left-join
    semantics). ``tolerance_us`` nulls out matches farther than the given
    microsecond gap."""
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    val_cols = [c for c in right.columns if c not in keys and c != right_ts]
    r_names = {c: f"{c}{suffix}" for c in val_cols}
    ts_out = f"{right_ts}{suffix}"

    # micros as long: exact, engine-independent arithmetic (timestamp→double
    # loses low bits at 2024-era epochs); epoch_micros is NTZ-tolerant
    r = right.select(
        *[F.col(k) for k in keys],
        epoch_micros(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        epoch_micros(right_ts).alias(ts_out),
        *[F.col(c).alias(r_names[c]) for c in val_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        epoch_micros(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias(ts_out),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(r_names[c]) for c in val_cols],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    u = r.unionByName(l)

    # All right-side columns travel as ONE struct (null on left rows), and
    # last(struct, ignorenulls) carries the single matched row forward —
    # never a chimera of columns from different right rows (a per-column
    # last(col, ignorenulls) would backfill a NULL value column from an
    # OLDER right row). The struct is also the tiebreaker: equal-(key, ts)
    # right rows resolve to one total struct order — deterministic under
    # any partitioning.
    payload = F.when(
        F.col("__side") == 0,
        F.struct(F.col(ts_out), *[F.col(r_names[c]) for c in val_cols]),
    ).alias("__payload")
    u = u.select("*", payload)
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__payload").asc_nulls_first()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__payload").asc_nulls_first()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched = F.last("__payload", ignorenulls=True).over(w)
    carried = [matched.getField(ts_out).alias(ts_out)] + [
        matched.getField(r_names[c]).alias(r_names[c]) for c in val_cols
    ]
    out = (
        u.select(*keys, "__ts", "__side", *[f"__l_{c}" for c in left.columns], *carried)
        .filter(F.col("__side") == 1)
    )
    if tolerance_us is not None:
        gap = F.abs(F.col("__ts") - F.col(ts_out))
        for c in [ts_out] + [r_names[c] for c in val_cols]:
            out = out.withColumn(c, F.when(gap <= tolerance_us, F.col(c)))
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        ts_out,
        *[r_names[c] for c in val_cols],
    )
