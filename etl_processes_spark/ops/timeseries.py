"""Time-series regularization: resample onto a fixed grid, then fill the
gaps (forward-fill / linear interpolation / constant) — the hypertable
``time_bucket_gapfill`` / pandas ``resample().interpolate()`` family.

Neither the reference (a single-shot batch profiler; SURVEY.md §2.12) nor
stock Spark has this: window functions only see rows that EXIST, so missing
buckets must be generated before any fill can run. The shape here follows
the engine's as-of join (ops/asof.py): generate the grid rows, UNION them
with the data rows, and resolve everything in ONE key-partitioned window
pass — no (key, bucket) equi-join, so the whole fill costs a single
shuffle on the series key after the resample aggregation.

At 100 TB: ``resample`` is one partial-agg'd groupBy((key, bucket)) — the
standard rollup shuffle; the grid explode is map-side from a per-key
(min, max) aggregate, and its row count is bounded by span/step per key,
independent of raw event count. Per-key window sorts are bounded by the
grid length. Determinism: bucket math is exact integer micros
(timeutil.epoch_micros — never double seconds), the resampled average uses
an exact DECIMAL sum (double summation order would differ across
partitionings AND engines), and the interpolation formula is the identical
IEEE-754 expression the DuckDB oracle evaluates, so gap-filled values are
bit-stable and hash-certifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_processes_spark.timeutil import epoch_micros

_US = 1_000_000


def time_bucket(ts: Column | str, step_seconds: int) -> Column:
    """Integer bucket ordinal: floor(epoch_us / step_us). Exact for any
    timestamp flavor (NTZ-safe via epoch_micros; the double division is
    exact for micro-precision epochs — quotients sit >> 1 ulp from integer
    boundaries except exactly ON a boundary, where the ratio is exact)."""
    return F.floor(epoch_micros(ts) / F.lit(step_seconds * _US)).cast("long")


def bucket_start(bucket: Column | str, step_seconds: int) -> Column:
    """Bucket ordinal back to its start timestamp."""
    b = F.col(bucket) if isinstance(bucket, str) else bucket
    return F.timestamp_micros(b * F.lit(step_seconds * _US))


def resample(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    step_seconds: int,
    ndigits: int = 6,
) -> DataFrame:
    """Downsample a (key, ts, value) series to per-bucket averages:
    (key, bucket, n_rows, value). ONE groupBy shuffle, partial-agg'd.

    The average is computed from an exact DECIMAL(18,6) sum (cast to double
    only once, then one correctly-rounded division), so the result is
    independent of partition/summation order — required both for AQE-replan
    stability and for the DuckDB twin to reproduce it bit-for-bit."""
    vdec = F.col(value).cast("decimal(18,6)")
    return (
        df.filter(F.col(ts).isNotNull() & F.col(value).isNotNull())
        .groupBy(F.col(key), time_bucket(ts, step_seconds).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(vdec).cast("double") / F.count(F.lit(1)), ndigits
            ).alias(value),
        )
    )


def gap_fill(
    df: DataFrame,
    key: str,
    bucket: str = "bucket",
    value: str = "value",
    method: str = "linear",
    fill_value: float = 0.0,
) -> DataFrame:
    """Fill missing buckets of a resampled series (every integer bucket in
    each key's [min, max] span gets a row) and impute their values:

    - ``linear``  — interpolate between the neighbouring present values
                    (v0 + (v1 - v0) * (b - b0)/(b1 - b0)); edge gaps fall
                    back to the nearest present value
    - ``ffill``   — carry the last present value forward
    - ``value``   — constant ``fill_value``
    - ``none``    — leave imputed rows NULL (gap *detection* only)

    Returns (key, bucket, value, filled) with filled=1 on generated rows.

    Plan: window ONLY the data rows (one key shuffle; per-key neighbour
    values via running frames), then ONE map-side sequence explode per data
    row emits the row itself PLUS its trailing gap's buckets, with each fill
    value computed inline from the two attached neighbours. The generated
    rows — which can dwarf the data (sparse series over a long span:
    measured 9.5M data rows → 105M output at sf10) — are never sorted,
    shuffled, or re-windowed; the grid-union shape this replaced dragged all
    of them through two window sorts (106 s → map-bound at sf10), and the
    present ∪ gaps two-branch union that followed it still executed the
    whole scan→resample→window subtree TWICE (Spark does not share subtrees
    across union branches — round 12, plan-verified: 2 scans/2 aggs/9
    Window nodes → 1 scan/1 agg/3 Window nodes). The span is [min, max] of
    each key's own data, so every gap is interior: both neighbours always
    exist."""
    if method not in ("linear", "ffill", "value", "none"):
        raise ValueError(f"unknown fill method {method!r}")
    b, v = F.col(bucket), F.col(value)
    data = df.select(
        F.col(key), b.cast("long").alias(bucket), v.cast("double").alias(value)
    )
    word = Window.partitionBy(key).orderBy(bucket)
    wprev = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # "next present value" is a DESCENDING running frame, not an ascending
    # (currentRow, unboundedFollowing) one: Spark re-evaluates an unbounded-
    # FOLLOWING frame from scratch per row — O(rows²) per key (measured 6s →
    # 0.9s at sf0.1) — while a running frame is incremental. Same partition
    # key, so it adds a second in-partition sort but no extra shuffle.
    wnext = (
        Window.partitionBy(key)
        .orderBy(F.desc(bucket))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per data row: nearest present value at-or-before / at-or-after it
    # (running frames include the current row, so a null-valued data row
    # correctly looks past itself) — NULL-valued data rows are themselves
    # imputed, exactly like generated rows
    pv, nv = F.col("__pv"), F.col("__nv")
    pb, nb = F.col("__pb"), F.col("__nb")
    # all four neighbour columns in ONE select (not stacked withColumn):
    # Catalyst extracts window expressions per Project, so four withColumn
    # calls instantiate four Window operators where one select yields two
    # (wprev and wnext share evaluation within their spec) — round 12
    neighbours = data.select(
        F.col(key),
        b,
        v.alias(value),
        F.last(value, ignorenulls=True).over(wprev).alias("__pv"),
        F.last(F.when(v.isNotNull(), b), ignorenulls=True).over(wprev).alias("__pb"),
        F.last(value, ignorenulls=True).over(wnext).alias("__nv"),
        F.last(F.when(v.isNotNull(), b), ignorenulls=True).over(wnext).alias("__nb"),
    )
    # the gap after this row interpolates between this row's trailing
    # neighbour (__pv/__pb — includes this row itself when present) and
    # the NEXT row's leading neighbour, attached here so the explode
    # below needs no further window or join. Second layer because lead()
    # consumes the first layer's outputs — one more Window node, same
    # shuffle (identical partitioning/ordering).
    rows = neighbours.select(
        "*",
        F.lead(bucket).over(word).alias("__gap_end"),
        F.lead("__nv").over(word).alias("__gnv"),
        F.lead("__nb").over(word).alias("__gnb"),
    )

    def _fill(g: Column, pv_: Column, pb_: Column, nv_: Column, nb_: Column) -> Column:
        if method == "linear":
            # NOT rounded: with deterministic inputs the chain of correctly-
            # rounded IEEE ops is bit-identical in any engine, while rounding
            # would hit exact decimal ties (dyadic gap ratios x fixed-dp
            # neighbours systematically produce ...5 at the rounding digit)
            # where Spark's HALF_UP-on-decimal-repr and other engines' float
            # rounding disagree
            interp = pv_ + (nv_ - pv_) * (
                (g - pb_).cast("double") / (nb_ - pb_).cast("double")
            )
            return F.coalesce(interp, pv_, nv_)
        if method == "ffill":
            return F.coalesce(pv_, nv_)
        if method == "value":
            return F.lit(float(fill_value))
        return F.lit(None).cast("double")

    # ONE explode emits the present row (g == b) and its trailing gap's
    # buckets (b+1 .. gap_end-1) together — no present ∪ gaps union, so the
    # scan→resample→window subtree executes once instead of twice. The last
    # row of each key has __gap_end NULL: coalesce to b so its sequence is
    # just [b]. Buckets are distinct per key post-resample, so gap_end > b
    # always and the sequence is never empty or descending.
    g = F.col("__g")
    return (
        rows.select(
            F.col(key),
            v.alias(value),
            "__pv",
            "__pb",
            "__nv",
            "__nb",
            "__gnv",
            "__gnb",
            F.explode(
                F.sequence(b, F.coalesce(F.col("__gap_end") - 1, b))
            ).alias("__g"),
            b.alias("__b"),
        )
        .select(
            F.col(key),
            g.alias(bucket),
            F.when(
                g == F.col("__b"), F.coalesce(v, _fill(g, pv, pb, nv, nb))
            )
            .otherwise(_fill(g, pv, pb, F.col("__gnv"), F.col("__gnb")))
            .alias(value),
            F.when(g == F.col("__b"), v.isNull().cast("int"))
            .otherwise(F.lit(1))
            .alias("filled"),
        )
    )


def rolling_stats(
    df: DataFrame,
    key: str,
    order_col: str,
    value: str,
    window: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window statistics per series: moving average, moving
    POPULATION std, z-score of the current value against its own trailing
    window, and an anomaly flag (|z| > z_threshold) — the rolling-z-score
    outlier detector, composable after ``resample``/``gap_fill``.

    The window frame is row-based (``window`` rows up to and including the
    current row), so on a gap-filled series it is also time-based. ONE
    key shuffle (the window sort); per-key cost bounded by series length.

    Determinism: the windowed sums are EXACT DECIMAL power sums — decimal
    addition is associative, so the result is independent of how the engine
    evaluates the sliding frame (Spark's incremental add/remove vs a
    segment tree would disagree in double low bits); every double derived
    from them (mean, variance, sqrt, z) is the same correctly-rounded IEEE
    chain in any engine, so z-scores are hash-certifiable unrounded. Input
    values are expected at ≤6 decimal places (the resample contract) so
    the decimal(18,6) cast is exact.

    Reserved names: the two-layer window materialization below adds temp
    columns __c1/__c2/__cn/__l1/__l2/__ln via select("*", ...) — the same
    double-underscore convention as the module's other temps (__pv/__pb).
    An input column with one of those names would make the later
    F.col("__c1") references ambiguous at analysis time, so they are
    rejected here with a clear message (round-12 advice)."""
    _reserved = {"__c1", "__c2", "__cn", "__l1", "__l2", "__ln"}
    clash = _reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"rolling_stats reserves temp column names {sorted(_reserved)}; "
            f"input already has {sorted(clash)} — rename those columns first"
        )
    v = F.col(value)
    vdec = v.cast("decimal(18,6)")
    # prefix-sum formulation: Spark re-evaluates a sliding frame's
    # aggregate buffer from scratch at every row (O(window) per row), but a
    # RUNNING frame is incremental — so each trailing-window sum is the
    # difference of two running cumulative sums. EXACT because decimal
    # arithmetic is associative and subtraction is a true inverse; a double
    # prefix sum would NOT be (catastrophic cancellation as the cumsum
    # grows). Same values as the direct frame aggregate, ~window× less work.
    word = Window.partitionBy(key).orderBy(order_col)
    wcum = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    zero1 = F.lit(0).cast(
        "decimal(38,6)"
    )  # Spark widens sum(decimal(18,6)) to (28,6); 38 covers any widening
    zero2 = F.lit(0).cast("decimal(38,12)")
    # MATERIALIZE the six window columns (3 running sums, then their 3
    # lags), THEN derive mean/std/z/anomaly with plain arithmetic. Neither
    # single-plan alternative evaluates each window function once:
    #  - five stacked withColumn: Catalyst extracts window expressions per
    #    Project without merging across Projects → TEN Window operators,
    #    each output column re-deriving its own cumulative sums and lags;
    #  - one select of the composed expressions: Catalyst does NOT
    #    common-subexpression the repeated sum/lag occurrences inside
    #    mean/var/z/anomaly — plan-verified 74 window expressions in one
    #    Window node (z alone expands m and std which expand s1/s2/n), and
    #    the sf10 interleaved A/B read it ~2× SLOWER than the stacked form.
    # Two selects of ALIASED window columns pin exactly 6 window
    # expressions across 2 Window nodes (running frame + lag frame, one
    # sort — lag's spec matches the cum layer's, so no re-sort); the final
    # arithmetic references the materialized attributes, so nothing
    # re-expands. Values identical — same expression trees, evaluated once
    # (round 12, plan-verified 10 Window/24 exprs → 2 Window/6 exprs).
    cums = df.select(
        "*",
        F.sum(vdec).over(wcum).alias("__c1"),
        F.sum(vdec * vdec).over(wcum).alias("__c2"),
        F.count(vdec).over(wcum).alias("__cn"),
    )
    lagged = cums.select(
        "*",
        F.lag("__c1", window).over(word).alias("__l1"),
        F.lag("__c2", window).over(word).alias("__l2"),
        F.lag("__cn", window).over(word).alias("__ln"),
    )
    s1 = (F.col("__c1") - F.coalesce(F.col("__l1"), zero1)).cast("double")
    s2 = (F.col("__c2") - F.coalesce(F.col("__l2"), zero2)).cast("double")
    n = (F.col("__cn") - F.coalesce(F.col("__ln"), F.lit(0))).cast("double")
    m = s1 / n
    var = s2 / n - m * m
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(std > 0, (v.cast("double") - m) / std).otherwise(F.lit(0.0))
    return lagged.select(
        *df.columns,
        m.alias("roll_mean"),
        std.alias("roll_std"),
        n.cast("long").alias("roll_n"),
        z.alias("zscore"),
        (F.abs(z) > F.lit(float(z_threshold))).cast("int").alias("anomaly"),
    )


def resample_gap_fill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    step_seconds: int,
    method: str = "linear",
    ndigits: int = 6,
) -> DataFrame:
    """resample → gap_fill in one call, with the bucket rendered back to its
    start timestamp: (key, bucket, bucket_ts, value, filled)."""
    res = resample(df, key, ts, value, step_seconds, ndigits=ndigits)
    filled = gap_fill(res, key, bucket="bucket", value=value, method=method)
    return filled.withColumn(
        "bucket_ts", bucket_start("bucket", step_seconds)
    ).select(key, "bucket", "bucket_ts", value, "filled")
