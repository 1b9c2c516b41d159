"""Seeded synthetic-data generators — EP3 of the reference lifecycle
(Latanova_v1.py:300-423), Spark-shaped.

Every generator is a pure Column expression over a shared ``spark.range(n)``
seed frame, so a whole table generates in ONE embarrassingly-parallel job with
no join/zip (the reference recombines per-column python lists positionally,
Latanova_v1.py:704 — here each column is an expression over the same frame).
Generation scales linearly: spark.range partitions split the row space and
each partition evaluates its expressions independently.

Semantic parity (SURVEY.md §2.11):
 - np.round is HALF-TO-EVEN → Spark ``bround`` (Q3).
 - Generation clips to the observed [min, max] (Q9) → least/greatest.
 - The reference uses the unseeded global numpy RNG; this engine seeds every
   generator (Q12) via md5-derived uniforms/normals (u_expr/z_expr): values
   depend only on (seed, salt, row id) — reproducible under any partitioning
   AND computable identically by the DuckDB correctness oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_processes_spark.profile.types import BOOL_RENDER, DATE_FORMATS, ColumnProfile

# Max categories / bootstrap entries inlined as a literal expression before we
# switch to a broadcast lookup-table join (plan size vs. shuffle trade-off).
_MAX_INLINE = 256


def u_expr(seed: int, salt: str = "", id_col: Column | None = None) -> Column:
    """Deterministic uniform in (0,1): a 52-bit hex slice of
    md5("{seed}:{salt}:{id}") scaled by 2^-52 (52 bits so h+0.5 is exact in
    float64). Replaces rand(seed) everywhere in generation:

     - value depends ONLY on (seed, salt, row id) — reproducible under any
       partitioning/scheduling (JVM rand streams are per-partition and
       stream-position dependent);
     - DuckDB derives the identical double (CAST '0x…' AS BIGINT), which is
       what lets generator queries be hash-gated at the correctness oracle;
     - deterministic expression → safe inside when-chains (F.rand is
       re-drawn per branch)."""
    rid = F.col("id") if id_col is None else id_col
    key = F.concat_ws(":", F.lit(str(seed)), F.lit(salt), rid.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double")
    return (h + F.lit(0.5)) / F.lit(float(1 << 52))


def z_expr(seed: int, salt: str = "", id_col: Column | None = None) -> Column:
    """Standard normal via Box-Muller over two independent md5 uniforms
    (same cross-engine/partition-independence properties as u_expr)."""
    u1 = u_expr(seed, salt + "a", id_col)
    u2 = u_expr(seed, salt + "b", id_col)
    return F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)


def gen_numeric(stats: dict, is_integer: bool, seed: int) -> Column:
    """normal(mean,std) → clip[min,max] → bround (Latanova_v1.py:346-364)."""
    if stats is None:
        return F.lit(0.0) if not is_integer else F.lit(0).cast("long")
    x = z_expr(seed, "num") * F.lit(float(stats["std"])) + F.lit(float(stats["mean"]))
    x = F.least(F.greatest(x, F.lit(float(stats["min"]))), F.lit(float(stats["max"])))
    if is_integer:
        return F.bround(x, 0).cast("long")
    return F.bround(x, 2)


def gen_boolean(stats: dict | None, bool_format: str | None, seed: int) -> Column:
    """Bernoulli(true_prob) rendered in the detected spelling
    (Latanova_v1.py:366-389); default spelling 'True'/'False' strings."""
    p = 0.5 if stats is None else float(stats["true_probability"])
    b = u_expr(seed, "bool") < F.lit(p)
    if bool_format == "bool":
        return b
    t, f = BOOL_RENDER.get(bool_format or "true_false", ("True", "False"))
    return F.when(b, F.lit(t)).otherwise(F.lit(f))


def gen_categorical(stats: dict | None, r: Column) -> Column:
    """Weighted choice via inverse-CDF over ``r`` (Latanova_v1.py:391-402).
    ``r`` MUST be a MATERIALIZED uniform column (projected in a prior select),
    never a raw F.rand() expression: nondeterministic expressions are
    re-evaluated per ``when`` branch, which silently skews the distribution
    (measured: p=[.5,.3,.2] came out [.5,.4,.1]). Small domains inline as a
    when-chain (whole-stage codegen, no join); large domains use
    gen_categorical_join."""
    if not stats or not stats.get("categories"):
        return F.lit("")
    cats = stats["categories"]
    probs = stats["probabilities"]
    expr = None
    cum = 0.0
    for cat, p in zip(cats[:-1], probs[:-1]):
        cum += float(p)
        expr = F.when(r < cum, F.lit(cat)) if expr is None else expr.when(r < cum, F.lit(cat))
    last = F.lit(cats[-1])
    return last if expr is None else expr.otherwise(last)


def gen_categorical_join(
    spark: SparkSession, frame: DataFrame, out_col: str, stats: dict, seed: int
) -> DataFrame:
    """Inverse-CDF via a broadcast range-join against a cumulative lookup —
    the scale path for domains too large to inline (BroadcastNestedLoopJoin
    over a tiny CDF table; no shuffle of the big side)."""
    cats, probs = stats["categories"], stats["probabilities"]
    rows, lo = [], 0.0
    for cat, p in zip(cats, probs):
        hi = lo + float(p)
        rows.append((lo, hi, cat))
        lo = hi
    rows[-1] = (rows[-1][0], 1.0 + 1e-9, rows[-1][2])
    cdf = spark.createDataFrame(rows, ["__lo", "__hi", out_col])
    r = u_expr(seed, "catj")
    joined = frame.withColumn("__r", r).join(  # __r materialized: see gen_categorical note
        F.broadcast(cdf), (F.col("__r") >= F.col("__lo")) & (F.col("__r") < F.col("__hi")), "left"
    )
    return joined.drop("__lo", "__hi", "__r")


def gen_datetime(stats: dict | None, date_format: str | None, seed: int) -> Column:
    """normal over epoch seconds (std fallback 30 days) → clip → render
    (Latanova_v1.py:404-423)."""
    if stats is None:
        return F.lit("")
    std = float(stats["std"]) if float(stats["std"]) > 0 else 86400.0 * 30
    x = z_expr(seed, "dt") * F.lit(std) + F.lit(float(stats["mean"]))
    x = F.least(F.greatest(x, F.lit(float(stats["min"]))), F.lit(float(stats["max"])))
    ts = F.timestamp_seconds(x)
    pattern = DATE_FORMATS.get(date_format or "YYYY-MM-DD", "yyyy-MM-dd")
    return F.date_format(ts, pattern)


def gen_unknown() -> Column:
    """Unknown-type columns → empty strings (Latanova_v1.py:698-699)."""
    return F.lit("")


def bootstrap_resample(entries: list[str], seed: int) -> Column:
    """Sample retained raw entries with replacement (Latanova_v1.py:309).
    NOTE: leaks source values by design (reference semantics, SURVEY Q10).
    Entries are profile-sample-bounded, so the inline array is bounded too.
    For entry sets too large to inline in the plan, use
    bootstrap_resample_join."""
    arr = F.array(*[F.lit(e) for e in entries])
    idx = (F.floor(u_expr(seed, "bs") * F.lit(len(entries))) + 1).cast("int")
    return F.element_at(arr, idx)


def bootstrap_resample_join(
    spark: SparkSession, frame: DataFrame, out_col: str, entries: list[str], seed: int
) -> DataFrame:
    """Bootstrap via broadcast equi-join against an indexed entries table —
    the scale path when inlining thousands of literals would bloat the plan
    (plan size is driver memory + codegen time). rand() is materialized
    before the join (nondeterministic-expression rule)."""
    lookup = spark.createDataFrame(
        [(i, e) for i, e in enumerate(entries)], ["__idx", out_col]
    )
    idx = F.floor(u_expr(seed, "bsj") * F.lit(len(entries))).cast("long")
    return (
        frame.withColumn("__idx", idx)
        .join(F.broadcast(lookup), "__idx")
        .drop("__idx")
    )


def gen_email_fallback(seed: int) -> Column:
    """user{1000..9998}@example.com (Latanova_v1.py:312; randint high-excl)."""
    num = (F.floor(u_expr(seed, "em") * 8999) + 1000).cast("int")
    return F.concat(F.lit("user"), num.cast("string"), F.lit("@example.com"))


def gen_phone_fallback(seed: int) -> Column:
    """+7 XXX XXX-XX-XX (Latanova_v1.py:314-316; randint high-exclusive)."""
    def r(lo: int, hi_excl: int, s: int) -> Column:
        return (F.floor(u_expr(s, "ph") * (hi_excl - lo)) + lo).cast("int").cast("string")

    return F.concat(
        F.lit("+7 "), r(100, 999, seed), F.lit(" "), r(100, 999, seed + 1),
        F.lit("-"), r(10, 99, seed + 2), F.lit("-"), r(10, 99, seed + 3),
    )
