"""Timestamp-type hygiene shared by the time-ordered operators.

Parquet TIMESTAMP(NANOS) columns arrive differently depending on session
flags: as ``bigint`` (spark.sql.legacy.parquet.nanosAsLong), as
``timestamp_ntz`` (Spark 4 default), or as ``timestamp``. Epoch arithmetic
(``unix_micros``, ``cast("double")``) is illegal on TIMESTAMP_NTZ, so every
operator that does time math normalizes through here instead of trusting the
loader. Sessions in this engine are pinned to UTC (session.py), so the
NTZ→LTZ cast maps naive wall time to the same instant every other engine
(and the DuckDB oracles) see.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_timestamp(df: DataFrame, *cols: str) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column among ``cols`` (default: all NTZ
    columns) to session-zone TIMESTAMP. No-op for timestamp/other types, so
    it is safe to call unconditionally."""
    dtypes = dict(df.dtypes)
    targets = cols or tuple(c for c, t in dtypes.items() if t == "timestamp_ntz")
    for c in targets:
        if dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def epoch_micros(col: Column | str) -> Column:
    """NTZ-safe ``unix_micros``: exact integer epoch micros for any
    timestamp flavor (never via double — nanos-era epochs exceed 2^53)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_seconds_d(col: Column | str) -> Column:
    """NTZ-safe fractional epoch seconds (double); keeps sub-second
    precision that ``unix_timestamp`` truncates."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")
