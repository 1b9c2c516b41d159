"""TIMESTAMP_NTZ tolerance — regression for the round-3 driver breakage.

The driver's session reads events.parquet's TIMESTAMP(NANOS) column as
TIMESTAMP_NTZ (its nanosAsLong conf is static), while local sessions read it
as bigint. Every time-ordered operator must accept BOTH; these tests feed an
NTZ-typed frame (what the driver produces) through each operator and check
it matches the timestamp-typed result row-for-row.
"""

import pytest
from pyspark.sql import functions as F

from etl_processes_spark.ops.asof import asof_join
from etl_processes_spark.streaming.windows import (
    cascading_rollup,
    hourly_event_rollup,
    sessionize,
    sliding_window_agg,
    user_running_totals,
)


@pytest.fixture(scope="module")
def events_ts(spark, sf_dir):
    import __spark_entry__ as entrymod

    return entrymod._load_events(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def events_ntz(events_ts):
    df = events_ts.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    return df


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_load_events_normalizes_ntz(spark, events_ntz, tmp_path):
    # Loader branch: an NTZ-schema parquet copy round-trips to timestamp.
    import __spark_entry__ as entrymod

    out = str(tmp_path / "sfntz")
    events_ntz.limit(200).write.parquet(out + "/events.parquet")
    df = entrymod._load_events(spark, out)
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_sessionize_ntz(events_ts, events_ntz):
    cols = ["user_id", "session_id", "session_start", "session_end", "n_events", "sum_value"]
    a = _sorted_rows(sessionize(events_ts), cols)
    b = _sorted_rows(sessionize(events_ntz), cols)
    assert a == b and len(a) > 0


def test_asof_join_ntz(events_ts, events_ntz):
    def run(ev):
        purch = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("value").alias("purchase_value")
        )
        out = asof_join(
            ev.select("event_id", "user_id", "ts", "event_type"), purch, on="user_id"
        )
        return _sorted_rows(out, ["event_id", "user_id", "ts_r", "purchase_value_r"])

    a, b = run(events_ts), run(events_ntz)
    assert a == b and len(a) > 0


def test_rollups_and_windows_ntz(events_ts, events_ntz):
    # Remaining time-ordered operators: NTZ input must not raise, and the
    # rendered/value outputs must match the timestamp-typed run.
    a = _sorted_rows(
        hourly_event_rollup(events_ts).withColumn("hour", F.col("hour").cast("string")),
        ["hour", "event_type", "n_events", "sum_value"],
    )
    b = _sorted_rows(
        hourly_event_rollup(events_ntz).withColumn("hour", F.col("hour").cast("string")),
        ["hour", "event_type", "n_events", "sum_value"],
    )
    assert a == b and len(a) > 0

    a = _sorted_rows(user_running_totals(events_ts), ["event_id", "ts_str", "running_value"])
    b = _sorted_rows(user_running_totals(events_ntz), ["event_id", "ts_str", "running_value"])
    assert a == b

    a = _sorted_rows(
        sliding_window_agg(events_ts).withColumn(
            "window_start", F.col("window_start").cast("string")
        ),
        ["window_start", "event_type", "n_events", "sum_value"],
    )
    b = _sorted_rows(
        sliding_window_agg(events_ntz).withColumn(
            "window_start", F.col("window_start").cast("string")
        ),
        ["window_start", "event_type", "n_events", "sum_value"],
    )
    assert a == b and len(a) > 0

    _, daily_ts = cascading_rollup(events_ts)
    _, daily_ntz = cascading_rollup(events_ntz)
    a = _sorted_rows(
        daily_ts.withColumn("day", F.col("day").cast("string")),
        ["day", "event_type", "n_events", "sum_value"],
    )
    b = _sorted_rows(
        daily_ntz.withColumn("day", F.col("day").cast("string")),
        ["day", "event_type", "n_events", "sum_value"],
    )
    assert a == b and len(a) > 0


def test_ntz_with_ansi_combined(spark, events_ts, events_ntz):
    """The driver runs NTZ input under ANSI mode — exercise both at once
    for the time-ordered operators (casts that silently truncate without
    ANSI can throw with it)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        a = sorted(map(tuple, sessionize(events_ntz.limit(500)).collect()))
        b = sorted(map(tuple, sessionize(events_ts.limit(500)).collect()))
        assert a == b
        left = events_ntz.limit(200).select("event_id", "user_id", "ts")
        right = events_ntz.limit(200).select(
            "user_id", "ts", F.col("value").alias("v")
        )
        out = asof_join(left, right, on="user_id")
        assert out.count() == 200
        assert hourly_event_rollup(events_ntz.limit(500)).count() > 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_resample_gap_fill_ntz(events_ts, events_ntz):
    from etl_processes_spark.ops.timeseries import resample_gap_fill

    cols = ["user_id", "bucket", "bucket_ts", "value", "filled"]
    a = _sorted_rows(resample_gap_fill(events_ts, "user_id", "ts", "value", 3600), cols)
    b = _sorted_rows(resample_gap_fill(events_ntz, "user_id", "ts", "value", 3600), cols)
    assert a == b and len(a) > 0
