"""Structured Streaming twin: drain the hourly rollup with availableNow and
compare against the batch rollup on the same files."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_processes_spark.streaming.windows import (
    hourly_event_rollup,
    hourly_event_rollup_stream,
    run_stream_once,
)


@pytest.fixture(scope="module")
def event_dir(spark):
    import datetime as dt

    src = tempfile.mkdtemp(prefix="events_src_")
    rows = [
        (i, dt.datetime(2024, 1, 1, 9 + (i % 3), i % 60, 0), i % 5, ["click", "view"][i % 2], float(i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    df.write.mode("overwrite").parquet(src)
    yield src
    shutil.rmtree(src, ignore_errors=True)


def test_stream_rollup_matches_batch(spark, event_dir):
    out = tempfile.mkdtemp(prefix="stream_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        stream_df = hourly_event_rollup_stream(spark, event_dir, watermark="10 minutes")
        run_stream_once(stream_df, out, ckpt)
        got = (
            spark.read.parquet(out)
            .select("hour", "event_type", "n_events", F.round("sum_value", 6).alias("sum_value"))
            .collect()
        )
        batch = (
            hourly_event_rollup(spark.read.parquet(event_dir))
            .select("hour", "event_type", "n_events", "sum_value")
            .collect()
        )
        key = lambda r: (r["hour"], r["event_type"])
        got_map = {key(r): (r["n_events"], r["sum_value"]) for r in got}
        batch_map = {key(r): (r["n_events"], r["sum_value"]) for r in batch}
        # Append-mode semantics: only windows CLOSED by the watermark are
        # emitted; the final (max-hour) windows stay open at availableNow
        # drain. Closed windows must match batch exactly.
        max_hour = max(h for h, _ in batch_map)
        closed = {k: v for k, v in batch_map.items() if k[0] < max_hour}
        assert got_map == closed
        assert len(got_map) == 4  # 2 closed hours × 2 event types
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
