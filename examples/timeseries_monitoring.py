"""Event-stream monitoring end-to-end: resample raw events onto an hourly
grid, gap-fill the missing hours, and flag anomalous hours with a rolling
z-score — the ops/timeseries.py family composed the way a metrics pipeline
would run it.

Run:  python examples/timeseries_monitoring.py [events_parquet] [step_seconds]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_processes_spark.ops.timeseries import (
    bucket_start,
    gap_fill,
    resample,
    rolling_stats,
)
from etl_processes_spark.session import get_spark


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01/events.parquet"
    step = int(sys.argv[2]) if len(sys.argv) > 2 else 3600

    spark = get_spark("example-timeseries")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_processes_spark.timeutil import ensure_timestamp

    events = ensure_timestamp(spark.read.parquet(path), "ts")

    # 1. hourly per-user averages (one partial-agg'd shuffle)
    hourly = resample(events, "user_id", "ts", "value", step)

    # 2. regularize: every hour in each user's span gets a row; missing
    #    hours are linearly interpolated (single window pass, no join)
    filled = gap_fill(hourly, "user_id", method="linear")
    n_total = filled.count()
    n_filled = filled.filter("filled = 1").count()
    print(f"grid rows: {n_total}  generated (gap) rows: {n_filled}")

    # 3. anomalies: each hour scored against its own trailing 24h window
    scored = rolling_stats(filled, "user_id", "bucket", "value", window=24)
    anomalies = (
        scored.filter("anomaly = 1")
        .select(
            "user_id",
            F.date_format(bucket_start("bucket", step), "yyyy-MM-dd HH:mm").alias("hour"),
            F.round("value", 2).alias("value"),
            F.round("roll_mean", 2).alias("expected"),
            F.round("zscore", 2).alias("z"),
        )
        .orderBy(F.desc(F.abs(F.col("z"))))
    )
    print(f"anomalous hours: {anomalies.count()}")
    anomalies.show(10, truncate=False)


if __name__ == "__main__":
    main()
