"""The reference's end-to-end flow (Latanova_v1.py:630-742) as one callable:
ingest → profile → generate → validate → report/sink.

This is the "main()" a user of the reference would run — reproduced on
Spark: one profile pass (two scans + tiny per-categorical groupBys), one
generation job, one validation pass, optional CSV sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_processes_spark.generate import generate
from etl_processes_spark.io import csv_scan, csv_sink, profile_sink, report_sink
from etl_processes_spark.profile import profile
from etl_processes_spark.validate import validate

DEFAULT_N_SAMPLES = 500  # min(500, SAMPLE_SIZE), Latanova_v1.py:678


def run_reference_pipeline(
    spark: SparkSession,
    input_path: str | DataFrame,
    output_csv: str | None = None,
    profile_json: str | None = None,
    n_samples: int = DEFAULT_N_SAMPLES,
    seed: int = 2025,
    sample_rows: int | None = 1000,
) -> tuple[DataFrame, dict, str]:
    """Returns (synthetic_df, validation, report_text)."""
    if isinstance(input_path, DataFrame):
        df = input_path
    elif input_path.endswith(".csv"):
        df = csv_scan(spark, input_path)
    else:
        df = spark.read.parquet(input_path)

    profiles = profile(df, sample_rows=sample_rows)
    # persist: the synthetic frame is re-read by every per-column validation
    # job (submitted concurrently) and again by the sinks
    synthetic = generate(spark, profiles, n_samples, seed=seed).persist()
    validation = validate(profiles, synthetic)
    report = report_sink(profiles, validation)
    if profile_json:
        profile_sink(profiles, profile_json)
    if output_csv:
        csv_sink(synthetic, output_csv)
    return synthetic, validation, report
