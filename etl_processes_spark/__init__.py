"""etl_processes_spark — a PySpark-native, statistics-preserving synthetic-data
engine with the query/data-processing capabilities of somekatename/ETL-processes
(reference: /root/reference/Latanova_v1.py), re-expressed Spark-first, plus
large-scale training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Public API:
    profile(df)                  -> dict[str, ColumnProfile]
    generate(spark, profiles, n) -> DataFrame
    validate(profiles, df)       -> dict[str, dict]
"""

from etl_processes_spark.profile import ColumnProfile, infer_types, profile
from etl_processes_spark.generate import generate
from etl_processes_spark.validate import validate

__all__ = ["ColumnProfile", "infer_types", "profile", "generate", "validate"]
__version__ = "0.1.0"
