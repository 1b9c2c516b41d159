"""Raw documents -> deduped, filtered, packed, shuffled training corpus —
every hygiene stage of the assembly flow on the synthetic documents table.

Run:  python examples/training_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_processes_spark.pipeline import run_training_data_pipeline
from etl_processes_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    spark = get_spark("example-training-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # the synthetic corpus has no newlines; manufacture some line structure
    docs = docs.select(
        "doc_id", F.regexp_replace("text", " the ", "\n").alias("text")
    )
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    out = run_training_data_pipeline(
        spark,
        docs,
        min_quality=0.0,
        langs=("en",),
        pack_budget=512,            # token-budget sequence packing
        line_dedup_max_df=2,        # strip boilerplate lines
        semantic_embeddings=emb,    # SemDeDup prune
        semantic_threshold=0.8,
        shuffle_seed=9,             # deterministic training order
    )
    out.show(10, truncate=32)
    print("rows:", out.count(), "| columns:", out.columns)


if __name__ == "__main__":
    main()
