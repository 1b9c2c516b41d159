"""Entity resolution end-to-end: fuzzy-match entity names with the
edit-distance similarity join, resolve the match graph into entity clusters
with connected components, and pick one canonical record per entity —
the ops/dedup.py family composed the way a record-linkage pipeline runs it.

Run:  python examples/entity_resolution.py [part_parquet_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_processes_spark.ops.dedup import (
    connected_components,
    edit_distance_pairs,
    select_cluster_survivors,
)
from etl_processes_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    spark = get_spark("example-entity-resolution")
    spark.sparkContext.setLogLevel("ERROR")

    # entity table: one row per distinct name (the value domain), with the
    # record count as a popularity score for canonical-record selection
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    entities = (
        part.groupBy(F.lower(F.col("p_name")).alias("name"))
        .agg(F.min("p_partkey").alias("id"), F.count(F.lit(1)).alias("n_records"))
    )
    print(f"entities: {entities.count()}")

    # 1. fuzzy match: all name pairs within 2 edits — Ed-Join prefix
    #    filtering + exact levenshtein verify, never the all-pairs join
    pairs = edit_distance_pairs(entities, "id", "name", max_distance=2, q=2)
    print(f"fuzzy matches (d<=2): {pairs.count()}")

    # 2. resolve the match graph: connected components -> entity clusters
    clusters = connected_components(pairs)
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"clustered ids: {clusters.count()} in {n_clusters} entity clusters")

    # 3. canonical record per cluster: keep the most popular spelling
    canon = select_cluster_survivors(
        clusters.withColumnRenamed("node", "id"),
        entities.select("id", "n_records"),
        id_col="id",
        score_col="n_records",
    )
    resolved = (
        canon.join(entities.select("id", "name"), "id")
        .join(
            entities.select(
                F.col("id").alias("survivor_id"), F.col("name").alias("canonical")
            ),
            "survivor_id",
        )
        .orderBy("cluster_id", "id")
    )
    print("cluster members -> canonical spelling:")
    resolved.select("cluster_id", "name", "canonical", "is_survivor").show(
        12, truncate=False
    )


if __name__ == "__main__":
    main()
