"""Per-stage wall-time attribution for run_training_data_pipeline.

Round-7 verdict: the e2e_training_pipeline sf100 line (735.9s, 11.3x/decade)
needed STAGE attribution before anything gets optimized — a composed line
can hide which stage owns the super-linear tail. This drives the pipeline
through its stage_hook with an eager-serialized-checkpoint-and-time hook:
each stage boundary materializes before the next stage builds on it, so a
later stage can never silently recompute an earlier one (the
connected-components localCheckpoint trap from round 7 — attribution
double-counts unless the input is already materialized).

Usage:
    python tools/profile_e2e.py /root/repo/testdata_sf10 [--full]

Prints one JSON line: {"sf_dir": ..., "variant": "default"|"full",
"stages": {name: sec, ...}, "final": sec, "total": sec, "rows": N}.

Caveats (documented, not hidden): checkpoint writes are attributed to the
stage that produced the frame, so each stage's number includes serializing
its output once — the SUM therefore slightly exceeds the un-hooked bench
line, and per-stage numbers are upper bounds. Ratios sf10 vs sf100 are the
point, not absolutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    full = "--full" in sys.argv

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from etl_processes_spark.pipeline import run_training_data_pipeline
    from etl_processes_spark.session import get_spark

    spark = get_spark("profile_e2e")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py so stage 1 isn't charged JVM/Arrow spin-up
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    from etl_processes_spark.partitioning import release_checkpoint

    stages: dict[str, float] = {}
    last = [0.0]  # set to t_start right before the pipeline call
    prev_ckpt = []  # the previous boundary's checkpoint, released once superseded

    def hook(name, df):
        # serialized blocks (Python MEMORY_AND_DISK is serialized): the
        # deserialized default was a round-7 sf100 OOM class
        out = df.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        now = time.time()
        # stage time = everything since the previous boundary — including
        # EAGER driver-side work a stage does during plan construction
        # (dedup_clusters runs connected components eagerly), not just this
        # boundary's checkpoint; a checkpoint-only timer missed ~85% of the
        # cluster stage at sf0.01
        stages[name] = round(now - last[0], 2)
        last[0] = now
        # every stage reads only the PREVIOUS boundary's frame (+ external
        # side tables), so once this checkpoint is materialized the one
        # before it is dead weight — at sf100 each boundary pins a
        # full-corpus block set, and keeping them all would exhaust the
        # disk the corpus itself needs
        while prev_ckpt:
            release_checkpoint(prev_ckpt.pop())
        prev_ckpt.append(out)
        print(f"# stage {name}: {stages[name]}s", file=sys.stderr, flush=True)
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kwargs = dict(
        min_quality=0.0, langs=("en", "zh", "es", "fr", "de"),
        pack_budget=2048, near_dup_threshold=0.5, max_df=500,
        scrub_pii=True, stage_hook=hook,
    )
    if full:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        kwargs.update(
            span_dedup_k=5, span_dedup_min_df=2,
            semantic_embeddings=emb, semantic_threshold=0.95,
        )

    t_start = time.time()
    last[0] = t_start
    out = run_training_data_pipeline(spark, docs, **kwargs)
    t0 = time.time()
    out.write.mode("overwrite").format("noop").save()
    final = round(time.time() - t0, 2)
    total = round(time.time() - t_start, 2)
    rows = out.count()
    print(json.dumps({
        "sf_dir": sf_dir,
        "variant": "full" if full else "default",
        "stages": stages,
        "final": final,
        "total": total,
        "rows": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
