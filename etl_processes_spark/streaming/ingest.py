"""Continuous corpus ingestion — the Structured Streaming face of the
append-mode pipeline (`pipeline.run_incremental_ingest`).

A file-source stream delivers document batches; ``foreachBatch`` runs the
per-batch ingest (exact + near-dup dedup, optional line cleaning and
LM-fluency floor against FROZEN corpus state), appends accepted docs to the
output table and the per-batch deltas to the parquet state tables. State is
re-read per batch, so the stream picks up exactly where it stopped — the
checkpoint makes source progress exactly-once, and a replayed batch dedups
against its own already-appended digests (the ingest flow's idempotence),
so retries cannot double-ingest.

At 100 TB this is the steady-state shape: per-batch cost scales with the
batch (anti-join / bucket-join against compact state), never the corpus;
the state tables are ordinary parquet directories any engine can read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


STATE_TABLES = ("digests", "index", "counts", "line_counts")


def _load_state(spark: SparkSession, state_dir: str, name: str) -> DataFrame | None:
    path = os.path.join(state_dir, name)
    try:
        if any(f.endswith(".parquet") for f in os.listdir(path)):
            return spark.read.parquet(path)
    except OSError:
        pass
    return None


def _merged_counts(df: DataFrame | None, key: str, val: str) -> DataFrame | None:
    """State counts are APPENDED per batch; consumers re-aggregate by sum."""
    from pyspark.sql import functions as F

    if df is None:
        return None
    return df.groupBy(key).agg(F.sum(val).alias(val))


def incremental_ingest_stream(
    spark: SparkSession,
    source_path: str,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_logprob: float | None = None,
    split_fractions: dict[str, float] | None = None,
    line_dedup_max_df: int | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    **ingest_kwargs,
):
    """Run the append-mode ingest over a parquet file stream. Returns the
    started StreamingQuery (``availableNow`` drains what exists and stops —
    the batch-of-the-stream mode the tests pin; pass available_now=False
    for an unbounded run).

    Layout: ``out_dir`` accumulates accepted docs; ``state_dir/<table>``
    accumulates state deltas (digests / index / counts / line_counts as
    plain parquet appends — counts-style tables are re-aggregated on read,
    so appends never rewrite history)."""
    from etl_processes_spark.pipeline import run_incremental_ingest

    schema = spark.read.parquet(source_path).schema

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        digests = _load_state(sess, state_dir, "digests")
        index = _load_state(sess, state_dir, "index")
        counts = _merged_counts(
            _load_state(sess, state_dir, "counts"), "token", "c"
        )
        line_counts = _load_state(sess, state_dir, "line_counts")
        accepted, deltas = run_incremental_ingest(
            sess,
            batch_df,
            seen_digests=digests,
            near_dup_index=index,
            lm_counts=counts,
            id_col=id_col,
            text_col=text_col,
            min_logprob=min_logprob,
            split_fractions=split_fractions,
            line_dedup_max_df=line_dedup_max_df,
            **ingest_kwargs,
        )
        # accepted feeds the output write AND every delta derivation below;
        # persist so the dedup subtree runs once per batch, not once per sink
        accepted = accepted.persist()
        try:
            accepted.write.mode("append").parquet(out_dir)
            for name in STATE_TABLES:
                if name in deltas:
                    deltas[name].write.mode("append").parquet(
                        os.path.join(state_dir, name)
                    )
        finally:
            accepted.unpersist()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
