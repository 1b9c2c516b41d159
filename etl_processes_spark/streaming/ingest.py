"""Continuous corpus ingestion — the Structured Streaming face of the
append-mode pipeline (`pipeline.run_incremental_ingest`).

A file-source stream delivers document batches; ``foreachBatch`` runs the
per-batch ingest (exact + near-dup dedup, optional line cleaning and
LM-fluency floor against FROZEN corpus state). Every write — accepted docs
and each state delta — lands in a per-epoch ``batch=<id>`` partition dir
with OVERWRITE semantics: a replayed micro-batch (crash anywhere between
writes, checkpoint not committed) recomputes against only EARLIER epochs'
state (its own half-written deltas are filtered out by epoch id) and
rewrites its own partition dirs, so retries can neither double-ingest nor
lose the batch — the idempotent-foreachBatch-sink pattern.

At 100 TB this is the steady-state shape: per-batch cost scales with the
batch (anti-join / bucket-join against compact state), never the corpus;
the state tables are ordinary parquet directories any engine can read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


STATE_TABLES = ("digests", "index", "sigs", "counts", "line_counts")


def _load_state(
    spark: SparkSession,
    state_dir: str,
    name: str,
    before_batch: int | None = None,
) -> DataFrame | None:
    """Read a state table if it exists. Goes through the Spark reader (no
    driver-local listing), so state_dir may live on any Hadoop-compatible
    filesystem (hdfs://, s3a://, file:); absent/empty tables are a cold
    start, not an error. Epoch subdirs are partition-discovered; with
    ``before_batch`` only earlier epochs' deltas are visible — a REPLAYED
    micro-batch must not see its own half-written deltas, or it would
    reject its whole batch and overwrite good output with nothing."""
    try:
        df = spark.read.parquet(f"{state_dir}/{name}")
        if "batch" in df.columns:
            from pyspark.sql import functions as F

            if before_batch is not None:
                df = df.filter(F.col("batch") < before_batch)
            df = df.drop("batch")
        return df
    except Exception as e:
        # ONLY a genuinely absent/empty table is a cold start. Any other
        # read failure (auth expiry, throttling, corrupt footer) must FAIL
        # the batch so the stream retries — swallowing it would run the
        # batch stateless and permanently pollute the corpus with
        # duplicates that a later retry can't undo.
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return None
        raise


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
        digests = _load_state(sess, state_dir, "digests", before_batch=batch_id)
        index = _load_state(sess, state_dir, "index", before_batch=batch_id)
        sigs = _load_state(sess, state_dir, "sigs", before_batch=batch_id)
        counts = _merged_counts(
            _load_state(sess, state_dir, "counts", before_batch=batch_id),
            "token", "c",
        )
        line_counts = _merged_counts(
            _load_state(sess, state_dir, "line_counts", before_batch=batch_id),
            "__h", "line_df",
        )
        accepted, deltas = run_incremental_ingest(
            sess,
            batch_df,
            seen_digests=digests,
            near_dup_index=index,
            near_dup_sigs=sigs,
            lm_counts=counts,
            line_counts=line_counts,
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
            # every write lands in a PER-EPOCH partition dir with overwrite:
            # a replayed micro-batch (crash between writes, checkpoint not
            # yet committed) rewrites its own batch=<id> dirs instead of
            # appending duplicates — the idempotent-foreachBatch-sink
            # pattern; readers partition-discover the epoch subdirs
            accepted.write.mode("overwrite").parquet(
                f"{out_dir}/batch={batch_id}"
            )
            for name in STATE_TABLES:
                if name in deltas:
                    deltas[name].write.mode("overwrite").parquet(
                        f"{state_dir}/{name}/batch={batch_id}"
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
