"""Incremental extraction: the batch pipeline wired to a streaming source.

A production corpus is not static — new documents land continuously. This
runs the SAME ``run_pipeline`` (identical semantics, identical span-equality
contract) inside ``foreachBatch`` over a file/Iceberg-CDC stream:

* Structured Streaming's source checkpoint gives exactly-once batch
  delivery (each input file processed once);
* within a micro-batch the engine's own bucket checkpoint (operators/
  checkpoint.py) records lineage + metrics, so a crashed micro-batch
  resumes idempotently at bucket granularity when the stream restarts.

This composition — streaming for ingestion bookkeeping, the deterministic
batch plan for semantics — keeps the correctness contract testable (the
streamed result of N files equals the batch run over their union).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..schemas import DOC_SCHEMA
from ..plans.pipeline import run_with_checkpoint


def start_extraction_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    run_id: str = "stream",
    stream_checkpoint: str | None = None,
    max_files_per_trigger: int = 8,
):
    """File-source stream of spans documents → checkpointed extraction.

    Returns the StreamingQuery (``availableNow`` trigger: drains what exists
    then stops — swap for a processing-time trigger in long-running mode).
    """
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        run_with_checkpoint(
            spark, batch_df, out_dir, run_id=f"{run_id}-b{batch_id}"
        )

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if stream_checkpoint:
        writer = writer.option("checkpointLocation", stream_checkpoint)
    return writer.start()
