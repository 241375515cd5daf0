"""Structured Streaming jobs over the events stream.

The reference is strictly batch (SURVEY.md §2.10); streaming is the
scale-path addition a production corpus pipeline needs: documents and events
arrive continuously, and the same extraction/analytics logic must run
incrementally with event-time semantics.

Jobs here are defined source-agnostically (``DataFrame -> DataFrame`` on a
streaming frame) so tests drive them from a file/memory source and
production wires them to Kafka/Iceberg-CDC. Each has a batch-equivalent
twin in plans/ (stream_hourly_window) checked against the DuckDB oracle —
the streaming output at watermark-close equals the batch answer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def hourly_event_stats(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time window with late-data watermark.

    Batch twin: plans/analytics.py::stream_hourly_window. The watermark
    bounds state: windows older than (max event time - watermark) are
    finalized and evicted — required for an unbounded corpus.
    """
    # file sources may infer TIMESTAMP_NTZ; watermarks require TIMESTAMP
    # (session-tz). The session runs UTC so the cast is value-preserving.
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup on event_id within the watermark horizon —
    the incremental form of the corpus dedup family (state is bounded by
    the watermark instead of holding every key forever)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_file_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    query_name: str = "hourly_stats",
):
    """Wire hourly_event_stats to a file source + in-memory sink (tests /
    local runs). Returns the StreamingQuery; caller awaits termination."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    out = hourly_event_stats(stream)
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
