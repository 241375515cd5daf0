"""Sources and sinks for the interleaved-spans corpus.

At deployment scale the corpus lives in an Iceberg table partitioned by
``bucket(N, doc_id)`` — Iceberg gives partition pruning, snapshot isolation
(which subsumes the reference's backup-sink, output_consolidator.py:412-430,
S9), and time travel. This container has no Iceberg runtime jar, so the same
API is provided over parquet with an explicit bucket column; the calling
code is identical either way (S1, SURVEY.md §2.1).

Raw-PDF ingestion (S2-S5) at scale starts from ``spark.read.format
("binaryFile")`` over the object store; ``read_binary_docs`` wires that
shape. Byte-stream parsing into spans is the stubbed step here (the sandbox
ships no PDF libraries) — the spans corpus stands in for its output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import DOC_SCHEMA

N_BUCKETS_DEFAULT = 64


def write_spans(docs: DataFrame, path: str, n_buckets: int = N_BUCKETS_DEFAULT) -> None:
    """Write the corpus partitioned by a stable doc_id hash bucket — the
    same bucket function the checkpoint table keys on, so resume and scan
    pruning agree (operators/checkpoint.py)."""
    (
        docs.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_spans(spark: SparkSession, path: str, buckets: list[int] | None = None) -> DataFrame:
    """Read the corpus; ``buckets`` prunes partitions at planning time
    (shows up as PartitionFilters in the scan)."""
    from pyspark.sql.types import IntegerType

    df = spark.read.schema(DOC_SCHEMA.add("bucket", IntegerType())).parquet(path)
    if buckets is not None:
        df = df.filter(F.col("bucket").isin(buckets))
    return df.select("doc_id", "spans")


def read_binary_docs(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """S2-S5 ingestion shape: binaryFile source → (doc_id, content, length).
    The content→spans parse is the pluggable step (PDF libs absent here)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path").alias("doc_id"),
            F.col("content"),
            F.col("length"),
            F.col("modificationTime").alias("mtime"),
        )
    )


def parse_binary_to_spans(binary_docs: DataFrame) -> DataFrame:
    """STUB: batched PDF byte-stream parsing (xref/page-tree walk,
    content-stream tokenization) would run here as an Arrow mapInPandas over
    ``content``. No PDF toolkit ships in this environment."""
    raise NotImplementedError(
        "PDF byte-stream parsing requires a PDF toolkit; feed a spans table "
        "(read_spans / fixtures.corpus_df) instead"
    )
