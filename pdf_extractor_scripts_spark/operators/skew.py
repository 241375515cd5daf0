"""Weight-aware salted repartitioning for large-document skew.

The reference processes one file per thread, so a 1000-page PDF silently
stalls a worker (batch_processor.py:143-148 has no size awareness). At
cluster scale the equivalent failure is one task dragging a stage. Strategy
(SURVEY.md §4.2(1)):

* weight = size(spans); docs above ``heavy_span_threshold`` are "heavy";
* light docs share hash buckets (pmod(xxhash64(doc_id), P));
* each heavy doc gets a unique salt (its own doc_id), so no partition
  receives two heavy docs and AQE can rebalance the rest.

A document cannot be split below one row here because the vendor extractors
need whole-document context (cross-page items, ceco_processor.py:428-441) —
so the defense is isolation + spreading, plus Arrow batching keeping per-doc
overhead low.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_weight(df: DataFrame, heavy_span_threshold: int = 400) -> DataFrame:
    from .colutil import add_cols

    # size(spans) inlined twice — cheaper than a second analyzer pass over
    # the accumulated mega-plan just to reference the weight column
    return add_cols(
        df,
        weight=F.size("spans"),
        is_heavy=(F.size("spans") > heavy_span_threshold).cast("int"),
    )


def salted_repartition(df: DataFrame, n_partitions: int) -> DataFrame:
    # Salt cardinality must be >> n_partitions: with only P distinct salt
    # values, hashing P values into P partitions leaves ~1/e of them empty
    # (balls-in-bins), which caps scaling. 64x oversampling keeps occupancy
    # near-uniform while still giving each heavy doc a unique salt.
    salt = F.when(
        F.col("is_heavy") == 1, F.concat(F.lit("heavy:"), F.col("doc_id"))
    ).otherwise(F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions * 64)).cast("string"))
    return df.withColumn("salt", salt).repartition(n_partitions, F.col("salt")).drop("salt")


def should_salt(docs: DataFrame, heavy_span_threshold: int = 400,
                skew_ratio: float = 50.0) -> bool:
    """Auto skew detection: one cheap column-pruned pass over span counts.

    Salting pays a full-payload shuffle, so it must earn its keep: only when
    the heaviest document exceeds ``skew_ratio`` x the median weight (the
    1000-page-PDF-among-leaflets case) does isolation beat just running the
    narrow plan. The probe reads only size(spans) — Parquet/Iceberg serves
    it without materializing span contents.
    """
    import pyspark.sql.functions as F

    row = docs.select(F.size("spans").alias("w")).agg(
        F.expr("percentile(w, 0.5)").alias("med"), F.max("w").alias("mx")
    ).first()
    med = max(float(row["med"] or 1.0), 1.0)
    return float(row["mx"] or 0.0) > skew_ratio * med
