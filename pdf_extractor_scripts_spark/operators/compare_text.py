"""Extraction-comparison harness — the engine's form of the reference's
Python-vs-NodeJS comparison tooling (text_extraction_comparison.py:60-199:
difflib similarity, numeric accuracy, spacing preservation; rendered diffs
in visual_text_comparison.py).

Compares two extraction result tables (doc_id, out_spans) span-by-span and
textually: exact span equality, difflib sequence similarity, and extracted-
number overlap. Similarity is a pandas UDF (difflib has no SQL form); the
joins and set arithmetic are native.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType

_SER = "array_join(transform(out_spans, s -> concat(s.kind, '\\u0001', s.text, '\\u0001', s.media_ref)), '\\n')"


@F.pandas_udf(DoubleType())
def _difflib_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    import difflib

    return pd.Series(
        [
            difflib.SequenceMatcher(None, x or "", y or "").ratio()
            for x, y in zip(a, b)
        ],
        index=a.index,
    )


def compare_extractions(a: DataFrame, b: DataFrame) -> DataFrame:
    """Full-outer comparison of two result tables on doc_id.

    Columns: exact (span-sequence equality incl. order), similarity
    (difflib over serialized spans), numeric_recall (fraction of A's
    extracted numbers present in B), n_spans_a/b.
    """
    nums = (
        lambda side: f"array_distinct(regexp_extract_all({side}, '[0-9][0-9,\\\\.]*', 0))"
    )
    sa = a.select(
        "doc_id",
        F.expr(_SER).alias("ser_a"),
        F.expr("out_spans").alias("spans_a"),
    )
    sb = b.select(
        "doc_id",
        F.expr(_SER).alias("ser_b"),
        F.expr("out_spans").alias("spans_b"),
    )
    j = sa.join(sb, "doc_id", "full_outer")
    # One-sided docs (full-outer nulls) must score as mismatches, not NULL:
    # NULL `exact` is silently dropped by sum() in comparison_summary, and
    # size(regexp_extract_all(NULL, ...)) is -1 in Spark, which would turn
    # numeric_recall negative. Coalesce to '' so absent == empty extraction.
    j = j.withColumn("ser_a", F.coalesce("ser_a", F.lit(""))).withColumn(
        "ser_b", F.coalesce("ser_b", F.lit(""))
    )
    return j.select(
        "doc_id",
        (
            (F.col("ser_a") == F.col("ser_b"))
            & F.col("spans_a").isNotNull()
            & F.col("spans_b").isNotNull()
        ).cast("int").alias("exact"),
        F.round(_difflib_ratio(F.col("ser_a"), F.col("ser_b")), 4).alias("similarity"),
        F.expr(
            f"CASE WHEN size({nums('ser_a')}) = 0 THEN 1.0 "
            f"ELSE cast(size(array_intersect({nums('ser_a')}, {nums('ser_b')})) as double)"
            f" / size({nums('ser_a')}) END"
        ).alias("numeric_recall"),
        F.expr("coalesce(size(spans_a), 0)").alias("n_spans_a"),
        F.expr("coalesce(size(spans_b), 0)").alias("n_spans_b"),
    )


def comparison_summary(cmp: DataFrame) -> DataFrame:
    return cmp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("exact").cast("long").alias("n_exact"),
        F.round(F.avg("similarity"), 4).alias("avg_similarity"),
        F.round(F.avg("numeric_recall"), 4).alias("avg_numeric_recall"),
    )
