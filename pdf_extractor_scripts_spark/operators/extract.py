"""The vectorized extraction stage: one Arrow pandas UDF per route.

The reference runs ~30 regex fields + vendor line-item scans per document in
a Python loop (fallback_processor.py:196-242 dispatch); here one UDF call
extracts everything for an Arrow batch of documents (SURVEY.md §2.10 UDF
surface #3/#4). The UDF is applied twice — once over the text-route assembly,
once over the stub-OCR assembly — each masked to the rows whose route needs
it, so the expensive path only ever sees its own subset
(fallback_processor.py:218-235 expensive-path gating, expressed as column
masking instead of control flow).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

EXTRACT_RESULT = StructType(
    [
        StructField(
            "fields",
            ArrayType(
                StructType(
                    [
                        StructField("key", StringType()),
                        StructField("value", StringType()),
                    ]
                )
            ),
        ),
        StructField(
            "items",
            ArrayType(
                StructType(
                    [
                        StructField("line", StringType()),
                        StructField("serialized", StringType()),
                        StructField("marks", ArrayType(StringType())),
                    ]
                )
            ),
        ),
    ]
)


@F.pandas_udf(EXTRACT_RESULT)
def _extract_udf(vendor: pd.Series, text: pd.Series) -> pd.DataFrame:
    from .kernel import extract_batch

    return extract_batch(vendor, text)


def with_extraction(df: DataFrame) -> DataFrame:
    """Adds res_t / res_o struct columns. Input text columns are nulled out
    for routes that don't need them so the kernel skips those rows."""
    text_in = F.when(
        F.col("route").isin("text", "hybrid"), F.col("text_route_text")
    ).otherwise(F.lit(None))
    ocr_in = F.when(
        F.col("route").isin("ocr", "hybrid"), F.col("ocr_route_text")
    ).otherwise(F.lit(None))
    return df.withColumn("res_t", _extract_udf(F.col("vendor"), text_in)).withColumn(
        "res_o", _extract_udf(F.col("vendor"), ocr_in)
    )
