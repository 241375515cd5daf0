"""Column-batching helpers for plan construction.

r7 OPTIMIZATION (guide §1.2 per-task... actually per-DRIVER work): every
``withColumn``/``drop`` call constructs a new Dataset, and Dataset creation
eagerly re-analyzes the ENTIRE accumulated logical plan — with the
pipeline's mega-expressions that cost ~30-50 ms per call, and the
extraction chain made ~37 such calls, so >1 s of every timed pipeline run
was driver-side plan re-analysis, not computation. Batching each operator's
independent columns into ONE ``select`` cuts the analyzer passes to one per
dependency layer. Semantically identical plans — the physical plan after
optimization is unchanged (CollapseProject merges adjacent projections
either way)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def add_cols(df: DataFrame, **cols: Column) -> DataFrame:
    """df plus the given new columns, in ONE select (one analysis pass).
    The new columns may reference existing columns but NOT each other."""
    return df.select(F.col("*"), *[c.alias(n) for n, c in cols.items()])


def replace_cols(df: DataFrame, drop: tuple[str, ...] = (), **cols: Column) -> DataFrame:
    """df minus ``drop`` plus the given new columns, in ONE select. The new
    columns may reference any column of ``df`` including dropped ones."""
    gone = set(drop) | set(cols)
    keep = [F.col(c) for c in df.columns if c not in gone]
    return df.select(*keep, *[c.alias(n) for n, c in cols.items()])
