"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every oracle-checkable operator implemented in
``pdf_extractor_scripts_spark/plans/`` (SURVEY.md §2 families P/L/F/J/A/T plus
the training-data ops: dedup, similarity search, text analysis, multimodal
accounting). ``oracle_sql()`` returns the matching DuckDB SQL. ``entry`` runs
the flagship end-to-end extraction pipeline over a deterministic synthetic
interleaved-spans corpus derived from sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end document pipeline summary on sf0.001."""
    from pdf_extractor_scripts_spark.plans.registry import all_queries

    sf_dir = "/root/testdata/sf0.001"
    try:
        from pdf_extractor_scripts_spark.plans.pipeline import flagship

        return flagship(spark, sf_dir)
    except ImportError:
        return all_queries()["q1_pricing_summary"].spark(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pdf_extractor_scripts_spark.plans.registry import all_queries

    return {name: spec.spark for name, spec in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for ops whose
    semantics are not SQL-expressible — driver then records rows-only)."""
    from pdf_extractor_scripts_spark.plans.registry import all_queries

    return {
        name: spec.oracle
        for name, spec in sorted(all_queries().items())
        if spec.oracle is not None
    }
