"""Pre-validates every registered query against its DuckDB oracle at sf0.001 —
a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from pdf_extractor_scripts_spark.plans.registry import all_queries
from pdf_extractor_scripts_spark.plans.compare import run_one
from .conftest import SF_DIR

NAMES = sorted(all_queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    diff = run_one(spark, duck, name, SF_DIR)
    assert diff is None, f"{name}: {diff}"
