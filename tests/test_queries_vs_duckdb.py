"""Pre-validates every registered query — gated (driver-exposed) AND ungated
extras — against its DuckDB oracle at sf0.001: a local replica of the
driver's CORRECTNESS gate, plus coverage the 50-row gate window can't hold."""

from __future__ import annotations

import pytest

from pdf_extractor_scripts_spark.plans.registry import all_queries, all_specs
from pdf_extractor_scripts_spark.plans.compare import run_one
from .conftest import SF_DIR

NAMES = sorted(all_specs().keys())


def test_driver_registry_fits_gate_window():
    """The driver gates the first 50 sorted names — every gated query must
    land inside that window or it silently loses its CORRECTNESS row."""
    assert len(all_queries()) <= 50


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    diff = run_one(spark, duck, name, SF_DIR)
    assert diff is None, f"{name}: {diff}"
