"""to_unified_json: the UnifiedJSONSchema projection (json_schema.py:14-205)
over the pipeline's span-sequence output — field-by-field parity against an
independent pure-Python construction from the same result rows, plus the
None-dropping (_clean_none_values) and kwargs-passthrough semantics."""

from __future__ import annotations

import json
import re

import pytest

from pdf_extractor_scripts_spark import config as C  # noqa: F401
from pdf_extractor_scripts_spark.fixtures import corpus_df
from pdf_extractor_scripts_spark.plans import unified as U
from pdf_extractor_scripts_spark.plans.pipeline import run_pipeline


def _serialized_get(serialized: str, key: str) -> str:
    m = re.search(rf"(?:^|\|){re.escape(key)}=([^|]*)", serialized)
    return m.group(1) if m else ""


def _expected(row) -> dict:
    spans = sorted(row.out_spans, key=lambda s: s.order)
    fields: dict[str, str] = {}
    for s in spans:
        if s.kind.startswith("field:") and s.kind[6:] not in fields:
            fields[s.kind[6:]] = s.text

    doc: dict = {}
    for section in ("invoice_header", "vendor_info", "customer_info",
                    "totals", "payment_terms", "shipping_info"):
        by_ref: dict[str, list[str]] = {}
        for ek, (sec, ref) in U.FIELD_MAP.items():
            if sec == section:
                by_ref.setdefault(ref, []).append(ek)
        out = {}
        for ref, eks in by_ref.items():
            for ek in eks:
                if fields.get(ek) is not None:
                    out[ref] = fields[ek]
                    break
        doc[section] = out

    items = []
    for s in spans:
        if s.kind != "item":
            continue
        by_ref = {}
        for skey, ref in U.ITEM_MAP:
            by_ref.setdefault(ref, []).append(skey)
        item = {}
        for ref, skeys in by_ref.items():
            for sk in skeys:
                v = _serialized_get(s.text, sk)
                if v != "":
                    item[ref] = v
                    break
        items.append(item)
    doc["line_items"] = items

    doc["metadata"] = {
        "pdf_path": row.doc_id,
        "extraction_method": {"text": "text_extraction", "ocr": "ocr"}.get(
            row.route, "hybrid"),
        "processor": f"{row.vendor}_processor",
        "total_pages": row.n_pages,
        "confidence_score": row.extraction_confidence,
    }
    doc["additional_fields"] = {
        k: v for k, v in fields.items() if k not in U.FIELD_MAP
    }
    doc["additional_info"] = [s.text for s in spans if s.kind == "info"]
    doc["marks"] = [s.text for s in spans if s.kind == "mark"]
    return doc


@pytest.fixture(scope="module")
def result_rows(spark):
    res = run_pipeline(corpus_df(spark, n_docs=96, seed=42))
    # one materialization serves both sides (the projection re-reads it)
    res = res.localCheckpoint(eager=True)
    rows = {r["doc_id"]: r for r in res.collect()}
    got = {
        r["doc_id"]: json.loads(r["unified_json"])
        for r in U.to_unified_json(res).collect()
    }
    return rows, got


def test_unified_json_matches_independent_construction(result_rows):
    rows, got = result_rows
    assert set(got) == set(rows)
    checked_sections = 0
    for doc_id, row in rows.items():
        exp = _expected(row)
        assert got[doc_id] == exp, doc_id
        checked_sections += sum(1 for v in exp.values() if v)
    assert checked_sections > 0


def test_unified_json_drops_nulls_and_maps_vocabulary(result_rows):
    rows, got = result_rows
    # _clean_none_values analog: no null values anywhere in the emitted JSON
    def no_nulls(x):
        if isinstance(x, dict):
            return all(v is not None and no_nulls(v) for v in x.values())
        if isinstance(x, list):
            return all(v is not None and no_nulls(v) for v in x)
        return True

    assert all(no_nulls(d) for d in got.values())
    methods = {d["metadata"]["extraction_method"] for d in got.values()}
    assert methods <= {"text_extraction", "ocr", "hybrid"}
    # the fixtures exercise real content in every major section somewhere
    populated = set()
    for d in got.values():
        for sec in ("invoice_header", "vendor_info", "customer_info",
                    "totals", "payment_terms", "shipping_info"):
            if d.get(sec):
                populated.add(sec)
        if d["line_items"]:
            populated.add("line_items")
        if d["additional_fields"]:
            populated.add("additional_fields")
        if d["additional_info"]:
            populated.add("additional_info")
    assert {"invoice_header", "vendor_info", "customer_info", "totals",
            "line_items", "additional_fields"} <= populated


def test_unified_json_single_out_spans_reference(spark):
    """The projection must reference out_spans exactly ONCE in the plan
    (explode), never one filter() per projected field over the emission
    expression — that duplication OOMs codegen (round-2 measurement)."""
    res = run_pipeline(corpus_df(spark, n_docs=8, seed=42))
    plan = U.to_unified_json(res)._sc._jvm.PythonSQLUtils.explainString(
        U.to_unified_json(res)._jdf.queryExecution(), "formatted"
    )
    assert plan.count("Generate") <= 2  # one explode (+ its reuse row)
