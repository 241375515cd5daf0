"""Comparison-harness tier (engine vs oracle similarity must be 1.0;
degraded outputs must score below) and the S8 config-override mechanism."""

from __future__ import annotations

import pytest

import json
import os
import tempfile

import pyspark.sql.functions as F

from pdf_extractor_scripts_spark import config as C
from pdf_extractor_scripts_spark import oracle as O
from pdf_extractor_scripts_spark.fixtures import corpus_df, make_corpus
from pdf_extractor_scripts_spark.operators.compare_text import (
    compare_extractions,
    comparison_summary,
)
from pdf_extractor_scripts_spark.plans.pipeline import run_pipeline
from pdf_extractor_scripts_spark.schemas import RESULT_SCHEMA


def _oracle_results_df(spark, n):
    rows = []
    for d in make_corpus(n, seed=42):
        r = O.extract_document(d["doc_id"], d["spans"])
        rows.append(
            (
                d["doc_id"], r["vendor"], r["route"],
                [s.as_tuple() for s in r["out_spans"]],
                r["validation_failed"], r["ocr_used"], r["n_pages"],
            )
        )
    return spark.createDataFrame(rows, schema=RESULT_SCHEMA)


def test_comparison_harness_engine_vs_oracle(spark):
    n = 40
    engine = run_pipeline(corpus_df(spark, n_docs=n, seed=42))
    oracle = _oracle_results_df(spark, n)
    cmp = compare_extractions(engine, oracle)
    s = comparison_summary(cmp).first()
    assert s["n_docs"] == n
    assert s["n_exact"] == n
    assert s["avg_similarity"] == 1.0
    assert s["avg_numeric_recall"] == 1.0

    # degraded variant: drop the last span from each doc → similarity < 1
    degraded = engine.withColumn(
        "out_spans", F.expr("slice(out_spans, 1, greatest(size(out_spans) - 1, 0))")
    )
    s2 = comparison_summary(compare_extractions(engine, degraded)).first()
    assert s2["n_exact"] < n
    assert s2["avg_similarity"] < 1.0


def test_config_overrides_roundtrip(tmp_path=None):
    ov = {
        "text_thresholds": {"generic": 10_000},
        "field_banks": {"generic": {"header.invoice_number": [r"XX-(\d+)"]}},
    }
    fd, path = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as f:
        json.dump(ov, f)
    loaded = C.load_overrides(path)
    inverse = C.apply_overrides(loaded)
    try:
        # routing now sends generic docs to OCR (threshold unreachable)
        spans = [
            {"kind": "page_break", "text": "=== PAGE 1 ===", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "Invoice Number: ABC-12345", "media_ref": "", "offset": 1},
        ]
        assert O.route_document("generic", spans) == "ocr"
        # the overridden pattern bank no longer matches the old grammar
        assert "header.invoice_number" not in O.extract_fields(
            "generic", "Invoice Number: ABC-12345"
        )
        assert O.extract_fields("generic", "XX-777")["header.invoice_number"] == "777"
    finally:
        C.restore_overrides(inverse)
        os.unlink(path)
    assert C.TEXT_THRESHOLDS["generic"] == 50
    assert O.extract_fields("generic", "Invoice Number: ABC-12345")[
        "header.invoice_number"
    ] == "ABC-12345"


def test_overrides_reach_executors_end_to_end(spark):
    """S8 overrides must affect the DISTRIBUTED extraction path, not only the
    oracle: executor workers re-import config with pristine defaults, so the
    effective banks have to travel in the UDF closure (operators/extract.py).

    Override the generic invoice-number bank to capture only the digits after
    the dash; the pipeline's emitted field span must reflect that."""
    ov = {
        "field_banks": {
            "generic": {"header.invoice_number": [r"Invoice Number:\s*[A-Z]+-(\d+)"]}
        }
    }
    inverse = C.apply_overrides(ov)
    try:
        docs = corpus_df(spark, n_docs=30, seed=42).filter(
            # generic TEXT-route docs: the media-only misc/scan_* docs
            # parse through the IMAGE bank family (audit §23), which S8
            # bank overrides deliberately do not touch
            F.col("doc_id").startswith("misc/invoice_")
        )
        # collect the result rows directly — layering filter/explode exprs on
        # top of the emission mega-expression duplicates it in codegen
        rows = run_pipeline(docs).select("out_spans").collect()
        vals = [
            s["text"]
            for r in rows
            for s in r["out_spans"]
            if s["kind"] == "field:header.invoice_number"
        ]
        assert vals, "no generic invoice_number spans emitted"
        for t in vals:
            # overridden pattern keeps digits only — no 'ABC-' prefix survives
            assert t.isdigit(), f"override did not reach executor: {t}"
    finally:
        C.restore_overrides(inverse)


def test_ref_text_quality_rubric_hand_case():
    """The reference rubric (text_extraction_comparison.py:60-190) on a
    hand-computed document — every score derived manually from the
    formulas, including the quirks: the case-sensitive 'Invoice' spacing
    skip and the decimals-only numeric pattern."""
    from pdf_extractor_scripts_spark.operators.compare_text import ref_text_quality

    text = "\n".join([
        "Invoice 500",                          # spacing-skipped ('Invoice')
        "  001  12   Widget A   10.50   21.00", # item line, wide gaps
        "  001  13   Widget B   11.50   23.00", # item line, same layout
        "Total: 44.00",                         # data line, no 3-space gap
        "",                                     # blank → skipped
    ])
    q = ref_text_quality(text)
    assert q["total_lines"] == 5
    assert q["spacing_preservation_score"] == pytest.approx(100 * 2 / 3)
    # both item lines place 10.50/11.50 and 21.00/23.00 at equal offsets
    assert q["column_alignment_score"] == 100.0
    # all five decimals have <= 6 fractional digits
    assert q["numeric_accuracy_score"] == 100.0
    # item lines carry only 2 decimal numbers each → no 'complete' items
    assert q["line_item_detection_score"] == 0.0
    assert q["overall_quality_score"] == pytest.approx(
        (100 * 2 / 3) * 0.25 + 100.0 * 0.30 + 100.0 * 0.25 + 0.0 * 0.20
    )
    # shifting ONLY the last column of line 2 by 4 chars (> the 3-char
    # tolerance) misaligns that one column pair; shifting an earlier
    # column moves the whole tail and zeroes both (checked too)
    q2 = ref_text_quality(text.replace("11.50   23.00", "11.50       23.00"))
    assert q2["column_alignment_score"] == pytest.approx(50.0)
    q3 = ref_text_quality(text.replace("  11.50", "        11.50"))
    assert q3["column_alignment_score"] == 0.0
    # empty text → zeros
    assert ref_text_quality("")["overall_quality_score"] == 0.0


def test_with_text_quality_distributed_matches_local(spark):
    """The Arrow UDF form must agree per-doc with the local function over
    real assembled fixture texts, and the side-by-side comparison reports
    the reference's 0-100 similarity scale."""
    import pyspark.sql.functions as F

    from pdf_extractor_scripts_spark import oracle as O
    from pdf_extractor_scripts_spark.fixtures import make_corpus
    from pdf_extractor_scripts_spark.operators.compare_text import (
        quality_comparison,
        ref_text_quality,
        with_text_quality,
    )

    docs = make_corpus(40, seed=42)
    rows = [(d["doc_id"], O.assemble(d["spans"], "text")) for d in docs]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: r["quality"].asDict()
        for r in with_text_quality(df).collect()
    }
    assert len(got) == 40
    nonzero = 0
    for doc_id, text in rows:
        exp = ref_text_quality(text)
        for k, v in exp.items():
            assert got[doc_id][k] == pytest.approx(v), (doc_id, k)
        nonzero += exp["overall_quality_score"] > 0
    assert nonzero > 20, "fixtures must exercise the rubric"

    cmp = quality_comparison(df, df.withColumn("text", F.upper("text")))
    row = cmp.filter(F.col("doc_id") == rows[0][0]).collect()[0]
    assert 0.0 < row["similarity_score"] <= 100.0
    assert row["quality_a"]["total_characters"] == len(rows[0][1])


def test_quality_comparison_differences_and_advantages(spark):
    """find_key_differences + advantages semantics
    (text_extraction_comparison.py:201-262): line-item count mismatch,
    numeric set differences capped at 5, and the ties-go-to-B strict-> advantage quirk."""
    from pdf_extractor_scripts_spark.operators.compare_text import (
        quality_comparison,
    )

    a_text = "\n".join([
        "  001  12   Widget   10.50   21.00",
        "  002  13   Gadget   5.25    10.50",
        "Extra: 99.99",
    ])
    b_text = "\n".join([
        "  001  12   Widget   10.50   21.00",
        "Other: 7.77",
    ])
    a = spark.createDataFrame([("d1", a_text)], "doc_id string, text string")
    b = spark.createDataFrame([("d1", b_text)], "doc_id string, text string")
    row = quality_comparison(a, b).collect()[0]
    diffs = row["differences"]
    assert any(d.startswith("Line item count: A=2, B=1") for d in diffs)
    assert any("missing in B: " in d and "5.25" in d and "99.99" in d
               for d in diffs)
    assert any("missing in A: 7.77" in d for d in diffs)
    # identical sides → no differences; ALL advantages go to B (ties-go-to-B)
    row2 = quality_comparison(a, a.withColumnRenamed("text", "text")).collect()[0]
    assert row2["differences"] == []
    assert {adv["side"] for adv in row2["advantages"]} == {"b"}
    assert len(row2["advantages"]) == 3


def test_render_side_by_side_format():
    """visual_text_comparison.py:28-55 format: 120-wide banner, 60/60
    columns, 58+'..' truncation, shorter side padded with blanks."""
    from pdf_extractor_scripts_spark.operators.compare_text import (
        render_side_by_side,
    )

    a = "short\n" + "x" * 70
    b = "only line"
    out = render_side_by_side(a, b, "TEST").split("\n")
    assert out[0] == "=" * 120 and "TEST" in out[1]
    assert out[5].startswith("short") and out[5][60:62] == " |"
    assert out[6].startswith("x" * 58 + "..")
    assert out[6].rstrip().endswith("|")  # b side blank on row 2


def test_structure_profile_and_comparison(spark):
    """r5: the visual_text_comparison.py analyzers (line-item structure
    :52-77, spacing patterns :78-103, numeric precision :104-134) as
    JVM-side per-doc columns — hand-computed pin values."""
    from pdf_extractor_scripts_spark.operators.compare_text import (
        structure_comparison,
        structure_profile,
    )

    a = spark.createDataFrame(
        [
            ("d1", "001 WIDGET A     2  3.50  7.00\nTOTAL      10.50\nplain line"),
            ("d2", "no items here 1.25 1.25 2.50"),
        ],
        ["doc_id", "text"],
    )
    prof = {r["doc_id"]: r for r in structure_profile(a).collect()}
    assert (prof["d1"]["n_line_items"], prof["d1"]["n_spaced_lines"],
            prof["d1"]["n_decimals"], prof["d1"]["n_unique_decimals"]) == (1, 2, 3, 3)
    assert (prof["d2"]["n_line_items"], prof["d2"]["n_spaced_lines"],
            prof["d2"]["n_decimals"], prof["d2"]["n_unique_decimals"]) == (0, 0, 3, 2)

    b = spark.createDataFrame(
        [("d1", "001 WIDGET A 2 3.50 6.99"), ("d2", "nothing")],
        ["doc_id", "text"],
    )
    cmp = {r["doc_id"]: r for r in structure_comparison(a, b).collect()}
    # d1: same item count; A has {3.50, 7.00, 10.50}, B has {3.50, 6.99}
    assert (cmp["d1"]["d_line_items"], cmp["d1"]["d_spaced_lines"]) == (0, 2)
    assert (cmp["d1"]["n_only_in_a"], cmp["d1"]["n_only_in_b"],
            cmp["d1"]["n_common"]) == (2, 1, 1)
    assert (cmp["d2"]["n_only_in_a"], cmp["d2"]["n_common"]) == (2, 0)
