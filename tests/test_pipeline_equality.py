"""The validation contract (BASELINE.json): span-sequence equality on
(kind, text, media_ref, order) between the Spark engine and the pure-Python
oracle, per document, over the deterministic synthetic corpus."""

from __future__ import annotations

import pytest

from pdf_extractor_scripts_spark.fixtures import make_corpus, corpus_df
from pdf_extractor_scripts_spark.oracle import extract_document
from pdf_extractor_scripts_spark.plans.pipeline import run_pipeline

N_DOCS = 120


@pytest.fixture(scope="module")
def engine_results(spark):
    docs = corpus_df(spark, n_docs=N_DOCS, seed=42)
    res = run_pipeline(docs).collect()
    return {r["doc_id"]: r for r in res}


@pytest.fixture(scope="module")
def oracle_results():
    return {
        d["doc_id"]: extract_document(d["doc_id"], d["spans"])
        for d in make_corpus(N_DOCS, seed=42)
    }


def test_all_docs_present(engine_results, oracle_results):
    assert set(engine_results) == set(oracle_results)


def test_vendor_and_route_match(engine_results, oracle_results):
    for doc_id, exp in oracle_results.items():
        got = engine_results[doc_id]
        assert got["vendor"] == exp["vendor"], f"{doc_id}: vendor"
        assert got["route"] == exp["route"], f"{doc_id}: route"


def test_span_sequence_equality(engine_results, oracle_results):
    """The per-row invariant: (kind, text, media_ref, order) must match
    exactly, in order, for every document."""
    mismatches = []
    for doc_id, exp in oracle_results.items():
        got = engine_results[doc_id]
        exp_spans = [s.as_tuple() for s in exp["out_spans"]]
        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in got["out_spans"]
        ]
        if exp_spans != got_spans:
            for i, (e, g) in enumerate(zip(exp_spans, got_spans)):
                if e != g:
                    mismatches.append(f"{doc_id}[{i}]: oracle={e} engine={g}")
                    break
            else:
                mismatches.append(
                    f"{doc_id}: length oracle={len(exp_spans)} engine={len(got_spans)} "
                    f"tail_oracle={exp_spans[len(got_spans):][:2]} "
                    f"tail_engine={got_spans[len(exp_spans):][:2]}"
                )
    assert not mismatches, "\n".join(mismatches[:10]) + f"\n({len(mismatches)} docs differ)"


def test_validation_and_metrics_flags(engine_results, oracle_results):
    for doc_id, exp in oracle_results.items():
        got = engine_results[doc_id]
        assert got["validation_failed"] == exp["validation_failed"], doc_id
        assert got["ocr_used"] == exp["ocr_used"], doc_id
        assert got["n_pages"] == exp["n_pages"], doc_id


def test_confidence_scoring_matches(engine_results, oracle_results):
    """A1 weighted confidence: engine's native SQL vs the oracle's Python."""
    for doc_id, exp in oracle_results.items():
        got = engine_results[doc_id]
        assert abs(got["extraction_confidence"] - exp["extraction_confidence"]) < 1e-9, (
            f"{doc_id}: engine={got['extraction_confidence']} "
            f"oracle={exp['extraction_confidence']}"
        )
