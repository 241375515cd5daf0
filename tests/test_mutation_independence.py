"""Mutation tests for engine/oracle independence (r3 VERDICT #1).

The round-3 verdict's one methodological defect: the Arrow kernel imported
oracle functions directly for F5 address blocks, step-3b, image-route F3,
F13, O6 and A3/A4 — so for those paths the span-equality contract compared
a function with itself and could never catch a bug. The kernel now calls
operators/independent.py instead. These tests PROVE the property the
verdict asked for: deliberately break the oracle's copy and assert the two
sides DIVERGE (the contract would now catch such a bug on either side),
and statically assert the engine package no longer imports the oracle at
all.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_scripts_spark import config as C
from pdf_extractor_scripts_spark import oracle as O
from pdf_extractor_scripts_spark.fixtures import make_corpus
from pdf_extractor_scripts_spark.operators import independent as I
from pdf_extractor_scripts_spark.operators import items as items_mod
from pdf_extractor_scripts_spark.operators.kernel import extract_fields_batch


def _docs_by_vendor(vendor: str, n: int = 200, seed: int = 42):
    out = []
    for d in make_corpus(n, seed=seed):
        v, _conf = O.detect_vendor(d["doc_id"], O.assemble(d["spans"], "text"))
        if v == vendor:
            out.append(d)
    return out


def _engine_fields(vendor: str, text: str) -> dict:
    got = extract_fields_batch(pd.Series([vendor]), pd.Series([text]))[0]
    return got or {}


# ---------------------------------------------------------------------------
# Static blast-radius check: the engine package must not touch the oracle
# ---------------------------------------------------------------------------
def test_engine_package_never_imports_oracle():
    import pathlib

    import pdf_extractor_scripts_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for py in root.rglob("*.py"):
        if py.name == "oracle.py":
            continue
        src = py.read_text()
        if "import oracle" in src or "from .oracle" in src or "from ..oracle" in src:
            offenders.append(str(py))
    assert offenders == [], (
        "engine modules must not import the oracle — the span-equality "
        f"contract needs two independent implementations: {offenders}"
    )


# ---------------------------------------------------------------------------
# F5 address blocks — the verdict's named path #1
# ---------------------------------------------------------------------------
def test_f5_mutation_diverges(monkeypatch):
    docs = _docs_by_vendor("schlage")
    texts = [O.assemble(d["spans"], "text") for d in docs]
    # baseline: the two implementations agree on every schlage fixture and
    # at least one document actually carries an address section
    hits = 0
    for t in texts:
        assert _engine_fields("schlage", t) == O.extract_fields("schlage", t)
        if any(k.endswith("_street") for k in O.extract_fields("schlage", t)):
            hits += 1
    assert hits > 0, "fixtures must exercise F5"

    # mutate the ORACLE's section extractor — the classic adoption bug:
    # collection stops one line early
    real = O._schlage_section

    def broken(lines, name):
        got = real(lines, name)
        got.pop("street", None)
        return got

    monkeypatch.setattr(O, "_schlage_section", broken)
    diverged = any(
        _engine_fields("schlage", t) != O.extract_fields("schlage", t)
        for t in texts
    )
    assert diverged, (
        "breaking oracle._schlage_section must diverge from the engine — "
        "if it does not, the kernel is still calling the oracle's F5"
    )


def test_f5_ceco_mutation_diverges(monkeypatch):
    docs = _docs_by_vendor("ceco")
    texts = [O.assemble(d["spans"], "text") for d in docs]
    for t in texts:
        assert _engine_fields("ceco", t) == O.extract_fields("ceco", t)

    monkeypatch.setattr(O, "_ceco_customer_remit", lambda text, fields: None)
    assert any(
        _engine_fields("ceco", t) != O.extract_fields("ceco", t) for t in texts
    )


# ---------------------------------------------------------------------------
# Step-3b — the verdict's named path #2
# ---------------------------------------------------------------------------
def _step3b_cases():
    """(vendor, method, fields, items, info, text, ocr) tuples that reach
    every step-3b branch: enhance (valid+confident), OCR fallback
    (text-method inadequate), TPP fallback (schlage OCR-method)."""
    cases = []
    for vendor in ("schlage", "ceco", "steelcraft", "generic"):
        for d in _docs_by_vendor(vendor)[:4]:
            text = O.assemble(d["spans"], "text")
            ocr = O.ocr_full_text(d["spans"])
            fields = O.extract_fields(vendor, text)
            items = O.extract_items(vendor, text, fields)
            info = O._schlage_additional_info(text) if vendor == "schlage" else []
            for method in ("text", "ocr"):
                cases.append((vendor, method, fields, items, info, text, ocr))
    # a constructed valid+confident case whose ENHANCE pass provably
    # matters (ext backfill from qty*unit and the subtotal sum-fill) —
    # the synthetic fixtures' specialized items are usually complete, so
    # the mutation below needs a case where enhancement changes bytes
    cases.append((
        "generic", "text",
        {"header.invoice_number": "INV-12345",
         "header.invoice_date": "01/02/2024",
         "vendor.name": "Acme Industrial Corp",
         "customer.company": "Foo Manufacturing",
         "totals.total": "100.00", "payment.terms": "NET 30"},
        [{"line": "1", "marks": [],
          "serialized": "line=1|code=A1|qty=2|desc=Widget|unit=10.50|ext=21.00"},
         {"line": "2", "marks": [],
          "serialized": "line=2|code=B2|qty=3|desc=Gadget|unit=5.00|ext="}],
        [], "T", "O",
    ))
    return cases


def test_step3b_baseline_and_mutation(monkeypatch):
    cases = _step3b_cases()
    assert cases
    for c in cases:
        vendor, method, fields, items, info, text, ocr = c
        assert I.step3b(vendor, method, dict(fields), list(items), list(info),
                        text, ocr) == \
            O.step3b(vendor, method, dict(fields), list(items), list(info),
                     text, ocr), (vendor, method)

    # mutation 1: break the oracle's enhancement (drop the subtotal fill)
    monkeypatch.setattr(
        O, "enhance_fields",
        lambda vendor, fields, items: (dict(fields), list(items)),
    )
    diverged = any(
        I.step3b(v, m, dict(f), list(it), list(inf), t, oc)
        != O.step3b(v, m, dict(f), list(it), list(inf), t, oc)
        for v, m, f, it, inf, t, oc in cases
    )
    assert diverged, "breaking oracle.enhance_fields must diverge"


def test_step3b_confidence_mutation_diverges(monkeypatch):
    cases = _step3b_cases()
    # mutation 2: break the J2 compare — oracle's fallback always wins
    monkeypatch.setattr(O, "a7_schlage_accuracy", lambda fields, items: 0.0)
    diverged = any(
        I.step3b(v, m, dict(f), list(it), list(inf), t, oc)
        != O.step3b(v, m, dict(f), list(it), list(inf), t, oc)
        for v, m, f, it, inf, t, oc in cases
        if v == "schlage"
    )
    assert diverged, "breaking oracle.a7 must flip a schlage step-3b pick"


# ---------------------------------------------------------------------------
# The remaining shared paths: F13, O6, image-route F3, A3
# ---------------------------------------------------------------------------
def test_f13_info_mutation_diverges(monkeypatch):
    texts = [O.assemble(d["spans"], "text") for d in _docs_by_vendor("schlage")]
    assert any(O._schlage_additional_info(t) for t in texts), \
        "fixtures must exercise F13"
    for t in texts:
        assert I.schlage_additional_info(t) == O._schlage_additional_info(t)
    # config is shared data (regex banks), so mutate the ORACLE FUNCTION
    real = O._schlage_additional_info
    monkeypatch.setattr(O, "_schlage_additional_info", lambda t: real(t)[:-1])
    assert any(
        I.schlage_additional_info(t) != O._schlage_additional_info(t)
        for t in texts if I.schlage_additional_info(t)
    )


def test_o6_pick_mutation_diverges():
    docs = _docs_by_vendor("schlage")
    triples = []
    for d in docs:
        text = O.assemble(d["spans"], "text")
        full = O.ocr_full_text(d["spans"])
        conf = O.ocr_engine_conf01(d["spans"])
        triples.append((text, full, conf))
        assert I.schlage_pick_text(text, full, conf) == \
            O.schlage_pick_text(text, full, conf)
    # engine-side mutation this time (symmetry: a bug on EITHER side must
    # surface): break the independent quality scorer and assert divergence
    real = I._schlage_text_quality
    try:
        I._schlage_text_quality = lambda text: 0.0
        assert any(
            I.schlage_pick_text(t, f, c) != O.schlage_pick_text(t, f, c)
            for t, f, c in triples
            if len(f.strip()) > C.SCHLAGE_O6_TEXT_MIN and c > 0
        )
    finally:
        I._schlage_text_quality = real


def test_image_route_mutation_diverges(monkeypatch):
    texts = [O.ocr_full_text(d["spans"]) for d in make_corpus(120, seed=42)]
    texts = [t for t in texts if t.strip()]
    for t in texts:
        assert I.image_route_extract(t) == O.image_route_extract(t)
    assert any(O.image_route_extract(t)[0] for t in texts), \
        "fixtures must exercise the F3 bank"
    real = O.f3_extract_all
    monkeypatch.setattr(
        O, "f3_extract_all",
        lambda text: {k: v for k, v in real(text).items()
                      if k != "invoice_number"},
    )
    assert any(
        I.image_route_extract(t) != O.image_route_extract(t) for t in texts
    )


def test_a3_confidence_parity_and_mutation(monkeypatch):
    for vendor in ("generic", "ceco", "schlage", "steelcraft"):
        for d in _docs_by_vendor(vendor)[:5]:
            text = O.assemble(d["spans"], "text")
            fields = O.extract_fields(vendor, text)
            items = O.extract_items(vendor, text, fields)
            assert I.a3_text_confidence(vendor, fields, items) == \
                O.a3_text_confidence(vendor, fields, items)
            assert I.a2_completeness(vendor, fields, items) == \
                O.a2_completeness(vendor, fields, items)
            assert I.validate_fields(vendor, fields, items) == \
                O.validate_fields(vendor, fields, items)
            for conf in (0.0, 69.9, 70.0, 95.0):
                assert I.p10_adequate(vendor, fields, items, conf) == \
                    O.p10_adequate(vendor, fields, items, conf)


# ---------------------------------------------------------------------------
# r5 (VERDICT r4 #7): source-transformation mutants for the paths whose
# float formulas are shared expression-for-expression between the two
# implementations — P10's threshold, the A3/A4 scoring rubrics, and the
# step-3b strict-`>` tie branch. A transcription bug in those exact
# formulas would agree on both sides; these mutants prove the CONTRACT
# still catches a semantic drift in any one of them.
# ---------------------------------------------------------------------------
def _mutant(func, old: str, new: str):
    """Compile a copy of ``func`` with ``old`` replaced by ``new`` in its
    source, bound to a snapshot of its module globals."""
    import inspect
    import textwrap

    src = textwrap.dedent(inspect.getsource(func))
    assert old in src, f"mutation target {old!r} not found in {func.__name__}"
    ns = dict(func.__globals__)
    exec(compile(src.replace(old, new), "<mutant>", "exec"), ns)
    return ns[func.__name__]


def test_p10_threshold_mutation_diverges():
    # mutate the oracle's adequacy gate: `< 70` becomes `<= 70` — a
    # boundary transcription bug. At confidence exactly 70.0 the real
    # implementations admit adequate results; the mutant rejects them.
    mut = _mutant(
        O.p10_adequate,
        "if confidence < C.MIN_CONFIDENCE_THRESHOLD:",
        "if confidence <= C.MIN_CONFIDENCE_THRESHOLD:",
    )
    diverged = False
    for vendor in ("generic", "ceco", "schlage", "steelcraft"):
        for d in _docs_by_vendor(vendor)[:5]:
            text = O.assemble(d["spans"], "text")
            fields = O.extract_fields(vendor, text)
            items = O.extract_items(vendor, text, fields)
            if I.p10_adequate(vendor, fields, items, 70.0) != mut(
                vendor, fields, items, 70.0
            ):
                diverged = True
    assert diverged, "boundary mutant must flip some fixture document"


def test_a3_a4_formula_mutations_diverge():
    # A3: the invoice-number presence weight 15 -> 14
    mut3 = _mutant(O.a3_text_confidence, "conf += 15", "conf += 14")
    diverged = False
    for vendor in ("generic", "ceco", "schlage", "steelcraft"):
        for d in _docs_by_vendor(vendor)[:5]:
            text = O.assemble(d["spans"], "text")
            fields = O.extract_fields(vendor, text)
            items = O.extract_items(vendor, text, fields)
            if I.a3_text_confidence(vendor, fields, items) != mut3(
                vendor, fields, items
            ):
                diverged = True
    assert diverged, "A3 weight mutant must diverge on fixture traffic"

    # A4: the stub engine-confidence constant zeroed out
    mut4 = _mutant(
        O.a4_ocr_confidence,
        'return C.OCR_ENGINE_CONF["primary"] if has else 0.0',
        "return 0.0",
    )
    ocr_texts = [
        O.select_ocr_text(d["spans"]) for d in make_corpus(60, seed=42)
    ]
    assert any(I.a4_ocr_confidence(t) > 0 for t in ocr_texts)
    assert any(
        I.a4_ocr_confidence(t) != mut4(t) for t in ocr_texts
    ), "A4 constant mutant must diverge on fixture traffic"


def test_step3b_tie_goes_to_primary_and_strict_compare_mutation():
    # J2 tie case (fallback_processor.py:370-381 uses STRICT >): an invalid
    # empty schlage OCR-method result ties its text fallback at 0.0 — the
    # primary keeps, so its additional_info survives. The `>=` mutant takes
    # the fallback, which carries no additional_info, so info empties:
    # observable divergence even though fields/items tie as empty.
    args = ("schlage", "ocr", {}, [], ["HANDLE WITH CARE"], "", "")
    real = O.step3b(*[_copy(a) for a in args])
    eng = I.step3b(*[_copy(a) for a in args])
    assert eng == real == ({}, [], ["HANDLE WITH CARE"])

    mut = _mutant(O.step3b, "if fb_conf > conf:", "if fb_conf >= conf:")
    mutated = mut(*[_copy(a) for a in args])
    assert mutated == ({}, [], [])
    assert eng != mutated, "strict-compare mutant must flip the tie case"


def _copy(a):
    return dict(a) if isinstance(a, dict) else (list(a) if isinstance(a, list) else a)
