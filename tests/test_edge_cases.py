"""Robustness tier: degenerate documents through the full pipeline, and
property-based invariants (hypothesis) for the kernels and the portable
hash family."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st

from pdf_extractor_scripts_spark import oracle as O
from pdf_extractor_scripts_spark.fixtures import make_corpus
from pdf_extractor_scripts_spark.plans.pipeline import run_pipeline
from pdf_extractor_scripts_spark.schemas import DOC_SCHEMA


def _doc(doc_id, spans):
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ],
    }


EDGE_DOCS = [
    _doc("misc/empty.pdf", []),
    _doc("misc/only_breaks.pdf", [("page_break", "=== PAGE 1 ===", ""),
                                  ("page_break", "=== PAGE 2 ===", "")]),
    _doc("misc/only_media.pdf", [("page_break", "=== PAGE 1 ===", ""),
                                 ("media", "", "img://m/1/0")]),
    _doc("schlage/999999-099 Schlage 001.pdf",
         [("page_break", "=== PAGE 1 ===", ""),
          ("media", "", "img://s/1/0"),
          ("media_text", "INVOICE# 1234567", "img://s/1/0"),
          ("media_text", "SUBTOTAL: 100.00", "img://s/1/0")]),
    _doc("misc/unicode.pdf", [("page_break", "=== PAGE 1 ===", ""),
                              ("text", "naïve café — ünïcode 🎉 text", "")]),
    _doc("misc/huge_line.pdf", [("page_break", "=== PAGE 1 ===", ""),
                                ("text", "x" * 50_000, "")]),
]


def test_edge_docs_engine_matches_oracle(spark):
    docs = spark.createDataFrame(EDGE_DOCS, schema=DOC_SCHEMA)
    got = {r["doc_id"]: r for r in run_pipeline(docs).collect()}
    assert set(got) == {d["doc_id"] for d in EDGE_DOCS}
    for d in EDGE_DOCS:
        exp = O.extract_document(d["doc_id"], d["spans"])
        g = got[d["doc_id"]]
        assert g["vendor"] == exp["vendor"], d["doc_id"]
        assert g["route"] == exp["route"], d["doc_id"]
        exp_spans = [s.as_tuple() for s in exp["out_spans"]]
        got_spans = [(s["kind"], s["text"], s["media_ref"], s["order"])
                     for s in g["out_spans"]]
        assert got_spans == exp_spans, d["doc_id"]


def test_schlage_derived_totals_fire_on_ocr_edge_doc():
    d = EDGE_DOCS[3]
    r = O.extract_document(d["doc_id"], d["spans"])
    kinds = {s.kind: s.text for s in r["out_spans"]}
    assert kinds.get("field:totals.surcharges") == "2.00"   # 2% of 100
    assert kinds.get("field:totals.shipping") == "3.00"     # 3% of 100


# ---------------------------------------------------------------------------
# Property-based invariants
# ---------------------------------------------------------------------------
span_strategy = st.lists(
    st.tuples(
        st.sampled_from(["text", "page_break", "media", "media_text", "rule"]),
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60),
        st.sampled_from(["", "img://x/1/0"]),
    ),
    max_size=25,
)


@settings(max_examples=60, deadline=None)
@given(spans=span_strategy, vendor_pick=st.integers(0, 3))
def test_oracle_never_crashes_and_emits_dense_order(spans, vendor_pick):
    doc_id = ["ceco/F1A-I-1.pdf", "steelcraft/Allegion - Steelcraft 1.pdf",
              "schlage/1-1 Schlage 1.pdf", "misc/x.pdf"][vendor_pick]
    r = O.extract_document(doc_id, _doc(doc_id, spans)["spans"])
    orders = [s.order for s in r["out_spans"]]
    assert orders == list(range(len(orders)))  # dense 0-based
    n_media_in = sum(1 for k, _, _ in spans if k == "media")
    n_media_out = sum(1 for s in r["out_spans"] if s.kind == "media")
    assert n_media_out == n_media_in  # media pass-through is lossless


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abcdefgh ", max_size=20), max_size=30))
def test_dedupe_keep_order_properties(vals):
    out = O._dedupe_keep_order(vals)
    assert len(out) == len(set(vals))
    assert out == O._dedupe_keep_order(out)  # idempotent
    seen = set()
    expected = [v for v in vals if not (v in seen or seen.add(v))]
    assert out == expected


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=120))
def test_portable_shingle_hash_matches_duckdb(text):
    """The arithmetic shingle/minhash family must agree bit-for-bit between
    the Python definition, DuckDB, and (by the gate tests) Spark."""
    import duckdb

    from pdf_extractor_scripts_spark.functions.portable import (
        MOD_SHINGLE, shingle_hashes_sql,
    )

    expected = [
        (ord(text[i]) * 961 + ord(text[i + 1]) * 31 + ord(text[i + 2])) % MOD_SHINGLE
        for i in range(len(text) - 2)
    ] if len(text) >= 3 else []
    con = duckdb.connect()
    sql = shingle_hashes_sql("t", "duckdb")
    got = con.execute(f"SELECT {sql} FROM (SELECT ? AS t)", [text]).fetchone()[0]
    assert list(got) == expected


def test_random_soup_through_spark_pipeline(spark):
    """50 seeded adversarial docs (regex metachars, quotes, newlines,
    control chars, long runs) through the REAL distributed pipeline must
    match the oracle span-for-span."""
    import random

    rng = random.Random(1234)
    alphabet = (
        "abcXYZ0123456789 .*+?()[]{}|\\^$'\"`\n\t;,%_-=@#&/"
        + "äöüß日本語🎉"
    )
    kinds = ["text", "page_break", "media", "media_text", "rule"]
    prefixes = ["ceco/F1A-I-9.pdf", "steelcraft/Allegion - Steelcraft 9.pdf",
                "schlage/9-9 Schlage 9.pdf", "misc/soup.pdf"]
    docs = []
    for i in range(50):
        spans = []
        for off in range(rng.randint(0, 20)):
            k = rng.choice(kinds)
            t = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
            spans.append({
                "kind": k,
                "text": "" if k == "media" else t,
                "media_ref": f"img://soup/{i}/{off}" if k in ("media", "media_text") else "",
                "offset": off,
            })
        docs.append({"doc_id": f"{i}-{prefixes[i % 4]}", "spans": spans})

    sdf = spark.createDataFrame(docs, schema=DOC_SCHEMA)
    got = {r["doc_id"]: r for r in run_pipeline(sdf).collect()}
    for d in docs:
        exp = O.extract_document(d["doc_id"], d["spans"])
        g = got[d["doc_id"]]
        exp_spans = [s.as_tuple() for s in exp["out_spans"]]
        got_spans = [(s["kind"], s["text"], s["media_ref"], s["order"])
                     for s in g["out_spans"]]
        assert got_spans == exp_spans, d["doc_id"]
        assert g["vendor"] == exp["vendor"] and g["route"] == exp["route"], d["doc_id"]
