"""Unit tier: one test per operator-family quirk (SURVEY.md §5.2) — BO
folding, split-waybill rejoin, derived totals, order-preserving dedup,
detection cascade edges — on hand-crafted inputs, plus engine-kernel parity
with the oracle's independently-implemented field extractor."""

from __future__ import annotations

import pandas as pd

from pdf_extractor_scripts_spark import oracle as O
from pdf_extractor_scripts_spark.operators import items as I
from pdf_extractor_scripts_spark.operators.kernel import extract_fields_batch


def test_ceco_bo_folding_valid_and_invalid():
    # text_pdf_processor.py:2405-2414: bo valid iff qty_ord == qty_shp + bo;
    # an invalid third number folds into the description and qty_bo derives
    # from ord - shp (floor 0)
    lines = [
        "001 572 FR3PC 3 2 1",   # 3 == 2+1 → bo kept
        "002 572 FR4PC 5 2 1",   # 5 != 2+1 → folded, bo = 5-2 = 3
        "3 PIECE FRAME 829.000 54.871 374.11 374.12",
        "003 572 FR5PC 2 2 7",   # 2 != 2+7 → folded, bo = max(0, 2-2) = 0
    ]
    for impl in (O._ceco_items, I.ceco_items):
        items = impl(lines)
        assert "bo=1" in items[0]["serialized"], impl
        assert "bo=3" in items[1]["serialized"], impl
        # the invalid number is prepended to the description (ref :2412)
        assert "desc=1 3 PIECE FRAME" in items[1]["serialized"], impl
        assert "bo=0" in items[2]["serialized"], impl


def test_ceco_scan_window_bounded_and_next_header():
    # marks beyond the next header must attach to the NEXT item
    lines = [
        "001 572 FR3PC 1 1 0",
        "8241799(40)",
        "002 572 FR4PC 1 1 0",
        "8241800(41)",
    ]
    items = O._ceco_items(lines)
    assert items[0]["marks"] == ["8241799(40)"]
    assert items[1]["marks"] == ["8241800(41)"]


def test_ceco_dedupe_keeps_first():
    lines = ["001 572 FR3PC 1 1 0", "001 572 FR3PC 9 9 0"]
    items = O._ceco_items(lines)
    assert len(items) == 1
    assert "ord=1" in items[0]["serialized"]


def test_schlage_split_waybill_rejoin():
    # schlage_processor.py:1419-1445: base = 1Z[A-Z0-9]{13,16} anywhere,
    # digit continuation ^(\d{2,4}) within the NEXT TWO lines; base alone
    # kept iff >= 15 chars
    item = ("SCHLAGE UPS EXP 1 111 111 X*1 |D| FEB 28 85.00 54.64/00 4,280.16")
    base = "1Z59R8R803494ABC"  # 1Z + 14 chars → base form, len 16 >= 15

    for impl in (O._schlage_items, I.schlage_items):
        good = [item, base, "012"]
        items = impl(good, {})
        assert "waybill=1Z59R8R803494ABC012" in items[0]["serialized"], impl

        # continuation may be one line further (ref scans j+1..j+2)
        skip = [item, base, "PREPAY & ADD", "012"]
        items = impl(skip, {})
        assert "waybill=1Z59R8R803494ABC012" in items[0]["serialized"], impl

        # no continuation: base >= 15 chars is kept alone
        alone = [item, base, "PREPAY & ADD", "HANDLE WITH CARE PLEASE"]
        items = impl(alone, {})
        assert "waybill=1Z59R8R803494ABC|" in items[0]["serialized"] + "|", impl

        # too-short base with no continuation is dropped (1Z + 13 = 15 is
        # the floor; this one is below the base pattern entirely)
        short = [item, "1Z59R8R803", "NO DIGITS HERE"]
        items = impl(short, {})
        assert "waybill=" not in items[0]["serialized"], impl


def test_schlage_waybill_window_crosses_next_item():
    # the reference scan is i+1..i+7 bounded only by EOF — a waybill in the
    # window but after the NEXT item attaches to BOTH items
    item1 = "SCHLAGE UPS EXP 1 111 111 X*1 |D| FEB 28 85.00 54.64/00 4,280.16"
    item2 = "LCN UPS EXP 2 111 111 Y*1 |E| FEB 28 85.00 54.64/00 1,000.00"
    wb = "1Z59R8R80349403012"  # full form
    for impl in (O._schlage_items, I.schlage_items):
        items = impl([item1, item2, wb], {})
        assert f"waybill={wb}" in items[0]["serialized"], impl
        assert f"waybill={wb}" in items[1]["serialized"], impl


def test_schlage_waybill_window_is_seven_lines():
    # schlage_processor.py:1415: range(i+1, min(i+8, len(lines))) scans
    # i+1..i+7 — SEVEN lines. A waybill exactly 8 lines below the item is
    # outside the window (ADVICE r2: off-by-one vs the exclusive bound).
    item = "SCHLAGE UPS EXP 1 111 111 X*1 |D| FEB 28 85.00 54.64/00 4,280.16"
    pad = ["X"] * 6  # padding that matches nothing
    wb = "1Z59R8R80349403012"  # full form
    for impl in (O._schlage_items, I.schlage_items):
        inside = impl([item] + pad + [wb], {})  # wb at i+7: in window
        assert f"waybill={wb}" in inside[0]["serialized"], impl
        outside = impl([item] + pad + ["X", wb], {})  # wb at i+8: out
        assert "waybill=" not in outside[0]["serialized"], impl


def test_schlage_lines_stripped_before_classification():
    # schlage_processor.py:1400/:1416/:1427 strip every line before
    # matching; leading whitespace must not break the item header, the
    # continuation anchor ^(\d{2,4}), or freight keyword lines (ADVICE r2).
    item = "  SCHLAGE UPS EXP 1 111 111 X*1 |D| FEB 28 85.00 54.64/00 4,280.16"
    base = "\t1Z59R8R803494ABC"
    cont = "   012"
    freight = "  PREPAY & ADD"
    for impl in (O._schlage_items, I.schlage_items):
        items = impl([item, base, cont, freight], {})
        assert len(items) == 1, impl
        s = items[0]["serialized"]
        assert "waybill=1Z59R8R803494ABC012" in s, impl
        # freight stores the stripped line, as the reference's line_text
        assert "freight=PREPAY & ADD" in s, impl


def test_ceco_freight_colon_fallback_pattern():
    # ceco_processor.py:636-647: FREIGHT CHARGE first, then FREIGHT: —
    # first match wins; the no-freight default only fires when neither hits
    text_colon = "INVOICE\nFREIGHT: 316.50\nTOTAL SALE: 1.00"
    text_charge = "INVOICE\nFREIGHT CHARGE 99.10\nFREIGHT: 316.50"
    text_default = "INVOICE\nNO CASH DISCOUNT ON FREIGHT\nTOTAL SALE: 1.00"
    assert O.extract_fields("ceco", text_colon)["totals.freight"] == "316.50"
    assert O.extract_fields("ceco", text_charge)["totals.freight"] == "99.10"
    assert O.extract_fields("ceco", text_default)["totals.freight"] == "0.00"
    # colon form present → the default must NOT override the printed value
    both = "NO CASH DISCOUNT ON FREIGHT\nFREIGHT: 316.50"
    assert O.extract_fields("ceco", both)["totals.freight"] == "316.50"
    # kernel (vectorized twin) agrees
    got = extract_fields_batch(
        pd.Series(["ceco"] * 3), pd.Series([text_colon, text_charge, both])
    )
    assert [d["totals.freight"] for d in got] == ["316.50", "99.10", "316.50"]


def test_schlage_surcharge_synthesis_only_single_item():
    # schlage_processor.py:1505-1553 (audit §22 field set): single main
    # item + a surcharge amount → synthesized item with the MAIN brand,
    # item_number AGN_SURCHARGE, qty 1/1, list = unit = ext = amount,
    # discount '00.00', line_number from the running counter
    item = ("SCHLAGE UPS EXP 1 111 111 X*1 |D| FEB 28 85.00 54.64/00 4,280.16")
    one = O._schlage_items([item], {"totals.surcharges": "85.60"})
    assert len(one) == 2
    s = one[1]["serialized"]
    for frag in ("line=2", "brand=SCHLAGE", "code=AGN_SURCHARGE",
                 "desc=Surcharge Item", "ord=1", "shp=1", "list=85.60",
                 "disc=00.00", "unit=85.60", "ext=85.60"):
        assert frag in s, (frag, s)
    # no surcharge in totals → the SURCHARGES regex over the text is the
    # fallback amount source (:1516-1520)
    fb = O._schlage_items([item, "Surcharges $43.21"], {})
    assert "ext=43.21" in fb[1]["serialized"]
    # two main items → no synthesis
    two = O._schlage_items([item, item.replace(" 1 111", " 2 111")],
                           {"totals.surcharges": "85.60"})
    assert len(two) == 2 and all("AGN_SURCHARGE" not in i["serialized"] for i in two)


def test_schlage_derived_totals_ratios():
    # schlage_processor.py:1908-1920: 2% / 3% of subtotal when absent
    f = {"totals.subtotal": "4,000.00"}
    O._schlage_derived_totals(f)
    assert f["totals.surcharges"] == "80.00"
    assert f["totals.shipping"] == "120.00"
    g = {"totals.subtotal": "4,000.00", "totals.surcharges": "99.99"}
    O._schlage_derived_totals(g)
    assert g["totals.surcharges"] == "99.99"  # printed value wins


def test_ceco_labeled_marks_validated_by_format_gates():
    # audit §6 (text_pdf_processor.py:2905-2948): each comma part of a
    # labeled mark passes the format gates — price-like ^\d+\.\d{2}$ is
    # REJECTED first; HAPn(m), bare >=6-digit, and single-decimal forms pass;
    # the label itself is case-insensitive and needs whitespace after ':'
    lines = [
        "001 572 FR3PC 1 1 0",
        "MARK NO: HAP1(56),316.50,101.2,8241799",
    ]
    for impl in (O._ceco_items, I.ceco_items):
        items = impl(lines)
        assert items[0]["marks"] == ["HAP1(56)", "101.2", "8241799"], impl
        # lowercase label matches (reference findall is IGNORECASE)
        low = impl(["001 572 FR3PC 1 1 0", "mark no: HAP2"])
        assert low[0]["marks"] == ["HAP2"], impl
        # no whitespace after the colon → reference pattern does NOT match
        tight = impl(["001 572 FR3PC 1 1 0", "MARK NO:HAP2"])
        assert tight[0]["marks"] == [], impl


def test_ceco_standalone_mark_forms():
    # audit §6: standalone 4-8-digit parenthesized and 2-3-digit decimal
    # (1-2 places) lines are high-confidence marks (:2958-2979) — including
    # the price-looking standalone decimal, which the reference's
    # pattern-path gate accepts (the price reject only guards the labeled
    # path); 1-digit decimals and 3-digit parens are not mark shapes
    lines = [
        "001 572 FR3PC 1 1 0",
        "12345(20)",
        "101.25",
        "7.3",        # 1 digit before '.' → not a reference decimal mark
        "316(2)",     # 3 digits + parens → below the 4-digit floor
    ]
    for impl in (O._ceco_items, I.ceco_items):
        items = impl(lines)
        assert items[0]["marks"] == ["12345(20)", "101.25"], impl


def test_a1_confidence_normalized_by_total_weight():
    # audit §10 (text_pdf_processor.py:1015-1168): all seven sections are
    # scored on every document (payment/shipping at the default 0.05), so
    # the weighted sum divides by the constant total weight 1.10
    import pdf_extractor_scripts_spark.config as C

    assert abs(C.CONF_TOTAL_WEIGHT - 1.10) < 1e-9
    vendor = "ceco"
    sizes = C.SECTION_SIZES[vendor]
    # one field from every section the vendor banks + one item
    fields = {}
    for sec in sizes:
        key = next(k for k in C.FIELD_ORDER[vendor] if k.split(".", 1)[0] == sec)
        fields[key] = "x"
    got = O.score_confidence(vendor, fields, [{"line": "001"}])
    expected = round(
        sum(w * (1.0 / sizes[sec] if sec != "items" else 1.0)
            for sec, w in C.CONF_WEIGHTS.items()
            if sec == "items" or sizes.get(sec)) / C.CONF_TOTAL_WEIGHT,
        4,
    )
    assert got == expected
    # fully-extracted doc can never exceed 1.0 and a full bank maxes at
    # total-present-weight / 1.10
    assert got <= 1.0


def test_ocr_blank_alt_engine_loses_outright():
    # audit §7 (image_pdf_processor.py:457-462): an engine whose output is
    # whitespace-only is BLANK — the other engine wins without any quality
    # scoring or near-tie merging
    spans = [
        {"kind": "page_break", "text": "=== PAGE 1 ===", "media_ref": "", "offset": 0},
        {"kind": "media_text", "text": "INVOICE 123 TOTAL 5.00", "media_ref": "m", "offset": 1},
        {"kind": "media_text_alt", "text": "   ", "media_ref": "m", "offset": 2},
        {"kind": "media_text_alt", "text": "\t", "media_ref": "m", "offset": 3},
    ]
    got = O.select_ocr_text(spans)
    assert "INVOICE 123 TOTAL 5.00" in got
    assert "\t" not in got and "   " not in got


def test_order_preserving_dedup():
    assert O._dedupe_keep_order(["b", "a", "b", "c", "a"]) == ["b", "a", "c"]


def test_vendor_detection_combine_cases():
    # content >= 0.6 beats filename
    v, c = O.detect_vendor("misc/x.pdf", "STEELCRAFT NET SALES: JAMB ANCHOR")
    assert v == "steelcraft" and c >= 0.6
    # filename wins when content is weak
    v, _ = O.detect_vendor("ceco/F1234A-I-99.pdf", "nothing relevant")
    assert v == "ceco"
    # agreement boost caps at 1.0
    v, c = O.detect_vendor(
        "ceco/F1234A-I-99.pdf",
        "Ceco Door Products MILAN, TN YOU MAY DEDUCT A DISCOUNT TELECOM FRAME",
    )
    assert v == "ceco" and c == 1.0
    # nothing at all → generic
    v, c = O.detect_vendor("misc/x.pdf", "xxxx")
    assert v == "generic" and c == 0.0


def test_routing_thresholds_per_vendor():
    spans_small = [
        {"kind": "page_break", "text": "=== PAGE 1 ===", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "x" * 40, "media_ref": "", "offset": 1},
    ]
    # 40 chars: above schlage threshold (30) but below generic (50)
    assert O.route_document("schlage", spans_small) == "text"
    assert O.route_document("generic", spans_small) == "ocr"


def test_kernel_matches_oracle_fields_vectorized():
    """The pandas-vectorized field extractor and the oracle's re.search
    loop are independent implementations of the same banks."""
    texts = [
        "Invoice Number: 12345678\nInvoice Date: 6/12/25\nCeco Door Products\n"
        "YOU MAY DEDUCT A DISCOUNT OF $ 290.52 14526.12\nFREIGHT CHARGE 316.50",
        "INVOICE# 7858692\nSUBTOTAL: 4,280.16\nPAYMENT TERMS NET 30",
        "Invoice Number: ABC-12345\nSubtotal: $1,000.00",
        None,
    ]
    vendors = ["ceco", "schlage", "generic", "ceco"]
    got = extract_fields_batch(pd.Series(vendors), pd.Series(texts))
    for v, t, g in zip(vendors, texts, got):
        if t is None:
            assert g is None
        else:
            assert g == O.extract_fields(v, t)


def test_merge_routes_priority_invariants():
    """J1 merge laws: text-first sections prefer fields_t, OCR-first prefer
    fields_o, each falls back to the other, items prefer text when any."""
    ft = {"header.invoice_number": "T1", "totals.subtotal": "T2"}
    fo = {"header.invoice_number": "O1", "totals.subtotal": "O2",
          "totals.total": "O3"}
    fields, items = O.merge_routes("schlage", ft, [{"line": "1"}], fo, [{"line": "9"}])
    assert fields["header.invoice_number"] == "T1"   # text-first section
    assert fields["totals.subtotal"] == "O2"         # ocr-first section
    assert fields["totals.total"] == "O3"            # fallback fills gaps
    assert items == [{"line": "1"}]                  # items prefer text
    _, items2 = O.merge_routes("schlage", ft, [], fo, [{"line": "9"}])
    assert items2 == [{"line": "9"}]                 # empty text → ocr items


def test_confidence_scoring_bounds_and_monotonicity():
    from pdf_extractor_scripts_spark.oracle import score_confidence

    empty = score_confidence("ceco", {}, [])
    assert empty == 0.0
    some = score_confidence("ceco", {"header.invoice_number": "1"}, [])
    more = score_confidence("ceco", {"header.invoice_number": "1",
                                     "header.invoice_date": "2"}, [{"line": "1"}])
    assert 0.0 < some < more <= 1.0


def test_engine_item_parsers_match_oracle_across_corpus():
    """operators/items.py (classify+attach) vs oracle (nested scans): two
    independent implementations of the item grammars must agree on every
    fixture document's assembled text."""
    from pdf_extractor_scripts_spark.fixtures import make_corpus
    from pdf_extractor_scripts_spark.operators import items as I

    for d in make_corpus(80, seed=7):
        for kind in ("text", "media_text"):
            text = O.assemble(d["spans"], kind)
            all_text = O.assemble(d["spans"], "text") + "\n" + O.assemble(d["spans"], "media_text")
            vendor, _ = O.detect_vendor(d["doc_id"], all_text)
            fields = O.extract_fields(vendor, text)
            assert I.extract_items(vendor, text, fields) == O.extract_items(
                vendor, text, fields
            ), (d["doc_id"], kind)


def test_ceco_cross_page_item_association():
    """An item header at the end of page n must pick up its pricing line,
    marks and components from page n+1 — the forward scan crosses the
    page-marker line (ceco_processor.py:428-441; FIXTURES.md §2.1)."""
    from pdf_extractor_scripts_spark.operators import items as I

    lines = [
        "=== PAGE 1 ===",
        "001 572 FR3PC 1 1 0",
        "=== PAGE 2 ===",
        "3 PIECE FRAME 829.000 54.871 374.11 374.12",
        "MARK NO: HAP1(56)",
        "MATERIAL AMOUNT 828.999 56.000 364.76 364.76",
    ]
    for impl in (O._ceco_items, I.ceco_items):
        items = impl(lines)
        assert len(items) == 1
        s = items[0]["serialized"]
        assert "desc=3 PIECE FRAME" in s and "comp=MATERIAL:364.76" in s
        assert items[0]["marks"] == ["HAP1(56)"]


def test_schlage_waybill_across_page_marker():
    from pdf_extractor_scripts_spark.operators import items as I

    lines = [
        "SCHLAGE UPS EXP 1 111 111 X*1 |D| FEB 28 85.00 54.64/00 4,280.16",
        "=== PAGE 2 ===",
        "1Z59R8R8034940301234",  # full 16-char body after the marker
    ]
    # fix: make the waybill line a valid FULL match (1Z + 16 chars)
    lines[2] = "1Z" + "59R8R80349403012"
    for impl in (O._schlage_items, I.schlage_items):
        items = impl(lines, {})
        assert "waybill=1Z59R8R80349403012" in items[0]["serialized"], impl


def test_ocr_dual_engine_selection_branches(spark):
    """O3/O4/O5 (image_pdf_processor.py:434-599): near-tie → line merge,
    big gap → argmax, one engine blank → the other. Engine (native SQL
    CASE/HOFs) and oracle (Python) must agree span-for-span on each path."""
    from pdf_extractor_scripts_spark.operators.detect import with_assembled_text
    from pdf_extractor_scripts_spark.schemas import DOC_SCHEMA

    def doc(doc_id, e1_lines, e2_lines):
        spans = [{"kind": "page_break", "text": "=== PAGE 1 ===",
                  "media_ref": "", "offset": 0},
                 {"kind": "media", "text": "", "media_ref": "img://x/1/0",
                  "offset": 1}]
        off = 2
        for l in e1_lines:
            spans.append({"kind": "media_text", "text": l,
                          "media_ref": "img://x/1/0", "offset": off})
            off += 1
        for l in e2_lines:
            spans.append({"kind": "media_text_alt", "text": l,
                          "media_ref": "img://x/1/0", "offset": off})
            off += 1
        return {"doc_id": doc_id, "spans": spans}

    body = [f"INVOICE# {100 + k} TOTAL {k}.00" for k in range(12)]
    docs = [
        # near-tie: same length, alt line 0 carries an extra amount → wins
        doc("schlage/tie.pdf", body, [body[0] + " 47.50"] + body[1:]),
        # near-tie: alt line 0 degraded (digits -> O) → base line kept
        doc("schlage/tie2.pdf", body,
            ["".join("O" if c.isdigit() else c for c in body[0])] + body[1:]),
        # big gap: sparse secondary → argmax keeps primary
        doc("schlage/gap.pdf", body, ["~"]),
        # primary blank: secondary is used verbatim
        doc("schlage/only2.pdf", [], body),
        # secondary longer: base switches to engine 2
        doc("schlage/long.pdf", body, body + ["SCAN REF 321", "FEED MARK 9"]),
    ]
    df = with_assembled_text(spark.createDataFrame(docs, schema=DOC_SCHEMA))
    got = {r["doc_id"]: r["ocr_route_text"]
           for r in df.select("doc_id", "ocr_route_text").collect()}
    for d in docs:
        assert got[d["doc_id"]] == O.select_ocr_text(d["spans"]), d["doc_id"]

    # branch spot-checks (against hand-derived expectations)
    assert "47.50" in got["schlage/tie.pdf"]                  # alt line won
    assert "INVOICE# 100" in got["schlage/tie2.pdf"]          # degraded alt lost
    assert "OOO" not in got["schlage/tie2.pdf"]
    assert got["schlage/gap.pdf"].count("INVOICE#") == 12     # argmax kept e1
    assert "~" not in got["schlage/gap.pdf"]
    assert got["schlage/only2.pdf"].count("INVOICE#") == 12   # e2 verbatim
    assert got["schlage/long.pdf"].endswith("FEED MARK 9")    # base switched


def test_j1_merge_is_section_level_pick():
    # audit §11 (fallback_processor.py:536-560): the priority side wins the
    # WHOLE section when it has any data — a key missing from the winning
    # side is NOT back-filled from the loser; payment is TEXT-first; totals
    # and shipping are OCR-first
    import pdf_extractor_scripts_spark.config as C

    vendor = "ceco"
    keys = C.FIELD_ORDER[vendor]
    hdr = [k for k in keys if k.startswith("header.")]
    tot = [k for k in keys if k.startswith("totals.")]
    assert len(hdr) >= 2 and len(tot) >= 2
    fields_t = {hdr[0]: "T_HDR0", tot[0]: "T_TOT0", tot[1]: "T_TOT1"}
    fields_o = {hdr[0]: "O_HDR0", hdr[1]: "O_HDR1", tot[0]: "O_TOT0"}
    merged, items = O.merge_routes(vendor, fields_t, [], fields_o,
                                   [{"line": "001", "serialized": "s", "marks": []}])
    # header: text section non-empty → text wins wholesale; the OCR-only
    # hdr[1] must NOT leak in
    assert merged[hdr[0]] == "T_HDR0"
    assert hdr[1] not in merged
    # totals: OCR-first and OCR section non-empty → OCR wins wholesale;
    # text-only tot[1] must NOT leak in
    assert merged[tot[0]] == "O_TOT0"
    assert tot[1] not in merged
    # empty primary section falls back to the other side
    merged2, _ = O.merge_routes(vendor, {}, [], {hdr[0]: "O_HDR0"}, [])
    assert merged2[hdr[0]] == "O_HDR0"
    # items: text route empty → OCR items
    assert items and items[0]["line"] == "001"


def test_t1_item_sort_nonnumeric_first_and_stable():
    # audit §13 (text_pdf_processor.py:2600-2613): digits-only key with
    # EMPTY → 0, so non-numeric line numbers sort FIRST; equal keys keep
    # input order (list.sort stability)
    items = [
        {"line": "002", "serialized": "b", "marks": []},
        {"line": "ABC", "serialized": "x", "marks": []},   # no digits → 0
        {"line": "001", "serialized": "a", "marks": []},
        {"line": "1", "serialized": "a2", "marks": []},    # ties 001, later
    ]
    ordered = [it["serialized"] for _, it in
               sorted(enumerate(items), key=lambda p: O._item_sort_key(p[1], p[0]))]
    assert ordered == ["x", "a", "a2", "b"]


def test_steelcraft_marks_reference_grammar():
    # audit §14 (steelcraft_processor.py:627-655): marks live in their own
    # 30-line window; FIRST header wins; value = first non-empty line of
    # the next 3 with matches, rendered 'NNN (q)'; item-like lines break
    item = "001 2.0 2.0 F 164 HM DOOR 1,000 .10 5 2 900.00"
    for impl in (O._steelcraft_items, I.steelcraft_items):
        # marks two lines below the header (empty line skipped), compact
        # input '005(1)' renders as '005 (1)'
        got = impl([item, "MARK NUMBERS:", "", "005(1), 068 (2)"])
        assert got[0]["marks"] == ["005 (1)", "068 (2)"], impl
        # only the FIRST header is processed
        got = impl([item, "MARK NUMBERS:", "005 (1)",
                    "MARK NUMBERS:", "099 (9)"])
        assert got[0]["marks"] == ["005 (1)"], impl
        # an item-like line before any header stops the scan
        got = impl([item, "002 3.0 3.0 something", "MARK NUMBERS:", "005 (1)"])
        assert got[0]["marks"] == [], impl
        # header whose next 3 lines are empty yields nothing
        got = impl([item, "MARK NUMBERS:", "", "", ""])
        assert got[0]["marks"] == [], impl


def test_ceco_scan_window_is_49_lines():
    # audit §14 (ceco_processor.py:482): search_end = header+50 EXCLUSIVE →
    # 49 lines after the header; a mark on line header+49 is captured, one
    # on header+50 is not
    hdr = "001 572 FR3PC 1 1 0"
    pad = ["filler"] * 48
    inside = [hdr] + pad + ["8241799(40)"]          # at header+49
    outside = [hdr] + pad + ["filler", "8241800(41)"]  # at header+50
    for impl in (O._ceco_items, I.ceco_items):
        assert impl(inside)[0]["marks"] == ["8241799(40)"], impl
        assert impl(outside)[0]["marks"] == [], impl


def _fields_both(vendor: str, text: str) -> list[dict]:
    """Run both field-extraction implementations on one document."""
    eng = extract_fields_batch(pd.Series([vendor]), pd.Series([text]))[0]
    return [O.extract_fields(vendor, text), eng]


def test_f1_ceco_ignorecase_and_strip():
    # audit §15: ceco non-totals fields go through
    # _extract_field_with_patterns (ceco_processor.py:364-366) —
    # IGNORECASE|MULTILINE search and a stripped group(1)
    text = "INVOICE NUMBER: 12345678\nORDER SHIPPED FROM 572 - MILAN MANUFACTURING   "
    for got in _fields_both("ceco", text):
        assert got["header.invoice_number"] == "12345678", got
        assert got["shipping.origin"] == "572 - MILAN MANUFACTURING", got


def test_f1_ceco_totals_comma_stripped_case_sensitive():
    # ceco totals go through _extract_totals (ceco_processor.py:617-647):
    # case-SENSITIVE patterns, values stored .replace(',', '')
    text = (
        "YOU MAY DEDUCT A DISCOUNT OF $ 1,290.52 14,526.12\n"
        "FREIGHT CHARGE 1,316.50"
    )
    for got in _fields_both("ceco", text):
        assert got["totals.discount"] == "1290.52", got
        assert got["totals.subtotal"] == "14526.12", got
        assert got["totals.freight"] == "1316.50", got
    # lowercase label must NOT match (no IGNORECASE at that call site)
    for got in _fields_both("ceco", "freight charge 316.50"):
        assert "totals.freight" not in got or got.get("totals.freight") != "316.50"


def test_f1_schlage_ignorecase_header_steelcraft_case_sensitive():
    # schlage header searches pass re.IGNORECASE
    # (schlage_processor.py:1004-1054); steelcraft call sites pass no flags
    # (steelcraft_processor.py:662-688)
    for got in _fields_both("schlage", "Invoice# 3456789"):
        assert got["header.invoice_number"] == "3456789", got
    for got in _fields_both("steelcraft", "net sales: 1,234.56"):
        assert "totals.net_sales" not in got, got
    for got in _fields_both("steelcraft", "NET SALES: 1,234.56"):
        assert got["totals.net_sales"] == "1,234.56", got  # no comma-strip


def test_f1_generic_argmax_demotes_low_quality_match():
    # DynamicPatternExtractor (text_pdf_processor.py:439-537): all matches
    # of all patterns scored weight*(1-0.1*i)*quality; the degenerate
    # single-digit Total Sale capture (quality 0.3*0.5) loses to the later
    # Subtotal pattern's full amount — first-match-wins would return '5'
    text = "Total Sale: $ 5\nSubtotal: $431.90"
    for got in _fields_both("generic", text):
        assert got["totals.subtotal"] == "431.90", got
    # with a real amount the higher-weight Total Sale pattern wins outright
    text = "Total Sale: $ 2,200.10\nSubtotal: $431.90"
    for got in _fields_both("generic", text):
        assert got["totals.subtotal"] == "2,200.10", got
    # IGNORECASE findall: uppercase email is captured by the lowercase class
    for got in _fields_both("generic", "BILLING7@ACME.COM"):
        assert got["vendor.email"] == "BILLING7@ACME.COM", got


def _schlage_addr(lines: list[str]) -> dict:
    out: dict = {}
    O._address_blocks("schlage", "\n".join(lines), out)
    return out


def test_f5_schlage_same_line_company_discarded_and_unbounded():
    # audit §16 (schlage_processor.py:1260-1262): content after the header
    # on the SAME line is discarded; collection is unbounded (no 5-line cap)
    got = _schlage_addr(["BILL TO: ACME DOORS LLC", "x", "y", "z",
                         "filler line one", "filler line two",
                         "1200 OAK ST", "CARY, NC 27513", "BRAND CARRIER"])
    # company: the first meaningful non-street/non-city line (len>2 gate
    # drops x/y/z) — NOT the same-line 'ACME DOORS LLC'
    assert got["customer.bill_to_company"] == "filler line one"
    # street found 6 lines below the header — the old max_lines=5 missed it
    assert got["customer.bill_to_street"] == "1200 OAK ST"
    assert got["customer.bill_to_citystate"] == "CARY, NC 27513"


def test_f5_schlage_street_suffixes_and_last_wins():
    # street/city have no first-wins guard (:1306-1315) and RD/WAY are not
    # in the suffix alternation (:1301)
    got = _schlage_addr(["BILL TO:", "ACME DOORS LLC", "10 ELM RD",
                         "1200 OAK ST", "77 MASON BLVD",
                         "CARY, NC 27513", "SHIP TO:"])
    assert got["customer.bill_to_street"] == "77 MASON BLVD"  # last match
    got = _schlage_addr(["BILL TO:", "ACME DOORS LLC", "10 ELM WAY",
                         "CARY, NC 27513", "SHIP TO:"])
    assert "customer.bill_to_street" not in got  # WAY unrecognized


def test_f5_schlage_bill_to_splits():
    # company split before the literal CUSTOMER PO# (:1284-1289); city
    # split before ORDER DATE with the captured group stripped (:1291-1297)
    got = _schlage_addr(["BILL TO:", "ACME DOORS LLC CUSTOMER PO# 123456",
                         "1200 OAK ST", "CARY, NC 27513 ORDER DATE 14-JAN-25",
                         "BRAND CARRIER"])
    assert got["customer.bill_to_company"] == "ACME DOORS LLC"
    assert got["customer.bill_to_citystate"] == "CARY, NC 27513"


def test_f5_schlage_ship_to_skips_and_job_name():
    # standalone 7-8 digit customer numbers skipped (:1330); SALES REP
    # lines skipped with the company taken from before the literal
    # (:1323-1327); street truncated at JOB NAME (:1341-1344)
    got = _schlage_addr(["SHIP TO:", "34567890",
                         "ACME WAREHOUSE SALES REP JB",
                         "99 PINE AVE JOB NAME LIBRARY WING",
                         "APEX, NC 27539", "BRAND CARRIER"])
    assert got["customer.ship_to_company"] == "ACME WAREHOUSE"
    assert got["customer.ship_to_street"] == "99 PINE AVE"
    assert got["customer.ship_to_citystate"] == "APEX, NC 27539"


def test_f17_ceco_customer_remit_patterns():
    # audit §17 (ceco_processor.py:720-800): whole-text pattern extraction
    # with the reference's quirks
    base = (
        "Invoice Number: 12345678\n"
        "Ceco Door Products\n9159 TELECOM DR.\nMILAN, TN 38358\n"
        "Please Remit to: Ceco Door Products\n"
        "2718 Solutions Center\nChicago Illinois 60677-1008\n"
        "SOLD TO: COOK & BOARDMAN LLC\n"
    )
    # TELECOM reset: with no specific address form, the generic street
    # pattern finds the vendor's TELECOM line → reset → 'Address not found'
    f: dict = {}
    O._ceco_customer_remit(base, f)
    assert f["customer.sold_to_street"] == "Address not found"
    assert f["customer.sold_to_id"] == "12345678"  # bare (\d{8}) fallback
    assert f["customer.sold_to_company"] == "COOK & BOARDMAN LLC"
    assert f["vendor.remit_company"] == "Ceco Door Products"
    assert f["vendor.remit_street"] == "2718 Solutions Center"
    # remit city pattern runs under IGNORECASE → the VENDOR's city wins
    assert f["vendor.remit_citystate"] == "MILAN, TN 38358"

    # 4-digit IMESON + suite: address joined with an embedded newline
    f = {}
    O._ceco_customer_remit(
        base + "3483 IMESON PARK BLVD\nSTE 419\nORLANDO FL 32068\n", f
    )
    assert f["customer.sold_to_street"] == "3483 IMESON PARK BLVD\nSTE 419"
    assert f["customer.sold_to_citystate"] == "ORLANDO FL 32068"

    # the generic city capture crosses the street line's newline when no
    # literal city form matches and no digits intervene
    f = {}
    O._ceco_customer_remit(
        base + "3483 IMESON PARK BLVD\nORLANDO FL 32068\n", f
    )
    assert f["customer.sold_to_citystate"] == "IMESON PARK BLVD\nORLANDO FL 32068"

    # date-year + 'Order No:' cross-line generic street capture ('26\nOrd')
    f = {}
    O._ceco_customer_remit(
        "Invoice Date: 10/27/26\nOrder No: F3GU7A-01\n" + base, f
    )
    assert f["customer.sold_to_street"] == "26\nOrd"


def test_f13_additional_info_two_phase_harvest():
    # audit §18 (schlage_processor.py:1980-2081): document-level two-phase
    # harvest — NOT a per-item attribute
    text = "\n".join([
        "NOTES: SHIP VIA DOCK 4",            # phase 1 captures 'SHIP VIA DOCK 4'
        "HANDLING INSTRUCTIONS FRAGILE",      # killed by the HANDLING skip
        "KEYED ALIKE GROUP A",                # phase-2 harvest
        "1Z59R8R803494ABC012X",               # killed by the 1Z skip
        "Page 2 of 9 continued",              # killed by startswith('Page ')
        "see www.example.com for terms",      # killed by the www gate
        "12,345.00 - 99.00",                  # symbols-only gate
        "AB",                                 # below min length
        "ONE TWO THREE FOUR FIVE SIX SEVEN EIGHT NINE TEN "
        "ELEVEN TWELVE THIRTEEN FOURTEEN FIFTEEN SIXTEEN",  # >15 words
    ])
    got = O._schlage_additional_info(text)
    # phase 1 first (the stripped capture), then phase-2 full lines in
    # line order; the NOTES line itself also survives phase 2 (different
    # string from its capture — shared seen-set does not collapse them)
    assert got == [
        "SHIP VIA DOCK 4",
        "NOTES: SHIP VIA DOCK 4",
        "KEYED ALIKE GROUP A",
    ], got
    # phase-1 gate: captures of length <= 3 are dropped — but phase 2
    # still harvests the full labeled line (no NOTES skip pattern exists)
    assert O._schlage_additional_info("NOTES: ABC") == ["NOTES: ABC"]
    # duplicate lines collapse via the seen-set, first occurrence kept
    dup = "KEYED ALIKE GROUP A\nKEYED ALIKE GROUP A"
    assert O._schlage_additional_info(dup) == ["KEYED ALIKE GROUP A"]


def test_j5_crossval_totals_gap_fill():
    # audit §19 (schlage_processor.py:944-971): after the totals parse and
    # the 2%/3% derivation, still-missing surcharges/shipping are filled
    # from looser IGNORECASE forms; with a subtotal present the derivation
    # fills both first, so the gap-fill only fires on subtotal-less docs
    text = "Fuel Surcharge: $12.50\nShipping and Handling: $30.00"
    for got in _fields_both("schlage", "INVOICE# 1234567\n" + text):
        assert got["totals.surcharges"] == "12.50", got
        assert got["totals.shipping"] == "30.00", got
    # subtotal present → derivation wins; the looser lines are ignored
    for got in _fields_both("schlage", "SUBTOTAL: 1,000.00\n" + text):
        assert got["totals.surcharges"] == "20.00", got
        assert got["totals.shipping"] == "30.00", got  # 3% of 1000


def test_p8_generic_quality_cascade():
    # audit §20 (pdf_text_detector.py:633-688): generic routing requires
    # the P6 quality score of the 200-char sample to clear 0.6; corrupted
    # text with selectable chars routes to the fallback (hybrid), and the
    # char bound is the reference's STRICT > (:365-369)
    def doc(lines, n_breaks=1):
        spans = []
        off = 0
        for b in range(n_breaks):
            spans.append({"kind": "page_break", "text": f"=== PAGE {b+1} ===",
                          "media_ref": "", "offset": off}); off += 1
            for l in lines:
                spans.append({"kind": "text", "text": l, "media_ref": "", "offset": off})
                off += 1
        return spans

    good = ["Invoice Number: ABC-12345", "Invoice Date: 1/2/25",
            "Subtotal: $431.90", "Invoice Total: $431.90"]
    assert O.route_document("generic", doc(good)) == "text"
    # garbage: enough chars, but the quality score fails the 0.6 bar
    bad = ["x" * 60, "####" * 8]
    assert O.route_document("generic", doc(bad)) == "hybrid"
    # exactly at the char threshold: reference uses len(total) > 50 STRICT
    at_thr = ["A b " * 10]  # 40 chars < threshold either way
    assert O.route_document("generic", doc(at_thr)) == "ocr"
    exactly_50 = ["I" * 25 + " " + "n" * 24]  # stripped page text = 50 chars
    assert O.route_document("generic", doc(exactly_50)) == "ocr"  # 50 > 50 is False
    just_over = ["Invoice bill total date " + "quantity price amount x"]  # 47+ chars?
    # use a clearly-over case instead
    over = ["Invoice Number ABC-12345 total amount date $12.00 quantity 5 ok"]
    assert len("\n".join(over)) > 50
    assert O.route_document("generic", doc(over)) == "text"


def test_p6_quality_score_indicators():
    # hand-computed against _validate_text_quality (pdf_text_detector.py:
    # 215-328): "Invoice total $12.00 date 1/2/25 qty 4 items shipped"
    t = "Invoice total $12.00 date 1/2/25 qty 4 items shipped"
    # i1: alpha ratio 33/52 ≈ 0.63 → 0.8; i2: 9 words, awl 44/9 ≈ 4.9,
    # valid 6/9 ≈ 0.67 → 0.9; i3: all 5 pattern families hit → 1.0;
    # i4: no 5-char runs → 0.8 → score (0.8+0.9+1.0+0.8)/4 = 0.875
    s = O._quality_score(t)
    assert abs(s - 0.875) < 1e-12, s
    # short-circuit: under 10 stripped chars
    assert O._quality_score("  abc  ") == 0.0
    # repetitive OCR artifacts demote i4
    assert O._quality_score("aaaaaaa " * 3 + "invoice") < 0.6


def test_o6_schlage_pick_scale_mismatch():
    # audit §21 (schlage_processor.py:168-228): text candidates score
    # 0-100 (_calculate_text_quality) while the OCR confidence arrives on
    # a 0-1 scale (tesseract conf/100 at :490; easyocr readtext at
    # :505-521) — any text candidate past the 50-char gate beats OCR
    text = "INVOICE# 1234567 SCHLAGE ORDER TOTAL AMOUNT DUE CUSTOMER BILL\n" * 2
    ocr = "SCHLAGE UPS EXP 1 111 111 X*1 |D| FEB 28 85.00 54.64/00 4,280.16\n" * 20
    assert O.schlage_pick_text(text, ocr, 0.8) == text
    # OCR wins only when the selectable text is <= 50 stripped chars
    tiny = "INVOICE# 123"
    assert O.schlage_pick_text(tiny, ocr, 0.8) == ocr
    # both under their gates → the text argument comes back unchanged
    assert O.schlage_pick_text(tiny, "x", 0.8) == tiny


def test_p10_adequacy_and_a3_confidence():
    # audit §21 (fallback_processor.py:392-496): the generic extractor
    # never produces company fields, so both company requirements go
    # missing (2 critical) and validation can never pass → the *_fallback
    # routes always fall through to the secondary side for generic docs
    fields = {
        "header.invoice_number": "ABC-12345",
        "header.invoice_date": "1/2/25",
        "totals.subtotal": "431.90",
    }
    items = [{"serialized": "line=1|code=W-1|qty=2|desc=widget|unit=5.00|ext=10.00",
              "marks": [], "line": "1"}] * 4
    conf = O.a3_text_confidence("generic", fields, items)
    # 15 + 10 + (30 + 4 complete * 2) + 8 = 71
    assert conf == 71.0, conf
    is_valid, completeness, missing, empty = O.validate_fields("generic", fields, items)
    assert not is_valid
    # no vendor./customer. key at all → the reference's SECTION-missing
    # string ("Section 'vendor_info' is missing"), which does NOT contain
    # a critical substring — so completeness 70 + conf 71 IS adequate
    assert "Section 'vendor_info' is missing" in missing
    # completeness: 15+10 header + 20+15 items + 10 totals = 70
    assert completeness == 70.0, completeness
    assert O.p10_adequate("generic", fields, items, conf)
    # below the 70-confidence threshold → inadequate regardless
    assert not O.p10_adequate("generic", fields, items, 65.0)
    # a single present-but-empty company key flips the missing entry to
    # the CRITICAL per-field form... while a missing invoice number joins
    # it → 2 critical entries → the completeness branch fails too
    f_bad = {"vendor.name": "ACME", "customer.company": ""}
    assert not O.p10_adequate("generic", f_bad, items, 95.0)
    # a doc with company fields and high completeness IS adequate
    f2 = dict(fields, **{"vendor.name": "ACME", "customer.company": "ZED"})
    ok = O.p10_adequate("generic", f2, items, 95.0)
    assert ok


def test_step3b_enhance_and_comma_poison():
    # audit §22 (data_validator.py:209-330): the enhancement branch drops
    # empty-string kv pairs and fills a missing subtotal from the item
    # extended amounts — but float() does not strip commas, so ONE
    # comma-bearing amount poisons the whole fill inside the single try
    items = [
        {"line": "1", "marks": [],
         "serialized": "line=1|brand=SCHLAGE|carrier=|ord=2|shp=2|code=X|desc=D|unit=5.00|ext=10.00"},
        {"line": "2", "marks": [],
         "serialized": "line=2|brand=LCN|carrier=|ord=1|shp=1|code=Y|desc=E|unit=4.00|ext=4.00"},
    ]
    fields = {"header.invoice_number": "1234567"}
    f2, i2 = O.enhance_fields("schlage", fields, items)
    assert f2["totals.subtotal"] == "14.00"
    assert "carrier=" not in i2[0]["serialized"]  # empty kv dropped
    poisoned = [dict(items[0]), dict(items[1])]
    poisoned[0]["serialized"] = poisoned[0]["serialized"].replace("ext=10.00", "ext=1,210.00")
    f3, _ = O.enhance_fields("schlage", fields, poisoned)
    assert "totals.subtotal" not in f3  # comma poisons the one-try sum
    # ext fill from qty * unit when missing
    missing_ext = [{"line": "1", "marks": [],
                    "serialized": "line=1|ord=3|shp=3|code=X|desc=D|unit=2.50|ext="}]
    _, i4 = O.enhance_fields("schlage", {}, missing_ext)
    assert "ext=7.5" in i4[0]["serialized"]


def test_step3b_specialized_confidences_and_fallback_retention():
    # audit §22: steelcraft carries a FIXED 95.0 (fallback_processor.py:
    # 706); ceco its own A9 (ceco_processor.py:867-921); schlage the A7
    # accuracy (schlage_processor.py:975-985); the J2 compare keeps the
    # primary unless the fallback confidence is STRICTLY higher
    fields = {"header.invoice_number": "12345678",
              "header.invoice_date": "1/2/25",
              "header.customer_po": "999-001",
              "totals.subtotal": "10.00"}
    items = [{"line": "1", "marks": [],
              "serialized": "line=1|code=C|desc=D|ord=1|net=5.00|ext=5.00"}]
    a7 = O.a7_schlage_accuracy(fields, items)
    assert a7 == 100.0, a7  # 3/3 header, items, 1/1 totals
    a9 = O.a9_ceco_confidence(fields, items)
    # header 3*6.25 + items 20 + 15*(5/5 fields filled) + 0 others
    assert abs(a9 - (18.75 + 35)) < 1e-9, a9
    # an invalid low-conf result with a zero-confidence OCR fallback is
    # retained unchanged (ocr side has no non-marker content)
    f, i, n = O.step3b("steelcraft", "text", {}, [], [], "SOME TEXT", "=== PAGE 1 ===")
    assert (f, i, n) == ({}, [], [])


def test_step3b_schlage_tpp_fallback_bank():
    # audit §22: an invalid/low-confidence schlage result falls back to
    # the SECOND bank family (text_pdf_processor.py:173-205) via the
    # DynamicPatternExtractor argmax
    text = "INVOICE# 3456789\nSELLER: Schlage Lock Co. LLC"
    got = O._extract_fields_argmax(text, O.C.TPP_SCHLAGE_BANK, O.C.TPP_SCHLAGE_WEIGHTS)
    assert got["header.invoice_number"] == "3456789"
    assert got["vendor.name"] == "Schlage"
    # 'ORDER#' does not match the second bank's order-number forms
    got2 = O._extract_fields_argmax("ORDER# 45678901", O.C.TPP_SCHLAGE_BANK,
                                    O.C.TPP_SCHLAGE_WEIGHTS)
    assert "header.order_number" not in got2


def test_f3_image_route_extract_reference_bugs():
    # audit §23: the image route's F3 detector reproduces the reference's
    # artifacts exactly
    text = "\n".join([
        "Invoice Number: INV-832173",
        "Invoice Date: 1/9/26",
        "From: Acme Industrial Supply Co",
        "Bill To: Brighton Contractors",
        "Order Number: PO-17309",
        "1 GADGET7 3 steel gadget 12.50 37.50",
        "Subtotal: $255.76",
        "Tax: $44.73",
        "Total Amount: $117.00",
        "Terms: 2% 10 days, net 30",
    ])
    fields, items = O.image_route_extract(text)
    assert fields["header.invoice_number"] == "INV-832173"
    # the vendor-name capture class includes \s and crosses the newline
    # into the next label (no anchor, no newline exclusion)
    assert fields["vendor.name"] == "Acme Industrial Supply Co\nBill To"
    # 'Subtotal' CONTAINS 'total', and its capture scores the same 100 as
    # the real total — enumeration order keeps the FIRST, so totals.total
    # mirrors the subtotal value
    assert fields["totals.total"] == "255.76"
    # the terms capture's [^\n] class (raw-string bug) excludes the
    # LETTER n — under IGNORECASE also N — so it stops before 'net'
    assert fields["payment.terms"] == "2% 10 days,"
    # 6-group simplified item grammar with int/float conversion reprs
    s = items[0]["serialized"]
    for frag in ("line=1", "code=GADGET7", "ord=3", "shp=3",
                 "desc=steel gadget", "list=0.0", "unit=12.5", "ext=37.5"):
        assert frag in s, (frag, s)
    # a doc with NO F3 invoice number falls into the static header
    # fallback, whose bare 8-digit form grabs any number
    f2, _ = O.image_route_extract("bogus 12345678 text\nxyz 5 7 9")
    assert f2["header.invoice_number"] == "12345678"


def test_p7_page_classification_and_mixed_branch():
    # audit §24 (pdf_text_detector.py:453-459): a page with text AND
    # images is HYBRID; a textless page counts as an IMAGE page even with
    # no images; mixed means ANY hybrid page — not the mere coexistence
    # of text and image pages
    def doc(page_specs):
        spans, off = [], 0
        for p, (lines, media) in enumerate(page_specs):
            spans.append({"kind": "page_break", "text": f"=== PAGE {p+1} ===",
                          "media_ref": "", "offset": off}); off += 1
            if media:
                spans.append({"kind": "media", "text": "",
                              "media_ref": f"img://x/{p}", "offset": off}); off += 1
            for l in lines:
                spans.append({"kind": "text", "text": l, "media_ref": "", "offset": off})
                off += 1
        return spans

    good = ["Invoice Number: ABC-12345 invoice bill total amount due x"] * 2
    # text page + image-only page: NOT mixed (no hybrid page) → 'text'
    s = doc([(good, False), (good, False), ([], True)])
    has, score, tp4, tx, im, mixed = O._generic_detection(s)
    assert (tx, im, mixed) == (2, 1, False)
    assert O.route_document("generic", s) == "text"
    # two HYBRID pages + an image page: mixed, im(1) > tx(0) → the
    # text_with_ocr_fallback branch (route hybrid)
    s2 = doc([(good, True), (good, True), ([], True)])
    has2, _, _, tx2, im2, mixed2 = O._generic_detection(s2)
    assert (tx2, im2, mixed2) == (0, 1, True)
    assert O.route_document("generic", s2) == "hybrid"
    assert O.generic_fb_primary(s2) == "text"


def test_o4_quality_score_three_implementations_agree(spark):
    """O4's quality score exists THREE times — the native SQL twin
    (detect.py, drives the in-plan selection), independent.py (kernel O6
    path) and oracle.py (contract) — and the near-tie branch compares
    scores with a strict threshold, so all three must agree bit-for-bit
    on realistic assembled texts."""
    import pyspark.sql.functions as F

    from pdf_extractor_scripts_spark import oracle as O
    from pdf_extractor_scripts_spark.fixtures import make_corpus
    from pdf_extractor_scripts_spark.operators import independent as I
    from pdf_extractor_scripts_spark.operators.detect import (
        _ocr_line_score_sql,
        _ocr_qscore_sql,
    )

    texts = [O.select_ocr_text(d["spans"]) for d in make_corpus(40, seed=42)]
    texts += ["", "   ", "INVOICE 123 $45.67 TOTAL due 01/02/2024"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(
        F.expr(_ocr_qscore_sql("t", 90.0)).alias("q90"),
        F.expr(_ocr_qscore_sql("t", 80.0)).alias("q80"),
    ).collect()
    for row, t in zip(got, texts):
        for col, conf in (("q90", 90.0), ("q80", 80.0)):
            assert row[col] == I.ocr_quality_score(t, conf) == \
                O.ocr_quality_score(t, conf), (t[:40], conf)

    # line score (the near-tie merge comparator) on stripped lines — the
    # only form the combine path feeds it
    lines = [l.strip() for t in texts for l in t.split("\n") if l.strip()][:80]
    ldf = spark.createDataFrame([(l,) for l in lines], "l string")
    lgot = ldf.select(F.expr(_ocr_line_score_sql("l")).alias("s")).collect()
    for row, l in zip(lgot, lines):
        assert row["s"] == I._line_score(l) == O._ocr_line_score(l), l[:40]
