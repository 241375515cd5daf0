"""Independent second implementations of every extraction component the
Arrow kernel previously imported from the oracle (r3 VERDICT "What's wrong"
#1 / "Next round" #1).

Before this module, operators/kernel.py called ``oracle.*`` directly for F5
address blocks, the schlage derived/crossval totals, F13 additional-info,
O6 comprehensive pick, the image-route F3 family, A3/A4 confidences, P10
adequacy and the whole step-3b chain — so for those paths the span-equality
contract compared a function with itself and could never catch a bug (the
round-2 waybill off-by-one survived exactly this way). This module is a
from-the-reference-semantics REWRITE of each of those functions, organized
differently (index-sliced section collection instead of a streaming state
machine, candidate-sort argmax instead of running-max, table-driven scoring
folds instead of incremental ``conf +=`` chains); the kernel now calls ONLY
this module, the oracle keeps its own copies, and the contract suite again
cross-checks two genuinely different implementations of every stage.
tests/test_mutation_independence.py proves the property by breaking the
oracle copy and asserting the contract DIVERGES.

Float-threshold expressions (confidence formulas compared against 70/strict
``>``) keep the oracle's exact arithmetic association so knife-edge values
cannot flip a branch between implementations — the independence is in the
surrounding control flow, candidate handling and dict plumbing, which is
where every reference-adoption bug so far has lived.

Reference anchors, per function below: schlage_processor.py:1244-1383,
ceco_processor.py:720-800, fallback_processor.py:342-516,
data_validator.py:36-330, enhanced_pattern_detector.py:54-356,
image_pdf_processor.py:434-1097, text_pdf_processor.py:439-537.
"""

from __future__ import annotations

import re

from .. import config as C

# Cached pattern compiler for the per-document hot paths. Python's own
# re._compile cache pays a ~3µs dict+flags lookup per call; the lru_cache
# hit is cheaper and, unlike hoisted module-level compiles, stays
# override-safe because the cache key IS the pattern text + flags.
# Measured neutral at the current fixture mix (the fallback parse no longer
# dominates) — kept because it removes 50k+ per-batch lookup calls from
# profiles and costs nothing.
import functools

_rx = functools.lru_cache(maxsize=None)(re.compile)

# ---------------------------------------------------------------------------
# shared small helpers (engine-side twins, NOT imported from the oracle)
# ---------------------------------------------------------------------------


def _item_field(serialized: str, key: str) -> str:
    """Read one key from an item's serialized form (shared '|'-truncation
    convention, same as the items.py twin)."""
    for seg in serialized.split("|"):
        k, eq, v = seg.partition("=")
        if eq and k == key:
            return v
    return ""


def _money(s: str) -> float:
    """text_pdf_processor.py:2566-2572 default-0 money parse."""
    try:
        return float(s.replace(",", "").replace("$", ""))
    except ValueError:
        return 0.0


def _pairs_of(serialized: str) -> list[list[str]]:
    """serialized → [[key, value], ...]; a segment without '=' is a value
    fragment that contained '|' and reattaches to the previous value."""
    pairs: list[list[str]] = []
    for seg in serialized.split("|"):
        k, eq, v = seg.partition("=")
        if eq:
            pairs.append([k, v])
        elif pairs:
            pairs[-1][1] += "|" + seg
    return pairs


def _serialize(pairs) -> str:
    return "|".join(f"{k}={v}" for k, v in pairs)


# ---------------------------------------------------------------------------
# F5 — address blocks (schlage_processor.py:1244-1352 / audit §16;
# ceco_processor.py:720-800 / audit §17)
# ---------------------------------------------------------------------------


def _schlage_collect(lines: list[str], name: str) -> list[str]:
    """Phase 1 of _extract_address_section: find the header line (SUBSTRING
    containment on the uppercased stripped line; same-line content after
    the header is discarded), then slice forward until a terminator keyword
    or the other section's header, keeping meaningful (len > 2) lines."""
    other = "SHIP TO:" if name == "BILL TO" else "BILL TO:"
    start = None
    for i, raw in enumerate(lines):
        if f"{name}:" in raw.strip().upper():
            start = i
            break
    if start is None:
        return []
    collected: list[str] = []
    for raw in lines[start + 1:]:
        line = raw.strip()
        u = line.upper()
        if any(t in u for t in C.SCHLAGE_ADDR_TERMINATORS) or other in u:
            break
        if len(line) > 2:
            collected.append(line)
    return collected


def _schlage_classify(collected: list[str], name: str) -> dict[str, str]:
    """Phase 2: company = FIRST line matching neither classifier (guarded);
    street/city LAST match wins (unguarded); BILL TO splits before the
    literal 'CUSTOMER PO#' / 'ORDER DATE'; SHIP TO skips NET DUE DATE /
    SALES REP lines (company from before the literal 'SALES REP') and
    standalone 7-8 digit customer numbers, and truncates the street at the
    literal 'JOB NAME' — all reference quirks kept as-is."""
    street_re = _rx(C.SCHLAGE_ADDR_STREET, re.IGNORECASE)
    city_re = _rx(C.SCHLAGE_ADDR_CITY, re.IGNORECASE)
    city_cap = _rx(f"({C.SCHLAGE_ADDR_CITY})", re.IGNORECASE)
    out: dict[str, str] = {}
    for line in collected:
        u = line.upper()
        if name == "BILL TO":
            if "CUSTOMER PO#" in u:
                head = line.split("CUSTOMER PO#")[0].strip()
                if head:
                    out.setdefault("company", head)
                continue
            if "ORDER DATE" in u:
                head = line.split("ORDER DATE")[0].strip()
                m = city_cap.search(head)
                if m and "citystate" not in out:
                    out["citystate"] = m.group(1).strip()
                continue
        else:
            if "NET DUE DATE" in u or "SALES REP" in u:
                if "SALES REP" in u:
                    head = line.split("SALES REP")[0].strip()
                    if head:
                        out.setdefault("company", head)
                continue
            if re.fullmatch(r"\d{7,8}", line):
                continue
        is_street = bool(street_re.search(line))
        is_city = bool(city_re.search(line))
        if not is_street and not is_city:
            out.setdefault("company", line)
        elif is_street:
            addr = line
            if name == "SHIP TO" and "JOB NAME" in addr.upper():
                addr = addr.split("JOB NAME")[0].strip()
            out["street"] = addr
        else:
            m = city_cap.search(line)
            if m:
                out["citystate"] = m.group(1).strip()
    return out


def _ceco_first(text: str, pats: list[str]) -> str | None:
    """_extract_field_with_patterns: ordered first-match-wins over the
    whole text, IGNORECASE|MULTILINE, stripped group(1)."""
    for p in pats:
        m = _rx(p, re.IGNORECASE | re.MULTILINE).search(text)
        if m:
            return m.group(1).strip()
    return None


def _ceco_customer_remit(text: str, fields: dict[str, str]) -> None:
    """ceco_processor.py:720-800 quirks kept bug-for-bug (audit §17): the
    TELECOM vendor-address reset, the 'Address not found' default, the
    suite line joined with an embedded newline, multi-line city captures."""
    cust, remit = C.CECO_CUSTOMER_PATTERNS, C.CECO_REMIT_PATTERNS
    simple = [
        ("customer.sold_to_id", cust["id"]),
        ("customer.sold_to_company", cust["company"]),
    ]
    for key, pats in simple:
        got = _ceco_first(text, pats)
        if got is not None:
            fields[key] = got
    addr = _ceco_first(text, cust["address"])
    if addr is not None and "TELECOM" in addr:
        addr = None  # :745-746 — generic street pattern found the vendor
    suite = _ceco_first(text, cust["suite"])
    if addr:
        fields["customer.sold_to_street"] = f"{addr}\n{suite}" if suite else addr
    else:
        fields["customer.sold_to_street"] = "Address not found"  # :759
    tail = [
        ("customer.sold_to_citystate", cust["city"]),
        ("vendor.remit_company", remit["company"]),
        ("vendor.remit_street", remit["address"]),
        ("vendor.remit_citystate", remit["city"]),
    ]
    for key, pats in tail:
        got = _ceco_first(text, pats)
        if got is not None:
            fields[key] = got


def address_blocks(vendor: str, text: str, fields: dict[str, str]) -> None:
    """F5 dispatch — independent twin of oracle._address_blocks."""
    if vendor == "schlage":
        lines = text.split("\n")
        for prefix, name in C.SCHLAGE_ADDR_SECTIONS:
            got = _schlage_classify(_schlage_collect(lines, name), name)
            for part, val in got.items():
                fields[f"{prefix}_{part}"] = val
    elif vendor == "ceco":
        _ceco_customer_remit(text, fields)


# ---------------------------------------------------------------------------
# F14 quirks — schlage derived/crossval totals, ceco freight default
# (schlage_processor.py:944-971, :1908-1920; ceco_processor.py:648-650)
# ---------------------------------------------------------------------------


def schlage_derived_totals(fields: dict[str, str]) -> None:
    """surcharge = 2% and shipping = 3% of subtotal when the printed lines
    are absent (schlage_processor.py:1908-1920)."""
    sub = fields.get("totals.subtotal")
    if sub is None:
        return
    base = _money(sub)
    for key, ratio in (
        ("totals.surcharges", C.SCHLAGE_SURCHARGE_RATIO),
        ("totals.shipping", C.SCHLAGE_SHIPPING_RATIO),
    ):
        if key not in fields:
            fields[key] = f"{round(base * ratio, 2):.2f}"


def schlage_crossval_totals(fields: dict[str, str], text: str) -> None:
    """Cross-validation gap-fill (schlage_processor.py:944-971; audit §19):
    first findall match of the first matching looser pattern, only for
    keys the parse + derivation left empty."""
    for key, pats in (
        ("totals.surcharges", C.SCHLAGE_XVAL_SURCHARGE),
        ("totals.shipping", C.SCHLAGE_XVAL_SHIPPING),
    ):
        if key in fields:
            continue
        for pat in pats:
            got = _rx(pat, re.IGNORECASE).findall(text)
            if got:
                fields[key] = got[0]
                break


def ceco_freight_default(fields: dict[str, str], text: str) -> None:
    """ceco_processor.py:648-650 no-freight default."""
    if "totals.freight" not in fields and "NO CASH DISCOUNT ON FREIGHT" in text:
        fields["totals.freight"] = "0.00"


# ---------------------------------------------------------------------------
# F13 — schlage additional-info harvest (schlage_processor.py:1980-2081,
# audit §18)
# ---------------------------------------------------------------------------

_INFO_ONLY_SYMBOLS = re.compile(r"^[\d\s\.,\-\$]+$")
_INFO_LETTER_RUN = re.compile(r"[A-Za-z]{3,}")


def _phase2_keep(line: str, skip_res) -> bool:
    if any(r.search(line) for r in skip_res):
        return False
    if not (C.SCHLAGE_INFO_MIN_LEN <= len(line) <= C.SCHLAGE_INFO_MAX_LEN):
        return False
    if line.startswith("Page ") or "www." in line.lower():
        return False
    if _INFO_ONLY_SYMBOLS.match(line) or not _INFO_LETTER_RUN.search(line):
        return False
    return C.SCHLAGE_INFO_MIN_WORDS <= len(line.split()) <= C.SCHLAGE_INFO_MAX_WORDS


def schlage_additional_info(text: str) -> list[str]:
    """Two-phase document-level harvest; the seen-set spans both phases so
    a phase-1 CAPTURE does not suppress the phase-2 FULL line (reference
    quirk kept as-is)."""
    out: list[str] = []
    seen: set[str] = set()
    for pat in C.SCHLAGE_INFO_USEFUL:
        for raw in _rx(pat, re.IGNORECASE).findall(text):
            clean = raw.strip()
            if (clean and clean not in seen
                    and C.SCHLAGE_INFO_USEFUL_MIN < len(clean) < C.SCHLAGE_INFO_USEFUL_MAX):
                seen.add(clean)
                out.append(clean)
    skip_res = [_rx(p, re.IGNORECASE) for p in C.SCHLAGE_INFO_SKIP]
    for raw in text.split("\n"):
        line = raw.strip()
        if len(line) < C.SCHLAGE_INFO_MIN_LEN:
            continue
        if line in seen or not _phase2_keep(line, skip_res):
            continue
        seen.add(line)
        out.append(line)
    return out


# ---------------------------------------------------------------------------
# O3/O4/O5/O6 — dual-engine selection + comprehensive pick
# (image_pdf_processor.py:434-599; schlage_processor.py:168-228, :395-427)
# ---------------------------------------------------------------------------


def ocr_quality_score(text: str, confidence: float) -> float:
    """image_pdf_processor.py:482-538 — 40% confidence, 20% length, 25%
    invoice keywords, 10% numeric density, 5% quality indicators."""
    if not text.strip():
        return 0.0
    words = len(text.split())
    chars = len(text.strip())
    kw = sum(1 for k in C.OCR_QUALITY_KEYWORDS if k in text.lower())
    nums = len(re.findall(r"\d+\.?\d*", text))
    indicators = (
        (20 if re.search(r"\d{2,}", text) else 0)
        + (20 if re.search(r"[A-Z]{2,}", text) else 0)
        + (30 if re.search(r"\$\d+", text) else 0)
        + (30 if re.search(r"\d{1,2}[/\-]\d{1,2}[/\-]\d{2,4}", text) else 0)
    )
    score = confidence * 0.4
    score += min(100.0, words * 5.0 + chars * 0.5) * 0.2
    score += min(100.0, kw * 10.0) * 0.25
    score += min(100.0, nums * 5.0) * 0.1
    score += indicators * 0.05
    return min(100.0, score)


def _line_score(line: str) -> int:
    """image_pdf_processor.py:574-599 — numbers*2 + keywords*3 + words."""
    return (
        2 * len(re.findall(r"\d+\.?\d*", line))
        + 3 * sum(1 for k in C.OCR_LINE_KEYWORDS if k in line.lower())
        + len(line.split())
    )


def combine_ocr_results(text1: str, text2: str) -> str:
    """Near-tie line merge (image_pdf_processor.py:540-572): longer result
    is the base; an aligned alt line replaces the base line iff it scores
    STRICTLY higher; the base's tail is kept."""
    l1 = [l.strip() for l in text1.split("\n") if l.strip()]
    l2 = [l.strip() for l in text2.split("\n") if l.strip()]
    base, alt = (l1, l2) if len(l1) >= len(l2) else (l2, l1)
    merged = [
        alt[i] if i < len(alt) and _line_score(alt[i]) > _line_score(b) else b
        for i, b in enumerate(base)
    ]
    return "\n".join(merged)


def select_engine_text(e1: str, e2: str, has1: bool, has2: bool) -> str:
    """image_pdf_processor.py:434-480: one engine blank → the other;
    near-tie (|Δ| < 10) → line merge; else argmax, primary on tie."""
    if not has2:
        return e1
    if not has1:
        return e2
    s1 = ocr_quality_score(e1, C.OCR_ENGINE_CONF["primary"])
    s2 = ocr_quality_score(e2, C.OCR_ENGINE_CONF["secondary"])
    if abs(s1 - s2) < C.OCR_NEAR_TIE:
        return combine_ocr_results(e1, e2)
    return e2 if s2 > s1 else e1


def _schlage_text_quality(text: str) -> float:
    """_calculate_text_quality (schlage_processor.py:395-427)."""
    if not text or len(text.strip()) < 10:
        return 0.0
    total = len(text)
    counts = {"alpha": 0, "digit": 0, "space": 0}
    for c in text:
        if c.isalpha():
            counts["alpha"] += 1
        elif c.isdigit():
            counts["digit"] += 1
        if c.isspace():
            counts["space"] += 1
    kw = sum(1 for k in C.SCHLAGE_O6_QUALITY_KEYWORDS if k in text.lower())
    kw_score = min(kw / len(C.SCHLAGE_O6_QUALITY_KEYWORDS), 1.0)
    score = (
        counts["alpha"] / total * 0.3
        + counts["digit"] / total * 0.2
        + (1 - counts["space"] / total) * 0.2
        + kw_score * 0.3
    ) * 100
    return min(score, 100.0)


def schlage_pick_text(text: str, ocr_full: str, ocr_conf01: float) -> str:
    """O6 comprehensive selection (schlage_processor.py:168-228, audit
    §21): candidates gated at > 50 stripped chars, picked by max
    confidence with ties keeping the FIRST; the OCR confidence arrives on
    the 0-1 scale (the reference's scale bug) so any qualifying text
    candidate beats OCR."""
    cands: list[tuple[str, float]] = []
    if len(text.strip()) > C.SCHLAGE_O6_TEXT_MIN:
        cands.append((text, _schlage_text_quality(text)))
    if len(ocr_full.strip()) > C.SCHLAGE_O6_TEXT_MIN:
        cands.append((ocr_full, ocr_conf01))
    if not cands:
        return text
    best_i = 0
    for i in range(1, len(cands)):
        if cands[i][1] > cands[best_i][1]:
            best_i = i
    return cands[best_i][0]


# ---------------------------------------------------------------------------
# A3/A4 confidences + A2 completeness + validator + P10
# (fallback_processor.py:392-516; data_validator.py:36-207)
# ---------------------------------------------------------------------------


def a4_ocr_confidence(ocr_text: str) -> float:
    """Stub A4 (fallback_processor.py:498-516): primary-engine constant
    when any non-blank non-marker line exists, else 0."""
    marker = re.compile(r"^=== PAGE \d+ ===$")
    for l in ocr_text.split("\n"):
        if l.strip() and not marker.match(l):
            return C.OCR_ENGINE_CONF["primary"]
    return 0.0


def _complete_item(it: dict, numeric_keys: list[str]) -> bool:
    s = it["serialized"]
    if not _item_field(s, "line").strip() or not _item_field(s, "desc").strip():
        return False
    return sum(1 for k in numeric_keys if _money(_item_field(s, k)) > 0) >= 2


def a3_text_confidence(vendor: str, fields: dict[str, str], items: list[dict]) -> float:
    """_calculate_text_confidence (fallback_processor.py:424-496)."""
    present = lambda k: bool(fields.get(k, "").strip())  # noqa: E731
    conf = 0.0
    for key, pts in (
        ("header.invoice_number", 15), ("header.invoice_date", 10),
        ("vendor.name", 10), (C.VALIDATOR_REQUIRED["customer"][vendor][0], 10),
    ):
        if present(key):
            conf += pts
    if items:
        numeric = C.A3_NUMERIC_KEYS[vendor]
        valid = sum(1 for it in items if _complete_item(it, numeric))
        conf += 30 + min(valid * 2, 25)
        if valid < len(items) * 0.7:
            conf -= 10
    for prefix, pts in (("totals.", 8), ("payment.", 5), ("shipping.", 5)):
        if any(v.strip() for k, v in fields.items() if k.startswith(prefix)):
            conf += pts
    return min(conf, 100.0)


def a2_completeness(vendor: str, fields: dict[str, str], items: list[dict]) -> float:
    """_calculate_completeness_score (data_validator.py:159-207)."""
    present = lambda k: bool(fields.get(k, "").strip())  # noqa: E731
    score = 0.0
    for key, pts in (
        ("header.invoice_number", 15), ("header.invoice_date", 10),
        ("vendor.name", 10),
    ):
        if present(key):
            score += pts
    for prefix, pts in (("vendor.", 5), ("customer.", 5)):
        if any(
            v.strip() for k, v in fields.items()
            if k.startswith(prefix) and k.endswith("_street")
        ):
            score += pts
    if present(C.VALIDATOR_REQUIRED["customer"][vendor][0]):
        score += 10
    if items:
        req = C.VALIDATOR_REQUIRED["items"][vendor]
        complete = sum(
            1 for it in items
            if all(_item_field(it["serialized"], k).strip() for k in req)
        )
        # two separate additions, matching the reference's accumulation
        # order bit-for-bit (threshold comparisons must not flip on ulps)
        score += 20
        score += 15 * (complete / len(items))
    if any(v.strip() for k, v in fields.items() if k.startswith("totals.")):
        score += 10
    return min(score, 100.0)


_SECTION_PREFIX = {
    "invoice_header": "header.",
    "vendor_info": "vendor.",
    "customer_info": "customer.",
}


def _ref_field_name(sec: str, key: str) -> str:
    """Reference-side display name for the critical-substring check:
    company keys (incl. vendor.name) surface as <section>.company_name."""
    if key.endswith("_company") or key.endswith(".company") or key == "vendor.name":
        return f"{sec}.company_name"
    short = key.split(".", 1)[1] if "." in key else key
    return f"{sec}.{short}"


def validate_fields(vendor: str, fields: dict[str, str], items: list[dict]):
    """validate_extracted_data (data_validator.py:58-128): returns
    (is_valid, completeness, missing, empty)."""
    missing: list[str] = []
    empty: list[str] = []
    reqs = {
        "invoice_header": C.VALIDATOR_REQUIRED["header"],
        "vendor_info": C.VALIDATOR_REQUIRED["vendor"],
        "customer_info": C.VALIDATOR_REQUIRED["customer"][vendor],
    }
    for sec, req in reqs.items():
        prefix = _SECTION_PREFIX[sec]
        if not any(k.startswith(prefix) for k in fields):
            missing.append(f"Section '{sec}' is missing")
            continue
        for key in req:
            if key not in fields:
                missing.append(_ref_field_name(sec, key))
            elif not fields[key].strip():
                empty.append(_ref_field_name(sec, key))
    if not items:
        missing.append("No line items found")  # :84 — note: NOT critical
    else:
        for k in C.VALIDATOR_REQUIRED["items"][vendor]:
            empty.extend(
                f"line_items[{i}].{k}"
                for i, it in enumerate(items)
                if not _item_field(it["serialized"], k).strip()
            )
    completeness = a2_completeness(vendor, fields, items)
    is_valid = not missing and len(empty) <= 2 and completeness >= 60.0
    return is_valid, completeness, missing, empty


def p10_adequate(
    vendor: str, fields: dict[str, str], items: list[dict], confidence: float
) -> bool:
    """_is_result_adequate (fallback_processor.py:392-422)."""
    if confidence < C.MIN_CONFIDENCE_THRESHOLD:
        return False
    if not fields and not items:
        return False
    is_valid, completeness, missing, _ = validate_fields(vendor, fields, items)
    if is_valid:
        return True
    n_crit = sum(
        1 for f in missing if any(c in f for c in C.P10_CRITICAL)
    )
    return completeness >= 70.0 and n_crit <= 1


# ---------------------------------------------------------------------------
# Step-3b confidences (schlage_processor.py:975-985; ceco_processor.py:
# 867-921) + validator enhancement (data_validator.py:209-330)
# ---------------------------------------------------------------------------


def a7_schlage_accuracy(fields: dict[str, str], items: list[dict]) -> float:
    """(header*0.3 + items*0.4 + totals*0.3) * 100."""
    req = ["header.invoice_number", "header.invoice_date", "header.customer_po"]
    header = sum(1 for k in req if fields.get(k, "").strip()) / len(req)
    items_c = 1.0 if items else 0.0
    totals = [v for k, v in fields.items() if k.startswith("totals.")]
    totals_c = sum(1 for v in totals if v.strip()) / max(len(totals), 1)
    return (header * 0.3 + items_c * 0.4 + totals_c * 0.3) * 100


def a9_ceco_confidence(fields: dict[str, str], items: list[dict]) -> float:
    """ceco_processor.py:867-921 scoring rubric."""
    present = lambda k: bool(fields.get(k, "").strip())  # noqa: E731
    hdr = ["header.invoice_number", "header.invoice_date",
           "header.order_no", "header.customer_po"]
    score = sum(25 / len(hdr) for k in hdr if present(k))
    if present("vendor.name"):
        score += 15 / 3
    if items:
        item_fields = ["line", "code", "desc", "ord", "net"]
        total = len(items) * len(item_fields)
        filled = sum(
            1 for it in items for k in item_fields
            if _item_field(it["serialized"], k).strip()
        )
        # accumulation order mirrors the reference bit-for-bit
        score += 20
        score += (filled / total) * 15 if total else 0.0
    if present("customer.sold_to_company"):
        score += 10
    if present("payment.terms"):
        score += 7.5
    if present("shipping.origin") or present("shipping.tracking"):
        score += 7.5
    return min(score, 100.0)


_QTY_KEY = {"ceco": "ord", "steelcraft": "ord", "schlage": "ord", "generic": "qty"}
_UNIT_KEY = {"ceco": "net", "steelcraft": "list", "schlage": "unit",
             "generic": "unit"}


def enhance_fields(
    vendor: str, fields: dict[str, str], items: list[dict]
) -> tuple[dict[str, str], list[dict]]:
    """enhance_extracted_data (data_validator.py:209-330) — VALID+confident
    branch only: per-item ext = round(qty*price, 2) backfill, shp from
    ord, empty-value cleanup; missing subtotal summed with the reference's
    comma-poisoning single try block kept as-is."""
    qty_key, unit_key = _QTY_KEY[vendor], _UNIT_KEY[vendor]
    out_items: list[dict] = []
    for it in items:
        pairs = _pairs_of(it["serialized"])
        kv = {k: v for k, v in pairs}
        if (
            not kv.get("ext", "").strip()
            and kv.get(qty_key, "").strip()
            and kv.get(unit_key, "").strip()
        ):
            try:
                ext = str(round(float(kv[qty_key]) * float(kv[unit_key]), 2))
            except (ValueError, TypeError):
                ext = None
            if ext is not None:
                hit = [p for p in pairs if p[0] == "ext"]
                if hit:
                    hit[0][1] = ext
                else:
                    pairs.append(["ext", ext])
        if (
            vendor in ("ceco", "steelcraft", "schlage")
            and not kv.get("shp", "").strip()
            and kv.get("ord", "").strip()
        ):
            hit = [p for p in pairs if p[0] == "shp"]
            if hit:  # only REPLACES an existing pair — never appends (:250)
                hit[0][1] = kv["ord"]
        kept = [p for p in pairs if p[1].strip() != ""]
        out_items.append({**it, "serialized": _serialize(kept)})
    out_fields = {k: v for k, v in fields.items() if v.strip() != ""}
    if out_items and not out_fields.get("totals.subtotal", "").strip():
        try:
            total = 0.0
            for it in out_items:
                ext = _item_field(it["serialized"], "ext")
                if ext.strip():
                    total += float(ext)  # float() does NOT strip commas —
                    # one comma-bearing amount poisons the whole fill (:258)
            if total > 0:
                out_fields["totals.subtotal"] = f"{total:.2f}"
        except (ValueError, TypeError):
            pass
    return out_fields, out_items


# ---------------------------------------------------------------------------
# F3 image-route family (enhanced_pattern_detector.py:54-356;
# image_pdf_processor.py:608-1097; audit §23)
# ---------------------------------------------------------------------------


def _f3_valid(ftype: str, value: str) -> bool:
    """:214-241 validity gates, as a rule table."""
    if not value or len(value.strip()) < 2:
        return False
    if ftype in C.F3_AMOUNT_TYPES:
        return bool(re.match(r"[\d,]+\.?\d*$", value.replace("$", "").strip()))
    if ftype == "invoice_number":
        return len(value) >= 4 and any(c.isalnum() for c in value)
    if ftype == "invoice_date":
        return bool(re.match(r"\d{1,4}[\/\-\.]\d{1,2}[\/\-\.]\d{1,4}", value))
    if ftype == "order_number":
        return len(value) >= 3 and any(c.isalnum() for c in value)
    if ftype == "vendor_name":
        return len(value) >= 5 and any(c.isalpha() for c in value)
    if ftype == "customer_name":
        return len(value) >= 3 and any(c.isalpha() for c in value)
    if ftype == "payment_terms":
        return len(value) >= 5
    return True


def _f3_value_quality(ftype: str, value: str) -> float:
    """:295-325 — base 50, +30 ideal length, +20 composition."""
    if not value:
        return 0.0
    lo, hi = C.F3_IDEAL_LENGTHS.get(ftype, (1, 100))
    score = 50.0 + (30.0 if lo <= len(value) <= hi else 0.0)
    if ftype in C.F3_AMOUNT_TYPES:
        bare = value.replace(",", "").replace("$", "")
        if re.match(r"^\d+\.?\d*$", bare):
            score += 20
    elif ftype in C.F3_NAME_TYPES:
        if any(c.isupper() for c in value) and any(c.islower() for c in value):
            score += 20
    return min(100.0, score)


def _f3_position(ftype: str, pos: int, total: int) -> float:
    """:327-355 — 100 inside the preferred band, else 100 - distance*200."""
    rel = pos / total if total > 0 else 0.0
    lo, hi = C.F3_PREFERRED_POSITIONS.get(ftype, (0.0, 1.0))
    if lo <= rel <= hi:
        return 100.0
    return max(0.0, 100.0 - ((lo - rel) if rel < lo else (rel - hi)) * 200.0)


def f3_extract_all(text: str) -> dict[str, tuple[str, float]]:
    """extract_all_fields (:144-168): validity-gated candidates scored
    50 + min(30, ctx*10) + min(25, len(pat)/100*25) + quality*0.25 +
    position*0.20, deduped by whitespace-collapsed lowercase value (first
    kept), best confidence wins (first among exact ties)."""
    out: dict[str, tuple[str, float]] = {}
    n = len(text)
    low = text.lower()
    for ftype, patterns in C.F3_PATTERNS.items():
        keywords = C.F3_CONTEXT_KEYWORDS.get(ftype, [])
        seen: set[str] = set()
        cands: list[tuple[float, int, str]] = []
        order = 0
        for pat in patterns:
            pat_pts = min(25.0, len(pat) / 100.0 * 25.0)
            for m in _rx(pat, re.IGNORECASE | re.MULTILINE).finditer(text):
                value = (m.group(1) if m.groups() else m.group(0)).strip()
                if not _f3_valid(ftype, value):
                    continue
                norm = re.sub(r"\s+", " ", value.lower().strip())
                if norm in seen:
                    continue
                seen.add(norm)
                ctx = low[max(0, m.start() - 50): min(n, m.end() + 50)]
                hits = sum(1 for kw in keywords if kw in ctx)
                conf = 50.0
                conf += min(30.0, hits * 10.0)
                conf += pat_pts
                conf += _f3_value_quality(ftype, value) * 0.25
                conf += _f3_position(ftype, m.start(), n) * 0.20
                cands.append((min(100.0, conf), -order, value))
                order += 1
        if cands:
            conf, neg_order, value = max(cands)
            out[ftype] = (value, conf)
    return out


def _safe_int(v) -> int:
    try:
        return int(str(v).replace(",", "").strip())
    except (ValueError, AttributeError):
        return 0


def _safe_float(v) -> float:
    try:
        return float(str(v).replace(",", "").replace("$", "").strip())
    except (ValueError, AttributeError):
        return 0.0


def _img_row(match: tuple) -> list[tuple[str, str]] | None:
    """One cascade match tuple → serialized kv pairs (10-group and 6-group
    arities; float/int reprs preserved, e.g. '829.0')."""
    if len(match) >= 10:
        return [("line", match[0].strip()), ("plant", match[1].strip()),
                ("code", match[2].strip()),
                ("ord", str(_safe_int(match[3]))),
                ("shp", str(_safe_int(match[4]))),
                ("desc", match[5].strip()),
                ("list", str(_safe_float(match[6]))),
                ("disc", str(_safe_float(match[7]))),
                ("unit", str(_safe_float(match[8]))),
                ("ext", str(_safe_float(match[9])))]
    if len(match) >= 6:
        return [("line", match[0].strip()), ("plant", ""),
                ("code", match[1].strip()),
                ("ord", str(_safe_int(match[2]))),
                ("shp", str(_safe_int(match[2]))),
                ("desc", match[3].strip()),
                ("list", "0.0"), ("disc", "0.0"),
                ("unit", str(_safe_float(match[4]))),
                ("ext", str(_safe_float(match[5])))]
    return None


def _img_items(text: str) -> list[dict]:
    """Image item cascade (:983-1097): first pattern with any valid item
    wins; (line, code) dedupe; numbers-fallback when nothing matched."""
    items: list[dict] = []
    keys_seen: set[tuple[str, str]] = set()
    for pat in C.IMG_ITEM_PATTERNS:
        for match in _rx(pat, re.MULTILINE | re.IGNORECASE).findall(text):
            kv = _img_row(match)
            if kv is None:
                continue
            d = dict(kv)
            if not d["line"].strip() or not d["desc"].strip():
                continue
            if not any(_safe_float(d[k]) > 0 for k in ("ord", "unit", "ext")):
                continue
            if (d["line"], d["code"]) in keys_seen:
                continue
            keys_seen.add((d["line"], d["code"]))
            items.append({"line": d["line"], "serialized": _serialize(kv),
                          "marks": []})
        if items:
            return items
    # simple fallback (:819-850): any line with >= 3 numbers
    for raw in text.split("\n"):
        line = raw.strip()
        nums = re.findall(r"\d+\.?\d*", line)
        if len(nums) < 3:
            continue
        desc = re.sub(r"\d+\.?\d*", "", line).strip()
        if not desc:
            continue
        kv = [("line", str(len(items) + 1)), ("plant", ""), ("code", ""),
              ("ord", str(int(float(nums[0])))),
              ("shp", str(int(float(nums[0])))),
              ("desc", desc), ("list", "0.0"), ("disc", "0.0"),
              ("unit", str(float(nums[-2]))),
              ("ext", str(float(nums[-1])))]
        if not any(_safe_float(dict(kv)[k]) > 0 for k in ("ord", "unit", "ext")):
            continue
        items.append({"line": kv[0][1], "serialized": _serialize(kv),
                      "marks": []})
    return items


def image_route_extract(text: str) -> tuple[dict[str, str], list[dict]]:
    """The generic OCR method's parse (image_pdf_processor.py:608-921;
    audit §23): F3 adaptive fields mapped into sections, the item cascade,
    then the static header/totals fallbacks when invoice_number/date/total
    are still missing — the header pass OVERWRITES F3 order/PO values on
    match, as the reference does."""
    f3 = f3_extract_all(text)
    fields = {
        C.F3_FIELD_MAP[ftype]: value
        for ftype, (value, _conf) in f3.items()
        if C.F3_FIELD_MAP.get(ftype)
    }
    items = _img_items(text)
    need_header = "invoice_number" not in f3 or "invoice_date" not in f3
    need_total = "total_amount" not in f3
    if need_header or need_total:
        if need_header:
            for key, pats in C.IMG_HEADER_FALLBACK.items():
                for pat in pats:
                    m = _rx(pat, re.IGNORECASE).search(text)
                    if m:
                        fields[key] = m.group(1)
                        break
        if need_total:
            for key, pat in C.IMG_TOTALS_FALLBACK.items():
                m = _rx(pat, re.IGNORECASE).search(text)
                if m:
                    fields[key] = m.group(1)
    return fields, items


# ---------------------------------------------------------------------------
# TextPDFProcessor-bank argmax (text_pdf_processor.py:439-537) — the
# step-3b schlage fallback's SECOND bank family
# ---------------------------------------------------------------------------


def _match_quality(raw: str) -> float:
    """:495-512 — scored on the RAW captured value."""
    if len(raw) < 2:
        length = 0.3
    elif len(raw) > 50:
        length = 0.7
    else:
        length = 1.0
    return length * (0.5 if raw.isdigit() and len(raw) < 3 else 1.0)


def argmax_fields(
    text: str, bank: dict[str, list[str]],
    bank_weights: dict[str, list[float]] | None,
) -> dict[str, str]:
    """All-matches argmax per key: conf = weight * (1 - 0.1*i) * quality,
    first in (pattern, match) enumeration order among exact ties, stripped
    output — candidate-sort formulation of the reference's running max."""
    out: dict[str, str] = {}
    for key, patterns in bank.items():
        weights = (bank_weights or {}).get(key, [1.0] * len(patterns))
        cands: list[tuple[float, int, str]] = []
        order = 0
        for i, pat in enumerate(patterns):
            for m in _rx(pat, re.IGNORECASE | re.MULTILINE).finditer(text):
                raw = m.group(1) if m.groups() else m.group(0)
                if not raw or not raw.strip():
                    continue
                conf = weights[i] * (1.0 - i * 0.1) * _match_quality(raw)
                cands.append((conf, -order, raw.strip()))
                order += 1
        if cands:
            out[key] = max(cands)[2]
    return out


# ---------------------------------------------------------------------------
# Step 3b — the global validate → fallback → compare → enhance layer
# (fallback_processor.py:133-152, :342-390; audit §22)
# ---------------------------------------------------------------------------


def _format_groups(key: str, m: re.Match) -> str:
    """Captured groups → field value: the phone 3-group reformat
    (ceco_processor.py:706-719), else non-null groups '|'-joined."""
    groups = [g for g in m.groups() if g is not None]
    if key.endswith(".phone") and len(groups) == 3:
        return f"({groups[0]}) {groups[1]}-{groups[2]}"
    return groups[0] if len(groups) == 1 else "|".join(groups)


def fields_single(
    vendor: str, text: str, field_banks: dict | None = None
) -> dict[str, str]:
    """Single-document vendor-bank extraction — the plain-``re`` twin of
    kernel.extract_fields_batch (first-match-wins per ordered pattern list
    with the per-call-site flags/strip/comma-strip, generic = all-matches
    argmax, plus the F5/derived/crossval/freight hooks). The step-3b
    fallback runs per DOCUMENT, where a 1-row pandas batch costs ~50ms of
    frame overhead (profiled r4: 73 fallback docs = 3.6s of a 6.5s
    1000-doc kernel run); this path is ~100× cheaper for the same bytes."""
    banks = C.FIELD_BANKS if field_banks is None else field_banks
    if vendor == "generic":
        out = argmax_fields(text, banks["generic"], C.GENERIC_WEIGHTS)
        address_blocks(vendor, text, out)
        return out
    out: dict[str, str] = {}
    for key, patterns in banks[vendor].items():
        flags = C.field_flags(vendor, key)
        hit = next(
            (m for pat in patterns if (m := re.search(pat, text, flags))), None
        )
        if hit is None:
            continue
        val = _format_groups(key, hit)
        if C.field_strip(vendor, key):
            val = val.strip()
        if C.field_comma_strip(vendor, key):
            val = val.replace(",", "")
        out[key] = val
    address_blocks(vendor, text, out)
    if vendor == "schlage":
        schlage_derived_totals(out)
        schlage_crossval_totals(out, text)
    if vendor == "ceco":
        ceco_freight_default(out, text)
    return out


def _parse_text_side(
    vendor: str, text: str,
    field_banks: dict | None, field_order: dict | None,
) -> tuple[dict[str, str], list[dict]]:
    """TextPDFProcessor fallback parse via the ENGINE's own independent
    extractors (fields_single + items.py grammars) — never the oracle's."""
    from .items import extract_items

    fields = fields_single(vendor, text, field_banks)
    return fields, extract_items(vendor, text, fields)


def step3b(
    vendor: str,
    method: str,
    fields: dict[str, str],
    items: list[dict],
    info: list[str],
    text: str,
    ocr_text: str,
    field_banks: dict | None = None,
    field_order: dict | None = None,
) -> tuple[dict[str, str], list[dict], list[str]]:
    """Applied to EVERY document after the method result: primary
    confidence (steelcraft fixed 95, ceco A9, schlage A7, generic A3/A4),
    valid+confident → enhance; else run the OPPOSITE method's parse and
    J2-pick the winner iff STRICTLY higher confidence (a winning fallback
    carries no additional_info)."""
    primary_conf = {
        "schlage": lambda: a7_schlage_accuracy(fields, items),
        "ceco": lambda: a9_ceco_confidence(fields, items),
        "steelcraft": lambda: C.STEELCRAFT_FIXED_CONFIDENCE,
    }.get(vendor)
    if primary_conf is not None:
        conf = primary_conf()
    elif method == "text":
        conf = a3_text_confidence(vendor, fields, items)
    else:
        conf = a4_ocr_confidence(ocr_text)
    is_valid = validate_fields(vendor, fields, items)[0]
    if is_valid and conf >= C.MIN_CONFIDENCE_THRESHOLD:
        enhanced_f, enhanced_i = enhance_fields(vendor, fields, items)
        return enhanced_f, enhanced_i, info
    if method == "text":
        # OCR fallback = the IMAGE processor's own extraction (audit §23)
        fb_fields, fb_items = image_route_extract(ocr_text)
        fb_conf = a4_ocr_confidence(ocr_text)
    elif vendor == "schlage":
        # TextPDFProcessor fallback = the SECOND bank family + F7 grammar
        from .items import _filtered_lines, generic_items

        fb_fields = argmax_fields(text, C.TPP_SCHLAGE_BANK, C.TPP_SCHLAGE_WEIGHTS)
        fb_items = generic_items(_filtered_lines(text))
        fb_conf = a3_text_confidence("generic", fb_fields, fb_items)
    else:
        fb_fields, fb_items = _parse_text_side(vendor, text, field_banks, field_order)
        fb_conf = a3_text_confidence(vendor, fb_fields, fb_items)
    if fb_conf > conf:
        return fb_fields, fb_items, []  # fallback parses carry no info
    return fields, items, info
