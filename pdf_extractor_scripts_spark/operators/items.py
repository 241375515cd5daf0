"""Engine-side line-item extraction — an INDEPENDENT implementation of the
item grammars (F6/F9/F10/F7), cross-checked against oracle.py by the
span-equality tests.

Where the oracle walks each document with nested forward scans (mirroring
the reference's control flow, ceco_processor.py:428-600 etc.), this
implementation classifies every line exactly once against a precompiled
regex table and then attaches classified lines to their governing item by
index interval — the same spec, a different algorithm, so a bug in either
implementation surfaces as a span mismatch.
"""

from __future__ import annotations

import re

from .. import config as C

_serialize = lambda pairs: "|".join(f"{k}={v}" for k, v in pairs)


def _dedupe_keep_order(vals: list[str]) -> list[str]:
    seen: set[str] = set()
    return [v for v in vals if not (v in seen or seen.add(v))]


def _filtered_lines(text: str) -> list[str]:
    # one combined alternation instead of N sequential match() calls per
    # line — each bank pattern carries its own ^...$ anchors
    m = _HEADER_FILTER_COMBINED.match
    return [l for l in text.split("\n") if not m(l)]


_HEADER_FILTER_COMBINED = re.compile(
    "|".join(f"(?:{p})" for p in C.PAGE_HEADER_FILTERS)
)

# ---------------------------------------------------------------------------
# precompiled classification tables
# ---------------------------------------------------------------------------
_CECO_HDR = re.compile(C.CECO_ITEM_HEADER)
_CECO_PRICE = re.compile(C.CECO_PRICING)
_CECO_COMP = re.compile(C.CECO_COMPONENT)
_CECO_MARKS = [
    ("labeled", re.compile(C.CECO_MARK_LABELED, re.IGNORECASE)),
    ("standalone", re.compile(C.CECO_MARK_STANDALONE)),
    ("decimal", re.compile(C.CECO_MARK_DECIMAL)),
]
_CECO_MARK_PRICE_REJ = re.compile(C.CECO_MARK_PRICE_REJECT)
_CECO_MARK_VALID = [re.compile(p, re.IGNORECASE) for p in C.CECO_MARK_VALID]


def _valid_mark(p: str) -> bool:
    """Labeled-mark format gate (text_pdf_processor.py:2919-2948): reject
    price-like forms, accept the five mark shapes."""
    return (not _CECO_MARK_PRICE_REJ.match(p)
            and any(r.match(p) for r in _CECO_MARK_VALID))

_SC_F164 = re.compile(C.STEELCRAFT_ITEM_F164)
_SC_ANCH = re.compile(C.STEELCRAFT_ITEM_ANCHOR)
_SC_SPECS = [(lbl, re.compile(p)) for lbl, p in C.STEELCRAFT_SPECS]
_SC_ITEM_LIKE = re.compile(C.STEELCRAFT_ITEM_LIKE)
_SC_MARK = re.compile(C.STEELCRAFT_MARK_MATCH)
_SC_PRICE = re.compile(C.STEELCRAFT_PRICING_DETAIL)
_SC_DISC = re.compile(C.STEELCRAFT_DISCOUNT_LINE)

_SH_ITEM = re.compile(C.SCHLAGE_ITEM)
_SH_WB_BASE = re.compile(C.SCHLAGE_WAYBILL_BASE)
_SH_WB_FULL = re.compile(C.SCHLAGE_WAYBILL_FULL)
_SH_WB_CONT = re.compile(C.SCHLAGE_WAYBILL_CONT)
_SH_FEDEX = re.compile(C.SCHLAGE_FEDEX_NUMBER)

_GEN_ITEM = re.compile(C.GENERIC_ITEM)
# schlage surcharge-amount fallback (schlage_processor.py:1517)
_SH_SUR_AMT = re.compile(r"SURCHARGES?:?\s*\$?(\d{1,3}(?:,\d{3})*\.\d{2})",
                         re.IGNORECASE)


def _intervals(header_idx: list[int], n_lines: int, window: int):
    """(start, end) line interval governed by each header: bounded by the
    next header and by the per-vendor scan window."""
    out = []
    for h, idx in enumerate(header_idx):
        nxt = header_idx[h + 1] if h + 1 < len(header_idx) else n_lines
        out.append((idx + 1, min(nxt, idx + 1 + window), nxt))
    return out


# ---------------------------------------------------------------------------
# CECO (F6/F11/F12 + BO folding)
# ---------------------------------------------------------------------------
def ceco_items(lines: list[str]) -> list[dict]:
    headers = [(i, m) for i, l in enumerate(lines) if (m := _CECO_HDR.match(l))]
    # classify every line once
    cls: dict[int, tuple[str, object]] = {}
    for i, l in enumerate(lines):
        if (m := _CECO_PRICE.match(l)) and not _CECO_COMP.match(l):
            cls[i] = ("price", m)
        elif (m := _CECO_COMP.match(l)):
            cls[i] = ("comp", m)
        else:
            for kind, rx in _CECO_MARKS:
                # labeled is unanchored (reference findall, :2899); the
                # standalone/decimal forms carry their own ^...$ anchors
                if (m := rx.search(l)):
                    cls[i] = (kind, m)
                    break

    spans = _intervals([i for i, _ in headers], len(lines), C.CECO_SCAN_WINDOW)
    items, seen = [], set()
    for (idx, m), (lo, hi, _) in zip(headers, spans):
        line_no, plant, code, qty_ord, qty_shp, bo = m.groups()
        if (line_no, code) in seen:
            continue
        seen.add((line_no, code))
        pairs = [("line", line_no), ("plant", plant), ("code", code),
                 ("ord", qty_ord), ("shp", qty_shp)]
        # BO validity (text_pdf_processor.py:2405-2414): invalid third number
        # folds into the description and bo derives from ord - shp (floor 0)
        fold_prefix = ""
        if bo is not None and int(qty_ord) == int(qty_shp) + int(bo):
            pairs.append(("bo", bo))
        else:
            derived = int(qty_ord) - int(qty_shp)
            pairs.append(("bo", str(derived if derived > 0 else 0)))
            if bo is not None:
                fold_prefix = bo + " "
        marks, priced = [], False
        for j in range(lo, hi):
            got = cls.get(j)
            if not got:
                continue
            kind, mm = got
            if kind == "price" and not priced:
                desc, lst, disc, net, ext = mm.groups()
                pairs += [("desc", fold_prefix + desc), ("list", lst),
                          ("disc", disc), ("net", net), ("ext", ext)]
                priced = True
            elif kind == "comp":
                pairs.append(("comp", f"{mm.group(1)}:{mm.group(5)}"))
            elif kind == "labeled":
                marks += [p.strip() for p in mm.group(1).split(",")
                          if p.strip() and _valid_mark(p.strip())]
            elif kind in ("standalone", "decimal"):
                marks.append(mm.group(1))
        items.append({"line": line_no, "serialized": _serialize(pairs),
                      "marks": _dedupe_keep_order(marks)})
    return items


# ---------------------------------------------------------------------------
# Steelcraft (F9 + specs/pricing/discount scans)
# ---------------------------------------------------------------------------
def steelcraft_items(lines: list[str]) -> list[dict]:
    headers = []
    for i, l in enumerate(lines):
        if (m := _SC_F164.match(l)):
            g = m.groups()
            pairs = [("line", g[0]), ("ord", g[1]), ("shp", g[2]), ("code", g[3]),
                     ("desc", g[4]), ("list", g[5]), ("disc", f".{g[6]}"),
                     ("w", g[7]), ("b", g[8]), ("ext", g[9])]
            headers.append((i, g[0], g[3], pairs))
        elif (m := _SC_ANCH.match(l)):
            g = m.groups()
            pairs = [("line", g[0]), ("ord", g[1]), ("shp", g[2]), ("code", g[3]),
                     ("desc", g[4]), ("disc", f".{g[5]}"), ("w", g[6]),
                     ("b", g[7]), ("ext", g[8])]
            headers.append((i, g[0], g[3], pairs))

    # classify every line ONCE for the marks grammar (audit §14): stripped
    # form, item-like flag, marks-header flag, and the rendered mark matches
    cls = []
    for l in lines:
        s = l.strip()
        cls.append((
            bool(_SC_ITEM_LIKE.match(s)),
            C.STEELCRAFT_MARKS_HEADER in s,
            s != "",
            [f"{n} ({q})" for n, q in _SC_MARK.findall(s)],
        ))

    def marks_for(idx: int) -> list[str]:
        """Reference grammar via the classification table: first header in
        the 30-line window (early item-like break) → first non-empty line
        of the next 3 with matches."""
        for i in range(idx + 1, min(idx + 1 + C.STEELCRAFT_MARKS_WINDOW, len(lines))):
            is_item, is_hdr, _, _ = cls[i]
            if is_item:
                return []
            if not is_hdr:
                continue
            for j in range(i + 1, min(i + 1 + C.STEELCRAFT_MARKS_INNER, len(lines))):
                is_item_j, _, non_empty, mm = cls[j]
                if not non_empty:
                    continue
                if mm:
                    return list(mm)
                if is_item_j:
                    break
            return []
        return []

    idxs = [i for i, *_ in headers]
    items, seen = [], set()
    for h, (idx, line_no, code, pairs) in enumerate(headers):
        if (line_no, code) in seen:
            continue
        seen.add((line_no, code))
        nxt = idxs[h + 1] if h + 1 < len(idxs) else len(lines)
        marks = marks_for(idx)
        # spec window
        for j in range(idx + 1, min(nxt, idx + 1 + C.STEELCRAFT_SPEC_WINDOW)):
            l = lines[j]
            for lbl, rx in _SC_SPECS:
                if (sm := rx.match(l)):
                    pairs.append(("spec_" + lbl, sm.group(1)))
                    break
        # pricing-detail window (<=30)
        for j in range(idx + 1, min(nxt, idx + 1 + C.STEELCRAFT_PRICING_WINDOW)):
            if (pm := _SC_PRICE.match(lines[j])):
                pairs.append((f"pd_{pm.group(1).lower().replace(' ', '_')}", pm.group(2)))
        # discount window (<=10, first only)
        for j in range(idx + 1, min(nxt, idx + 1 + C.STEELCRAFT_DISCOUNT_WINDOW)):
            if (dm := _SC_DISC.match(lines[j])):
                pairs.append(("discount_pct", dm.group(1)))
                break
        items.append({"line": line_no, "serialized": _serialize(pairs),
                      "marks": _dedupe_keep_order(marks)})
    return items


# ---------------------------------------------------------------------------
# Schlage (F10 + waybill rejoin + F13 info + J5 surcharge synthesis)
# ---------------------------------------------------------------------------
def _money(s: str) -> float:
    try:
        return float(s.replace(",", "").replace("$", ""))
    except ValueError:
        return 0.0


def schlage_items(lines: list[str], fields: dict[str, str]) -> list[dict]:
    """Classify-once twin of oracle._schlage_items (semantics:
    schlage_processor.py:1385-1553): every line is classified a single time
    into (waybill base, complete forms, fedex numbers, freight flag,
    continuation digits); items then gather over their i+1..i+7
    EOF-bounded windows — the reference does NOT stop at the next item.
    Lines are stripped first, as the reference does at its loop top
    (schlage_processor.py:1400, :1416, :1427). F13 additional-info is a
    DOCUMENT-level harvest, not an item attribute (audit §18) — see
    kernel.extract_batch."""
    lines = [l.strip() for l in lines]
    headers = [(i, m) for i, l in enumerate(lines) if (m := _SH_ITEM.match(l))]

    cls = []
    for l in lines:
        bm = _SH_WB_BASE.search(l)
        upper = l.upper()
        fedex = (
            [t for t in _SH_FEDEX.findall(l) if len(t) >= 12]
            if any(kw in upper for kw in C.SCHLAGE_FEDEX_KEYWORDS)
            else []
        )
        cm = _SH_WB_CONT.match(l)
        cls.append({
            "base": bm.group(0) if bm else None,
            "fulls": _SH_WB_FULL.findall(l),
            "fedex": fedex,
            "freight": any(kw in upper for kw in C.SCHLAGE_FREIGHT_KEYWORDS),
            "cont": cm.group(1) if cm else None,
        })

    items = []
    for h, (idx, m) in enumerate(headers):
        g = m.groups()
        unit = f"{round(_money(g[9]) - _money(g[10]), 2):.2f}"
        pairs = [("line", g[3]), ("brand", g[0]), ("carrier", g[1]),
                 ("ord", g[4]), ("shp", g[5]),
                 ("code", g[6]), ("desc", g[7]), ("ship", g[8]),
                 ("list", g[9]), ("disc", g[10]), ("dcode", g[11]),
                 ("unit", unit), ("ext", g[12])]
        hi = min(idx + 1 + C.SCHLAGE_WAYBILL_WINDOW, len(lines))
        way_bills: list[str] = []
        freight = None
        for j in range(idx + 1, hi):
            c = cls[j]
            if c["base"]:
                cont = next(
                    (cls[k]["cont"] for k in range(j + 1, min(j + 3, len(lines)))
                     if cls[k]["cont"]),
                    None,
                )
                if cont:
                    full = c["base"] + cont
                    if full not in way_bills:
                        way_bills.append(full)
                elif (c["base"] not in way_bills
                      and len(c["base"]) >= C.SCHLAGE_WAYBILL_MIN_BASE):
                    way_bills.append(c["base"])
            for t in c["fulls"]:
                if t not in way_bills:
                    way_bills.append(t)
            for t in c["fedex"]:
                if t not in way_bills:
                    way_bills.append(t)
            if c["freight"]:
                if freight is None:
                    freight = lines[j]
        if freight is not None:
            pairs.append(("freight", freight))
        for wb in way_bills:
            pairs.append(("waybill", wb))
        items.append({"line": g[3], "serialized": _serialize(pairs), "marks": []})

    # surcharge synthesis — the reference field set (audit §22; classify-
    # once twin of the oracle's form)
    if len(items) == 1:
        sur = fields.get("totals.surcharges")
        if not sur:
            m = _SH_SUR_AMT.search("\n".join(lines))
            sur = m.group(1) if m else None
        if sur:
            bm = re.search(r"(?:^|\|)brand=([^|]*)", items[0]["serialized"])
            main_brand = (bm.group(1) if bm else "") or "UNKNOWN"
            ln = str(len(items) + 1)
            pairs = [("line", ln), ("brand", main_brand), ("carrier", ""),
                     ("ord", "1"), ("shp", "1"), ("code", "AGN_SURCHARGE"),
                     ("desc", "Surcharge Item"), ("list", sur),
                     ("disc", "00.00"), ("unit", sur), ("ext", sur)]
            items.append({"line": ln, "serialized": _serialize(pairs), "marks": []})
    return items


def generic_items(lines: list[str]) -> list[dict]:
    items, seen = [], set()
    for l in lines:
        if (m := _GEN_ITEM.match(l)):
            line_no, code, qty, desc, unit, ext = m.groups()
            if (line_no, code) in seen:
                continue
            seen.add((line_no, code))
            pairs = [("line", line_no), ("code", code), ("qty", qty),
                     ("desc", desc), ("unit", unit), ("ext", ext)]
            items.append({"line": line_no, "serialized": _serialize(pairs),
                          "marks": []})
    return items


def extract_items(vendor: str, text: str, fields: dict[str, str]) -> list[dict]:
    lines = _filtered_lines(text)
    if vendor == "ceco":
        return ceco_items(lines)
    if vendor == "steelcraft":
        return steelcraft_items(lines)
    if vendor == "schlage":
        return schlage_items(lines, fields)
    return generic_items(lines)
