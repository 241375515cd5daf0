"""Property tests for the office fixture writers ↔ parsers: arbitrary
XML-representable unicode text round-trips through DOCX/XLSX/ODT, and
deep MIME nesting stays bounded."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_scripts_spark.sources.docxparse import (
    build_docx,
    parse_docx_spans,
)
from pdf_extractor_scripts_spark.sources.mimeparse import (
    build_mhtml,
    parse_mime_spans,
)
from pdf_extractor_scripts_spark.sources.odtparse import (
    build_odt,
    parse_odt_spans,
)
from pdf_extractor_scripts_spark.sources.xlsxparse import (
    build_xlsx,
    parse_xlsx_spans,
)

# XML 1.0 cannot represent control chars (other than \t\n\r) at all,
# and surrogates aren't unicode text; everything else must round-trip
_xml_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),
        blacklist_characters="".join(
            chr(c) for c in range(0x20) if c not in (0x09, 0x0A, 0x0D))
        + "￾￿",  # XML 1.0 Char excludes the BMP noncharacters
    ),
    min_size=0, max_size=80,
)


def _norm(s: str) -> str:
    return " ".join(s.split())


def _texts(spans):
    return [s["text"] for s in spans if s["kind"] == "text"]


@settings(max_examples=60, deadline=None)
@given(st.lists(_xml_text, min_size=1, max_size=5))
def test_docx_text_roundtrips(paras):
    got = _texts(parse_docx_spans(build_docx(paras), "d"))
    assert got == [_norm(p) for p in paras if _norm(p)]


@settings(max_examples=60, deadline=None)
@given(st.lists(_xml_text, min_size=1, max_size=5))
def test_odt_text_roundtrips(paras):
    got = _texts(parse_odt_spans(build_odt(paras), "d"))
    assert got == [_norm(p) for p in paras if _norm(p)]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(_xml_text, min_size=1, max_size=4),
                min_size=1, max_size=4),
       st.booleans())
def test_xlsx_rows_roundtrip(rows, shared):
    spans = parse_xlsx_spans(
        build_xlsx({"S": rows}, shared_strings=shared), "x")
    got = _texts(spans)
    want = ["S"] + [_norm(" ".join(r)) for r in rows
                    if _norm(" ".join(r))]
    assert got == want


def test_rfc822_nesting_is_depth_bounded():
    """Mail-in-mail-in-mail...: the recursion stops at the guard depth
    instead of unbounded descent (a crafted bomb shape)."""
    inner = build_mhtml(plain="level 0 body", subtype="mixed",
                        boundary="----=_lvl0")
    for lvl in range(1, 8):
        bnd = f"----=_lvl{lvl}".encode()
        wrapper = build_mhtml(plain=f"level {lvl} body", subtype="mixed",
                              boundary=bnd.decode())
        # graft the previous message as a message/rfc822 part (each
        # level uses its own boundary — nested same-boundary is
        # malformed MIME and would terminate the outer part early)
        part = (b"--" + bnd + b"\r\n"
                b"Content-Type: message/rfc822\r\n\r\n"
                + inner + b"\r\n")
        inner = wrapper.replace(b"--" + bnd + b"--",
                                part + b"--" + bnd + b"--")
    spans = parse_mime_spans(inner, "m")  # must terminate, no raise
    texts = " ".join(s["text"] for s in spans if s["kind"] == "text")
    assert "level 7 body" in texts          # outermost body present
    assert "level 0 body" not in texts      # beyond the depth guard
    assert len(spans) < 200
