"""RSS 2.0 / Atom feed parsing — the web's syndication container.

Crawls collect feeds constantly (every blog and news site exports
one), and each entry is a document: mapping is ONE PAGE PER
ENTRY/ITEM in feed order, the entry title as the page's first text
span, then the entry body — ``content:encoded`` / Atom ``content`` /
``description``/``summary``, which in the wild is escaped HTML —
through the HTML block extractor with the boilerplate classifier OFF
(feed bodies are all content, the EPUB rule). Enclosures and Atom
media links become ``media`` spans carrying their URL (the crawl
reference form). The channel/feed title leads the document.

Sniffing matches the ROOT ELEMENT only (``<rss``, ``<feed``, or an
``<rdf:RDF`` RSS 1.0 root) after the XML prolog — an HTML page that
merely mentions "<rss" in text never routes here.
"""

from __future__ import annotations

import re

_ATOM = "{http://www.w3.org/2005/Atom}"
_CONTENT_NS = "{http://purl.org/rss/1.0/modules/content/}"
_RSS1 = "{http://purl.org/rss/1.0/}"
_RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"

_PROLOG = re.compile(
    rb"^(?:\s|<\?xml[^>]*\?>|<!--.*?-->|<!DOCTYPE[^>]*>)*", re.S)


class FeedError(ValueError):
    """Raised for bytes that are not a parseable feed."""


def _root_element(content: bytes) -> bytes:
    m = _PROLOG.match(content[:4096])
    rest = content[m.end():m.end() + 64] if m else content[:64]
    m2 = re.match(rb"<([A-Za-z][\w:.-]*)", rest)
    return m2.group(1).lower() if m2 else b""


def looks_like_feed(content: bytes) -> bool:
    return _root_element(content) in (b"rss", b"feed", b"rdf:rdf")


def _text(el) -> str:
    return " ".join("".join(el.itertext()).split()) if el is not None else ""


_XHTML_BLOCKS = {"p", "div", "ul", "ol", "li", "table", "tr",
                 "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6"}


def _xhtml_paras(el) -> list[str]:
    """Mixed-content xhtml → paragraph strings: block children split
    paragraphs (recursively), inline children and their TAILS stay in
    the current paragraph — itertext alone glues adjacent <p>s and a
    child-only loop loses el.text and every .tail."""
    paras: list[str] = []
    cur: list[str] = [el.text or ""]
    for child in el:
        local = child.tag.rsplit("}", 1)[-1].lower()
        if local in _XHTML_BLOCKS:
            paras.append("".join(cur))
            cur = []
            paras.extend(_xhtml_paras(child))
        else:
            cur.append("".join(child.itertext()))
        cur.append(child.tail or "")
    paras.append("".join(cur))
    return [p for p in (" ".join(x.split()) for x in paras) if p]


def _html_blocks(markup: str) -> list[dict]:
    from .htmlparse import extract_main_blocks

    return extract_main_blocks(markup, classify=False)


def parse_feed_spans(data: bytes, doc_id: str) -> list[dict]:
    """Feed bytes → ordered (kind, text, media_ref, offset) spans —
    one page per entry."""
    from xml.etree import ElementTree as ET

    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise FeedError(f"malformed feed XML: {e}") from None

    spans: list[dict] = []
    off = 0

    def emit_text(t: str):
        nonlocal off
        t = " ".join(t.split())
        if t:
            spans.append({"kind": "text", "text": t,
                          "media_ref": "", "offset": off})
            off += 1

    def emit_media(url: str):
        nonlocal off
        if url:
            spans.append({"kind": "media", "text": "",
                          "media_ref": url, "offset": off})
            off += 1

    def emit_body(markup: str):
        for blk in _html_blocks(markup):
            emit_text(blk["text"])
            for src in blk["images"]:
                emit_media(src)

    def page(n: int):
        nonlocal off
        spans.append({"kind": "page_break", "text": f"=== PAGE {n} ===",
                      "media_ref": "", "offset": off})
        off += 1

    tag = root.tag.lower()
    if tag == "rss" or tag.endswith("}rdf"):
        # explicit None check: Element truthiness is deprecated (Python
        # 3.12+) and would treat a present-but-childless <channel/> as
        # missing (r7 ADVICE fix)
        channel = root.find("channel")
        if channel is None:
            channel = root.find(f"{_RSS1}channel")
        page(1)
        if channel is not None:
            emit_text(_text(channel.find("title")
                            if channel.find("title") is not None
                            else channel.find(f"{_RSS1}title")))
        items = root.findall(".//item") + root.findall(f".//{_RSS1}item")
        if not items:
            raise FeedError("RSS feed has no items")
        for n, item in enumerate(items, start=2):
            page(n)
            emit_text(_text(item.find("title")
                            if item.find("title") is not None
                            else item.find(f"{_RSS1}title")))
            body = item.find(f"{_CONTENT_NS}encoded")
            if body is None or not _text(body):
                body = (item.find("description")
                        if item.find("description") is not None
                        else item.find(f"{_RSS1}description"))
            if body is not None:
                emit_body("".join(body.itertext()))
            for enc in item.findall("enclosure"):
                emit_media(enc.get("url", ""))
    elif root.tag == f"{_ATOM}feed":
        page(1)
        emit_text(_text(root.find(f"{_ATOM}title")))
        entries = root.findall(f"{_ATOM}entry")
        if not entries:
            raise FeedError("Atom feed has no entries")
        for n, entry in enumerate(entries, start=2):
            page(n)
            emit_text(_text(entry.find(f"{_ATOM}title")))
            body = entry.find(f"{_ATOM}content")
            if body is None or not _text(body):
                body = entry.find(f"{_ATOM}summary")
            if body is not None:
                if body.get("type") == "html":
                    # escaped HTML: itertext gives the MARKUP string
                    emit_body("".join(body.itertext()))
                elif body.get("type") == "xhtml":
                    # real XML children (a single xhtml div): walk the
                    # MIXED content — block children split paragraphs,
                    # inline children and tails stay in place
                    for para in _xhtml_paras(body):
                        emit_text(para)
                else:
                    emit_text(_text(body))
            for link in entry.findall(f"{_ATOM}link"):
                if link.get("rel") == "enclosure":
                    emit_media(link.get("href", ""))
    else:
        raise FeedError(f"unknown feed root {root.tag!r}")
    return spans


# ---------------------------------------------------------------------------
# fixture writer


from .xmlutil import xml_attr, xml_escape as _esc  # noqa: E402


def build_rss(title: str, items: list[dict]) -> bytes:
    """Deterministic RSS 2.0 fixture: items have ``title``,
    ``html`` (escaped into description), optional ``enclosure``."""
    parts = [f"<channel><title>{_esc(title)}</title>"]
    for it in items:
        parts.append("<item>")
        parts.append(f"<title>{_esc(it.get('title', ''))}</title>")
        if it.get("html"):
            parts.append(f"<description>{_esc(it['html'])}</description>")
        if it.get("enclosure"):
            parts.append(f'<enclosure url={xml_attr(it["enclosure"])} '
                         'type="audio/mpeg" length="1"/>')
        parts.append("</item>")
    parts.append("</channel>")
    return (b'<?xml version="1.0" encoding="UTF-8"?>'
            b'<rss version="2.0">' + "".join(parts).encode() + b"</rss>")


def build_atom(title: str, entries: list[dict]) -> bytes:
    """Deterministic Atom fixture: entries have ``title``, ``html``
    (content type=html), optional ``enclosure``."""
    parts = [f"<title>{_esc(title)}</title>"]
    for e in entries:
        parts.append("<entry>")
        parts.append(f"<title>{_esc(e.get('title', ''))}</title>")
        if e.get("html"):
            parts.append(
                f'<content type="html">{_esc(e["html"])}</content>')
        if e.get("enclosure"):
            parts.append(
                f'<link rel="enclosure" href={xml_attr(e["enclosure"])}/>')
        parts.append("</entry>")
    return (b'<?xml version="1.0" encoding="UTF-8"?>'
            b'<feed xmlns="http://www.w3.org/2005/Atom">'
            + "".join(parts).encode() + b"</feed>")
