"""Markdown and CSV/TSV documents — the last big plain-text-family
corpus forms.

Markdown is the native format of code-hosting corpora (READMEs, docs
sites, wikis). The parse is line-based CommonMark-lite: ATX and
setext headings, blank-line paragraphs with soft-wrapped lines
joined, fenced code blocks kept whole as single text spans (code IS
content in a training corpus), list items one span each (the HTML
``<li>`` rule), pipe tables row-coherent with separator rows dropped
(the ``<tr>`` rule), blockquote markers stripped, emphasis/inline-
code markers unwrapped, links keep their text, and images become
``media`` spans carrying the URL (the HTML ``<img src>`` rule).

CSV/TSV maps like a worksheet: one text span per record with fields
space-joined (the row-coherence rule everywhere else), quoting and
embedded newlines handled by the stdlib ``csv`` reader. Sniffing is
conservative — a document routes here only when several consecutive
lines agree on a delimiter structure; prose never does.
"""

from __future__ import annotations

import csv
import io
import re

_FENCE = re.compile(r"^(```|~~~)")
_ATX = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_SETEXT = re.compile(r"^(=+|-+)\s*$")
_LIST_ITEM = re.compile(r"^\s{0,3}(?:[-*+]|\d{1,9}[.)])\s+(.*)$")
_TABLE_ROW = re.compile(r"^\s*\|.*\|\s*$")
_TABLE_SEP = re.compile(r"^\s*\|?\s*:?-{2,}:?\s*(\|\s*:?-{2,}:?\s*)+\|?\s*$")
_IMAGE = re.compile(r"!\[([^\]]*)\]\(\s*(<[^>]*>|[^)\s]+)[^)]*\)")
_LINK = re.compile(r"(?<!!)\[([^\]]+)\]\(\s*(?:<[^>]*>|[^)\s]+)[^)]*\)")
_CODE_SPAN = re.compile(r"`([^`]*)`")
_EMPH = re.compile(r"(\*\*\*|___|\*\*|__|\*|_)(?=\S)(.+?)(?<=\S)\1")
_HRULE = re.compile(r"^\s{0,3}([-*_])\s*(?:\1\s*){2,}$")


def _inline(text: str, images: list[str]) -> str:
    """Strip inline markup; collect image URLs in placement order."""
    def img(m):
        url = m.group(2).strip("<>")
        images.append(url)
        return m.group(1)  # alt text stays in the block

    text = _IMAGE.sub(img, text)
    text = _LINK.sub(r"\1", text)
    text = _CODE_SPAN.sub(r"\1", text)
    for _ in range(3):  # nested emphasis: ***x*** etc.
        new = _EMPH.sub(r"\2", text)
        if new == text:
            break
        text = new
    return text


def parse_md_spans(data: bytes | str, doc_id: str,
                   charset: str | None = None) -> list[dict]:
    """Markdown bytes → ordered (kind, text, media_ref, offset) spans."""
    if isinstance(data, bytes):
        if data[:3] == b"\xef\xbb\xbf":
            data, charset = data[3:], "utf-8"
        try:
            text = data.decode(charset or "utf-8", errors="replace")
        except LookupError:
            text = data.decode("utf-8", errors="replace")
    else:
        text = data
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")

    spans: list[dict] = [{"kind": "page_break", "text": "=== PAGE 1 ===",
                          "media_ref": "", "offset": 0}]
    off = 1
    parts: list[str] = []
    images: list[str] = []

    def _emit_text(t: str):
        nonlocal off
        t = " ".join(t.split())
        if t:
            spans.append({"kind": "text", "text": t,
                          "media_ref": "", "offset": off})
            off += 1

    def _emit_images(urls: list[str]):
        nonlocal off
        for url in urls:
            spans.append({"kind": "media", "text": "",
                          "media_ref": url, "offset": off})
            off += 1

    def flush():  # close the open paragraph (its text, then its images)
        _emit_text(" ".join(parts))
        _emit_images(images)
        parts.clear()
        images.clear()

    def emit_block(raw: str, inline: bool = True):
        flush()  # a block construct ends any open paragraph first
        local: list[str] = []
        _emit_text(_inline(raw, local) if inline else raw)
        _emit_images(local)

    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        stripped = line.strip()
        m = _FENCE.match(stripped)
        if m:  # fenced code block: one span, verbatim-joined
            fence = m.group(1)
            j = i + 1
            code: list[str] = []
            while j < n and not lines[j].strip().startswith(fence):
                code.append(lines[j])
                j += 1
            emit_block(" ".join(code), inline=False)
            i = j + 1
            continue
        if not stripped or _HRULE.match(stripped):
            flush()
            i += 1
            continue
        m = _ATX.match(stripped)
        if m:
            emit_block(m.group(2))
            i += 1
            continue
        if _TABLE_ROW.match(stripped):
            if _TABLE_SEP.match(stripped):
                i += 1
                continue
            cells = [c.strip() for c in stripped.strip("|").split("|")]
            emit_block(" ".join(c for c in cells if c))
            i += 1
            continue
        m = _LIST_ITEM.match(line)
        if m:
            emit_block(m.group(1))
            i += 1
            continue
        if (i + 1 < n and _SETEXT.match(lines[i + 1].strip())
                and not parts and stripped):
            emit_block(stripped)  # setext heading
            i += 2
            continue
        if stripped.startswith(">"):
            stripped = stripped.lstrip("> ")
        parts.append(_inline(stripped, images))
        i += 1
    flush()
    return spans


def looks_like_markdown(content: bytes) -> bool:
    """Conservative: plain text that carries unmistakable markdown
    structure (an ATX heading line or a code fence) in the first 2 KB."""
    from .textparse import looks_like_text

    if not looks_like_text(content):
        return False
    head = content[:2048]
    for raw in head.split(b"\n")[:40]:
        s = raw.strip()
        if s.startswith((b"```", b"~~~")):
            return True
        if re.match(rb"^#{1,6}\s+\S", s):
            return True
    return False


# ---------------------------------------------------------------------------
# CSV / TSV


def parse_csv_spans(data: bytes | str, doc_id: str,
                    charset: str | None = None,
                    delimiter: str | None = None) -> list[dict]:
    """CSV/TSV bytes → one text span per record, fields space-joined
    (the row-coherence rule); stdlib csv handles quoting and embedded
    newlines."""
    if isinstance(data, bytes):
        if data[:3] == b"\xef\xbb\xbf":
            data, charset = data[3:], "utf-8"
        try:
            text = data.decode(charset or "utf-8", errors="replace")
        except LookupError:
            text = data.decode("utf-8", errors="replace")
    else:
        text = data
    if delimiter is None:
        delimiter = _csv_delimiter(text)
        if delimiter is None:
            raise ValueError("no consistent CSV/TSV delimiter structure")
    spans: list[dict] = [{"kind": "page_break", "text": "=== PAGE 1 ===",
                          "media_ref": "", "offset": 0}]
    off = 1
    for row in csv.reader(io.StringIO(text), delimiter=delimiter):
        t = " ".join(" ".join(row).split())
        if t:
            spans.append({"kind": "text", "text": t,
                          "media_ref": "", "offset": off})
            off += 1
    return spans


def _csv_delimiter(text: str, probe_rows: int = 6) -> str | None:
    """',' | '\\t' | ';' when the first ``probe_rows`` non-empty RECORDS
    (a real csv parse, so quoted embedded newlines count as one record)
    agree on a field count ≥ 2 for that delimiter, else None."""
    for d in ("\t", ",", ";"):
        counts: list[int] = []
        try:
            for row in csv.reader(io.StringIO(text), delimiter=d):
                if any(f.strip() for f in row):
                    counts.append(len(row))
                if len(counts) >= probe_rows:
                    break
        except csv.Error:
            continue
        if len(counts) >= 3 and counts[0] >= 2 and len(set(counts)) == 1:
            return d
    return None


def looks_like_csv(content: bytes) -> bool:
    """Conservative structural sniff: valid text whose leading lines
    agree on a delimiter (prose never does)."""
    from .textparse import looks_like_text

    if not looks_like_text(content):
        return False
    head = content[:4096].decode("utf-8", errors="replace")
    return _csv_delimiter(head) is not None
