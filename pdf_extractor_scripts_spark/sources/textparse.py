"""Plain-text documents: the corpus form WET extracts actually ship.

Common Crawl's WET sidecars are WARC *conversion* records whose
payload is the page's extracted text (Content-Type text/plain), and
any real crawl also carries bare .txt / README / license files. These
previously fell through to the PDF chain as counted fallbacks; they
are documents, and the cheapest ones in the corpus: decode, split on
blank lines, one text span per paragraph.

Sniffing is conservative — `looks_like_text` accepts only valid UTF-8
with no control bytes (beyond \\t\\r\\n\\f), so binary garbage keeps
failing LOUDLY through the PDF chain instead of silently becoming
mojibake "text". Legacy-charset plain text (windows-1252 WET records)
is still reached via the transport-layer Content-Type hint
(`parse_binary_to_spans(ctype_col=...)`: a text/plain declaration
routes non-PDF-magic bytes here with the declared charset).
"""

from __future__ import annotations

_CTL = set(range(0x20)) - {0x09, 0x0A, 0x0C, 0x0D}


def parse_text_spans(data: bytes | str, doc_id: str,
                     charset: str | None = None) -> list[dict]:
    """Text bytes → corpus span grammar: one page, one text span per
    blank-line-separated paragraph (whitespace-normalized)."""
    if isinstance(data, bytes):
        if data[:3] == b"\xef\xbb\xbf":
            data, charset = data[3:], "utf-8"
        try:
            text = data.decode(charset or "utf-8", errors="replace")
        except LookupError:
            text = data.decode("utf-8", errors="replace")
    else:
        text = data
    spans = [{"kind": "page_break", "text": "=== PAGE 1 ===",
              "media_ref": "", "offset": 0}]
    off = 1
    for para in text.replace("\r\n", "\n").replace("\r", "\n").split("\n\n"):
        t = " ".join(para.split())
        if t:
            spans.append({"kind": "text", "text": t,
                          "media_ref": "", "offset": off})
            off += 1
    return spans


def plausible_declared_text(content: bytes) -> bool:
    """Sanity floor for TRANSPORT-declared text/plain: non-empty and
    free of control bytes (beyond whitespace) in the first 4 KB. A
    JPEG/ZIP served as text/plain by a misconfigured server fails
    this and stays a loud PDF-chain fallback instead of becoming
    mojibake 'paragraphs'; legacy single-byte charsets (the
    windows-1252 WET record) pass — they use no control bytes."""
    head = content[:4096]
    if not head.strip():
        return False
    return not any(b in _CTL for b in head)


def looks_like_text(content: bytes) -> bool:
    """Conservative plain-text sniff: non-empty, valid UTF-8 (in the
    first 4 KB, cut at a codepoint boundary), no control bytes beyond
    whitespace, at least one non-whitespace character."""
    head = content[:4096]
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    if not head.strip():
        return False
    if any(b in _CTL for b in head):
        return False
    # cut a possibly-split trailing multibyte sequence
    cut = len(head)
    while cut > max(0, len(head) - 4) and head[cut - 1] & 0x80:
        if head[cut - 1] & 0xC0 == 0xC0:  # lead byte: drop the tail
            cut -= 1
            break
        cut -= 1
    try:
        head[:cut].decode("utf-8")
    except UnicodeDecodeError:
        return False
    return True
