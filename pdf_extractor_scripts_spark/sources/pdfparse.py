"""Pure-Python (stdlib-only) PDF byte-stream parsing → interleaved spans.

This is the real implementation of the S2-S4 parse slot (reference:
pdfplumber/PyPDF2/fitz parse branches, text_pdf_processor.py:661-670,
pdf_text_detector.py:171-204, schlage_processor.py:230-261). No PDF toolkit
ships in this sandbox, so the parse is built directly on the PDF 1.4 file
format: classic xref table walk → trailer /Root → /Pages page-tree traversal
in document order → per-page /Contents stream fetch (FlateDecode via stdlib
zlib) → content-stream tokenization (BT/ET text blocks; Tj / TJ / ' / " show
operators; Td/TD/T*/Tm line moves; Do image-XObject placements; Do form-
XObject placements expanded inline against the form's own /Resources,
with cycle/depth guards; /Pages-tree attribute inheritance §7.7.3.4).

Output span grammar matches the corpus fixtures (FIXTURES.md):
  page_break  "=== PAGE {n} ==="            one per page, in order
  text        one span per rendered line     selectable-text pages
  media       media_ref=img://{doc}/{p}/{i}  one per image placement
Image pages yield media spans only — text inside an image is physically
unreadable without OCR, which is the downstream O2 stage's job.

Stream filters (r4): FlateDecode, LZWDecode, ASCIIHexDecode, ASCII85Decode
and RunLengthDecode are decoded (pure stdlib), with PNG/TIFF predictor
support for Flate/LZW (the layout every real xref stream uses); terminal
image codecs (DCTDecode/JPXDecode/CCITTFax/JBIG2) pass their compressed
bytes through — a page image's payload IS the compressed image, which is
exactly what the media-span model wants (pixel decode is the env-blocked
multimodal seam, operators/multimodal.py). Encrypted PDFs (r5, extended
r6): standard security handler with an EMPTY user password decrypts
transparently — RC4 (V1/V2 R2-R3, V4/R4 with a /V2 crypt filter), AES-128
(V4/AESV2, the Acrobat 7+ default) and AES-256 (V5 R5-R6 AESV3) — the
common real-world "secured" invoice; the reference's PyPDF2 .decrypt('')
(pdf_text_detector.py:171-204) handles only the RC4 subset, so the AES
families are engine-exceeds-reference coverage. A nonempty user password
or a non-Standard (public-key) handler raises PdfEncryptedError so ingest
counts genuinely locked files as a distinct parse-fallback reason
(reference behavior: pdfplumber raises and the fallback chain advances,
text_pdf_processor.py:661-670).

Text decoding (r6): show-op bytes resolve through the page's /Resources
/Font — /ToUnicode CMaps (bfchar/bfrange, multi-width codespaces — the
subset-font layout every modern writer emits), Type0/Identity-H CID hex
strings (best-effort code-point identity without a ToUnicode), simple-
font /Encoding (WinAnsiEncoding = cp1252, MacRomanEncoding, /Differences
glyph-name arrays over an AGL subset + uniXXXX), latin-1 otherwise (the
pre-r6 behavior, pinned). The reference gets this for free from
PyPDF2/pdfplumber's font machinery; this is the pure-stdlib equivalent.

Scope (documented simplifications, fine for the invoice-class PDFs the
reference handles): one text line per Td/TD/T*/Tm move (how virtually
every line-oriented PDF writer, including ours, emits text).

The module also ships a deterministic PDF WRITER (build_pdf) so tests can
round-trip: fixture lines → real PDF bytes → parse_pdf_spans → identical
span sequence → identical pipeline output.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from binascii import hexlify


# ---------------------------------------------------------------------------
# Object model
# ---------------------------------------------------------------------------
class PdfEncryptedError(ValueError):
    """The file is GENUINELY locked: an unsupported handler (public-key
    /Adobe.PubSec, mixed crypt filters) or a nonempty user password
    (empty-password verification failed). Raised eagerly at document open
    so ingest metrics count 'encrypted' as its own fallback reason (the
    exception NAME is the reason key in parse_error). Standard-handler RC4
    (r5) and AES-128/AES-256 (r6) with an empty user password no longer
    land here — those files decrypt transparently."""


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover
        return f"Ref({self.num})"


class Name(str):
    """A PDF name token (/Type etc.) — distinct from string literals."""


_DELIM = b"()<>[]{}/%"
_WS = b"\x00\t\n\x0c\r "


class _Lexer:
    """Minimal per-character PDF token reader over a bytes buffer — the
    REFERENCE tokenizer. Production paths use the regex-based _CLexer
    (same token stream, ~2x faster); a differential property test pins
    the two token-for-token on arbitrary input, so this implementation
    is the executable spec _CLexer is checked against."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, i, n = self.data, self.pos, len(self.data)
        while i < n:
            c = d[i]
            if c in _WS:
                i += 1
            elif c == 0x25:  # % comment
                j = d.find(b"\n", i)
                i = n if j < 0 else j + 1
            else:
                break
        self.pos = i

    def next_token(self):
        """→ ('num', float) | ('str', bytes) | ('name', str) | ('op', bytes)
        | ('dict_open'/'dict_close'/'arr_open'/'arr_close', None) | None."""
        self._skip_ws()
        d, i = self.data, self.pos
        if i >= len(d):
            return None
        c = d[i : i + 1]
        if c == b"(":
            return self._literal_string()
        if c == b"<":
            if d[i : i + 2] == b"<<":
                self.pos = i + 2
                return ("dict_open", None)
            return self._hex_string()
        if c == b">":
            if d[i : i + 2] == b">>":
                self.pos = i + 2
                return ("dict_close", None)
            self.pos = i + 1
            return ("op", b">")
        if c == b"[":
            self.pos = i + 1
            return ("arr_open", None)
        if c == b"]":
            self.pos = i + 1
            return ("arr_close", None)
        if c == b"/":
            j = i + 1
            while j < len(d) and d[j] not in _WS and d[j] not in _DELIM:
                j += 1
            self.pos = j
            raw = d[i + 1 : j]
            if b"#" in raw:
                # PDF 1.2+ name escapes: #xx hex pairs (/A#20B = 'A B');
                # a malformed '#' without two hex digits stays literal
                raw = re.sub(
                    rb"#([0-9A-Fa-f]{2})",
                    lambda m: bytes([int(m.group(1), 16)]),
                    raw,
                )
            return ("name", raw.decode("latin-1"))
        if c in b"+-.0123456789":
            j = i + 1
            while j < len(d) and d[j : j + 1] in b"+-.0123456789":
                j += 1
            self.pos = j
            return ("num", float(d[i:j]))
        # operator / keyword: run of regular characters
        j = i
        while j < len(d) and d[j] not in _WS and d[j] not in _DELIM:
            j += 1
        if j == i:  # lone delimiter we don't model
            self.pos = i + 1
            return ("op", c)
        self.pos = j
        return ("op", d[i:j])

    def _literal_string(self):
        val, self.pos = _read_literal(self.data, self.pos)
        return ("str", val)

    def _hex_string(self):
        val, self.pos = _read_hex(self.data, self.pos)
        return ("str", val)


def _read_literal(data: bytes, pos: int) -> tuple[bytes, int]:
    """Read a ( ) literal string starting at ``pos`` (the open paren);
    returns (value, position after the close paren). Fast path: no
    backslash and no nested paren — the overwhelmingly common case in
    show-operator strings — resolves with one find() + slice."""
    i = pos + 1
    j = data.find(b")", i)
    if j < 0:
        raise ValueError("unterminated string literal")
    seg = data[i:j]
    if b"\\" not in seg and b"(" not in seg:
        return seg, j + 1
    out = bytearray()
    depth = 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            e = data[i : i + 1]
            esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                   b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}
            if e in esc:
                out += esc[e]
                i += 1
            elif e.isdigit():  # octal, up to 3 digits
                j = i
                while j < i + 3 and j < n and chr(data[j]).isdigit():
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in (b"\n", b"\r"):  # line continuation
                i += 1
            else:
                out += e
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated string literal")


def _read_hex(data: bytes, pos: int) -> tuple[bytes, int]:
    """Read a < > hex string starting at ``pos`` (the '<')."""
    j = data.find(b">", pos)
    if j < 0:
        raise ValueError("unterminated hex string")
    hx = re.sub(rb"\s", b"", data[pos + 1 : j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), j + 1


# Content-stream master tokenizer (r5): one compiled-regex match per token
# replaces _Lexer's per-character branch chain — the parse hotspot (35% of
# wall in cProfile, 180k next_token calls per 400 docs). Alternation order
# matters (<< before <); group index = token kind. The whitespace class is
# exactly _WS and comments run to newline, mirroring _Lexer bit-for-bit.
_CTOK = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\n]*)+"
    rb"|(\()"
    rb"|(<<)"
    rb"|(>>)"
    rb"|(<)"
    rb"|(\[)"
    rb"|(\])"
    rb"|/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|([+\-.0-9][+\-.0-9]*)"
    rb"|([^\x00\t\n\x0c\r ()<>\[\]{}/%]+)"
    rb"|(.)",
    re.S,
)


class _CLexer:
    """Drop-in _Lexer replacement for CONTENT streams: same next_token
    token tuples, same externally-assignable ``pos`` (the BI..ID inline-
    image skip rewinds it), built on the _CTOK master regex. Object/dict
    parsing keeps the generic _Lexer — it is not hot."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:  # _parse_value compatibility
        m = _CTOK.match(self.data, self.pos)
        if m is not None and m.lastindex is None:
            self.pos = m.end()

    def next_token(self):
        data = self.data
        m = _CTOK.match(data, self.pos)
        if m is None:
            return None
        if m.lastindex is None:  # whitespace/comments
            self.pos = m.end()  # EOF-after-ws leaves pos at end (as _Lexer)
            m = _CTOK.match(data, self.pos)
            if m is None:
                return None
        g = m.lastindex
        self.pos = m.end()
        if g >= 8:
            if g == 8:
                return ("num", float(m.group(8)))
            return ("op", m.group(g))
        if g == 7:
            raw = m.group(7)
            if b"#" in raw:
                raw = re.sub(
                    rb"#([0-9A-Fa-f]{2})",
                    lambda mm: bytes([int(mm.group(1), 16)]),
                    raw,
                )
            return ("name", raw.decode("latin-1"))
        if g == 1:
            val, self.pos = _read_literal(data, m.start())
            return ("str", val)
        if g == 4:
            val, self.pos = _read_hex(data, m.start())
            return ("str", val)
        return (
            ("dict_open", None), ("dict_close", None),
            None, ("arr_open", None), ("arr_close", None),
        )[g - 2]


def _parse_value(lx: _Lexer, tok=None):
    """Recursive-descent parse of one PDF object value (dict/array/number/
    name/string/ref/bool/null)."""
    if tok is None:
        tok = lx.next_token()
    if tok is None:
        raise ValueError("unexpected EOF in object")
    kind, val = tok
    if kind == "dict_open":
        d: dict = {}
        while True:
            t = lx.next_token()
            if t is None or t[0] == "dict_close":
                return d
            if t[0] != "name":
                raise ValueError(f"dict key must be a name, got {t}")
            d[t[1]] = _parse_value(lx)
    if kind == "arr_open":
        arr = []
        while True:
            t = lx.next_token()
            if t is None or t[0] == "arr_close":
                return arr
            arr.append(_parse_value(lx, t))
    if kind == "num":
        # look ahead for "gen R" indirect reference
        save = lx.pos
        t2 = lx.next_token()
        if t2 and t2[0] == "num":
            t3 = lx.next_token()
            if t3 and t3 == ("op", b"R"):
                return Ref(int(val))
        lx.pos = save
        return int(val) if val == int(val) else val
    if kind == "name":
        return Name(val)
    if kind == "str":
        return val
    if kind == "op":
        if val == b"true":
            return True
        if val == b"false":
            return False
        if val == b"null":
            return None
    raise ValueError(f"unexpected token {tok}")


# ---------------------------------------------------------------------------
# Document structure: xref walk → page tree → streams
# ---------------------------------------------------------------------------
class PdfDocument:
    def __init__(self, data: bytes):
        self.data = data
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, tuple] = {}
        self._enc_key: bytes | None = None
        self._enc_method: str | None = None
        try:
            self.offsets, self.trailer = self._read_xref_chain()
            if "Root" not in self.trailer:
                raise ValueError("xref chain yielded no /Root")
        except PdfEncryptedError:
            raise
        except Exception:
            # xref recovery (r5): truncated tails, garbage startxref
            # offsets, and overwritten xref tables are the dirty tail of
            # every real corpus (reference behavior: PyPDF2's lenient mode
            # rebuilds the table the same way). Scan for object headers,
            # newest (last) occurrence wins — incremental updates append.
            self._rebuild_xref_by_scan()
            # the scan walks objects BEFORE decryption is configured; drop
            # anything it cached so encrypted payloads re-read decrypted
            self._cache.clear()
            self._objstm_cache.clear()
        if "Encrypt" in self.trailer:
            # standard security handler with an EMPTY user password (the
            # common real-world "secured" invoice — the reference opens
            # these via PyPDF2 .decrypt(''), pdf_text_detector.py:171-204)
            # decrypts transparently; anything else raises the DISTINCT
            # PdfEncryptedError class so ingest metrics count 'encrypted'
            # as its own fallback reason
            self._setup_decryption()

    def _setup_decryption(self) -> None:
        """Standard-handler empty-password setup — RC4 V1/V2 R2-R3
        (spec §7.6.3), AES-128 V4/AESV2, AES-256 V5/R5-R6 AESV3
        (PDF 2.0 §7.6.4). The /Encrypt dict itself is never encrypted, so
        fetching it before ``_enc_key`` is set is exactly right."""
        from .pdfcrypt import (
            derive_file_key,
            verify_r6_password,
            verify_user_password,
        )

        enc = self.get(self.trailer["Encrypt"])
        filt = self.get(enc.get("Filter"))
        v = int(self.get(enc.get("V", 0)) or 0)
        r = int(self.get(enc.get("R", 0)) or 0)
        length = int(self.get(enc.get("Length", 40)) or 40)
        encrypt_metadata = bool(self.get(enc.get("EncryptMetadata", True)))
        v4 = self._v4_method(enc) if v == 4 and r == 4 else None
        if filt == "Standard" and v in (1, 2) and r in (2, 3):
            method = "rc4"
        elif filt == "Standard" and v4 is not None:
            method, length = v4
        elif filt == "Standard" and v == 5 and r in (5, 6) \
                and self._v4_method(enc, aes256=True) is not None:
            # AES-256: SHA-2 key derivation, no /ID or RC4 legacy inputs
            u = self.get(enc.get("U")) or b""
            o = self.get(enc.get("O")) or b""
            ue = self.get(enc.get("UE")) or b""
            oe = self.get(enc.get("OE")) or b""
            key = verify_r6_password(b"", u, o, ue, oe, r)
            if key is None:
                raise PdfEncryptedError(
                    "password-protected — empty user password rejected"
                )
            self._enc_key = key
            self._enc_method = "aes256"
            return
        else:
            cfm = self._v4_cfm(enc) if v >= 4 else None
            raise PdfEncryptedError(
                f"unsupported encryption (Filter={filt} V={v} R={r}"
                + (f" CFM={cfm}" if cfm else "")
                + ") — standard handler only: RC4 V1/V2 R2-R3, V4/R4 "
                "RC4 or AESV2, V5 R5-R6 AESV3"
            )
        from .pdfcrypt import recover_user_password

        o = self.get(enc.get("O")) or b""
        u = self.get(enc.get("U")) or b""
        p = int(self.get(enc.get("P", -1)))
        ids = self.get(self.trailer.get("ID")) or []
        id0 = self.get(ids[0]) if ids else b""
        key = derive_file_key(b"", o, p, id0, r, length, encrypt_metadata)
        if not verify_user_password(key, u, id0, r):
            # the OWNER route (Algorithm 7): an empty owner password
            # recovers the user password from /O — PyPDF2's .decrypt('')
            # tries exactly this after the user check fails
            upw = recover_user_password(b"", o, r)
            key = derive_file_key(upw, o, p, id0, r, length,
                                  encrypt_metadata)
            if not verify_user_password(key, u, id0, r):
                raise PdfEncryptedError(
                    "password-protected — empty user and owner passwords "
                    "rejected"
                )
        self._enc_key = key
        self._enc_method = method

    def _v4_cfm(self, enc) -> str | None:
        """The /CFM of the crypt filter the default stream filter (/StmF)
        names, or None when it cannot be resolved."""
        cf = self.get(enc.get("CF")) or {}
        stmf = self.get(enc.get("StmF", "Identity"))
        entry = self.get(cf.get(str(stmf))) if str(stmf) in cf else None
        return str(self.get(entry.get("CFM"))) if entry else None

    def _v4_method(self, enc, aes256: bool = False):
        """(method, key length bits) iff this V4/V5 dict is uniformly one
        supported cipher: both default filters (/StmF, /StrF) must name a
        crypt filter whose /CFM is /V2 (RC4), /AESV2, or — when
        ``aes256`` — /AESV3. Mixed filters, /Identity defaults, or a
        missing /CF → None (reject — per-filter mixing is beyond this
        reader)."""
        cf = self.get(enc.get("CF")) or {}
        names = {str(self.get(enc.get(k, "Identity"))) for k in ("StmF", "StrF")}
        if len(names) != 1 or "Identity" in names:
            return None
        entry = self.get(cf.get(names.pop()))
        if not isinstance(entry, dict):
            return None
        cfm = str(self.get(entry.get("CFM")))
        if aes256:
            return ("aes256", 256) if cfm == "AESV3" else None
        if cfm == "AESV2":
            return ("aes128", 128)
        if cfm != "V2":
            return None
        n = int(self.get(entry.get("Length", 16)) or 16)
        # CF /Length is spec'd in BYTES but some writers emit bits
        return ("rc4", n * 8 if n <= 16 else n)

    def _decrypt_data(self, data: bytes, num: int, gen: int) -> bytes:
        """One string/stream payload through the configured cipher: RC4 and
        AES-128 use a per-object key (the latter with the ``sAlT`` suffix
        and an IV+CBC+padding payload); AES-256 uses the file key
        directly. The GENERATION number participates in the per-object key
        (spec Algorithm 1) — gen>0 objects decrypt to garbage without it."""
        from .pdfcrypt import object_key, object_key_aes, pdf_aes_decrypt, rc4

        if self._enc_method == "rc4":
            return rc4(object_key(self._enc_key, num, gen), data)
        if self._enc_method == "aes128":
            return pdf_aes_decrypt(object_key_aes(self._enc_key, num, gen), data)
        return pdf_aes_decrypt(self._enc_key, data)

    def _decrypt_strings(self, val, num: int, gen: int = 0):
        """Strings in a directly-stored object are encrypted with that
        object's key; nested direct dicts/arrays inherit it — INCLUDING a
        stream object's own dict (spec: all strings outside the /Encrypt
        dict). Objects inside an /ObjStm are NOT separately encrypted —
        their container stream already was — so this only runs for direct
        objects."""

        def walk(v):
            if isinstance(v, bytes):
                return self._decrypt_data(v, num, gen)
            if isinstance(v, dict):
                return {k: walk(x) for k, x in v.items()}
            if isinstance(v, list):
                return [walk(x) for x in v]
            return v

        return walk(val)

    # -- xref ---------------------------------------------------------------
    def _read_xref_chain(self):
        data = self.data
        sx = data.rfind(b"startxref")
        if sx < 0:
            raise ValueError("no startxref — not a PDF or truncated")
        start = int(data[sx + len(b"startxref"):].split()[0])
        offsets: dict[int, object] = {}
        trailer: dict = {}
        seen = set()
        pos = start
        while pos is not None and pos not in seen:
            seen.add(pos)
            if re.compile(rb"xref\s").match(data, pos):
                section_offsets, section_trailer = self._read_xref_section(pos)
                xstm = section_trailer.get("XRefStm")
                if xstm is not None:
                    # hybrid-reference file (§7.5.8.4): the classic
                    # table hides ObjStm members from legacy readers;
                    # the /XRefStm cross-reference STREAM supplies
                    # their type-2 entries. Same-update classic
                    # entries win; the stream fills the gaps, and
                    # both beat /Prev sections.
                    so2, _st2 = self._read_xref_stream(int(xstm))
                    for num, off in so2.items():
                        section_offsets.setdefault(num, off)
            else:
                section_offsets, section_trailer = self._read_xref_stream(pos)
            for num, off in section_offsets.items():
                offsets.setdefault(num, off)  # newest (first-seen) wins
            for k, v in section_trailer.items():
                trailer.setdefault(k, v)
            prev = section_trailer.get("Prev")
            pos = int(prev) if prev is not None else None
        return offsets, trailer

    def _rebuild_xref_by_scan(self) -> None:
        """Last-resort xref reconstruction: find every `N G obj` header in
        the raw bytes (last occurrence of each object number wins — the
        newest incremental update appears latest in the file), map members
        of any surviving /ObjStm containers, then recover the trailer for
        /Root (+ /Encrypt /ID): a classic `trailer` dict, an /XRef stream
        dict, or the /Catalog itself — whichever survives."""
        data = self.data
        offsets: dict[int, object] = {}
        for m in re.finditer(rb"(?:^|[\r\n])\s*(\d+)\s+(\d+)\s+obj\b", data):
            offsets[int(m.group(1))] = m.start(1)
        if not offsets:
            raise ValueError("xref recovery found no object headers")
        self.offsets = offsets
        self.trailer = {}
        direct = list(offsets)

        # classic trailers first (newest wins)
        trailer: dict = {}
        for tm in reversed(list(re.finditer(rb"trailer\s*", data))):
            try:
                cand = _parse_value(_CLexer(data, tm.end()))
            except Exception:
                continue
            if isinstance(cand, dict) and "Root" in cand:
                trailer = cand
                break

        # walk the surviving direct objects: ObjStm containers supply their
        # members (type-2 entries the lost xref stream would have held);
        # an /XRef stream dict or a /Catalog supplies /Root if the classic
        # trailer didn't survive
        for num in direct:
            try:
                val = self.get(Ref(num))
            except Exception:
                continue
            if isinstance(val, _Stream):
                typ = val.attrs.get("Type")
                if typ == "ObjStm":
                    try:
                        payload = _decode_stream(val)
                        n = int(self.get(val.attrs["N"]))
                        first = int(self.get(val.attrs["First"]))
                        header = payload[:first].split()
                        for k in range(n):
                            member = int(header[2 * k])
                            offsets.setdefault(member, ("objstm", num, k))
                    except Exception:
                        continue
                elif typ == "XRef" and "Root" not in trailer:
                    if isinstance(val.attrs, dict) and "Root" in val.attrs:
                        trailer = val.attrs
            elif isinstance(val, dict) and val.get("Type") == "Catalog":
                if "Root" not in trailer:
                    trailer = {"Root": Ref(num)}
        if "Root" not in trailer:
            # last resort: a catalog packed inside a recovered ObjStm
            for num, off in offsets.items():
                if not isinstance(off, tuple):
                    continue
                try:
                    val = self.get(Ref(num))
                except Exception:
                    continue
                if isinstance(val, dict) and val.get("Type") == "Catalog":
                    trailer = {"Root": Ref(num)}
                    break
        if "Root" not in trailer:
            raise ValueError("xref recovery found no /Root or /Catalog")
        self.trailer = trailer

    def _read_xref_stream(self, pos: int):
        """PDF 1.5+ cross-reference STREAM (/Type /XRef): binary entries of
        /W-specified field widths over the /Index subsections. Type 1 =
        direct offset; type 2 = (object-stream number, index within it)."""
        data = self.data
        m = re.compile(rb"(\d+)\s+(\d+)\s+obj\s*").match(data, pos)
        if not m:
            raise ValueError(f"no xref table or xref stream at offset {pos}")
        lx = _CLexer(data, m.end())
        attrs = _parse_value(lx)
        if attrs.get("Type") != "XRef":
            raise ValueError("object at startxref is not an /XRef stream")
        lx._skip_ws()
        if data[lx.pos : lx.pos + 6] != b"stream":
            raise ValueError("XRef object has no stream payload")
        p = lx.pos + 6
        if data[p : p + 2] == b"\r\n":
            p += 2
        elif data[p : p + 1] in (b"\n", b"\r"):
            # lone \r: spec-invalid but emitted by broken writers
            p += 1
        if isinstance(attrs["Length"], Ref):
            # /Length as an indirect ref on the XRef stream itself is a
            # chicken-and-egg (the xref needed to resolve it is this very
            # stream) — recover by scanning for the closing `endstream`
            # keyword instead of silently parsing an empty payload.
            end = data.find(b"endstream", p)
            if end < 0:
                raise ValueError("XRef stream with indirect /Length and no endstream")
            raw = data[p:end].rstrip(b"\r\n")
            length = len(raw)
        else:
            length = int(attrs["Length"])
        payload = _decode_stream(_Stream(attrs, data[p : p + length]))
        w = [int(x) for x in attrs["W"]]
        index = attrs.get("Index") or [0, int(attrs["Size"])]
        row = sum(w)
        offsets: dict[int, object] = {}
        pos_in = 0

        def field(buf, start, width, default):
            if width == 0:
                return default
            return int.from_bytes(buf[start : start + width], "big")

        for s in range(0, len(index), 2):
            first, count = int(index[s]), int(index[s + 1])
            for k in range(count):
                buf = payload[pos_in : pos_in + row]
                pos_in += row
                typ = field(buf, 0, w[0], 1)
                f2 = field(buf, w[0], w[1], 0)
                f3 = field(buf, w[0] + w[1], w[2], 0)
                num = first + k
                if typ == 1:
                    offsets[num] = f2
                elif typ == 2:
                    offsets[num] = ("objstm", f2, f3)
                # typ 0: free — skip
        return offsets, attrs

    def _read_xref_section(self, pos: int):
        data = self.data
        m = re.compile(rb"xref\s+").match(data, pos)
        if not m:
            raise ValueError(f"expected classic xref table at {pos}")
        i = m.end()
        offsets: dict[int, int] = {}
        sub_re = re.compile(rb"(\d+)\s+(\d+)\s*")
        ent_re = re.compile(rb"(\d{10})\s(\d{5})\s([nf])\s*")
        while True:
            sm = sub_re.match(data, i)
            if not sm:
                break
            first, count = int(sm.group(1)), int(sm.group(2))
            i = sm.end()
            for k in range(count):
                em = ent_re.match(data, i)
                if not em:
                    raise ValueError("malformed xref entry")
                if em.group(3) == b"n":
                    offsets[first + k] = int(em.group(1))
                i = em.end()
        tm = re.compile(rb"trailer\s*").match(data, i)
        if not tm:
            raise ValueError("missing trailer after xref")
        trailer = _parse_value(_CLexer(data, tm.end()))
        return offsets, trailer

    # -- objects ------------------------------------------------------------
    def get(self, obj):
        """Resolve an indirect reference (pass-through for direct values)."""
        if not isinstance(obj, Ref):
            return obj
        if obj.num in self._cache:
            return self._cache[obj.num]
        off = self.offsets[obj.num]
        if isinstance(off, tuple):  # ("objstm", container_num, index)
            val = self._get_from_objstm(off[1], off[2])
            self._cache[obj.num] = val
            return val
        m = re.compile(rb"(\d+)\s+(\d+)\s+obj\s*").match(self.data, off)
        if not m:
            raise ValueError(f"no object header at offset {off}")
        # the header's generation participates in per-object decryption keys
        gen = int(m.group(2))
        lx = _CLexer(self.data, m.end())
        val = _parse_value(lx)
        # stream payload?
        lx._skip_ws()
        if self.data[lx.pos : lx.pos + 6] == b"stream":
            p = lx.pos + 6
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] in (b"\n", b"\r"):
                p += 1
            length = int(self.get(val["Length"]))
            raw = self.data[p : p + length]
            if self._enc_key is not None and val.get("Type") != "XRef":
                # decrypt BEFORE filter decode (spec order); cross-reference
                # streams are never encrypted. Strings in the stream's own
                # dict decrypt with the same object key (they are strings
                # outside /Encrypt like any other).
                raw = self._decrypt_data(raw, obj.num, gen)
                val = self._decrypt_strings(val, obj.num, gen)
            val = _Stream(val, raw)
        elif self._enc_key is not None:
            val = self._decrypt_strings(val, obj.num, gen)
        self._cache[obj.num] = val
        return val

    def _get_from_objstm(self, container_num: int, idx: int):
        """Fetch object ``idx`` from an object stream (/Type /ObjStm): the
        decompressed payload starts with N (objnum, offset) pairs; objects
        begin at /First + offset."""
        cached = self._objstm_cache.get(container_num)
        if cached is None:
            stm = self.get(Ref(container_num))
            if not isinstance(stm, _Stream) or stm.attrs.get("Type") != "ObjStm":
                raise ValueError(f"object {container_num} is not an /ObjStm")
            # decode ONCE per container — real PDFs pack hundreds of objects
            # per stream, and per-member re-decompression is quadratic
            payload = _decode_stream(stm)
            n = int(self.get(stm.attrs["N"]))
            first = int(self.get(stm.attrs["First"]))
            header = payload[:first].split()
            pairs = [
                (int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)
            ]
            cached = (payload, first, pairs)
            self._objstm_cache[container_num] = cached
        payload, first, pairs = cached
        _, rel = pairs[idx]
        return _parse_value(_CLexer(payload, first + rel))

    # -- pages --------------------------------------------------------------
    # inheritable page attributes, PDF 1.7 §7.7.3.4 Table 30
    _INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")

    def pages(self) -> list[dict]:
        root = self.get(self.trailer["Root"])
        out: list[dict] = []
        self._walk_pages(self.get(root["Pages"]), out, {})
        return out

    def _walk_pages(self, node: dict, out: list[dict],
                    inherited: dict) -> None:
        if node.get("Type") == "Page":
            missing = {k: v for k, v in inherited.items()
                       if k not in node}
            # inheritance (r6): /Resources &c may live on any ancestor
            # /Pages node (the LibreOffice/TeX layout) — materialize the
            # nearest ancestor's value onto a COPY so callers see one
            # flat dict
            out.append({**node, **missing} if missing else node)
            return
        inherited = {
            **inherited,
            **{k: node[k] for k in self._INHERITABLE if k in node},
        }
        for kid in self.get(node.get("Kids", [])):
            self._walk_pages(self.get(kid), out, inherited)

    def page_content(self, page: dict) -> bytes:
        contents = self.get(page.get("Contents"))
        if contents is None:
            return b""
        streams = contents if isinstance(contents, list) else [contents]
        return b"\n".join(_decode_stream(self.get(s)) for s in streams)

    def page_image_xobjects(self, page: dict) -> dict[str, dict]:
        """name → image-XObject dict for this page's resources."""
        res = self.get(page.get("Resources", {})) or {}
        xo = self.get(res.get("XObject", {})) or {}
        out = {}
        for name, ref in xo.items():
            obj = self.get(ref)
            d = obj.attrs if isinstance(obj, _Stream) else obj
            if d.get("Subtype") == "Image":
                out[name] = d
        return out

    def page_fonts(self, page: dict) -> dict:
        """name → text-decoder callable (bytes → str) for this page's
        /Resources /Font entries. Decoder priority per PDF 1.7 §9.10.2:
        /ToUnicode CMap when present (the subset-font form every modern
        writer emits), else Identity CID best-effort for /Type0, else the
        simple-font /Encoding (WinAnsi/MacRoman names or a /Differences
        dict over a base table), else latin-1 — the pre-r6 behavior."""
        res = self.get(page.get("Resources", {})) or {}
        return self._fonts_from_res(res)

    def _fonts_from_res(self, res: dict) -> dict:
        fonts = self.get(res.get("Font", {})) or {}
        out = {}
        for name, ref in fonts.items():
            d = self.get(ref)
            if isinstance(d, _Stream):
                d = d.attrs
            if isinstance(d, dict):
                out[str(name)] = self._font_decoder(d)
        return out

    def page_paint_events(self, page: dict) -> list[tuple]:
        """All paint events for a page in paint order, with form
        XObjects (/Subtype /Form — the letterhead/stamp containers
        LibreOffice-class writers emit) expanded inline (r6). Image
        events carry the RESOLVED image stream (or None for inline
        BI..EI images) so nested images decode against the form's own
        /Resources, not the page's."""
        res = self.get(page.get("Resources", {})) or {}
        return self._paint_events(self.page_content(page), res, ())

    def _paint_events(self, content: bytes, res: dict,
                      stack: tuple) -> list[tuple]:
        xo = self.get(res.get("XObject", {})) or {}
        images: dict[str, object] = {}
        forms: dict[str, tuple] = {}
        for name, ref in xo.items():
            key = ref.num if isinstance(ref, Ref) else None
            obj = self.get(ref)
            if not isinstance(obj, _Stream):
                continue
            sub = obj.attrs.get("Subtype")
            if sub == "Image":
                images[str(name)] = obj
            elif sub == "Form":
                forms[str(name)] = (key if key is not None else id(obj),
                                    obj)
        out: list[tuple] = []
        evs = content_events(content, set(images),
                             fonts=self._fonts_from_res(res),
                             form_names=set(forms))
        for ev in evs:
            if ev[0] == "image":
                out.append(("image",
                            images[ev[1]] if ev[1] is not None else None))
            elif ev[0] == "form":
                key, obj = forms[ev[1]]
                if key in stack or len(stack) >= 8:
                    # self-referential or absurdly deep form nesting:
                    # drop the placement instead of looping — corrupt-
                    # input guard, same policy as the codec bombs
                    continue
                sub_res = self.get(obj.attrs.get("Resources")) or res
                out.extend(self._paint_events(
                    _decode_stream(obj), sub_res, stack + (key,)
                ))
            else:
                out.append(ev)
        return out

    def _font_decoder(self, font: dict):
        tu = self.get(font.get("ToUnicode"))
        if isinstance(tu, _Stream):
            cmap, lengths = _parse_tounicode(_decode_stream(tu))
            if cmap:
                return _cmap_text_decoder(cmap, lengths)
        if str(font.get("Subtype")) == "Type0":
            # Identity-H/V without a usable ToUnicode: two-byte CIDs,
            # best-effort code-point identity (matches what pdfminer-
            # class extractors yield on Identity CID fonts)
            def dec(bs: bytes) -> str:
                return "".join(
                    chr(int.from_bytes(bs[i : i + 2], "big"))
                    for i in range(0, len(bs) - 1, 2)
                )

            return dec
        enc = self.get(font.get("Encoding"))
        if isinstance(enc, dict):
            table = _base_encoding_table(
                str(enc.get("BaseEncoding", ""))
            )
            code = 0
            for item in self.get(enc.get("Differences", [])) or []:
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    if 0 <= code <= 255:
                        table[code] = _glyph_to_unicode(str(item))
                    code += 1
            return lambda bs, t=table: "".join(t[b] for b in bs)
        ename = str(enc) if enc is not None else ""
        if ename in ("WinAnsiEncoding", "MacRomanEncoding"):
            table = _base_encoding_table(ename)
            return lambda bs, t=table: "".join(t[b] for b in bs)
        return _latin1_text


class _Stream:
    __slots__ = ("attrs", "raw")

    def __init__(self, attrs: dict, raw: bytes):
        self.attrs = attrs
        self.raw = raw


# Terminal image codecs: the decoded result is PIXELS, not bytes we can
# tokenize — the compressed payload passes through as the media payload
# (DCTDecode = baseline JPEG, the filter on virtually every scanned-invoice
# page image; reference gets these via pdfplumber/pdf2image,
# image_pdf_processor.py:132-149).
_IMAGE_CODECS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode",
                 "CCF", "JBIG2Decode"}


def _unpredict(data: bytes, parms: dict) -> bytes:
    """Undo the /DecodeParms Predictor over a decompressed payload.

    Predictor >= 10 → PNG row filters (each row prefixed by a filter-type
    byte: 0 none, 1 sub, 2 up, 3 average, 4 paeth) — the layout every real
    xref stream uses (/Predictor 12 /Columns W). Predictor 2 → TIFF
    horizontal differencing (8-bit components only). Ref-valued or absent
    parms → identity."""
    pred = parms.get("Predictor", 1)
    if not isinstance(pred, int) or pred <= 1:
        return data
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    columns = parms.get("Columns", 1)
    if not all(isinstance(v, int) for v in (colors, bpc, columns)):
        return data
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if pred == 2:
        if bpc != 8:
            raise ValueError("TIFF predictor with sub-byte components")
        out = bytearray(data)
        for r in range(0, len(out), rowlen):
            for i in range(r + bpp, min(r + rowlen, len(out))):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    # PNG predictors: rows of (1 + rowlen) bytes
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i + 1 <= len(data):
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + rowlen
        if ft == 1:  # sub
            for j in range(bpp, len(row)):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # up
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # average
            for j in range(len(row)):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + (left + prev[j]) // 2) & 0xFF
        elif ft == 4:  # paeth
            for j in range(len(row)):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG row filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1, max_out: int | None = None) -> bytes:
    """PDF LZWDecode: MSB-first variable-width codes 9→12 bits, clear code
    256, EOD 257, /EarlyChange (default 1) widens one code early.

    ``max_out`` caps the decoded size (r7, ADVICE: LZW expands up to ~2700x,
    so a small crafted strip can otherwise balloon past executor memory);
    callers that know the geometry pass the expected byte count."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code = 258
    width = 9
    prev: bytes | None = None
    buf = 0
    nbits = 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (buf >> nbits) & ((1 << width) - 1)
            if code == 256:  # clear table
                table = {i: bytes([i]) for i in range(256)}
                next_code = 258
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            else:  # KwKwK case
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            out += entry
            prev = entry
            if max_out is not None and len(out) >= max_out:
                return bytes(out[:max_out])
            if next_code >= (1 << width) - early and width < 12:
                width += 1
    return bytes(out)


def _asciihex_decode(data: bytes) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    hx = re.sub(rb"\s", b"", data)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for c in data:
        if c in b"\x00\t\n\x0c\r ":
            continue
        if c == 0x7A:  # 'z' — four zero bytes (only valid between groups)
            if group:
                raise ValueError("'z' inside an ascii85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 33 <= c <= 117:
            raise ValueError(f"invalid ascii85 byte {c}")
        group.append(c - 33)
        if len(group) == 5:
            n = 0
            for g in group:
                n = n * 85 + g
            out += n.to_bytes(4, "big")
            group = []
    if group:
        k = len(group)
        group += [84] * (5 - k)  # pad with 'u'
        n = 0
        for g in group:
            n = n * 85 + g
        out += n.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        l = data[i]
        i += 1
        if l == 128:  # EOD
            break
        if l < 128:
            out += data[i : i + l + 1]
            i += l + 1
        else:
            out += data[i : i + 1] * (257 - l)
            i += 1
    return bytes(out)


def _decode_stream(s) -> bytes:
    if not isinstance(s, _Stream):
        raise ValueError("Contents entry is not a stream object")
    filt = s.attrs.get("Filter")
    filters = [filt] if isinstance(filt, (str, Name)) else (filt or [])
    parms = s.attrs.get("DecodeParms", s.attrs.get("DP"))
    parms_list = [parms] if isinstance(parms, dict) else (parms or [])
    data = s.raw
    for i, f in enumerate(filters):
        p = parms_list[i] if i < len(parms_list) and isinstance(parms_list[i], dict) else {}
        if f in ("FlateDecode", "Fl"):
            try:
                data = _unpredict(zlib.decompress(data), p)
            except zlib.error:
                # truncated/corrupt tail: salvage the valid prefix — a
                # partially-readable page beats an empty-doc fallback.
                # Chunked feeding keeps the output decoded BEFORE the
                # corrupt region (one whole-buffer call would discard it).
                out = bytearray()
                for chunk in (4096, 1):  # byte-wise only if coarse got nothing
                    d = zlib.decompressobj()
                    out = bytearray()
                    try:
                        for k in range(0, len(data), chunk):
                            out += d.decompress(data[k : k + chunk])
                        out += d.flush()
                    except zlib.error:
                        pass
                    if out:
                        break
                if not out:
                    raise ValueError("undecodable Flate stream")
                data = _unpredict(bytes(out), p)
        elif f in ("LZWDecode", "LZW"):
            ec = p.get("EarlyChange", 1)
            data = _unpredict(_lzw_decode(data, ec if isinstance(ec, int) else 1), p)
        elif f in ("ASCIIHexDecode", "AHx"):
            data = _asciihex_decode(data)
        elif f in ("ASCII85Decode", "A85"):
            data = _ascii85_decode(data)
        elif f in ("RunLengthDecode", "RL"):
            data = _runlength_decode(data)
        elif f in _IMAGE_CODECS:
            return data  # terminal: compressed image bytes ARE the payload
        elif f == "Crypt":
            raise PdfEncryptedError("stream carries a /Crypt filter")
        else:
            raise ValueError(f"unsupported stream filter {f!r}")
    return data


# ---------------------------------------------------------------------------
# Font text decoding: ToUnicode CMaps, CID fonts, simple-font encodings
# ---------------------------------------------------------------------------
# Adobe Glyph List subset: the names real /Differences arrays use for the
# invoice-class character repertoire (full ASCII + common Latin-1/
# typographic glyphs). Single-letter names (A-Z, a-z) map to themselves
# per the AGL; anything else unknown resolves via the uniXXXX/uXXXXXX
# conventions or U+FFFD. The table is public Adobe AGL data.
_AGL = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26,
    "quotesingle": 0x27, "parenleft": 0x28, "parenright": 0x29,
    "asterisk": 0x2A, "plus": 0x2B, "comma": 0x2C, "hyphen": 0x2D,
    "period": 0x2E, "slash": 0x2F, "zero": 0x30, "one": 0x31,
    "two": 0x32, "three": 0x33, "four": 0x34, "five": 0x35, "six": 0x36,
    "seven": 0x37, "eight": 0x38, "nine": 0x39, "colon": 0x3A,
    "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D, "greater": 0x3E,
    "question": 0x3F, "at": 0x40, "bracketleft": 0x5B,
    "backslash": 0x5C, "bracketright": 0x5D, "asciicircum": 0x5E,
    "underscore": 0x5F, "grave": 0x60, "braceleft": 0x7B, "bar": 0x7C,
    "braceright": 0x7D, "asciitilde": 0x7E,
    "bullet": 0x2022, "emdash": 0x2014, "endash": 0x2013,
    "quotedblleft": 0x201C, "quotedblright": 0x201D,
    "quoteleft": 0x2018, "quoteright": 0x2019, "ellipsis": 0x2026,
    "Euro": 0x20AC, "degree": 0xB0, "cent": 0xA2, "sterling": 0xA3,
    "yen": 0xA5, "section": 0xA7, "copyright": 0xA9, "registered": 0xAE,
    "trademark": 0x2122, "plusminus": 0xB1, "multiply": 0xD7,
    "divide": 0xF7, "exclamdown": 0xA1, "questiondown": 0xBF,
    "fi": 0xFB01, "fl": 0xFB02, "germandbls": 0xDF,
    "agrave": 0xE0, "aacute": 0xE1, "acircumflex": 0xE2, "atilde": 0xE3,
    "adieresis": 0xE4, "aring": 0xE5, "ae": 0xE6, "ccedilla": 0xE7,
    "egrave": 0xE8, "eacute": 0xE9, "ecircumflex": 0xEA,
    "edieresis": 0xEB, "igrave": 0xEC, "iacute": 0xED,
    "icircumflex": 0xEE, "idieresis": 0xEF, "ntilde": 0xF1,
    "ograve": 0xF2, "oacute": 0xF3, "ocircumflex": 0xF4, "otilde": 0xF5,
    "odieresis": 0xF6, "oslash": 0xF8, "ugrave": 0xF9, "uacute": 0xFA,
    "ucircumflex": 0xFB, "udieresis": 0xFC, "yacute": 0xFD,
    "ydieresis": 0xFF,
    "Agrave": 0xC0, "Aacute": 0xC1, "Adieresis": 0xC4, "Aring": 0xC5,
    "AE": 0xC6, "Ccedilla": 0xC7, "Egrave": 0xC8, "Eacute": 0xC9,
    "Ntilde": 0xD1, "Odieresis": 0xD6, "Oslash": 0xD8,
    "Udieresis": 0xDC,
}
_UNI_TO_GLYPH = {chr(cp): nm for nm, cp in _AGL.items()}


def _glyph_to_unicode(name: str) -> str:
    """Glyph name → text, per the Adobe Glyph List conventions: known AGL
    names, single-letter self-names, uniXXXX / uXXXX[XX] hex forms;
    unknown glyphs are U+FFFD (honest loss marker, not silence)."""
    if name in _AGL:
        return chr(_AGL[name])
    if len(name) == 1 and name.isalpha() and ord(name) < 128:
        return name
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp <= 0x10FFFF else "�"
    return "�"


def _base_encoding_table(name: str) -> list[str]:
    """256-entry byte→char table for a named simple-font base encoding.
    WinAnsiEncoding is cp1252 (undefined cp1252 bytes keep their latin-1
    identity, matching viewer behavior); MacRomanEncoding is mac_roman;
    anything else (StandardEncoding / absent) stays latin-1 — the
    pre-r6 behavior, correct for the fixtures and ASCII-range text."""
    codec = {"WinAnsiEncoding": "cp1252",
             "MacRomanEncoding": "mac_roman"}.get(name)
    if codec is None:
        return [chr(b) for b in range(256)]
    table = []
    for b in range(256):
        try:
            table.append(bytes([b]).decode(codec))
        except UnicodeDecodeError:
            table.append(chr(b))
    return table


def _utf16be_hex(h: str) -> str:
    if len(h) % 2:
        h += "0"
    return bytes.fromhex(h).decode("utf-16-be", errors="replace")


_CMAP_PAIR = re.compile(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_CMAP_TRIPLE = re.compile(
    r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>"
)
_CMAP_ARRRANGE = re.compile(
    r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]", re.S
)


def _parse_tounicode(data: bytes):
    """/ToUnicode CMap stream → ((byte_length, code) → text map, sorted
    code byte-lengths). Covers the forms real subset-font writers emit:
    begincodespacerange (code token widths), beginbfchar pairs,
    beginbfrange with an incrementing <dst> or an explicit [..] array
    (PDF 1.7 §9.10.3). Corrupt range spans reject before allocating."""
    text = data.decode("latin-1", errors="replace")
    lengths: set[int] = set()
    cmap: dict[tuple[int, int], str] = {}
    for m in re.finditer(r"begincodespacerange(.*?)endcodespacerange",
                         text, re.S):
        for h1, _h2 in _CMAP_PAIR.findall(m.group(1)):
            lengths.add(max(1, len(h1) // 2))
    for m in re.finditer(r"beginbfchar(.*?)endbfchar", text, re.S):
        for src, dst in _CMAP_PAIR.findall(m.group(1)):
            lengths.add(max(1, len(src) // 2))
            cmap[(max(1, len(src) // 2), int(src, 16))] = \
                _utf16be_hex(dst)
    for m in re.finditer(r"beginbfrange(.*?)endbfrange", text, re.S):
        body = m.group(1)
        for lo, hi, arr in _CMAP_ARRRANGE.findall(body):
            blen = max(1, len(lo) // 2)
            lengths.add(blen)
            lo_i = int(lo, 16)
            for i, d in enumerate(re.findall(r"<([0-9A-Fa-f]+)>", arr)):
                if lo_i + i > int(hi, 16):
                    break
                cmap[(blen, lo_i + i)] = _utf16be_hex(d)
        # strip array ranges so the triple scan can't misread their tails
        body = _CMAP_ARRRANGE.sub(" ", body)
        for lo, hi, dst in _CMAP_TRIPLE.findall(body):
            blen = max(1, len(lo) // 2)
            lengths.add(blen)
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if hi_i - lo_i > 65535:
                raise ValueError("implausible ToUnicode bfrange span")
            base = _utf16be_hex(dst)
            for i in range(hi_i - lo_i + 1):
                if base:
                    cmap[(blen, lo_i + i)] = (
                        base[:-1] + chr(ord(base[-1]) + i)
                    )
    if len(cmap) > 1 << 20:
        raise ValueError("implausible ToUnicode CMap size")
    return cmap, (sorted(lengths) or [1])


def _cmap_text_decoder(cmap, lengths):
    def dec(bs: bytes) -> str:
        out = []
        i, n = 0, len(bs)
        while i < n:
            for length in lengths:
                if i + length <= n:
                    code = int.from_bytes(bs[i : i + length], "big")
                    mapped = cmap.get((length, code))
                    if mapped is not None:
                        out.append(mapped)
                        i += length
                        break
            else:
                # unmapped code: widest token that fits, best-effort
                # code-point identity (what viewers show as notdef)
                length = min(lengths[-1], n - i)
                code = int.from_bytes(bs[i : i + length], "big")
                out.append(chr(code) if code <= 0x10FFFF else "�")
                i += length
        return "".join(out)

    return dec


def _latin1_text(bs: bytes) -> str:
    return bs.decode("latin-1")


# ---------------------------------------------------------------------------
# Content-stream tokenization → ordered paint events
# ---------------------------------------------------------------------------
def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) else str(v)


# TJ kern threshold (thousandths of an em): adjustments at or beyond a
# typical word-space width read as spaces; small kerning tweaks (the
# writer's own CID split uses -120) stay glued
_TJ_SPACE_KERN = -180


def content_events(content: bytes, image_names: set[str],
                   fonts: dict | None = None,
                   form_names: set[str] | None = None) -> list[tuple]:
    """Tokenize one page's content stream into ordered paint events:
    ("line", str) — one per Td/TD/T*/Tm text-line move, show-op strings on
    the same line concatenated; ("image", name) — per Do of an image
    XObject; ("rule", "x,y,w,h") — per `re` rectangle (layout hints, L7).
    Event order is the content-stream paint order.

    ``fonts`` (r6) maps /Resources /Font names to text decoders
    (PdfDocument.page_fonts); the Tf operator switches the active
    decoder, so CID hex strings and re-encoded simple-font bytes yield
    real text. Absent fonts (or an unknown Tf name) keep the latin-1
    decode — the behavior every earlier round pinned.

    Error policy (ADVICE r5): TRUNCATION-class lexer errors (unterminated
    string/hex — the shape of a Flate-salvage cut mid-token) end event
    extraction with the prefix kept; every OTHER lexer error (e.g. a
    malformed number) propagates so the ingest layer counts an observable
    fallback instead of silently dropping the tail. The try wraps the
    WHOLE loop (zero cost until raised) rather than each next_token call —
    the tokenizer is the parse hot path (~35% of wall, cProfile r5).
    """
    lx = _CLexer(content)
    operands: list = []
    cur: list[str] = []
    events: list[tuple] = []
    cur_dec = _latin1_text

    def flush():
        if cur:
            events.append(("line", "".join(cur)))
            cur.clear()

    try:
        while True:
            tok = lx.next_token()
            if tok is None:
                break
            kind, val = tok
            if kind in ("num", "str", "name"):
                operands.append((kind, val))
                continue
            if kind == "arr_open":
                # TJ operand: collect strings AND the kern adjustments
                # between them (word gaps ride the numbers, r6)
                parts = []
                while True:
                    t = lx.next_token()
                    if t is None or t[0] == "arr_close":
                        break
                    if t[0] in ("str", "num"):
                        parts.append(t[1])
                operands.append(("tjarr", parts))
                continue
            if kind in ("dict_open",):  # inline dicts (e.g. BDC) — skip
                _parse_value(lx, tok)
                operands.clear()
                continue
            # operator
            op = val
            if op in (b"Td", b"TD", b"T*", b"Tm"):
                flush()
            elif op == b"Tf":
                if fonts is not None:
                    for k, v in reversed(operands):
                        if k == "name":
                            cur_dec = fonts.get(v, _latin1_text)
                            break
            elif op == b"Tj":
                if operands and operands[-1][0] == "str":
                    cur.append(cur_dec(operands[-1][1]))
            elif op in (b"'", b'"'):
                flush()
                if operands and operands[-1][0] == "str":
                    cur.append(cur_dec(operands[-1][1]))
            elif op == b"TJ":
                if operands and operands[-1][0] == "tjarr":
                    # decode each shown chunk separately (multi-byte
                    # CID tokens never span TJ elements); a kern
                    # adjustment at or beyond a word-space width
                    # (thousandths of an em) reads as a space — how
                    # most typesetting writers encode word gaps (r6)
                    buf = []
                    for el in operands[-1][1]:
                        if isinstance(el, bytes):
                            buf.append(cur_dec(el))
                        elif el <= _TJ_SPACE_KERN:
                            buf.append(" ")
                    cur.append("".join(buf))
            elif op == b"ET":
                flush()
            elif op == b"BI":
                # inline image: BI <dict entries> ID <raw binary> EI — the
                # binary payload is NOT tokenizable (it would garbage the
                # lexer or raise on an unbalanced paren). Consume dict
                # tokens up to ID, then scan for the whitespace-delimited
                # EI terminator and resume after it. (Real parsers use the
                # decoded length; the delimiter scan is the standard
                # fallback heuristic and can only false-positive if the
                # raw bytes contain ' EI ' — the same ambiguity every PDF
                # tokenizer accepts.) The image itself is a paint event,
                # same as a Do placement.
                while True:
                    t = lx.next_token()
                    if t is None or (t[0] == "op" and t[1] == b"ID"):
                        break
                m = re.compile(
                    rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r /\[\]<>(]|$)"
                ).search(lx.data, lx.pos)
                lx.pos = m.end() if m else len(lx.data)
                flush()
                events.append(("image", None))
            elif op == b"Do":
                if operands and operands[-1][0] == "name":
                    nm = operands[-1][1]
                    if nm in image_names:
                        flush()
                        events.append(("image", nm))
                    elif form_names and nm in form_names:
                        # form XObject placement: the caller expands the
                        # form's own content stream inline (r6)
                        flush()
                        events.append(("form", nm))
            elif op == b"re":
                nums = [v for k, v in operands if k == "num"]
                if len(nums) >= 4:
                    flush()
                    events.append(
                        ("rule", ",".join(_fmt_num(v) for v in nums[-4:]))
                    )
            operands.clear()
    except ValueError as e:
        if not str(e).startswith("unterminated"):
            raise
    flush()
    return events


# ---------------------------------------------------------------------------
# Top-level: PDF bytes → interleaved spans
# ---------------------------------------------------------------------------
def parse_pdf_spans(data: bytes, doc_id: str) -> list[dict]:
    """PDF bytes → ordered (kind, text, media_ref, offset) spans.

    Span grammar matches fixtures.make_document: a page_break per page, then
    text / media / rule spans in content-stream paint order. Text burned
    into images is NOT recovered here (that is the OCR stage's job), so
    media pages yield media spans only.
    """
    doc = PdfDocument(data)
    spans: list[dict] = []
    off = 0
    for p, page in enumerate(doc.pages()):
        spans.append({"kind": "page_break", "text": f"=== PAGE {p + 1} ===",
                      "media_ref": "", "offset": off})
        off += 1
        img_i = 0
        for ev in doc.page_paint_events(page):
            if ev[0] == "line":
                spans.append({"kind": "text", "text": ev[1], "media_ref": "",
                              "offset": off})
            elif ev[0] == "image":
                spans.append({"kind": "media", "text": "",
                              "media_ref": f"img://{doc_id}/{p + 1}/{img_i}",
                              "offset": off})
                img_i += 1
            else:  # rule
                spans.append({"kind": "rule", "text": ev[1], "media_ref": "",
                              "offset": off})
            off += 1
    return spans


def pdf_media_payloads(data: bytes, doc_id: str) -> list[dict]:
    """(media_ref, payload, filter) per image placement, media_refs aligned
    with parse_pdf_spans' media spans. Terminal image codecs (DCTDecode &c)
    pass their COMPRESSED bytes through — for a scanned page the JPEG bytes
    are the payload the multimodal stage wants (operators/multimodal.py
    decodes pixels behind the env-blocked seam); byte filters (Flate/LZW/…)
    are decoded."""
    doc = PdfDocument(data)
    out: list[dict] = []
    for p, page in enumerate(doc.pages()):
        img_i = 0
        for ev in doc.page_paint_events(page):
            if ev[0] != "image":
                continue
            if ev[1] is None:
                # inline (BI..EI) image: counted so media_refs stay aligned
                # with parse_pdf_spans; raw payload not re-extracted here
                out.append({
                    "media_ref": f"img://{doc_id}/{p + 1}/{img_i}",
                    "payload": b"",
                    "filter": "Inline",
                    "params": {},
                })
                img_i += 1
                continue
            # paint events carry the RESOLVED image stream — correct even
            # when the placement came from inside a form XObject whose
            # /Resources differ from the page's
            obj = ev[1]
            filt = obj.attrs.get("Filter")
            filters = [filt] if isinstance(filt, (str, Name)) else (filt or [])
            # terminal codecs that are NOT self-describing (CCITT G4 has no
            # header) need their /DecodeParms to decode — surface them so a
            # downstream decode_media decoder can be parameterized
            # (operators.ccittcodec.ccitt_decoder)
            parms = doc.get(
                obj.attrs.get("DecodeParms", obj.attrs.get("DP"))
            )
            if isinstance(parms, list):
                parms = next(
                    (doc.get(x) for x in parms if isinstance(doc.get(x), dict)),
                    {},
                )
            params = {}
            if isinstance(parms, dict):
                for k in ("K", "Columns", "Rows", "BlackIs1",
                          "EncodedByteAlign"):
                    if k in parms:
                        params[k] = doc.get(parms[k])
            for k, default in (("Width", None), ("Height", None)):
                v = doc.get(obj.attrs.get(k, default))
                if v is not None:
                    params[k.lower()] = int(v)
            # raw (byte-filter-only) images need sample geometry to decode
            bpc = doc.get(obj.attrs.get("BitsPerComponent"))
            if bpc is not None:
                params["bpc"] = int(bpc)
            dec_arr = doc.get(obj.attrs.get("Decode"))
            if isinstance(dec_arr, list) and dec_arr and \
                    all(isinstance(doc.get(v), (int, float))
                        for v in dec_arr):
                # sample-mapping array (/Decode [1 0] = MinIsWhite
                # inversion) — surfaced so the raw decoder can honor it
                params["decode"] = ",".join(
                    _fmt_num(float(doc.get(v))) for v in dec_arr
                )
            cs = doc.get(obj.attrs.get("ColorSpace"))
            if isinstance(cs, (str, Name)):
                params["colorspace"] = str(cs)
            elif (isinstance(cs, list) and len(cs) == 4
                  and str(doc.get(cs[0])) == "Indexed"):
                # [/Indexed base hival lookup] — surface the palette so
                # the raw-image decoder can expand indices (the PNG-
                # derived logo/diagram form); lookup is a string or a
                # stream
                base = doc.get(cs[1])
                lookup = doc.get(cs[3])
                if isinstance(lookup, _Stream):
                    lookup = _decode_stream(lookup)
                if isinstance(base, (str, Name)) \
                        and isinstance(lookup, bytes):
                    params["colorspace"] = "Indexed"
                    params["base"] = str(base)
                    params["hival"] = int(doc.get(cs[2]))
                    params["palette"] = hexlify(lookup).decode("ascii")
            out.append({
                "media_ref": f"img://{doc_id}/{p + 1}/{img_i}",
                "payload": _decode_stream(obj),
                "filter": "/".join(str(f) for f in filters),
                "params": params,
            })
            img_i += 1
    return out


# ---------------------------------------------------------------------------
# Deterministic PDF writer (test fixture): lines/images → real PDF bytes
# ---------------------------------------------------------------------------
def _lzw_encode(data: bytes) -> bytes:
    """PDF LZW encoder (EarlyChange=1) — fixture-side twin of _lzw_decode."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    buf = 0
    nbits = 0
    result = bytearray()

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            result.append((buf >> nbits) & 0xFF)

    emit(256)  # clear table
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        # the decoder's table trails the encoder's by one entry, so the
        # width flips one code later than the naive encoder condition
        if next_code >= (1 << width) and width < 12:
            width += 1
        elif next_code >= 4095:
            # table full at 12 bits — the spec requires a CLEAR here
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w])
    emit(257)  # EOD
    if nbits:
        result.append((buf << (8 - nbits)) & 0xFF)
    return bytes(result)


def _rl_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 126:
            j += 1
        if j > i:  # repeat run (length 2..128)
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
        else:  # literal run until the next repeat or 128 bytes
            j = i
            while (
                j < n and j - i < 128
                and not (j < n - 1 and data[j] == data[j + 1])
            ):
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    out.append(128)  # EOD
    return bytes(out)


_CONTENT_ENCODERS = {
    "Flate": ("FlateDecode", zlib.compress),
    "LZW": ("LZWDecode", _lzw_encode),
    "AHx": ("ASCIIHexDecode",
            lambda d: __import__("binascii").hexlify(d) + b">"),
    "A85": ("ASCII85Decode",
            lambda d: __import__("base64").a85encode(d) + b"~>"),
    "RL": ("RunLengthDecode", _rl_encode),
}


def _esc_bytes(b: bytes) -> bytes:
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _esc(s: str) -> bytes:
    return _esc_bytes(s.encode("latin-1", errors="replace"))


def _writer_glyph_name(ch: str) -> str:
    """char → glyph name for /Differences emission (AGL name, letter
    self-name, else uniXXXX) — the exact inverse of _glyph_to_unicode."""
    if ch in _UNI_TO_GLYPH:
        return _UNI_TO_GLYPH[ch]
    if ch.isalpha() and ord(ch) < 128:
        return ch
    return "uni%04X" % ord(ch)


def _tounicode_cmap(code_of: dict[str, int]) -> bytes:
    """Deterministic /ToUnicode CMap for the writer's CID font: Adobe-
    Identity-UCS wrapper, 2-byte codespace, entries split between
    bfchar and single-code bfrange blocks so a round-trip exercises both
    parse paths, chunked at the spec's 100-entries-per-block limit."""
    bfchar = []
    bfrange = []
    for ch, code in sorted(code_of.items(), key=lambda kv: kv[1]):
        dst = hexlify(ch.encode("utf-16-be")).decode("ascii").upper()
        if code % 2:
            bfchar.append("<%04X> <%s>" % (code, dst))
        else:
            bfrange.append("<%04X> <%04X> <%s>" % (code, code, dst))
    parts = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        "/Supplement 0 >> def",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<0000> <FFFF>",
        "endcodespacerange",
    ]
    for kind, entries in (("bfchar", bfchar), ("bfrange", bfrange)):
        for i in range(0, len(entries), 100):
            chunk = entries[i : i + 100]
            parts.append("%d begin%s" % (len(chunk), kind))
            parts.extend(chunk)
            parts.append("end%s" % kind)
    parts += ["endcmap",
              "CMapName currentdict /CMap defineresource pop",
              "end", "end"]
    return "\n".join(parts).encode("ascii")


def build_pdf(
    pages: list[list[tuple]], compress: bool = True, xref_stream: bool = False,
    content_filter: str | None = None, image_filter: str = "Flate",
    encrypted: bool | str = False, user_password: bytes = b"",
    owner_password: bytes | None = None, font_mode: str = "simple",
    wrap_in_form: bool = False, resources_on_pages_tree: bool = False,
    kerned_spaces: bool = False,
) -> bytes:
    """Build a PDF file from ordered paint events.

    pages: one list of events per page — ("text", line) | ("image",) |
    ("rule", "x,y,w,h") — painted in order (text as Tj lines, images as 1×1
    gray XObjects via Do, rules as filled `re` rectangles).

    ``xref_stream=False`` emits a classic-xref PDF 1.4; ``True`` emits a
    PDF 1.5 file whose cross-reference is a binary /XRef STREAM and whose
    catalog/pages/font dictionaries live inside an /ObjStm object stream —
    the layout virtually every modern PDF writer produces; ``"hybrid"``
    (r6) emits the §7.5.8.4 hybrid-reference layout — a classic table
    over the direct objects plus a trailer /XRefStm pointing at the
    stream that reveals the hidden ObjStm members.

    ``content_filter`` picks the content-stream codec ("Flate" | "LZW" |
    "AHx" | "A85" | "RL"; None → the legacy ``compress`` flag). ``image_
    filter`` is "Flate" or "DCT" (fake-JPEG bytes under /DCTDecode — the
    scanned-page layout). ``encrypted=True`` REALLY encrypts every stream
    with the standard security handler (RC4 V1 R2, empty user+owner
    password — the common "secured" invoice, readable without a prompt);
    "rc4-128" / "v4-rc4" / "v4-rc4-nometa" are the later RC4 layouts,
    "aesv2" is AES-128-CBC (V4/R4, the Acrobat 7+ default), "aesv3" /
    "aesv3-r5" are AES-256 (V5 R6 / legacy R5) — all genuinely encrypted
    and all transparently readable. ``encrypted="aes"`` stamps a
    non-Standard (public-key) /Encrypt dict so tests can exercise the
    PdfEncryptedError reject path; ``user_password`` makes any really-
    encrypted mode a genuinely LOCKED file (empty-password open fails).

    ``font_mode`` (r6) picks the text-encoding layout: "simple" is the
    latin-1 Helvetica every earlier round used; "winansi" re-encodes
    text cp1252 under /Encoding /WinAnsiEncoding; "diff" remaps every
    used char through an /Encoding /Differences glyph-name array;
    "cid" embeds a /Type0 Identity-H font with first-use-ordered CIDs,
    hex-string show ops (every third line a split TJ array) and a
    /ToUnicode CMap — the subset-font layout every modern PDF writer
    (Word/Chrome/LibreOffice) emits; "mixed" alternates lines between
    the simple /F1 and the CID /F2 to exercise Tf decoder switching.

    ``wrap_in_form`` (r6) moves each page's paint ops into a /Subtype
    /Form XObject carrying its OWN /Resources (fonts and images), the
    page content reduced to a single Do — the letterhead/stamp layout.
    ``resources_on_pages_tree`` (r6) hoists /Resources onto the /Pages
    node so pages inherit it (text/rule documents only — image XObject
    names are allocated per page and cannot be hoisted).
    ``kerned_spaces`` (r6) emits word gaps as −278 TJ kern adjustments
    instead of space characters — how typesetting writers encode
    spacing (simple/winansi/diff font modes).
    """
    from .pdfcrypt import (
        derive_file_key, make_r6_entries, object_key, object_key_aes,
        owner_entry, pdf_aes_encrypt, rc4, user_entry,
    )

    def _iv(num: int) -> bytes:
        # deterministic per-object IV — fixtures must be byte-stable
        return hashlib.md5(b"iv%d" % num).digest()

    if encrypted in ("aesv3", "aesv3-r5"):
        r = 5 if encrypted == "aesv3-r5" else 6
        file_key = hashlib.sha256(
            b"pdf_extractor_scripts_spark aes256 fixture key"
        ).digest()
        u, ue, o, oe, perms = make_r6_entries(
            user_password,
            user_password if owner_password is None else owner_password,
            file_key, p=-1, r=r,
        )
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R %d /Length 256 "
            b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
            b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> /P -1 >>"
            % (r, hexlify(o), hexlify(u), hexlify(oe), hexlify(ue),
               hexlify(perms))
        )
        id_hex = b""

        def enc_stream(num: int, data: bytes) -> bytes:
            return pdf_aes_encrypt(file_key, _iv(num), data)
    elif encrypted is True or encrypted in ("rc4-128", "v4-rc4",
                                            "v4-rc4-nometa", "aesv2"):
        v, r, length = {
            True: (1, 2, 40), "rc4-128": (2, 3, 128), "v4-rc4": (4, 4, 128),
            "v4-rc4-nometa": (4, 4, 128), "aesv2": (4, 4, 128),
        }[encrypted]
        em = encrypted != "v4-rc4-nometa"
        file_id = hashlib.md5(b"pdf_extractor_scripts_spark fixture id").digest()
        o_entry = owner_entry(
            user_password if owner_password is None else owner_password,
            user_password, r=min(r, 3),
        )
        file_key = derive_file_key(user_password, o_entry, -1, file_id, r=r,
                                   length=length, encrypt_metadata=em)
        u_entry = user_entry(file_key, file_id, r)
        id_hex = hexlify(file_id)
        cfm = b"AESV2" if encrypted == "aesv2" else b"V2"
        cf = (b"/CF << /StdCF << /CFM /%s /Length 16 >> >> "
              b"/StmF /StdCF /StrF /StdCF "
              % cfm
              + (b"" if em else b"/EncryptMetadata false ")
              if v == 4 else b"")
        enc_dict = (
            b"<< /Filter /Standard /V %d /R %d /Length %d %s"
            b"/O <%s> /U <%s> /P -1 >>"
            % (v, r, length, cf, hexlify(o_entry), hexlify(u_entry))
        )

        if encrypted == "aesv2":
            def enc_stream(num: int, data: bytes) -> bytes:
                return pdf_aes_encrypt(
                    object_key_aes(file_key, num), _iv(num), data
                )
        else:
            def enc_stream(num: int, data: bytes) -> bytes:
                return rc4(object_key(file_key, num), data)
    else:
        # a PUBLIC-KEY security handler — genuinely out of scope for the
        # standard-handler reader, the honest reject fixture now that both
        # AES families decrypt transparently
        enc_dict = (
            b"<< /Filter /Adobe.PubSec /SubFilter /adbe.pkcs7.s5 /V 4 "
            b"/CF << /DefaultCryptFilter << /CFM /AESV2 /Length 16 >> >> "
            b"/StmF /DefaultCryptFilter /StrF /DefaultCryptFilter >>"
            if encrypted == "aes" else b"")
        id_hex = b""
        enc_stream = lambda num, data: data  # noqa: E731

    really_encrypted = bool(enc_dict) and encrypted != "aes"

    def _note(num: int) -> bytes:
        # a literal string INSIDE a stream object's dict (encrypted modes):
        # pins that stream-dict strings decrypt with the object key — spec
        # says ALL strings outside /Encrypt are encrypted, stream dicts
        # included (an r5 gap: only non-stream objects were walked)
        if not really_encrypted:
            return b""
        return b" /Note <%s>" % hexlify(enc_stream(num, b"fixture-stream-note"))

    objects: dict[int, bytes] = {}
    next_num = 1

    def alloc() -> int:
        nonlocal next_num
        n = next_num
        next_num += 1
        return n

    catalog_num = alloc()
    pages_num = alloc()
    font_num = alloc()

    # font objects per font_mode (charset collected in first-use order
    # so CID/Differences code assignment is deterministic)
    code_of: dict[str, int] = {}
    if font_mode in ("cid", "diff", "mixed"):
        for events in pages:
            for ev in events:
                if ev[0] == "text":
                    for ch in ev[1]:
                        if ch not in code_of:
                            code_of[ch] = len(code_of) + (
                                0x21 if font_mode == "diff" else 1
                            )
    cid_font_num = None
    if font_mode == "simple" or font_mode == "mixed":
        objects[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                             b"/BaseFont /Helvetica >>")
    elif font_mode == "winansi":
        objects[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                             b"/BaseFont /Helvetica "
                             b"/Encoding /WinAnsiEncoding >>")
    elif font_mode == "diff":
        if code_of and max(code_of.values()) > 0xFF:
            raise ValueError(
                "font_mode='diff' supports at most 223 distinct chars"
            )
        names = b" ".join(
            b"/" + _writer_glyph_name(ch).encode("ascii")
            for ch, _c in sorted(code_of.items(), key=lambda kv: kv[1])
        )
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /Differences [ 33 %s ] >> >>" % names
        )
    elif font_mode != "cid":
        raise ValueError(f"unknown font_mode {font_mode!r}")
    if font_mode in ("cid", "mixed"):
        desc_num = alloc()
        tu_num = alloc()
        cid_font_num = alloc() if font_mode == "mixed" else font_num
        objects[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fixture "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /DW 500 >>"
        )
        objects[cid_font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_num, tu_num)
        )
        tu_payload = enc_stream(tu_num,
                                zlib.compress(_tounicode_cmap(code_of)))
        objects[tu_num] = (
            b"<< /Filter /FlateDecode /Length %d%s >>\nstream\n%s"
            b"\nendstream"
            % (len(tu_payload), _note(tu_num), tu_payload)
        )

    kid_nums = []
    for events in pages:
        n_images = sum(1 for e in events if e[0] == "image")
        img_nums = []
        for _ in range(n_images):
            inum = alloc()
            iw = ih = 1
            cspace = b"/DeviceGray"
            if image_filter == "DCT":
                # fake-JPEG bytes: SOI + APP0 marker + EOI — enough for the
                # terminal-codec passthrough (nothing here parses pixels)
                img_data = b"\xff\xd8\xff\xe0\x00\x06FAKE\xff\xd9"
                fname = b"DCTDecode"
            elif image_filter == "DCT-real":
                # a REAL baseline JPEG (stdlib codec) — the payload the
                # multimodal decode stage can genuinely decode
                from ..operators.jpegcodec import encode_gray_jpeg

                iw = ih = 16
                grad = bytes(
                    min(255, 40 + 12 * ((x + y) % 16))
                    for y in range(ih) for x in range(iw)
                )
                img_data = encode_gray_jpeg(grad, iw, ih, quality=85)
                fname = b"DCTDecode"
            elif image_filter == "DCT-cmyk-real":
                # a REAL 4-component Adobe YCCK JPEG — the print-
                # workflow scan form (/ColorSpace /DeviceCMYK)
                from ..operators.jpegcodec import encode_cmyk_jpeg

                iw = ih = 16
                cmyk = bytes(
                    v
                    for y in range(ih) for x in range(iw)
                    for v in (30, 20, 10,
                              220 if (4 <= y <= 6 and x % 5 < 2)
                              or (10 <= y <= 12 and (x // 3) % 2 == 0)
                              else 0)
                )
                img_data = encode_cmyk_jpeg(cmyk, iw, ih, quality=88)
                fname = b"DCTDecode"
                cspace = b"/DeviceCMYK"
            elif image_filter == "JPX-real":
                # a REAL lossless JPEG 2000 codestream (stdlib codec) —
                # self-describing, no DecodeParms
                from ..operators.jpxcodec import encode_jpx

                iw = ih = 16
                grad = bytes(
                    min(255, 30 + 9 * ((x * 2 + y) % 24))
                    for y in range(ih) for x in range(iw)
                )
                img_data = encode_jpx(grad, iw, ih, 1, levels=2)
                fname = b"JPXDecode"
            elif image_filter == "JPX-tiled-real":
                # a multi-tile lossless codestream (one SOT tile-part per
                # tile) — how real encoders bound working memory on large
                # scans; 2×2 grid of 16px tiles, 16 % 2**levels == 0
                from ..operators.jpxcodec import encode_jpx

                iw = ih = 32
                grad = bytes(
                    min(255, 30 + 9 * ((x * 2 + y) % 24))
                    for y in range(ih) for x in range(iw)
                )
                img_data = encode_jpx(grad, iw, ih, 1, levels=2, tiles=16)
                fname = b"JPXDecode"
            elif image_filter == "JPX-precinct-real":
                # custom precincts + RPCL + SOP/EPH — the kakadu-class
                # large-scan signalling shape (Scod bits 0/1/2 all set)
                from ..operators.jpxcodec import encode_jpx

                iw = ih = 32
                grad = bytes(
                    min(255, 30 + 9 * ((x * 2 + y) % 24))
                    for y in range(ih) for x in range(iw)
                )
                img_data = encode_jpx(grad, iw, ih, 1, levels=2,
                                      precincts=3, prog=2,
                                      sop=True, eph=True)
                fname = b"JPXDecode"
            elif image_filter == "JPX-sub-real":
                # 4:2:0 per-component subsampling (XRsiz/YRsiz=2 on the
                # chroma planes, MCT off) — the subsampled-scanner form
                from ..operators.jpxcodec import encode_jpx

                iw = ih = 16
                rgb = bytes(
                    v
                    for y in range(ih) for x in range(iw)
                    for v in (min(255, 30 + 9 * ((x * 2 + y) % 24)),
                              min(255, 50 + 7 * ((x + 2 * y) % 24)),
                              (x * y) % 200)
                )
                img_data = encode_jpx(rgb, iw, ih, 3, levels=2,
                                      mct=False,
                                      sampling=[(1, 1), (2, 2),
                                                (2, 2)])
                fname = b"JPXDecode"
            elif image_filter == "JPX-lossy-real":
                # the dominant real-world /JPXDecode form: LOSSY 9/7
                # irreversible with scalar-expounded quantization
                from ..operators.jpxcodec import encode_jpx

                iw = ih = 16
                grad = bytes(
                    min(255, 30 + 9 * ((x * 2 + y) % 24))
                    for y in range(ih) for x in range(iw)
                )
                img_data = encode_jpx(grad, iw, ih, 1, levels=2,
                                      irreversible=True, quality=85)
                fname = b"JPXDecode"
            elif image_filter == "JBIG2-real":
                # a REAL embedded-JBIG2 payload (stdlib codec): page info +
                # MQ-coded generic region — self-describing, no DecodeParms
                from ..operators.jbig2codec import encode_jbig2_embedded

                iw = ih = 16
                strokes = bytes(
                    0 if (3 <= y <= 5 and x % 4 < 2)
                    or (9 <= y <= 11 and (x // 2) % 3 == 0) else 255
                    for y in range(ih) for x in range(iw)
                )
                img_data = encode_jbig2_embedded(strokes, iw, ih)
                fname = b"JBIG2Decode"
            elif image_filter == "JBIG2-halftone-real":
                # a REAL halftone-coded JBIG2 payload: pattern
                # dictionary + gray-code bitplane region — the
                # photograph/shading form of scanned bilevel pages
                from ..operators.jbig2codec import (
                    encode_jbig2_halftone_page,
                )

                iw = ih = 16
                patterns = [
                    [[1 if (x + y * 4) % 16 < k * 3 else 0
                      for x in range(4)] for y in range(4)]
                    for k in range(4)
                ]
                grid = [[(m + n) % 4 for n in range(4)]
                        for m in range(4)]
                img_data = encode_jbig2_halftone_page(grid, patterns)
                fname = b"JBIG2Decode"
            elif image_filter == "JBIG2-refined-real":
                # a REAL refinement-coded JBIG2 payload: coarse generic
                # region + immediate refinement region re-coding the
                # exact page — the lossy-then-lossless scanner form
                from ..operators.jbig2codec import (
                    encode_jbig2_refined_page,
                )

                iw = ih = 16
                exact = bytes(
                    0 if (4 <= y <= 6 and x % 5 < 2)
                    or (10 <= y <= 12 and (x // 3) % 2 == 0) else 255
                    for y in range(ih) for x in range(iw)
                )
                coarse = bytes(
                    255 - v if (x + y) % 37 == 5 else v
                    for (x, y), v in zip(
                        ((x, y) for y in range(ih) for x in range(iw)),
                        exact,
                    )
                )
                img_data = encode_jbig2_refined_page(exact, coarse,
                                                     iw, ih)
                fname = b"JBIG2Decode"
            elif image_filter == "JBIG2-text-real":
                # a REAL symbol-coded JBIG2 payload: arithmetic symbol
                # dictionary + text region — the dominant wild form
                # (reused glyph bitmaps plus placements)
                from ..operators.jbig2codec import encode_jbig2_text_page

                iw = ih = 16
                glyphs = [
                    [[1, 1, 1], [1, 0, 1], [1, 0, 1], [1, 1, 1]],  # "o"
                    [[1, 0], [1, 0], [1, 0], [1, 1]],              # "l"
                    [[1, 1, 1], [0, 1, 0], [0, 1, 0]],             # "t"
                ]
                placed = [(0, 1, 2), (1, 5, 2), (2, 8, 3),
                          (0, 1, 9), (2, 5, 10), (1, 9, 9)]
                img_data = encode_jbig2_text_page(iw, ih, glyphs, placed)
                fname = b"JBIG2Decode"
            elif image_filter == "JBIG2-huff-real":
                # the HUFFMAN-coded symbol/text form (SDHUFF/SBHUFF=1,
                # MMR collective bitmap, runcoded symbol IDs) — the
                # layout hardware encoders emit when they skip MQ
                from ..operators.jbig2codec import encode_jbig2_text_page

                iw = ih = 16
                glyphs = [
                    [[1, 1, 1], [1, 0, 1], [1, 0, 1], [1, 1, 1]],  # "o"
                    [[1, 0], [1, 0], [1, 0], [1, 1]],              # "l"
                    [[1, 1, 1], [0, 1, 0], [0, 1, 0]],             # "t"
                ]
                placed = [(0, 1, 2), (1, 5, 2), (2, 8, 3),
                          (0, 1, 9), (2, 5, 10), (1, 9, 9)]
                img_data = encode_jbig2_text_page(iw, ih, glyphs, placed,
                                                  huffman=True)
                fname = b"JBIG2Decode"
            elif image_filter == "Flate-real":
                # a raw 8-bit gray bitmap under /FlateDecode — the most
                # common image form in born-digital PDFs; the byte filter
                # is undone at parse, so the payload IS the samples
                iw = ih = 16
                grad = bytes(
                    min(255, 25 + 10 * ((x + 2 * y) % 20))
                    for y in range(ih) for x in range(iw)
                )
                img_data = zlib.compress(grad)
                fname = b"FlateDecode"
            elif image_filter == "CCITT-real":
                # a REAL Group 4 fax payload (stdlib codec) — the layout
                # scanned B/W invoices actually use; G4 is not
                # self-describing so the object carries /DecodeParms
                from ..operators.ccittcodec import encode_g4

                iw = ih = 16
                strokes = bytes(
                    0 if (4 <= y <= 6 and x % 5 < 2)
                    or (10 <= y <= 12 and (x // 3) % 2 == 0) else 255
                    for y in range(ih) for x in range(iw)
                )
                img_data = encode_g4(strokes, iw, ih)
                fname = b"CCITTFaxDecode"
            elif image_filter == "Flate-inv-real":
                # the MinIsWhite raw form: samples stored INVERTED with
                # /Decode [1 0] mapping them back — decoded stats must
                # equal the plain Flate-real gradient's
                iw = ih = 16
                grad = bytes(
                    255 - min(255, 25 + 10 * ((x + 2 * y) % 20))
                    for y in range(ih) for x in range(iw)
                )
                img_data = zlib.compress(grad)
                fname = b"FlateDecode"
            elif image_filter == "Indexed-real":
                # /Indexed palette over DeviceRGB with 4-bit packed
                # samples — the PNG-derived logo/diagram form born-
                # digital PDFs carry
                iw = ih = 16
                palette = bytes(
                    v for i in range(12)
                    for v in ((20 * i) % 256, (40 + 17 * i) % 256,
                              (200 - 13 * i) % 256)
                )
                rowbytes = (iw * 4 + 7) // 8
                rows = bytearray(rowbytes * ih)
                for y in range(ih):
                    for x in range(iw):
                        bit = x * 4
                        rows[y * rowbytes + (bit >> 3)] |= \
                            ((x + y) % 12) << (4 - (bit & 7))
                img_data = zlib.compress(bytes(rows))
                fname = b"FlateDecode"
                cspace = b"[/Indexed /DeviceRGB 11 <%s>]" \
                    % hexlify(palette)
            else:
                img_data = zlib.compress(b"\x80")
                fname = b"FlateDecode"
            img_data = enc_stream(inum, img_data)
            if fname == b"CCITTFaxDecode":
                bpc = 1
                parms = (b" /DecodeParms << /K -1 /Columns %d /Rows %d >>"
                         % (iw, ih))
            elif fname == b"JBIG2Decode":
                bpc, parms = 1, b""  # embedded stream is self-describing
            elif image_filter == "Indexed-real":
                bpc, parms = 4, b""
            elif image_filter == "Flate-inv-real":
                bpc, parms = 8, b" /Decode [1 0]"
            else:
                bpc, parms = 8, b""
            objects[inum] = (
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace %s /BitsPerComponent %d "
                b"/Filter /%s%s /Length %d >>\nstream\n%s\nendstream"
                % (iw, ih, cspace, bpc, fname, parms, len(img_data),
                   img_data)
            )
            img_nums.append(inum)

        ops = []
        in_text = False
        first_line = True
        img_i = 0
        line_i = 0
        for ev in events:
            if ev[0] == "text":
                if not in_text:
                    ops.append(b"BT /F1 10 Tf 1 0 0 1 72 760 Tm")
                    in_text = True
                    first_line = True
                if not first_line:
                    ops.append(b"0 -12 Td")
                use_cid = font_mode == "cid" or (
                    font_mode == "mixed" and line_i % 2 == 1
                )
                if font_mode == "mixed":
                    ops.append(b"/F2 10 Tf" if use_cid
                               else b"/F1 10 Tf")
                if use_cid:
                    hx = hexlify(b"".join(
                        code_of[ch].to_bytes(2, "big") for ch in ev[1]
                    ))
                    if line_i % 3 == 2 and len(ev[1]) > 1:
                        # every third line as a split TJ array — pins
                        # that CID tokens never span TJ elements
                        k = (len(ev[1]) // 2) * 4
                        ops.append(b"[<%s> -120 <%s>] TJ"
                                   % (hx[:k], hx[k:]))
                    else:
                        ops.append(b"<%s> Tj" % hx)
                else:
                    if font_mode == "winansi":
                        def enc1(s):
                            return b"(%s)" % _esc_bytes(
                                s.encode("cp1252", errors="replace")
                            )
                    elif font_mode == "diff":
                        def enc1(s):
                            return b"(%s)" % _esc_bytes(
                                bytes(code_of[ch] for ch in s)
                            )
                    else:
                        def enc1(s):
                            return b"(%s)" % _esc(s)
                    if kerned_spaces and " " in ev[1]:
                        # word gaps as kern adjustments — the
                        # typesetting-writer layout
                        ops.append(b"[%s] TJ" % b" -278 ".join(
                            enc1(s) for s in ev[1].split(" ")
                        ))
                    else:
                        ops.append(b"%s Tj" % enc1(ev[1]))
                first_line = False
                line_i += 1
            else:
                if in_text:
                    ops.append(b"ET")
                    in_text = False
                if ev[0] == "image":
                    ops.append(b"q 100 0 0 100 %d 80 cm /Im%d Do Q"
                               % (72 + 110 * img_i, img_i))
                    img_i += 1
                elif ev[0] == "inline_image":
                    # 1×1 gray inline image — the BI..EI layout scanners
                    # emit for small page graphics
                    ops.append(b"q 20 0 0 20 500 700 cm "
                               b"BI /W 1 /H 1 /BPC 8 /CS /G ID \x80 EI Q")
                else:  # rule: "x,y,w,h"
                    x, y, w, h = ev[1].split(",")
                    ops.append(b"%s %s %s %s re f"
                               % tuple(v.encode("ascii") for v in (x, y, w, h)))
        if in_text:
            ops.append(b"ET")
        content = b"\n".join(ops)
        cf = content_filter if content_filter else ("Flate" if compress else None)

        def _stream_parts(num: int, data: bytes) -> tuple[bytes, bytes]:
            # (dict entries, payload) — /Length AFTER encryption: RC4
            # preserves length but AES adds an IV + padding
            if cf is not None:
                fname, enc = _CONTENT_ENCODERS[cf]
                payload = enc_stream(num, enc(data))
                return (b"/Filter /%s /Length %d%s"
                        % (fname.encode("ascii"), len(payload),
                           _note(num)), payload)
            payload = enc_stream(num, data)
            return (b"/Length %d%s" % (len(payload), _note(num)), payload)

        xobj = b""
        if img_nums:
            entries = b" ".join(
                b"/Im%d %d 0 R" % (i, n) for i, n in enumerate(img_nums)
            )
            xobj = b"/XObject << %s >>" % entries
        font_res = b"/F1 %d 0 R" % font_num
        if font_mode == "mixed":
            font_res += b" /F2 %d 0 R" % cid_font_num
        res_body = b"<< /Font << %s >> %s >>" % (font_res, xobj)

        if wrap_in_form:
            # page paint ops live inside a /Form XObject carrying its
            # OWN resources; the page content is a single Do
            fm = alloc()
            sd, payload = _stream_parts(fm, content)
            objects[fm] = (
                b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
                b"/Resources %s %s >>\nstream\n%s\nendstream"
                % (res_body, sd, payload)
            )
            content = b"q /Fm0 Do Q"
            res_body = b"<< /XObject << /Fm0 %d 0 R >> >>" % fm

        cnum = alloc()
        sd, payload = _stream_parts(cnum, content)
        objects[cnum] = b"<< %s >>\nstream\n%s\nendstream" % (sd, payload)

        pnum = alloc()
        if resources_on_pages_tree:
            if img_nums or wrap_in_form:
                raise ValueError(
                    "resources_on_pages_tree supports text/rule pages "
                    "only (image XObject names are per-page)"
                )
            objects[pnum] = (
                b"<< /Type /Page /Parent %d 0 R /Contents %d 0 R >>"
                % (pages_num, cnum)
            )
        else:
            objects[pnum] = (
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources %s /Contents %d 0 R >>"
                % (pages_num, res_body, cnum)
            )
        kid_nums.append(pnum)

    kids = b" ".join(b"%d 0 R" % n for n in kid_nums)
    tree_extra = b""
    if resources_on_pages_tree:
        # inheritable attributes live on the /Pages node; kids carry none
        fr = b"/F1 %d 0 R" % font_num
        if font_mode == "mixed":
            fr += b" /F2 %d 0 R" % cid_font_num
        tree_extra = (b" /MediaBox [0 0 612 792] "
                      b"/Resources << /Font << %s >> >>" % fr)
    objects[pages_num] = (b"<< /Type /Pages /Kids [%s] /Count %d%s >>"
                          % (kids, len(kid_nums), tree_extra))
    objects[catalog_num] = b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num

    # /Info with a literal string — exercises STRING decryption: in the
    # classic layout the string is RC4'd with the Info object's own key; in
    # the ObjStm layout it stays plain inside the (encrypted) container
    # stream, pinning that objstm strings are never double-decrypted
    producer = b"pdf_extractor_scripts_spark writer"
    info_num = alloc()
    really_encrypted = bool(enc_dict) and encrypted != "aes"
    if really_encrypted:
        info_body = b"<< /Producer <%s> >>" % hexlify(
            enc_stream(info_num, producer)
        )
        info_plain = b"<< /Producer (%s) >>" % producer
    else:
        info_body = info_plain = b"<< /Producer (%s) >>" % producer

    if not xref_stream:
        objects[info_num] = info_body
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for num in sorted(objects):
            offsets[num] = len(out)
            out += b"%d 0 obj\n" % num
            out += objects[num]
            out += b"\nendobj\n"
        xref_pos = len(out)
        n_objs = max(objects) + 1
        out += b"xref\n0 %d\n" % n_objs
        out += b"0000000000 65535 f \n"
        for num in range(1, n_objs):
            out += b"%010d 00000 n \n" % offsets[num]
        enc = b" /Encrypt " + enc_dict if enc_dict else b""
        if id_hex:
            enc += b" /ID [<%s> <%s>]" % (id_hex, id_hex)
        out += (b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R%s >>"
                b"\nstartxref\n%d\n%%%%EOF\n"
                % (n_objs, catalog_num, info_num, enc, xref_pos))
        return bytes(out)

    # --- PDF 1.5: pack the document dicts into an /ObjStm, emit an /XRef
    # stream instead of a classic table ---
    packed = [catalog_num, pages_num, font_num, info_num]
    objects[info_num] = info_plain  # container stream carries the crypto
    bodies = [objects.pop(n) for n in packed]
    offs, cur = [], 0
    for b in bodies:
        offs.append(cur)
        cur += len(b) + 1
    header = " ".join(f"{n} {o}" for n, o in zip(packed, offs)).encode("ascii")
    first = len(header) + 1
    payload = zlib.compress(header + b"\n" + b"\n".join(bodies))
    objstm_num = alloc()
    payload = enc_stream(objstm_num, payload)
    objects[objstm_num] = (
        b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode /Length %d >>"
        b"\nstream\n%s\nendstream" % (len(packed), first, len(payload), payload)
    )
    xref_num = alloc()

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += objects[num]
        out += b"\nendobj\n"
    xref_pos = len(out)
    n_objs = xref_num + 1

    def entry(typ: int, f2: int, f3: int) -> bytes:
        return bytes([typ]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

    rows = [entry(0, 0, 0xFFFF)]  # object 0: free
    for num in range(1, n_objs):
        if num in packed:
            rows.append(entry(2, objstm_num, packed.index(num)))
        elif num == xref_num:
            rows.append(entry(1, xref_pos, 0))
        else:
            rows.append(entry(1, offsets[num], 0))
    xref_payload = zlib.compress(b"".join(rows))
    enc = b"/Encrypt " + enc_dict + b" " if enc_dict else b""
    if id_hex:
        enc += b"/ID [<%s> <%s>] " % (id_hex, id_hex)
    out += b"%d 0 obj\n" % xref_num
    out += (
        b"<< /Type /XRef /Size %d /W [1 4 2] /Index [0 %d] /Root %d 0 R "
        b"/Info %d 0 R %s"
        b"/Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (n_objs, n_objs, catalog_num, info_num, enc, len(xref_payload),
           xref_payload)
    )
    if xref_stream != "hybrid":
        out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
        return bytes(out)

    # --- hybrid-reference layout (§7.5.8.4): a classic table lists only
    # the DIRECT objects (legacy readers see a gap where the ObjStm
    # members live); the trailer's /XRefStm points at the /XRef stream
    # above, which supplies their type-2 entries ---
    direct = dict(offsets)
    direct[xref_num] = xref_pos
    table_pos = len(out)
    nums = sorted(direct)
    runs: list[list[int]] = []
    for num in nums:
        if runs and num == runs[-1][-1] + 1:
            runs[-1].append(num)
        else:
            runs.append([num])
    out += b"xref\n0 1\n0000000000 65535 f \n"
    for run in runs:
        out += b"%d %d\n" % (run[0], len(run))
        for num in run:
            out += b"%010d 00000 n \n" % direct[num]
    out += (b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R "
            b"/XRefStm %d %s>>\nstartxref\n%d\n%%%%EOF\n"
            % (n_objs, catalog_num, info_num, xref_pos, enc, table_pos))
    return bytes(out)


def spans_to_pdf(
    spans: list[dict], compress: bool = True, xref_stream: bool = False,
    **build_kwargs,
) -> bytes:
    """Render a fixture span sequence (FIXTURES.md grammar) as real PDF
    bytes, for round-trip tests: build → parse_pdf_spans → the original
    spans back (minus media_text sidecars, which are OCR ground truth, not
    PDF content — a PDF physically stores image pixels, not their text).
    """
    pages: list[list[tuple]] = []
    for s in spans:
        if s["kind"] == "page_break":
            pages.append([])
        elif s["kind"] == "text":
            pages[-1].append(("text", s["text"]))
        elif s["kind"] == "media":
            pages[-1].append(("image",))
        elif s["kind"] == "rule":
            pages[-1].append(("rule", s["text"]))
        # media_text: dropped — not representable in PDF bytes
    return build_pdf(pages, compress=compress, xref_stream=xref_stream,
                     **build_kwargs)
