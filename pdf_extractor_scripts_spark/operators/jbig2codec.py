"""Pure-stdlib JBIG2 GENERIC-REGION codec (ITU-T T.88 subset).

/JBIG2Decode is the remaining scanned-B/W codec family after Group 3/4:
PDF embeds T.88 segment streams. This module implements the tractable,
fully-specified core — the MQ arithmetic coder (T.88 Annex E), generic
region decoding (templates 0-3, TPGDON typical prediction, §6.2), the
MMR variant (which IS T.6 — reused from ``ccittcodec``), and the embedded
segment layer (page info + immediate generic regions) — plus an encoder
twin for fixtures. Symbol-dictionary/text/halftone/refinement region
types raise ValueError: the honest reject (those are the text-compression
layers; a region-level scan image decodes right here).

Validation note: no external JBIG2 conformance vectors are available in
this sandbox, so the MQ coder is pinned by encoder↔decoder round-trips
over adversarial bit sequences and by structural properties (terminal
0xFF>0x8F handling, carry propagation). The template/context packing and
the TPGDON pseudo-contexts (0x9B25/0x0795/0x00E5/0x0195) follow the
published spec ordering, so nominal-AT streams are interoperable.

Scale note: pure-Python arithmetic decoding costs microseconds per pixel
— fine for the invoice-class page images these fixtures model, and the
cost is per-executor CPU inside the same map task (no plan change); a
deployment ingesting full-page 300-DPI JBIG2 scans would swap the MQ +
region loops for a C-backed implementation behind the same function
signatures, exactly like the RC4/AES notes in sources/pdfcrypt.py.

Everything here implements the published ITU-T T.88 specification.
"""

from __future__ import annotations

import struct

# T.88 Table E.1 — the MQ-coder probability state machine:
# (Qe, NMPS, NLPS, SWITCH) per state index.
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 Annex E software-conventions decoder (chigh/clow split)."""

    def __init__(self, data: bytes):
        self.data = data
        self.end = len(data)
        self.bp = 0
        # INITDEC: C = B << 16 (chigh holds B), BYTEIN, C <<= 7, CT -= 7
        self.chigh = data[0] if data else 0xFF
        self.clow = 0
        self._byte_in()
        self.chigh = ((self.chigh << 7) & 0xFFFF) | ((self.clow >> 9) & 0x7F)
        self.clow = (self.clow << 7) & 0xFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte_in(self) -> None:
        data, bp = self.data, self.bp
        b = data[bp] if bp < self.end else 0xFF
        if b == 0xFF:
            nxt = data[bp + 1] if bp + 1 < self.end else 0xFF
            if nxt > 0x8F:
                self.clow += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.clow += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            self.clow += (data[bp + 1] << 8) if bp + 1 < self.end else 0xFF00
            self.ct = 8
        if self.clow > 0xFFFF:
            self.chigh += self.clow >> 16
            self.clow &= 0xFFFF

    def read_bit(self, contexts: list, cx: int) -> int:
        """Decode one bit under context ``cx`` (contexts holds packed
        state: index*2 + mps)."""
        state = contexts[cx]
        icx, mps = state >> 1, state & 1
        qe, nmps, nlps, switch = _QE[icx]
        self.a -= qe
        if self.chigh < qe:
            if self.a < qe:
                self.a = qe
                d = mps
                icx = nmps
            else:
                self.a = qe
                d = 1 ^ mps
                if switch:
                    mps = d
                icx = nlps
        else:
            self.chigh -= qe
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 ^ mps
                if switch:
                    mps = d
                icx = nlps
            else:
                d = mps
                icx = nmps
        while True:
            if self.ct == 0:
                self._byte_in()
            self.a = (self.a << 1) & 0xFFFF
            self.chigh = ((self.chigh << 1) & 0xFFFF) | ((self.clow >> 15) & 1)
            self.clow = (self.clow << 1) & 0xFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        contexts[cx] = (icx << 1) | mps
        return d


class MQEncoder:
    """T.88 Annex E encoder (C register with carry into emitted bytes)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.b = -1  # index of the byte open for carry (none yet)

    def _byte_out(self) -> None:
        if self.b >= 0 and self.out[self.b] == 0xFF:
            self.b = len(self.out)
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c < 0x8000000:
            self.b = len(self.out)
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
            return
        # carry into the previous byte
        if self.b >= 0:
            self.out[self.b] += 1
        if self.b >= 0 and self.out[self.b] == 0xFF:
            self.c &= 0x7FFFFFF
            self.b = len(self.out)
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            self.b = len(self.out)
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8

    def encode_bit(self, contexts: list, cx: int, d: int) -> None:
        state = contexts[cx]
        icx, mps = state >> 1, state & 1
        qe, nmps, nlps, switch = _QE[icx]
        if d == mps:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                contexts[cx] = (icx << 1) | mps
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            icx = nmps
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps ^= 1
            icx = nlps
        while True:  # RENORME
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()
            if self.a & 0x8000:
                break
        contexts[cx] = (icx << 1) | mps

    def flush(self) -> bytes:
        # SETBITS: maximize the low bits inside [C, C+A)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        for _ in range(2):
            self.c <<= self.ct
            self._byte_out()
        # terminator: spec-recommended 0xFF 0xAC (decoder's B>0x8F rule
        # makes it self-delimiting)
        if self.b < 0 or self.out[self.b] != 0xFF:
            self.out.append(0xFF)
        self.out.append(0xAC)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Generic region (T.88 §6.2): template context formation + TPGDON
# ---------------------------------------------------------------------------
_TEMPLATES = {
    0: [(-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (2, -1), (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
    1: [(-1, -2), (0, -2), (1, -2), (2, -2), (-2, -1), (-1, -1), (0, -1),
        (1, -1), (2, -1), (-3, 0), (-2, 0), (-1, 0)],
    2: [(-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-2, 0), (-1, 0)],
    3: [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (-4, 0), (-3, 0),
        (-2, 0), (-1, 0)],
}
# nominal AT pixel positions per template (A1..A4 for template 0)
_NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
# TPGDON pseudo-pixel contexts (spec values for the sorted nominal layout)
_PSEUDO = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _template_coords(template: int, at=None):
    coords = list(_TEMPLATES[template]) + list(at or _NOMINAL_AT[template])
    coords.sort(key=lambda p: (p[1], p[0]))  # row-major: the spec packing
    return coords


def decode_generic_region(data: bytes, width: int, height: int,
                          template: int = 0, tpgdon: bool = True,
                          at=None) -> list[list[int]]:
    """MQ-coded generic region → bitmap rows of 0/1 (1 = black)."""
    if template not in _TEMPLATES:
        raise ValueError(f"bad generic template {template}")
    coords = _template_coords(template, at)
    nbits = len(coords)
    contexts = [0] * (1 << nbits)
    dec = MQDecoder(data)
    bitmap = [[0] * width for _ in range(height)]
    ltp = 0
    for y in range(height):
        if tpgdon:
            ltp ^= dec.read_bit(contexts, _PSEUDO[template])
            if ltp:
                if y:
                    bitmap[y] = list(bitmap[y - 1])
                continue
        row = bitmap[y]
        for x in range(width):
            cx = 0
            for dx, dy in coords:
                yy, xx = y + dy, x + dx
                if 0 <= yy and 0 <= xx < width and yy < height:
                    cx = (cx << 1) | bitmap[yy][xx]
                else:
                    cx <<= 1
            row[x] = dec.read_bit(contexts, cx)
    return bitmap


def encode_generic_region(bitmap: list[list[int]], template: int = 0,
                          tpgdon: bool = True, at=None) -> bytes:
    """Encoder twin of ``decode_generic_region``."""
    height = len(bitmap)
    width = len(bitmap[0]) if height else 0
    coords = _template_coords(template, at)
    contexts = [0] * (1 << len(coords))
    enc = MQEncoder()
    ltp = 0
    for y in range(height):
        if tpgdon:
            same = y > 0 and bitmap[y] == bitmap[y - 1]
            enc.encode_bit(contexts, _PSEUDO[template], ltp ^ same)
            ltp = same
            if same:
                continue
        row = bitmap[y]
        for x in range(width):
            cx = 0
            for dx, dy in coords:
                yy, xx = y + dy, x + dx
                if 0 <= yy and 0 <= xx < width and yy < height:
                    cx = (cx << 1) | bitmap[yy][xx]
                else:
                    cx <<= 1
            enc.encode_bit(contexts, cx, row[x])
    return enc.flush()


# ---------------------------------------------------------------------------
# Embedded (PDF) segment layer: page info + immediate generic regions
# ---------------------------------------------------------------------------
_SEG_PAGE_INFO = 48
_SEG_END_OF_PAGE = 49
_SEG_END_OF_FILE = 51
_SEG_GENERIC_IMMEDIATE = 38
_SEG_GENERIC_IMMEDIATE_LOSSLESS = 39
_SEG_GENERIC_INTERMEDIATE = 36


def _parse_segment_header(data: bytes, pos: int):
    num, flags = struct.unpack_from(">IB", data, pos)
    pos += 5
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    rts = data[pos]
    count = rts >> 5
    if count == 7:  # long form
        count = struct.unpack_from(">I", data, pos)[0] & 0x1FFFFFFF
        pos += 4 + (count + 8) // 8  # retain bits
    else:
        pos += 1
    # referred-to segment numbers: size depends on THIS segment's number
    ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
    pos += count * ref_size
    if page_assoc_4:
        page = struct.unpack_from(">I", data, pos)[0]
        pos += 4
    else:
        page = data[pos]
        pos += 1
    length = struct.unpack_from(">I", data, pos)[0]
    pos += 4
    return {"num": num, "type": seg_type, "page": page,
            "length": length, "data_start": pos}


def decode_jbig2_embedded(data: bytes) -> tuple[int, int, bytes]:
    """Embedded (PDF /JBIG2Decode) stream → (width, height, 8-bit gray
    pixels; 0 = black). Supports page-info + immediate generic regions
    (MQ templates 0-3 with/without TPGDON, and the MMR=1 variant via the
    Group 4 decoder). Symbol/text/halftone/refinement segments raise —
    the honest reject."""
    pos = 0
    page_w = page_h = None
    page: list[list[int]] | None = None
    while pos < len(data):
        if pos + 11 > len(data):
            break
        seg = _parse_segment_header(data, pos)
        start = seg["data_start"]
        if seg["length"] == 0xFFFFFFFF:
            raise ValueError("unknown-length JBIG2 segment unsupported")
        end = start + seg["length"]
        body = data[start:end]
        t = seg["type"]
        if t == _SEG_PAGE_INFO:
            page_w, page_h = struct.unpack_from(">II", body, 0)
            if page_h == 0xFFFFFFFF:
                raise ValueError("striped unknown-height JBIG2 page")
            if page_w * page_h > 100_000_000:
                # corrupt-header guard: refuse absurd dimensions BEFORE
                # allocating (a flipped byte must not OOM an executor)
                raise ValueError("implausible JBIG2 page dimensions")
            flags = body[16]
            default = (flags >> 2) & 1
            page = [[default] * page_w for _ in range(page_h)]
        elif t in (_SEG_GENERIC_IMMEDIATE, _SEG_GENERIC_IMMEDIATE_LOSSLESS,
                   _SEG_GENERIC_INTERMEDIATE):
            if page is None:
                raise ValueError("JBIG2 region before page info")
            rw, rh, rx, ry = struct.unpack_from(">IIII", body, 0)
            if rw * rh > 100_000_000:
                raise ValueError("implausible JBIG2 region dimensions")
            gflags = body[17]
            mmr = gflags & 1
            template = (gflags >> 1) & 3
            tpgdon = bool(gflags & 8)
            p = 18
            at = None
            if not mmr:
                n_at = 4 if template == 0 else 1
                at = []
                for _ in range(n_at):
                    ax = struct.unpack_from(">b", body, p)[0]
                    ay = struct.unpack_from(">b", body, p + 1)[0]
                    at.append((ax, ay))
                    p += 2
            coded = body[p:]
            if mmr:
                from .ccittcodec import decode_g4

                _, _, gray = decode_g4(coded, rw, rh)
                bm = [
                    [1 if gray[y * rw + x] < 128 else 0 for x in range(rw)]
                    for y in range(rh)
                ]
            else:
                bm = decode_generic_region(coded, rw, rh, template,
                                           tpgdon, at)
            for y in range(rh):  # OR-composite onto the page
                py = ry + y
                if py >= page_h:
                    break
                prow = page[py]
                brow = bm[y]
                for x in range(rw):
                    px = rx + x
                    if px < page_w and brow[x]:
                        prow[px] = 1
        elif t in (_SEG_END_OF_PAGE, _SEG_END_OF_FILE, 50):
            pass  # end-of-page/file, end-of-stripe
        else:
            # 0 = symbol dictionary, 4-7 = text regions, 16/20-23 =
            # pattern/halftone, 40-43 = refinement: the text-compression
            # layers — honest reject
            raise ValueError(
                f"JBIG2 segment type {t} unsupported (generic regions only)"
            )
        pos = end
    if page is None:
        raise ValueError("no JBIG2 page information segment")
    out = bytearray(page_w * page_h)
    for y in range(page_h):
        row = page[y]
        base = y * page_w
        for x in range(page_w):
            out[base + x] = 0 if row[x] else 255
    return page_w, page_h, bytes(out)


def _segment_header(num: int, seg_type: int, page: int,
                    length: int) -> bytes:
    return struct.pack(">IBBBI", num, seg_type, 0x00, page, length)


def encode_jbig2_embedded(pixels: bytes, width: int, height: int,
                          template: int = 0, tpgdon: bool = True,
                          mmr: bool = False) -> bytes:
    """8-bit gray (<128 = black) → embedded JBIG2 stream: page info + one
    immediate lossless generic region — the fixture twin for the PDF
    /JBIG2Decode path."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    bitmap = [
        [1 if pixels[y * width + x] < 128 else 0 for x in range(width)]
        for y in range(height)
    ]
    if mmr:
        from .ccittcodec import encode_g4

        coded = encode_g4(pixels, width, height)
        gflags = 1
        at_bytes = b""
    else:
        coded = encode_generic_region(bitmap, template, tpgdon)
        gflags = (template << 1) | (8 if tpgdon else 0)
        at = _NOMINAL_AT[template]
        at_bytes = b"".join(struct.pack(">bb", ax, ay) for ax, ay in at)
    page_body = struct.pack(">IIII", width, height, 0, 0) + b"\x01" + b"\x00\x00"
    out = bytearray()
    out += _segment_header(0, _SEG_PAGE_INFO, 1, len(page_body))
    out += page_body
    region_body = (
        struct.pack(">IIII", width, height, 0, 0) + b"\x00"
        + bytes([gflags]) + at_bytes + coded
    )
    out += _segment_header(1, _SEG_GENERIC_IMMEDIATE_LOSSLESS, 1,
                           len(region_body))
    out += region_body
    out += _segment_header(2, _SEG_END_OF_PAGE, 1, 0)
    return bytes(out)


def jbig2_pixel_stats(payload: bytes) -> list[float]:
    """A real ``decode_media`` decoder for /JBIG2Decode payloads:
    [width, height, mean, std, p_dark] — the shared feature shape."""
    import math

    w, h, px = decode_jbig2_embedded(payload)
    n = max(len(px), 1)
    mean = sum(px) / n
    var = sum((p - mean) ** 2 for p in px) / n
    dark = sum(1 for p in px if p < 64) / n
    return [float(w), float(h), mean, math.sqrt(var), dark]
