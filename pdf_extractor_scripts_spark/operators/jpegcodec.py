"""Pure-stdlib baseline JPEG codec (grayscale, 8-bit, no subsampling).

Closes the "real image codec is env-blocked" seam for the most common PDF
image filter: /DCTDecode payloads are baseline JPEG, and this module can
really decode them (and encode fixtures) with nothing but the standard
library — ITU-T T.81 baseline sequential, one component, standard Annex K
quantization + Huffman tables. The reference hands DCT pages to
PIL/tesseract (image_pdf_processor.py:337-433); in this sandbox those
libraries are absent, so the engine slot of operators/multimodal.py
(``decode_media(decoder=...)``) can be fed ``jpeg_pixel_stats`` instead of
a stub, making the decode stage REAL for DCT payloads.

Scope (r5, extended): baseline sequential (SOF0), grayscale AND YCbCr
color with sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0 — the
real-world scanner classes), restart markers (DRI/RSTn). Decoding returns
the LUMA plane — document text lives in luminance; chroma blocks are
entropy-decoded to stay in sync but not reconstructed. Progressive,
arithmetic-coded, 12-bit, and >2×2-sampled variants raise ValueError (the
honest reject). Everything here implements the published spec.
"""

from __future__ import annotations

import math
import struct

# ITU-T T.81 Annex K.1 — luminance quantization table (quality 50 base)
QTABLE_BASE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# zig-zag order (K.1 figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 — standard luminance DC table: code lengths + symbols
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.3 — standard luminance AC table
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Annex K.2 — chrominance quantization table (quality 50 base)
QTABLE_CHROMA_BASE = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 — standard chrominance DC/AC tables
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _scaled_qtable(quality: int, base: list[int] | None = None) -> list[int]:
    """IJG quality scaling of an Annex K table, returned in ZIGZAG order —
    the order DQT segments (and this codec's quantize loops, which index by
    zigzag position) use. The base tables above are spec-printed in natural
    row-major order, so each entry is permuted through ZIGZAG here; without
    the permutation the effective matrix is a scrambled Annex K (r5 bug —
    self-consistent, but wrong quality semantics vs any other codec)."""
    if base is None:
        base = QTABLE_BASE
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [
        max(1, min(255, (base[ZIGZAG[i]] * scale + 50) // 100))
        for i in range(64)
    ]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cu = _COS[u][x]
                row = x * 8
                for y in range(8):
                    s += block[row + y] * cu * _COS[v][y]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[u][x]
                row = u * 8
                for v in range(8):
                    s += cu * _C[v] * coef[row + v] * _COS[v][y]
            out[x * 8 + y] = 0.25 * s
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)

    def marker(self, m: int) -> None:
        """Byte-align (1-padded) and emit a raw marker (RSTn)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, m])


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def encode_gray_jpeg(pixels: bytes, width: int, height: int,
                     quality: int = 75, restart_interval: int = 0) -> bytes:
    """Encode 8-bit grayscale pixels (row-major) as baseline JPEG.
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs (the
    layout scanners produce for error resilience)."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    qt = _scaled_qtable(quality)
    dc_codes = _huff_codes(DC_BITS, DC_VALS)
    ac_codes = _huff_codes(AC_BITS, AC_VALS)

    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.marker(0xD0 + (mcu // restart_interval - 1) % 8)
                prev_dc = 0
            mcu += 1
            block = []
            for y in range(8):
                sy = min(by + y, height - 1)
                row = sy * width
                for x in range(8):
                    sx = min(bx + x, width - 1)  # edge-replicate padding
                    block.append(float(pixels[row + sx]) - 128.0)
            coef = _fdct(block)
            quant = [int(round(coef[ZIGZAG[i]] / qt[i])) for i in range(64)]
            # DC
            diff = quant[0] - prev_dc
            prev_dc = quant[0]
            cat = _category(diff)
            code, ln = dc_codes[cat]
            bw.write(code, ln)
            if cat:
                bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            # AC with run-length + ZRL/EOB
            run = 0
            for i in range(1, 64):
                v = quant[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                cat = _category(v)
                code, ln = ac_codes[(run << 4) | cat]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
                run = 0
            if run:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qt)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + \
        b"\x01\x11\x00"  # component 1, 1x1 sampling, qtable 0
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(DC_VALS)) + b"\x00" + \
        bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(AC_VALS)) + b"\x10" + \
        bytes(AC_BITS) + bytes(AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos : self.pos + 1]
                if nxt == b"\x00":
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume the expected RSTn marker (DRI scans)."""
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and \
                d[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF or \
                not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


def _huff_lookup(bits: list[int], vals: list[int]):
    """(code, length) → symbol map for decode."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(code, length)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_gray_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Back-compat wrapper: decode any supported baseline JPEG and return
    the LUMA plane — for a grayscale file that is the image itself."""
    return decode_jpeg_luma(data)


def _scan_end(data: bytes, start: int) -> int:
    """End offset of an entropy-coded segment: the next marker that is not
    byte stuffing (FF 00), a fill byte (FF FF), or a restart (RSTn)."""
    i = start
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= len(data):
            return len(data)
        m = data[j + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            i = j + 2
        elif m == 0xFF:
            i = j + 1
        else:
            return j


def decode_jpeg_luma(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline (SOF0) or progressive (SOF2, r6) JPEG →
    (width, height, luma pixels).

    Supported: grayscale AND YCbCr color, sampling factors up to 2×2
    (4:4:4, 4:2:2, 4:2:0 — the real-world scanner classes), restart
    markers (DRI/RSTn), and progressive Huffman scans (spectral selection
    + successive approximation, interleaved and single-component). The
    LUMA plane is returned — for document processing the text lives in
    luminance; baseline chroma blocks are entropy-decoded (they must be,
    to stay in sync) but not reconstructed; progressive chroma scans are
    independent segments and are skipped entirely. Arithmetic-coded,
    hierarchical, lossless and 12-bit variants raise ValueError (the
    honest reject)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    width = height = 0
    comps: list[dict] = []  # {id, h, v, tq} in SOF order
    scan_comps: list[dict] = []  # SOF comp + dc/ac table ids, in SOS order
    restart_interval = 0
    scan_start = None
    adobe_transform = 0  # APP14: 0 = CMYK-direct, 2 = YCCK (TN 5116)
    progressive = False
    prog_scans: list[dict] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7 or marker == 0xFF:
            continue  # standalone / fill
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit qtables unsupported")
                qtables[tq] = list(seg[i + 1 : i + 65])
                i += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            if width * height > 100_000_000:
                # corrupt-header guard: refuse absurd SOF dimensions
                # BEFORE allocating (a flipped byte must not OOM an
                # executor)
                raise ValueError("implausible JPEG frame dimensions")
            ncomp = seg[5]
            if ncomp not in (1, 3, 4):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0xF
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise ValueError("sampling factors beyond 2x2 unsupported")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(tc, th)] = _huff_lookup(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE:  # APP14: Adobe color-transform flag
            if seg[:5] == b"Adobe" and len(seg) >= 12:
                adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            by_id = {c["id"]: c for c in comps}
            this_scan = []
            for s in range(ns):
                cid, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                c = dict(by_id[cid])
                c["td"], c["ta"] = tt >> 4, tt & 0xF
                this_scan.append(c)
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            start = pos + seglen
            end = _scan_end(data, start)
            prog_scans.append({
                "comps": this_scan, "Ss": ss, "Se": se,
                "Ah": ahal >> 4, "Al": ahal & 0xF,
                "data": data[start:end],
                # tables/DRI may be redefined between scans — snapshot
                "htables": dict(htables), "dri": restart_interval,
            })
            pos = end
            continue
        pos += seglen
    if not width or not prog_scans:
        raise ValueError("no scan data")
    if len(comps) == 4 and (progressive or len(prog_scans) > 1):
        # the Adobe CMYK/YCCK forms in the wild are baseline
        # interleaved; anything fancier is an honest reject
        raise ValueError(
            "progressive/non-interleaved CMYK JPEG unsupported"
        )
    if progressive:
        return _decode_progressive_luma(width, height, comps, qtables,
                                        prog_scans)
    if len(prog_scans) > 1 or len(prog_scans[0]["comps"]) != len(comps):
        # legal baseline may ALSO split components across several scans
        # (non-interleaved) — decode through the coefficient store (r6;
        # was an honest reject)
        return _decode_sequential_luma(width, height, comps, qtables,
                                       prog_scans)
    scan_comps = prog_scans[0]["comps"]
    htables = prog_scans[0]["htables"]
    restart_interval = prog_scans[0]["dri"]
    scan_data = prog_scans[0]["data"]
    if not scan_comps:
        raise ValueError("no scan data")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    luma_id = scan_comps[0]["id"]  # Y is the first SOF/SOS component

    # planes to reconstruct: luma alone for gray/YCbCr; for Adobe
    # 4-component files the black plane matters too (print text lives
    # in K) — YCCK needs {Y, K}, CMYK-direct needs all four (r6)
    needed = {luma_id}
    if len(scan_comps) == 4:
        if adobe_transform == 2:
            needed = {luma_id, scan_comps[3]["id"]}
        else:
            needed = {c["id"] for c in scan_comps}
    rec: dict = {}   # comp id -> (plane, pw, h, v)
    for c in scan_comps:
        if c["id"] in needed:
            pw_c = mcus_x * 8 * c["h"]
            rec[c["id"]] = (bytearray(pw_c * mcus_y * 8 * c["v"]),
                            pw_c, c["h"], c["v"])

    br = _BitReader(scan_data)
    prev_dc = {c["id"]: 0 for c in scan_comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.restart()
                prev_dc = {c["id"]: 0 for c in scan_comps}
            for c in scan_comps:
                dct = htables.get((0, c["td"]))
                act = htables.get((1, c["ta"]))
                qt = qtables.get(c["tq"])
                if not (dct and act and qt):
                    raise ValueError("missing tables")
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        zz = [0] * 64
                        cat = _read_symbol(br, dct)
                        if cat:
                            zz[0] = _extend(br.bits(cat), cat)
                        zz[0] += prev_dc[c["id"]]
                        prev_dc[c["id"]] = zz[0]
                        i = 1
                        while i < 64:
                            sym = _read_symbol(br, act)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                i += 16
                                continue
                            run, cat = sym >> 4, sym & 0xF
                            i += run
                            if i > 63:
                                raise ValueError("AC index overflow")
                            zz[i] = _extend(br.bits(cat), cat)
                            i += 1
                        if c["id"] not in rec:
                            continue  # unneeded chroma: sync-decode only
                        plane, pw_c, _h, _v = rec[c["id"]]
                        coef = [0.0] * 64
                        for k in range(64):
                            coef[ZIGZAG[k]] = zz[k] * qt[k]
                        blk = _idct(coef)
                        bx0 = (mx * c["h"] + bh) * 8
                        by0 = (my * c["v"] + bv) * 8
                        for y in range(8):
                            row = (by0 + y) * pw_c + bx0
                            for x in range(8):
                                v = int(round(blk[y * 8 + x] + 128.0))
                                plane[row + x] = (
                                    0 if v < 0 else (255 if v > 255 else v)
                                )
            mcu_count += 1

    def cropped(cid):
        # padded plane → (width, height), scaling indices when the
        # component is subsampled relative to hmax/vmax
        plane, pw_c, h, v = rec[cid]
        sx, sy = h / hmax, v / vmax
        out_p = bytearray(width * height)
        if sx == 1.0 and sy == 1.0:
            for y in range(height):
                out_p[y * width : (y + 1) * width] = \
                    plane[y * pw_c : y * pw_c + width]
        else:
            for y in range(height):
                row = int(y * sy) * pw_c
                orow = y * width
                for x in range(width):
                    out_p[orow + x] = plane[row + int(x * sx)]
        return out_p

    if len(scan_comps) != 4:
        return width, height, bytes(cropped(luma_id))
    # Adobe 4-component: stored samples are INVERTED (TN 5116), so a
    # stored value is already "how much light". YCCK: effective print
    # luminance = Y' scaled by the black plane; CMYK-direct: scale
    # each of C'M'Y' by K', then BT.601.
    kp = cropped(scan_comps[3]["id"])
    if adobe_transform == 2:
        yp = cropped(luma_id)
        out = bytearray(
            yp[i] * kp[i] // 255 for i in range(width * height)
        )
    else:
        cp = cropped(scan_comps[0]["id"])
        mp = cropped(scan_comps[1]["id"])
        yy = cropped(scan_comps[2]["id"])
        out = bytearray(
            (299 * (cp[i] * kp[i] // 255) + 587 * (mp[i] * kp[i] // 255)
             + 114 * (yy[i] * kp[i] // 255)) // 1000
            for i in range(width * height)
        )
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 Annex G.2: coefficients accumulate
# across scans (spectral selection bands × successive-approximation bit
# planes), then one dequantize + IDCT pass reconstructs the luma plane.
# ---------------------------------------------------------------------------
def _refine_nonzero(block: list[int], br: _BitReader, k0: int, se: int,
                    p1: int) -> None:
    """Correction bits for already-nonzero coefficients in band k0..se —
    consumed even inside EOB runs (G.1.2.3)."""
    for k in range(k0, se + 1):
        z = ZIGZAG[k]
        if block[z]:
            if br.bit() and not (abs(block[z]) & p1):
                block[z] += p1 if block[z] > 0 else -p1


def _decode_progressive_luma(width: int, height: int, comps: list[dict],
                             qtables: dict, scans: list[dict]
                             ) -> tuple[int, int, bytes]:
    store = _coeff_store(width, height, comps)
    mcus_x, mcus_y = store["_mcus"]
    luma_id = comps[0]["id"]

    for scan in scans:
        scomps = scan["comps"]
        ss, se, ah, al = scan["Ss"], scan["Se"], scan["Ah"], scan["Al"]
        if ss == 0 and se != 0 and len(scomps) > 1:
            raise ValueError("interleaved progressive AC scan is illegal")
        # progressive chroma-only scans are independent entropy segments —
        # unlike baseline there is no sync to keep, so skip them outright
        if all(c["id"] != luma_id for c in scomps):
            continue
        br = _BitReader(scan["data"])
        dri = scan["dri"]
        eobrun = 0
        preds = {c["id"]: 0 for c in scomps}
        try:
            if ss == 0:  # DC scan (refinement or first)
                if se != 0:
                    raise ValueError("DC scan with Se != 0")

                def dc_block(block, c):
                    if ah == 0:
                        cat = _read_symbol(br, scan["htables"][(0, c["td"])])
                        diff = _extend(br.bits(cat), cat) if cat else 0
                        preds[c["id"]] += diff
                        block[0] = preds[c["id"]] << al
                    else:
                        if br.bit():
                            block[0] |= 1 << al

                if len(scomps) > 1:  # interleaved MCU order
                    unit = 0
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            if dri and unit and unit % dri == 0:
                                br.restart()
                                preds = {c["id"]: 0 for c in scomps}
                            unit += 1
                            for c in scomps:
                                st = store[c["id"]]
                                for bv in range(c["v"]):
                                    for bh in range(c["h"]):
                                        idx = ((my * c["v"] + bv) * st["pw"]
                                               + mx * c["h"] + bh)
                                        dc_block(st["blocks"][idx], c)
                else:  # single component: raster over its ACTUAL grid
                    c = scomps[0]
                    st = store[c["id"]]
                    unit = 0
                    for by in range(st["ah"]):
                        for bx in range(st["aw"]):
                            if dri and unit and unit % dri == 0:
                                br.restart()
                                preds = {c["id"]: 0 for c in scomps}
                            unit += 1
                            dc_block(st["blocks"][by * st["pw"] + bx], c)
            else:  # AC scan: always single-component
                c = scomps[0]
                st = store[c["id"]]
                act = scan["htables"].get((1, c["ta"]))
                if act is None:
                    raise ValueError("missing AC table")
                p1 = 1 << al
                unit = 0
                for by in range(st["ah"]):
                    for bx in range(st["aw"]):
                        if dri and unit and unit % dri == 0:
                            br.restart()
                            eobrun = 0
                        unit += 1
                        block = st["blocks"][by * st["pw"] + bx]
                        if ah == 0:  # first scan of this band/bit depth
                            if eobrun:
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                sym = _read_symbol(br, act)
                                r, s = sym >> 4, sym & 0xF
                                if s == 0:
                                    if r < 15:  # EOBn
                                        eobrun = (1 << r) - 1
                                        if r:
                                            eobrun += br.bits(r)
                                        break
                                    k += 16  # ZRL
                                else:
                                    k += r
                                    if k > se:
                                        raise ValueError("AC index overflow")
                                    block[ZIGZAG[k]] = (
                                        _extend(br.bits(s), s) << al
                                    )
                                    k += 1
                        else:  # refinement
                            if eobrun:
                                _refine_nonzero(block, br, ss, se, p1)
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                sym = _read_symbol(br, act)
                                r, s = sym >> 4, sym & 0xF
                                if s == 0:
                                    if r < 15:  # EOBn: corrections, then run
                                        eobrun = (1 << r) - 1
                                        if r:
                                            eobrun += br.bits(r)
                                        _refine_nonzero(block, br, k, se, p1)
                                        break
                                    newval, count = 0, 16  # ZRL
                                else:
                                    if s != 1:
                                        raise ValueError(
                                            "refinement size must be 1"
                                        )
                                    newval = p1 if br.bit() else -p1
                                    count = r + 1
                                # pass `count` zero-history coefficients,
                                # correcting nonzeros on the way; place the
                                # new value at the count-th zero
                                while k <= se:
                                    z = ZIGZAG[k]
                                    if block[z]:
                                        if br.bit() and not (
                                            abs(block[z]) & p1
                                        ):
                                            block[z] += (
                                                p1 if block[z] > 0 else -p1
                                            )
                                        k += 1
                                        continue
                                    count -= 1
                                    if count == 0:
                                        if newval:
                                            block[z] = newval
                                        k += 1
                                        break
                                    k += 1
        except ValueError as e:
            if "truncated" in str(e):
                # a cut-off later scan loses precision, not structure —
                # progressive's whole point; keep what accumulated
                continue
            raise

    return _reconstruct_luma(width, height, comps, qtables, store)


def _coeff_store(width: int, height: int, comps: list[dict]) -> dict:
    """Per-component quantized-coefficient block grids (MCU-padded) plus
    the actual (non-interleaved-scan) grid dimensions."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    store: dict[int, dict] = {"_mcus": (mcus_x, mcus_y)}
    for c in comps:
        pw, ph = mcus_x * c["h"], mcus_y * c["v"]
        cw_px = -(-width * c["h"] // hmax)
        ch_px = -(-height * c["v"] // vmax)
        store[c["id"]] = {
            "blocks": [[0] * 64 for _ in range(pw * ph)],
            "pw": pw, "ph": ph,
            "aw": -(-cw_px // 8), "ah": -(-ch_px // 8),
        }
    return store


def _reconstruct_luma(width: int, height: int, comps: list[dict],
                      qtables: dict, store: dict) -> tuple[int, int, bytes]:
    """Dequantize + IDCT the luma component's coefficient store, assemble
    the plane and crop to (width, height) — shared by the progressive and
    sequential multi-scan decoders."""
    c = comps[0]
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    qt = qtables.get(c["tq"])
    if qt is None:
        raise ValueError("missing quantization table")
    st = store[c["id"]]
    lw = st["pw"] * 8
    luma = bytearray(lw * st["ph"] * 8)
    for by in range(st["ph"]):
        for bx in range(st["pw"]):
            block = st["blocks"][by * st["pw"] + bx]
            coef = [0.0] * 64
            for k in range(64):
                z = ZIGZAG[k]
                coef[z] = block[z] * qt[k]
            blk = _idct(coef)
            bx0, by0 = bx * 8, by * 8
            for y in range(8):
                row = (by0 + y) * lw + bx0
                for x in range(8):
                    v = int(round(blk[y * 8 + x] + 128.0))
                    luma[row + x] = 0 if v < 0 else (255 if v > 255 else v)
    sx = c["h"] / hmax
    sy = c["v"] / vmax
    out = bytearray(width * height)
    if sx == 1.0 and sy == 1.0:
        for y in range(height):
            out[y * width : (y + 1) * width] = luma[y * lw : y * lw + width]
    else:
        for y in range(height):
            row = int(y * sy) * lw
            orow = y * width
            for x in range(width):
                out[orow + x] = luma[row + int(x * sx)]
    return width, height, bytes(out)


def _decode_baseline_block(br: _BitReader, dct: dict, act: dict,
                           block: list[int], pred: int) -> int:
    """One full baseline block (DC diff + AC runs) into a NATURAL-order
    quantized-coefficient list; returns the new DC predictor."""
    cat = _read_symbol(br, dct)
    pred += _extend(br.bits(cat), cat) if cat else 0
    block[0] = pred
    i = 1
    while i < 64:
        sym = _read_symbol(br, act)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, cat = sym >> 4, sym & 0xF
        i += run
        if i > 63:
            raise ValueError("AC index overflow")
        block[ZIGZAG[i]] = _extend(br.bits(cat), cat)
        i += 1
    return pred


def _decode_sequential_luma(width: int, height: int, comps: list[dict],
                            qtables: dict, scans: list[dict]
                            ) -> tuple[int, int, bytes]:
    """Baseline NON-INTERLEAVED (multi-scan) decode: each scan carries full
    DC+AC blocks for a component subset; single-component scans raster the
    component's actual grid, interleaved scans follow MCU order. Chroma-
    only scans are independent entropy segments and are skipped (luma out,
    as everywhere in this decoder)."""
    store = _coeff_store(width, height, comps)
    mcus_x, mcus_y = store["_mcus"]
    luma_id = comps[0]["id"]
    for scan in scans:
        scomps = scan["comps"]
        if all(c["id"] != luma_id for c in scomps):
            continue
        br = _BitReader(scan["data"])
        dri = scan["dri"]
        preds = {c["id"]: 0 for c in scomps}
        tabs = {}
        for c in scomps:
            dct = scan["htables"].get((0, c["td"]))
            act = scan["htables"].get((1, c["ta"]))
            if not (dct and act):
                raise ValueError("missing tables")
            tabs[c["id"]] = (dct, act)
        unit = 0
        if len(scomps) == 1:
            c = scomps[0]
            st = store[c["id"]]
            dct, act = tabs[c["id"]]
            for by in range(st["ah"]):
                for bx in range(st["aw"]):
                    if dri and unit and unit % dri == 0:
                        br.restart()
                        preds = {c["id"]: 0}
                    unit += 1
                    preds[c["id"]] = _decode_baseline_block(
                        br, dct, act, st["blocks"][by * st["pw"] + bx],
                        preds[c["id"]],
                    )
        else:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if dri and unit and unit % dri == 0:
                        br.restart()
                        preds = {c["id"]: 0 for c in scomps}
                    unit += 1
                    for c in scomps:
                        st = store[c["id"]]
                        dct, act = tabs[c["id"]]
                        for bv in range(c["v"]):
                            for bh in range(c["h"]):
                                idx = ((my * c["v"] + bv) * st["pw"]
                                       + mx * c["h"] + bh)
                                preds[c["id"]] = _decode_baseline_block(
                                    br, dct, act, st["blocks"][idx],
                                    preds[c["id"]],
                                )
    return _reconstruct_luma(width, height, comps, qtables, store)


def _ycbcr_planes(rgb: bytes, width: int, height: int, subsample: bool):
    """RGB → YCbCr planes [(pixels, w, h, h_samp, v_samp)], chroma
    2×2-box-averaged when ``subsample`` (4:2:0) else full-res (4:4:4)."""
    n = width * height
    Y = bytearray(n)
    Cb = bytearray(n)
    Cr = bytearray(n)
    for i in range(n):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        yv = 0.299 * r + 0.587 * g + 0.114 * b
        Y[i] = max(0, min(255, int(round(yv))))
        Cb[i] = max(0, min(255, int(round(128 - 0.168736 * r
                                          - 0.331264 * g + 0.5 * b))))
        Cr[i] = max(0, min(255, int(round(128 + 0.5 * r - 0.418688 * g
                                          - 0.081312 * b))))
    if subsample:  # 2x2 box-average chroma
        cw, ch = (width + 1) // 2, (height + 1) // 2
        cb2 = bytearray(cw * ch)
        cr2 = bytearray(cw * ch)
        for cy in range(ch):
            for cx in range(cw):
                acc_b = acc_r = cnt = 0
                for dy in range(2):
                    for dx in range(2):
                        y0, x0 = min(2 * cy + dy, height - 1), \
                            min(2 * cx + dx, width - 1)
                        acc_b += Cb[y0 * width + x0]
                        acc_r += Cr[y0 * width + x0]
                        cnt += 1
                cb2[cy * cw + cx] = acc_b // cnt
                cr2[cy * cw + cx] = acc_r // cnt
        return [(bytes(Y), width, height, 2, 2),
                (bytes(cb2), cw, ch, 1, 1), (bytes(cr2), cw, ch, 1, 1)]
    return [(bytes(Y), width, height, 1, 1),
            (bytes(Cb), width, height, 1, 1),
            (bytes(Cr), width, height, 1, 1)]


def _block_at(plane, pw, ph, bx0, by0):
    """8×8 level-shifted sample block with edge replication."""
    out = []
    for y in range(8):
        sy0 = min(by0 + y, ph - 1)
        row = sy0 * pw
        for x in range(8):
            out.append(float(plane[row + min(bx0 + x, pw - 1)]) - 128.0)
    return out


def encode_color_jpeg(rgb: bytes, width: int, height: int,
                      quality: int = 75, subsample: bool = True,
                      interleaved: bool = True) -> bytes:
    """Encode interleaved 8-bit RGB as baseline YCbCr JPEG — 4:2:0 when
    ``subsample`` (the scanner default) else 4:4:4. Fixture-side twin of
    decode_jpeg_luma's color support. ``interleaved=False`` emits three
    sequential single-component scans (the legal non-interleaved baseline
    layout some encoders produce — r6 decoder coverage)."""
    if len(rgb) != 3 * width * height:
        raise ValueError("pixel buffer does not match dimensions")
    planes = _ycbcr_planes(rgb, width, height, subsample)

    qt_l = _scaled_qtable(quality)
    qt_c = _scaled_qtable(quality, QTABLE_CHROMA_BASE)
    dc_l = _huff_codes(DC_BITS, DC_VALS)
    ac_l = _huff_codes(AC_BITS, AC_VALS)
    dc_c = _huff_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _huff_codes(AC_BITS_C, AC_VALS_C)

    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    block_at = _block_at

    def emit_block(bw, ci, plane, pw, ph, bx0, by0, prev):
        qt = qt_l if ci == 0 else qt_c
        dcc = dc_l if ci == 0 else dc_c
        acc = ac_l if ci == 0 else ac_c
        coef = _fdct(block_at(plane, pw, ph, bx0, by0))
        quant = [int(round(coef[ZIGZAG[i]] / qt[i])) for i in range(64)]
        diff = quant[0] - prev
        cat = _category(diff)
        code, ln = dcc[cat]
        bw.write(code, ln)
        if cat:
            bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        run = 0
        for i in range(1, 64):
            vq = quant[i]
            if vq == 0:
                run += 1
                continue
            while run > 15:
                code, ln = acc[0xF0]
                bw.write(code, ln)
                run -= 16
            cat = _category(vq)
            code, ln = acc[(run << 4) | cat]
            bw.write(code, ln)
            bw.write(vq if vq >= 0 else vq + (1 << cat) - 1, cat)
            run = 0
        if run:
            code, ln = acc[0x00]
            bw.write(code, ln)
        return quant[0]

    scans: list[tuple[list[int], bytes]] = []  # (SOS comp spec, data)
    if interleaved:
        bw = _BitWriter()
        prev_dc = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (plane, pw, ph, h, v) in enumerate(planes):
                    for bv in range(v):
                        for bh in range(h):
                            prev_dc[ci] = emit_block(
                                bw, ci, plane, pw, ph,
                                (mx * h + bh) * 8, (my * v + bv) * 8,
                                prev_dc[ci],
                            )
        scans.append(([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0], bw.flush()))
    else:
        for ci, (plane, pw, ph, h, v) in enumerate(planes):
            bw = _BitWriter()
            prev = 0
            for by in range(-(-ph // 8)):
                for bx in range(-(-pw // 8)):
                    prev = emit_block(bw, ci, plane, pw, ph,
                                      bx * 8, by * 8, prev)
            tt = 0x00 if ci == 0 else 0x11
            scans.append(([1, ci + 1, tt, 0, 63, 0], bw.flush()))

    y_hv = (planes[0][3] << 4) | planes[0][4]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qt_l)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(qt_c)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, y_hv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(DC_VALS)) + b"\x00" + \
        bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(AC_VALS)) + b"\x10" + \
        bytes(AC_BITS) + bytes(AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(DC_VALS_C)) + \
        b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C)
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(AC_VALS_C)) + \
        b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C)
    for spec, data in scans:
        out += b"\xff\xda" + struct.pack(">H", 2 + len(spec)) + bytes(spec)
        out += data
    out += b"\xff\xd9"
    return bytes(out)


def encode_cmyk_jpeg(cmyk: bytes, width: int, height: int,
                     quality: int = 75, transform: int = 2) -> bytes:
    """Encode interleaved 8-bit INK CMYK (0 = no ink) as a 4-component
    baseline Adobe JPEG — the print-workflow scan form. Samples are
    stored INVERTED per the Adobe convention (TN 5116) and the APP14
    ``transform`` byte signals the color model: 2 = YCCK (YCbCr over
    the inverted CMY plus the inverted K plane — the Photoshop
    default), 0 = CMYK-direct. 4:4:4 sampling, one interleaved scan.
    Fixture-side twin of decode_jpeg_luma's 4-component support."""
    if len(cmyk) != 4 * width * height:
        raise ValueError("pixel buffer does not match dimensions")
    if transform not in (0, 2):
        raise ValueError("Adobe transform must be 0 (CMYK) or 2 (YCCK)")
    n = width * height
    inv = bytes(255 - b for b in cmyk)  # Adobe inverted storage
    kp = bytes(inv[4 * i + 3] for i in range(n))
    if transform == 2:
        rgb = bytes(inv[4 * i + c] for i in range(n) for c in range(3))
        y3 = _ycbcr_planes(rgb, width, height, False)
        planes = [y3[0][0], y3[1][0], y3[2][0], kp]
        chroma = {1, 2}
    else:
        planes = [bytes(inv[4 * i + c] for i in range(n))
                  for c in range(4)]
        chroma = set()

    qt_l = _scaled_qtable(quality)
    qt_c = _scaled_qtable(quality, QTABLE_CHROMA_BASE)
    dc_l = _huff_codes(DC_BITS, DC_VALS)
    ac_l = _huff_codes(AC_BITS, AC_VALS)
    dc_c = _huff_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _huff_codes(AC_BITS_C, AC_VALS_C)
    bw = _BitWriter()
    prev = [0, 0, 0, 0]
    for by in range(-(-height // 8)):
        for bx in range(-(-width // 8)):
            for ci in range(4):
                is_c = ci in chroma
                qt = qt_c if is_c else qt_l
                dcc = dc_c if is_c else dc_l
                acc = ac_c if is_c else ac_l
                coef = _fdct(_block_at(planes[ci], width, height,
                                       bx * 8, by * 8))
                quant = [int(round(coef[ZIGZAG[i]] / qt[i]))
                         for i in range(64)]
                diff = quant[0] - prev[ci]
                prev[ci] = quant[0]
                cat = _category(diff)
                code, ln = dcc[cat]
                bw.write(code, ln)
                if cat:
                    bw.write(diff if diff >= 0
                             else diff + (1 << cat) - 1, cat)
                run = 0
                for i in range(1, 64):
                    vq = quant[i]
                    if vq == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = acc[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    cat = _category(vq)
                    code, ln = acc[(run << 4) | cat]
                    bw.write(code, ln)
                    bw.write(vq if vq >= 0 else vq + (1 << cat) - 1,
                             cat)
                    run = 0
                if run:
                    code, ln = acc[0x00]
                    bw.write(code, ln)

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
            + b"\x00\x64\x00\x00\x00\x00" + bytes([transform]))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qt_l)
    if chroma:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(qt_c)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 4, 8, height,
                                     width, 4)
    for ci in range(4):
        out += bytes([ci + 1, 0x11, 1 if ci in chroma else 0])
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(DC_VALS)) + \
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(AC_VALS)) + \
        b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    if chroma:
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(DC_VALS_C)) \
            + b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C)
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(AC_VALS_C)) \
            + b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C)
    spec = [4]
    for ci in range(4):
        spec += [ci + 1, 0x11 if ci in chroma else 0x00]
    spec += [0, 63, 0]
    out += b"\xff\xda" + struct.pack(">H", 2 + len(spec)) + bytes(spec)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) fixture encoder — T.81 Annex G.1: DC + spectral bands,
# each with one successive-approximation refinement pass, so every decoder
# path (DC first/refine, AC first/refine, EOB runs, ZRL, correction bits)
# is exercised by real files. The AC table is a flat 8-bit canonical code
# over every (run, size) symbol progressive scans can emit (Annex K's AC
# table lacks the EOBn symbols) — legal, decodable anywhere, fixture-grade
# compression.
# ---------------------------------------------------------------------------
_PROG_AC_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]
_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[7] = len(_PROG_AC_SYMS)  # all codes length 8 (incomplete code)


class _ACProgState:
    """Per-scan EOB-run + buffered-correction-bit state (G.1.2.3)."""

    def __init__(self, bw: _BitWriter, codes: dict):
        self.bw = bw
        self.codes = codes
        self.eobrun = 0
        self.be_bits: list[int] = []

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.codes[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for b in self.be_bits:
                self.bw.write(b, 1)
            self.be_bits = []


def _enc_ac_first(state: _ACProgState, block: list[int], ss: int, se: int,
                  al: int) -> None:
    bw, codes = state.bw, state.codes
    r = 0
    for k in range(ss, se + 1):
        v = block[ZIGZAG[k]]
        m = (-v if v < 0 else v) >> al
        if m == 0:
            r += 1
            continue
        while r > 15:
            state.emit_eobrun()
            code, ln = codes[0xF0]
            bw.write(code, ln)
            r -= 16
        nbits = m.bit_length()
        payload = m if v > 0 else ((1 << nbits) - 1 - m)
        state.emit_eobrun()
        code, ln = codes[(r << 4) | nbits]
        bw.write(code, ln)
        bw.write(payload, nbits)
        r = 0
    if r > 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.emit_eobrun()


def _enc_ac_refine(state: _ACProgState, block: list[int], ss: int, se: int,
                   al: int) -> None:
    bw, codes = state.bw, state.codes
    absv = [abs(block[ZIGZAG[k]]) >> al for k in range(ss, se + 1)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k  # last NEWLY-significant coefficient
    r = 0
    br_bits: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            state.emit_eobrun()
            code, ln = codes[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if t > 1:  # previously significant: just its next magnitude bit
            br_bits.append(t & 1)
            continue
        state.emit_eobrun()
        code, ln = codes[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if block[ZIGZAG[k]] > 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        state.eobrun += 1
        state.be_bits += br_bits
        if state.eobrun == 0x7FFF or len(state.be_bits) > 900:
            state.emit_eobrun()


def encode_progressive_jpeg(pixels: bytes, width: int, height: int,
                            quality: int = 75, rgb: bool = False,
                            subsample: bool = True,
                            band_split: int = 5) -> bytes:
    """Encode a progressive (SOF2) JPEG — grayscale, or YCbCr color with
    ``rgb=True`` (4:2:0 when ``subsample``). Scan script: interleaved DC at
    Al=1, AC spectral bands [1..band_split] and [band_split+1..63] at Al=1
    per component, then a DC refinement and AC refinements down to Al=0 —
    the classic spectral-selection + successive-approximation layout."""
    if rgb:
        planes = _ycbcr_planes(pixels, width, height, subsample)
    else:
        if len(pixels) != width * height:
            raise ValueError("pixel buffer does not match dimensions")
        planes = [(bytes(pixels), width, height, 1, 1)]
    qt_l = _scaled_qtable(quality)
    qt_c = _scaled_qtable(quality, QTABLE_CHROMA_BASE)
    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    comps = []
    for ci, (plane, pw_px, ph_px, h, v) in enumerate(planes):
        qt = qt_l if ci == 0 else qt_c
        pw, ph = mcus_x * h, mcus_y * v  # padded block grid (DC interleave)
        aw, ah = -(-pw_px // 8), -(-ph_px // 8)  # actual grid (AC scans)
        blocks = []
        for by in range(ph):
            for bx in range(pw):
                coef = _fdct(_block_at(plane, pw_px, ph_px, bx * 8, by * 8))
                q = [0] * 64
                for i in range(64):
                    q[ZIGZAG[i]] = int(round(coef[ZIGZAG[i]] / qt[i]))
                blocks.append(q)
        comps.append({"cid": ci + 1, "h": h, "v": v, "tq": 0 if ci == 0 else 1,
                      "td": 0 if ci == 0 else 1, "blocks": blocks,
                      "pw": pw, "ph": ph, "aw": aw, "ah": ah})

    dc_tabs = {0: _huff_codes(DC_BITS, DC_VALS),
               1: _huff_codes(DC_BITS_C, DC_VALS_C)}
    ac_codes = _huff_codes(_PROG_AC_BITS, _PROG_AC_SYMS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qt_l)
    if len(comps) > 1:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(qt_c)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8,
                                     height, width, len(comps))
    for c in comps:
        out += bytes([c["cid"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(DC_VALS)) + b"\x00" + \
        bytes(DC_BITS) + bytes(DC_VALS)
    if len(comps) > 1:
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(DC_VALS_C)) + \
            b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C)
    out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(_PROG_AC_SYMS)) + \
        b"\x10" + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_SYMS)

    def sos(scan_comps, ss, se, ah, al, body):
        hdr = bytes([len(scan_comps)])
        for c in scan_comps:
            hdr += bytes([c["cid"], (c["td"] << 4) | 0])
        hdr += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr)
        out.extend(body)

    # --- scan 1: DC first, interleaved, Al=1 ---
    bw = _BitWriter()
    preds = {c["cid"]: 0 for c in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in comps:
                codes = dc_tabs[c["td"]]
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        blk = c["blocks"][(my * c["v"] + bv) * c["pw"]
                                          + mx * c["h"] + bh]
                        dc = blk[0] >> 1  # Al=1, arithmetic shift
                        diff = dc - preds[c["cid"]]
                        preds[c["cid"]] = dc
                        cat = _category(diff)
                        code, ln = codes[cat]
                        bw.write(code, ln)
                        if cat:
                            bw.write(diff if diff >= 0
                                     else diff + (1 << cat) - 1, cat)
    sos(comps, 0, 0, 0, 1, bw.flush())

    # --- AC first scans per component, two spectral bands, Al=1 ---
    bands = [(1, band_split), (band_split + 1, 63)]
    for c in comps:
        for (ss, se) in bands:
            bw = _BitWriter()
            st = _ACProgState(bw, ac_codes)
            for by in range(c["ah"]):
                for bx in range(c["aw"]):
                    _enc_ac_first(st, c["blocks"][by * c["pw"] + bx],
                                  ss, se, 1)
            st.emit_eobrun()
            sos([c], ss, se, 0, 1, bw.flush())

    # --- DC refinement, interleaved, Ah=1 Al=0 ---
    bw = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in comps:
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        blk = c["blocks"][(my * c["v"] + bv) * c["pw"]
                                          + mx * c["h"] + bh]
                        bw.write(blk[0] & 1, 1)
    sos(comps, 0, 0, 1, 0, bw.flush())

    # --- AC refinement scans, Ah=1 Al=0 ---
    for c in comps:
        for (ss, se) in bands:
            bw = _BitWriter()
            st = _ACProgState(bw, ac_codes)
            for by in range(c["ah"]):
                for bx in range(c["aw"]):
                    _enc_ac_refine(st, c["blocks"][by * c["pw"] + bx],
                                   ss, se, 0)
            st.emit_eobrun()
            sos([c], ss, se, 1, 0, bw.flush())

    out += b"\xff\xd9"
    return bytes(out)


def jpeg_pixel_stats(payload: bytes) -> list[float]:
    """A real ``decode_media`` decoder for DCT payloads: decode the JPEG
    and return [width, height, mean, std, p_dark] pixel statistics — the
    feature shape downstream multimodal ops consume. Raises on non-JPEG
    or unsupported variants (the caller's fallback accounting applies)."""
    w, h, px = decode_gray_jpeg(payload)
    n = len(px)
    mean = sum(px) / n
    var = sum((p - mean) ** 2 for p in px) / n
    dark = sum(1 for p in px if p < 64) / n
    return [float(w), float(h), mean, math.sqrt(var), dark]
