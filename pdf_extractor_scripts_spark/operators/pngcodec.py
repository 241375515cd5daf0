"""Pure-stdlib PNG codec (ISO/IEC 15948 / RFC 2083 — public spec).

PNG is the dominant raster format in the NON-scanned half of a web
corpus: DOCX embedded pictures, MHTML saved-page resources and HTML
`<img>` payloads are mostly PNG screenshots/logos, so the media audit
(`operators/multimodal.py decode_pdf_media`) needs a real decoder the
same way scanned PDFs needed DCT/CCITT/JBIG2/JPX. Everything here is
`zlib` + the five PNG row filters — the SAME filter algorithms the
PDF parser already applies as /Predictor 10-15 (`pdfparse._unpredict`
is the shared implementation; a PNG file is literally the predictor
layout those xref streams use, wrapped in chunks).

Supported: color types 0 (gray, 1/2/4/8/16-bit), 2 (RGB 8/16),
3 (palette 1/2/4/8 + PLTE), 4 (gray+alpha), 6 (RGBA), both
non-interlaced and Adam7-interlaced, multi-IDAT. Output is 8-bit
luma (BT.601 integer weights, matching the JPEG codec's channel
reduction); alpha is composited over white (the document-rendering
convention). Ancillary chunks are skipped; CRCs are not verified
(zlib's adler32 already guards the pixel data — a corrupt IDAT
raises).

Encoder twin (`encode_png`) drives fixtures: per-row filter choice
(cycling all five by default so decode exercises every filter) and
optional Adam7 output.
"""

from __future__ import annotations

import math
import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass origins and steps: (x0, y0, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

# BT.601 integer luma weights (the jpegcodec convention)
_LR, _LG, _LB = 299, 587, 114

# bomb discipline (the compress.py rule applied to images): IHDR dims
# are attacker-controlled 32-bit fields, so cap the pixel count BEFORE
# allocating and cap the IDAT inflate at the geometry's own size — a
# 100-byte crafted payload must not demand gigabytes
MAX_PIXELS = 1 << 26  # 67 Mpx ≈ any real document image, ≪ executor heap


class PngError(ValueError):
    pass


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise PngError("not a PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise PngError(f"truncated {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise PngError("no IEND chunk")


def _unfilter(raw: bytes, width: int, channels: int, depth: int,
              height: int) -> bytes:
    """Undo per-row filters via the shared PDF-predictor routine —
    PNG rows ARE the /Predictor>=10 layout."""
    from ..sources.pdfparse import _unpredict

    rowlen = (width * channels * depth + 7) // 8
    need = height * (1 + rowlen)
    if len(raw) < need:
        raise PngError("IDAT shorter than the image geometry")
    return _unpredict(raw[:need], {"Predictor": 15, "Colors": channels,
                                   "BitsPerComponent": depth,
                                   "Columns": width})


def _samples(row: bytes, width: int, channels: int, depth: int) -> list[int]:
    """One unfiltered row → per-sample ints (width*channels values)."""
    n = width * channels
    if depth == 8:
        return list(row[:n])
    if depth == 16:
        return [row[2 * i] for i in range(n)]  # high byte ≡ 8-bit value
    out = []
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    for i in range(n):
        b = row[i // per_byte]
        shift = 8 - depth * (i % per_byte + 1)
        out.append((b >> shift) & mask)
    return out


def _to_luma(samples: list[int], color: int, depth: int,
             palette: bytes) -> list[int]:
    """Per-row samples → 8-bit luma values; alpha over white."""
    if color == 0:  # gray
        scale = 255 // ((1 << depth) - 1) if depth < 8 else 1
        return [s * scale for s in samples]
    if color == 3:  # palette
        out = []
        for s in samples:
            base = 3 * s
            if base + 2 >= len(palette):
                raise PngError("palette index out of range")
            r, g, b = palette[base], palette[base + 1], palette[base + 2]
            out.append((_LR * r + _LG * g + _LB * b + 500) // 1000)
        return out
    if color == 2:  # RGB
        return [(_LR * samples[i] + _LG * samples[i + 1]
                 + _LB * samples[i + 2] + 500) // 1000
                for i in range(0, len(samples), 3)]
    if color == 4:  # gray + alpha, over white
        return [(samples[i] * samples[i + 1]
                 + 255 * (255 - samples[i + 1]) + 127) // 255
                for i in range(0, len(samples), 2)]
    if color == 6:  # RGBA, over white
        out = []
        for i in range(0, len(samples), 4):
            y = (_LR * samples[i] + _LG * samples[i + 1]
                 + _LB * samples[i + 2] + 500) // 1000
            a = samples[i + 3]
            out.append((y * a + 255 * (255 - a) + 127) // 255)
        return out
    raise PngError(f"unsupported color type {color}")


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """PNG bytes → (width, height, 8-bit luma row-major)."""
    ihdr = None
    idat = bytearray()
    palette = b""
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
    if ihdr is None or len(ihdr) < 13:
        raise PngError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13])
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if color not in _CHANNELS:
        raise PngError(f"unsupported color type {color}")
    if depth not in (1, 2, 4, 8, 16) or \
            (color in (2, 4, 6) and depth < 8) or \
            (color == 3 and depth == 16):
        raise PngError(f"illegal bit depth {depth} for color type {color}")
    if w == 0 or h == 0:
        raise PngError("zero-dimension image")
    if w * h > MAX_PIXELS:
        raise PngError(f"image {w}x{h} exceeds the {MAX_PIXELS}-pixel cap")
    channels = _CHANNELS[color]
    # the geometry bounds the legitimate inflate size exactly: rows of
    # (1 + rowlen) bytes per pass; Adam7's seven passes never exceed
    # 2x the non-interlaced size
    rowlen_full = (w * channels * depth + 7) // 8
    raw_cap = 2 * h * (1 + rowlen_full) + 64
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), raw_cap)
        if not d.eof and (d.unconsumed_tail or d.decompress(b"", 1)):
            raise PngError("IDAT inflates past the image geometry (bomb)")
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from None

    luma = bytearray(w * h)
    if interlace == 0:
        rowlen = (w * channels * depth + 7) // 8
        flat = _unfilter(raw, w, channels, depth, h)
        for y in range(h):
            row = flat[y * rowlen:(y + 1) * rowlen]
            vals = _to_luma(_samples(row, w, channels, depth),
                            color, depth, palette)
            luma[y * w:(y + 1) * w] = bytes(vals)
    elif interlace == 1:  # Adam7
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            rowlen = (pw * channels * depth + 7) // 8
            need = ph * (1 + rowlen)
            flat = _unfilter(raw[pos:pos + need], pw, channels, depth, ph)
            pos += need
            for ry in range(ph):
                row = flat[ry * rowlen:(ry + 1) * rowlen]
                vals = _to_luma(_samples(row, pw, channels, depth),
                                color, depth, palette)
                for rx in range(pw):
                    luma[(y0 + ry * dy) * w + (x0 + rx * dx)] = vals[rx]
    else:
        raise PngError(f"unknown interlace method {interlace}")
    return w, h, bytes(luma)


def png_pixel_stats(payload: bytes) -> list[float]:
    """A real ``decode_media`` decoder for PNG payloads:
    [width, height, mean, std, p_dark] — the feature shape the
    multimodal stage consumes (jpeg_pixel_stats' contract)."""
    w, h, px = decode_png(payload)
    n = len(px)
    mean = sum(px) / n
    var = sum((p - mean) ** 2 for p in px) / n
    dark = sum(1 for p in px if p < 64) / n
    return [float(w), float(h), mean, math.sqrt(var), dark]


# ---------------------------------------------------------------------------
# encoder twin (fixtures)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_row(row: bytes, prev: bytes, bpp: int, ft: int) -> bytes:
    if ft == 0:
        return row
    out = bytearray(len(row))
    for j in range(len(row)):
        a = row[j - bpp] if j >= bpp else 0
        b = prev[j]
        c = prev[j - bpp] if j >= bpp else 0
        if ft == 1:
            out[j] = (row[j] - a) & 0xFF
        elif ft == 2:
            out[j] = (row[j] - b) & 0xFF
        elif ft == 3:
            out[j] = (row[j] - (a + b) // 2) & 0xFF
        else:
            out[j] = (row[j] - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def encode_png(pixels: bytes, width: int, height: int,
               color_type: int = 0, bit_depth: int = 8,
               palette: bytes = b"", interlace: int = 0,
               row_filter: int | None = None) -> bytes:
    """Encoder twin: ``pixels`` is row-major samples for ``color_type``
    (luma for 0, RGB triples for 2, palette indices for 3, pairs for
    4, quads for 6; 8-bit samples — sub-byte/16-bit depths are packed
    here). ``row_filter`` pins one filter type; default cycles 0-4 so
    a round-trip test exercises every decoder branch. ``interlace=1``
    writes Adam7 passes."""
    channels = _CHANNELS[color_type]

    def pack_row(vals: list[int]) -> bytes:
        if bit_depth == 8:
            return bytes(vals)
        if bit_depth == 16:
            return b"".join(struct.pack(">H", v << 8) for v in vals)
        per_byte = 8 // bit_depth
        out = bytearray((len(vals) + per_byte - 1) // per_byte)
        for i, v in enumerate(vals):
            shift = 8 - bit_depth * (i % per_byte + 1)
            out[i // per_byte] |= (v & ((1 << bit_depth) - 1)) << shift
        return bytes(out)

    bpp = max(1, (channels * bit_depth) // 8)

    def emit_pass(xs: range, ys: range) -> bytes:
        raw = bytearray()
        prev = b"\x00" * ((len(xs) * channels * bit_depth + 7) // 8)
        for ri, y in enumerate(ys):
            vals = []
            for x in xs:
                base = (y * width + x) * channels
                vals.extend(pixels[base:base + channels])
            row = pack_row(vals)
            ft = row_filter if row_filter is not None else ri % 5
            raw.append(ft)
            raw += _filter_row(row, prev, bpp, ft)
            prev = row
        return bytes(raw)

    if interlace == 0:
        raw = emit_pass(range(width), range(height))
    else:
        raw = b"".join(
            emit_pass(range(x0, width, dx), range(y0, height, dy))
            for x0, y0, dx, dy in _ADAM7
            if (width - x0 + dx - 1) // dx and (height - y0 + dy - 1) // dy
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += _chunk(b"PLTE", palette)
    out += _chunk(b"IDAT", zlib.compress(raw, 6))
    out += _chunk(b"IEND", b"")
    return out
