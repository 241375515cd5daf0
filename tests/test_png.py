"""PNG codec (operators/pngcodec.py): spec-layout decode vectors,
encoder/decoder round-trips across color types, depths, filters and
Adam7, and the multimodal dispatch over DOCX/MHTML payloads."""

from __future__ import annotations

import struct
import zlib

import pytest

from pdf_extractor_scripts_spark.operators.pngcodec import (
    PngError,
    decode_png,
    encode_png,
    png_pixel_stats,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def _hand_png(w, h, depth, color, idat_raw: bytes, palette=b"",
              interlace=0) -> bytes:
    """Direct spec-layout construction — independent of encode_png, so
    a co-bug in the encoder/decoder pair can't hide (the zigzag-DQT
    lesson: self-consistent codecs validate nothing)."""
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                             interlace))
    if palette:
        out += _chunk(b"PLTE", palette)
    return out + _chunk(b"IDAT", zlib.compress(idat_raw)) + _chunk(
        b"IEND", b"")


def test_hand_built_gray_vector():
    # 3x2 gray: row filters 0 then 2(up) — pixel values known by hand
    raw = bytes([0, 10, 20, 30,
                 2, 5, 5, 5])  # row2 = row1 + (5,5,5)
    w, h, px = decode_png(_hand_png(3, 2, 8, 0, raw))
    assert (w, h) == (3, 2)
    assert list(px) == [10, 20, 30, 15, 25, 35]


def test_hand_built_rgb_sub_filter_vector():
    # 2x1 RGB with filter 1 (sub, bpp=3): second pixel stored as delta
    raw = bytes([1, 255, 0, 0, 1, 255, 0])  # (255,0,0) then +(1,255,0)
    w, h, px = decode_png(_hand_png(2, 1, 8, 2, raw))
    # luma of (255,0,0)=76, (0,255,0)=150 (BT.601 integer, +500//1000);
    # the second pixel's red byte wraps: 255+1 ≡ 0 (mod 256)
    assert (w, h) == (2, 1) and list(px) == [76, 150]


def test_hand_built_1bit_palette():
    # 4x1, 1-bit palette indices 1,0,1,1 packed MSB-first = 0b1011_0000
    pal = bytes([0, 0, 0, 255, 255, 255])  # 0=black, 1=white
    raw = bytes([0, 0b10110000])
    w, h, px = decode_png(_hand_png(4, 1, 1, 3, raw, palette=pal))
    assert list(px) == [255, 0, 255, 255]


@pytest.mark.parametrize("color,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_roundtrip_all_color_types_all_filters(color, channels):
    w, h = 9, 7  # odd sizes; default encoder cycles filters 0-4
    pixels = bytes(((x * 37 + y * 11 + c * 5) % 256)
                   for y in range(h) for x in range(w)
                   for c in range(channels))
    w2, h2, px = decode_png(encode_png(pixels, w, h, color_type=color))
    assert (w2, h2) == (w, h) and len(px) == w * h
    if color == 0:
        assert px == pixels  # gray is lossless through luma


def test_alpha_composites_over_white():
    # gray+alpha: value 0 at alpha 0 → white; alpha 255 → the value
    px = decode_png(encode_png(bytes([0, 0, 0, 255]), 2, 1,
                               color_type=4))[2]
    assert list(px) == [255, 0]


@pytest.mark.parametrize("depth", [1, 2, 4, 16])
def test_roundtrip_gray_depths(depth):
    w, h = 10, 3
    maxv = (1 << depth) - 1 if depth < 8 else 255
    vals = bytes((x + y) % (maxv + 1) for y in range(h) for x in range(w))
    w2, h2, px = decode_png(encode_png(vals, w, h, bit_depth=depth))
    assert (w2, h2) == (w, h)
    if depth < 8:
        scale = 255 // maxv
        assert list(px) == [v * scale for v in vals]
    else:  # 16-bit: high byte round-trips
        assert list(px) == list(vals)


def test_adam7_interlace_matches_progressive_layout():
    w, h = 13, 9  # non-multiple-of-8 exercises partial passes
    pixels = bytes((x * 19 + y * 7) % 256 for y in range(h)
                   for x in range(w))
    plain = decode_png(encode_png(pixels, w, h))[2]
    inter = decode_png(encode_png(pixels, w, h, interlace=1))[2]
    assert inter == plain == pixels


def test_palette_roundtrip_with_plte():
    pal = bytes(v for i in range(8) for v in (i * 30, i * 20, i * 10))
    idx = bytes((x + y) % 8 for y in range(4) for x in range(6))
    w, h, px = decode_png(encode_png(idx, 6, 4, color_type=3,
                                     palette=pal))
    lum = [(299 * pal[3 * i] + 587 * pal[3 * i + 1]
            + 114 * pal[3 * i + 2] + 500) // 1000 for i in idx]
    assert list(px) == lum


def test_corrupt_rejects():
    good = encode_png(bytes(range(16)), 4, 4)
    with pytest.raises(PngError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(PngError):
        decode_png(good[:-20])  # IEND gone
    with pytest.raises(PngError):
        decode_png(_hand_png(4, 4, 8, 0, b"\x00\x01\x02"))  # short IDAT
    with pytest.raises(PngError):  # palette index out of range
        decode_png(_hand_png(2, 1, 8, 3, bytes([0, 5, 6]),
                             palette=bytes(6)))
    with pytest.raises(PngError):  # illegal depth for RGB
        decode_png(_hand_png(2, 1, 4, 2, bytes([0, 0])))


def test_pixel_stats_contract():
    stats = png_pixel_stats(encode_png(bytes([0] * 32 + [255] * 32),
                                       8, 8))
    assert stats[0] == 8.0 and stats[1] == 8.0
    assert abs(stats[2] - 127.5) < 1e-9  # mean
    assert abs(stats[4] - 0.5) < 1e-9    # p_dark


def test_docx_png_decodes_through_media_audit(spark, tmp_path):
    from pdf_extractor_scripts_spark.operators.multimodal import (
        decode_pdf_media,
        media_from_pdfs,
    )
    from pdf_extractor_scripts_spark.sources.docxparse import build_docx
    from pdf_extractor_scripts_spark.sources.spans import read_binary_docs

    png = encode_png(bytes((x * 3) % 256 for x in range(24 * 10)), 24, 10)
    with open(tmp_path / "shot.docx", "wb") as f:
        f.write(build_docx(["screenshot doc"],
                           images={0: ("shot.png", png)}))
    feats = decode_pdf_media(
        media_from_pdfs(read_binary_docs(spark, str(tmp_path),
                                         glob="*.docx"))).collect()
    assert len(feats) == 1
    row = feats[0]
    assert row["filter"] == "PNG" and row["decoded"]
    assert row["feature"][0] == 24.0 and row["feature"][1] == 10.0
