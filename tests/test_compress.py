"""Compression wrappers (sources/compress.py): gzip/bzip2/xz loose
documents unwrap before sniffing; bombs and mis-routed WARCs reject."""

from __future__ import annotations

import bz2
import gzip
import lzma
import os
import zlib

import pytest

from pdf_extractor_scripts_spark.sources.compress import (
    BombError,
    maybe_decompress,
)


def test_all_three_codecs_unwrap():
    doc = b"plain text body\n\nsecond paragraph" * 10
    for wrap in (gzip.compress, bz2.compress, lzma.compress):
        assert maybe_decompress(wrap(doc)) == doc
    assert maybe_decompress(doc) == doc  # passthrough


def test_bomb_caps():
    bomb = gzip.compress(b"\x00" * (8 << 20))
    with pytest.raises(BombError):
        maybe_decompress(bomb, cap=1 << 20)
    with pytest.raises(BombError):
        maybe_decompress(bz2.compress(b"\x00" * (8 << 20)), cap=1 << 20)
    with pytest.raises(BombError):
        maybe_decompress(lzma.compress(b"\x00" * (8 << 20)), cap=1 << 20)


def test_corrupt_and_truncated_streams_raise():
    payload = bytes(range(256)) * 64  # incompressible: big deflate body
    blob = gzip.compress(payload)
    mid = len(blob) // 2  # deep inside the deflate data
    corrupt = blob[:mid] + bytes(b ^ 0xFF for b in blob[mid:mid + 8]) \
        + blob[mid + 8:]
    with pytest.raises((zlib.error, ValueError)):
        maybe_decompress(corrupt)
    with pytest.raises(ValueError):
        maybe_decompress(blob[:mid])  # truncated gzip
    with pytest.raises(ValueError):
        maybe_decompress(bz2.compress(b"y" * 4096)[:-8])  # truncated bz2


def test_inner_warc_is_rejected_with_routing_hint():
    with pytest.raises(ValueError, match="read_warc_docs"):
        maybe_decompress(gzip.compress(b"WARC/1.1\r\nWARC-Type: warcinfo"))


def test_compressed_documents_parse_end_to_end(spark, tmp_path):
    from pdf_extractor_scripts_spark.sources.pdfparse import build_pdf
    from pdf_extractor_scripts_spark.sources.spans import (
        parse_binary_to_spans,
        read_binary_docs,
    )

    pdf = build_pdf([[("text", "compressed invoice 991")]])
    with open(tmp_path / "a.pdf.gz", "wb") as f:
        f.write(gzip.compress(pdf))
    with open(tmp_path / "b.txt.xz", "wb") as f:
        f.write(lzma.compress(b"wet extract paragraph\n\nsecond one"))
    with open(tmp_path / "c.txt.bz2", "wb") as f:
        f.write(bz2.compress(b"bzip2 wrapped text"))
    acc = spark.sparkContext.accumulator(0)
    rows = {os.path.basename(r["doc_id"]): r for r in parse_binary_to_spans(
        read_binary_docs(spark, str(tmp_path), glob="*"),
        fallback_acc=acc, container="auto").collect()}
    assert acc.value == 0 and all(r["parse_ok"] for r in rows.values())
    texts = {k: [s["text"] for s in r["spans"] if s["kind"] == "text"]
             for k, r in rows.items()}
    assert texts["a.pdf.gz"] == ["compressed invoice 991"]
    assert texts["b.txt.xz"] == ["wet extract paragraph", "second one"]
    assert texts["c.txt.bz2"] == ["bzip2 wrapped text"]
