"""Transparent single-document compression wrappers (gzip/bzip2/xz).

Crawl dumps and document dumps carry loose compressed files — a
``report.pdf.gz``, a ``page.html.xz``, a WET-extract ``.txt.bz2``.
The ingest path unwraps these BEFORE container sniffing so the inner
document routes exactly as if it were bare. All three codecs are
stdlib (zlib / bz2 / lzma), decoded streaming with a decompressed-size
cap — a crafted bomb (a 42 KB gzip inflating to tens of GB) raises
instead of OOMing the executor; at 10^12-document scale a cap that
fails one hostile document beats a task that kills the JVM.

A decompressed payload that is itself a WARC archive is REJECTED with
a pointed error (use the WARC reader — exploding an archive inside a
per-document parse would hide a million documents in one row).
"""

from __future__ import annotations

# generous per-DOCUMENT cap: far above any real single document, far
# below what a bomb needs to hurt a 4-16 GB executor
MAX_DECOMPRESSED = 512 << 20


class BombError(ValueError):
    """Decompressed size exceeded the per-document cap."""


def _stream(d, data: bytes, cap: int) -> bytes:
    """Drive a bz2/lzma-style decompressor (needs_input/eof protocol)
    with a hard output cap."""
    out = bytearray()
    pos = 0
    while not d.eof:
        if d.needs_input:
            if pos >= len(data):
                # a silently shortened document is worse than a counted
                # fallback — reject truncation loudly
                raise ValueError("truncated compressed stream")
            chunk = data[pos:pos + (1 << 20)]
            pos += 1 << 20
        else:
            chunk = b""
        out += d.decompress(chunk, 1 << 20)
        if len(out) > cap:
            raise BombError(
                f"decompressed payload exceeds {cap >> 20} MiB cap")
    return bytes(out)


def maybe_decompress(data: bytes, cap: int = MAX_DECOMPRESSED) -> bytes:
    """Unwrap one layer of gzip / bzip2 / xz; pass anything else
    through untouched. Corrupt compressed streams raise (the caller's
    fallback accounting applies); inner WARC archives raise with a
    routing hint."""
    if data[:2] == b"\x1f\x8b":
        import zlib

        # multi-MEMBER gzip (pigz, chunked-append pipelines) is one
        # logical stream: decode every member, or the document is
        # silently truncated to member 1. Input is fed in fixed-size
        # chunks from an offset so carry buffers stay ≤1 MiB — feeding
        # the whole remaining tail per member would memcpy O(members²)
        # bytes (a 20 MB file of empty members → terabytes of copying,
        # which the OUTPUT cap alone never catches).
        out = bytearray()
        pos = 0
        pending = b""  # post-member carry (≤ one chunk)
        members = 0
        d = None
        while True:
            if d is None:
                while len(pending) < 2 and pos < len(data):
                    pending += data[pos:pos + (1 << 20)]
                    pos += 1 << 20
                if not pending.strip(b"\x00"):
                    break  # zero padding after the last member is legal
                if pending[:2] != b"\x1f\x8b":
                    raise ValueError("trailing garbage after gzip stream")
                members += 1
                if members > 65536:
                    raise BombError("gzip member count exceeds 65536")
                d = zlib.decompressobj(31)
            feed = pending or data[pos:pos + (1 << 20)]
            if not pending:
                pos += 1 << 20
            pending = b""
            if not feed:
                raise ValueError("truncated/corrupt gzip stream")
            while feed and not d.eof:
                out += d.decompress(feed, 1 << 20)
                if len(out) > cap:
                    raise BombError(
                        f"decompressed payload exceeds {cap >> 20} MiB cap")
                feed = d.unconsumed_tail
            if d.eof:
                pending = d.unused_data
                d = None
                if not pending and pos >= len(data):
                    break
        inner = bytes(out)
    elif data[:3] == b"BZh":
        import bz2

        inner = _stream(bz2.BZ2Decompressor(), data, cap)
    elif data[:6] == b"\xfd7zXZ\x00":
        import lzma

        inner = _stream(lzma.LZMADecompressor(), data, cap)
    else:
        return data
    if inner[:5] == b"WARC/":
        raise ValueError(
            "compressed payload is a WARC archive — route it through "
            "read_warc_docs, not the per-document parse")
    return inner
