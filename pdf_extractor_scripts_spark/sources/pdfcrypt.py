"""Standard security handler, RC4 V1/V2 R2-R3, empty user password.

Most real-world "secured" invoices are encrypted with the standard handler
and an EMPTY user password (owner password set, user password blank) — a
reader may open them without prompting. The reference relies on PyPDF2's
transparent ``.decrypt('')`` for exactly these files
(pdf_text_detector.py:171-204); this module reimplements that public
algorithm (PDF 1.7 spec §7.6.3, Algorithms 2-5) with the stdlib only so
the byte-stream parser can read them. AES (/V 4+) and files whose empty
user password fails verification remain PdfEncryptedError rejects.

Everything here derives from the published PDF specification; RC4 and MD5
are textbook/stdlib primitives.
"""

from __future__ import annotations

import hashlib
import struct

# PDF 1.7 spec §7.6.3.3 — the 32-byte password padding string
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (symmetric — encrypts and decrypts)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad(password: bytes) -> bytes:
    return (password + PAD)[:32]


def derive_file_key(
    password: bytes, o_entry: bytes, p: int, id0: bytes, r: int,
    length: int = 40, encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from the (padded) user
    password, /O, /P (signed 32-bit little-endian) and the first file ID.
    R4 with /EncryptMetadata false appends FF FF FF FF to the hash input."""
    h = hashlib.md5()
    h.update(_pad(password))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    digest = h.digest()
    n = 5 if r == 2 else max(5, min(16, length // 8))
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:n]).digest()
    return digest[:n]


def owner_entry(owner_password: bytes, user_password: bytes, r: int = 2) -> bytes:
    """Algorithm 3: the /O entry (RC4 of the padded user password under a
    key from the padded owner password; R3 adds 50 MD5 rounds + 19 more
    RC4 passes with the key XORed by the pass index)."""
    digest = hashlib.md5(_pad(owner_password)).digest()
    n = 5 if r == 2 else 16
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:n]
    data = rc4(key, _pad(user_password))
    if r >= 3:
        for i in range(1, 20):
            data = rc4(bytes(b ^ i for b in key), data)
    return data


def user_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the /U entry for a given file key."""
    if r == 2:
        return rc4(file_key, PAD)
    data = rc4(file_key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        data = rc4(bytes(b ^ i for b in file_key), data)
    return data + b"\x00" * 16  # arbitrary 16-byte pad per spec


def verify_user_password(file_key: bytes, u_entry: bytes, id0: bytes, r: int) -> bool:
    """Does the derived file key authenticate against the stored /U?
    R3 compares only the first 16 bytes (spec Algorithm 6)."""
    expect = user_entry(file_key, id0, r)
    if r == 2:
        return expect == u_entry[:32]
    return expect[:16] == u_entry[:16]


def object_key(file_key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1 (V1/V2 RC4): per-object key = MD5(file key + 3-byte LE
    object number + 2-byte LE generation), truncated to n+5 (max 16)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    return h.digest()[: min(len(file_key) + 5, 16)]
