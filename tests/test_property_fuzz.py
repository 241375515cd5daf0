"""Property-based fuzzing (hypothesis) over the pure-Python kernels:

* the PDF writer/parser round-trips ARBITRARY event sequences, both layouts;
* the two independent line-item implementations (oracle.py nested scans vs
  operators/items.py classify-once) agree on arbitrary line soup;
* the OCR quality score and dual-engine selection hold their invariants on
  arbitrary text.

These run no Spark — pure CPU — so hypothesis can afford real example
counts.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pdf_extractor_scripts_spark import oracle as O
from pdf_extractor_scripts_spark.operators import items as I
from pdf_extractor_scripts_spark.sources.pdfparse import (
    build_pdf,
    parse_pdf_spans,
)

# printable latin-1 text without the \n the line model forbids; the parser
# trims line edges (PDF writers position whitespace, they don't encode it)
_line = st.text(
    st.characters(min_codepoint=32, max_codepoint=255, exclude_characters="\n\r\x7f"),
    min_size=1,
    max_size=80,
).map(str.strip).filter(bool)

_event = st.one_of(
    st.tuples(st.just("text"), _line),
    st.tuples(st.just("image")),
    st.tuples(
        st.just("rule"),
        st.tuples(
            st.integers(0, 999), st.integers(0, 999),
            st.integers(1, 999), st.integers(1, 99),
        ).map(lambda t: ",".join(map(str, t))),
    ),
)
_pages = st.lists(st.lists(_event, max_size=12), min_size=1, max_size=5)


@settings(max_examples=120, deadline=None)
@given(pages=_pages, compress=st.booleans(), xref_stream=st.booleans())
def test_pdf_roundtrip_arbitrary_events(pages, compress, xref_stream):
    pdf = build_pdf(pages, compress=compress, xref_stream=xref_stream)
    spans = parse_pdf_spans(pdf, "fuzz/doc.pdf")
    got_pages: list[list[tuple]] = []
    img_i = 0
    for s in spans:
        if s["kind"] == "page_break":
            got_pages.append([])
        elif s["kind"] == "text":
            got_pages[-1].append(("text", s["text"]))
        elif s["kind"] == "media":
            got_pages[-1].append(("image",))
        else:
            got_pages[-1].append(("rule", s["text"]))
    exp_pages = [[e if e[0] != "image" else ("image",) for e in p] for p in pages]
    assert got_pages == exp_pages
    # offsets are dense and ordered
    assert [s["offset"] for s in spans] == list(range(len(spans)))


# line soup: grammar-ish fragments + arbitrary noise, to drive both item
# implementations down the same branchy paths
_money = st.integers(1, 99999).map(lambda v: f"{v / 100:,.2f}")
_ceco_header = st.tuples(
    st.integers(1, 999), st.integers(1, 9), st.integers(0, 9), st.integers(0, 9)
).map(lambda t: f"{t[0]:03d} 572 FR{t[1]}PC {t[2]} {t[3]} 0")
_ceco_price = _money.map(lambda m: f"3 PIECE FRAME 829.000 54.871 {m} {m}")
_mark = st.integers(1, 99).map(lambda v: f"HAP{v}({v})")
_noise = _line
_ceco_soup = st.lists(
    st.one_of(_ceco_header, _ceco_price, _mark.map(lambda m: f"MARK NO: {m}"), _noise),
    max_size=25,
)


@settings(max_examples=120, deadline=None)
@given(lines=_ceco_soup)
def test_ceco_item_impls_agree_on_arbitrary_soup(lines):
    a = O._ceco_items(lines)
    b = I.ceco_items(lines)
    assert [(x["line"], x["serialized"], x["marks"]) for x in a] == [
        (x["line"], x["serialized"], x["marks"]) for x in b
    ]


_sch_item = st.tuples(st.integers(1, 9), _money, _money).map(
    lambda t: f"SCHLAGE UPS EXP {t[0]} 111 111 X*{t[0]} |D| FEB 28 {t[1]} 54.64/00 {t[2]}"
)
_wb16 = st.text(st.sampled_from("0123456789ABCDEFGHJKLMNPQRSTUVWXYZ"),
                min_size=13, max_size=16).map(lambda b: "1Z" + b)
_cont = st.integers(10, 9999).map(str)
_sch_soup = st.lists(
    st.one_of(_sch_item, _wb16, _cont, st.just("PREPAY & ADD"), _noise),
    max_size=25,
)


@settings(max_examples=120, deadline=None)
@given(lines=_sch_soup)
def test_schlage_item_impls_agree_on_arbitrary_soup(lines):
    a = O._schlage_items(lines, {})
    b = I.schlage_items(lines, {})
    assert [(x["line"], x["serialized"]) for x in a] == [
        (x["line"], x["serialized"]) for x in b
    ]


@settings(max_examples=200, deadline=None)
@given(text=st.text(max_size=400), conf=st.floats(0, 100))
def test_ocr_quality_score_bounds(text, conf):
    s = O.ocr_quality_score(text, conf)
    assert 0.0 <= s <= 100.0
    if not text.strip():
        assert s == 0.0


@settings(max_examples=120, deadline=None)
@given(
    l1=st.lists(_line, max_size=10),
    l2=st.lists(_line, max_size=10),
)
def test_ocr_combine_uses_only_input_lines(l1, l2):
    out = O.combine_ocr_results("\n".join(l1), "\n".join(l2))
    pool = {x.strip() for x in l1 + l2}
    for line in out.split("\n"):
        if line:
            assert line in pool
    # base length preserved: merged line count == longer side's count
    n1 = len([x for x in l1 if x.strip()])
    n2 = len([x for x in l2 if x.strip()])
    n_out = len([x for x in out.split("\n") if x])
    assert n_out == max(n1, n2)


@given(data=st.binary(max_size=4000))
@settings(max_examples=60, deadline=None)
def test_codec_roundtrips_arbitrary_bytes(data):
    """r4 stream codecs: every encoder/decoder pair must round-trip
    arbitrary bytes (LZW incl. the table-full CLEAR path; RunLength
    repeat/literal boundaries; AHx/A85 via the stdlib encoders)."""
    import base64
    import binascii

    from pdf_extractor_scripts_spark.sources.pdfparse import (
        _ascii85_decode,
        _asciihex_decode,
        _lzw_decode,
        _lzw_encode,
        _rl_encode,
        _runlength_decode,
    )

    assert _lzw_decode(_lzw_encode(data)) == data
    assert _runlength_decode(_rl_encode(data)) == data
    assert _asciihex_decode(binascii.hexlify(data) + b">") == data
    assert _ascii85_decode(base64.a85encode(data) + b"~>") == data


@given(
    rows=st.lists(st.binary(min_size=6, max_size=6), min_size=1, max_size=8),
    ft=st.sampled_from([0, 1, 2, 3, 4]),
)
@settings(max_examples=60, deadline=None)
def test_png_predictor_roundtrips_all_filter_types(rows, ft):
    """Forward-apply each PNG row filter, then _unpredict must restore the
    original rows (bpp=1, the /Columns layout xref streams use)."""
    from pdf_extractor_scripts_spark.sources.pdfparse import _unpredict

    width = 6
    filtered = bytearray()
    prev = bytes(width)
    for r in rows:
        filtered.append(ft)
        if ft == 0:
            filtered += r
        elif ft == 1:  # sub
            filtered += bytes(
                (r[j] - (r[j - 1] if j >= 1 else 0)) & 0xFF for j in range(width))
        elif ft == 2:  # up
            filtered += bytes((r[j] - prev[j]) & 0xFF for j in range(width))
        elif ft == 3:  # average
            filtered += bytes(
                (r[j] - ((r[j - 1] if j >= 1 else 0) + prev[j]) // 2) & 0xFF
                for j in range(width))
        else:  # paeth
            out = []
            for j in range(width):
                a = r[j - 1] if j >= 1 else 0
                b = prev[j]
                c = prev[j - 1] if j >= 1 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((r[j] - pr) & 0xFF)
            filtered += bytes(out)
        prev = r
    got = _unpredict(bytes(filtered), {"Predictor": 12, "Columns": width})
    assert got == b"".join(rows)


def test_fields_single_matches_oracle_on_all_fixture_docs():
    """The r4 plain-re single-doc extractor (independent.fields_single, the
    step-3b fallback parse) must agree with oracle.extract_fields on every
    fixture document × every vendor bank — the per-doc twin of the
    vectorized-kernel contract."""
    from pdf_extractor_scripts_spark import oracle as O
    from pdf_extractor_scripts_spark.fixtures import make_corpus
    from pdf_extractor_scripts_spark.operators.independent import fields_single

    checked = 0
    for d in make_corpus(120, seed=42):
        text = O.assemble(d["spans"], "text")
        ocr = O.select_ocr_text(d["spans"])
        for vendor in ("ceco", "steelcraft", "schlage", "generic"):
            for t in (text, ocr):
                assert fields_single(vendor, t) == O.extract_fields(vendor, t), \
                    (d["doc_id"], vendor)
                checked += 1
    assert checked == 960


# ---------------------------------------------------------------------------
# r5: standard-security-handler crypto properties (no Spark needed)
# ---------------------------------------------------------------------------
@given(st.binary(min_size=0, max_size=512), st.binary(min_size=1, max_size=16))
@settings(max_examples=50, deadline=None)
def test_rc4_is_an_involution(data, key):
    from pdf_extractor_scripts_spark.sources.pdfcrypt import rc4

    assert rc4(key, rc4(key, data)) == data


@given(st.binary(min_size=0, max_size=24), st.sampled_from([2, 3]))
@settings(max_examples=30, deadline=None)
def test_empty_user_password_always_verifies(owner_pw, r):
    """Whatever the OWNER password, a file whose user password is empty
    must authenticate with the empty password (that's the whole point of
    the transparent-decryption path) — and a NONEMPTY user password must
    not."""
    from pdf_extractor_scripts_spark.sources.pdfcrypt import (
        derive_file_key,
        owner_entry,
        user_entry,
        verify_user_password,
    )

    id0 = b"\x01\x02" * 8
    length = 40 if r == 2 else 128
    o = owner_entry(owner_pw, b"", r=r)
    key = derive_file_key(b"", o, -1, id0, r, length)
    u = user_entry(key, id0, r)
    assert verify_user_password(key, u, id0, r)

    # a document whose USER password is 'secret' must reject empty
    o2 = owner_entry(owner_pw, b"secret", r=r)
    key_secret = derive_file_key(b"secret", o2, -1, id0, r, length)
    u2 = user_entry(key_secret, id0, r)
    key_empty = derive_file_key(b"", o2, -1, id0, r, length)
    assert not verify_user_password(key_empty, u2, id0, r)


@given(st.integers(min_value=1, max_value=9_999_999))
@settings(max_examples=30, deadline=None)
def test_object_keys_differ_per_object(num):
    from pdf_extractor_scripts_spark.sources.pdfcrypt import object_key

    k = b"\x11" * 5
    assert object_key(k, num) != object_key(k, num + 1)
    assert len(object_key(k, num)) == 10  # min(5+5, 16)


@given(st.binary(min_size=0, max_size=48), st.binary(min_size=0, max_size=48),
       st.sampled_from([1, 2, 3, 4, 5]), st.sampled_from([2, 3, 4, 6]))
@settings(max_examples=40, deadline=None)
def test_malformed_encrypt_dicts_reject_cleanly(o_bytes, u_bytes, v, r):
    """Garbage /O //U blobs and off-spec V/R combos must raise
    PdfEncryptedError (counted reject), never an unhandled exception."""
    import re as _re

    from pdf_extractor_scripts_spark.sources.pdfcrypt import PAD, rc4
    from pdf_extractor_scripts_spark.sources.pdfparse import (
        PdfDocument,
        PdfEncryptedError,
        build_pdf,
    )
    from binascii import hexlify as _hx

    base = build_pdf([[("text", "X")]], encrypted=True)
    mangled = _re.sub(rb"/Filter /Standard /V \d+ /R \d+ /Length \d+",
                      b"/Filter /Standard /V %d /R %d /Length 40" % (v, r),
                      base)
    mangled = _re.sub(rb"/O <[0-9a-f]+>", b"/O <" + _hx(o_bytes) + b">", mangled)
    mangled = _re.sub(rb"/U <[0-9a-f]+>", b"/U <" + _hx(u_bytes) + b">", mangled)
    try:
        doc = PdfDocument(mangled)
    except PdfEncryptedError:
        return  # clean counted reject
    # the only way through is a (v, r) we support AND a /U that verifies —
    # astronomically unlikely for random bytes, but if hypothesis finds the
    # exact original entries the parse must still work
    assert (v, r) in ((1, 2), (2, 3), (2, 2), (1, 3))
    assert doc.pages()


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=150, deadline=None)
def test_fast_lexer_matches_reference_lexer(data):
    """r5: the regex master-tokenizer (_CLexer, the production hot path)
    must produce the IDENTICAL token stream and end positions as the
    per-character reference _Lexer on arbitrary bytes — same tokens, same
    final positions, same exception/no-exception behavior."""
    from pdf_extractor_scripts_spark.sources.pdfparse import _CLexer, _Lexer

    a, b = _Lexer(data), _CLexer(data)
    for _ in range(80):
        try:
            ta = a.next_token()
            ea = None
        except Exception as exc:
            ta, ea = None, type(exc)
        try:
            tb = b.next_token()
            eb = None
        except Exception as exc:
            tb, eb = None, type(exc)
        assert ea == eb, (data, ea, eb)
        if ea is not None:
            return
        assert ta == tb, (data, ta, tb)
        assert a.pos == b.pos, (data, ta, a.pos, b.pos)
        if ta is None:
            return


# ---------------------------------------------------------------------------
# r6: AES (FIPS-197) + AES-256 revision 6 key-derivation properties
# ---------------------------------------------------------------------------
def test_aes_fips197_vectors():
    """The computed-table AES must reproduce the published FIPS-197
    Appendix C known-answer vectors for 128/192/256-bit keys."""
    from pdf_extractor_scripts_spark.sources.pdfcrypt import (
        _aes_decrypt_block,
        _aes_encrypt_block,
        _expand_key,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for klen, ct_hex in (
        (16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (32, "8ea2b7ca516745bfeafc49904b496089"),
    ):
        rks, nr = _expand_key(bytes(range(klen)))
        ct = _aes_encrypt_block(rks, nr, pt)
        assert ct.hex() == ct_hex, klen
        assert _aes_decrypt_block(rks, nr, ct) == pt, klen


@given(st.binary(min_size=0, max_size=300),
       st.sampled_from([16, 32]), st.integers(0, 2**31))
@settings(max_examples=40, deadline=None)
def test_pdf_aes_payload_roundtrip(data, klen, seed):
    """IV + CBC + PKCS#7 payloads round-trip for any data length, both key
    sizes (AESV2 object keys are 16 bytes, AESV3 file keys 32)."""
    import hashlib

    from pdf_extractor_scripts_spark.sources.pdfcrypt import (
        pdf_aes_decrypt,
        pdf_aes_encrypt,
    )

    key = hashlib.sha256(b"k%d" % seed).digest()[:klen]
    iv = hashlib.md5(b"iv%d" % seed).digest()
    assert pdf_aes_decrypt(key, pdf_aes_encrypt(key, iv, data)) == data


@given(st.binary(min_size=0, max_size=24), st.sampled_from([5, 6]))
@settings(max_examples=10, deadline=None)
def test_r6_empty_user_password_verifies_and_owner_path_works(owner_pw, r):
    """AES-256 twin of the RC4 property: empty user password always
    unwraps the file key via /U//UE; a nonempty user password rejects the
    empty probe; and an empty OWNER password recovers the key through the
    /O//OE path even when the user password is set."""
    from pdf_extractor_scripts_spark.sources.pdfcrypt import (
        make_r6_entries,
        verify_r6_password,
    )

    fk = bytes(range(32))
    u, ue, o, oe, _ = make_r6_entries(b"", owner_pw, fk, r=r)
    assert verify_r6_password(b"", u, o, ue, oe, r) == fk

    u2, ue2, o2, oe2, _ = make_r6_entries(b"secret", b"", fk, r=r)
    # user path fails for the empty probe, owner path (empty) recovers
    assert verify_r6_password(b"", u2, o2, ue2, oe2, r) == fk
    u3, ue3, o3, oe3, _ = make_r6_entries(b"secret", b"owner", fk, r=r)
    assert verify_r6_password(b"", u3, o3, ue3, oe3, r) is None
