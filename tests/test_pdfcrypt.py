"""PDF standard security handler: published test vectors, wire-pinned key
derivation, and end-to-end extraction of properly encrypted fixtures
(round-4 item: encrypted PDFs extract instead of refusing; reference
delegates this to pypdf — ``vexor/services/content_extract_service.py:771``)."""

from __future__ import annotations

import numpy as np
import pytest

from vexor_ray.stages.pdfcrypt import (
    REFUSED,
    PdfCrypto,
    Ref,
    _ecb,
    _expand_key,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    cbc_decrypt_nopad,
    cbc_encrypt_nopad,
    compute_file_key,
    compute_o_value,
    compute_u_value,
    examine,
    hash_2b,
    parse_value,
    rc4,
)
from vexor_ray.stages.pdftext import (
    extract_pdf_text,
    make_encrypted_pdf,
    make_simple_pdf,
)

LINES = ["Hello encrypted world", "second line of text"]


# ---------------------------------------------------------------------------
# primitives against published vectors
# ---------------------------------------------------------------------------


def test_aes128_fips197_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    want = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    rk = _expand_key(key)
    ct = _ecb(np.frombuffer(pt, np.uint8).reshape(1, 16), rk, True)[0].tobytes()
    assert ct == want
    back = _ecb(np.frombuffer(ct, np.uint8).reshape(1, 16), rk, False)[0]
    assert back.tobytes() == pt


def test_aes256_fips197_vector():
    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    want = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    rk = _expand_key(key)
    assert rk.shape == (15, 16)
    ct = _ecb(np.frombuffer(pt, np.uint8).reshape(1, 16), rk, True)[0].tobytes()
    assert ct == want
    back = _ecb(np.frombuffer(ct, np.uint8).reshape(1, 16), rk, False)[0]
    assert back.tobytes() == pt


def test_cbc_nopad_scalar_vs_vectorized():
    """The scalar encrypt path (Algorithm 2.B's chained CBC) must invert
    against the numpy decrypt path, for both AES-128 and AES-256."""
    for klen in (16, 32):
        key = bytes((7 * i + klen) & 0xFF for i in range(klen))
        iv = bytes((3 * i + 1) & 0xFF for i in range(16))
        data = bytes((11 * i) & 0xFF for i in range(16 * 9))
        enc = cbc_encrypt_nopad(key, iv, data)
        assert len(enc) == len(data)  # no padding, no IV prefix
        assert cbc_decrypt_nopad(key, iv, enc) == data


def test_hash_2b_shape_and_sensitivity():
    h = hash_2b(b"", b"saltsalt")
    assert len(h) == 32 and h == hash_2b(b"", b"saltsalt")
    assert h != hash_2b(b"", b"SALTSALT")
    assert h != hash_2b(b"x", b"saltsalt")


def test_aes_cbc_roundtrip_and_padding():
    key = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 300):
        data = bytes((7 * i + 3) & 0xFF for i in range(n))
        enc = aes_cbc_encrypt(key, bytes(16), data)
        assert len(enc) % 16 == 0 and len(enc) >= 32
        assert aes_cbc_decrypt(key, enc) == data
    assert aes_cbc_decrypt(key, b"short") == b""  # malformed → empty, no crash


def test_rc4_vectors():
    # classic published RC4 test vectors
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert rc4(b"Secret", b"Attack at dawn").hex() == "45a01f645fc35b383552544b9bf5"
    # involution
    assert rc4(b"Key", rc4(b"Key", b"anything at all")) == b"anything at all"


def test_key_derivation_wire_pins():
    """Algorithm 2/3/4/5 outputs pinned (regression stability)."""
    id0 = bytes(range(16))
    o = compute_o_value(b"owner", b"", 3, 16)
    assert o.hex() == (
        "566fa873ee33c797cd3b904fdadf814afa34df9a38f6ed41b984e2c6da2aa6f5"
    )
    k = compute_file_key(b"", o, -3904, id0, 3, 16)
    assert k.hex() == "b12bd8e5ca6152ae54c1256f8eb217d7"
    assert compute_u_value(k, id0, 3)[:16].hex() == (
        "6a377f14504be9f1aba99e13933760ac"
    )
    o2 = compute_o_value(b"owner", b"", 2, 5)
    k2 = compute_file_key(b"", o2, -3904, id0, 2, 5)
    assert k2.hex() == "9402ecdb98"
    assert compute_u_value(k2, id0, 2).hex() == (
        "0535ff2ff4a1427af498e09e89c6c3b14139d497977277f0f05fcf04febf5d0d"
    )


# ---------------------------------------------------------------------------
# object parser subset
# ---------------------------------------------------------------------------


def test_parse_value_subset():
    v, _ = parse_value(b"<< /V 4 /O <414243> /P -3904 /Enc 5 0 R "
                       b"/CF << /StdCF << /CFM /AESV2 >> >> "
                       b"/ID [(ab) <4344>] /M true >>", 0)
    assert v["V"] == 4 and v["P"] == -3904
    assert v["O"] == b"ABC" and v["Enc"] == Ref(5, 0)
    assert v["CF"]["StdCF"]["CFM"] == "AESV2"
    assert v["ID"] == [b"ab", b"CD"] and v["M"] is True
    # literal string escapes route through the pdftext unescaper
    s, _ = parse_value(rb"(a\(b\) \134 \n)", 0)
    assert s == b"a(b) \\ \n"


# ---------------------------------------------------------------------------
# end-to-end extraction
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "method", ["rc4-40", "rc4-128", "aes-128", "aes-256", "aes-256-r5"]
)
@pytest.mark.parametrize("compress", [True, False])
def test_encrypted_pdf_extracts_like_plain(method, compress):
    want = extract_pdf_text(make_simple_pdf(LINES, compress=compress))
    got = extract_pdf_text(
        make_encrypted_pdf(LINES, method=method, compress=compress)
    )
    assert got == want and want


@pytest.mark.parametrize("method", ["rc4-128", "aes-256"])
def test_password_protected_refuses_cleanly(method):
    doc = make_encrypted_pdf(LINES, method=method, user_password=b"secret")
    assert examine(doc) is REFUSED
    assert extract_pdf_text(doc) is None


def test_unsupported_handler_refuses():
    doc = make_encrypted_pdf(LINES, method="aes-128")
    # rewrite the crypt filter to something we don't implement
    doc = doc.replace(b"/CFM /AESV2", b"/CFM /AESV3")
    assert examine(doc) is REFUSED
    assert extract_pdf_text(doc) is None


def test_encrypt_bytes_in_content_not_refused():
    """ADVICE regression: an UNENCRYPTED document whose content contains
    the bytes ``/Encrypt 5 0 R`` must extract normally — the probe parses
    only trailer / xref-stream dictionaries."""
    doc = make_simple_pdf(["see /Encrypt 5 0 R marker in prose"], compress=False)
    assert examine(doc) is None
    assert "marker in prose" in extract_pdf_text(doc)


def test_examine_unencrypted_and_per_object_keys():
    assert examine(make_simple_pdf(LINES)) is None
    crypto = examine(make_encrypted_pdf(LINES, method="aes-128"))
    assert isinstance(crypto, PdfCrypto) and crypto.aes_streams
    # per-object keys differ per (num, gen) — Algorithm 1
    assert crypto.object_key(4, 0, True) != crypto.object_key(5, 0, True)
    assert len(crypto.object_key(4, 0, True)) == 16
