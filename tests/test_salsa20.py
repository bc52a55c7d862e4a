"""Salsa20 stream: byte-exactness vs the reference's qhasm assembly.

tools/golden/salsa20_golden.bin was produced by driving the reference's
nfl_crypto_stream_salsa20_amd64_xmm6 (reference
lib/prng/nfl_crypto_stream_salsa20_amd64_xmm6.s) with fixed keys/nonces
(tools/golden/salsa20_dump.c)."""
import os

import numpy as np
import pytest

from nfllib_tpu.prng.salsa20 import Salsa20Stream, crypto_stream

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "golden",
                      "salsa20_golden.bin")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN, "rb") as f:
        return f.read()


def test_keystream_matches_reference_asm(golden):
    k1 = bytes(range(32))
    n0 = (0).to_bytes(8, "little")
    n1 = (1).to_bytes(8, "little")
    assert crypto_stream(1024, n0, k1) == golden[:1024]
    assert crypto_stream(1024, n1, k1) == golden[1024:2048]
    assert crypto_stream(
        777, (0x0123456789ABCDEF).to_bytes(8, "little"),
        b"\xAA" * 32) == golden[2048:2825]
    # classic zero-key/zero-nonce Salsa20/20 vector
    assert crypto_stream(64, n0, b"\x00" * 32) == golden[2825:2889]


def test_stream_nonce_semantics(golden):
    """fastrandombytes bumps the 64-bit LE nonce once per call
    (reference lib/prng/fastrandombytes.cpp:28-33)."""
    k1 = bytes(range(32))
    s = Salsa20Stream(k1)
    assert s.randombytes(1024) == golden[:1024]
    assert s.randombytes(1024) == golden[1024:2048]
    # partial reads restart each call's keystream at block 0 of the new nonce
    s2 = Salsa20Stream(k1)
    first = s2.randombytes(10)
    assert first == golden[:10]
    assert s2.randombytes(10) == golden[1024:1034]


def test_device_tier_matches_host(golden):
    from nfllib_tpu.prng.salsa20 import device_stream_words
    w = np.asarray(device_stream_words(bytes(range(32)), 0, 16))
    assert w.astype("<u4").tobytes() == golden[:1024]


def test_random_words_layout():
    s = Salsa20Stream(bytes(range(32)))
    w = s.random_words(8, np.uint32)
    s2 = Salsa20Stream(bytes(range(32)))
    raw = s2.randombytes(32)
    assert w.tobytes() == raw
