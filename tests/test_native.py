"""Native C++ tier (csrc/nfl_native.cpp) vs the numpy tier and the golden
keystream dumped from the reference's x86-64 assembly."""
import os

import numpy as np
import pytest

from nfllib_tpu import native
from nfllib_tpu.prng import salsa20

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "golden",
                      "salsa20_golden.bin")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ compiler for the native tier")


def test_stream_matches_reference_golden():
    """Four segments dumped from the reference's qhasm assembly
    (tools/golden/salsa20_dump.c): (key, nonce, length) cases below."""
    gold = open(GOLDEN, "rb").read()
    cases = [
        (bytes(range(32)), 0, 1024),
        (bytes(range(32)), 1, 1024),
        (b"\xAA" * 32, 0x0123456789ABCDEF, 777),
        (b"\x00" * 32, 0, 64),
    ]
    off = 0
    for key, nonce, length in cases:
        seg = gold[off:off + length]
        got = native.salsa20_stream(length, nonce.to_bytes(8, "little"), key)
        assert got == seg, f"mismatch for case {(nonce, length)}"
        off += length
    assert off == len(gold)


def test_stream_matches_numpy_tier():
    key = b"\xAB" * 32
    for nonce in (0, 1, 2**40):
        n8 = nonce.to_bytes(8, "little")
        for nbytes in (1, 63, 64, 65, 1000):
            assert (native.salsa20_stream(nbytes, n8, key)
                    == salsa20.crypto_stream(nbytes, n8, key))


def test_fastrandombytes_state_progression():
    key = b"\x11" * 32
    state = native.make_state(key, 0)
    a = native.fastrandombytes(state, 100)
    b = native.fastrandombytes(state, 100)
    assert native.state_nonce(state) == 2
    s = salsa20.Salsa20Stream(key)
    # Salsa20Stream may itself be backed by the native tier; both must agree
    assert s.randombytes(100) == a
    assert s.randombytes(100) == b


def test_native_uniform_matches_python_sampler():
    import nfllib_tpu as nfl
    from nfllib_tpu.prng.sampling import sample_uniform

    for limb, n, agg in [("u16", 128, 14), ("u32", 256, 60),
                         ("u64", 64, 124)]:
        ring = nfl.ring_from_modulus(limb, n, agg)
        want = sample_uniform(ring, salsa20.Salsa20Stream(b"\x42" * 32))
        state = native.make_state(b"\x42" * 32, 0)
        got = native.uniform(state, np.array(ring.moduli, dtype=ring.dtype),
                             ring.degree, ring.modulus_bits)
        np.testing.assert_array_equal(want, got)
        assert native.state_nonce(state) == 1


def test_native_crt_matches_python():
    import nfllib_tpu as nfl
    from nfllib_tpu import crt
    from nfllib_tpu.prng.salsa20 import Salsa20Stream

    for limb, n, agg in [("u16", 64, 14), ("u32", 128, 90), ("u64", 32, 124)]:
        ring = nfl.ring_from_modulus(limb, n, agg)
        ctx = ring.context()
        p = nfl.Poly.sample(ring, nfl.uniform(), Salsa20Stream(b"\x21" * 32))
        arr = np.asarray(p.data)
        got = native.poly2mpz_native(arr, ctx)
        # python oracle (the pre-native implementation)
        prod = ctx.moduli_product
        lift = ctx.lifting_integers
        for i in range(ring.degree):
            want = sum(lift[cm] * int(arr[cm, i])
                       for cm in range(ring.nmoduli)) % prod
            assert got[i] == want, (limb, i)
        # mpz2poly roundtrip
        back = native.mpz2poly_native(got, ring)
        np.testing.assert_array_equal(back, arr)


def test_native_gaussian_walk_matches_python():
    """The C walk must replicate the python walk byte-for-byte: same values
    AND same stream consumption (nonce advancement)."""
    from nfllib_tpu.prng.gaussian import FastGaussianNoise
    fg = FastGaussianNoise(3.2, 100, 1 << 8)
    for key in (b"\x11" * 32, b"\xEE" * 32):
        s1 = salsa20.Salsa20Stream(key)
        s2 = salsa20.Salsa20Stream(key)
        a = fg.get_noise(s1, 10000)          # native path
        b = fg._get_noise_py(s2, 10000)      # python walk
        np.testing.assert_array_equal(a, b)
        assert s1.nonce == s2.nonce
