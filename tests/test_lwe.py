"""End-to-end LWE symmetric encrypt/decrypt (the reference's acceptance
workload, tests/nfllib_demo_main_op.cpp:260-331): decryptions of encryptions
of zero must sum to exactly zero."""
import pytest

from nfllib_tpu.apps import lwe
from conftest import make_ring


@pytest.mark.parametrize("degree,agg,limb", [
    (128, 14, "u16"),
    (512, 60, "u32"),
])
def test_lwe_zero_sum(degree, agg, limb):
    ring = make_ring(degree, agg, limb)
    assert lwe.run_zero_sum_check(ring, repetitions=5, key=b"\x11" * 32)


@pytest.mark.slow
@pytest.mark.parametrize("degree,agg,limb", [
    (1024, 60, "u32"),
    (512, 124, "u64"),
])
def test_lwe_zero_sum_slow(degree, agg, limb):
    ring = make_ring(degree, agg, limb)
    assert lwe.run_zero_sum_check(ring, repetitions=3, key=b"\x22" * 32)


def test_encrypt_on_device_decrypts_to_zero():
    """Fully on-device pipeline (device Salsa20 + fixed-consumption Gaussian
    fused into the encrypt graph): decryptions must still be exact zeros."""
    import jax.numpy as jnp
    ring = make_ring(256, 60, "u32")
    stream = lwe.Salsa20Stream(b"\x31" * 32)
    g = lwe.make_gaussian_prng()
    keys = lwe.keygen(ring, stream, g)
    total = jnp.zeros(ring.shape, dtype=jnp.int64)
    for i in range(3):
        resa, resb = lwe.encrypt_on_device(keys, ring, b"\x32" * 32,
                                           100 + 3 * i, g)
        total = total + lwe.decrypt(keys, ring, resa, resb).astype(jnp.int64)
    assert bool(jnp.all(total == 0))


def test_encrypt_on_device_exact_matches_host():
    """exact=True on-device encryption is BIT-IDENTICAL to host encrypt()
    for a stream at the same (key, nonce): the stream-exact device Gaussian
    chains nonces in-graph exactly as the host walk's fill() calls do."""
    import numpy as np
    from nfllib_tpu.prng.salsa20 import Salsa20Stream

    ring = make_ring(256, 60, "u32")
    g = lwe.make_gaussian_prng(samples=256)
    key = b"\x31" * 32
    st = Salsa20Stream(key)
    keys = lwe.keygen(ring, st, g)
    enc_nonce = st.nonce
    ra_h, rb_h = lwe.encrypt(keys, ring, st, g)
    ra_d, rb_d = lwe.encrypt_on_device(keys, ring, key, enc_nonce, g,
                                       exact=True)
    np.testing.assert_array_equal(np.asarray(ra_h.data),
                                  np.asarray(ra_d.data))
    np.testing.assert_array_equal(np.asarray(rb_h.data),
                                  np.asarray(rb_d.data))
