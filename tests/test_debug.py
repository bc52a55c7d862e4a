"""Strict-mod assertion mode (reference CHECK_STRICTMOD, debug.hpp:33-37)."""
import numpy as np
import pytest

import jax.numpy as jnp

import nfllib_tpu as nfl
from nfllib_tpu import debug


@pytest.fixture(autouse=True)
def _strict():
    debug.set_strictmod(True)
    yield
    debug.set_strictmod(False)


def test_out_of_range_operand_raises():
    ring = nfl.ring_from_modulus("u32", 64, 60)
    good = nfl.Poly.zeros(ring)
    bad = nfl.Poly(jnp.full(ring.shape, jnp.uint32(0xFFFFFFFF)), ring)
    with pytest.raises(AssertionError, match="STRICTMOD"):
        _ = bad + good


def test_in_range_passes():
    ring = nfl.ring_from_modulus("u32", 64, 60)
    s = None
    from nfllib_tpu.prng.salsa20 import Salsa20Stream
    s = Salsa20Stream(b"\x01" * 32)
    a = nfl.Poly.sample(ring, nfl.uniform(), s)
    b = nfl.Poly.sample(ring, nfl.uniform(), s)
    _ = (a + b).ntt_pow_phi()   # must not raise


def test_flag_toggles():
    assert debug.strictmod_enabled()
    debug.set_strictmod(False)
    assert not debug.strictmod_enabled()
    ring = nfl.ring_from_modulus("u32", 64, 60)
    bad = nfl.Poly(jnp.full(ring.shape, jnp.uint32(0xFFFFFFFF)), ring)
    _ = bad + bad               # no check when disabled
