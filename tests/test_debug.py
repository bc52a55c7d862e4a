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


def test_lazy_intermediate_trips_inside_jit():
    """Per-op bracket (reference debug.hpp:33-37 asserts inside every modular
    functor): an out-of-range intermediate inside a jitted program trips the
    modops-level check, not just the Poly operator boundary."""
    import jax
    from nfllib_tpu.ops import modops

    ring = nfl.ring_from_modulus("u32", 64, 60)
    ctx = ring.context()
    p = jnp.asarray(ctx.p_col)

    @jax.jit
    def f(x):
        lazy = x + x                  # raw sum, lands in [0, 2p): not strict
        return modops.addmod(lazy, x, p)

    x = jnp.full(ring.shape, jnp.uint32(int(ring.moduli[0]) - 1))
    with pytest.raises(Exception, match="STRICTMOD"):
        np.asarray(f(x))


def test_eager_modops_check():
    from nfllib_tpu.ops import modops
    ring = nfl.ring_from_modulus("u32", 64, 60)
    p = jnp.asarray(ring.context().p_col)
    bad = jnp.full(ring.shape, jnp.uint32(0xFFFFFFFF))
    good = jnp.zeros(ring.shape, jnp.uint32)
    with pytest.raises(AssertionError, match="STRICTMOD"):
        modops.submod(good, bad, p)
    with pytest.raises(AssertionError, match="STRICTMOD"):
        modops.mulmod(bad, good, p, jnp.asarray(ring.context().pn_col))


def test_strict_toggle_retraces_cached_programs():
    """Flipping strictmod must not reuse programs traced under the other
    setting (the jit caches are keyed on the flag)."""
    ring = nfl.ring_from_modulus("u32", 64, 60)
    bad = nfl.Poly(jnp.full(ring.shape, jnp.uint32(0xFFFFFFFF)), ring)
    debug.set_strictmod(False)
    _ = (bad + bad).poly()            # traces the non-strict chain program
    debug.set_strictmod(True)
    with pytest.raises(Exception, match="STRICTMOD"):
        _ = (bad + bad).poly()


def test_flag_toggles():
    assert debug.strictmod_enabled()
    debug.set_strictmod(False)
    assert not debug.strictmod_enabled()
    ring = nfl.ring_from_modulus("u32", 64, 60)
    bad = nfl.Poly(jnp.full(ring.shape, jnp.uint32(0xFFFFFFFF)), ring)
    _ = bad + bad               # no check when disabled
