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


def test_kernel_boundary_bracket_catches_bad_input():
    """Strict mode must bracket the Pallas/MXU kernel dispatch too
    (reference sse.hpp:57-67 asserts in its SIMD paths): an out-of-range
    input on the fused-kernel path raises at the wrapper boundary."""
    import os
    import jax
    from nfllib_tpu.ops import ntt as ntt_mod
    from nfllib_tpu.ops import ntt_mxu

    ring = nfl.ring_from_modulus("u32", 256, 60)
    ctx = ring.context()
    prev = os.environ.get("NFL_TPU_NTT")
    os.environ["NFL_TPU_NTT"] = "mxu"     # force the fused-kernel dispatch
    try:
        assert ntt_mod._fused_mxu_module(ring) is ntt_mxu
        bad = jnp.full(ring.shape, jnp.uint32(0xFFFFFFFF))
        with pytest.raises(AssertionError, match="STRICTMOD"):
            ntt_mod.ntt_pow_phi(bad, ctx)
    finally:
        if prev is None:
            os.environ.pop("NFL_TPU_NTT", None)
        else:
            os.environ["NFL_TPU_NTT"] = prev


def test_kernel_strict_build_bit_identical():
    """The strict kernel build (in-kernel stage checks + poison epilogue)
    must produce bit-identical outputs to the normal build on valid data."""
    import os
    import numpy as np
    from nfllib_tpu.ops import ntt_mxu
    from nfllib_tpu.prng.salsa20 import Salsa20Stream

    ring = nfl.ring_from_modulus("u32", 256, 60)
    ctx = ring.context()
    s = Salsa20Stream(b"\x02" * 32)
    x = nfl.Poly.sample(ring, nfl.uniform(), s).data
    debug.set_strictmod(False)
    base_f = np.asarray(ntt_mxu.ntt_pow_phi_fused(x, ctx, interpret=True))
    base_i = np.asarray(
        ntt_mxu.invntt_pow_invphi_fused(base_f, ctx, interpret=True))
    debug.set_strictmod(True)
    strict_f = np.asarray(ntt_mxu.ntt_pow_phi_fused(x, ctx, interpret=True))
    strict_i = np.asarray(
        ntt_mxu.invntt_pow_invphi_fused(strict_f, ctx, interpret=True))
    np.testing.assert_array_equal(base_f, strict_f)
    np.testing.assert_array_equal(base_i, strict_i)
    np.testing.assert_array_equal(strict_i, np.asarray(x))


def test_kernel_strict_build_u64_bit_identical():
    import numpy as np
    from nfllib_tpu.ops import ntt_mxu_u64
    from nfllib_tpu.prng.salsa20 import Salsa20Stream

    ring = nfl.ring_from_modulus("u64", 64, 124)
    ctx = ring.context()
    s = Salsa20Stream(b"\x03" * 32)
    x = nfl.Poly.sample(ring, nfl.uniform(), s).data
    debug.set_strictmod(False)
    base = np.asarray(ntt_mxu_u64.ntt_pow_phi_fused(x, ctx, interpret=True))
    debug.set_strictmod(True)
    strict = np.asarray(ntt_mxu_u64.ntt_pow_phi_fused(x, ctx, interpret=True))
    np.testing.assert_array_equal(base, strict)
