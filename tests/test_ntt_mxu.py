"""MXU matmul-NTT backend vs the jnp stage loop (bit-exactness)."""
import numpy as np
import pytest

import nfllib_tpu as nfl
from nfllib_tpu.ops import ntt as ntt_jnp
from nfllib_tpu.ops import ntt_mxu

from conftest import rand_residues


def test_supports():
    assert ntt_mxu.supports(nfl.Ring("u32", 4096, 2))
    assert ntt_mxu.supports(nfl.Ring("u32", 16384, 3))
    assert not ntt_mxu.supports(nfl.Ring("u32", 8192, 2))   # odd log2
    assert not ntt_mxu.supports(nfl.Ring("u16", 512, 1))    # not u32
    assert not ntt_mxu.supports(nfl.Ring("u64", 4096, 1))
    # the fused kernel covers rectangular decompositions too
    for deg in (4096, 8192, 16384, 32768):
        assert ntt_mxu.supports_fused(nfl.Ring("u32", deg, 2))
    assert not ntt_mxu.supports_fused(nfl.Ring("u32", 2048, 2))
    assert ntt_mxu._fused_geometry(32768) == (128, 256, 6)


@pytest.mark.parametrize("degree,agg,limb", [(4096, 60, "u32")])
def test_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    got = np.asarray(ntt_mxu.ntt_pow_phi_mxu(x, ctx))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", [(4096, 60, "u32"),
                                             (8192, 60, "u32")])
def test_fused_kernel_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    got = np.asarray(ntt_mxu.ntt_pow_phi_fused(x, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", [(4096, 60, "u32")])
def test_fused_inverse_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    f = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    want = np.asarray(ntt_jnp.invntt_pow_invphi(f, ctx))
    got = np.asarray(ntt_mxu.invntt_pow_invphi_fused(f, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)
    np.testing.assert_array_equal(want, x)
