"""Fused int8 MXU NTT for the u64/62-bit tier vs the jnp stage loop
(bit-exactness; interpret mode on CPU)."""
import numpy as np
import pytest

import nfllib_tpu as nfl
from nfllib_tpu.ops import ntt as ntt_jnp
from nfllib_tpu.ops import ntt_mxu_u64

from conftest import rand_residues

CONFIGS = [(64, 124, "u64"), (256, 62, "u64"),
           (512, 124, "u64"), (8192, 124, "u64")]
SLOW = [(32768, 124, "u64")]


def test_supports():
    assert ntt_mxu_u64.supports_fused(nfl.Ring("u64", 8192, 2))
    assert ntt_mxu_u64.supports_fused(nfl.Ring("u64", 8, 1))
    assert not ntt_mxu_u64.supports_fused(nfl.Ring("u64", 1 << 17, 1))
    assert not ntt_mxu_u64.supports_fused(nfl.Ring("u32", 8192, 2))


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_fused64_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    got = np.asarray(ntt_mxu_u64.ntt_pow_phi_fused(x, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_fused64_inverse_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    f = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    want = np.asarray(ntt_jnp.invntt_pow_invphi(f, ctx))
    got = np.asarray(ntt_mxu_u64.invntt_pow_invphi_fused(
        f, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)
    np.testing.assert_array_equal(want, x)


@pytest.mark.slow
@pytest.mark.parametrize("degree,agg,limb", SLOW)
def test_fused64_large_roundtrip(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng)
    f = np.asarray(ntt_mxu_u64.ntt_pow_phi_fused(x, ctx, interpret=True))
    np.testing.assert_array_equal(f, np.asarray(ntt_jnp.ntt_pow_phi(x, ctx)))
    back = np.asarray(ntt_mxu_u64.invntt_pow_invphi_fused(
        f, ctx, interpret=True))
    np.testing.assert_array_equal(back, x)
