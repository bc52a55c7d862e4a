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
    # the fused kernel covers rectangular decompositions, small degrees and
    # the u16 tier (every reference config point, tests/CMakeLists.txt:2-7)
    for deg in (8, 1024, 4096, 8192, 16384, 32768):
        assert ntt_mxu.supports_fused(nfl.Ring("u32", deg, 2))
    for deg in (8, 128, 512):
        assert ntt_mxu.supports_fused(nfl.Ring("u16", deg, 1))
    assert not ntt_mxu.supports_fused(nfl.Ring("u64", 8192, 2))
    # u32: balanced 4 x 8-bit digits at every geometry; u16: 2 x 7-bit
    assert ntt_mxu._fused_geometry(32768) == (128, 256, 8, 4)
    assert ntt_mxu._fused_geometry(1024) == (32, 32, 8, 4)
    assert ntt_mxu._fused_geometry(128, "u16") == (8, 16, 7, 2)


@pytest.mark.parametrize("degree,agg,limb", [(4096, 60, "u32")])
def test_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    got = np.asarray(ntt_mxu.ntt_pow_phi_mxu(x, ctx))
    np.testing.assert_array_equal(want, got)


FUSED_CONFIGS = [
    (8, 60, "u32"),            # reference config point 1
    (64, 60, "u32"),
    (1024, 60, "u32"),         # reference config point 3
    (4096, 60, "u32"),
    (8192, 60, "u32"),
    (128, 14, "u16"),          # reference config point 2
    (256, 28, "u16"),          # two-channel u16
    (512, 14, "u16"),          # u16 max degree (contraction 32)
]

SLOW_FUSED = [(32768, 60, "u32")]   # 6-bit digit geometry (interpret: slow)


@pytest.mark.parametrize("degree,agg,limb", FUSED_CONFIGS)
def test_fused_kernel_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    got = np.asarray(ntt_mxu.ntt_pow_phi_fused(x, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", FUSED_CONFIGS)
def test_fused_inverse_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    f = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    want = np.asarray(ntt_jnp.invntt_pow_invphi(f, ctx))
    got = np.asarray(ntt_mxu.invntt_pow_invphi_fused(f, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)
    np.testing.assert_array_equal(want, x)


@pytest.mark.slow
@pytest.mark.parametrize("degree,agg,limb", SLOW_FUSED)
def test_fused_6bit_geometry_roundtrip(degree, agg, limb, rng):
    """The 6-bit digit branch (contraction > 128) was previously untested
    (round-1 advisor finding)."""
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng)
    f = np.asarray(ntt_mxu.ntt_pow_phi_fused(x, ctx, interpret=True))
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    np.testing.assert_array_equal(want, f)
    back = np.asarray(ntt_mxu.invntt_pow_invphi_fused(f, ctx, interpret=True))
    np.testing.assert_array_equal(back, x)


def test_recombine_pack_boundary_exact():
    """The carry-free Barrett pack in _recombine_groups must be exact at the
    extremes of the group-sum contract: G_a in [-2^25, 2^25] (the |G_a| bound
    of _fused_geometry), across moduli and all sign/magnitude corners."""
    import itertools
    import jax.numpy as jnp

    ring = nfl.Ring("u32", 1 << 14, 4)
    gmax = 1 << 25
    corners = np.array([-gmax, -gmax + 1, -1, 0, 1, gmax - 1, gmax],
                       dtype=np.int64)
    # all 4-tuples over a subsample of corners + random fill
    combos = list(itertools.product([-gmax, 0, gmax], repeat=4))
    rng = np.random.default_rng(7)
    rand = rng.integers(-gmax, gmax + 1, size=(256, 4))
    allg = np.concatenate([np.array(combos, dtype=np.int64), rand], axis=0)

    for cm in range(ring.nmoduli):
        p = int(ring.moduli[cm])
        m60 = (1 << 60) // p
        sh = lambda j, _m=m60: jnp.uint32(_m)
        groups = [jnp.asarray(allg[:, a].astype(np.int32)).reshape(-1, 1, 1)
                  for a in range(4)]
        out = np.asarray(ntt_mxu._recombine_groups(
            groups, jnp.uint32(p), sh, 8, 4, corr=None,
            strict=True)).reshape(-1)
        # oracle: (sum (G_a + BIAS) 2^(8a)) mod p
        for i in range(allg.shape[0]):
            v = sum((int(allg[i, a]) + ntt_mxu._BAL_BIAS) << (8 * a)
                    for a in range(4))
            assert int(out[i]) == v % p, (cm, i, allg[i])
