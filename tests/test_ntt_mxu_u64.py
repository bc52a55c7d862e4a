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
    # round 3: degrees 2^17..2^20 run the split large path
    assert ntt_mxu_u64.supports_fused(nfl.Ring("u64", 1 << 17, 1))
    assert ntt_mxu_u64.supports_fused(nfl.Ring("u64", 1 << 20, 1))
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


def test_recombine64_pack_boundary_exact():
    """Carry-free Barrett pack exactness at the group-sum contract extremes
    (|G_a| <= 2^25 for the u64 tier's max contraction 256)."""
    import itertools
    import jax.numpy as jnp
    from nfllib_tpu.ops import ntt_mxu_u64 as M64
    from nfllib_tpu.ops.ntt_pallas_u64 import _split

    ring = nfl.Ring("u64", 8192, 3)
    gmax = 1 << 25
    combos = list(itertools.product([-gmax, 0, gmax], repeat=2))
    rng = np.random.default_rng(11)
    cases = []
    for lohalf, hihalf in combos:
        row = [lohalf] * 4 + [hihalf] * 4
        cases.append(row)
    cases = np.array(cases + rng.integers(
        -gmax, gmax + 1, size=(256, 8)).tolist(), dtype=np.int64)

    for cm in range(ring.nmoduli):
        p = int(ring.moduli[cm])
        mbar = (1 << 124) // p
        p_pair = tuple(jnp.uint32(v) for v in
                       ((p >> 32) & 0xFFFFFFFF, p & 0xFFFFFFFF))
        m_pair = tuple(jnp.uint32(v) for v in
                       ((mbar >> 32) & 0xFFFFFFFF, mbar & 0xFFFFFFFF))
        groups = [jnp.asarray(cases[:, a].astype(np.int32)).reshape(-1, 1, 1)
                  for a in range(8)]
        zero_corr = (jnp.uint32(0), jnp.uint32(0))
        hi, lo = M64._recombine64(groups, p_pair, m_pair, zero_corr,
                                  strict=True)
        out = (np.asarray(hi).astype(np.uint64) << 32) | np.asarray(
            lo).astype(np.uint64)
        out = out.reshape(-1)
        for i in range(cases.shape[0]):
            v = sum((int(cases[i, a]) + M64._BIAS) << (8 * a)
                    for a in range(8))
            assert int(out[i]) == v % p, (cm, i, cases[i])


def test_large_path_matches_jnp_small(rng):
    """The large-degree split path (_large_run64: two dft_mxu mod-matmul
    kernels + jnp pair-Shoup twiddle) is bit-identical to the jnp Harvey
    path.  Exercised at small degrees for speed; dispatch uses it only
    above 2^16 (supports_fused docstring)."""
    import os
    prev = os.environ.get("NFL_TPU_NTT")
    os.environ["NFL_TPU_NTT"] = "jnp"
    try:
        for deg in (1024, 4096):
            ring = nfl.Ring("u64", deg, 2)
            ctx = ring.context()
            x = rand_residues(ring, rng)
            want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
            got = np.asarray(ntt_mxu_u64._large_run64(x, ctx, False, True))
            np.testing.assert_array_equal(got, want)
            back = np.asarray(ntt_mxu_u64._large_run64(got, ctx, True, True))
            np.testing.assert_array_equal(back, np.asarray(x))
    finally:
        if prev is None:
            os.environ.pop("NFL_TPU_NTT", None)
        else:
            os.environ["NFL_TPU_NTT"] = prev


@pytest.mark.slow
def test_large_degree_dispatch_2pow17(rng):
    """Degrees > 2^16 dispatch through the split path; golden contract:
    bit-identical to the jnp path and exactly invertible."""
    ring = nfl.Ring("u64", 1 << 17, 1)
    assert ntt_mxu_u64.supports_fused(ring)
    ctx = ring.context()
    x = rand_residues(ring, rng)
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    got = np.asarray(ntt_mxu_u64.ntt_pow_phi_fused(x, ctx, interpret=True))
    np.testing.assert_array_equal(got, want)
    back = np.asarray(ntt_mxu_u64.invntt_pow_invphi_fused(
        got, ctx, interpret=True))
    np.testing.assert_array_equal(back, np.asarray(x))
