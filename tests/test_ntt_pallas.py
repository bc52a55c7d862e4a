"""Pallas NTT kernel vs the jnp stage loop — backend equivalence.

The TPU-native analog of the reference's serial-vs-SIMD engine equivalence
testing (reference .travis.yml:16-25 runs the same differential matrix with
NFL_OPTIMIZED ON/OFF).  On CPU the kernel runs in interpreter mode; the
compiled TPU path is exercised by bench.py and the driver's compile check.
"""
import numpy as np
import pytest

import nfllib_tpu as nfl
from nfllib_tpu.ops import ntt as ntt_jnp
from nfllib_tpu.ops import ntt_pallas

from conftest import rand_residues


CONFIGS = [
    (256, 60, "u32"),
    (512, 14, "u16"),
    (512, 90, "u32"),
]


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_ntt_pow_phi_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    got = np.asarray(ntt_pallas.ntt_fwd(x, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", CONFIGS[:2])
def test_plain_ntt_and_inverse_tables_match_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng)
    for inv in (False, True):
        want = np.asarray(ntt_jnp.ntt(x, ctx, inverse_tables=inv))
        got = np.asarray(ntt_pallas.ntt_fwd(x, ctx, inverse_tables=inv,
                                            twist=False, interpret=True))
        np.testing.assert_array_equal(want, got)


def test_odd_batch_sizes(rng):
    ring = nfl.ring_from_modulus("u32", 256, 60)
    ctx = ring.context()
    for batch in [(), (3,), (2, 5)]:
        x = rand_residues(ring, rng, batch=batch)
        want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
        got = np.asarray(ntt_pallas.ntt_fwd(x, ctx, interpret=True))
        np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_intt_matches_jnp(degree, agg, limb, rng):
    """The permutation-free stage-inversion INTT kernel must equal the jnp
    bitrev->forward->bitrev->untwist path bit-for-bit."""
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    f = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    want = np.asarray(ntt_jnp.invntt_pow_invphi(f, ctx))
    got = np.asarray(ntt_pallas.intt_bwd(f, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)
    np.testing.assert_array_equal(want, x)   # roundtrip
    # raw inverse (no untwist) too
    w2 = np.asarray(ntt_jnp.inv_ntt(f, ctx))
    g2 = np.asarray(ntt_pallas.intt_bwd(f, ctx, untwist=False,
                                        interpret=True))
    np.testing.assert_array_equal(w2, g2)
