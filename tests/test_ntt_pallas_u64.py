"""u64 (62-bit) Pallas NTT kernel vs the jnp stage loop — backend equivalence.

The paired-u32 double-word kernel (ops/ntt_pallas_u64.py) must be bit-exact
against the jnp path, which is itself golden-anchored against the reference's
compiled u64 templates (tests/test_golden_interop.py).  The reference runs two
of its five CI configs on the u64 tier (reference tests/CMakeLists.txt:7).
"""
import numpy as np
import pytest

import nfllib_tpu as nfl
from nfllib_tpu.ops import ntt as ntt_jnp
from nfllib_tpu.ops import ntt_pallas_u64

from conftest import rand_residues


CONFIGS = [
    (256, 124, "u64"),
    (1024, 124, "u64"),
]
SLOW_CONFIGS = [
    (8192, 124, "u64"),
    (32768, 124, "u64"),
]


def test_pair_arithmetic_oracle(rng):
    """Double-word helpers vs python-int arithmetic on random u64 operands."""
    import jax.numpy as jnp
    a = rng.integers(0, 1 << 64, size=64, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=64, dtype=np.uint64)

    def pair(t):
        return (jnp.asarray((t >> np.uint64(32)).astype(np.uint32)),
                jnp.asarray(t.astype(np.uint32)))

    def join(p):
        return (np.asarray(p[0]).astype(np.uint64) << np.uint64(32)) | \
            np.asarray(p[1]).astype(np.uint64)

    pa, pb = pair(a), pair(b)
    ai = a.astype(object)
    bi = b.astype(object)
    mask = (1 << 64) - 1
    np.testing.assert_array_equal(
        join(ntt_pallas_u64.p_add(pa, pb)),
        np.array([(x + y) & mask for x, y in zip(ai, bi)], dtype=np.uint64))
    np.testing.assert_array_equal(
        join(ntt_pallas_u64.p_sub(pa, pb)),
        np.array([(x - y) & mask for x, y in zip(ai, bi)], dtype=np.uint64))
    np.testing.assert_array_equal(
        join(ntt_pallas_u64.p_mullo(pa, pb)),
        np.array([(x * y) & mask for x, y in zip(ai, bi)], dtype=np.uint64))
    np.testing.assert_array_equal(
        join(ntt_pallas_u64.p_mulhi(pa, pb)),
        np.array([(x * y) >> 64 for x, y in zip(ai, bi)], dtype=np.uint64))
    np.testing.assert_array_equal(
        np.asarray(ntt_pallas_u64.p_ge(pa, pb)), a >= b)


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_ntt_pow_phi_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    got = np.asarray(ntt_pallas_u64.ntt_fwd(x, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_plain_ntt_and_inverse_tables_match_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng)
    for inv in (False, True):
        want = np.asarray(ntt_jnp.ntt(x, ctx, inverse_tables=inv))
        got = np.asarray(ntt_pallas_u64.ntt_fwd(x, ctx, inverse_tables=inv,
                                                twist=False, interpret=True))
        np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_intt_matches_jnp(degree, agg, limb, rng):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng, batch=(2,))
    f = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    want = np.asarray(ntt_jnp.invntt_pow_invphi(f, ctx))
    got = np.asarray(ntt_pallas_u64.intt_bwd(f, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)
    np.testing.assert_array_equal(want, x)   # roundtrip
    w2 = np.asarray(ntt_jnp.inv_ntt(f, ctx))
    g2 = np.asarray(ntt_pallas_u64.intt_bwd(f, ctx, untwist=False,
                                            interpret=True))
    np.testing.assert_array_equal(w2, g2)


@pytest.mark.slow
@pytest.mark.parametrize("degree,agg,limb", SLOW_CONFIGS)
def test_reference_configs_roundtrip(degree, agg, limb, rng):
    """The two reference CI u64 configs (8192,124) and (32768,124) through the
    kernel, forward + inverse, vs jnp (reference tests/CMakeLists.txt:7)."""
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    x = rand_residues(ring, rng)
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    got = np.asarray(ntt_pallas_u64.ntt_fwd(x, ctx, interpret=True))
    np.testing.assert_array_equal(want, got)
    back = np.asarray(ntt_pallas_u64.intt_bwd(got, ctx, interpret=True))
    np.testing.assert_array_equal(back, x)
