"""Fused LWE chain kernels vs the jnp graphs (bit-exact differential).

The Pallas kernels run the whole encrypt chain (twist+NTT of u/e1/e2 plus
both muladd combines, reference tests/nfllib_demo_main_op.cpp:26-45) and the
whole decrypt head (resb - resa*s then untwisted INTT, lines 48-58) in one
VMEM residency.  Interpret mode on CPU; results must equal the jnp graphs
bit for bit.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

import nfllib_tpu as nfl
from nfllib_tpu.apps import lwe
from nfllib_tpu.ops import ntt_pallas
from nfllib_tpu.prng.salsa20 import Salsa20Stream

from conftest import rand_residues


CONFIGS = [("u32", 512, 60), ("u32", 1024, 90), ("u16", 256, 14),
           ("u64", 512, 124)]


def _chain_module(ring):
    if ring.limb == "u64":
        from nfllib_tpu.ops import ntt_pallas_u64
        return ntt_pallas_u64
    return ntt_pallas


def _setup(limb, degree, agg):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    stream = Salsa20Stream(b"\x05" * 32)
    g = lwe.make_gaussian_prng()
    keys = lwe.keygen(ring, stream, g)
    return ring, stream, g, keys


@pytest.mark.parametrize("limb,degree,agg", CONFIGS)
def test_encrypt_fused_matches_jnp(limb, degree, agg):
    ring, stream, g, keys = _setup(limb, degree, agg)
    ctx = ring.context()
    u = nfl.Poly.sample(ring, nfl.gaussian(g), stream)
    e1 = nfl.Poly.sample(ring, nfl.gaussian(g, 2), stream)
    e2 = nfl.Poly.sample(ring, nfl.gaussian(g, 2), stream)
    ra, rb = lwe._encrypt_graph(ctx, keys.pka.data, keys.pkb.data,
                                u.data, e1.data, e2.data)
    fa, fb = _chain_module(ring).lwe_encrypt_fused(
        u.data, e1.data, e2.data, keys.pka.data, keys.pkb.data, ctx,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(ra))
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(rb))


@pytest.mark.parametrize("limb,degree,agg", CONFIGS)
def test_decrypt_fused_matches_jnp(limb, degree, agg):
    ring, stream, g, keys = _setup(limb, degree, agg)
    ctx = ring.context()
    u = nfl.Poly.sample(ring, nfl.gaussian(g), stream)
    e1 = nfl.Poly.sample(ring, nfl.gaussian(g, 2), stream)
    e2 = nfl.Poly.sample(ring, nfl.gaussian(g, 2), stream)
    ra, rb = lwe._encrypt_graph(ctx, keys.pka.data, keys.pkb.data,
                                u.data, e1.data, e2.data)
    # jnp head: sub + mulmod + invntt (without the bit extraction)
    from nfllib_tpu.ops import modops, ntt
    p_col = jnp.asarray(ctx.p_col)
    pn_col = jnp.asarray(ctx.pn_col)
    want = modops.submod(rb, modops.mulmod(ra, keys.s.data, p_col, pn_col),
                         p_col)
    want = ntt.invntt_pow_invphi(want, ctx)
    got = _chain_module(ring).lwe_decrypt_fused(
        ra, rb, keys.s.data, keys.sprime.data, ctx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_first_use_inside_jit_does_not_leak(monkeypatch):
    """First construction of a fused-chain kernel INSIDE an outer jit trace
    must not cache traced constants (regression: the u64 builder hoisted
    jnp.asarray(table) into its lru-cached scope; a jitted first call left
    tracers in the cache and the next call raised UnexpectedTracerError)."""
    import jax
    from nfllib_tpu.ops import ntt_pallas_u64

    ring = nfl.ring_from_modulus("u64", 256, 124)
    ctx = ring.context()
    stream = Salsa20Stream(b"\x06" * 32)
    g = lwe.make_gaussian_prng()
    keys = lwe.keygen(ring, stream, g)
    u = nfl.Poly.sample(ring, nfl.gaussian(g), stream)
    e1 = nfl.Poly.sample(ring, nfl.gaussian(g, 2), stream)
    e2 = nfl.Poly.sample(ring, nfl.gaussian(g, 2), stream)

    ntt_pallas_u64._build_lwe.cache_clear()
    jitted = jax.jit(lambda uu: ntt_pallas_u64.lwe_encrypt_fused(
        uu, e1.data, e2.data, keys.pka.data, keys.pkb.data, ctx,
        interpret=True)[0])
    first = np.asarray(jitted(u.data))       # builds the kernel under trace
    second = np.asarray(ntt_pallas_u64.lwe_encrypt_fused(
        u.data, e1.data, e2.data, keys.pka.data, keys.pkb.data, ctx,
        interpret=True)[0])                  # must not see stale tracers
    np.testing.assert_array_equal(first, second)


def test_fused_chain_batched(rng):
    """Leading batch axes flow through both fused kernels."""
    ring, stream, g, keys = _setup("u32", 512, 60)
    ctx = ring.context()
    u = rand_residues(ring, rng, batch=(3,))
    e1 = rand_residues(ring, rng, batch=(3,))
    e2 = rand_residues(ring, rng, batch=(3,))
    ra, rb = lwe._encrypt_graph(ctx, keys.pka.data, keys.pkb.data,
                                u, e1, e2)
    fa, fb = ntt_pallas.lwe_encrypt_fused(
        u, e1, e2, keys.pka.data, keys.pkb.data, ctx, interpret=True)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(ra))
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(rb))
    got = ntt_pallas.lwe_decrypt_fused(
        fa, fb, keys.s.data, keys.sprime.data, ctx, interpret=True)
    assert got.shape == (3,) + ring.shape


def test_zero_sum_check_through_fused_path(monkeypatch):
    """The reference's correctness gate holds end-to-end when the fused
    kernels are forced (NFL_TPU_NTT=pallas routes _encrypt_graph and
    _decrypt_graph through them, interpret mode on CPU)."""
    monkeypatch.setenv("NFL_TPU_NTT", "pallas")
    lwe._jitted_graphs.cache_clear()
    ring = nfl.ring_from_modulus("u32", 512, 60)
    try:
        assert lwe.run_zero_sum_check(ring, repetitions=3, key=b"\x0b" * 32)
    finally:
        lwe._jitted_graphs.cache_clear()
