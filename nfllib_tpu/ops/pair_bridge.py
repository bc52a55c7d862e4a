"""Pallas pair-native u64 elementwise Shoup multiply — a TESTED
CAPABILITY that production does NOT dispatch (tried and rejected; kept so
the result is reproducible and never re-derived).

HYPOTHESIS (round 5): between the two dft_mxu matmuls of the u64
large-degree split path sits one elementwise mulmod_shoup by the
[m, n1, n2] twiddle; STANDALONE it measures ~3.3x its HBM traffic floor
(257 us vs 78 us at 2^20 m=2, TWIDDLE_AB.json) because XLA's
emulated-u64 arithmetic materializes 32-bit pair intermediates, and the
adjacent Mosaic kernels natively speak uint32 hi/lo pairs — so a
pair-native kernel chained through matmul pair I/O (dft_mxu.matmul_mod
pair_out=/tuple-in) should win.

MEASURED RESULT (paired protocol, TWIDDLE_AB.json): the pair-native
chain is 1.05-1.07x SLOWER end-to-end at u64 2^18/2^20.  In-chain, XLA
fuses the
merge (hi<<32|lo), the emulated-u64 multiply, and the re-split into the
surrounding program — the standalone reading does not transfer, the jnp
form already sits at its practical floor, and this kernel only adds
per-program overhead while breaking that cross-op fusion.  Production
(ntt_mxu_u64._large_run64, parallel/ntt_dist._twiddle_mul) therefore
uses the plain jnp modops.mulmod_shoup.

Bit-exactness: p_shoup_lazy + p_reduce_once computes exactly
modops.mulmod_shoup's canonical result (q = hi(x*w'); r = x*w - q*p;
one conditional subtract) — asserted against the jnp path in
tests/test_pair_bridge.py.

Reference anchor: ops.hpp:225-242 (mulmod_shoup), applied at the
engine layer the reference runs per-coefficient in SIMD lanes
(opt/arch/avx2.hpp:308-424).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas_u64 import p_reduce_once, p_shoup_lazy

_I0 = np.int32(0)


def _kernel(xh_ref, xl_ref, th_ref, tl_ref, sh_ref, sl_ref,
            ph_ref, pl_ref, oh_ref, ol_ref):
    x = (xh_ref[...], xl_ref[...])
    tw = (th_ref[...], tl_ref[...])
    tws = (sh_ref[...], sl_ref[...])
    p = (ph_ref[0, 0, 0], pl_ref[0, 0, 0])
    r = p_reduce_once(p_shoup_lazy(x, tw, tws, p), p)   # canonical < p
    oh_ref[...] = r[0]
    ol_ref[...] = r[1]


def supports_shape(R: int, C: int) -> bool:
    """Mosaic block constraint: full-C rows with an 8-aligned row block."""
    return C % 128 == 0 and R % 8 == 0


@functools.lru_cache(maxsize=None)
def _build(m: int, R: int, C: int, nb: int, interpret: bool):
    # row block sized so ~10 resident [rblk, C] u32 arrays (+ double
    # buffering) stay a few MB.  Halve only while the result stays
    # 8-aligned (Mosaic: block dims divisible by (8, 128) or equal to the
    # array dims) — R=24 etc. would otherwise halve to an invalid 12-row
    # block; such shapes keep rblk == R (valid: equal to the array dim)
    rblk = R
    while rblk % 16 == 0 and rblk * C > (1 << 16):
        rblk //= 2
    nrb = R // rblk
    spec = pl.BlockSpec((1, 1, rblk, C), lambda b, c, r: (b, c, r, _I0),
                        memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, rblk, C), lambda b, c, r: (c, r, _I0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 1, 1), lambda b, c, r: (c, _I0, _I0),
                         memory_space=pltpu.SMEM)

    def call(xh, xl, th, tl, sh, sl, ph, plo):
        out_sd = jax.ShapeDtypeStruct((nb, m, R, C), jnp.uint32)
        return pl.pallas_call(
            _kernel,
            grid=(nb, m, nrb),
            in_specs=[spec, spec, tspec, tspec, tspec, tspec,
                      pspec, pspec],
            out_specs=[spec, spec],
            out_shape=[out_sd, out_sd],
            interpret=interpret,
        )(xh, xl, th, tl, sh, sl, ph, plo)

    return call


@functools.lru_cache(maxsize=None)
def _p_pairs(ring):
    p = np.array([int(q) for q in ring.moduli], dtype=np.uint64)
    return ((p >> np.uint64(32)).astype(np.uint32).reshape(-1, 1, 1),
            (p & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(-1, 1, 1))


def mulmod_shoup_pairs(xp, twp, twsp, ring, *, interpret=None):
    """Canonical x * tw mod p on uint32 hi/lo pairs.

    xp: (xh, xl) with shape [..., m, R, C]; twp/twsp: pairs of [m, R, C]
    (host constants or traced operands; tws = floor(tw << 64 / p)).
    Returns the (oh, ol) pair, < p, bit-identical to
    modops.mulmod_shoup on the merged u64 values."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xh, xl = (jnp.asarray(a) for a in xp)
    m, R, C = xh.shape[-3:]
    assert supports_shape(R, C), (R, C)
    batch = xh.shape[:-3]
    xh4 = xh.reshape((-1, m, R, C))
    xl4 = xl.reshape((-1, m, R, C))
    call = _build(m, R, C, xh4.shape[0], bool(interpret))
    ph, plo = _p_pairs(ring)
    oh, ol = call(xh4, xl4, *(jnp.asarray(t) for t in twp),
                  *(jnp.asarray(t) for t in twsp),
                  jnp.asarray(ph), jnp.asarray(plo))
    return (oh.reshape(batch + (m, R, C)), ol.reshape(batch + (m, R, C)))


def mulmod_shoup_u64(x, tw, tws, ring, *, interpret=None):
    """u64-facing drop-in for modops.mulmod_shoup on [..., m, R, C]
    residue tensors (splits to pairs at the edges; prefer
    mulmod_shoup_pairs when the neighbors already speak pairs)."""
    x = jnp.asarray(x)
    xh = (x >> jnp.uint64(32)).astype(jnp.uint32)
    xl = x.astype(jnp.uint32)
    tw = jnp.asarray(tw)
    tws = jnp.asarray(tws)
    twp = ((tw >> jnp.uint64(32)).astype(jnp.uint32),
           tw.astype(jnp.uint32))
    twsp = ((tws >> jnp.uint64(32)).astype(jnp.uint32),
            tws.astype(jnp.uint32))
    oh, ol = mulmod_shoup_pairs((xh, xl), twp, twsp, ring,
                                interpret=interpret)
    return (oh.astype(jnp.uint64) << jnp.uint64(32)) | ol.astype(jnp.uint64)
