"""Pallas TPU kernel for the negacyclic NTT — the hot path.

The jnp stage loop (ops/ntt.py) materializes every one of the log2(n) Harvey
stages through HBM (~2 x tensor size per stage).  This kernel keeps whole
batches of a channel's coefficient vectors in VMEM across ALL stages: HBM
traffic drops to ~1 x read + 1 x write + one fetch of the twiddle tables per
residue channel.

Design (TPU-native, not a port of the reference's SIMD loops — reference
include/nfl/core.hpp:438-532 + algos.hpp:16-73 define the *math* only):

  * Each length-n vector is viewed as an [R, 128] matrix (R = n/128), the
    native sublane x lane layout; the grid runs over residue channels (and
    batch super-blocks), so one program transforms a [B, R, 128] block and
    the per-channel twiddle tables are fetched once per channel.
  * Harvey DIF stage s pairs elements i and i + half, half = n >> (s+1).
    - While half >= 128 ("row stages"), pairs live in different rows:
      reshape to (segments, 2*Hs, 128), Hs = half/128 — pure sublane-axis
      reshapes, no lane movement.  Twiddle slices reshape to (Hs, 128) the
      same way.
    - Once half < 128 ("lane stages"), pairs live h lanes apart inside each
      row.  Instead of transposing (measured ~1.5 us per 128x128 tile — it
      would dominate), both butterfly outputs are computed at every lane from
      two cheap lane-rotations and merged with a select:
         y[j] = lazymod2p(x[j] + x[j+h])                  if (j mod 2h) <  h
         y[j] = w*(x[j-h] - x[j] + 2p) - hi(w'*t)*p       otherwise
      The twiddle/shoup vectors are host-precomputed full-width [128] lanes
      per stage (value w[(j mod 2h) - h] at second-half lanes, 1 elsewhere).
  * The phi^i pre-twist (reference core.hpp:594-600) and the final strict
    reduction to [0, p) (core.hpp:523-529) are fused into the same kernel.
  * All arithmetic is the same lazy [0, 2p) Harvey/Shoup math as ops/ntt.py,
    entirely in 32-bit lanes (TPUs have no native 64-bit integers), so
    outputs are bit-identical to the jnp path and to the reference.  The u16
    tier also computes in uint32 lanes (Mosaic has no 16-bit ALU ops); all
    its intermediates fit 32 bits exactly, so results are again
    bit-identical.

The kernel covers limbs u16/u32 with degree >= 256; other configs fall back
to the jnp path (u64 needs emulated 64-bit lanes — the compatibility tier).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import static_log2
from . import modops

LANES = 128
LOG_LANES = 7
# index-map zero: int32, not python int (x64 mode traces python ints as i64,
# which Mosaic cannot legalize)
_I0 = np.int32(0)
# batch rows per program (VMEM: BSUB * n * 4B for data + temporaries)
_BSUB = 8


def supports(ring) -> bool:
    return ring.limb in ("u16", "u32") and ring.degree >= 2 * LANES


# ---------------------------------------------------------------------------
# host-side kernel tables (cached per ring context)
# ---------------------------------------------------------------------------

_CTX_BY_ID = {}


def _register_ctx(ctx):
    _CTX_BY_ID[id(ctx)] = ctx
    return id(ctx)


@functools.lru_cache(maxsize=None)
def _kernel_tables(ctx_id, inverse):
    """Row-stage flat twiddles + lane-stage full-width twiddle vectors."""
    ctx = _CTX_BY_ID[ctx_id]
    ring = ctx.ring
    n = ring.degree
    m = ring.nmoduli
    w = ctx.invomegas if inverse else ctx.omegas
    ws = ctx.shoupinvomegas if inverse else ctx.shoupomegas
    cast = np.uint32                      # kernel computes in 32-bit lanes
    main_len = n - LANES                  # sum of row-stage slice lengths
    wmain = np.ascontiguousarray(w[:, :main_len]).reshape(m, 1, main_len)
    wsmain = np.ascontiguousarray(ws[:, :main_len]).reshape(m, 1, main_len)

    # lane stages: for stage with half h, lane j in the second half of its
    # length-2h segment uses twiddle wtab[(j mod 2h) - h]; first-half lanes
    # hold 1 (their product is discarded by the select)
    lvec = np.ones((m, LOG_LANES, LANES), dtype=cast)
    lsvec = np.ones((m, LOG_LANES, LANES), dtype=cast)
    j = np.arange(LANES)
    off = main_len
    for t in range(LOG_LANES):
        h = LANES >> (t + 1)
        second = (j & h) != 0
        idx = (j % (2 * h)) - h
        for cm in range(m):
            tab = w[cm, off:off + h]
            stab = ws[cm, off:off + h]
            lvec[cm, t, second] = tab[idx[second]].astype(cast)
            lsvec[cm, t, second] = stab[idx[second]].astype(cast)
        off += h
    return (wmain.astype(cast), wsmain.astype(cast), lvec, lsvec)


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _mulhi16_in32(a, b):
    """High 16 bits of a 16x16 product held in uint32 lanes (exact: operands
    < 2^16 so the full product fits uint32)."""
    return (a * b) >> 16


def _lazymod(t, two_p):
    return t - jnp.where(t >= two_p, two_p, jnp.zeros_like(t))


def _row_stages(x, wmain_ref, wsmain_ref, n, log_r, p, two_p, mulhi):
    """Stages with half >= 128: sublane-axis reshapes.  x: [B, R, 128]."""
    B, R, C = x.shape
    off = 0
    for s in range(log_r):
        half = n >> (s + 1)
        hs = half // LANES
        wt = wmain_ref[0, 0, off:off + half].reshape(hs, LANES)
        wi = wsmain_ref[0, 0, off:off + half].reshape(hs, LANES)
        off += half
        v = x.reshape(B, 1 << s, 2 * hs, C)
        u0 = v[:, :, :hs, :]
        u1 = v[:, :, hs:, :]
        t0 = _lazymod(u0 + u1, two_p)
        t1 = u0 - u1 + two_p
        q = mulhi(t1, wi)
        t2 = t1 * wt - q * p
        x = jnp.concatenate([t0, t2], axis=2).reshape(B, R, C)
    return x


def _lane_stages(x, lvec_ref, lsvec_ref, p, two_p, mulhi):
    """Stages with half < 128: lane rolls + select, no transpose."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), dimension=2)
    for t in range(LOG_LANES):
        h = LANES >> (t + 1)
        wt = lvec_ref[0, t, :].reshape(1, 1, LANES)
        wi = lsvec_ref[0, t, :].reshape(1, 1, LANES)
        rp = pltpu.roll(x, np.int32(h), 2)          # x[j-h] at lane j
        rm = pltpu.roll(x, np.int32(LANES - h), 2)  # x[j+h] at lane j
        t0 = _lazymod(x + rm, two_p)
        t1 = rp - x + two_p
        q = mulhi(t1, wi)
        t2 = t1 * wt - q * p
        first = (lane & h) == 0
        x = jnp.where(first, t0, t2)
    return x


def _ntt_kernel(n, log_r, narrow, twist, strict,
                x_ref, phi_ref, sphi_ref, wmain_ref, wsmain_ref,
                lvec_ref, lsvec_ref, p_ref, o_ref):
    dt = jnp.uint32
    p = p_ref[0, 0, 0]
    two_p = p + p
    x = x_ref[:, 0]                        # [B, R, 128]
    if narrow:
        x = x.astype(dt)
    mulhi = _mulhi16_in32 if narrow else modops._mulhi_u32

    if twist:
        phi = phi_ref[0][None]
        sphi = sphi_ref[0][None]
        q = mulhi(x, sphi)
        x = x * phi - q * p
        x = x - jnp.where(x >= p, p, jnp.zeros_like(x))   # canonical, < p

    x = _row_stages(x, wmain_ref, wsmain_ref, n, log_r, p, two_p, mulhi)
    x = _lane_stages(x, lvec_ref, lsvec_ref, p, two_p, mulhi)

    if strict:
        x = x - jnp.where(x >= p, p, jnp.zeros_like(x))
    o_ref[:, 0] = x.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_ntt(ctx_id, inverse, twist, strict, interpret, bsub):
    ctx = _CTX_BY_ID[ctx_id]
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    log_r = static_log2(R)
    dt = ring.dtype
    narrow = ring.limb == "u16"

    wmain, wsmain, lvec, lsvec = _kernel_tables(ctx_id, inverse)
    cast = np.uint32                       # 32-bit lanes in-kernel
    phis = ctx.phis.reshape(m, R, LANES).astype(cast)
    sphis = ctx.shoupphis.reshape(m, R, LANES).astype(cast)
    p_smem = ctx.p.reshape(m, 1, 1).astype(cast)

    kern = functools.partial(_ntt_kernel, n, log_r, narrow, twist, strict)

    def call(xb):
        """xb: [B, m, R, 128] -> same shape (B a multiple of bsub)."""
        B = xb.shape[0]
        grid = (m, B // bsub)             # channel-major: twiddle tables
                                          # stay VMEM-resident across the
                                          # inner batch iterations
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bsub, 1, R, LANES),
                             lambda c, b: (b, c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n - LANES), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n - LANES), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LOG_LANES, LANES),
                             lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LOG_LANES, LANES),
                             lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bsub, 1, R, LANES),
                                   lambda c, b: (b, c, _I0, _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xb.shape, dt),
            interpret=interpret,
        )(xb, jnp.asarray(phis), jnp.asarray(sphis), jnp.asarray(wmain),
          jnp.asarray(wsmain), jnp.asarray(lvec), jnp.asarray(lsvec),
          jnp.asarray(p_smem))

    return call


def ntt_fwd(x, ctx, *, inverse_tables=False, twist=True, strict=True,
            interpret=None):
    """Forward Harvey NTT pass of [..., m, n] residues via the Pallas kernel.

    twist=True fuses the phi^i pre-twist (full ntt_pow_phi); the result is
    bit-identical to ops/ntt.py's jnp path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    ctx_id = _register_ctx(ctx)
    x = jnp.asarray(x)
    batch = x.shape[:-2]
    xb = x.reshape((-1, m, R, LANES))
    B = xb.shape[0]
    # pick the largest block size that divides B
    bsub = _BSUB
    while bsub > 1 and B % bsub:
        bsub //= 2
    call = _build_ntt(ctx_id, bool(inverse_tables), bool(twist), bool(strict),
                      bool(interpret), bsub)
    out = call(xb)
    return out.reshape(batch + (m, n))


# ---------------------------------------------------------------------------
# inverse transform: permutation-free stage inversion
# ---------------------------------------------------------------------------
#
# The reference computes INTT as bitrev -> forward-DIF with inverse twiddles
# -> bitrev (core.hpp:539-557) then an n^-1 * phi^-i untwist (core.hpp:608-
# 614).  The canonical INTT result is mathematically unique, so this kernel
# instead inverts the forward stages directly, last to first:
#     forward stage: (a, b) -> (a + b, w*(a - b))        [Harvey lazy]
#     inverse stage: (A, B) -> (A + w^-1*B, A - w^-1*B)  [= (2a, 2b)]
# The doubling accumulates to n across log2(n) stages and is cancelled by the
# n^-1 factor already inside invpoly_times_invphis — zero extra cost, zero
# bit-reversal gathers, one kernel for the whole inverse.  The inverse
# twiddles live at the same blocked-table positions (powers of omega^-1).


def _inv_butterfly(t0, t2, wi_t, wi_s, p, two_p, mulhi):
    """(A, B) -> (A + w^-1 B, A - w^-1 B), all values in [0, 2p)."""
    q = mulhi(t2, wi_s)
    v = t2 * wi_t - q * p                     # w^-1 * B, lazy < 2p
    a = _lazymod(t0 + v, two_p)
    b = _lazymod(t0 - v + two_p, two_p)
    return a, b


def _row_stages_inv(x, wmain_ref, wsmain_ref, n, log_r, p, two_p, mulhi):
    B, R, C = x.shape
    offs = []
    off = 0
    for s in range(log_r):
        offs.append(off)
        off += n >> (s + 1)
    for s in reversed(range(log_r)):
        half = n >> (s + 1)
        hs = half // LANES
        off = offs[s]
        wt = wmain_ref[0, 0, off:off + half].reshape(hs, LANES)
        wi = wsmain_ref[0, 0, off:off + half].reshape(hs, LANES)
        v = x.reshape(B, 1 << s, 2 * hs, C)
        t0 = v[:, :, :hs, :]
        t2 = v[:, :, hs:, :]
        a, b = _inv_butterfly(t0, t2, wt, wi, p, two_p, mulhi)
        x = jnp.concatenate([a, b], axis=2).reshape(B, R, C)
    return x


def _lane_stages_inv(x, lvec_ref, lsvec_ref, p, two_p, mulhi):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), dimension=2)
    for t in reversed(range(LOG_LANES)):
        h = LANES >> (t + 1)
        wt = lvec_ref[0, t, :].reshape(1, 1, LANES)
        wi = lsvec_ref[0, t, :].reshape(1, 1, LANES)
        q = mulhi(x, wi)
        v = x * wt - q * p                    # w^-1 * B at second-half lanes
        va = pltpu.roll(v, np.int32(LANES - h), 2)   # v[j+h] at lane j
        t0p = pltpu.roll(x, np.int32(h), 2)          # A at lane j-h
        a = _lazymod(x + va, two_p)
        b = _lazymod(t0p - v + two_p, two_p)
        first = (lane & h) == 0
        x = jnp.where(first, a, b)
    return x


def _intt_kernel(n, log_r, narrow, untwist, strict,
                 x_ref, ivp_ref, sivp_ref, wmain_ref, wsmain_ref,
                 lvec_ref, lsvec_ref, p_ref, o_ref):
    dt = jnp.uint32
    p = p_ref[0, 0, 0]
    two_p = p + p
    x = x_ref[:, 0]                        # [B, R, 128]
    if narrow:
        x = x.astype(dt)
    mulhi = _mulhi16_in32 if narrow else modops._mulhi_u32

    x = _lane_stages_inv(x, lvec_ref, lsvec_ref, p, two_p, mulhi)
    x = _row_stages_inv(x, wmain_ref, wsmain_ref, n, log_r, p, two_p, mulhi)

    if untwist:
        ivp = ivp_ref[0][None]
        sivp = sivp_ref[0][None]
        q = mulhi(x, sivp)
        x = x * ivp - q * p
    if strict:
        x = x - jnp.where(x >= p, p, jnp.zeros_like(x))
    o_ref[:, 0] = x.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_intt(ctx_id, untwist, strict, interpret, bsub):
    ctx = _CTX_BY_ID[ctx_id]
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    log_r = static_log2(R)
    dt = ring.dtype
    narrow = ring.limb == "u16"

    wmain, wsmain, lvec, lsvec = _kernel_tables(ctx_id, True)
    cast = np.uint32
    ivp = ctx.invpoly_times_invphis.reshape(m, R, LANES).astype(cast)
    sivp = ctx.shoupinvpoly_times_invphis.reshape(m, R, LANES).astype(cast)
    p_smem = ctx.p.reshape(m, 1, 1).astype(cast)

    kern = functools.partial(_intt_kernel, n, log_r, narrow, untwist, strict)

    def call(xb):
        B = xb.shape[0]
        grid = (m, B // bsub)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bsub, 1, R, LANES),
                             lambda c, b: (b, c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n - LANES), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n - LANES), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LOG_LANES, LANES),
                             lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LOG_LANES, LANES),
                             lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bsub, 1, R, LANES),
                                   lambda c, b: (b, c, _I0, _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xb.shape, dt),
            interpret=interpret,
        )(xb, jnp.asarray(ivp), jnp.asarray(sivp), jnp.asarray(wmain),
          jnp.asarray(wsmain), jnp.asarray(lvec), jnp.asarray(lsvec),
          jnp.asarray(p_smem))

    return call


def intt_bwd(x, ctx, *, untwist=True, strict=True, interpret=None):
    """Inverse negacyclic transform of [..., m, n] Harvey-ordered residues via
    stage inversion; untwist=True applies the fused n^-1 phi^-i scaling
    (bit-identical to ops/ntt.py's invntt_pow_invphi)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    ctx_id = _register_ctx(ctx)
    x = jnp.asarray(x)
    batch = x.shape[:-2]
    xb = x.reshape((-1, m, R, LANES))
    B = xb.shape[0]
    bsub = _BSUB
    while bsub > 1 and B % bsub:
        bsub //= 2
    call = _build_intt(ctx_id, bool(untwist), bool(strict), bool(interpret),
                       bsub)
    out = call(xb)
    return out.reshape(batch + (m, n))
