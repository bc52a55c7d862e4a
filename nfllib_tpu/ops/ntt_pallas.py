"""Pallas TPU kernels for the negacyclic NTT / inverse NTT — the hot path.

The jnp stage loop (ops/ntt.py) materializes every one of the log2(n) Harvey
stages through HBM (~2 x tensor size per stage).  These kernels keep whole
polynomials in VMEM across ALL stages: HBM traffic drops to ~1 x read + 1 x
write + one fetch of the twiddle tables.

Design (TPU-native, not a port of the reference's SIMD loops — reference
include/nfl/core.hpp:438-614 + algos.hpp:16-73 define the *math* only):

  * Each residue channel's length-n vector is viewed as an [R, 128] matrix
    (R = n/128), the native sublane x lane layout.  One grid program
    transforms one batch element's FULL [m, R, 128] residue tensor — a
    single contiguous HBM block (strided per-channel blocks measured ~2.5x
    slower DMA) — with all channels vectorized against a per-channel modulus
    column; the twiddle tables stay VMEM-resident across batch iterations.
    Channel groups split only when the working set would overflow VMEM.
  * Harvey DIF stage s pairs elements i and i + half, half = n >> (s+1).
    - While half >= 128 ("row stages"), pairs live in different rows:
      reshape to (m, segments, 2*Hs, 128) — pure sublane-axis reshapes, no
      lane movement.  Twiddle slices reshape the same way.
    - Once half < 128 ("lane stages"), pairs live h lanes apart inside each
      row.  Instead of transposing (measured ~1.5 us per 128x128 tile — it
      would dominate), both butterfly outputs are computed at every lane
      from two cheap lane-rotations and merged with a select:
         y[j] = lazymod2p(x[j] + x[j+h])                  if (j mod 2h) <  h
         y[j] = w*(x[j-h] - x[j] + 2p) - hi(w'*t)*p       otherwise
      The twiddle/shoup vectors are host-precomputed full-width [128] lanes
      per stage (value w[(j mod 2h) - h] at second-half lanes, 1 elsewhere).
  * The phi^i pre-twist (reference core.hpp:594-600) and the final strict
    reduction to [0, p) (core.hpp:523-529) fuse into the forward kernel.
  * The INVERSE kernel needs no bit-reversal at all: instead of the
    reference's bitrev -> forward-with-inverse-twiddles -> bitrev
    (core.hpp:539-557), it inverts the forward stages directly, last to
    first — (A, B) -> (A + w^-1 B, A - w^-1 B) = (2a, 2b) — and the
    accumulated 2^log2(n) = n cancels against the n^-1 already folded into
    the invpoly_times_invphis untwist table.  The canonical INTT result is
    unique, so outputs are still bit-identical to the reference.
  * All arithmetic is the same lazy [0, 2p) Harvey/Shoup math as ops/ntt.py,
    entirely in 32-bit lanes (TPUs have no native 64-bit integers).  The u16
    tier also computes in uint32 lanes (Mosaic has no 16-bit ALU ops); all
    its intermediates fit 32 bits exactly, so results remain bit-identical.

The kernels cover limbs u16/u32 with degree >= 256; other configs fall back
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
# VMEM working-set budget per program (bytes); above this the channel axis
# splits into groups
_VMEM_BUDGET = 10 * 1024 * 1024


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
# kernel bodies (x: [mg, R, 128]; p: [mg, 1, 1] channel column)
# ---------------------------------------------------------------------------

def _mulhi16_in32(a, b):
    """High 16 bits of a 16x16 product held in uint32 lanes (exact: operands
    < 2^16 so the full product fits uint32)."""
    return (a * b) >> 16


def _lazymod(t, two_p):
    return t - jnp.where(t >= two_p, two_p, jnp.zeros_like(t))


def _row_stages(x, wmain_ref, wsmain_ref, n, log_r, p, two_p, mulhi,
                inverse=False):
    """Stages with half >= 128: sublane-axis reshapes.  x: [mg, R, 128]."""
    mg, R, C = x.shape
    p4 = p[:, None]
    tp4 = two_p[:, None]
    offs = []
    off = 0
    for s in range(log_r):
        offs.append(off)
        off += n >> (s + 1)
    order = reversed(range(log_r)) if inverse else range(log_r)
    for s in order:
        half = n >> (s + 1)
        hs = half // LANES
        off = offs[s]
        wt = wmain_ref[:, 0, off:off + half].reshape(mg, 1, hs, LANES)
        wi = wsmain_ref[:, 0, off:off + half].reshape(mg, 1, hs, LANES)
        v = x.reshape(mg, 1 << s, 2 * hs, C)
        u0 = v[:, :, :hs, :]
        u1 = v[:, :, hs:, :]
        if inverse:
            q = mulhi(u1, wi)
            w1 = u1 * wt - q * p4                  # w^-1 * B, lazy < 2p
            a = _lazymod(u0 + w1, tp4)
            b = _lazymod(u0 - w1 + tp4, tp4)
        else:
            a = _lazymod(u0 + u1, tp4)
            t1 = u0 - u1 + tp4
            q = mulhi(t1, wi)
            b = t1 * wt - q * p4
        x = jnp.concatenate([a, b], axis=2).reshape(mg, R, C)
    return x


def _lane_stages(x, lvec_ref, lsvec_ref, p, two_p, mulhi, inverse=False):
    """Stages with half < 128: lane rolls + select, no transpose."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), dimension=2)
    mg = x.shape[0]
    order = reversed(range(LOG_LANES)) if inverse else range(LOG_LANES)
    for t in order:
        h = LANES >> (t + 1)
        wt = lvec_ref[:, t, :].reshape(mg, 1, LANES)
        wi = lsvec_ref[:, t, :].reshape(mg, 1, LANES)
        first = (lane & h) == 0
        if inverse:
            q = mulhi(x, wi)
            v = x * wt - q * p                 # w^-1 * B at second-half lanes
            va = pltpu.roll(v, np.int32(LANES - h), 2)   # v[j+h] at lane j
            t0p = pltpu.roll(x, np.int32(h), 2)          # A at lane j-h
            a = _lazymod(x + va, two_p)
            b = _lazymod(t0p - v + two_p, two_p)
        else:
            rp = pltpu.roll(x, np.int32(h), 2)           # x[j-h] at lane j
            rm = pltpu.roll(x, np.int32(LANES - h), 2)   # x[j+h] at lane j
            a = _lazymod(x + rm, two_p)
            t1 = rp - x + two_p
            q = mulhi(t1, wi)
            b = t1 * wt - q * p
        x = jnp.where(first, a, b)
    return x


def _ntt_kernel(n, log_r, narrow, twist, strict, inverse,
                x_ref, tw_ref, stw_ref, wmain_ref, wsmain_ref,
                lvec_ref, lsvec_ref, p_ref, o_ref):
    dt = jnp.uint32
    p = p_ref[0]                           # [mg, 1, 1] column
    two_p = p + p
    x = x_ref[0]                           # [mg, R, 128]
    if narrow:
        x = x.astype(dt)
    mulhi = _mulhi16_in32 if narrow else modops._mulhi_u32

    if not inverse:
        if twist:
            q = mulhi(x, stw_ref[...])
            x = x * tw_ref[...] - q * p
            x = x - jnp.where(x >= p, p, jnp.zeros_like(x))   # < p
        x = _row_stages(x, wmain_ref, wsmain_ref, n, log_r, p, two_p, mulhi)
        x = _lane_stages(x, lvec_ref, lsvec_ref, p, two_p, mulhi)
    else:
        x = _lane_stages(x, lvec_ref, lsvec_ref, p, two_p, mulhi,
                         inverse=True)
        x = _row_stages(x, wmain_ref, wsmain_ref, n, log_r, p, two_p, mulhi,
                        inverse=True)
        if twist:   # fused n^-1 * phi^-i untwist
            q = mulhi(x, stw_ref[...])
            x = x * tw_ref[...] - q * p

    if strict:
        x = x - jnp.where(x >= p, p, jnp.zeros_like(x))
    o_ref[0] = x.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

# Empirical VMEM cost per channel per program at n (bytes): block double
# buffering (in+out) + twist tables + flat twiddles + live temporaries.
# Measured 23.8 MB for 17 channels at n=2^14 -> ~1.4 MB/channel.
_VMEM_PER_CHAN_FACTOR = 22        # * n * 4 bytes
_VMEM_LIMIT = 15 * 1024 * 1024


def _channel_group(ring):
    """(mg, padded_m): the largest channel-group size whose working set fits
    VMEM, preferring groupings that minimize channel padding."""
    n, m = ring.degree, ring.nmoduli
    per_chan = n * 4 * _VMEM_PER_CHAN_FACTOR
    mg_max = max(1, min(m, _VMEM_LIMIT // per_chan))
    # Bigger groups mean fewer programs and contiguous DMA (strided
    # per-channel blocks measured ~2.5x slower), so maximize mg first and
    # keep channel padding under ~15%.
    best = (1, m)                  # (mg, padded_m)
    best_cost = (0, 0)             # (mg, -padded): maximize mg, then min pad
    for mg in range(1, mg_max + 1):
        padded = -(-m // mg) * mg
        if padded > m + max(1, (15 * m) // 100) and mg > 1:
            continue
        cost = (mg, -padded)
        if cost > best_cost:
            best_cost = cost
            best = (mg, padded)
    return best


@functools.lru_cache(maxsize=None)
def _build(ctx_id, stage_inverse, tables_inverse, twist, strict, interpret):
    """One compiled kernel builder.

    stage_inverse=False, tables_inverse=False: forward NTT (+ phi twist).
    stage_inverse=True (tables_inverse implied): stage-inversion INTT
      (+ fused n^-1 phi^-i untwist).
    stage_inverse=False, tables_inverse=True: forward pass with omega^-1
      twiddles (the jnp inv_ntt building block; differential tests only).
    """
    ctx = _CTX_BY_ID[ctx_id]
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    log_r = static_log2(R)
    dt = ring.dtype
    narrow = ring.limb == "u16"
    mg, padded_m = _channel_group(ring)

    wmain, wsmain, lvec, lsvec = _kernel_tables(
        ctx_id, tables_inverse or stage_inverse)
    cast = np.uint32
    if stage_inverse:
        tw = ctx.invpoly_times_invphis
        stw = ctx.shoupinvpoly_times_invphis
    else:
        tw = ctx.phis
        stw = ctx.shoupphis
    tw = tw.reshape(m, R, LANES).astype(cast)
    stw = stw.reshape(m, R, LANES).astype(cast)
    p_vec = ctx.p.reshape(m, 1, 1).astype(cast)

    if padded_m != m:
        # dummy channels reuse channel 0's constants; their outputs are
        # sliced away by the caller
        def pad(t):
            reps = [t[0:1]] * (padded_m - m)
            return np.concatenate([t] + reps, axis=0)
        tw, stw = pad(tw), pad(stw)
        wmain, wsmain = pad(wmain), pad(wsmain)
        lvec, lsvec = pad(lvec), pad(lsvec)
        p_vec = pad(p_vec)

    kern = functools.partial(_ntt_kernel, n, log_r, narrow, twist, strict,
                             stage_inverse)

    def call(xb):
        """xb: [B, padded_m, R, 128] -> same shape."""
        B = xb.shape[0]
        grid = (padded_m // mg, B)   # batch innermost: tables stay resident
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, mg, R, LANES),
                             lambda g, b: (b, g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mg, R, LANES), lambda g, b: (g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mg, R, LANES), lambda g, b: (g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mg, 1, n - LANES), lambda g, b: (g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mg, 1, n - LANES), lambda g, b: (g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mg, LOG_LANES, LANES),
                             lambda g, b: (g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mg, LOG_LANES, LANES),
                             lambda g, b: (g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mg, 1, 1), lambda g, b: (_I0, g, _I0, _I0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, mg, R, LANES),
                                   lambda g, b: (b, g, _I0, _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xb.shape, dt),
            interpret=interpret,
        )(xb, jnp.asarray(tw), jnp.asarray(stw), jnp.asarray(wmain),
          jnp.asarray(wsmain), jnp.asarray(lvec), jnp.asarray(lsvec),
          jnp.asarray(p_vec[None]))

    return call, padded_m


def _run(x, ctx, stage_inverse, tables_inverse, twist, strict, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    ctx_id = _register_ctx(ctx)
    x = jnp.asarray(x)
    batch = x.shape[:-2]
    xb = x.reshape((-1, m, R, LANES))
    call, padded_m = _build(ctx_id, bool(stage_inverse), bool(tables_inverse),
                            bool(twist), bool(strict), bool(interpret))
    if padded_m != m:
        pad = jnp.zeros((xb.shape[0], padded_m - m, R, LANES),
                        dtype=xb.dtype)
        xb = jnp.concatenate([xb, pad], axis=1)
    out = call(xb)
    if padded_m != m:
        out = out[:, :m]
    return out.reshape(batch + (m, n))


def ntt_fwd(x, ctx, *, inverse_tables=False, twist=True, strict=True,
            interpret=None):
    """Forward Harvey NTT pass of [..., m, n] residues via the Pallas kernel.

    twist=True fuses the phi^i pre-twist (full ntt_pow_phi); the result is
    bit-identical to ops/ntt.py's jnp path.  inverse_tables runs the forward
    pass with omega^-1 twiddles (the jnp inv_ntt building block).
    """
    return _run(x, ctx, False, inverse_tables, twist, strict, interpret)


def intt_bwd(x, ctx, *, untwist=True, strict=True, interpret=None):
    """Inverse negacyclic transform of [..., m, n] Harvey-ordered residues via
    stage inversion (no permutations); untwist=True applies the fused
    n^-1 phi^-i scaling (bit-identical to ops/ntt.py's invntt_pow_invphi)."""
    return _run(x, ctx, True, True, untwist, strict, interpret)
