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
# host-side kernel tables (cached per ring — Ring is frozen/hashable and
# RingContext is lru-cached on it, so no id()-keyed registry is needed)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _kernel_tables(ring, inverse):
    """Row-stage flat twiddles + lane-stage full-width twiddle vectors."""
    ctx = ring.context()
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


def _channel_group(ring, factor=_VMEM_PER_CHAN_FACTOR):
    """(mg, padded_m): the largest channel-group size whose working set fits
    VMEM, preferring groupings that minimize channel padding.  `factor` is
    the empirical bytes-per-(channel*coefficient)/4 working-set estimate —
    larger for the fused LWE kernels, which hold several transforms."""
    n, m = ring.degree, ring.nmoduli
    per_chan = n * 4 * factor
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
def _build(ring, stage_inverse, tables_inverse, twist, strict, interpret):
    """One compiled kernel builder.

    stage_inverse=False, tables_inverse=False: forward NTT (+ phi twist).
    stage_inverse=True (tables_inverse implied): stage-inversion INTT
      (+ fused n^-1 phi^-i untwist).
    stage_inverse=False, tables_inverse=True: forward pass with omega^-1
      twiddles (the jnp inv_ntt building block; differential tests only).
    """
    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    log_r = static_log2(R)
    dt = ring.dtype
    narrow = ring.limb == "u16"
    mg, padded_m = _channel_group(ring)

    wmain, wsmain, lvec, lsvec = _kernel_tables(
        ring, tables_inverse or stage_inverse)
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
    x = jnp.asarray(x)
    batch = x.shape[:-2]
    xb = x.reshape((-1, m, R, LANES))
    call, padded_m = _build(ring, bool(stage_inverse), bool(tables_inverse),
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


# ---------------------------------------------------------------------------
# fused LWE chain kernels (reference tests/nfllib_demo_main_op.cpp:26-58):
# the whole encrypt chain  NTT(u/e1/e2) ; resa=e1n+u*pka ; resb=e2n+u*pkb
# and the whole decrypt head  t=resb-resa*s ; INTT(t) ; untwist
# each run in ONE VMEM residency — no HBM round trips between the transform
# and the pointwise ops.
# ---------------------------------------------------------------------------

# empirical VMEM working-set factors (bytes per channel*coeff / 4): the
# encrypt program holds three live transforms + two outputs + pk operands,
# the decrypt program two inputs + one transform + s operands
_ENC_FACTOR = 3 * _VMEM_PER_CHAN_FACTOR + 24
_DEC_FACTOR = 2 * _VMEM_PER_CHAN_FACTOR + 16


def _strict1(x, p):
    return x - jnp.where(x >= p, p, jnp.zeros_like(x))


def _barrett_mul_kernel(x, y, p, bm, narrow):
    """x*y mod p in uint32 lanes with the host-precomputed Barrett constant
    bm (u16: floor(2^32/p); u32: floor(2^60/p)) — same math as
    modops._barrett_mulmod_* but with bm as a kernel operand (Mosaic has no
    64-bit integer ops to derive it in-kernel)."""
    if narrow:
        z = x * y                         # < 2^28, exact in uint32
        q = modops._mulhi_u32(z, bm)
        r = z - q * p
        r = _strict1(r, p)
        return _strict1(r, p)
    hi = modops._mulhi_u32(x, y)
    lo = x * y
    a = (hi << 4) | (lo >> 28)
    q = modops._mulhi_u32(a, bm)
    r = lo - q * p
    r = _strict1(r, p + p)
    return _strict1(r, p)


def _lwe_encrypt_kernel(n, log_r, narrow,
                        x_ref, tw_ref, stw_ref, wmain_ref, wsmain_ref,
                        lvec_ref, lsvec_ref, pk_ref, p_ref, bm_ref, o_ref):
    p = p_ref[0]                          # [mg, 1, 1]
    bm = bm_ref[0]
    two_p = p + p
    mulhi = _mulhi16_in32 if narrow else modops._mulhi_u32
    x = x_ref[...]                        # [3, mg, R, 128]: u, e1, e2
    pk = pk_ref[...]                      # [2, mg, R, 128]: pka, pkb
    if narrow:
        x = x.astype(jnp.uint32)
        pk = pk.astype(jnp.uint32)
    outs = []
    for i in range(3):                    # three forward transforms in VMEM
        xi = x[i]
        q = mulhi(xi, stw_ref[...])       # fused phi^i twist
        xi = xi * tw_ref[...] - q * p
        xi = _strict1(xi, p)
        xi = _row_stages(xi, wmain_ref, wsmain_ref, n, log_r, p, two_p, mulhi)
        xi = _lane_stages(xi, lvec_ref, lsvec_ref, p, two_p, mulhi)
        outs.append(_strict1(xi, p))
    un, e1n, e2n = outs
    resa = _strict1(e1n + _barrett_mul_kernel(un, pk[0], p, bm, narrow), p)
    resb = _strict1(e2n + _barrett_mul_kernel(un, pk[1], p, bm, narrow), p)
    o_ref[0] = resa.astype(o_ref.dtype)
    o_ref[1] = resb.astype(o_ref.dtype)


def _lwe_decrypt_kernel(n, log_r, narrow,
                        x_ref, tw_ref, stw_ref, wmain_ref, wsmain_ref,
                        lvec_ref, lsvec_ref, s_ref, sp_ref, p_ref, o_ref):
    p = p_ref[0]
    two_p = p + p
    mulhi = _mulhi16_in32 if narrow else modops._mulhi_u32
    x = x_ref[...]                        # [2, mg, R, 128]: resa, resb
    s = s_ref[...]
    sp = sp_ref[...]
    if narrow:
        x = x.astype(jnp.uint32)
        s = s.astype(jnp.uint32)
        sp = sp.astype(jnp.uint32)
    q = mulhi(x[0], sp)                   # Shoup: resa * s, strict
    t = _strict1(x[0] * s - q * p, p)
    t = _strict1(x[1] + (p - t), p)       # resb - resa*s, strict
    t = _lane_stages(t, lvec_ref, lsvec_ref, p, two_p, mulhi, inverse=True)
    t = _row_stages(t, wmain_ref, wsmain_ref, n, log_r, p, two_p, mulhi,
                    inverse=True)
    q = mulhi(t, stw_ref[...])            # fused n^-1 phi^-i untwist
    t = t * tw_ref[...] - q * p
    o_ref[0] = _strict1(t, p).astype(o_ref.dtype)


def _pad_chan(t, padded_m, axis=0):
    m = t.shape[axis]
    if padded_m == m:
        return t
    reps = np.concatenate([np.take(t, [0], axis=axis)] * (padded_m - m),
                          axis=axis)
    return np.concatenate([t, reps], axis=axis)


@functools.lru_cache(maxsize=None)
def _build_lwe(ring, encrypt, interpret):
    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    log_r = static_log2(R)
    dt = ring.dtype
    narrow = ring.limb == "u16"
    mg, padded_m = _channel_group(ring,
                                  _ENC_FACTOR if encrypt else _DEC_FACTOR)
    cast = np.uint32

    wmain, wsmain, lvec, lsvec = _kernel_tables(ring, not encrypt)
    if encrypt:
        tw = ctx.phis.reshape(m, R, LANES).astype(cast)
        stw = ctx.shoupphis.reshape(m, R, LANES).astype(cast)
    else:
        tw = ctx.invpoly_times_invphis.reshape(m, R, LANES).astype(cast)
        stw = ctx.shoupinvpoly_times_invphis.reshape(m, R, LANES).astype(cast)
    p_vec = ctx.p.reshape(m, 1, 1).astype(cast)
    shift = 32 if narrow else 60
    bm_vec = ((1 << shift) // ctx.p.astype(object)).astype(np.uint64)
    bm_vec = bm_vec.astype(cast).reshape(m, 1, 1)

    tw, stw = _pad_chan(tw, padded_m), _pad_chan(stw, padded_m)
    wmain, wsmain = _pad_chan(wmain, padded_m), _pad_chan(wsmain, padded_m)
    lvec, lsvec = _pad_chan(lvec, padded_m), _pad_chan(lsvec, padded_m)
    p_vec = _pad_chan(p_vec, padded_m)
    bm_vec = _pad_chan(bm_vec, padded_m)

    nstack = 3 if encrypt else 2
    kern = functools.partial(
        _lwe_encrypt_kernel if encrypt else _lwe_decrypt_kernel,
        n, log_r, narrow)

    tab_spec = [
        pl.BlockSpec((mg, R, LANES), lambda g, b: (g, _I0, _I0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mg, R, LANES), lambda g, b: (g, _I0, _I0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mg, 1, n - LANES), lambda g, b: (g, _I0, _I0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mg, 1, n - LANES), lambda g, b: (g, _I0, _I0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mg, LOG_LANES, LANES), lambda g, b: (g, _I0, _I0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mg, LOG_LANES, LANES), lambda g, b: (g, _I0, _I0),
                     memory_space=pltpu.VMEM),
    ]

    def call(xb, *operands):
        """xb: [B*nstack, padded_m, R, 128] (stack folded into dim 0, batch-
        major); encrypt operands: (pk2,) [2, padded_m, R, 128]; decrypt
        operands: (s, sprime) each [padded_m, R, 128].  Returns
        [B*2, padded_m, R, 128] (encrypt) / [B, padded_m, R, 128]."""
        B = xb.shape[0] // nstack
        grid = (padded_m // mg, B)
        in_specs = [pl.BlockSpec((nstack, mg, R, LANES),
                                 lambda g, b: (b, g, _I0, _I0),
                                 memory_space=pltpu.VMEM)]
        in_specs += tab_spec
        if encrypt:
            in_specs += [
                pl.BlockSpec((2, mg, R, LANES), lambda g, b: (_I0, g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mg, 1, 1), lambda g, b: (_I0, g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mg, 1, 1), lambda g, b: (_I0, g, _I0, _I0),
                             memory_space=pltpu.VMEM),
            ]
            out_spec = pl.BlockSpec((2, mg, R, LANES),
                                    lambda g, b: (b, g, _I0, _I0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((B * 2, padded_m, R, LANES), dt)
        else:
            in_specs += [
                pl.BlockSpec((mg, R, LANES), lambda g, b: (g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mg, R, LANES), lambda g, b: (g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mg, 1, 1), lambda g, b: (_I0, g, _I0, _I0),
                             memory_space=pltpu.VMEM),
            ]
            out_spec = pl.BlockSpec((1, mg, R, LANES),
                                    lambda g, b: (b, g, _I0, _I0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((B, padded_m, R, LANES), dt)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(xb, jnp.asarray(tw), jnp.asarray(stw), jnp.asarray(wmain),
          jnp.asarray(wsmain), jnp.asarray(lvec), jnp.asarray(lsvec),
          *operands, jnp.asarray(p_vec[None]),
          *((jnp.asarray(bm_vec[None]),) if encrypt else ()))

    return call, padded_m


def _stack_batch(polys, m, R):
    """[..., m, n] tensors -> [B*k, m, R, 128], batch-major (b-th batch
    element's k stack entries are contiguous rows, matching the kernel's
    (nstack, ...) dim-0 blocks)."""
    xs = [jnp.asarray(t).reshape((-1, m, R, LANES)) for t in polys]
    return jnp.stack(xs, axis=1).reshape((-1, m, R, LANES))


def lwe_encrypt_fused(u, e1, e2, pka, pkb, ctx, interpret=None):
    """Fused LWE encrypt chain (reference demo encrypt, lines 26-45):
    twist+NTT of u/e1/e2 and both muladd combines in one kernel pass.
    u/e1/e2: [..., m, n] coefficient-domain noise; pka/pkb: [m, n] NTT-domain
    public key.  Returns (resa, resb), bit-identical to the jnp graph."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    batch = jnp.asarray(u).shape[:-2]
    call, padded_m = _build_lwe(ring, True, bool(interpret))
    xb = _stack_batch([u, e1, e2], m, R)
    pk = jnp.stack([jnp.asarray(pka).reshape(m, R, LANES),
                    jnp.asarray(pkb).reshape(m, R, LANES)])
    if padded_m != m:
        xb = jnp.concatenate(
            [xb, jnp.zeros((xb.shape[0], padded_m - m, R, LANES),
                           xb.dtype)], axis=1)
        pk = jnp.concatenate(
            [pk, jnp.zeros((2, padded_m - m, R, LANES), pk.dtype)], axis=1)
    out = call(xb, pk)
    out = out[:, :m].reshape((-1, 2, m, R, LANES))
    resa = out[:, 0].reshape(batch + (m, n))
    resb = out[:, 1].reshape(batch + (m, n))
    return resa, resb


def lwe_decrypt_fused(resa, resb, s, sprime, ctx, interpret=None):
    """Fused LWE decrypt head (reference demo decrypt, lines 48-58):
    resb - resa*s (Shoup) and the untwisted INTT in one kernel pass.
    Returns the coefficient-domain message-plus-noise tensor [..., m, n]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    batch = jnp.asarray(resa).shape[:-2]
    call, padded_m = _build_lwe(ring, False, bool(interpret))
    xb = _stack_batch([resa, resb], m, R)
    sk = jnp.asarray(s).reshape(m, R, LANES)
    sp = jnp.asarray(sprime).reshape(m, R, LANES)
    if padded_m != m:
        xb = jnp.concatenate(
            [xb, jnp.zeros((xb.shape[0], padded_m - m, R, LANES),
                           xb.dtype)], axis=1)
        pad1 = jnp.ones((padded_m - m, R, LANES), sk.dtype)
        sk = jnp.concatenate([sk, pad1], axis=0)
        sp = jnp.concatenate([sp, jnp.zeros_like(pad1)], axis=0)
    out = call(xb, sk, sp)
    return out[:, :m].reshape(batch + (m, n))
