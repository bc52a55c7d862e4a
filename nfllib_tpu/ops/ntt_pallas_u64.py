"""Pallas TPU NTT / inverse-NTT kernels for the u64 (62-bit-moduli) tier.

The reference treats u64 as a first-class tier with its own Newton-quotient
mulmod (reference include/nfl/ops.hpp:201-219) and runs two of its five CI
configs on it (tests/CMakeLists.txt:7).  TPUs have no 64-bit lanes (and under
x64 Mosaic rejects i64 entirely), so until now the u64 tier fell back to the
jnp stage loop, where XLA emulates every 64-bit op AND round-trips the tensor
through HBM once per stage.

This kernel keeps the VMEM-resident all-stages structure of ops/ntt_pallas.py
but represents every 64-bit quantity as a (hi, lo) pair of uint32 arrays and
implements the Harvey/Shoup butterfly arithmetic in explicit double-word
32-bit-lane math:

  * add/sub with carry/borrow propagation (one compare per word),
  * mullo64 (3 32x32 low products + 1 mulhi32),
  * mulhi64 (schoolbook 4-product with exact mid-column carry tracking),
  * the same lazy [0, 2p) Harvey stages, lane-roll tail, fused phi twist /
    n^-1 phi^-i untwist, and permutation-free stage-inversion INTT as the
    u32 kernel — so outputs are bit-identical to ops/ntt.py's jnp path
    (itself golden-anchored against the reference's compiled templates).

Splitting/joining u64 <-> u32 pairs happens outside the kernel with plain
shifts (one fused XLA pass); everything inside is uint32.
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
_I0 = np.int32(0)


def supports(ring) -> bool:
    """Degrees 256..65536: above that the per-channel working set exceeds
    the chip's 16 MB scoped VMEM (measured: Mosaic rejects n=2^17 with a
    24 MB stack allocation).  Larger degrees belong to the fused MXU split
    path (ops/ntt_mxu_u64.py), which the dispatcher prefers anyway."""
    return (ring.limb == "u64" and 2 * LANES <= ring.degree <= 65536)


# ---------------------------------------------------------------------------
# paired-u32 double-word arithmetic (all values uint32 arrays)
# ---------------------------------------------------------------------------

def _c32(b):
    return b.astype(jnp.uint32)


def p_add(a, b):
    ah, al = a
    bh, bl = b
    lo = al + bl
    return ah + bh + _c32(lo < al), lo


def p_sub(a, b):
    ah, al = a
    bh, bl = b
    return ah - bh - _c32(al < bl), al - bl


def p_ge(a, b):
    ah, al = a
    bh, bl = b
    return (ah > bh) | ((ah == bh) & (al >= bl))


def p_select(c, a, b):
    return jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1])


def p_lazymod(t, two_p):
    return p_select(p_ge(t, two_p), p_sub(t, two_p), t)


def p_mullo(a, b):
    """Low 64 bits of the 128-bit product, as a pair."""
    ah, al = a
    bh, bl = b
    lo = al * bl
    hi = modops._mulhi_u32(al, bl) + al * bh + ah * bl
    return hi, lo


def p_mulhi(a, b):
    """High 64 bits of the 128-bit product, as a pair (exact)."""
    ah, al = a
    bh, bl = b
    ll_h = modops._mulhi_u32(al, bl)
    lh_l = al * bh
    lh_h = modops._mulhi_u32(al, bh)
    hl_l = ah * bl
    hl_h = modops._mulhi_u32(ah, bl)
    hh_l = ah * bh
    hh_h = modops._mulhi_u32(ah, bh)
    # mid column (bits 32..63): ll_h + lh_l + hl_l, carries into bits 64+
    m1 = ll_h + lh_l
    c1 = _c32(m1 < lh_l)
    m2 = m1 + hl_l
    c2 = _c32(m2 < hl_l)
    cmid = c1 + c2
    # bits 64..95: hh_l + lh_h + hl_h + cmid (carries into bits 96+)
    r_l = hh_l + lh_h
    c3 = _c32(r_l < lh_h)
    r_l2 = r_l + hl_h
    c4 = _c32(r_l2 < hl_h)
    r_l3 = r_l2 + cmid
    c5 = _c32(r_l3 < cmid)
    return hh_h + c3 + c4 + c5, r_l3


def p_shoup_lazy(x, w, wsh, p):
    """x * w mod p via Shoup, lazy result in [0, 2p)."""
    q = p_mulhi(x, wsh)
    return p_sub(p_mullo(x, w), p_mullo(q, p))


def p_reduce_once(x, p):
    return p_select(p_ge(x, p), p_sub(x, p), x)


# ---------------------------------------------------------------------------
# host-side kernel tables (u64 values split into uint32 hi/lo planes)
# ---------------------------------------------------------------------------

def _split(t):
    t = np.ascontiguousarray(t, dtype=np.uint64)
    return ((t >> np.uint64(32)).astype(np.uint32),
            (t & np.uint64(0xFFFFFFFF)).astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _kernel_tables(ring, inverse):
    """Same layout as ntt_pallas._kernel_tables, hi/lo planes.  Cached on
    the frozen Ring (no id()-keyed registry)."""
    ctx = ring.context()
    n = ring.degree
    m = ring.nmoduli
    w = ctx.invomegas if inverse else ctx.omegas
    ws = ctx.shoupinvomegas if inverse else ctx.shoupomegas
    main_len = n - LANES
    wmain = np.ascontiguousarray(w[:, :main_len]).reshape(m, 1, main_len)
    wsmain = np.ascontiguousarray(ws[:, :main_len]).reshape(m, 1, main_len)

    # lane-stage full-width vectors: twiddle at second-half lanes, 1 at
    # first-half lanes (and Shoup constant 1, so q = hi64(x*1) = 0 there and
    # the "transformed" value equals x — discarded by the select anyway)
    lvec = np.ones((m, LOG_LANES, LANES), dtype=np.uint64)
    lsvec = np.ones((m, LOG_LANES, LANES), dtype=np.uint64)
    j = np.arange(LANES)
    off = main_len
    for t in range(LOG_LANES):
        h = LANES >> (t + 1)
        second = (j & h) != 0
        idx = (j % (2 * h)) - h
        for cm in range(m):
            lvec[cm, t, second] = w[cm, off:off + h][idx[second]]
            lsvec[cm, t, second] = ws[cm, off:off + h][idx[second]]
        off += h
    return (_split(wmain), _split(wsmain), _split(lvec), _split(lsvec))


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _row_stages(x, wm, wsm, n, log_r, p, two_p, inverse=False):
    """Stages with half >= 128; x is a (hi, lo) pair of [mg, R, 128]."""
    mg, R, C = x[0].shape
    p4 = (p[0][:, None], p[1][:, None])
    tp4 = (two_p[0][:, None], two_p[1][:, None])
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

        def seg(t):
            return (t[0][:, 0, off:off + half].reshape(mg, 1, hs, LANES),
                    t[1][:, 0, off:off + half].reshape(mg, 1, hs, LANES))

        wt = seg(wm)
        wi = seg(wsm)
        v = (x[0].reshape(mg, 1 << s, 2 * hs, C),
             x[1].reshape(mg, 1 << s, 2 * hs, C))
        u0 = (v[0][:, :, :hs, :], v[1][:, :, :hs, :])
        u1 = (v[0][:, :, hs:, :], v[1][:, :, hs:, :])
        if inverse:
            w1 = p_shoup_lazy(u1, wt, wi, p4)
            a = p_lazymod(p_add(u0, w1), tp4)
            b = p_lazymod(p_add(p_sub(u0, w1), tp4), tp4)
        else:
            a = p_lazymod(p_add(u0, u1), tp4)
            t1 = p_add(p_sub(u0, u1), tp4)
            b = p_shoup_lazy(t1, wt, wi, p4)
        x = (jnp.concatenate([a[0], b[0]], axis=2).reshape(mg, R, C),
             jnp.concatenate([a[1], b[1]], axis=2).reshape(mg, R, C))
    return x


def _lane_stages(x, lv, ls, p, two_p, inverse=False):
    """Stages with half < 128: lane rolls + select on both words."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), dimension=2)
    mg = x[0].shape[0]

    def roll(t, sh):
        return (pltpu.roll(t[0], np.int32(sh), 2),
                pltpu.roll(t[1], np.int32(sh), 2))

    order = reversed(range(LOG_LANES)) if inverse else range(LOG_LANES)
    for t in order:
        h = LANES >> (t + 1)
        wt = (lv[0][:, t, :].reshape(mg, 1, LANES),
              lv[1][:, t, :].reshape(mg, 1, LANES))
        wi = (ls[0][:, t, :].reshape(mg, 1, LANES),
              ls[1][:, t, :].reshape(mg, 1, LANES))
        first = (lane & h) == 0
        if inverse:
            v = p_shoup_lazy(x, wt, wi, p)     # w^-1 * B at second-half lanes
            va = roll(v, LANES - h)            # v[j+h] at lane j
            t0p = roll(x, h)                   # A at lane j-h
            a = p_lazymod(p_add(x, va), two_p)
            b = p_lazymod(p_add(p_sub(t0p, v), two_p), two_p)
        else:
            rp = roll(x, h)                    # x[j-h] at lane j
            rm = roll(x, LANES - h)            # x[j+h] at lane j
            a = p_lazymod(p_add(x, rm), two_p)
            t1 = p_add(p_sub(rp, x), two_p)
            b = p_shoup_lazy(t1, wt, wi, p)
        x = p_select(first, a, b)
    return x


def _ntt_kernel(n, log_r, twist, strict, inverse,
                xh_ref, xl_ref, twh_ref, twl_ref, stwh_ref, stwl_ref,
                wmh_ref, wml_ref, wsh_ref, wsl_ref,
                lvh_ref, lvl_ref, lsh_ref, lsl_ref,
                ph_ref, pl_ref, oh_ref, ol_ref):
    p = (ph_ref[0], pl_ref[0])                 # [mg, 1, 1] columns
    two_p = p_add(p, p)
    x = (xh_ref[0], xl_ref[0])                 # [mg, R, 128] pairs
    wm = (wmh_ref[...], wml_ref[...])
    wsm = (wsh_ref[...], wsl_ref[...])
    lv = (lvh_ref[...], lvl_ref[...])
    ls = (lsh_ref[...], lsl_ref[...])
    tw = (twh_ref[...], twl_ref[...])
    stw = (stwh_ref[...], stwl_ref[...])

    if not inverse:
        if twist:
            x = p_reduce_once(p_shoup_lazy(x, tw, stw, p), p)
        x = _row_stages(x, wm, wsm, n, log_r, p, two_p)
        x = _lane_stages(x, lv, ls, p, two_p)
    else:
        x = _lane_stages(x, lv, ls, p, two_p, inverse=True)
        x = _row_stages(x, wm, wsm, n, log_r, p, two_p, inverse=True)
        if twist:   # fused n^-1 * phi^-i untwist
            x = p_shoup_lazy(x, tw, stw, p)

    if strict:
        x = p_reduce_once(x, p)
    oh_ref[0] = x[0]
    ol_ref[0] = x[1]


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

# Pairs double the u32 kernel's working set (ntt_pallas measured ~22 words
# per element per channel), plus live double-word temporaries.
_VMEM_PER_CHAN_FACTOR = 48        # * n * 4 bytes (pair hi/lo arrays)


def _channel_group(ring, factor=_VMEM_PER_CHAN_FACTOR):
    """One heuristic, one copy: delegates to ntt_pallas._channel_group —
    the u64 tier differs only in its default VMEM factor (the pair
    kernels hold hi/lo arrays for every buffer)."""
    from .ntt_pallas import _channel_group as _cg
    return _cg(ring, factor)


@functools.lru_cache(maxsize=None)
def _build(ring, stage_inverse, tables_inverse, twist, strict, interpret):
    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    log_r = static_log2(R)
    mg, padded_m = _channel_group(ring)

    (wmh, wml), (wsh, wsl), (lvh, lvl), (lsh, lsl) = _kernel_tables(
        ring, tables_inverse or stage_inverse)
    if stage_inverse:
        tw64 = ctx.invpoly_times_invphis
        stw64 = ctx.shoupinvpoly_times_invphis
    else:
        tw64 = ctx.phis
        stw64 = ctx.shoupphis
    twh, twl = _split(tw64.reshape(m, R, LANES))
    stwh, stwl = _split(stw64.reshape(m, R, LANES))
    ph, plo = _split(ctx.p.reshape(m, 1, 1))

    if padded_m != m:
        def pad(t):
            reps = [t[0:1]] * (padded_m - m)
            return np.concatenate([t] + reps, axis=0)
        twh, twl, stwh, stwl = pad(twh), pad(twl), pad(stwh), pad(stwl)
        wmh, wml, wsh, wsl = pad(wmh), pad(wml), pad(wsh), pad(wsl)
        lvh, lvl, lsh, lsl = pad(lvh), pad(lvl), pad(lsh), pad(lsl)
        ph, plo = pad(ph), pad(plo)

    kern = functools.partial(_ntt_kernel, n, log_r, twist, strict,
                             stage_inverse)

    def spec_x():
        return pl.BlockSpec((1, mg, R, LANES), lambda g, b: (b, g, _I0, _I0),
                            memory_space=pltpu.VMEM)

    def spec_tab(shape):
        return pl.BlockSpec(shape, lambda g, b: (g,) + (_I0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def call(xbh, xbl):
        """xbh/xbl: [B, padded_m, R, 128] uint32 -> same shapes."""
        B = xbh.shape[0]
        grid = (padded_m // mg, B)   # batch innermost: tables stay resident
        out_sd = jax.ShapeDtypeStruct(xbh.shape, jnp.uint32)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                spec_x(), spec_x(),
                spec_tab((mg, R, LANES)), spec_tab((mg, R, LANES)),
                spec_tab((mg, R, LANES)), spec_tab((mg, R, LANES)),
                spec_tab((mg, 1, n - LANES)), spec_tab((mg, 1, n - LANES)),
                spec_tab((mg, 1, n - LANES)), spec_tab((mg, 1, n - LANES)),
                spec_tab((mg, LOG_LANES, LANES)),
                spec_tab((mg, LOG_LANES, LANES)),
                spec_tab((mg, LOG_LANES, LANES)),
                spec_tab((mg, LOG_LANES, LANES)),
                pl.BlockSpec((1, mg, 1, 1), lambda g, b: (_I0, g, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mg, 1, 1), lambda g, b: (_I0, g, _I0, _I0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[spec_x(), spec_x()],
            out_shape=[out_sd, out_sd],
            interpret=interpret,
        )(xbh, xbl, jnp.asarray(twh), jnp.asarray(twl), jnp.asarray(stwh),
          jnp.asarray(stwl), jnp.asarray(wmh), jnp.asarray(wml),
          jnp.asarray(wsh), jnp.asarray(wsl), jnp.asarray(lvh),
          jnp.asarray(lvl), jnp.asarray(lsh), jnp.asarray(lsl),
          jnp.asarray(ph[None]), jnp.asarray(plo[None]))

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
    # split into u32 planes outside the kernel (one fused XLA pass each way)
    xbh = (xb >> jnp.uint64(32)).astype(jnp.uint32)
    xbl = xb.astype(jnp.uint32)
    call, padded_m = _build(ring, bool(stage_inverse), bool(tables_inverse),
                            bool(twist), bool(strict), bool(interpret))
    if padded_m != m:
        pad = jnp.zeros((xb.shape[0], padded_m - m, R, LANES),
                        dtype=jnp.uint32)
        xbh = jnp.concatenate([xbh, pad], axis=1)
        xbl = jnp.concatenate([xbl, pad], axis=1)
    oh, ol = call(xbh, xbl)
    if padded_m != m:
        oh, ol = oh[:, :m], ol[:, :m]
    out = (oh.astype(jnp.uint64) << jnp.uint64(32)) | ol.astype(jnp.uint64)
    return out.reshape(batch + (m, n))


def ntt_fwd(x, ctx, *, inverse_tables=False, twist=True, strict=True,
            interpret=None):
    """Forward Harvey NTT pass of u64 [..., m, n] residues (paired-u32
    kernel); twist=True fuses the phi^i pre-twist.  Bit-identical to
    ops/ntt.py's jnp path."""
    return _run(x, ctx, False, inverse_tables, twist, strict, interpret)


def intt_bwd(x, ctx, *, untwist=True, strict=True, interpret=None):
    """Inverse negacyclic transform via direct stage inversion (no
    permutations); untwist=True applies the fused n^-1 phi^-i scaling."""
    return _run(x, ctx, True, True, untwist, strict, interpret)


# ---------------------------------------------------------------------------
# fused LWE chain kernels, u64 tier (mirrors ops/ntt_pallas.py lwe_*_fused:
# whole encrypt / decrypt-head chains in one VMEM residency, pair math)
# ---------------------------------------------------------------------------

_ENC_FACTOR = 3 * _VMEM_PER_CHAN_FACTOR + 32
_DEC_FACTOR = 2 * _VMEM_PER_CHAN_FACTOR + 16


def p_newton_mulmod(x, y, p, pn):
    """x*y mod p for 62-bit moduli via the Newton quotient (the pair-math
    transcription of modops.mulmod's u64 branch / reference
    ops.hpp:201-219); canonical result < p."""
    hi = p_mulhi(x, y)
    lo = p_mullo(x, y)
    # s = (128-bit product) << 2, split into its high/low 64-bit halves
    s_hi = ((hi[0] << 2) | (hi[1] >> 30), (hi[1] << 2) | (lo[0] >> 30))
    s_lo = ((lo[0] << 2) | (lo[1] >> 30), lo[1] << 2)
    t = p_mullo(pn, hi)
    q_lo = p_add(t, s_lo)
    carry = _c32(~p_ge(q_lo, s_lo))            # 64-bit add wrapped
    q_hi = p_add(p_add(p_mulhi(pn, hi), s_hi), (jnp.zeros_like(carry), carry))
    r = p_sub(lo, p_mullo(q_hi, p))
    return p_reduce_once(r, p)


def _lwe_encrypt_kernel(n, log_r,
                        xh_ref, xl_ref, twh_ref, twl_ref, stwh_ref, stwl_ref,
                        wmh_ref, wml_ref, wsh_ref, wsl_ref,
                        lvh_ref, lvl_ref, lsh_ref, lsl_ref,
                        pkh_ref, pkl_ref, ph_ref, pl_ref, pnh_ref, pnl_ref,
                        oh_ref, ol_ref):
    p = (ph_ref[0], pl_ref[0])
    pn = (pnh_ref[0], pnl_ref[0])
    two_p = p_add(p, p)
    wm = (wmh_ref[...], wml_ref[...])
    wsm = (wsh_ref[...], wsl_ref[...])
    lv = (lvh_ref[...], lvl_ref[...])
    ls = (lsh_ref[...], lsl_ref[...])
    tw = (twh_ref[...], twl_ref[...])
    stw = (stwh_ref[...], stwl_ref[...])

    outs = []
    for i in range(3):                 # u, e1, e2: twist + forward stages
        x = (xh_ref[i], xl_ref[i])
        x = p_reduce_once(p_shoup_lazy(x, tw, stw, p), p)
        x = _row_stages(x, wm, wsm, n, log_r, p, two_p)
        x = _lane_stages(x, lv, ls, p, two_p)
        outs.append(p_reduce_once(x, p))
    un, e1n, e2n = outs
    for j, en in ((0, e1n), (1, e2n)):
        pk = (pkh_ref[j], pkl_ref[j])
        r = p_add(en, p_newton_mulmod(un, pk, p, pn))
        r = p_reduce_once(r, p)
        oh_ref[j] = r[0]
        ol_ref[j] = r[1]


def _lwe_decrypt_kernel(n, log_r,
                        xh_ref, xl_ref, twh_ref, twl_ref, stwh_ref, stwl_ref,
                        wmh_ref, wml_ref, wsh_ref, wsl_ref,
                        lvh_ref, lvl_ref, lsh_ref, lsl_ref,
                        sh_ref, sl_ref, sph_ref, spl_ref, ph_ref, pl_ref,
                        oh_ref, ol_ref):
    p = (ph_ref[0], pl_ref[0])
    two_p = p_add(p, p)
    wm = (wmh_ref[...], wml_ref[...])
    wsm = (wsh_ref[...], wsl_ref[...])
    lv = (lvh_ref[...], lvl_ref[...])
    ls = (lsh_ref[...], lsl_ref[...])
    tw = (twh_ref[...], twl_ref[...])
    stw = (stwh_ref[...], stwl_ref[...])

    resa = (xh_ref[0], xl_ref[0])
    resb = (xh_ref[1], xl_ref[1])
    s = (sh_ref[...], sl_ref[...])
    sp = (sph_ref[...], spl_ref[...])
    ss = p_reduce_once(p_shoup_lazy(resa, s, sp, p), p)
    t = p_reduce_once(p_add(resb, p_sub(p, ss)), p)   # resb - resa*s, strict
    t = _lane_stages(t, lv, ls, p, two_p, inverse=True)
    t = _row_stages(t, wm, wsm, n, log_r, p, two_p, inverse=True)
    t = p_shoup_lazy(t, tw, stw, p)                   # fused untwist
    t = p_reduce_once(t, p)
    oh_ref[0] = t[0]
    ol_ref[0] = t[1]


@functools.lru_cache(maxsize=None)
def _build_lwe(ring, encrypt, interpret):
    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    log_r = static_log2(R)
    mg, padded_m = _channel_group(ring,
                                  _ENC_FACTOR if encrypt else _DEC_FACTOR)

    (wmh, wml), (wsh, wsl), (lvh, lvl), (lsh, lsl) = _kernel_tables(
        ring, not encrypt)
    if encrypt:
        tw64, stw64 = ctx.phis, ctx.shoupphis
    else:
        tw64 = ctx.invpoly_times_invphis
        stw64 = ctx.shoupinvpoly_times_invphis
    twh, twl = _split(tw64.reshape(m, R, LANES))
    stwh, stwl = _split(stw64.reshape(m, R, LANES))
    ph, plo = _split(ctx.p.reshape(m, 1, 1))
    pnh, pnl = _split(ctx.pn.reshape(m, 1, 1))

    if padded_m != m:
        def pad(t):
            reps = [t[0:1]] * (padded_m - m)
            return np.concatenate([t] + reps, axis=0)
        twh, twl, stwh, stwl = pad(twh), pad(twl), pad(stwh), pad(stwl)
        wmh, wml, wsh, wsl = pad(wmh), pad(wml), pad(wsh), pad(wsl)
        lvh, lvl, lsh, lsl = pad(lvh), pad(lvl), pad(lsh), pad(lsl)
        ph, plo, pnh, pnl = pad(ph), pad(plo), pad(pnh), pad(pnl)

    nstack = 3 if encrypt else 2
    kern = functools.partial(
        _lwe_encrypt_kernel if encrypt else _lwe_decrypt_kernel, n, log_r)

    def spec_x(k):
        return pl.BlockSpec((k, mg, R, LANES), lambda g, b: (b, g, _I0, _I0),
                            memory_space=pltpu.VMEM)

    def spec_tab(shape):
        return pl.BlockSpec(shape,
                            lambda g, b: (g,) + (_I0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def spec_scalar():
        return pl.BlockSpec((1, mg, 1, 1), lambda g, b: (_I0, g, _I0, _I0),
                            memory_space=pltpu.VMEM)

    def spec_op(k):
        return pl.BlockSpec((k, mg, R, LANES), lambda g, b: (_I0, g, _I0, _I0),
                            memory_space=pltpu.VMEM)

    tab_specs = [
        spec_tab((mg, R, LANES)), spec_tab((mg, R, LANES)),
        spec_tab((mg, R, LANES)), spec_tab((mg, R, LANES)),
        spec_tab((mg, 1, n - LANES)), spec_tab((mg, 1, n - LANES)),
        spec_tab((mg, 1, n - LANES)), spec_tab((mg, 1, n - LANES)),
        spec_tab((mg, LOG_LANES, LANES)), spec_tab((mg, LOG_LANES, LANES)),
        spec_tab((mg, LOG_LANES, LANES)), spec_tab((mg, LOG_LANES, LANES)),
    ]
    # numpy here, jnp.asarray INSIDE call: this builder is lru-cached, and
    # converting at build time under an outer jit trace would cache tracers
    # (UnexpectedTracerError on the next use)
    tab_np = (twh, twl, stwh, stwl, wmh, wml, wsh, wsl, lvh, lvl, lsh, lsl)

    def call(xbh, xbl, *operands):
        """xbh/xbl: [B*nstack, padded_m, R, 128] (stack folded batch-major).
        encrypt operands: (pkh, pkl) each [2, padded_m, R, 128];
        decrypt operands: (sh, sl, sph, spl) each [padded_m, R, 128]."""
        B = xbh.shape[0] // nstack
        grid = (padded_m // mg, B)
        if encrypt:
            in_specs = ([spec_x(nstack)] * 2 + tab_specs
                        + [spec_op(2)] * 2 + [spec_scalar()] * 4)
            extra = [jnp.asarray(pnh[None]), jnp.asarray(pnl[None])]
            out_specs = [spec_x(2), spec_x(2)]
            out_sd = jax.ShapeDtypeStruct((B * 2, padded_m, R, LANES),
                                          jnp.uint32)
        else:
            in_specs = ([spec_x(nstack)] * 2 + tab_specs
                        + [spec_tab((mg, R, LANES))] * 4
                        + [spec_scalar()] * 2)
            extra = []
            out_specs = [spec_x(1), spec_x(1)]
            out_sd = jax.ShapeDtypeStruct((B, padded_m, R, LANES),
                                          jnp.uint32)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[out_sd, out_sd],
            interpret=interpret,
        )(xbh, xbl, *[jnp.asarray(t) for t in tab_np], *operands,
          jnp.asarray(ph[None]), jnp.asarray(plo[None]), *extra)

    return call, padded_m


def _split_stack(arrs, m, R):
    """u64 [..., m, n] tensors -> ([B*k, m, R, 128] hi, lo) uint32 planes,
    batch-major stacking."""
    xs = [jnp.asarray(t).reshape((-1, m, R, LANES)) for t in arrs]
    xb = jnp.stack(xs, axis=1).reshape((-1, m, R, LANES))
    return ((xb >> jnp.uint64(32)).astype(jnp.uint32),
            xb.astype(jnp.uint32))


def _pad_chans(t, padded_m):
    if t.shape[1] == padded_m:
        return t
    z = jnp.zeros((t.shape[0], padded_m - t.shape[1]) + t.shape[2:], t.dtype)
    return jnp.concatenate([t, z], axis=1)


def _join(hi, lo):
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def lwe_encrypt_fused(u, e1, e2, pka, pkb, ctx, interpret=None):
    """Fused u64 LWE encrypt chain: twist+NTT of u/e1/e2 plus both
    Newton-mulmod muladd combines in one kernel pass.  Same contract as
    ops/ntt_pallas.lwe_encrypt_fused; bit-identical to the jnp graph."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    batch = jnp.asarray(u).shape[:-2]
    call, padded_m = _build_lwe(ring, True, bool(interpret))
    xh, xl = _split_stack([u, e1, e2], m, R)
    pkh, pkl = _split_stack([pka, pkb], m, R)   # [2, m, R, 128]
    xh, xl = _pad_chans(xh, padded_m), _pad_chans(xl, padded_m)
    pkh, pkl = _pad_chans(pkh, padded_m), _pad_chans(pkl, padded_m)
    oh, ol = call(xh, xl, pkh, pkl)
    out = _join(oh[:, :m], ol[:, :m]).reshape((-1, 2, m, R, LANES))
    resa = out[:, 0].reshape(batch + (m, n))
    resb = out[:, 1].reshape(batch + (m, n))
    return resa, resb


def lwe_decrypt_fused(resa, resb, s, sprime, ctx, interpret=None):
    """Fused u64 LWE decrypt head: resb - resa*s (Shoup) + untwisted INTT in
    one kernel pass.  Same contract as ops/ntt_pallas.lwe_decrypt_fused."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    n, m = ring.degree, ring.nmoduli
    R = n // LANES
    batch = jnp.asarray(resa).shape[:-2]
    call, padded_m = _build_lwe(ring, False, bool(interpret))
    xh, xl = _split_stack([resa, resb], m, R)
    sh, sl = _split_stack([s], m, R)
    sph, spl = _split_stack([sprime], m, R)
    xh, xl = _pad_chans(xh, padded_m), _pad_chans(xl, padded_m)
    sh = _pad_chans(sh, padded_m)[0]
    sl = _pad_chans(sl, padded_m)[0]
    sph = _pad_chans(sph, padded_m)[0]
    spl = _pad_chans(spl, padded_m)[0]
    oh, ol = call(xh, xl, sh, sl, sph, spl)
    return _join(oh[:, :m], ol[:, :m]).reshape(batch + (m, n))
