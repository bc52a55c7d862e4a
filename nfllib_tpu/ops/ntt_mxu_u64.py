"""Fused int8 MXU NTT/INTT kernels for the u64 (62-bit-moduli) tier.

The paired-u32 VPU butterfly kernel (ops/ntt_pallas_u64.py) spends ~6
double-word multiplies per butterfly on the VPU; this kernel moves the
multiplies to the MXU with the same four-step formulation as the u32 tier
(ops/ntt_mxu.py), scaled up to 62-bit operands:

  * Values decompose into EIGHT offset-byte digits (d = byte - 128, full
    signed-int8 range, no carry chains) -> 64 int8 MXU dots per mod-matmul,
    with the constant under-count folded into per-row/column pair-valued
    correction vectors.
  * The DFT matrices are pre-scaled per input digit (W^(b) = 2^(8b) W mod p)
    and host-decomposed into balanced carried digits, so the digit
    cross-terms accumulate INSIDE the int32 MXU accumulators
    (|G_a| <= 8*128^2*k < 2^26 for the tier's max contraction 256).
  * Recombination: the eight biased groups pack into one ~83-bit value held
    as three u32 words (shift/carry adds), reduced by a single Barrett step
    with m = floor(2^124/p): q = hi64((v >> 60) * m) fits u32, r = v - q*p
    < 4p exact in wrapping pair arithmetic (p < 2^62).
  * The phi twist/untwist fold into the DFT matrices and pair-Shoup twiddle
    tables exactly as in the u32 kernel; intermediates stay lazy in [0, 2p)
    (< 2^63, so offset-byte digits still cover them); only kernel outputs
    pay the canonical subtract.

Bit-identical to ops/ntt.py's jnp path (reference semantics:
include/nfl/core.hpp:438-614; the 62-bit tier contract of ops.hpp:201-219).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ring import _np_mulmod_vec, _np_shoup_vec, _powers_mod
from ..utils import bitrev_indices, static_log2
from . import modops
from .ntt_pallas_u64 import (
    _split, p_add, p_ge, p_mulhi, p_mullo, p_reduce_once, p_select,
    p_shoup_lazy, p_sub,
)

_NDIG = 8
_BIAS = 1 << 26          # > max |G_a| = 8 * 128^2 * 256 = 2^25
_BIAS_SUM = _BIAS * sum(1 << (8 * a) for a in range(_NDIG))
_I0 = np.int32(0)


def supports_fused(ring) -> bool:
    """Degrees 8..65536 run the single fused kernel; 2^17..2^20 run the
    split large-degree path (_large_run64: two generic mod-matmul kernels
    from ops/dft_mxu.py with UNSCALED 8-plane tables — 8*size^2 int8 <=
    8 MB at size 1024 — bridged by a jnp pair-Shoup twiddle), closing the
    reference's params.hpp:115 headroom (u64 kMaxPolyDegree = 2^20)."""
    if ring.limb != "u64" or ring.degree < 8:
        return False
    if ring.degree <= 65536:
        return True
    n1, n2 = _geometry(ring.degree)
    return max(n1, n2) <= 1024          # degree <= 2^20


def _geometry(n):
    n1 = 1 << (static_log2(n) // 2)
    return n1, n // n1


def _balanced_digits_host64(v):
    """uint64-ish [r, c] (< 2^63 - 2^56) -> [8, r, c] int8 balanced
    base-256 digits (delegates to the one vectorized implementation,
    dft_mxu._balanced_digits_np — this module's old copy ran in
    object-dtype python ints)."""
    from .dft_mxu import _balanced_digits_np
    return _balanced_digits_np(np.asarray(v, dtype=np.uint64), _NDIG)


def _fill_planes64(w1_cm, w2_cm, e1, e2, p):
    """Digit planes of the pre-scaled DFT matrices + the offset-byte
    correction sums (128 * row/col sums of every W^(b), minus the
    recombination bias over-count).  e1/e2 arrive as uint64 canonical
    residues; the per-plane 2^(8b) scale is an exact vectorized Barrett
    mulmod (_np_mulmod_vec) and only the overflow-prone correction sums
    run in python ints."""
    from ..ring import _np_mulmod_vec
    corr1 = np.zeros(e1.shape[0], dtype=object)
    corr2 = np.zeros(e2.shape[1], dtype=object)
    for b in range(_NDIG):
        s1 = _np_mulmod_vec(e1, np.uint64(pow(2, 8 * b, p)), p)
        s2 = _np_mulmod_vec(e2, np.uint64(pow(2, 8 * b, p)), p)
        d1 = _balanced_digits_host64(s1)
        d2 = _balanced_digits_host64(s2)
        for a in range(_NDIG):
            w1_cm[_NDIG * a + b] = d1[a]
            w2_cm[_NDIG * a + b] = d2[a]
        corr1 += 128 * s1.astype(object).sum(axis=1)
        corr2 += 128 * s2.astype(object).sum(axis=0)
    c1 = np.array([(int(v) - _BIAS_SUM) % p for v in corr1], dtype=np.uint64)
    c2 = np.array([(int(v) - _BIAS_SUM) % p for v in corr2], dtype=np.uint64)
    return c1, c2


@functools.lru_cache(maxsize=None)
def _tables64(ring, inverse):
    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    n1, n2 = _geometry(n)
    rev1 = bitrev_indices(n1)
    rev2 = bitrev_indices(n2)

    w1l = np.empty((m, _NDIG * _NDIG, n1, n1), dtype=np.int8)
    w2l = np.empty((m, _NDIG * _NDIG, n2, n2), dtype=np.int8)
    tw = np.empty((m, n1, n2), dtype=np.uint64)
    tws = np.empty((m, n1, n2), dtype=np.uint64)
    corr1 = np.zeros((m, n1, 1), dtype=np.uint64)
    corr2 = np.zeros((m, 1, n2), dtype=np.uint64)
    mbar = np.empty((m, 1, 1), dtype=np.uint64)   # floor(2^124/p)

    r1 = np.asarray(rev1, dtype=np.int64)
    r2 = np.asarray(rev2, dtype=np.int64)
    i1s = np.arange(n1, dtype=np.int64)
    i2s = np.arange(n2, dtype=np.int64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        w = ctx.omega_int[cm]
        phi = ctx.phi_int[cm]
        # VECTORIZED table math (the n1^2 + n2^2 + n1*n2 per-entry python
        # pow() loops cost tens of seconds at degree 65536 x many
        # channels): each matrix entry is base^(idx) * scale^i with idx
        # reducible mod the base's order, so one iterative power table
        # per base (_powers_mod) + fancy indexing + one exact Barrett
        # mulmod (_np_mulmod_vec) replaces every pow().
        if not inverse:
            wc, wr = pow(w, n2, p), pow(w, n1, p)
            pw_wc = _powers_mod(wc, n1, p, obj=True)       # order n1
            pw_wr = _powers_mod(wr, n2, p, obj=True)       # order n2
            pw_w = _powers_mod(w, n, p, obj=True)          # order n
            phi_n2 = _powers_mod(pow(phi, n2, p), n1, p, obj=True)
            phi_i2 = _powers_mod(phi, n2, p, obj=True)
            e1 = _np_mulmod_vec(pw_wc[(r1[:, None] * i1s[None, :]) % n1],
                                phi_n2[None, :], p)
            e2 = pw_wr[(i2s[:, None] * r2[None, :]) % n2]
            t = _np_mulmod_vec(pw_w[(r1[:, None] * i2s[None, :]) % n],
                               phi_i2[None, :], p)
        else:
            iw = pow(w, -1, p)
            iphi = pow(phi, -1, p)
            inv_deg = int(ctx.invpolyDegree[cm])
            iwc, iwr = pow(iw, n2, p), pow(iw, n1, p)
            pw_iwc = _powers_mod(iwc, n1, p, obj=True)
            pw_iwr = _powers_mod(iwr, n2, p, obj=True)
            pw_iw = _powers_mod(iw, n, p, obj=True)
            iphi_n2 = _powers_mod(pow(iphi, n2, p), n1, p, obj=True)
            # n^-1 folds into the iphi^i2 scale of the twiddle
            iphi_i2 = _powers_mod(iphi, n2, p, start=inv_deg, obj=True)
            e1 = _np_mulmod_vec(                            # W1inv'
                pw_iwc[(i1s[:, None] * r1[None, :]) % n1],
                iphi_n2[:, None], p)
            e2 = pw_iwr[(r2[:, None] * i2s[None, :]) % n2]  # W2inv
            t = _np_mulmod_vec(pw_iw[(r1[:, None] * i2s[None, :]) % n],
                               iphi_i2[None, :], p)
        tw[cm] = t
        tws[cm] = _np_shoup_vec(t, p, 64)
        c1, c2 = _fill_planes64(w1l[cm], w2l[cm], e1, e2, p)
        corr1[cm, :, 0] = c1
        corr2[cm, 0, :] = c2
        mbar[cm, 0, 0] = (1 << 124) // p

    p_vec = ctx.p.reshape(m, 1, 1)
    return (n1, n2, w1l, w2l, _split(tw), _split(tws), _split(corr1),
            _split(corr2), _split(mbar), _split(p_vec))


def _digitize64(xp):
    """(hi, lo) uint32 pair [r, c] (value < 2^63) -> 8 int8 offset-byte
    digit planes.  Shifts happen in uint32 (logical — an int32 arithmetic
    shift would sign-extend for lo >= 2^31); the int8 cast wraps mod 256,
    making the subsequent -128 exact per byte."""
    hi, lo = xp
    off = jnp.int32(128)
    digs = [((lo >> (8 * a)).astype(jnp.int32) - off).astype(jnp.int8)
            for a in range(4)]
    digs += [((hi >> (8 * a)).astype(jnp.int32) - off).astype(jnp.int8)
             for a in range(4)]
    return digs


def _recombine64(groups, p, mbar, corr, strict):
    """sum_a 2^(8a) (G_a + BIAS) mod p via one Barrett step.

    groups: 8 int32 arrays; p, mbar, corr: (hi, lo) pairs.  Carry-free
    formulation: r = v - q*p < 4p < 2^64 only needs v mod 2^64 (word 0's
    carries feed word 1; word 1's own overflow is irrelevant), and the
    Barrett input a = floor(v/2^60) tolerates slack — a' sums the floored
    per-group shifts of G'_4..G'_7 (the dropped G'_0..G'_3 terms total < 1
    and each of the 4 floors loses < 1, so floor(v/2^60) - a' <= 4), giving
    q = hi64(a'*mbar) > v/p - v/2^124 - 4*2^60/p - 1 > v/p - 4 for the
    62-bit tier (p > 2^61), hence 0 <= r < 4p, exact in wrapping pairs."""
    bias = jnp.int32(_BIAS)
    g = [(groups[a] + bias).astype(jnp.uint32) for a in range(_NDIG)]
    # word 0: g0..g3 shifted into bits 0..31 (carries feed word 1)
    w0 = g[0] + (g[1] << 8)
    c = (w0 < g[0]).astype(jnp.uint32)
    w0b = w0 + (g[2] << 16)
    c = c + (w0b < w0).astype(jnp.uint32)
    w0c = w0b + (g[3] << 24)
    c = c + (w0c < w0b).astype(jnp.uint32)
    # word 1 mod 2^32: spill of g1..g3 + carries + g4..g7 shifted (wrap ok)
    w1c = ((g[1] >> 24) + (g[2] >> 16) + (g[3] >> 8) + c + g[4]
           + (g[5] << 8) + (g[6] << 16) + (g[7] << 24))
    a60 = (g[4] >> 28) + (g[5] >> 20) + (g[6] >> 12) + (g[7] >> 4)
    z = jnp.zeros_like(a60)
    q = p_mulhi((z, a60), mbar)[1]                # hi64 of a60*m, < 2^22
    r = p_sub((w1c, w0c), p_mullo((z, q), p))     # v - q*p < 4p < 2^64
    two_p = p_add(p, p)
    r = p_select(p_ge(r, two_p), p_sub(r, two_p), r)
    r = p_add(r, corr)                            # + (offset - bias) corr < p
    r = p_select(p_ge(r, two_p), p_sub(r, two_p), r)
    if strict:
        r = p_reduce_once(r, p)
    return r


def _left_matmul64(xp, w_ref, p, mbar, corr, bb, n1, n2, strict):
    xd = _digitize64(xp)
    groups = []
    for a in range(_NDIG):
        per_b = []
        for i in range(bb):
            acc = None
            for b in range(_NDIG):
                s = jax.lax.dot_general(
                    w_ref[_NDIG * a + b], xd[b][i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = s if acc is None else acc + s
            per_b.append(acc)
        groups.append(jnp.stack(per_b) if bb > 1 else per_b[0][None])
    return _recombine64(groups, p, mbar, corr, strict)


def _right_matmul64(xp, w_ref, p, mbar, corr, bb, n1, n2, strict):
    xd = _digitize64(xp)
    groups = []
    if n1 >= 8:
        xs = [d.reshape(bb * n1, n2) for d in xd]
        for a in range(_NDIG):
            acc = None
            for b in range(_NDIG):
                s = jax.lax.dot_general(
                    xs[b], w_ref[_NDIG * a + b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = s if acc is None else acc + s
            groups.append(acc.reshape(bb, n1, n2))
    else:
        # tiny degrees: the bb*n1 int8 merge is an unsupported Mosaic
        # shape cast (sub-sublane rows); per-element dots instead
        for a in range(_NDIG):
            per = []
            for i in range(bb):
                acc = None
                for b in range(_NDIG):
                    s = jax.lax.dot_general(
                        xd[b][i], w_ref[_NDIG * a + b],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = s if acc is None else acc + s
                per.append(acc)
            groups.append(jnp.stack(per) if bb > 1 else per[0][None])
    return _recombine64(groups, p, mbar, corr, strict)


def _kernel64(inverse, strict_checks, bb, n1, n2,
              xh_ref, xl_ref, w1_ref, w2_ref, twh_ref, twl_ref,
              tsh_ref, tsl_ref, c1h_ref, c1l_ref, c2h_ref, c2l_ref,
              mh_ref, ml_ref, ph_ref, pl_ref, oh_ref, ol_ref):
    p = (ph_ref[0, 0, 0], pl_ref[0, 0, 0])
    mbar = (mh_ref[0, 0, 0], ml_ref[0, 0, 0])
    c1 = (c1h_ref[0], c1l_ref[0])
    c2 = (c2h_ref[0], c2l_ref[0])
    tw = (twh_ref[0], twl_ref[0])
    tws = (tsh_ref[0], tsl_ref[0])
    x = (xh_ref[...].reshape(bb, n1, n2), xl_ref[...].reshape(bb, n1, n2))

    first = (_left_matmul64 if not inverse else _right_matmul64)
    second = (_right_matmul64 if not inverse else _left_matmul64)
    cfirst, csecond = (c1, c2) if not inverse else (c2, c1)
    wfirst = w1_ref[0] if not inverse else w2_ref[0]
    wsecond = w2_ref[0] if not inverse else w1_ref[0]

    two_p = p_add(p, p)
    bad = jnp.bool_(False)
    x = first(x, wfirst, p, mbar, cfirst, bb, n1, n2, strict=False)
    if strict_checks:
        bad = bad | jnp.any(p_ge(x, two_p))       # lazy contract: < 2p
    x = p_shoup_lazy(x, tw, tws, p)               # twiddle, lazy < 2p < 2^63
    if strict_checks:
        bad = bad | jnp.any(p_ge(x, two_p))
    x = second(x, wsecond, p, mbar, csecond, bb, n1, n2, strict=True)
    if strict_checks:
        # in-kernel strict-mod: poison the block on contract violation; the
        # dispatch-level boundary check (ops/ntt.py _strict_bracket) raises.
        bad = bad | jnp.any(p_ge(x, p))
        ones = jnp.uint32(0xFFFFFFFF)
        x = (jnp.where(bad, ones, x[0]), jnp.where(bad, ones, x[1]))
    oh_ref[...] = x[0].reshape(bb, 1, n1, n2)
    ol_ref[...] = x[1].reshape(bb, 1, n1, n2)


def _batch_block(B, n):
    """~8 MB VMEM estimate: pairs + 8 int8 digit planes + int32 groups live
    (~30 words/coeff)."""
    cap = max(1, (8 << 20) // (30 * 4 * n))
    for bb in (8, 4, 2):
        if bb <= cap and B % bb == 0:
            return bb
    return 1


@functools.lru_cache(maxsize=None)
def _build64(ring, inverse, interpret, strict_checks=False):
    m = ring.nmoduli
    (n1, n2, w1l, w2l, (twh, twl), (tsh, tsl), (c1h, c1l), (c2h, c2l),
     (mh, ml), (ph, plo)) = _tables64(ring, inverse)

    def call(xbh, xbl):
        B = xbh.shape[0]
        bb = _batch_block(B, ring.degree)

        def spec_x(k):
            return pl.BlockSpec((k, 1, n1, n2),
                                lambda c, b: (b, c, _I0, _I0),
                                memory_space=pltpu.VMEM)

        def spec_tab(shape):
            return pl.BlockSpec(
                shape, lambda c, b: (c,) + (_I0,) * (len(shape) - 1),
                memory_space=pltpu.VMEM)

        out_sd = jax.ShapeDtypeStruct(xbh.shape, jnp.uint32)
        return pl.pallas_call(
            functools.partial(_kernel64, inverse, strict_checks, bb, n1, n2),
            grid=(m, B // bb),
            in_specs=[
                spec_x(bb), spec_x(bb),
                spec_tab((1, _NDIG * _NDIG, n1, n1)),
                spec_tab((1, _NDIG * _NDIG, n2, n2)),
                spec_tab((1, n1, n2)), spec_tab((1, n1, n2)),
                spec_tab((1, n1, n2)), spec_tab((1, n1, n2)),
                spec_tab((1, n1, 1)), spec_tab((1, n1, 1)),
                spec_tab((1, 1, n2)), spec_tab((1, 1, n2)),
                pl.BlockSpec((1, 1, 1), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda c, b: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[spec_x(bb), spec_x(bb)],
            out_shape=[out_sd, out_sd],
            interpret=interpret,
        )(xbh, xbl, jnp.asarray(w1l), jnp.asarray(w2l),
          jnp.asarray(twh), jnp.asarray(twl), jnp.asarray(tsh),
          jnp.asarray(tsl), jnp.asarray(c1h), jnp.asarray(c1l),
          jnp.asarray(c2h), jnp.asarray(c2l), jnp.asarray(mh),
          jnp.asarray(ml), jnp.asarray(ph), jnp.asarray(plo))

    return call


# ---------------------------------------------------------------------------
# Large-degree path (2^17..2^20): generic dft_mxu mod-matmul kernels with
# Harvey-ordered matrices, bridged by a jnp pair-Shoup twiddle.  One 8 MB
# table per kernel call instead of 64 pre-scaled planes that outgrow VMEM.
# ---------------------------------------------------------------------------

def _large_e1_fwd(ring, size):
    """Column-DFT matrices e1[r, i1] = (wc^rev(r) * phi^n2)^i1 (the phi
    twist's i1 part folded in), rows in Harvey bit-reversed output order —
    identical math to _tables64's e1, built vectorized."""
    from ..ring import _np_mulmod_vec
    ctx = ring.context()
    n = ring.degree
    n1, n2 = _geometry(n)
    assert size == n1
    rev1 = bitrev_indices(n1)
    m = ring.nmoduli
    mats = np.empty((m, n1, n1), dtype=np.uint64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        w, phi = ctx.omega_int[cm], ctx.phi_int[cm]
        wc = pow(w, n2, p)
        phin2 = pow(phi, n2, p)
        wcr = np.array([pow(wc, int(r), p) for r in rev1], dtype=np.uint64)
        q = _np_mulmod_vec(wcr, np.uint64(phin2), p)     # per-row ratio
        e = mats[cm]
        e[:, 0] = 1
        for i1 in range(1, n1):
            e[:, i1] = _np_mulmod_vec(e[:, i1 - 1], q, p)
    return mats


def _large_e2_fwd(ring, size):
    """Row-DFT matrices e2[i2, c] = (wr^rev(c))^i2, columns bit-reversed."""
    from ..ring import _np_mulmod_vec
    ctx = ring.context()
    n = ring.degree
    n1, n2 = _geometry(n)
    assert size == n2
    rev2 = bitrev_indices(n2)
    m = ring.nmoduli
    mats = np.empty((m, n2, n2), dtype=np.uint64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        wr = pow(ctx.omega_int[cm], n1, p)
        q = np.array([pow(wr, int(c), p) for c in rev2], dtype=np.uint64)
        e = mats[cm]
        e[0, :] = 1
        for i2 in range(1, n2):
            e[i2, :] = _np_mulmod_vec(e[i2 - 1, :], q, p)
    return mats


def _large_e1_inv(ring, size):
    """Inverse column matrices e1[i1, r] = (iwc^rev(r) * iphi^n2)^i1 (the
    n^-1-free untwist i1 part folded in)."""
    from ..ring import _np_mulmod_vec
    ctx = ring.context()
    n = ring.degree
    n1, n2 = _geometry(n)
    assert size == n1
    rev1 = bitrev_indices(n1)
    m = ring.nmoduli
    mats = np.empty((m, n1, n1), dtype=np.uint64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        iw = pow(ctx.omega_int[cm], -1, p)
        iphi = pow(ctx.phi_int[cm], -1, p)
        iwc = pow(iw, n2, p)
        iphin2 = pow(iphi, n2, p)
        iwcr = np.array([pow(iwc, int(r), p) for r in rev1], dtype=np.uint64)
        q = _np_mulmod_vec(iwcr, np.uint64(iphin2), p)   # per-column ratio
        e = mats[cm]
        e[0, :] = 1
        for i1 in range(1, n1):
            e[i1, :] = _np_mulmod_vec(e[i1 - 1, :], q, p)
    return mats


def _large_e2_inv(ring, size):
    """Inverse row matrices e2[c, i2] = (iwr^rev(c))^i2."""
    from ..ring import _np_mulmod_vec
    ctx = ring.context()
    n = ring.degree
    n1, n2 = _geometry(n)
    assert size == n2
    rev2 = bitrev_indices(n2)
    m = ring.nmoduli
    mats = np.empty((m, n2, n2), dtype=np.uint64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        iwr = pow(pow(ctx.omega_int[cm], -1, p), n1, p)
        q = np.array([pow(iwr, int(c), p) for c in rev2], dtype=np.uint64)
        e = mats[cm]
        e[:, 0] = 1
        for i2 in range(1, n2):
            e[:, i2] = _np_mulmod_vec(e[:, i2 - 1], q, p)
    return mats


@functools.lru_cache(maxsize=None)
def _large_twiddle(ring, inverse):
    """[m, n1, n2] twiddle (+ 64-bit Shoup companions), applied as the
    first dft_mxu matmul's in-kernel epilogue:
    fwd t[r, i2] = (w^rev(r) * phi)^i2; inv t[r, i2] = inv_deg *
    (iw^rev(r) * iphi)^i2 (the i2 untwist and n^-1 folded in)."""
    from ..ring import _np_mulmod_vec, _np_shoup_vec
    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    n1, n2 = _geometry(n)
    rev1 = bitrev_indices(n1)
    tw = np.empty((m, n1, n2), dtype=np.uint64)
    tws = np.empty((m, n1, n2), dtype=np.uint64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        w, phi = ctx.omega_int[cm], ctx.phi_int[cm]
        if inverse:
            w, phi = pow(w, -1, p), pow(phi, -1, p)
        start = int(ctx.invpolyDegree[cm]) if inverse else 1
        wr = np.array([pow(w, int(r), p) for r in rev1], dtype=np.uint64)
        q = _np_mulmod_vec(wr, np.uint64(phi), p)        # per-row ratio
        t = tw[cm]
        t[:, 0] = start
        for i2 in range(1, n2):
            t[:, i2] = _np_mulmod_vec(t[:, i2 - 1], q, p)
        tws[cm] = _np_shoup_vec(t.reshape(-1), p, 64).reshape(n1, n2)
    return tw, tws


def _register_large_providers():
    from . import dft_mxu
    reg = dft_mxu.register_matrix_provider
    reg("ntt64_e1_fwd", _large_e1_fwd)
    reg("ntt64_e2_fwd", _large_e2_fwd)
    reg("ntt64_e1_inv", _large_e1_inv)
    reg("ntt64_e2_inv", _large_e2_inv)


def _large_run64(x, ctx, inverse, interpret):
    from . import dft_mxu
    _register_large_providers()
    ring = ctx.ring
    m, n = ring.nmoduli, ring.degree
    n1, n2 = _geometry(n)
    x = jnp.asarray(x)
    batch = x.shape[:-2]
    xb = x.reshape((-1, m, n1, n2))
    # The inter-matmul [m, n1, n2] pair-Shoup twiddle stays a SEPARATE jnp
    # pass.  Every alternative has been tried and REJECTED under the
    # round-5 paired protocol (TWIDDLE_AB.json, 2^20 m=2, bit-exact in
    # all cases):
    #   * in-kernel matmul EPILOGUE fusion (matmul_mod twiddle=...):
    #     1.04-1.07x SLOWER (extra resident operand blocks stall the
    #     kernel pipeline);
    #   * PAIR-NATIVE Pallas bridge chained through matmul pair I/O
    #     (ops/pair_bridge.py, pair_out=/tuple-in): 1.04-1.07x SLOWER —
    #     although the bridge measures ~3.3x its traffic floor STANDALONE
    #     (257 us vs 78 us), XLA fuses the merge + emulated-u64 multiply +
    #     re-split into the surrounding program in-chain, so the jnp form
    #     was already at its practical floor and the Pallas call only adds
    #     per-program overhead.  Both capabilities remain available and
    #     bit-exactness-tested for shapes where the tradeoff differs.
    tw, tws = _large_twiddle(ring, inverse)
    p3 = jnp.asarray(ctx.p_col)[..., None]
    prov1, prov2 = (("ntt64_e1_fwd", "ntt64_e2_fwd") if not inverse
                    else ("ntt64_e2_inv", "ntt64_e1_inv"))
    s1, a1, s2, a2 = ((n1, -2, n2, -1) if not inverse
                      else (n2, -1, n1, -2))
    f = dft_mxu.matmul_mod(xb, ring, prov1, s1, axis=a1,
                           interpret=interpret)
    f = modops.mulmod_shoup(f, jnp.asarray(tw), jnp.asarray(tws), p3)
    o = dft_mxu.matmul_mod(f, ring, prov2, s2, axis=a2,
                           interpret=interpret)
    return o.reshape(batch + (m, n))


def _run64(x, ctx, inverse, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    m, n = ring.nmoduli, ring.degree
    if n > 65536:
        return _large_run64(x, ctx, inverse, bool(interpret))
    n1, n2 = _geometry(n)
    x = jnp.asarray(x)
    batch = x.shape[:-2]
    xb = x.reshape((-1, m, n1, n2))
    xbh = (xb >> jnp.uint64(32)).astype(jnp.uint32)
    xbl = xb.astype(jnp.uint32)
    from .. import debug
    call = _build64(ring, bool(inverse), bool(interpret),
                    debug.strictmod_enabled())
    oh, ol = call(xbh, xbl)
    out = (oh.astype(jnp.uint64) << jnp.uint64(32)) | ol.astype(jnp.uint64)
    return out.reshape(batch + (m, n))


def ntt_pow_phi_fused(x, ctx, *, interpret=None):
    """Forward negacyclic transform of u64 [..., m, n] via the fused int8
    MXU kernel; bit-identical to ops/ntt.py ntt_pow_phi."""
    return _run64(x, ctx, False, interpret)


def invntt_pow_invphi_fused(x, ctx, *, interpret=None):
    """Inverse negacyclic transform (fused untwist); bit-identical to
    ops/ntt.py invntt_pow_invphi."""
    return _run64(x, ctx, True, interpret)
