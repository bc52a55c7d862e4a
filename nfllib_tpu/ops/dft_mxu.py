"""Fused int8 MXU kernels for the four-step NTT's LOCAL sub-DFTs.

The distributed four-step transform (parallel/ntt_dist.py) runs size-n1
column DFTs and size-n2 row DFTs on each device; this module gives those
stages the same MXU treatment as the single-chip kernels (ops/ntt_mxu.py),
so the per-device math runs at the fused-kernel rate instead of the jnp
stage loop's (round-2 VERDICT item 2).

Differences from the single-chip kernels, driven by the distributed shapes:

  * The DFT matrix is DENSE NATURAL ORDER: Wd[i, k] = r^(i*k) mod p with
    r = omega^(n/size) (inverse: r = omega^-(n/size)) — the four-step local
    stages want natural-order outputs (no Harvey reordering, no twist).
    Wd is symmetric, so ONE table serves both the column stage (Wd @ X,
    contracting the sublane axis) and the row stage (X @ Wd).
  * UNSCALED digit planes: local sizes reach 1024 (n = 2^20 symmetric
    split), where the single-chip kernels' pre-scaled layout (ndig^2 planes)
    would need 16-64 MB of VMEM.  Here W decomposes into just ndig balanced
    planes; with the output rows blocked, the row block's planes
    (ndig * rblk * size int8, 2 MB at u64 size 1024) are ONE VMEM operand,
    so each program runs the full ndig^2 dot set in a single grid step.
    Digit cross products fold into per-k int32 GROUP values held locally
    (one add per partial); the biased groups pack into exact multi-word
    values once, finished by a two-part Barrett recombination (lo/hi
    halves combined by one Shoup multiply with 2^(8*ndig) mod p).  This
    single-step structure measured 2.2-4x over the round-3
    plane-per-grid-step + incremental-pack design (grid-step overhead and
    per-partial scratch read-modify-write dominated).
  * Offset-byte digitize for X (d = byte - 128, no carries); the constant
    under-count has the closed form 128 * S * rowsum(Wd) with
    S = sum_b 2^(8b), folded into one correction vector per table together
    with the pack-bias over-count.

Exactness: |G_k| <= npairs * 128^2 * size <= ndig * 2^14 * size, int32-exact
for size <= 2^13; the biased pack's Barrett slack proof matches
ops/ntt_mxu._recombine_groups (r < 4p).  Bit-identical to the jnp path
(tests/test_parallel.py backend-equivalence).

Reference anchor: the engine layer this stands in for is the reference's
SIMD NTT specializations (include/nfl/opt/arch/{sse,avx2}.hpp) applied to
the degree-sharded axis the reference never had (SURVEY.md §2 closing note).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modops
from .ntt_pallas_u64 import (
    _split, p_add, p_ge, p_mulhi, p_mullo, p_select, p_shoup_lazy, p_sub,
)

_I0 = np.int32(0)

# table-size cap: ndig * size^2 int8 must stay VMEM-resident alongside the
# data blocks (u32: 4*size^2, u64: 8*size^2 -> 4/8 MB at size 1024)
_MAX_SIZE = {"u32": 1024, "u64": 1024}


def supports(ring, size: int) -> bool:
    return (ring.limb in _MAX_SIZE and 8 <= size <= _MAX_SIZE[ring.limb]
            and (size & (size - 1)) == 0)


def _ndig(limb):
    return 4 if limb == "u32" else 8


def _bias_bits(limb, size):
    """Per-PARTIAL bias: each (a, b) dot's |S_ab| <= 128^2 * size = 2^14 *
    size, so biasing every partial product by the next power of two keeps
    the incremental pack additions nonnegative; the total over-count has
    the closed form bias * S^2 (S = sum_b 2^(8b)), folded into corr."""
    return int(np.ceil(np.log2(size))) + 14


def _balanced_digits_np(v, ndig):
    """uint64 [..., r, c] -> [ndig, ..., r, c] int8 balanced base-256 digits,
    fully vectorized (no object arrays: v < 2^63 - 2^56 so the carried top
    digit stays in int8 range)."""
    v = np.asarray(v, dtype=np.uint64)
    digs = []
    carry = np.zeros(v.shape, dtype=np.int64)
    for a in range(ndig - 1):
        u = ((v >> np.uint64(8 * a)) & np.uint64(0xFF)).astype(np.int64) \
            + carry
        carry = (u >= 128).astype(np.int64)
        digs.append(u - (carry << 8))
    digs.append((v >> np.uint64(8 * (ndig - 1))).astype(np.int64) + carry)
    out = np.stack(digs, axis=0)
    assert out.min() >= -128 and out.max() <= 127
    return out.astype(np.int8)


# Custom square mod-matmul matrices (e.g. the large-degree u64 NTT's
# Harvey-ordered DFT factors, ops/ntt_mxu_u64.py) plug in by name: a
# provider maps (ring, size) -> [m, size, size] uint64 matrices.
_MATRIX_PROVIDERS = {}


def register_matrix_provider(name: str, fn) -> None:
    _MATRIX_PROVIDERS[name] = fn


def _dft_matrix(ring, size, inverse):
    """Dense natural-order DFT matrices Wd[i, k] = r^(i*k) with
    r = omega^(n/size) (or its inverse), built column-iteratively with
    vectorized exact modmuls."""
    from ..ring import _np_mulmod_vec

    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    mats = np.empty((m, size, size), dtype=np.uint64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        r = pow(ctx.omega_int[cm], n // size, p)
        if inverse:
            r = pow(r, -1, p)
        col0 = np.empty(size, dtype=np.uint64)
        acc = 1
        for i in range(size):
            col0[i] = acc
            acc = (acc * r) % p
        wd = mats[cm]
        wd[:, 0] = 1
        for k in range(1, size):
            wd[:, k] = _np_mulmod_vec(wd[:, k - 1], col0, p)
    return mats


register_matrix_provider("dft_fwd", lambda r, s: _dft_matrix(r, s, False))
register_matrix_provider("dft_inv", lambda r, s: _dft_matrix(r, s, True))


@functools.lru_cache(maxsize=None)
def _custom_tables(ring, provider: str, size: int, left: bool):
    """Per-(ring, provider, size, side) tables: balanced digit planes of
    the provider's matrices, the offset/bias correction vector (row sums
    for the left side, column sums for the right), and the recombination
    SMEM constants."""
    m = ring.nmoduli
    ndig = _ndig(ring.limb)
    bias = 1 << _bias_bits(ring.limb, size)
    ngroups = 2 * ndig - 1
    S = sum(1 << (8 * b) for b in range(ndig))
    bias_sum = bias * S * S          # one bias per (a, b) partial product

    mats = _MATRIX_PROVIDERS[provider](ring, size)
    planes = np.empty((m, ndig, size, size), dtype=np.int8)
    corr = np.empty((m, size), dtype=np.uint64)
    # SMEM consts per channel: [m_barrett, c_hi, c_hi_shoup] (u32 only;
    # the u64 kernel wrappers build pair-split equivalents)
    consts = np.zeros((m, 4), dtype=np.uint64)

    for cm in range(m):
        p = int(ring.moduli[cm])
        wd = mats[cm]
        planes[cm] = _balanced_digits_np(wd, ndig)
        sums = wd.astype(object).sum(axis=1 if left else 0)
        corr[cm] = np.array(
            [((128 * S * int(v)) - bias_sum) % p for v in sums],
            dtype=np.uint64)
        if ring.limb == "u32":
            chi = pow(2, 8 * ndig, p)           # 2^(8*ndig) mod p
            consts[cm, 0] = (1 << 60) // p
            consts[cm, 1] = chi
            consts[cm, 2] = (chi << 32) // p
    return planes, corr, consts, bias, ndig


# ---------------------------------------------------------------------------
# kernels: one grid step per output block, local group sums, exact pack
#
# Grid = (channel, batch, other-block, row-block).  Each program holds the
# row block's FULL digit-plane slice [ndig, rblk, size] (int8, 2 MB at u64
# size 1024) plus the x block's cached int8 digits (computed once per
# resident block), runs all ndig^2 dots, folds each partial into a local
# int32 group value with one add, packs the biased groups into exact
# multi-word values (carry chains once per block, not per partial), and
# finishes the two-part Barrett recombination before writing the block.
# ---------------------------------------------------------------------------

def _digitize_offset_u32(x, ndig):
    xi = x.astype(jnp.int32)
    off = jnp.int32(128)
    return [((xi >> (8 * a)) - off).astype(jnp.int8) for a in range(ndig)]


def _digitize_offset_u64(xp, ndig):
    hi, lo = xp
    off = jnp.int32(128)
    digs = [((lo >> (8 * a)).astype(jnp.int32) - off).astype(jnp.int8)
            for a in range(4)]
    digs += [((hi >> (8 * a)).astype(jnp.int32) - off).astype(jnp.int8)
             for a in range(ndig - 4)]
    return digs


def _combine_parts_u32(r_lo, r_hi, chi, chis, corr, p, strict):
    """result = r_lo + shoup(r_hi, 2^(8*ndig)) + corr, lazily reduced."""
    two_p = p + p
    r_lo = r_lo - jnp.where(r_lo >= two_p, two_p, jnp.zeros_like(r_lo))
    hi_term = modops.mulmod_shoup_lazy(r_hi, chi, chis, p)       # < 2p
    r = r_lo + hi_term                                           # < 4p
    r = r - jnp.where(r >= two_p, two_p, jnp.zeros_like(r))
    r = r + corr                                                 # < 3p
    r = r - jnp.where(r >= two_p, two_p, jnp.zeros_like(r))
    if strict:
        r = r - jnp.where(r >= p, p, jnp.zeros_like(r))
    return r


def _combine_parts_u64(r_lo, r_hi, chi, chis, corr, p, strict):
    two_p = p_add(p, p)
    r_lo = p_select(p_ge(r_lo, two_p), p_sub(r_lo, two_p), r_lo)
    hi_term = p_shoup_lazy(r_hi, chi, chis, p)                   # < 2p
    r = p_add(r_lo, hi_term)
    r = p_select(p_ge(r, two_p), p_sub(r, two_p), r)
    r = p_add(r, corr)
    r = p_select(p_ge(r, two_p), p_sub(r, two_p), r)
    if strict:
        r = p_select(p_ge(r, p), p_sub(r, p), r)
    return r


def _kernel_u32(left, size, other, rblk, ndig, bias, strict, twiddle,
                dig_cache,
                x_ref, w_ref, corr_ref, sh_ref, p_ref, *rest):
    if twiddle:
        tw_ref, tws_ref, o_ref, dig_ref = rest
    else:
        o_ref, dig_ref = rest
    rb = pl.program_id(3)
    p = p_ref[0, 0, 0]
    shape = (size, other) if left else (other, size)
    oshape = (rblk, other) if left else (other, rblk)
    bconst = jnp.int32(bias)

    # the x block stays resident across the rb grid steps; digitize it ONCE
    # into int8 scratch instead of nrb times (pure VPU work)
    if dig_cache:
        @pl.when(rb == 0)
        def _():
            x = x_ref[...].reshape(shape).astype(jnp.uint32)
            for b, d in enumerate(_digitize_offset_u32(x, ndig)):
                dig_ref[b] = d
        xd = [dig_ref[b] for b in range(ndig)]
    else:
        x = x_ref[...].reshape(shape).astype(jnp.uint32)
        xd = _digitize_offset_u32(x, ndig)

    # GROUP-SUM accumulation (round 4): with the rows blocked, ALL ndig
    # digit planes of the row block fit in one VMEM operand, so every
    # program runs the full ndig^2 dot set in ONE grid step, folding each
    # (a, b) partial into a LOCAL int32 group value G_{a+b} (one add;
    # |G_k| <= n_k * 128^2 * size fits int32) — no multi-step scratch
    # accumulators, no per-partial carry chains
    G = [None] * (2 * ndig - 1)
    for a in range(ndig):
        for b in range(ndig):
            if left:
                s = jax.lax.dot_general(
                    w_ref[0, a], xd[b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:
                s = jax.lax.dot_general(
                    xd[b], w_ref[0, a], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            k = a + b
            G[k] = s if G[k] is None else G[k] + s

    m60 = sh_ref[0, 0, 0]
    chi = sh_ref[0, 0, 1]
    chis = sh_ref[0, 0, 2]
    # n_k biased group values: g'_k = G_k + n_k * bias >= 0 (bias =
    # max |partial|), g'_k < 2^(bias_bits + 3); the bias over-count
    # sum_k 2^(8k) n_k bias = bias * S^2 is already folded into corr
    nk = [min(k + 1, 2 * ndig - 1 - k, ndig) for k in range(2 * ndig - 1)]
    g = [(G[k] + jnp.int32(nk[k]) * bconst).astype(jnp.uint32)
         for k in range(2 * ndig - 1)]
    g.append(jnp.zeros_like(g[0]))           # pad part1 to ndig groups
    rs = []
    for part in range(2):
        g0, g1, g2, g3 = g[4 * part:4 * part + 4]
        # exact (hi, lo) of v = g0 + 2^8 g1 + 2^16 g2 + 2^24 g3
        hi = (g1 >> 24) + (g2 >> 16) + (g3 >> 8)
        lo = g0 + (g1 << 8)
        c = (lo < g0).astype(jnp.uint32)
        lo1 = lo + (g2 << 16)
        c = c + (lo1 < lo).astype(jnp.uint32)
        lo2 = lo1 + (g3 << 24)
        c = c + (lo2 < lo1).astype(jnp.uint32)
        hi = hi + c
        a28 = (hi << 4) | (lo2 >> 28)        # exact floor(v/2^28)
        q = modops._mulhi_u32(a28, m60)
        rs.append(lo2 - q * p)               # < 3p (exact a28)
    corr = corr_ref[0] if not left else corr_ref[0].reshape(rblk, 1)
    # with a twiddle epilogue the combine may stay lazy (< 2p): the
    # Shoup multiplier accepts any 32-bit multiplicand
    out = _combine_parts_u32(rs[0], rs[1], chi, chis, corr, p,
                             strict and not twiddle)
    if twiddle:
        tw = tw_ref[...].reshape(oshape)
        tws = tws_ref[...].reshape(oshape)
        out = modops.mulmod_shoup_lazy(out, tw, tws, p)  # < 2p
        if strict:
            out = out - jnp.where(out >= p, p, jnp.zeros_like(out))
    o_ref[...] = out.reshape((1, 1) + oshape).astype(o_ref.dtype)


def _kernel_u64(left, size, other, rblk, ndig, bias, strict, twiddle,
                dig_cache,
                xh_ref, xl_ref, w_ref, ch_ref, cl_ref, smh_ref, sml_ref,
                *rest):
    if twiddle:
        (twh_ref, twl_ref, twsh_ref, twsl_ref,
         oh_ref, ol_ref, dig_ref) = rest
    else:
        oh_ref, ol_ref, dig_ref = rest
    rb = pl.program_id(3)
    p = (smh_ref[0, 0, 0], sml_ref[0, 0, 0])
    shape = (size, other) if left else (other, size)
    oshape = (rblk, other) if left else (other, rblk)
    bconst = jnp.int32(bias)

    # digitize the resident x block once per rb sweep (see _kernel_u32)
    if dig_cache:
        @pl.when(rb == 0)
        def _():
            x = (xh_ref[...].reshape(shape), xl_ref[...].reshape(shape))
            for b, d in enumerate(_digitize_offset_u64(x, ndig)):
                dig_ref[b] = d
        xd = [dig_ref[b] for b in range(ndig)]
    else:
        x = (xh_ref[...].reshape(shape), xl_ref[...].reshape(shape))
        xd = _digitize_offset_u64(x, ndig)

    # GROUP-SUM accumulation in one grid step (see _kernel_u32): one int32
    # add per (a, b) partial into the local G_{a+b} (|G_k| <= 8 * 128^2 *
    # size <= 2^27 at size 1024); the exact three-word pack + carry chains
    # run ONCE at the end
    G = [None] * (2 * ndig - 1)
    for a in range(ndig):
        for b in range(ndig):
            if left:
                s = jax.lax.dot_general(
                    w_ref[0, a], xd[b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:
                s = jax.lax.dot_general(
                    xd[b], w_ref[0, a], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            k = a + b
            G[k] = s if G[k] is None else G[k] + s

    tw_refs = ((twh_ref, twl_ref, twsh_ref, twsl_ref) if twiddle else None)
    out = _pack_combine_u64(G, ndig, bconst, p, smh_ref, sml_ref,
                            ch_ref, cl_ref, left, rblk, oshape, strict,
                            tw_refs)
    oh_ref[...] = out[0].reshape((1, 1) + oshape)
    ol_ref[...] = out[1].reshape((1, 1) + oshape)


def _pack_combine_u64(G, ndig, bconst, p, smh_ref, sml_ref, ch_ref, cl_ref,
                      left, rblk, oshape, strict, tw_refs):
    """The u64 VPU epilogue: biased multi-word pack of the int32 group
    values + Barrett + two-part combine (+ optional twiddle Shoup).
    Shared by the plain kernel and the software-pipelined kernel."""
    mbar = (smh_ref[0, 0, 1], sml_ref[0, 0, 1])
    chi = (smh_ref[0, 0, 2], sml_ref[0, 0, 2])
    chis = (smh_ref[0, 0, 3], sml_ref[0, 0, 3])
    # biased group values g'_k = G_k + n_k * bias >= 0, < 2^(bb + 4)
    nk = [min(k + 1, 2 * ndig - 1 - k, ndig) for k in range(2 * ndig - 1)]
    g = [(G[k] + jnp.int32(nk[k]) * bconst).astype(jnp.uint32)
         for k in range(2 * ndig - 1)]
    g.append(jnp.zeros_like(g[0]))           # pad part1 to ndig groups
    rs = []
    for part in range(2):
        g0, g1, g2, g3, g4, g5, g6, g7 = g[8 * part:8 * part + 8]
        # exact (w2, w1, w0) of v = sum_k 2^(8k) g_k, k = 0..7
        w0 = g0 + (g1 << 8)
        c0 = (w0 < g0).astype(jnp.uint32)
        w0a = w0 + (g2 << 16)
        c0 = c0 + (w0a < w0).astype(jnp.uint32)
        w0b = w0a + (g3 << 24)
        c0 = c0 + (w0b < w0a).astype(jnp.uint32)
        base = (g1 >> 24) + (g2 >> 16) + (g3 >> 8) + c0
        w1 = base + g4
        c1 = (w1 < base).astype(jnp.uint32)
        w1a = w1 + (g5 << 8)
        c1 = c1 + (w1a < w1).astype(jnp.uint32)
        w1b = w1a + (g6 << 16)
        c1 = c1 + (w1b < w1a).astype(jnp.uint32)
        w1c = w1b + (g7 << 24)
        c1 = c1 + (w1c < w1b).astype(jnp.uint32)
        w2 = (g5 >> 24) + (g6 >> 16) + (g7 >> 8) + c1
        a60 = (w2 << 4) | (w1c >> 28)        # exact floor(v/2^60)
        z = jnp.zeros_like(a60)
        q = p_mulhi((z, a60), mbar)[1]
        rs.append(p_sub((w1c, w0b), p_mullo((z, q), p)))   # < 3p
    if left:
        corr = (ch_ref[0].reshape(rblk, 1), cl_ref[0].reshape(rblk, 1))
    else:
        corr = (ch_ref[0], cl_ref[0])
    # with a twiddle epilogue the combine may stay lazy (< 2p): the
    # Shoup multiplier accepts any 64-bit multiplicand
    twiddle = tw_refs is not None
    out = _combine_parts_u64(rs[0], rs[1], chi, chis, corr, p,
                             strict and not twiddle)
    if twiddle:
        twh_ref, twl_ref, twsh_ref, twsl_ref = tw_refs
        tw = (twh_ref[...].reshape(oshape), twl_ref[...].reshape(oshape))
        tws = (twsh_ref[...].reshape(oshape),
               twsl_ref[...].reshape(oshape))
        out = p_shoup_lazy(out, tw, tws, p)              # < 2p
        if strict:
            out = p_select(p_ge(out, p), p_sub(out, p), out)
    return out


def _kernel_u64_pipe(left, size, other, rblk, ndig, bias, strict, twiddle,
                     dig_cache, nrb, nsteps,
                     xh_ref, xl_ref, w_ref, ch_ref, cl_ref, smh_ref, sml_ref,
                     *rest):
    """Software-pipelined u64 kernel over a FLATTENED 1-D grid: step t runs
    block t's MXU dot set (into ping-pong int32 group scratch) AND block
    t-1's VPU epilogue (pack/Barrett/combine from the other scratch slot),
    so Mosaic can overlap the epilogue's vector work with the next block's
    matmuls.  One extra drain step packs the final block.  Input index maps
    follow block t (clamped on the drain step); output/corr/twiddle/const
    maps follow block t-1 (clamped on the fill step, where the epilogue is
    skipped and steps 0 and 1 revisit the same output window)."""
    if twiddle:
        (twh_ref, twl_ref, twsh_ref, twsl_ref,
         oh_ref, ol_ref, dig_ref, g0_ref, g1_ref) = rest
        tw_refs = (twh_ref, twl_ref, twsh_ref, twsl_ref)
    else:
        oh_ref, ol_ref, dig_ref, g0_ref, g1_ref = rest
        tw_refs = None
    t = pl.program_id(0)
    ngrp = 2 * ndig - 1
    shape = (size, other) if left else (other, size)
    oshape = (rblk, other) if left else (other, rblk)
    bconst = jnp.int32(bias)
    even = (t % jnp.int32(2)) == 0

    @pl.when(t < jnp.int32(nsteps - 1))
    def _dots():
        if dig_cache:
            @pl.when((t % jnp.int32(nrb)) == 0)
            def _():
                x = (xh_ref[...].reshape(shape), xl_ref[...].reshape(shape))
                for b, d in enumerate(_digitize_offset_u64(x, ndig)):
                    dig_ref[b] = d
            xd = [dig_ref[b] for b in range(ndig)]
        else:
            x = (xh_ref[...].reshape(shape), xl_ref[...].reshape(shape))
            xd = _digitize_offset_u64(x, ndig)
        G = [None] * ngrp
        for a in range(ndig):
            for b in range(ndig):
                if left:
                    s = jax.lax.dot_general(
                        w_ref[0, a], xd[b], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    s = jax.lax.dot_general(
                        xd[b], w_ref[0, a], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                k = a + b
                G[k] = s if G[k] is None else G[k] + s

        @pl.when(even)
        def _():
            for k in range(ngrp):
                g0_ref[k] = G[k]

        @pl.when(jnp.logical_not(even))
        def _():
            for k in range(ngrp):
                g1_ref[k] = G[k]

    def _epi(g_ref):
        p = (smh_ref[0, 0, 0], sml_ref[0, 0, 0])
        G = [g_ref[k] for k in range(ngrp)]
        out = _pack_combine_u64(G, ndig, bconst, p, smh_ref, sml_ref,
                                ch_ref, cl_ref, left, rblk, oshape, strict,
                                tw_refs)
        oh_ref[...] = out[0].reshape((1, 1) + oshape)
        ol_ref[...] = out[1].reshape((1, 1) + oshape)

    # block t-1 was written to slot (t-1) % 2: g1 when t is even, g0 when odd
    @pl.when(jnp.logical_and(t > jnp.int32(0), jnp.logical_not(even)))
    def _():
        _epi(g0_ref)

    @pl.when(jnp.logical_and(t > jnp.int32(0), even))
    def _():
        _epi(g1_ref)


def _other_block_grid(limb, size, other):
    """(oblk, nob): block the non-transformed axis so the live working set
    (x block + digit planes + scratch accumulators + dot buffer, ~14
    i32-equivalent [size, oblk] arrays) stays ~4 MB next to the single
    resident [size, size] plane."""
    budget = 4 << 20
    oblk = other
    while oblk > 128 and 14 * 4 * size * oblk > budget:
        oblk //= 2
    return oblk, other // oblk


def _row_block(size, oblk):
    """(rblk, nrb): additionally block the W/output rows (left; columns on
    the right side) at size 1024 ONLY — there the full-size output tile's
    scratch and dot temporaries overflow the 16 MB scoped VMEM (measured
    18.5 MB on chip), while size <= 512 compiles unblocked and runs ~20%
    faster without the per-row-block digitize recompute (measured at
    2^17)."""
    if size < 1024:
        return size, 1
    rblk = size
    while rblk > 256 and 14 * 4 * rblk * oblk > (2 << 20):
        rblk //= 2
    return rblk, size // rblk


def _row_block_pipe(size, oblk):
    """Row blocking for the software-pipelined kernel: the two ping-pong
    group-scratch sets (2 * (2*ndig-1) int32 [rblk, oblk] arrays) join the
    live working set, so the row block shrinks until both sets + the dot
    temporaries fit the scoped VMEM budget."""
    rblk = size
    while rblk > 256 and (14 + 30) * 4 * rblk * oblk > (6 << 20):
        rblk //= 2
    return rblk, size // rblk


@functools.lru_cache(maxsize=None)
def _build_u32(ring, size, provider, left, other, interpret, strict=True,
               twiddle=False, dig_cache=True):
    planes, corr, consts, bias, ndig = _custom_tables(ring, provider, size,
                                                      left)
    m = ring.nmoduli
    sh = np.zeros((m, 1, 3), dtype=np.uint32)
    sh[:, 0, 0] = consts[:, 0]
    sh[:, 0, 1] = consts[:, 1]
    sh[:, 0, 2] = consts[:, 2]
    corr32 = corr.astype(np.uint32).reshape(m, 1, size)
    p_vec = ring.context().p.reshape(m, 1, 1).astype(np.uint32)
    oblk, nob = _other_block_grid(ring.limb, size, other)
    rblk, nrb = _row_block(size, oblk)
    if left:
        xshape = (1, 1, size, oblk)
        xmap = lambda c, b, ob, rb: (b, c, _I0, ob)
        oshape = (1, 1, rblk, oblk)
        omap = lambda c, b, ob, rb: (b, c, rb, ob)
        wshape = (1, ndig, rblk, size)
        wmap = lambda c, b, ob, rb: (c, _I0, rb, _I0)
        digshape = (ndig, size, oblk)
    else:
        xshape = (1, 1, oblk, size)
        xmap = lambda c, b, ob, rb: (b, c, ob, _I0)
        oshape = (1, 1, oblk, rblk)
        omap = lambda c, b, ob, rb: (b, c, ob, rb)
        wshape = (1, ndig, size, rblk)
        wmap = lambda c, b, ob, rb: (c, _I0, _I0, rb)
        digshape = (ndig, oblk, size)

    # twiddle epilogue blocks mirror the OUTPUT block's [m, r, c] indexing
    if left:
        twshape = (1, rblk, oblk)
        twmap = lambda c, b, ob, rb: (c, rb, ob)
    else:
        twshape = (1, oblk, rblk)
        twmap = lambda c, b, ob, rb: (c, ob, rb)

    def call(xb, *tw2):
        B = xb.shape[0]
        spec_tw = pl.BlockSpec(twshape, twmap, memory_space=pltpu.VMEM)
        assert len(tw2) == (2 if twiddle else 0)
        return pl.pallas_call(
            functools.partial(_kernel_u32, left, size, oblk, rblk, ndig,
                              bias, strict, twiddle, dig_cache),
            grid=(m, B, nob, nrb),
            in_specs=[
                pl.BlockSpec(xshape, xmap, memory_space=pltpu.VMEM),
                pl.BlockSpec(wshape, wmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rblk),
                             lambda c, b, ob, rb: (c, _I0, rb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 3),
                             lambda c, b, ob, rb: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1),
                             lambda c, b, ob, rb: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
            ] + [spec_tw] * len(tw2),
            out_specs=pl.BlockSpec(oshape, omap, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xb.shape, ring.dtype),
            scratch_shapes=[pltpu.VMEM(digshape, jnp.int8)],
            interpret=interpret,
        )(xb, jnp.asarray(planes), jnp.asarray(corr32), jnp.asarray(sh),
          jnp.asarray(p_vec), *tw2)

    return call


def _u64_const_tables(ring, corr, size, ndig):
    """SMEM pair-const rows [p, mbar, chi, chi_shoup] + the split correction
    vectors — shared by the plain and pipelined u64 builders so the Barrett
    width / SMEM layout cannot drift between them."""
    m = ring.nmoduli
    sm = np.zeros((m, 1, 4), dtype=object)
    for cm in range(m):
        p = int(ring.moduli[cm])
        sm[cm, 0, 0] = p
        sm[cm, 0, 1] = (1 << 124) // p
        chi = pow(2, 8 * ndig, p)
        sm[cm, 0, 2] = chi
        sm[cm, 0, 3] = (chi << 64) // p
    smh, sml = _split(sm)
    ch, cl = _split(corr.reshape(m, 1, size).astype(object))
    return smh, sml, ch, cl


def _u64_block_shapes(left, size, oblk, rblk, ndig):
    """(xshape, oshape, wshape, digshape, gshape, twshape) for the u64
    kernels' BlockSpecs, shared by both builders."""
    ngrp = 2 * ndig - 1
    if left:
        return ((1, 1, size, oblk), (1, 1, rblk, oblk),
                (1, ndig, rblk, size), (ndig, size, oblk),
                (ngrp, rblk, oblk), (1, rblk, oblk))
    return ((1, 1, oblk, size), (1, 1, oblk, rblk),
            (1, ndig, size, rblk), (ndig, oblk, size),
            (ngrp, oblk, rblk), (1, oblk, rblk))


@functools.lru_cache(maxsize=None)
def _build_u64(ring, size, provider, left, other, interpret, strict=True,
               twiddle=False, dig_cache=True):
    planes, corr, _, bias, ndig = _custom_tables(ring, provider, size,
                                                 left)
    m = ring.nmoduli
    smh, sml, ch, cl = _u64_const_tables(ring, corr, size, ndig)
    oblk, nob = _other_block_grid(ring.limb, size, other)
    rblk, nrb = _row_block(size, oblk)
    xshape, oshape, wshape, digshape, _, twshape = _u64_block_shapes(
        left, size, oblk, rblk, ndig)
    if left:
        xmap = lambda c, b, ob, rb: (b, c, _I0, ob)
        omap = lambda c, b, ob, rb: (b, c, rb, ob)
        wmap = lambda c, b, ob, rb: (c, _I0, rb, _I0)
        # twiddle blocks mirror the OUTPUT block's [m, r, c] indexing
        twmap = lambda c, b, ob, rb: (c, rb, ob)
    else:
        xmap = lambda c, b, ob, rb: (b, c, ob, _I0)
        omap = lambda c, b, ob, rb: (b, c, ob, rb)
        wmap = lambda c, b, ob, rb: (c, _I0, _I0, rb)
        twmap = lambda c, b, ob, rb: (c, ob, rb)

    def call(xbh, xbl, *tw4):
        B = xbh.shape[0]
        out_sd = jax.ShapeDtypeStruct(xbh.shape, jnp.uint32)
        spec_x = pl.BlockSpec(xshape, xmap, memory_space=pltpu.VMEM)
        spec_o = pl.BlockSpec(oshape, omap, memory_space=pltpu.VMEM)
        spec_tw = pl.BlockSpec(twshape, twmap, memory_space=pltpu.VMEM)
        assert len(tw4) == (4 if twiddle else 0)
        return pl.pallas_call(
            functools.partial(_kernel_u64, left, size, oblk, rblk, ndig,
                              bias, strict, twiddle, dig_cache),
            grid=(m, B, nob, nrb),
            in_specs=[
                spec_x, spec_x,
                pl.BlockSpec(wshape, wmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rblk),
                             lambda c, b, ob, rb: (c, _I0, rb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rblk),
                             lambda c, b, ob, rb: (c, _I0, rb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 4),
                             lambda c, b, ob, rb: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 4),
                             lambda c, b, ob, rb: (c, _I0, _I0),
                             memory_space=pltpu.SMEM),
            ] + [spec_tw] * len(tw4),
            out_specs=[spec_o, spec_o],
            out_shape=[out_sd, out_sd],
            scratch_shapes=[pltpu.VMEM(digshape, jnp.int8)],
            interpret=interpret,
        )(xbh, xbl, jnp.asarray(planes), jnp.asarray(ch), jnp.asarray(cl),
          jnp.asarray(smh), jnp.asarray(sml), *tw4)

    return call


@functools.lru_cache(maxsize=None)
def _build_u64_pipe(ring, size, provider, left, other, interpret,
                    strict=True, twiddle=False, dig_cache=True):
    """Software-pipelined u64 builder: flattened 1-D grid of
    m*B*nob*nrb + 1 steps; step t's index maps serve block t's inputs AND
    block t-1's output/epilogue operands (see _kernel_u64_pipe)."""
    planes, corr, _, bias, ndig = _custom_tables(ring, provider, size,
                                                 left)
    m = ring.nmoduli
    smh, sml, ch, cl = _u64_const_tables(ring, corr, size, ndig)
    oblk, nob = _other_block_grid(ring.limb, size, other)
    rblk, nrb = _row_block_pipe(size, oblk)
    xshape, oshape, wshape, digshape, gshape, twshape = _u64_block_shapes(
        left, size, oblk, rblk, ndig)

    def call(xbh, xbl, *tw4):
        B = xbh.shape[0]
        nsteps = m * B * nob * nrb + 1

        def _decomp(t):
            rb = t % np.int32(nrb)
            t2 = t // np.int32(nrb)
            ob = t2 % np.int32(nob)
            t3 = t2 // np.int32(nob)
            b = t3 % np.int32(B)
            c = t3 // np.int32(B)
            return c, b, ob, rb

        def _dside(t):      # block t, clamped on the drain step
            return _decomp(jnp.minimum(t, np.int32(nsteps - 2)))

        def _eside(t):      # block t-1, clamped on the fill step
            return _decomp(jnp.maximum(t - np.int32(1), np.int32(0)))

        if left:
            def xmap(t):
                c, b, ob, rb = _dside(t)
                return (b, c, _I0, ob)

            def wmap(t):
                c, b, ob, rb = _dside(t)
                return (c, _I0, rb, _I0)

            def omap(t):
                c, b, ob, rb = _eside(t)
                return (b, c, rb, ob)

            def twmap(t):
                c, b, ob, rb = _eside(t)
                return (c, rb, ob)
        else:
            def xmap(t):
                c, b, ob, rb = _dside(t)
                return (b, c, ob, _I0)

            def wmap(t):
                c, b, ob, rb = _dside(t)
                return (c, _I0, _I0, rb)

            def omap(t):
                c, b, ob, rb = _eside(t)
                return (b, c, ob, rb)

            def twmap(t):
                c, b, ob, rb = _eside(t)
                return (c, ob, rb)

        def cmap(t):
            c, b, ob, rb = _eside(t)
            return (c, _I0, rb)

        def smap(t):
            c, b, ob, rb = _eside(t)
            return (c, _I0, _I0)

        out_sd = jax.ShapeDtypeStruct(xbh.shape, jnp.uint32)
        spec_x = pl.BlockSpec(xshape, xmap, memory_space=pltpu.VMEM)
        spec_o = pl.BlockSpec(oshape, omap, memory_space=pltpu.VMEM)
        spec_tw = pl.BlockSpec(twshape, twmap, memory_space=pltpu.VMEM)
        assert len(tw4) == (4 if twiddle else 0)
        return pl.pallas_call(
            functools.partial(_kernel_u64_pipe, left, size, oblk, rblk,
                              ndig, bias, strict, twiddle, dig_cache, nrb,
                              nsteps),
            grid=(nsteps,),
            in_specs=[
                spec_x, spec_x,
                pl.BlockSpec(wshape, wmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rblk), cmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rblk), cmap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 4), smap, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 4), smap, memory_space=pltpu.SMEM),
            ] + [spec_tw] * len(tw4),
            out_specs=[spec_o, spec_o],
            out_shape=[out_sd, out_sd],
            scratch_shapes=[pltpu.VMEM(digshape, jnp.int8),
                            pltpu.VMEM(gshape, jnp.int32),
                            pltpu.VMEM(gshape, jnp.int32)],
            interpret=interpret,
        )(xbh, xbl, jnp.asarray(planes), jnp.asarray(ch), jnp.asarray(cl),
          jnp.asarray(smh), jnp.asarray(sml), *tw4)

    return call


# ---------------------------------------------------------------------------
# public entry points (batched over leading dims, channel-major grid)
# ---------------------------------------------------------------------------

def matmul_mod(x, ring, provider: str, size: int, *, axis: int,
               interpret=None, twiddle=None, dig_cache=True,
               pair_out=False, pipelined=None):
    """Square mod-matmul by the provider's per-channel [size, size] matrix
    along `axis` (-2: left, M @ X contracting the sublane axis; -1: right,
    X @ M) of [..., m, r, c] residue tensors.  Fused int8 MXU kernel,
    canonical in/out.

    twiddle=(tw, tws): optional elementwise Shoup-multiply EPILOGUE — the
    output block is multiplied by tw (tws = floor(tw << wbits / p)) inside
    the kernel's final grid step, saving the separate full-HBM-pass
    mulmod_shoup between the four-step factors (round-3 VERDICT item 4).
    tw/tws are [m, r, c] arrays (host constants or traced shard_map
    operands), canonical < p.

    PAIR I/O (u64 only): the kernel natively consumes and produces uint32
    hi/lo planes; passing x as an (xh, xl) tuple and/or pair_out=True
    skips the u64 merge/split passes at this op's edges, so chained u64
    ops (matmul -> pair bridge -> matmul, ops/pair_bridge.py) never
    materialize the emulated-u64 value between them.

    pipelined (u64 only; default NFL_TPU_DFT_PIPE env, off): the
    software-pipelined kernel variant — block t's MXU dots overlap block
    t-1's VPU pack/combine epilogue over a flattened grid
    (_kernel_u64_pipe).  Bit-identical output; an A/B perf experiment."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pipelined is None:
        # env default applies only where the variant exists (u64)
        pipelined = (ring.limb == "u64"
                     and os.environ.get("NFL_TPU_DFT_PIPE", "0") == "1")
    else:
        assert not pipelined or ring.limb == "u64", \
            "pipelined is a u64-tier feature"
    assert axis in (-1, -2)
    left = axis == -2
    m = ring.nmoduli
    pair_in = isinstance(x, tuple)
    assert not (pair_in or pair_out) or ring.limb == "u64", \
        "pair I/O is a u64-tier feature"
    xs = x[0] if pair_in else jnp.asarray(x)
    r, c = xs.shape[-2], xs.shape[-1]
    other = c if left else r
    assert (r if left else c) == size
    batch = xs.shape[:-3]
    if ring.limb == "u64":
        if pair_in:
            xbh = jnp.asarray(x[0]).reshape((-1, m, r, c))
            xbl = jnp.asarray(x[1]).reshape((-1, m, r, c))
        else:
            xb = xs.reshape((-1, m, r, c))
            xbh = (xb >> jnp.uint64(32)).astype(jnp.uint32)
            xbl = xb.astype(jnp.uint32)
        builder = _build_u64_pipe if pipelined else _build_u64
        call = builder(ring, size, provider, left, other,
                       bool(interpret), twiddle=twiddle is not None,
                       dig_cache=dig_cache)
        tw4 = ()
        if twiddle is not None:
            tw, tws = (jnp.asarray(t) for t in twiddle)
            tw4 = ((tw >> jnp.uint64(32)).astype(jnp.uint32),
                   tw.astype(jnp.uint32),
                   (tws >> jnp.uint64(32)).astype(jnp.uint32),
                   tws.astype(jnp.uint32))
        oh, ol = call(xbh, xbl, *tw4)
        if pair_out:
            return (oh.reshape(batch + (m, r, c)),
                    ol.reshape(batch + (m, r, c)))
        out = (oh.astype(jnp.uint64) << jnp.uint64(32)) | ol.astype(
            jnp.uint64)
    else:
        xb = xs.reshape((-1, m, r, c))
        call = _build_u32(ring, size, provider, left, other,
                          bool(interpret), twiddle=twiddle is not None,
                          dig_cache=dig_cache)
        tw2 = ()
        if twiddle is not None:
            tw2 = tuple(jnp.asarray(t).astype(ring.dtype) for t in twiddle)
        out = call(xb, *tw2)
    return out.reshape(batch + (m, r, c))


def dft_along(x, ring, size: int, *, axis: int, inverse: bool = False,
              interpret=None, pair_out=False):
    """Size-`size` natural-order DFT (root omega^(n/size), or its inverse)
    along `axis` (-1: row stage, -2: column stage) of [..., m, r, c].
    Bit-identical to parallel/ntt_dist._dft_lastaxis's math."""
    provider = "dft_inv" if inverse else "dft_fwd"
    return matmul_mod(x, ring, provider, size, axis=axis,
                      interpret=interpret, pair_out=pair_out)
