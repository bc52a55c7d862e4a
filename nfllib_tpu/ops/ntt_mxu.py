"""MXU (systolic-array) negacyclic NTT — four-step transform as modular
matrix multiplication with 8-bit limb decomposition.

The butterfly kernels (ops/ntt_pallas.py) are VPU-bound: ~6 int32 multiplies
per butterfly puts their ceiling near 0.6M channel-NTTs/s per v5e chip.  The
MXU runs integer-exact bf16 matmuls at ~100x the VPU's multiply throughput,
so this path reformulates the NTT to spend its multiplies there:

  n = n1*n2, X[i1, i2] = x[i2 + n2*i1]:
    1. pre-twist by phi^i                          (VPU, Shoup)
    2. column DFT   F = W1 @ X                     (MXU, mod-p matmul)
       with W1[k1, i1] = w^(n2 * rev(k1) * i1) — the Harvey bit-reversed
       output ordering is folded into the DFT matrices, so the result is
       bit-identical to the butterfly path with no permutation step.
    3. twiddle      Y = F * Omega^(rev(k1)*i2)     (VPU, Shoup)
    4. row DFT      O = Y @ W2                     (MXU)
       with W2[i2, k2] = w^(n1 * i2 * rev(k2));  O[r, c] = harvey[r*n2 + c].

Modular matmul on the MXU: operands (< 2^30) split into four 8-bit limbs
held exactly in bfloat16; each limb-pair product S_ab = A_a @ B_b is an
exact integer in float32 (<= k * 255^2 < 2^24 for contraction k <= 256);
limb pairs sharing a shift accumulate in uint32 (group totals can exceed
2^24), and the 7 shifted groups recombine mod p with Shoup multiplications
by 2^(8k) mod p on the VPU.

The pure-jnp formulation (ntt_pow_phi_mxu: XLA schedules the MXU einsums and
fuses the VPU stages) covers square decompositions on the u32 tier, forward
direction — it exists for shootouts (tools/ntt_perfs.py); production dispatch
uses the fused Pallas kernels below, which cover BOTH limb tiers (u32 with
four BALANCED signed 8-bit digits — 16 int8 dots, see _fused_geometry; u16
with two 7-bit digits) and every degree >= 8 (rectangular n1 x n2 splits;
for tiny degrees the matrices simply under-fill the MXU tile but still run
in one VMEM residency).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ring import _powers_mod
from ..utils import bitrev_indices, static_log2
from . import modops

_LIMBS = 4
_LBITS = 8


def supports(ring) -> bool:
    lg = static_log2(ring.degree)
    return ring.limb == "u32" and lg % 2 == 0 and ring.degree >= 4096


def supports_fused(ring) -> bool:
    """The fused int8 kernel covers the u16 and u32 tiers at every degree
    >= 8 (rectangular n1 x n2 decompositions; digit widths chosen so every
    packed limb-group sum stays under 2^32 — see _fused_geometry).

    The explicit degree cap enforces the exactness bound |G_a| <= 4*128^2*k
    < 2^25 (k = max contraction = n2 <= 512, i.e. degree <= 2^18): the
    current parameter tables stop at kMaxPolyDegree = 32768 for u32, but a
    future table extension past 2^18 must fall back, not silently corrupt."""
    if ring.limb not in ("u16", "u32") or ring.degree < 8:
        return False
    n2 = _fused_geometry(ring.degree, ring.limb)[1]
    return n2 <= 512


def _fused_geometry(n, limb="u32"):
    """(n1, n2, dbits, ndig): split n = n1*n2 with n1 <= n2, and pick the
    digit decomposition.

    u32 (30-bit values): 4 BALANCED 8-bit digits d in [-128, 128) — signed
    int8 covers a full 8-bit digit, so 16 MXU dots replace the 25 of an
    unsigned 5 x 7-bit split.  |group| <= 4*128^2*k = 2^16*k < 2^25 for the
    tier's max contraction 512, exact in the int32 MXU accumulator.
    u16 (14-bit values): 2 x 7-bit unsigned digits (groups
    <= 2*127^2*512 < 2^24.1; already the minimum dot count)."""
    lg = static_log2(n)
    n1 = 1 << (lg // 2)
    n2 = n // n1
    if limb == "u16":
        return n1, n2, 7, 2
    return n1, n2, 8, 4


def _balanced_digits_host(v):
    """[r, c] (< 2^31) -> [4, r, c] int8 balanced base-256 digits:
    v = sum_a d_a * 256^a with d_a in [-128, 128).  One implementation for
    all three kernel modules: dft_mxu._balanced_digits_np (generic ndig,
    vectorized)."""
    from .dft_mxu import _balanced_digits_np
    return _balanced_digits_np(np.asarray(v).astype(np.uint64), 4)


def _limb_dtype():
    """bf16 on TPU (full-rate MXU); f32 elsewhere (CPU XLA has no
    bf16xbf16->f32 dot).  Both hold 8-bit integers exactly and accumulate
    exactly in f32."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _decompose_int(mat):
    """[..., r, c] uint -> [_LIMBS, ..., r, c] float 8-bit limbs (exact)."""
    out = []
    for a in range(_LIMBS):
        limb = (mat >> (_LBITS * a)) & 0xFF
        out.append(limb.astype(np.float32))
    return np.stack([np.asarray(o) for o in out], axis=0)


@functools.lru_cache(maxsize=None)
def _tables(ring):
    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    half = static_log2(n) // 2
    n1 = 1 << half
    n2 = n // n1
    rev = bitrev_indices(n1)

    w1 = np.empty((m, n1, n1), dtype=np.uint32)       # col DFT, rev rows
    w2 = np.empty((m, n2, n2), dtype=np.uint32)       # row DFT, rev cols
    tw = np.empty((m, n1, n2), dtype=np.uint32)       # omega^(rev(k1)*i2)
    tws = np.empty((m, n1, n2), dtype=np.uint32)
    pow2 = np.empty((m, 2 * _LIMBS - 1), dtype=np.uint32)
    pow2s = np.empty((m, 2 * _LIMBS - 1), dtype=np.uint32)

    for cm in range(m):
        p = int(ring.moduli[cm])
        w = ctx.omega_int[cm]
        wc = pow(w, n2, p)                            # order n1
        # rows of w1 indexed by output k1 -> exponent rev(k1)*i1
        e1 = np.array([[pow(wc, int(rev[r]) * i1, p) for i1 in range(n1)]
                       for r in range(n1)], dtype=np.uint64)
        w1[cm] = e1
        wr = pow(w, n1, p)                            # order n2
        e2 = np.array([[pow(wr, i2 * int(rev[c]), p) for c in range(n2)]
                       for i2 in range(n2)], dtype=np.uint64)
        w2[cm] = e2
        t = np.array([[pow(w, int(rev[r]) * i2, p) for i2 in range(n2)]
                      for r in range(n1)], dtype=np.uint64)
        tw[cm] = t
        tws[cm] = ((t.astype(object) << 32) // p).astype(np.uint64)
        for k in range(2 * _LIMBS - 1):
            c = pow(2, _LBITS * k, p)
            pow2[cm, k] = c
            pow2s[cm, k] = (c << 32) // p

    w1dec = _decompose_int(w1)                        # [4, m, n1, n1]
    w2dec = _decompose_int(w2)
    phis = ctx.phis.reshape(m, n1, n2)
    sphis = ctx.shoupphis.reshape(m, n1, n2)
    return (n1, n2, w1dec, w2dec, tw, tws, phis, sphis, pow2, pow2s)


def _mod_matmul_left(wdec, x, p3, pow2, pow2s):
    """W @ X mod p.  wdec: [4, m, r, k] bf16; x: [..., m, k, c] uint32 < p.
    Returns [..., m, r, c] canonical.

    Each single einsum result is an exact integer in f32 (<= k * 255^2
    <= 256 * 255^2 < 2^24 for the tier's max contraction); limb-pair
    results sharing a shift are accumulated in uint32 (exact), never in f32
    — group sums can exceed the f32 2^24 integer range."""
    fdt = _limb_dtype()
    xl = [(x >> (_LBITS * b) & 0xFF).astype(fdt) for b in range(_LIMBS)]
    groups = [None] * (2 * _LIMBS - 1)
    for a in range(_LIMBS):
        wa = jnp.asarray(wdec[a]).astype(fdt)
        for b in range(_LIMBS):
            s = jnp.einsum("mrk,...mkc->...mrc", wa, xl[b],
                           preferred_element_type=jnp.float32)
            s = s.astype(jnp.uint32)
            k = a + b
            groups[k] = s if groups[k] is None else groups[k] + s
    return _recombine(groups, p3, pow2, pow2s)


def _mod_matmul_right(x, wdec, p3, pow2, pow2s):
    """X @ W mod p.  x: [..., m, r, k]; wdec: [4, m, k, c].  Same exact
    uint32 group accumulation as _mod_matmul_left."""
    fdt = _limb_dtype()
    xl = [(x >> (_LBITS * b) & 0xFF).astype(fdt) for b in range(_LIMBS)]
    groups = [None] * (2 * _LIMBS - 1)
    for a in range(_LIMBS):
        wa = jnp.asarray(wdec[a]).astype(fdt)
        for b in range(_LIMBS):
            s = jnp.einsum("...mrk,mkc->...mrc", xl[b], wa,
                           preferred_element_type=jnp.float32)
            s = s.astype(jnp.uint32)
            k = a + b
            groups[k] = s if groups[k] is None else groups[k] + s
    return _recombine(groups, p3, pow2, pow2s)


def _recombine(groups, p3, pow2, pow2s):
    """sum_k 2^(8k) * G_k mod p; G_k exact uint32 integers < 2^26."""
    acc = None
    for k, g in enumerate(groups):
        gu = g
        c = pow2[:, k][None, :, None, None] if pow2.ndim == 2 else pow2[k]
        cs = pow2s[:, k][None, :, None, None] if pow2s.ndim == 2 else pow2s[k]
        term = modops.mulmod_shoup_lazy(gu, c, cs, p3)    # < 2p
        term = modops.reduce_once(term, p3)               # < p
        acc = term if acc is None else modops.addmod(acc, term, p3)
    return acc


def ntt_pow_phi_mxu(x, ctx):
    """Forward negacyclic transform via MXU matmuls; output bit-identical to
    ops/ntt.py ntt_pow_phi.  x: [..., m, n] uint32."""
    ring = ctx.ring
    (n1, n2, w1dec, w2dec, tw, tws, phis, sphis, pow2, pow2s) = \
        _tables(ring)
    m, n = ring.nmoduli, ring.degree
    x = jnp.asarray(x)
    batch = x.shape[:-2]
    xb = x.reshape((-1, m, n1, n2))
    p3 = jnp.asarray(ctx.p.astype(np.uint32))[None, :, None, None]

    # 1. phi pre-twist
    xb = modops.mulmod_shoup(xb, jnp.asarray(phis)[None],
                             jnp.asarray(sphis)[None], p3)
    # 2. column DFT (contract over i1)
    f = _mod_matmul_left(w1dec, xb, p3, pow2, pow2s)
    # 3. twiddle
    f = modops.mulmod_shoup(f, jnp.asarray(tw)[None], jnp.asarray(tws)[None],
                            p3)
    # 4. row DFT (contract over i2)
    o = _mod_matmul_right(f, w2dec, p3, pow2, pow2s)
    return o.reshape(batch + (m, n))


# ---------------------------------------------------------------------------
# Fused Pallas kernel: MXU matmuls + VPU recombination in VMEM
# ---------------------------------------------------------------------------
#
# Key trick vs the jnp path above: for each input digit b of X, the DFT
# matrix is pre-scaled host-side as W^(b) = (2^(dbits*b) * W) mod p, so
#     W @ X = sum_b W^(b) @ X_b   (mod p)
# and decomposing each W^(b) into ndig digit planes a gives
#     sum_a 2^(dbits*a) * [ sum_b W^(b)_a @ X_b ]  =  sum_a 2^(dbits*a) G_a.
# The b-sum happens INSIDE the int8 MXU accumulation (ndig^2 dots, ndig
# groups).  u32 uses BALANCED base-256 digits (d in [-128, 128), the full
# signed-int8 range): 4 digits per operand -> 16 dots, vs 25 for an
# unsigned 7-bit split.  |G_a| <= 4 * 128^2 * k < 2^25 for contraction
# k <= 512, exact in the int32 accumulator; recombination biases each
# group by 2^25, Shoup-reduces with multipliers 2^(8a) < p, and subtracts
# the constant bias correction once (_recombine_consts).  u16 keeps two
# unsigned 7-bit digits (4 dots, single packed term).  Everything stays in
# VMEM; the ndig^2 table blow-up streams once per channel and is reused
# across the whole batch (grid is channel-major).

def _batch_block(B, n):
    """Batch elements per program: amortizes per-program dispatch/DMA
    overhead (measured ~1 us/program vs ~0.5 us of compute at n=2^14)
    subject to a ~8 MB VMEM working-set estimate (~8 words/coeff live —
    the round-3 carry-free pack and bitcast digitize shrank the live set;
    bb=16 now compiles at n=2^14 and measures ~4% faster than bb=8
    same-session, reversing the round-2 rejection)."""
    cap = max(1, (8 << 20) // (8 * 4 * n))
    # bb=16 only at large degrees (n1, n2 >= 128): on tiny geometries the
    # [bb*n1, n2] int8 reshape hits an unsupported Mosaic shape cast
    # (measured at n=128 u16: vector<8x2x4xi8> -> vector<16x4xi8>)
    blocks = (16, 8, 4, 2) if n >= (1 << 14) else (8, 4, 2)
    for bb in blocks:
        if bb <= cap and B % bb == 0:
            return bb
    return 1


def _mulhi_for(ring):
    """Shoup mulhi in uint32 lanes, per limb width (u16 shoup companions are
    16-bit shifted; exact because operands < 2^16)."""
    if ring.limb == "u16":
        return lambda a, b: (a * b) >> 16
    return modops._mulhi_u32


@functools.lru_cache(maxsize=None)
def _fused_tables(ring):
    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    n1, n2, dbits, ndig = _fused_geometry(n, ring.limb)
    rev1 = bitrev_indices(n1)
    rev2 = bitrev_indices(n2)

    w1l = np.empty((m, ndig * ndig, n1, n1), dtype=np.int8)
    w2l = np.empty((m, ndig * ndig, n2, n2), dtype=np.int8)
    tw = np.empty((m, n1, n2), dtype=np.uint32)
    tws = np.empty((m, n1, n2), dtype=np.uint32)
    corr1 = np.zeros((m, n1, 1), dtype=np.uint32)
    corr2 = np.zeros((m, 1, n2), dtype=np.uint32)
    shoup1 = _recombine_consts(ring, ndig)
    wshift = 16 if ring.limb == "u16" else 32

    r1 = np.asarray(rev1, dtype=np.int64)
    r2 = np.asarray(rev2, dtype=np.int64)
    i1s = np.arange(n1, dtype=np.int64)
    i2s = np.arange(n2, dtype=np.int64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        w = ctx.omega_int[cm]
        phi = ctx.phi_int[cm]
        wc, wr = pow(w, n2, p), pow(w, n1, p)
        # the phi^i pre-twist factors as phi^(i2 + n2*i1) =
        # (phi^n2)^i1 * phi^i2: the i1 part folds into W1's columns, the i2
        # part into the twiddle table — the kernel has NO twist stage.
        # VECTORIZED: entries are base^idx * scale^i with idx reducible
        # mod the base's order — iterative power tables (_powers_mod) +
        # fancy indexing replace the n1^2 + n2^2 + n1*n2 python pow()
        # calls (products fit uint64: p < 2^30).
        pw_wc = _powers_mod(wc, n1, p)                 # order n1
        pw_wr = _powers_mod(wr, n2, p)                 # order n2
        pw_w = _powers_mod(w, n, p)                    # order n
        phi_n2 = _powers_mod(pow(phi, n2, p), n1, p)
        phi_i2 = _powers_mod(phi, n2, p)
        e1 = (pw_wc[(r1[:, None] * i1s[None, :]) % n1]
              * phi_n2[None, :]) % p
        e2 = pw_wr[(i2s[:, None] * r2[None, :]) % n2]
        t = (pw_w[(r1[:, None] * i2s[None, :]) % n]
             * phi_i2[None, :]) % p
        tw[cm] = t
        tws[cm] = (t << np.uint64(wshift)) // np.uint64(p)
        c1, c2 = _fill_digit_planes(w1l[cm], w2l[cm], e1, e2, p, dbits, ndig)
        corr1[cm, :, 0] = c1
        corr2[cm, 0, :] = c2

    p_vec = ctx.p.reshape(m, 1, 1).astype(np.uint32)
    w1t = _interleave_left(w1l, ndig) if ndig == 4 else w1l
    return n1, n2, w1t, w2l, tw, tws, corr1, corr2, shoup1, p_vec


def _interleave_left(w1l, ndig):
    """[m, ndig*ndig, n1, n1] digit planes -> [m, ndig, n1, ndig*n1] with
    column order matching pltpu.bitcast's byte interleave: the kernel
    digitizes X for the LEFT matmul by bitcasting u32 rows to int8 — byte b
    of x[i1, i2] lands at row ndig*i1 + b (verified compiled AND interpret
    on TPU) — so W digit plane a gets its b-planes interleaved along
    columns, w1i[a][r, ndig*i1 + b] = digit_a(W^(b))[r, i1], and the b-sum
    happens inside ONE int8 dot of contraction ndig*n1."""
    m, _, n1, _ = w1l.shape
    return np.ascontiguousarray(
        w1l.reshape(m, ndig, ndig, n1, n1)
        .transpose(0, 1, 3, 4, 2)
        .reshape(m, ndig, n1, ndig * n1))


_BAL_BIAS = 1 << 25      # makes balanced group sums nonneg (|G_a| < 2^25)


def _recombine_consts(ring, ndig):
    """[m, 5] per-channel SMEM constants for the group recombination.

    u32 balanced (ndig=4): [m_barrett, 0...] with m_barrett =
    floor(2^60/p): the four biased groups pack into one 50-bit (hi, lo)
    pair reduced by a single Barrett step (the bias constant is folded
    into the corr_add vectors, see _fill_digit_planes).
    u16 (ndig=2): [floor(2^32/p), 0...]."""
    m = ring.nmoduli
    out = np.zeros((m, 5), dtype=np.uint32)
    for cm in range(m):
        p = int(ring.moduli[cm])
        out[cm, 0] = ((1 << 60) // p) if ndig == 4 else ((1 << 32) // p)
    return out


# constant over-count of the biased pack: sum_a BIAS * 2^(8a)
_BIAS_SUM = _BAL_BIAS * (1 + (1 << 8) + (1 << 16) + (1 << 24))


def _fill_digit_planes(w1_cm, w2_cm, e1, e2, p, dbits, ndig):
    """Pre-scaled digit planes: W^(b) = (2^(dbits*b) * W) mod p, decomposed
    into ndig digit matrices (balanced int8 for u32, unsigned for u16).

    Returns (corr1_add[n1], corr2_add[n2]): the kernel digitizes X with
    OFFSET bytes (d = byte - 128, no carry chains), which under-counts the
    true product by 128 * sum_b W^(b) summed over the contraction — a
    per-output-row (left matmul) / per-output-column (right matmul)
    constant.  corr*_add = (that - _BIAS_SUM) mod p is added back once at
    recombination (the biased Barrett pack over-counts by _BIAS_SUM).
    Zero vectors for the unsigned u16 scheme."""
    corr1 = np.zeros(e1.shape[0], dtype=object)
    corr2 = np.zeros(e2.shape[1], dtype=object)
    dmask = (1 << dbits) - 1
    for b in range(ndig):
        s1 = (e1 * pow(2, dbits * b, p)) % p
        s2 = (e2 * pow(2, dbits * b, p)) % p
        if ndig == 4:
            d1 = _balanced_digits_host(s1)
            d2 = _balanced_digits_host(s2)
            for a in range(ndig):
                w1_cm[ndig * a + b] = d1[a]
                w2_cm[ndig * a + b] = d2[a]
            corr1 += 128 * s1.astype(object).sum(axis=1)   # row sums
            corr2 += 128 * s2.astype(object).sum(axis=0)   # col sums
        else:
            for a in range(ndig):
                w1_cm[ndig * a + b] = ((s1 >> (dbits * a))
                                       & dmask).astype(np.int8)
                w2_cm[ndig * a + b] = ((s2 >> (dbits * a))
                                       & dmask).astype(np.int8)
    bias = _BIAS_SUM if ndig == 4 else 0
    c1 = np.array([(int(v) - bias) % p for v in corr1], dtype=np.uint32)
    c2 = np.array([(int(v) - bias) % p for v in corr2], dtype=np.uint32)
    return c1, c2


def _digitize_i8(x, dbits, ndig):
    """u32 [r, c] -> list of ndig int8 [r, c] digit limbs.

    ndig=4 (u32): OFFSET bytes d_a = byte_a - 128 in [-128, 127] — no carry
    chains; the constant 128-per-byte under-count is a per-row/column
    vector folded into the recombination correction (corr*_add tables).
    Otherwise: unsigned dbits-wide digits."""
    if ndig == 4:
        # ((x >> 8a) - 128) mod 256, signed-interpreted, IS byte_a - 128 for
        # any byte value — the int8 cast wraps, so no mask is needed
        xi = x.astype(jnp.int32)
        off = jnp.int32(128)
        return [((xi >> (8 * a)) - off).astype(jnp.int8) for a in range(4)]
    dmask = jnp.uint32((1 << dbits) - 1)
    return [((x >> (dbits * b)) & dmask).astype(jnp.int32)
            .astype(jnp.int8) for b in range(ndig)]


# sum_b W^(b) @ X_b mod p via ndig^2 int8 MXU dots + recombination.
# u32 (ndig=4, balanced): bias each signed group by 2^25, four Shoup terms
# with 2^(8a) multipliers, one bias correction.  u16 (ndig=2, unsigned):
# one packed term, one Shoup reduction.  Kernels process a bb-element
# batch block per program to amortize per-program dispatch/DMA overhead.


def _left_matmul_batched(x, w_ref, p, sh, dbits, ndig, bb, n1, n2,
                         corr=None, strict=True):
    """W @ X_i for a [bb, n1, n2] batch block: per-element column-DFT dots
    (the small matmul), groups recombined batched.

    u32 (ndig=4): X digitizes for FREE — one XOR with 0x80808080 then a
    pltpu.bitcast to int8, which lands byte b of x[i1, i2] at row
    ndig*i1 + b (the packed int8 sublane layout; verified compiled and
    interpret).  int8-reinterpreting byte^0x80 IS the offset digit
    byte - 128, so the whole shift/sub/cast digitize chain disappears and
    the b-sum contracts inside ONE [n1, 4n1] @ [4n1, n2] dot per digit
    plane a (w_ref holds the _interleave_left tables).
    u16 (ndig=2): 7-bit digits can't byte-bitcast; classic path."""
    if ndig == 4:
        xb = pltpu.bitcast(x ^ jnp.uint32(0x80808080), jnp.int8)
        groups = []
        for a in range(ndig):
            per_b = [jax.lax.dot_general(
                w_ref[a], xb[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) for i in range(bb)]
            groups.append(jnp.stack(per_b) if bb > 1 else per_b[0][None])
        return _recombine_groups(groups, p, sh, dbits, ndig, corr, strict)
    xd = _digitize_i8(x, dbits, ndig)            # ndig x [bb, n1, n2] int8
    groups = []
    for a in range(ndig):
        per_b = []
        for i in range(bb):
            acc = None
            for b in range(ndig):
                s = jax.lax.dot_general(
                    w_ref[ndig * a + b], xd[b][i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = s if acc is None else acc + s
            per_b.append(acc)
        groups.append(jnp.stack(per_b) if bb > 1 else per_b[0][None])
    return _recombine_groups(groups, p, sh, dbits, ndig, corr, strict)


def _right_matmul_batched(x, w_ref, p, sh, dbits, ndig, bb, n1, n2,
                          corr=None, strict=True):
    """X_i @ W for a [bb, n1, n2] batch block: the bb row-DFTs stack into
    ONE [bb*n1, n2] @ [n2, n2] dot per digit pair (leading-dim collapse is
    free; the wide lhs amortizes per-dot overhead and fills the MXU).

    Tiny degrees (n1 < 8, i.e. degree < 128): the bb*n1 merge is an
    unsupported Mosaic int8 shape cast (sub-sublane rows); fall back to
    per-element dots there."""
    xd = _digitize_i8(x, dbits, ndig)
    groups = []
    if n1 >= 8:
        xs = [d.reshape(bb * n1, n2) for d in xd]
        for a in range(ndig):
            acc = None
            for b in range(ndig):
                s = jax.lax.dot_general(
                    xs[b], w_ref[ndig * a + b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = s if acc is None else acc + s
            groups.append(acc.reshape(bb, n1, n2))
    else:
        for a in range(ndig):
            per = []
            for i in range(bb):
                acc = None
                for b in range(ndig):
                    s = jax.lax.dot_general(
                        xd[b][i], w_ref[ndig * a + b],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = s if acc is None else acc + s
                per.append(acc)
            groups.append(jnp.stack(per) if bb > 1 else per[0][None])
    return _recombine_groups(groups, p, sh, dbits, ndig, corr, strict)


def _recombine_groups(groups, p, sh, dbits, ndig, corr=None, strict=True):
    two_p = p + p
    if ndig == 2:
        u0 = (groups[0].astype(jnp.uint32)
              + (groups[1].astype(jnp.uint32) << dbits))
        t = u0 - modops._mulhi_u32(u0, sh(0)) * p       # < 2p
        return t - jnp.where(t >= p, p, jnp.zeros_like(t))
    # balanced u32: pack the four biased groups (G'_a = G_a + 2^25 <= 2^26)
    # into v = sum G'_a 2^(8a) < 2^51, then ONE Barrett step with
    # m = floor(2^60/p).  Carry-free formulation: r = v - q*p < 4p < 2^32
    # only needs v mod 2^32 (lo computed with natural u32 wrap, no carry
    # tracking), and the Barrett input a = floor(v/2^28) tolerates slack —
    # a' = (G'_1>>20) + (G'_2>>12) + (G'_3>>4) drops the G'_0/2^28 < 1 term
    # and loses < 1 per floor, so a' in [floor(v/2^28) - 3, floor(v/2^28)];
    # q = hi32(a'*m) then satisfies q > v/p - v/2^60 - 2^30/p - 1 > v/p - 4
    # and q <= a'*m/2^32 <= v/p, hence 0 <= r = v - q*p < 4p, exact in
    # wrapping 32-bit.  The bias over-count lives in corr.
    bias = jnp.int32(_BAL_BIAS)
    g = [(groups[a] + bias).astype(jnp.uint32) for a in range(4)]
    lo = g[0] + (g[1] << 8) + (g[2] << 16) + (g[3] << 24)   # v mod 2^32
    a28 = (g[1] >> 20) + (g[2] >> 12) + (g[3] >> 4)
    q = modops._mulhi_u32(a28, sh(0))
    t = lo - q * p                                      # < 4p
    t = t - jnp.where(t >= two_p, two_p, jnp.zeros_like(t))
    if corr is not None:   # (offset-byte - bias) corr < p: t < 3p < 2^32
        t = t + corr
        t = t - jnp.where(t >= two_p, two_p, jnp.zeros_like(t))
    if not strict:
        # lazy [0, 2p) result: the offset-byte digitizer and the Shoup
        # twiddle both tolerate any input < 2^31, so intermediate stages
        # skip the canonicalizing subtract (u32 tier only)
        return t
    return t - jnp.where(t >= p, p, jnp.zeros_like(t))


def _fused_kernel(dbits, ndig, mulhi, bb, n1, n2, strict_checks,
                  x_ref, w1_ref, w2_ref, tw_ref, tws_ref, c1_ref, c2_ref,
                  sh_ref, p_ref, o_ref):
    p = p_ref[0, 0, 0]
    sh = lambda j: sh_ref[0, 0, j]
    lazy = ndig == 4          # u32: intermediates may stay in [0, 2p)
    x = x_ref[...].reshape(bb, n1, n2).astype(jnp.uint32)   # [bb, n1, n2] < p
    bad = jnp.bool_(False)    # strict-mod: any stage contract violation

    # column DFT (phi twist pre-folded into W1's columns)
    x = _left_matmul_batched(x, w1_ref[0], p, sh, dbits, ndig, bb, n1, n2,
                             corr=c1_ref[0], strict=not lazy)
    if strict_checks:
        bad = bad | jnp.any(x >= (p + p if lazy else p))
    # twiddle * phi^i2; tables broadcast over the batch block
    q = mulhi(x, tws_ref[0])
    x = x * tw_ref[0] - q * p
    if not lazy:
        x = x - jnp.where(x >= p, p, jnp.zeros_like(x))
    if strict_checks:
        bad = bad | jnp.any(x >= (p + p if lazy else p))
    # row DFT (strict: kernel outputs are canonical)
    x = _right_matmul_batched(x, w2_ref[0], p, sh, dbits, ndig, bb, n1, n2,
                              corr=c2_ref[0])
    if strict_checks:
        # in-kernel strict-mod (reference sse.hpp:57-67 SIMD asserts):
        # a violated stage contract poisons the whole output block with an
        # out-of-range sentinel, which the dispatch-level boundary check
        # (ops/ntt.py _strict_bracket) turns into an AssertionError.
        bad = bad | jnp.any(x >= p)
        x = jnp.where(bad, jnp.uint32(0xFFFFFFFF), x)
    o_ref[...] = x.reshape(bb, 1, n1, n2).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_fused(ring, interpret, strict_checks=False):
    ctx = ring.context()
    m = ring.nmoduli
    n1, n2, w1l, w2l, tw, tws, corr1, corr2, shoup1, p_vec = \
        _fused_tables(ring)
    dbits, ndig = _fused_geometry(ring.degree, ring.limb)[2:]
    _i0 = np.int32(0)

    mulhi = _mulhi_for(ring)

    def call(xb):
        """xb: [B, m, n1, n2] -> same shape."""
        B = xb.shape[0]
        bb = _batch_block(B, ring.degree)
        return pl.pallas_call(
            functools.partial(_fused_kernel, dbits, ndig, mulhi, bb, n1, n2,
                              strict_checks),
            grid=(m, B // bb),    # batch innermost: tables stay resident
            in_specs=[
                pl.BlockSpec((bb, 1, n1, n2), lambda c, b: (b, c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                # u32: _interleave_left layout [ndig, n1, ndig*n1];
                # u16: plain digit planes [ndig*ndig, n1, n1]
                pl.BlockSpec((1, ndig, n1, ndig * n1) if ndig == 4
                             else (1, ndig * ndig, n1, n1),
                             lambda c, b: (c, _i0, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ndig * ndig, n2, n2),
                             lambda c, b: (c, _i0, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n1, n2), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n1, n2), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n1, 1), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n2), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 5), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bb, 1, n1, n2),
                                   lambda c, b: (b, c, _i0, _i0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xb.shape, ring.dtype),
            interpret=interpret,
        )(xb, jnp.asarray(w1l), jnp.asarray(w2l), jnp.asarray(tw),
          jnp.asarray(tws), jnp.asarray(corr1), jnp.asarray(corr2),
          jnp.asarray(shoup1.reshape(m, 1, 5)),
          jnp.asarray(p_vec))

    return call


def ntt_pow_phi_fused(x, ctx, *, interpret=None):
    """Forward negacyclic transform via the fused MXU Pallas kernel;
    bit-identical to ops/ntt.py ntt_pow_phi.  u16/u32, any degree >= 8."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    m, n = ring.nmoduli, ring.degree
    n1, n2 = _fused_geometry(n, ring.limb)[:2]
    x = jnp.asarray(x)
    batch = x.shape[:-2]
    xb = x.reshape((-1, m, n1, n2))
    from .. import debug
    call = _build_fused(ring, bool(interpret), debug.strictmod_enabled())
    out = call(xb)
    return out.reshape(batch + (m, n))


# ---------------------------------------------------------------------------
# Fused inverse: X = Untwist( W1inv @ ( Tinv * ( O @ W2inv ) ) )
# ---------------------------------------------------------------------------
#
# Raw inverse DFT matrices (no 1/n factors — the n1*n2 product is cancelled
# by the n^-1 inside invpoly_times_invphis, reference core.hpp:608-614):
#   W2inv[c, i2] = wr^(-rev(c) * i2)     (right-multiply first)
#   Tinv[r, i2]  = w^(-rev(r) * i2)      (elementwise)
#   W1inv[i1, r] = wc^(-i1 * rev(r))     (left-multiply)
# then the fused n^-1 * phi^-i untwist.  Bit-identical to the reference
# inverse (the canonical INTT result is unique).


@functools.lru_cache(maxsize=None)
def _fused_inv_tables(ring):
    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    n1, n2, dbits, ndig = _fused_geometry(n, ring.limb)
    rev1 = bitrev_indices(n1)
    rev2 = bitrev_indices(n2)

    w1l = np.empty((m, ndig * ndig, n1, n1), dtype=np.int8)
    w2l = np.empty((m, ndig * ndig, n2, n2), dtype=np.int8)
    tw = np.empty((m, n1, n2), dtype=np.uint32)
    tws = np.empty((m, n1, n2), dtype=np.uint32)
    corr1 = np.zeros((m, n1, 1), dtype=np.uint32)
    corr2 = np.zeros((m, 1, n2), dtype=np.uint32)
    shoup1 = _recombine_consts(ring, ndig)
    wshift = 16 if ring.limb == "u16" else 32

    r1 = np.asarray(rev1, dtype=np.int64)
    r2 = np.asarray(rev2, dtype=np.int64)
    i1s = np.arange(n1, dtype=np.int64)
    i2s = np.arange(n2, dtype=np.int64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        w = ctx.omega_int[cm]
        iw = pow(w, -1, p)
        iphi = pow(ctx.phi_int[cm], -1, p)
        inv_deg = int(ctx.invpolyDegree[cm])
        iwc, iwr = pow(iw, n2, p), pow(iw, n1, p)
        # the n^-1 * phi^-i untwist factors as
        # inv_deg * (phi^-n2)^i1 * (phi^-1)^i2: the i1 part folds into
        # W1inv's rows, the i2 part (with inv_deg) into the inverse twiddle
        # — the kernel has NO untwist stage.  Vectorized like
        # _fused_tables: power tables + fancy indexing instead of
        # per-entry pow().
        pw_iwc = _powers_mod(iwc, n1, p)
        pw_iwr = _powers_mod(iwr, n2, p)
        pw_iw = _powers_mod(iw, n, p)
        iphi_n2 = _powers_mod(pow(iphi, n2, p), n1, p)
        iphi_i2 = _powers_mod(iphi, n2, p, start=inv_deg)
        e1 = (pw_iwc[(i1s[:, None] * r1[None, :]) % n1]
              * iphi_n2[:, None]) % p                             # W1inv'
        e2 = pw_iwr[(r2[:, None] * i2s[None, :]) % n2]            # W2inv
        t = (pw_iw[(r1[:, None] * i2s[None, :]) % n]
             * iphi_i2[None, :]) % p                              # Tinv'
        tw[cm] = t
        tws[cm] = (t << np.uint64(wshift)) // np.uint64(p)
        c1, c2 = _fill_digit_planes(w1l[cm], w2l[cm], e1, e2, p, dbits, ndig)
        corr1[cm, :, 0] = c1
        corr2[cm, 0, :] = c2

    p_vec = ctx.p.reshape(m, 1, 1).astype(np.uint32)
    w1t = _interleave_left(w1l, ndig) if ndig == 4 else w1l
    return n1, n2, w1t, w2l, tw, tws, corr1, corr2, shoup1, p_vec


def _fused_inv_kernel(dbits, ndig, mulhi, bb, n1, n2, strict_checks,
                      x_ref, w1_ref, w2_ref, tw_ref,
                      tws_ref, c1_ref, c2_ref, sh_ref, p_ref, o_ref):
    p = p_ref[0, 0, 0]
    sh = lambda j: sh_ref[0, 0, j]
    lazy = ndig == 4          # u32: intermediates may stay in [0, 2p)
    x = x_ref[...].reshape(bb, n1, n2).astype(jnp.uint32)   # < p, Harvey
    bad = jnp.bool_(False)

    # row inverse DFT: right-multiply by W2inv
    x = _right_matmul_batched(x, w2_ref[0], p, sh, dbits, ndig, bb, n1, n2,
                              corr=c2_ref[0], strict=not lazy)
    if strict_checks:
        bad = bad | jnp.any(x >= (p + p if lazy else p))
    # inverse twiddle * inv_deg * phi^-i2
    q = mulhi(x, tws_ref[0])
    x = x * tw_ref[0] - q * p
    if not lazy:
        x = x - jnp.where(x >= p, p, jnp.zeros_like(x))
    if strict_checks:
        bad = bad | jnp.any(x >= (p + p if lazy else p))
    # column inverse DFT by W1inv (phi^-(n2 i1) untwist pre-folded in rows;
    # strict: kernel outputs are canonical)
    x = _left_matmul_batched(x, w1_ref[0], p, sh, dbits, ndig, bb, n1, n2,
                             corr=c1_ref[0])
    if strict_checks:
        bad = bad | jnp.any(x >= p)
        x = jnp.where(bad, jnp.uint32(0xFFFFFFFF), x)
    o_ref[...] = x.reshape(bb, 1, n1, n2).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_fused_inv(ring, interpret, strict_checks=False):
    ctx = ring.context()
    m = ring.nmoduli
    n1, n2, w1l, w2l, tw, tws, corr1, corr2, shoup1, p_vec = \
        _fused_inv_tables(ring)
    dbits, ndig = _fused_geometry(ring.degree, ring.limb)[2:]
    _i0 = np.int32(0)
    mulhi = _mulhi_for(ring)

    def call(xb):
        B = xb.shape[0]
        bb = _batch_block(B, ring.degree)
        return pl.pallas_call(
            functools.partial(_fused_inv_kernel, dbits, ndig, mulhi,
                              bb, n1, n2, strict_checks),
            grid=(m, B // bb),
            in_specs=[
                pl.BlockSpec((bb, 1, n1, n2), lambda c, b: (b, c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                # u32: _interleave_left layout [ndig, n1, ndig*n1];
                # u16: plain digit planes [ndig*ndig, n1, n1]
                pl.BlockSpec((1, ndig, n1, ndig * n1) if ndig == 4
                             else (1, ndig * ndig, n1, n1),
                             lambda c, b: (c, _i0, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ndig * ndig, n2, n2),
                             lambda c, b: (c, _i0, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n1, n2), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n1, n2), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n1, 1), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n2), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 5), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bb, 1, n1, n2),
                                   lambda c, b: (b, c, _i0, _i0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xb.shape, ring.dtype),
            interpret=interpret,
        )(xb, jnp.asarray(w1l), jnp.asarray(w2l), jnp.asarray(tw),
          jnp.asarray(tws), jnp.asarray(corr1), jnp.asarray(corr2),
          jnp.asarray(shoup1.reshape(m, 1, 5)),
          jnp.asarray(p_vec))

    return call


def invntt_pow_invphi_fused(x, ctx, *, interpret=None):
    """Inverse negacyclic transform via the fused MXU Pallas kernel;
    bit-identical to ops/ntt.py invntt_pow_invphi.  u16/u32, degree >= 8."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ring = ctx.ring
    m, n = ring.nmoduli, ring.degree
    n1, n2 = _fused_geometry(n, ring.limb)[:2]
    x = jnp.asarray(x)
    batch = x.shape[:-2]
    xb = x.reshape((-1, m, n1, n2))
    from .. import debug
    call = _build_fused_inv(ring, bool(interpret), debug.strictmod_enabled())
    out = call(xb)
    return out.reshape(batch + (m, n))
