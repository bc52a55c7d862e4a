"""Distributed four-step negacyclic NTT over a device mesh.

The reference scales only by SIMD width; its two inherent parallel axes — the
independent residue-channel (`cm`) loops and SIMD lanes inside a butterfly
(reference core.hpp:597,610, SURVEY.md section 2 note) — become mesh axes
here, and large-degree transforms gain a third: the degree axis, split
four-step style (the structural analog of sequence parallelism):

  n = n1 * n2, data viewed as X[i1, i2] (i = i2 + n2*i1), sharded over columns
  i2 on mesh axis `deg`:
    1. pre-twist by phi^i                        (local, elementwise)
    2. size-n1 DFTs down each column, root w^n2  (local: column-sharded)
    3. twiddle by w^(k1*i2)                      (local, elementwise)
    4. all-to-all transpose                      (ICI; the only comm)
    5. size-n2 DFTs along each row, root w^n1    (local: row-sharded)
  out[k1, k2] = E[k1 + n1*k2] where E[k] = A(phi^(2k+1)) in natural order.

The single-chip Harvey path (ops/ntt.py) and this path agree exactly:
harvey_out[j] = E[bitrev_n(j)] (verified in tests).  Pointwise products and
the inverse transform consume the four-step layout directly, so no global
reordering is ever needed in a distributed pipeline.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ring import (Ring, _harvey_blocked, _np_mulmod_vec, _np_shoup_vec,
                    _powers_mod, _shoup_arr)
from ..utils import bitrev_indices, static_log2
from ..ops import modops
from ..ops.ntt import _ntt_core


def _dft_backend(ring, size):
    """Local sub-DFT dispatch, mirroring ops/ntt.py's policy: the fused MXU
    kernels (ops/dft_mxu.py) own the per-device column/row DFTs on TPU (the
    round-2 VERDICT item 2 — production kernels in the distributed path);
    jnp stage loops elsewhere.  NFL_TPU_NTT=mxu forces the kernels (interpret
    mode off-TPU, used by tests and the driver dryrun); jnp/pallas force the
    stage loop."""
    from ..ops.ntt import auto_on_tpu, kernel_mode
    mode = kernel_mode()
    if mode in ("jnp", "pallas"):
        return None
    from ..ops import dft_mxu
    if not dft_mxu.supports(ring, size):
        return None
    if mode == "mxu" or auto_on_tpu():
        _ensure_twisted_providers()
        return dft_mxu
    return None


def _colmat_twisted(ring, size, inverse=False):
    """Column-stage DFT matrices with the phi (pre-)twist FOLDED IN, so the
    MXU path skips the separate elementwise twist pass (a full HBM round
    trip per direction — the same folding ops/ntt_mxu_u64._large_e1_* does
    for the single-chip split path):
      fwd: W'[r, j]  = wc^(r*j)  * phi^(n2*j)   (column scale: the
           pre-twist's phi^(n2*i1) part rides the contraction index)
      inv: W'[i, k]  = wc^(-i*k) * phi^(-n2*i)  (row scale: the untwist's
           phi^(-n2*i1) part rides the output index)
    with wc = omega^(n/size), n2 = n/size.  The remaining phi^(+-i2) (and
    n^-1 on the inverse) fold into the twiddle tables
    (FourStepContext.twiddle_tw / itwiddle_tw)."""
    from ..ring import _np_mulmod_vec
    from ..ops.dft_mxu import _dft_matrix

    ctx = ring.context()
    n, m = ring.degree, ring.nmoduli
    n2 = n // size
    base = _dft_matrix(ring, size, inverse)
    mats = np.empty((m, size, size), dtype=np.uint64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        phi_n2 = pow(ctx.phi_int[cm], n2, p)
        if inverse:
            phi_n2 = pow(phi_n2, -1, p)
        scale = np.array([pow(phi_n2, j, p) for j in range(size)],
                         dtype=np.uint64)
        if inverse:
            mats[cm] = _np_mulmod_vec(base[cm], scale[:, None], p)
        else:
            mats[cm] = _np_mulmod_vec(base[cm], scale[None, :], p)
    return mats


def _ensure_twisted_providers():
    import functools as _ft

    from ..ops import dft_mxu
    if "fourstep_col_fwd_tw" not in dft_mxu._MATRIX_PROVIDERS:
        dft_mxu.register_matrix_provider(
            "fourstep_col_fwd_tw", _ft.partial(_colmat_twisted,
                                               inverse=False))
        dft_mxu.register_matrix_provider(
            "fourstep_col_inv_tw", _ft.partial(_colmat_twisted,
                                               inverse=True))


# ---------------------------------------------------------------------------
# table construction
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FourStepPlan:
    ring: Ring
    n1: int
    n2: int


def _sub_tables(p: int, w_root: int, size: int, wbits: int, obj: bool):
    """Blocked Harvey twiddles (+shoup) for a size-`size` DFT with root w."""
    pows = _powers_mod(w_root, size, p, obj=obj)
    blocked = _harvey_blocked(pows, size)
    return blocked, _shoup_arr(blocked, p, wbits, obj)


class FourStepContext:
    """Per-(ring, n1, n2) constants for the four-step transform."""

    def __init__(self, plan: FourStepPlan):
        ring = plan.ring
        self.plan = plan
        n1, n2 = plan.n1, plan.n2
        n, m = ring.degree, ring.nmoduli
        assert n1 * n2 == n
        dt = ring.dtype
        wbits = ring.repr_bits
        obj = ring.limb == "u64"
        ctx = ring.context()

        self.p_col = ctx.p_col
        shape1 = (m, max(n1 - 1, 1))
        shape2 = (m, max(n2 - 1, 1))
        self.col_w = np.empty(shape1, dtype=dt)       # size-n1 tables
        self.col_ws = np.empty(shape1, dtype=dt)
        self.col_iw = np.empty(shape1, dtype=dt)
        self.col_iws = np.empty(shape1, dtype=dt)
        self.row_w = np.empty(shape2, dtype=dt)       # size-n2 tables
        self.row_ws = np.empty(shape2, dtype=dt)
        self.row_iw = np.empty(shape2, dtype=dt)
        self.row_iws = np.empty(shape2, dtype=dt)

        for cm in range(m):
            p = int(ring.moduli[cm])
            w = ctx.omega_int[cm]
            iw = pow(w, -1, p)
            w1, iw1 = pow(w, n2, p), pow(iw, n2, p)
            w2, iw2 = pow(w, n1, p), pow(iw, n1, p)
            self.col_w[cm], self.col_ws[cm] = [a.astype(dt) for a in
                                               _sub_tables(p, w1, n1, wbits, obj)]
            self.col_iw[cm], self.col_iws[cm] = [a.astype(dt) for a in
                                                 _sub_tables(p, iw1, n1, wbits, obj)]
            self.row_w[cm], self.row_ws[cm] = [a.astype(dt) for a in
                                               _sub_tables(p, w2, n2, wbits, obj)]
            self.row_iw[cm], self.row_iws[cm] = [a.astype(dt) for a in
                                                 _sub_tables(p, iw2, n2, wbits, obj)]

        # phi pre-twist and inverse un-twist reshaped to [m, n1, n2]
        self.phis = ctx.phis.reshape(m, n1, n2)
        self.shoupphis = ctx.shoupphis.reshape(m, n1, n2)
        self.ivp = ctx.invpoly_times_invphis.reshape(m, n1, n2)
        self.ivp_s = ctx.shoupinvpoly_times_invphis.reshape(m, n1, n2)

        self.rev1 = bitrev_indices(n1)
        self.rev2 = bitrev_indices(n2)

    # --- [m, n1, n2] elementwise twiddle tables, built LAZILY per family -
    # Any one pipeline direction/backend reads only one of the four
    # (value, shoup) families below; eager __init__ construction built all
    # four (12 full-size arrays + 4 shoup passes) on first context use.

    @functools.cached_property
    def _t_it(self):
        """uint64 [m, n1, n2] w^(k1*i2) and w^(-k1*i2) — the shared
        intermediate, built column-iteratively with vectorized exact
        modmuls (no per-k1 python loop: round-2 VERDICT item 4)."""
        ring = self.plan.ring
        n1, n2 = self.plan.n1, self.plan.n2
        m = ring.nmoduli
        obj = ring.limb == "u64"
        ctx = ring.context()
        t_all = np.empty((m, n1, n2), dtype=np.uint64)
        it_all = np.empty((m, n1, n2), dtype=np.uint64)
        for cm in range(m):
            p = int(ring.moduli[cm])
            w = ctx.omega_int[cm]
            iw = pow(w, -1, p)
            k1_u64 = np.asarray(_powers_mod(w, n1, p, obj=obj)
                                ).astype(np.uint64)
            ik1_u64 = np.asarray(_powers_mod(iw, n1, p, obj=obj)
                                 ).astype(np.uint64)
            t_all[cm, :, 0] = 1
            it_all[cm, :, 0] = 1
            for i2 in range(1, n2):
                t_all[cm, :, i2] = _np_mulmod_vec(
                    t_all[cm, :, i2 - 1], k1_u64, p)
                it_all[cm, :, i2] = _np_mulmod_vec(
                    it_all[cm, :, i2 - 1], ik1_u64, p)
        return t_all, it_all

    def _with_shoup(self, vals):
        """(values, shoup) pair in the ring dtype from uint64 canonical."""
        ring = self.plan.ring
        dt = ring.dtype
        wbits = ring.repr_bits
        s = np.empty(vals.shape, dtype=np.uint64)
        for cm in range(ring.nmoduli):
            p = int(ring.moduli[cm])
            s[cm] = _np_shoup_vec(vals[cm].reshape(-1), p,
                                  wbits).reshape(vals.shape[1:])
        return vals.astype(dt), s.astype(dt)

    def _i2_scale(self, inverse):
        """phi^(i2) (fwd) or n^-1 * phi^(-i2) (inv) per channel — the
        twist part that folds into the MXU-path twiddles."""
        ring = self.plan.ring
        n2 = self.plan.n2
        obj = ring.limb == "u64"
        ctx = ring.context()
        out = np.empty((ring.nmoduli, n2), dtype=np.uint64)
        for cm in range(ring.nmoduli):
            p = int(ring.moduli[cm])
            phi = ctx.phi_int[cm]
            if inverse:
                out[cm] = _powers_mod(pow(phi, -1, p), n2, p,
                                      start=int(ctx.invpolyDegree[cm]),
                                      obj=obj)
            else:
                out[cm] = _powers_mod(phi, n2, p, obj=obj)
        return out

    @functools.cached_property
    def _plain_fwd(self):
        return self._with_shoup(self._t_it[0])

    @functools.cached_property
    def _plain_inv(self):
        return self._with_shoup(self._t_it[1])

    @functools.cached_property
    def _twisted_fwd(self):
        ring = self.plan.ring
        t = self._t_it[0]
        sc = self._i2_scale(False)
        out = np.empty_like(t)
        for cm in range(ring.nmoduli):
            out[cm] = _np_mulmod_vec(t[cm], sc[cm][None, :],
                                     int(ring.moduli[cm]))
        return self._with_shoup(out)

    @functools.cached_property
    def _twisted_inv(self):
        ring = self.plan.ring
        it = self._t_it[1]
        sc = self._i2_scale(True)
        out = np.empty_like(it)
        for cm in range(ring.nmoduli):
            out[cm] = _np_mulmod_vec(it[cm], sc[cm][None, :],
                                     int(ring.moduli[cm]))
        return self._with_shoup(out)

    @property
    def twiddle(self):          # w^(k1*i2)
        return self._plain_fwd[0]

    @property
    def twiddle_s(self):
        return self._plain_fwd[1]

    @property
    def itwiddle(self):         # w^(-k1*i2)
        return self._plain_inv[0]

    @property
    def itwiddle_s(self):
        return self._plain_inv[1]

    @property
    def twiddle_tw(self):       # * phi^(i2)   (MXU twisted path)
        return self._twisted_fwd[0]

    @property
    def twiddle_tw_s(self):
        return self._twisted_fwd[1]

    @property
    def itwiddle_tw(self):      # * n^-1 phi^(-i2)
        return self._twisted_inv[0]

    @property
    def itwiddle_tw_s(self):
        return self._twisted_inv[1]

    def _stage_slices(self, blocked, size):
        out = []
        off = 0
        k = size
        while k >= 2:
            out.append(blocked[:, off:off + k // 2])
            off += k // 2
            k //= 2
        return out


@functools.lru_cache(maxsize=None)
def get_four_step_context(ring: Ring, n1: int, n2: int) -> FourStepContext:
    if n1 < 2 or n2 < 2 or n1 * n2 != ring.degree:
        raise ValueError(
            f"four-step factors must each be >= 2 and multiply to the "
            f"degree: n1={n1}, n2={n2}, degree={ring.degree} (a degenerate "
            f"factor means there is nothing to shard — use the single-chip "
            f"dispatch)")
    return FourStepContext(FourStepPlan(ring, n1, n2))


# ---------------------------------------------------------------------------
# local building blocks (run inside shard_map per device)
# ---------------------------------------------------------------------------

def _twiddle_mul(x, tw, tws, p3):
    """Elementwise Shoup twiddle used by every four-step branch — the
    plain jnp form, deliberately: a pair-native Pallas bridge
    (ops/pair_bridge.py) and an in-kernel matmul epilogue were both tried
    and REJECTED under the paired protocol (TWIDDLE_AB.json: 1.04-1.07x /
    1.04-1.07x slower end-to-end at u64 2^20) — XLA fuses the
    emulated-u64 multiply into the surrounding program in-chain, so this
    form already runs at its practical floor on every tier.  Keeping the
    single dispatch point so the distributed path and the single-chip
    large path (ntt_mxu_u64._large_run64) stay structurally identical
    (the scaling gate's 1.0x-overhead premise, round-4 VERDICT item 1)."""
    return modops.mulmod_shoup(x, tw, tws, p3)


def _dft_lastaxis(x, blocked, blocked_s, size, p_col, rev):
    """Forward size-`size` DFT along the last axis of [..., m, B, size],
    natural output order (Harvey core + bitrev gather)."""
    if size == 1:
        return x
    ctx_tabs = []
    off = 0
    k = size
    while k >= 2:
        ctx_tabs.append((off, k // 2))
        off += k // 2
        k //= 2
    wt = [blocked[:, o:o + l] for o, l in ctx_tabs]
    ws = [blocked_s[:, o:o + l] for o, l in ctx_tabs]
    two_p = (p_col * 2).astype(x.dtype)
    # _ntt_core wants [..., m, n]: fold the B axis into batch by moving m next
    # to the transform axis.  x: [..., m, B, size] -> [..., B, m, size]
    xt = jnp.swapaxes(x, -3, -2)
    out = _ntt_core(xt, wt, ws, jnp.asarray(p_col), jnp.asarray(two_p))
    out = modops.reduce_once(out, jnp.asarray(p_col))
    out = jnp.take(out, jnp.asarray(rev), axis=-1)
    return jnp.swapaxes(out, -3, -2)


# ---------------------------------------------------------------------------
# distributed transforms
# ---------------------------------------------------------------------------

def _ppermute_transpose(x, tw, tws, p3, axis_name, d, fwd):
    """Twiddle + transpose expressed as d-1 point-to-point ppermutes (plus
    the local block) instead of one all-to-all.

    WHY: on real TPU compilations (AOT-verified against a v5e:2x4
    topology, tools/check_overlap.py) XLA lowers collective-permute to
    async `collective-permute-start/done` pairs that the latency-hiding
    scheduler can overlap with compute, while `all-to-all` stays
    SYNCHRONOUS — so this is the variant that actually hides the transpose
    behind the per-block twiddle on hardware.  Each step s twiddles the
    block destined for device (me + s) and sends it one hop; step s+1's
    twiddle has no data dependence on step s's transfer, so the scheduler
    interleaves them.  Total comm volume equals the all-to-all's.

    fwd=True: x [.., m, n1, n2/d] column shard -> [.., m, n1/d, n2] row
    shard (split axis -2, concat axis -1); fwd=False mirrors it.  Output
    is bit-identical to jax.lax.all_to_all(tiled=True) on the same
    operands: the block received from source j lands at slot j of the
    concat axis."""
    split_ax, concat_ax = (-2, -1) if fwd else (-1, -2)
    nsplit = x.shape[split_ax]
    s_blk = nsplit // d
    me = jax.lax.axis_index(axis_name).astype(jnp.int32)
    d32 = jnp.int32(d)

    def blk_at(arr, t):
        return jax.lax.dynamic_slice_in_dim(arr, t * s_blk, s_blk,
                                            axis=split_ax)

    out_shape = list(x.shape)
    out_shape[split_ax] = s_blk
    out_shape[concat_ax] = x.shape[concat_ax] * d
    out = jnp.zeros(tuple(out_shape), x.dtype)
    perm_cache = {}
    for s in range(d):
        t = jax.lax.rem(me + jnp.int32(s), d32)  # this block's destination
        blk = _twiddle_mul(blk_at(x, t), blk_at(tw, t), blk_at(tws, t),
                           p3)
        if s:
            perm = perm_cache.setdefault(
                s, [(j, (j + s) % d) for j in range(d)])
            blk = jax.lax.ppermute(blk, axis_name, perm)
        src = jax.lax.rem(me - jnp.int32(s) + d32, d32)  # block's sender
        out = jax.lax.dynamic_update_slice_in_dim(
            out, blk, src * x.shape[concat_ax], axis=concat_ax)
    return out


def four_step_ntt_local(x, fctx: FourStepContext, col_slice=None,
                        row_slice=None, axis_name=None, n_devices=1,
                        chunks=1, transpose="a2a", backends=None):
    """Forward four-step pass.  x: [m, n1, n2_local] (column shard when
    axis_name is set, else the full [m, n1, n2]).  Returns [m, n1_local, n2]
    row shard (or full array single-device).

    chunks > 1 splits the twiddle + all-to-all into `chunks` independent
    pieces along the row axis (each chunk is the c-th sub-rows of every
    device-destination block, so concatenating chunk outputs reproduces the
    monolithic transpose exactly).  XLA's async collectives then overlap
    chunk c's transpose with chunk c+1's twiddle compute — the main
    multi-host scaling lever (SURVEY.md §7 hard parts, last bullet)."""
    ring = fctx.plan.ring
    n1, n2 = fctx.plan.n1, fctx.plan.n2
    p_col = jnp.asarray(fctx.p_col)
    p3 = p_col[..., None]                      # [m,1,1]

    cols = slice(None) if col_slice is None else col_slice
    mod, mod2 = _backend_mods(ring, n1, n2, backends)
    # MXU path (both stages dispatched): the phi pre-twist is FOLDED into
    # the column-DFT matrices (phi^(n2*i1) part, fourstep_col_fwd_tw) and
    # the twiddle tables (phi^(i2) part, twiddle_tw) — no separate
    # elementwise twist pass (a full HBM round trip at large n)
    twisted = mod is not None and mod2 is not None
    if not twisted:
        # 1. pre-twist by phi^i (column shard of the [m, n1, n2] table)
        x = modops.mulmod_shoup(x, jnp.asarray(fctx.phis[:, :, cols]),
                                jnp.asarray(fctx.shoupphis[:, :, cols]), p3)
    # 2. size-n1 DFT down columns: transform axis is n1 (axis -2).
    # Fused MXU kernel when dispatched (no axis swaps — the kernel contracts
    # the sublane axis directly); jnp stage loop otherwise.
    if twisted:
        x = mod.matmul_mod(x, ring, "fourstep_col_fwd_tw", n1, axis=-2)
    elif mod is not None:
        x = mod.dft_along(x, ring, n1, axis=-2)
    else:
        xt = jnp.swapaxes(x, -1, -2)           # [m, n2l, n1]
        xt = _dft_lastaxis(xt, jnp.asarray(fctx.col_w),
                           jnp.asarray(fctx.col_ws),
                           n1, fctx.p_col, fctx.rev1)
        x = jnp.swapaxes(xt, -1, -2)           # [m, n1, n2l], k1 natural
    tw_t = fctx.twiddle_tw if twisted else fctx.twiddle
    tws_t = fctx.twiddle_tw_s if twisted else fctx.twiddle_s
    tw = jnp.asarray(tw_t[:, :, cols])
    tws = jnp.asarray(tws_t[:, :, cols])
    if axis_name is not None and transpose == "ppermute":
        assert chunks == 1, "ppermute already pipelines per block"
        x = _ppermute_transpose(x, tw, tws, p3, axis_name, n_devices,
                                fwd=True)                   # [m, n1/D, n2]
    elif axis_name is not None and chunks > 1:
        # 3+4 chunked: per chunk, twiddle the c-th sub-rows of every
        # destination block then transpose them; XLA overlaps the async
        # all-to-all of chunk c with the twiddle of chunk c+1
        m_, _, n2l = x.shape[-3:]
        d = n_devices
        s = n1 // d // chunks
        x5 = x.reshape(x.shape[:-3] + (m_, d, chunks, s, n2l))
        t5 = tw.reshape(tw.shape[:-3] + (m_, d, chunks, s, n2l))
        ts5 = tws.reshape(tws.shape[:-3] + (m_, d, chunks, s, n2l))
        outs = []
        for c in range(chunks):
            xc = x5[..., :, :, c, :, :].reshape(
                x.shape[:-3] + (m_, d * s, n2l))
            tc = t5[..., :, :, c, :, :].reshape(
                x.shape[:-3] + (m_, d * s, n2l))
            tsc = ts5[..., :, :, c, :, :].reshape(
                x.shape[:-3] + (m_, d * s, n2l))
            xc = modops.mulmod_shoup(xc, tc, tsc, p3)
            outs.append(jax.lax.all_to_all(
                xc, axis_name, split_axis=xc.ndim - 2,
                concat_axis=xc.ndim - 1, tiled=True))   # [m, s, n2]
        x = jnp.concatenate(outs, axis=-2)              # [m, n1/D, n2]
    else:
        # 3. twiddle w^(k1*i2)
        x = _twiddle_mul(x, tw, tws, p3)
        # 4. all-to-all transpose: columns shard -> rows shard
        if axis_name is not None:
            x = jax.lax.all_to_all(x, axis_name, split_axis=1,
                                   concat_axis=2, tiled=True)  # [m, n1/D, n2]
    # 5. size-n2 DFT along rows
    if mod2 is not None:
        x = mod2.dft_along(x, ring, n2, axis=-1)
    else:
        x = _dft_lastaxis(x, jnp.asarray(fctx.row_w),
                          jnp.asarray(fctx.row_ws),
                          n2, fctx.p_col, fctx.rev2)
    return x


def four_step_intt_local(x, fctx: FourStepContext, row_slice=None,
                         axis_name=None, n_devices=1, chunks=1,
                         transpose="a2a", backends=None):
    """Inverse of four_step_ntt_local.  x: [m, n1_local, n2] row shard ->
    [m, n1, n2_local] column shard of the coefficient tensor.

    chunks > 1: same comm/compute-overlap structure as the forward pass,
    mirrored — the inverse twiddle of chunk c+1 overlaps the transpose of
    chunk c (each chunk is the c-th sub-columns of every destination
    block)."""
    n1, n2 = fctx.plan.n1, fctx.plan.n2
    p_col = jnp.asarray(fctx.p_col)
    p3 = p_col[..., None]

    ring = fctx.plan.ring
    mod, mod2 = _backend_mods(ring, n1, n2, backends)
    # MXU path: the n^-1 phi^-i untwist is FOLDED into the inverse
    # column-DFT matrices (phi^(-n2*i1), fourstep_col_inv_tw) and the
    # inverse twiddles (n^-1 phi^(-i2), itwiddle_tw) — callers skip the
    # separate _untwist pass (mirrors the forward folding)
    twisted = mod is not None and mod2 is not None

    def col_idft(v):
        if twisted:
            return mod.matmul_mod(v, ring, "fourstep_col_inv_tw", n1,
                                  axis=-2)
        if mod is not None:
            return mod.dft_along(v, ring, n1, axis=-2, inverse=True)
        vt = jnp.swapaxes(v, -1, -2)
        vt = _dft_lastaxis(vt, jnp.asarray(fctx.col_iw),
                           jnp.asarray(fctx.col_iws),
                           n1, fctx.p_col, fctx.rev1)
        return jnp.swapaxes(vt, -1, -2)

    rows = slice(None) if row_slice is None else row_slice
    # inverse of step 5: unscaled inverse DFT along rows
    if mod2 is not None:
        x = mod2.dft_along(x, ring, n2, axis=-1, inverse=True)
    else:
        x = _dft_lastaxis(x, jnp.asarray(fctx.row_iw),
                          jnp.asarray(fctx.row_iws),
                          n2, fctx.p_col, fctx.rev2)
    itw_t = fctx.itwiddle_tw if twisted else fctx.itwiddle
    itws_t = fctx.itwiddle_tw_s if twisted else fctx.itwiddle_s
    itw = jnp.asarray(itw_t[:, rows, :])
    itws = jnp.asarray(itws_t[:, rows, :])
    if axis_name is not None and transpose == "ppermute":
        assert chunks == 1, "ppermute already pipelines per block"
        x = _ppermute_transpose(x, itw, itws, p3, axis_name, n_devices,
                                fwd=False)                  # [m, n1, n2/D]
        return col_idft(x), None
    if axis_name is not None and chunks > 1:
        m_, n1l, _ = x.shape[-3:]
        d = n_devices
        s = n2 // d // chunks
        x5 = x.reshape(x.shape[:-3] + (m_, n1l, d, chunks, s))
        t5 = itw.reshape(itw.shape[:-3] + (m_, n1l, d, chunks, s))
        ts5 = itws.reshape(itws.shape[:-3] + (m_, n1l, d, chunks, s))
        outs = []
        for c in range(chunks):
            xc = x5[..., :, :, :, c, :].reshape(
                x.shape[:-3] + (m_, n1l, d * s))
            tc = t5[..., :, :, :, c, :].reshape(
                x.shape[:-3] + (m_, n1l, d * s))
            tsc = ts5[..., :, :, :, c, :].reshape(
                x.shape[:-3] + (m_, n1l, d * s))
            xc = modops.mulmod_shoup(xc, tc, tsc, p3)
            outs.append(jax.lax.all_to_all(
                xc, axis_name, split_axis=xc.ndim - 1,
                concat_axis=xc.ndim - 2, tiled=True))   # [m, n1, s]
        x = jnp.concatenate(outs, axis=-1)              # [m, n1, n2/D]
        return col_idft(x), None
    # inverse twiddle (row shard of the [m, n1, n2] table)
    x = _twiddle_mul(x, itw, itws, p3)
    # transpose back: rows shard -> columns shard
    if axis_name is not None:
        x = jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                               tiled=True)     # [m, n1, n2/D]
    # inverse of step 2: inverse DFT down columns
    x = col_idft(x)
    # un-twist by n^-1 * phi^-i (column shard; includes both 1/n1 and 1/n2)
    # — already folded on the twisted MXU path
    if twisted:
        return x, None
    cols = slice(None) if axis_name is None else None
    return x, cols  # caller applies the column-sharded un-twist


def _untwist(x, fctx: FourStepContext, col_slice, p3):
    cols = slice(None) if col_slice is None else col_slice
    return modops.mulmod_shoup(x, jnp.asarray(fctx.ivp[:, :, cols]),
                               jnp.asarray(fctx.ivp_s[:, :, cols]), p3)


# ---------------------------------------------------------------------------
# mesh-level API
# ---------------------------------------------------------------------------

def _col_slice_for(fctx, axis_name):
    idx = jax.lax.axis_index(axis_name)
    return idx


class _TableView:
    """FourStepContext facade whose elementwise tables are the per-device
    shards delivered as shard_map arguments (sharded by construction at
    device_put — replacing the round-2 replicate-then-gather, VERDICT
    item 4).  Sub-DFT tables stay small trace-time constants."""

    def __init__(self, fctx: FourStepContext, **tables):
        self.plan = fctx.plan
        self.p_col = fctx.p_col
        self.col_w, self.col_ws = fctx.col_w, fctx.col_ws
        self.col_iw, self.col_iws = fctx.col_iw, fctx.col_iws
        self.row_w, self.row_ws = fctx.row_w, fctx.row_ws
        self.row_iw, self.row_iws = fctx.row_iw, fctx.row_iws
        self.rev1, self.rev2 = fctx.rev1, fctx.rev2
        for k, v in tables.items():
            setattr(self, k, v)


def _resolve_transpose(transpose: str, chunks: int = 1, mesh=None) -> str:
    """'auto' -> 'ppermute' on TPU, 'a2a' elsewhere.  On real TPU
    compilations all-to-all stays SYNCHRONOUS while collective-permute
    lowers to async start/done pairs the scheduler overlaps with the
    per-block twiddles (OVERLAP.json, AOT v5e:2x4 with the production MXU
    kernels) — so ppermute is the production default there.  CPU has no
    async collective runtime, where ppermute's d-1 sequential hops only
    cost wall clock; a2a stays the default off-TPU.  An explicit chunks>1
    request keeps a2a (ppermute already pipelines per block).

    The platform is read off the MESH's devices when given (a CPU mesh in
    a process whose default backend is TPU — e.g. a tool that AOT-compiled
    for TPU earlier — must still resolve to a2a), falling back to the
    process default backend for AOT meshes whose devices carry no client.
    """
    if transpose not in ("auto", "a2a", "ppermute"):
        raise ValueError(f"transpose must be auto|a2a|ppermute, "
                         f"got {transpose!r}")
    if transpose != "auto":
        return transpose
    if chunks > 1:
        return "a2a"
    from ..ops.ntt import auto_on_tpu
    return "ppermute" if auto_on_tpu(mesh) else "a2a"


def _resolved_backends(ring: Ring, n1: int, n2: int, mesh: Mesh = None):
    """(use_mxu_col, use_mxu_row): whether dft_mxu owns each local stage.
    Resolved at CALL time and passed into the lru-cached builders as part
    of their key (ADVICE round 4): the NFL_TPU_NTT env var is read here, so
    flipping it mid-process builds (and caches) a separate compiled path
    instead of returning a stale one.

    Auto dispatch honors the MESH's platform, not the process default: in
    this environment the axon backend can be the process default while the
    transform targets a CPU mesh, and compiled Mosaic kernels cannot lower
    for CPU devices.  NFL_TPU_NTT=mxu still forces the kernels anywhere
    (interpret mode off-TPU — the tests/dryrun contract)."""
    from ..ops.ntt import auto_on_tpu, kernel_mode
    if mesh is not None and kernel_mode() == "auto" \
            and not auto_on_tpu(mesh):
        return (False, False)
    return (_dft_backend(ring, n1) is not None,
            _dft_backend(ring, n2) is not None)


def _backend_mods(ring, n1, n2, backends):
    """Materialize the (mod, mod2) module pair for an explicit or
    call-time-resolved backend choice."""
    if backends is None:
        return _dft_backend(ring, n1), _dft_backend(ring, n2)
    use1, use2 = backends
    if use1 or use2:
        _ensure_twisted_providers()
        from ..ops import dft_mxu
        return (dft_mxu if use1 else None), (dft_mxu if use2 else None)
    return None, None


def _fwd_tables(ring: Ring, mesh: Mesh, n1: int, deg_axis: str, backends):
    """Shared forward-builder setup: the four-step context, the
    column-sharded device tables, and the per-device table-view factory.

    The [m, n1, n2] elementwise tables (phi twist + four-step twiddle) are
    device_put with the column sharding once per build; each device's shard
    arrives as a shard_map argument, so per-device table memory is 1/D and
    no gather appears in the compiled program.  On the twisted MXU path
    (see four_step_ntt_local) the phi twist folds into the DFT matrices,
    so only the phi-folded twiddles ship and no phi tables at all."""
    n2 = ring.degree // n1
    fctx = get_four_step_context(ring, n1, n2)
    mod1, mod2 = _backend_mods(ring, n1, n2, backends)
    twisted = mod1 is not None and mod2 is not None

    col_sh = NamedSharding(mesh, P(None, None, deg_axis))
    host_tabs = ((fctx.twiddle_tw, fctx.twiddle_tw_s) if twisted else
                 (fctx.phis, fctx.shoupphis, fctx.twiddle, fctx.twiddle_s))
    # eager even under an outer jit trace: the builders are lru-cached, and
    # a traced device_put would cache tracers (UnexpectedTracerError later)
    with jax.ensure_compile_time_eval():
        tabs = tuple(jax.device_put(np.asarray(t), col_sh)
                     for t in host_tabs)

    def view(shards):
        if twisted:
            return _TableView(fctx, twiddle_tw=shards[0],
                              twiddle_tw_s=shards[1])
        return _TableView(fctx, phis=shards[0], shoupphis=shards[1],
                          twiddle=shards[2], twiddle_s=shards[3])

    return fctx, tabs, view


@functools.lru_cache(maxsize=None)
def _build_dist_fwd(ring: Ring, mesh: Mesh, n1: int, deg_axis: str,
                    ndim: int, chunks: int = 1, transpose: str = "a2a",
                    backends=None):
    """Cached jitted forward transform (one compile per shape family);
    table plumbing in _fwd_tables."""
    _, tabs, view = _fwd_tables(ring, mesh, n1, deg_axis, backends)
    d = mesh.shape[deg_axis]

    def local(xb, *shards):
        return four_step_ntt_local(xb, view(shards), col_slice=None,
                                   axis_name=deg_axis,
                                   n_devices=d, chunks=chunks,
                                   transpose=transpose, backends=backends)

    spec = P(*([None] * (ndim - 1) + [deg_axis]))
    out_spec = P(*([None] * (ndim - 2) + [deg_axis, None]))
    tspec = P(None, None, deg_axis)
    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(spec,) + (tspec,) * len(tabs),
                           out_specs=out_spec, check_vma=False))
    return lambda x: fn(x, *tabs)


def distributed_ntt_pow_phi(x, ring: Ring, mesh: Mesh, *, n1=None,
                            deg_axis: str = "deg", chunks: int = 1,
                            transpose: str = "auto"):
    """Forward negacyclic transform of [..., m, n] sharded over `deg_axis`.

    Returns the four-step layout [..., m, n1, n2] with rows (k1) sharded.
    E[k1 + n1*k2] = out[..., k1, k2]; the single-chip Harvey ordering is
    harvey[j] = E[bitrev_n(j)].

    transpose: 'auto' (ppermute on TPU, a2a elsewhere — see
    _resolve_transpose), or an explicit 'a2a'/'ppermute'.
    """
    transpose = _resolve_transpose(transpose, chunks, mesh)
    n = ring.degree
    d = mesh.shape[deg_axis]
    if n1 is None:
        n1 = 1 << (static_log2(n) // 2)
    n2 = n // n1
    assert n1 % d == 0 and n2 % d == 0, "factor sizes must split evenly"
    if chunks > 1:
        assert n1 % (d * chunks) == 0, "chunks must divide the row blocks"
    xr = x.reshape(x.shape[:-1] + (n1, n2))
    fn = _build_dist_fwd(ring, mesh, n1, deg_axis, xr.ndim, chunks,
                         transpose, _resolved_backends(ring, n1, n2, mesh))
    return fn(xr)


@functools.lru_cache(maxsize=None)
def _build_dist_fwd_pipelined(ring: Ring, mesh: Mesh, n1: int,
                              deg_axis: str, nbatch: int, backends=None,
                              transpose: str = "ppermute"):
    """THROUGHPUT-MODE builder: `nbatch` independent transforms in ONE
    jitted program, the batch loop UNROLLED inside shard_map so the TPU
    latency-hiding scheduler overlaps transform b's async
    collective-permute hops with transform b+1's local compute (column
    DFTs / twiddles) — the steady-state batch pipelining the scaling
    model's throughput mode is built on, as a real program instead of
    arithmetic (round-4 VERDICT item 4).

    Uses the ppermute transpose: on TPU, all-to-all stays synchronous
    (OVERLAP.json) so only collective-permute start/done pairs give the
    scheduler something to hide other batches' compute behind.  Output is
    bit-identical to running distributed_ntt_pow_phi per batch element
    (tests/test_parallel.py)."""
    _, tabs, view = _fwd_tables(ring, mesh, n1, deg_axis, backends)
    d = mesh.shape[deg_axis]

    def local(xb, *shards):
        f = view(shards)
        outs = [four_step_ntt_local(xb[b], f, col_slice=None,
                                    axis_name=deg_axis, n_devices=d,
                                    transpose=transpose, backends=backends)
                for b in range(nbatch)]
        return jnp.stack(outs)

    spec = P(None, None, None, deg_axis)
    out_spec = P(None, None, deg_axis, None)
    tspec = P(None, None, deg_axis)
    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(spec,) + (tspec,) * len(tabs),
                           out_specs=out_spec, check_vma=False))
    return lambda x: fn(x, *tabs)


def distributed_ntt_pow_phi_pipelined(x, ring: Ring, mesh: Mesh, *,
                                      n1=None, deg_axis: str = "deg",
                                      transpose: str = "ppermute"):
    """Batch-pipelined forward transform of [B, m, n] (B independent
    polynomials, the BASELINE ops/s throughput axis): one jitted program
    whose unrolled batch loop lets XLA overlap transform b's transpose
    collectives with transform b+1's compute.  Returns [B, m, n1, n2]
    row-sharded four-step layout, bit-identical per element to
    distributed_ntt_pow_phi."""
    # validates the string and maps 'auto'; default stays ppermute — the
    # hop-structured transpose is what gives the scheduler something to
    # overlap other transforms' compute with, on every platform
    if transpose == "auto":
        transpose = _resolve_transpose(transpose, 1, mesh)
    else:
        _resolve_transpose(transpose)  # reject typos loudly
    n = ring.degree
    d = mesh.shape[deg_axis]
    assert x.ndim == 3, "expected [B, m, n]"
    if n1 is None:
        n1 = 1 << (static_log2(n) // 2)
    n2 = n // n1
    assert n1 % d == 0 and n2 % d == 0, "factor sizes must split evenly"
    xr = x.reshape(x.shape[:-1] + (n1, n2))
    fn = _build_dist_fwd_pipelined(ring, mesh, n1, deg_axis, x.shape[0],
                                   _resolved_backends(ring, n1, n2, mesh),
                                   transpose)
    return fn(xr)


@functools.lru_cache(maxsize=None)
def _build_dist_inv(ring: Ring, mesh: Mesh, n1: int, deg_axis: str,
                    ndim: int, chunks: int = 1, transpose: str = "a2a",
                    backends=None):
    n = ring.degree
    n2 = n // n1
    fctx = get_four_step_context(ring, n1, n2)
    d = mesh.shape[deg_axis]
    # twisted MXU path (see four_step_intt_local): the untwist folds into
    # the inverse matrices + twiddles, so no ivp tables ship at all
    mod1, mod2 = _backend_mods(ring, n1, n2, backends)
    twisted = mod1 is not None and mod2 is not None

    row_sh = NamedSharding(mesh, P(None, deg_axis, None))
    col_sh = NamedSharding(mesh, P(None, None, deg_axis))
    with jax.ensure_compile_time_eval():
        if twisted:
            tabs = (jax.device_put(np.asarray(fctx.itwiddle_tw), row_sh),
                    jax.device_put(np.asarray(fctx.itwiddle_tw_s), row_sh))
        else:
            tabs = (jax.device_put(np.asarray(fctx.itwiddle), row_sh),
                    jax.device_put(np.asarray(fctx.itwiddle_s), row_sh),
                    jax.device_put(np.asarray(fctx.ivp), col_sh),
                    jax.device_put(np.asarray(fctx.ivp_s), col_sh))

    def local(yb, *shards):
        # jnp constants are created INSIDE the traced function: this builder
        # is lru-cached, and materializing them at build time under an outer
        # jit trace would cache tracers (UnexpectedTracerError later)
        p3 = jnp.asarray(fctx.p_col)[..., None]
        if twisted:
            f = _TableView(fctx, itwiddle_tw=shards[0],
                           itwiddle_tw_s=shards[1])
        else:
            f = _TableView(fctx, itwiddle=shards[0], itwiddle_s=shards[1],
                           ivp=shards[2], ivp_s=shards[3])
        xb, _ = four_step_intt_local(yb, f, row_slice=None,
                                     axis_name=deg_axis, n_devices=d,
                                     chunks=chunks, transpose=transpose,
                                     backends=backends)
        if twisted:
            return xb
        return _untwist(xb, f, None, p3)

    spec = P(*([None] * (ndim - 2) + [deg_axis, None]))
    out_spec = P(*([None] * (ndim - 2) + [None, deg_axis]))
    rspec = P(None, deg_axis, None)
    cspec = P(None, None, deg_axis)
    in_specs = (spec, rspec, rspec) if twisted \
        else (spec, rspec, rspec, cspec, cspec)
    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=in_specs,
                           out_specs=out_spec, check_vma=False))
    return lambda y: fn(y, *tabs)


def distributed_invntt_pow_invphi(y, ring: Ring, mesh: Mesh, *, n1=None,
                                  deg_axis: str = "deg", chunks: int = 1,
                                  transpose: str = "auto"):
    """Inverse of distributed_ntt_pow_phi: [..., m, n1(sharded), n2] four-step
    layout -> coefficient tensor [..., m, n] sharded over the degree axis."""
    transpose = _resolve_transpose(transpose, chunks, mesh)
    n = ring.degree
    if n1 is None:
        n1 = 1 << (static_log2(n) // 2)
    if chunks > 1:
        d = mesh.shape[deg_axis]
        assert (n // n1) % (d * chunks) == 0, \
            "chunks must divide the column blocks"
    fn = _build_dist_inv(ring, mesh, n1, deg_axis, y.ndim, chunks,
                         transpose, _resolved_backends(ring, n1, n // n1, mesh))
    out = fn(y)
    return out.reshape(out.shape[:-2] + (n,))


def four_step_reference(x, ring: Ring, n1: int):
    """Single-device four-step forward (no mesh) — for differential tests."""
    n2 = ring.degree // n1
    fctx = get_four_step_context(ring, n1, n2)
    xr = jnp.asarray(x).reshape(x.shape[:-1] + (n1, n2))
    out = four_step_ntt_local(xr, fctx)
    return out


def four_step_reference_inverse(y, ring: Ring, n1: int):
    n2 = ring.degree // n1
    fctx = get_four_step_context(ring, n1, n2)
    p3 = jnp.asarray(fctx.p_col)[..., None]
    xb, cols = four_step_intt_local(y, fctx)
    if cols is not None:       # non-twisted path: untwist not folded
        xb = _untwist(xb, fctx, None, p3)
    return xb.reshape(y.shape[:-2] + (ring.degree,))
