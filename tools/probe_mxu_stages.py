"""Stage-isolation probe for the fused MXU NTT kernel (diagnostic only).

Times kernel variants on the real chip to attribute the per-program cost:
  io        : load -> one select -> store
  digitize  : load -> balanced digitize -> trivial combine -> store
  mm1       : + the 16 column-DFT dots (raw group sums, no recombine)
  mm1rec    : + recombination to canonical
  full      : the production kernel (dispatch path)
Variants other than `full` are mathematically wrong on purpose.
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import nfllib_tpu as nfl
from nfllib_tpu.ops import ntt_mxu as M

N, MCH, BATCH, CHAIN = 1 << 14, 17, 64, 65


def _variant_kernel(mode, dbits, ndig, bb, n1, n2,
                    x_ref, w1_ref, w2_ref, tw_ref, tws_ref,
                    sh_ref, p_ref, o_ref):
    p = p_ref[0, 0, 0]
    sh = lambda j: sh_ref[0, 0, j]
    x = x_ref[...].reshape(bb, n1, n2).astype(jnp.uint32)
    if mode == "io":
        x = x - jnp.where(x >= p, p, jnp.zeros_like(x))
    elif mode == "digitize":
        d = M._digitize_i8(x, dbits, ndig)
        x = sum(di.astype(jnp.int32) for di in d).astype(jnp.uint32)
    elif mode in ("mm1", "mm1rec", "mm1rec_tw"):
        if mode == "mm1":
            # raw dots only (bitcast digitize + interleaved w1 tables)
            from jax.experimental.pallas import tpu as _pltpu
            xb = _pltpu.bitcast(x ^ jnp.uint32(0x80808080), jnp.int8)
            acc = None
            for a in range(ndig):
                for i in range(bb):
                    s = jax.lax.dot_general(
                        w1_ref[0, a], xb[i], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = s if acc is None else acc + s
            x = jnp.broadcast_to(acc.astype(jnp.uint32)[None], x.shape)
        else:
            x = M._left_matmul_batched(x, w1_ref[0], p, sh, dbits, ndig,
                                       bb, n1, n2)  # no corr: timing only
            if mode == "mm1rec_tw":
                q = M.modops._mulhi_u32(x, tws_ref[0])
                x = x * tw_ref[0] - q * p
                x = x - jnp.where(x >= p, p, jnp.zeros_like(x))
    o_ref[...] = x.reshape(bb, 1, n1, n2).astype(o_ref.dtype)


def build_variant(ring, mode):
    ctx = ring.context()
    m = ring.nmoduli
    n1, n2, w1l, w2l, tw, tws, corr1, corr2, shoup1, p_vec = \
        M._fused_tables(ring)
    dbits, ndig = M._fused_geometry(ring.degree, ring.limb)[2:]
    _i0 = np.int32(0)

    def call(xb):
        B = xb.shape[0]
        bb = M._batch_block(B, ring.degree)
        return pl.pallas_call(
            functools.partial(_variant_kernel, mode, dbits, ndig, bb, n1, n2),
            grid=(m, B // bb),
            in_specs=[
                pl.BlockSpec((bb, 1, n1, n2), lambda c, b: (b, c, _i0, _i0),
                             memory_space=pltpu.VMEM),
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
                pl.BlockSpec((1, 1, 5), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda c, b: (c, _i0, _i0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bb, 1, n1, n2),
                                   lambda c, b: (b, c, _i0, _i0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xb.shape, ring.dtype),
            interpret=False,
        )(xb, jnp.asarray(w1l), jnp.asarray(w2l), jnp.asarray(tw),
          jnp.asarray(tws), jnp.asarray(shoup1.reshape(m, 1, 5)),
          jnp.asarray(p_vec))

    return call


def timing(fn, xd):
    jf = jax.jit(lambda v, k: jax.lax.fori_loop(
        0, k, lambda i, vv: fn(vv.reshape(BATCH, MCH, *xd.shape[2:])), v))
    _ = np.asarray(jf(xd, 1)[0, 0, 0, 0:1])
    def one(K):
        t0 = time.perf_counter()
        o = jf(xd, K)
        _ = np.asarray(o[0, 0, 0, 0:1])
        return time.perf_counter() - t0
    best = float("inf")
    for _ in range(4):
        t1 = tk = float("inf")
        for _ in range(3):
            t1 = min(t1, one(1))
            tk = min(tk, one(CHAIN))
        best = min(best, (tk - t1) / (CHAIN - 1))
    return best


def main():
    ring = nfl.Ring("u32", N, MCH)
    ctx = ring.context()
    n1, n2 = M._fused_geometry(N)[:2]
    rng = np.random.default_rng(3)
    x = np.empty((BATCH, MCH, n1, n2), dtype=np.uint32)
    for cm in range(MCH):
        x[:, cm] = rng.integers(0, int(ring.moduli[cm]),
                                size=(BATCH, n1, n2), dtype=np.uint32)
    xd = jnp.asarray(x)

    for mode in ("io", "digitize", "mm1", "mm1rec", "mm1rec_tw"):
        fn = build_variant(ring, mode)
        t = timing(fn, xd)
        print(f"{mode:10s} {t*1e6:8.1f} us/app", flush=True)
    full = timing(lambda v: M.ntt_pow_phi_fused(
        v.reshape(BATCH, MCH, N), ctx).reshape(BATCH, MCH, n1, n2), xd)
    print(f"{'full':10s} {full*1e6:8.1f} us/app  "
          f"({BATCH*MCH/full/1e6:.3f} M ntt/s)", flush=True)


if __name__ == "__main__":
    main()
