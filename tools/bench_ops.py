"""Per-primitive microbenchmarks — the reference's runtime benchmark harness
(tests/nfllib_demo_main_op.cpp:119-258) re-created for the TPU framework:
prints "us per operation" for every primitive at each config of the
reference's 5-point matrix (tests/CMakeLists.txt:1-7).

Device ops are timed by chain-differencing inside one jit program (host
readback sync; the tunnel RTT cancels in the difference).  Host sampling ops
are timed directly.

Usage: python tools/bench_ops.py [--config N] [--csv]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu import profiling  # noqa: E402
from nfllib_tpu.apps import lwe  # noqa: E402
from nfllib_tpu.ops import modops, ntt as ntt_mod  # noqa: E402
from nfllib_tpu.prng.salsa20 import Salsa20Stream  # noqa: E402
from nfllib_tpu.prng.gaussian import FastGaussianNoise  # noqa: E402
from nfllib_tpu.prng import sampling  # noqa: E402

CONFIGS = [
    (8, 60, "u32"),
    (128, 14, "u16"),
    (1024, 60, "u32"),
    (8192, 124, "u64"),
    (32768, 124, "u64"),
]

BATCH = 8   # polys per device op (the TPU-native unit of work)


def _rand(ring, rng, batch=BATCH):
    m, n = ring.nmoduli, ring.degree
    out = np.empty((batch, m, n), dtype=np.uint64)
    for cm in range(m):
        out[:, cm, :] = rng.integers(0, int(ring.moduli[cm]),
                                     size=(batch, n), dtype=np.uint64)
    return out.astype(ring.dtype)


def _time_device(fn_one, x, reps=5, chain=64, target_diff_s=0.03,
                 max_chain=65536):
    """us per application of fn_one (chain-differenced, batch amortized).

    One compiled program with a dynamic fori_loop trip count: K=1 and K
    share the compilation, and the time difference cancels the tunnel RTT.
    The chain length is ADAPTIVE (round-5 protocol lesson, CLAUDE.md): the
    RTT min itself jitters by single-digit ms, so K is grown until the
    differenced quantity (K-1)*t_app clears `target_diff_s` — `chain` is
    only the starting point.  A fixed small K (the round 2-4 harness) put
    fast primitives' readings inside the noise.
    """
    def f(v, k):
        return jax.lax.fori_loop(0, k, lambda i, vv: fn_one(vv), v)
    jf = jax.jit(f)
    idx = (0,) * x.ndim

    def run(k, n=reps):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            o = jf(x, k)
            _ = np.asarray(o[idx])
            best = min(best, time.perf_counter() - t0)
        return best

    _ = np.asarray(jf(x, 1)[idx])   # compile once
    # coarse estimate with the starting chain, then size K to the target
    t1, tk = run(1, 2), run(chain + 1, 2)
    t_est = max((tk - t1) / chain, 1e-8)
    K = int(min(max(np.ceil(target_diff_s / t_est) + 1, chain + 1),
                max_chain))
    while True:
        run(K, 1)                    # warm the long-chain dispatch
        t1, tk = run(1), run(K)
        # an RTT spike during the estimate can under-size K; if the
        # measured difference still sits inside the jitter floor, grow K
        # and re-measure rather than record noise
        if tk - t1 >= target_diff_s / 3:
            return (tk - t1) / (K - 1) * 1e6
        if K >= max_chain:
            # even max_chain applications stay inside the jitter floor —
            # return None (rendered n/a) instead of recording noise
            return None
        K = int(min(K * 8, max_chain))


def _time_host(fn, reps=20):
    """us per call, best-of-reps (profiling.WallTimer is the chrono-style
    accumulator mirroring reference tests/tools.h:28-33)."""
    best = float("inf")
    for _ in range(reps):
        t = profiling.WallTimer()
        with t.measure():
            fn()
        best = min(best, t.mean_us)
    return best


def bench_config(degree, agg, limb, csv=False):
    ring = nfl.ring_from_modulus(limb, degree, agg)
    ctx = ring.context()
    rng = np.random.default_rng(7)
    p_col = jnp.asarray(ctx.p_col)
    pn_col = jnp.asarray(ctx.pn_col)
    a = jnp.asarray(_rand(ring, rng))
    b = jnp.asarray(_rand(ring, rng))
    bprec = jax.jit(lambda v: modops.compute_shoup(v, p_col))(b)

    rows = []

    def rec(name, us):
        # per-poly figure (batch-normalized), matching the reference's
        # single-poly loop numbers; None = below the jitter floor even at
        # max_chain (recorded as n/a, never as a noise-scale number)
        rows.append((name, None if us is None else us / BATCH))

    # elementwise ops are sub-microsecond per batch: use long chains so the
    # measured delta dwarfs the tunnel jitter
    ew = 2048 if degree <= 4096 else 256
    rec("add", _time_device(lambda v: modops.addmod(v, b, p_col), a, chain=ew))
    rec("sub", _time_device(lambda v: modops.submod(v, b, p_col), a, chain=ew))
    rec("mul (pointwise)",
        _time_device(lambda v: modops.mulmod(v, b, p_col, pn_col), a,
                     chain=ew))
    rec("mulmod_shoup",
        _time_device(lambda v: modops.mulmod_shoup(v, b, bprec, p_col), a,
                     chain=ew))
    rec("muladd (fma)",
        _time_device(lambda v: modops.muladd(v, a, b, p_col, pn_col), a,
                     chain=ew))
    rec("muladd_shoup",
        _time_device(lambda v: modops.muladd_shoup(v, a, b, bprec, p_col), a,
                     chain=ew))
    rec("ntt_pow_phi", _time_device(lambda v: ntt_mod.ntt_pow_phi(v, ctx), a))
    rec("invntt_pow_invphi",
        _time_device(lambda v: ntt_mod.invntt_pow_invphi(v, ctx), a))

    # end-to-end LWE chains (reference demo encrypt/decrypt timing,
    # nfllib_demo_main_op.cpp:292-311); on TPU these route through the fused
    # Pallas chain kernels (ops/ntt_pallas.py lwe_*_fused)
    stream = Salsa20Stream(b"\x11" * 32)
    g = lwe.make_gaussian_prng(samples=max(degree, 1 << 10))
    keys = lwe.keygen(ring, stream, g)
    e2 = jnp.asarray(_rand(ring, rng))
    rec("lwe encrypt (chain)", _time_device(
        lambda v: lwe._encrypt_graph(ctx, keys.pka.data, keys.pkb.data,
                                     v, b, e2)[0], a))
    resa, resb = jax.jit(lambda u: lwe._encrypt_graph(
        ctx, keys.pka.data, keys.pkb.data, u, b, e2))(a)
    rec("lwe decrypt (chain)", _time_device(
        lambda v: lwe._decrypt_graph(ctx, v, resb, keys.s.data,
                                     keys.sprime.data), resa))

    # host sampling (per poly)
    s = Salsa20Stream(b"\x13" * 32)
    rows.append(("uniform (host)",
                 _time_host(lambda: sampling.sample_uniform(ring, s))))
    rows.append(("non_uniform ub=7 (host)", _time_host(
        lambda: sampling.sample_non_uniform(ring, s,
                                            sampling.non_uniform(7)))))
    fg = FastGaussianNoise(4.0, 128, max(degree, 1024))
    rows.append(("gaussian (host)", _time_host(
        lambda: sampling.sample_gaussian(ring, s, sampling.gaussian(fg)),
        reps=5)))

    hdr = f"== n={degree} {agg}-bit {limb} (batch={BATCH}, " \
          f"backend={jax.default_backend()}) =="
    print(hdr)
    for name, us in rows:
        if csv:
            val = "n/a" if us is None else f"{us:.3f}"
            print(f"{degree},{agg},{limb},{name},{val}")
        else:
            val = "         n/a" if us is None else f"{us:12.3f}"
            print(f"  {name:26s} {val} us/poly")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=None,
                    help="index into the 5-point matrix (default: all)")
    ap.add_argument("--csv", action="store_true")
    ap.add_argument("--trace", metavar="DIR", default=None,
                    help="capture a jax.profiler device trace to DIR "
                         "(view with TensorBoard/XProf)")
    args = ap.parse_args()
    cfgs = CONFIGS if args.config is None else [CONFIGS[args.config]]

    def run_all():
        for degree, agg, limb in cfgs:
            with profiling.annotate(f"bench_n{degree}_{limb}"):
                bench_config(degree, agg, limb, csv=args.csv)

    if args.trace:
        with profiling.trace(args.trace):
            run_all()
    else:
        run_all()


if __name__ == "__main__":
    main()
