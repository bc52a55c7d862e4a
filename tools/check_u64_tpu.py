"""One-off: verify the u64 Pallas kernel compiles + is bit-exact on the real
TPU, and time it against the jnp (XLA-emulated u64) path.

Run from the repo root: python tools/check_u64_tpu.py [degrees...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.ops import ntt as ntt_jnp  # noqa: E402
from nfllib_tpu.ops import ntt_pallas_u64  # noqa: E402

print("backend:", jax.default_backend(), jax.devices())
rng = np.random.default_rng(7)
degrees = [int(a) for a in sys.argv[1:]] or [1024, 8192, 32768]

for n in degrees:
    ring = nfl.ring_from_modulus("u64", n, 124)
    ctx = ring.context()
    m = ring.nmoduli
    x = np.empty((m, n), dtype=np.uint64)
    for cm in range(m):
        x[cm] = rng.integers(0, ctx.p[cm], size=n, dtype=np.uint64)

    t0 = time.time()
    got = np.asarray(ntt_pallas_u64.ntt_fwd(x, ctx, interpret=False))
    t_compile = time.time() - t0
    want = np.asarray(ntt_jnp.ntt_pow_phi(x, ctx))
    ok_f = np.array_equal(want, got)
    back = np.asarray(ntt_pallas_u64.intt_bwd(got, ctx, interpret=False))
    ok_r = np.array_equal(back, x)
    print(f"n={n:6d} m={m} fwd_exact={ok_f} roundtrip={ok_r} "
          f"first_call={t_compile:.1f}s")

    # timing: chained fori_loop, chain-differencing per CLAUDE.md
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnums=())
    def chain(xb, k):
        def step(_, v):
            return ntt_pallas_u64.ntt_fwd(v, ctx, interpret=False)
        return jax.lax.fori_loop(0, k, step, xb)

    xj = jnp.asarray(x)

    def t_of(k, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            out = chain(xj, k)
            np.asarray(out[0, 0:1])
            best = min(best, time.time() - t0)
        return best

    chain(xj, 1)
    chain(xj, 33)
    dt = (t_of(33) - t_of(1)) / 32
    per_chan = dt / m
    print(f"         pallas: {dt*1e6:8.1f} us/poly-NTT  "
          f"{per_chan*1e6:6.1f} us/chan  {1/per_chan:,.0f} chan-NTT/s")

    @jax.jit
    def chain_jnp(xb, k):
        def step(_, v):
            return ntt_jnp.ntt_pow_phi(v, ctx)
        return jax.lax.fori_loop(0, k, step, xb)

    import os
    os.environ["NFL_TPU_NTT"] = "jnp"
    try:
        def tj(k, reps=3):
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                out = chain_jnp(xj, k)
                np.asarray(out[0, 0:1])
                best = min(best, time.time() - t0)
            return best
        chain_jnp(xj, 1); chain_jnp(xj, 33)
        dtj = (tj(33) - tj(1)) / 32
        print(f"         jnp:    {dtj*1e6:8.1f} us/poly-NTT  "
              f"speedup {dtj/dt:.1f}x")
    finally:
        del os.environ["NFL_TPU_NTT"]
