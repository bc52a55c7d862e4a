"""One-off: verify the u64 Pallas kernel compiles + is bit-exact on the real
TPU, and time it against the jnp (XLA-emulated u64) path.

Timing uses the round-5 paired adaptive-K protocol (check_onchip
_paired_chain_times) — both backends interleaved per round, chain length
sized so the differenced quantity clears the tunnel-jitter floor.

Run from the repo root: python tools/check_u64_tpu.py [degrees...]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.ops import ntt as ntt_jnp  # noqa: E402
from nfllib_tpu.ops import ntt_pallas_u64  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from check_onchip import _paired_chain_times  # noqa: E402

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
    if not (ok_f and ok_r):
        sys.exit(f"BIT-EXACTNESS FAILURE at n={n}")

    # pin the dispatching entry to the jnp stage loop for the B case (the
    # env is read at jit-build time inside _paired_chain_times' prep); the
    # A case calls the Pallas kernel module directly and ignores it
    import os
    os.environ["NFL_TPU_NTT"] = "jnp"
    try:
        per_round = _paired_chain_times([
            ("pallas", lambda v: ntt_pallas_u64.ntt_fwd(
                v, ctx, interpret=False), x, 1),
            ("jnp", lambda v: ntt_jnp.ntt_pow_phi(v, ctx), x, 1),
        ], rounds=6)
    finally:
        del os.environ["NFL_TPU_NTT"]
    dt = float(np.nanmedian(per_round["pallas"]))
    dtj = float(np.nanmedian(per_round["jnp"]))
    if np.isfinite(dt):
        print(f"         pallas: {dt*1e6:8.1f} us/poly-NTT  "
              f"{dt/m*1e6:6.1f} us/chan  {m/dt:,.0f} chan-NTT/s")
    if np.isfinite(dt) and np.isfinite(dtj):
        ratios = [a / b for a, b in zip(per_round["jnp"],
                                        per_round["pallas"])
                  if np.isfinite(a) and np.isfinite(b)]
        print(f"         jnp:    {dtj*1e6:8.1f} us/poly-NTT  "
              f"paired speedup {float(np.median(ratios)):.1f}x")
