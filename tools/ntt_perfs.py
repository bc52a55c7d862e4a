"""NTT backend comparison — the reference's ntt_perfs harness
(tests/ntt_perfs.cpp:140-179 compares the library kernel against Harvey's
original) re-created as a backend shootout: jnp stage loop vs the Pallas
butterfly kernel vs the MXU matmul path, all verified bit-identical first.

Timing uses the round-5 paired adaptive-K protocol (check_onchip
_paired_chain_times): all backends measured interleaved per round so
regime drift cancels, chain length sized so the differenced quantity
clears the tunnel-jitter floor.

Usage: python tools/ntt_perfs.py [--n N] [--m M] [--batch B]
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.ops import ntt as ntt_jnp  # noqa: E402
from nfllib_tpu.ops import ntt_mxu, ntt_mxu_u64, ntt_pallas  # noqa: E402
from nfllib_tpu.ops import ntt_pallas_u64  # noqa: E402
from nfllib_tpu.utils import static_log2  # noqa: E402




def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--m", type=int, default=17)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--limb", default="u32", choices=["u16", "u32", "u64"])
    args = ap.parse_args()

    ring = nfl.Ring(args.limb, args.n, args.m)
    ctx = ring.context()
    rng = np.random.default_rng(7)
    x = np.empty((args.batch, args.m, args.n), dtype=ring.dtype)
    for cm in range(args.m):
        x[:, cm] = rng.integers(0, int(ring.moduli[cm]),
                                size=(args.batch, args.n))
    xd = jnp.asarray(x)
    units = args.batch * args.m

    import os
    os.environ["NFL_TPU_NTT"] = "jnp"   # pin the jnp path for its entry
    backends = {
        "jnp-stages": lambda v: ntt_jnp.ntt_pow_phi(v, ctx),
    }
    if args.limb == "u64":
        if ntt_pallas_u64.supports(ring):
            backends["pallas-pair"] = lambda v: ntt_pallas_u64.ntt_fwd(
                v, ctx, interpret=False)
        if ntt_mxu_u64.supports_fused(ring):
            backends["mxu-fused64"] = lambda v: \
                ntt_mxu_u64.ntt_pow_phi_fused(v, ctx, interpret=False)
    else:
        if ntt_pallas.supports(ring):
            backends["pallas-butterfly"] = lambda v: ntt_pallas.ntt_fwd(
                v, ctx, interpret=False)
        if ntt_mxu.supports(ring):
            backends["mxu-jnp"] = lambda v: ntt_mxu.ntt_pow_phi_mxu(v, ctx)
        if ntt_mxu.supports_fused(ring):
            backends["mxu-fused"] = lambda v: ntt_mxu.ntt_pow_phi_fused(
                v, ctx, interpret=False)

    # bit-exactness gate first — a broken backend must not get a recorded
    # perf number (and the docstring promises "verified bit-identical")
    base = np.asarray(backends["jnp-stages"](xd[:1]))
    bad = []
    for name, fn in backends.items():
        got = np.asarray(fn(xd[:1]))
        status = "OK" if np.array_equal(base, got) else "MISMATCH"
        print(f"{name:18s} exactness: {status}")
        if status != "OK":
            bad.append(name)
    if bad:
        sys.exit(f"BIT-EXACTNESS FAILURE: {bad} — not timing broken "
                 f"backends")

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from check_onchip import _paired_chain_times
    per_round = _paired_chain_times(
        [(name, fn, x, 1) for name, fn in backends.items()], rounds=6)
    for name in backends:
        t = float(np.nanmedian(per_round[name]))
        print(f"{name:18s} {t*1e6:9.1f} us/app   "
              f"{units/t:12,.0f} channel-NTT/s")


if __name__ == "__main__":
    main()
