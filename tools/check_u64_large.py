"""On-chip check + A/B for the u64 large-degree split path (2^17..2^20).

For each degree: compile + run the fused MXU split path (ntt_mxu_u64
_large_run64 via dispatch), assert bit-equality with the jnp Harvey path
computed on the same chip, assert the inverse roundtrip, and chain-
differenced A/B timing vs jnp.

Round-3 results (v5e, 2 channels): 2^17 299us (2.7x jnp), 2^18 721us
(3.8x), 2^20 4748us (3.1x) — docs/BENCHMARKS.md.  Note the VPU pair
kernel is NOT a valid baseline here: Mosaic rejects it above 2^16 (24 MB
scoped-vmem stack), which is why ntt_pallas_u64.supports() caps at 65536.

Run from the repo root: python tools/check_u64_large.py [log2degrees...]
"""
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.ops import ntt as ntt_mod  # noqa: E402
from nfllib_tpu.ops import ntt_mxu_u64  # noqa: E402


def jnp_fwd(x, ctx):
    prev = os.environ.get("NFL_TPU_NTT")
    os.environ["NFL_TPU_NTT"] = "jnp"
    try:
        return ntt_mod.ntt_pow_phi(x, ctx)
    finally:
        if prev is None:
            os.environ.pop("NFL_TPU_NTT", None)
        else:
            os.environ["NFL_TPU_NTT"] = prev


def paired_timing(fns, x):
    """Paired interleaved adaptive-K protocol (tools/check_onchip.py): the
    round-4 artifact's fixed K=9/17 chains put the differenced quantity
    inside the tunnel-RTT jitter, biasing mins low (2^17's recorded 43.5
    us was such an underestimate).  Returns {name: median us-per-app} plus
    the per-round lists."""
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from check_onchip import _paired_chain_times
    per_round = _paired_chain_times([(name, fn, x, 1)
                                     for name, fn in fns])
    meds = {}
    for name, vals in per_round.items():
        v = [t for t in vals if np.isfinite(t)]
        meds[name] = float(np.median(v)) if v else float("nan")
    return meds, per_round


def main():
    lgs = [int(a) for a in sys.argv[1:]] or [17, 18, 20]
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    rng = np.random.default_rng(7)
    ok = True
    artifact = {"backend": jax.default_backend(),
                "device": jax.devices()[0].device_kind,
                "nmoduli": 2, "configs": {}}
    for lg in lgs:
        n = 1 << lg
        ring = nfl.Ring("u64", n, 2)
        assert ntt_mxu_u64.supports_fused(ring)
        ctx = ring.context()
        x = np.empty((2, n), dtype=np.uint64)
        for cm in range(2):
            x[cm] = rng.integers(0, int(ring.moduli[cm]), n,
                                 dtype=np.uint64)
        t0 = time.time()
        got = np.asarray(ntt_mxu_u64.ntt_pow_phi_fused(
            x, ctx, interpret=False))
        t_first = time.time() - t0
        back = np.asarray(ntt_mxu_u64.invntt_pow_invphi_fused(
            got, ctx, interpret=False))
        rt = np.array_equal(back, x)
        want = np.asarray(jax.jit(lambda v: jnp_fwd(v, ctx))(
            jnp.asarray(x)))
        eq = np.array_equal(got, want)
        ok = ok and rt and eq
        print(f"n=2^{lg}: fwd==jnp {eq}, roundtrip {rt}, "
              f"first {t_first:.1f}s", flush=True)
        meds, rounds = paired_timing(
            [("mxu", lambda v: ntt_mxu_u64.ntt_pow_phi_fused(
                v, ctx, interpret=False)),
             ("jnp", lambda v: jnp_fwd(v, ctx))], x)
        t_mxu, t_jnp = meds["mxu"], meds["jnp"]
        print(f"n=2^{lg}: mxu {t_mxu*1e6:.0f} us/app vs jnp "
              f"{t_jnp*1e6:.0f} us ({t_jnp/t_mxu:.2f}x)", flush=True)
        artifact["configs"][f"2^{lg}"] = {
            "fwd_eq_jnp": bool(eq), "roundtrip": bool(rt),
            "protocol": "paired-interleaved adaptive-K (median)",
            "mxu_us_per_app": round(t_mxu * 1e6, 1),
            "jnp_us_per_app": round(t_jnp * 1e6, 1),
            "rounds_us": {k: [round(t * 1e6, 1) if np.isfinite(t)
                              else None for t in v]
                          for k, v in rounds.items()},
        }
    artifact["ok"] = bool(ok)
    root = pathlib.Path(__file__).resolve().parent.parent
    (root / "U64LARGE.json").write_text(json.dumps(artifact, indent=1)
                                        + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
