"""Paired A/B: u64 large-degree inter-matmul twiddle — separate jnp
bridge vs in-kernel epilogue fusion (dft_mxu matmul_mod twiddle=).

WHY RE-TEST: round 4 rejected the fusion as "9-11% slower same-session"
and justified the separate bridge with a 68 us measurement it called the
bandwidth floor.  Under the round-5 paired adaptive-K protocol the bridge
measures ~258 us at 2^20 m=2 — and 68 us is BELOW the 78 us HBM floor
(read x + tw + tws + write x = 64 MB at 819 GB/s), i.e. the round-4
numbers were small-K jitter reads.  XLA's emulated-u64 mulmod_shoup
plausibly costs ~3x its traffic floor (it materializes 32-bit pair
intermediates), which would make the fusion a real double-digit-percent
lever at 2^20.

Cases (paired, interleaved, adaptive K):
  old    — production dispatch (matmul1, jnp pair-Shoup bridge, matmul2)
  new    — pair-native chain: matmul pair I/O + Pallas pair bridge
           (built explicitly; REJECTED for production by this A/B)
  fused  — matmul1 with twiddle=(tw, tws) epilogue, matmul2 (no bridge)
  bridge — the jnp pair-Shoup twiddle alone

Run from the repo root: python tools/probe_u64_twiddle.py [log2degrees...]
"""
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.ops import dft_mxu, modops, ntt_mxu_u64  # noqa: E402
from check_onchip import _paired_chain_times, _paired_stats  # noqa: E402


def main():
    lgs = [int(a) for a in sys.argv[1:]] or [18, 20]
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    rng = np.random.default_rng(9)
    out = {}
    for lg in lgs:
        n = 1 << lg
        ring = nfl.Ring("u64", n, 2)
        ctx = ring.context()
        m = ring.nmoduli
        n1, n2 = ntt_mxu_u64._geometry(n)
        ntt_mxu_u64._register_large_providers()
        tw, tws = ntt_mxu_u64._large_twiddle(ring, False)
        twd, twsd = jnp.asarray(tw), jnp.asarray(tws)
        p3 = jnp.asarray(ctx.p_col)[..., None]
        x = np.empty((m, n), dtype=np.uint64)
        for cm in range(m):
            x[cm] = rng.integers(0, int(ring.moduli[cm]), n,
                                 dtype=np.uint64)

        def old(v):
            """Round-4 path: u64 in/out of each matmul, jnp emulated-u64
            bridge (merge/split passes at every kernel edge)."""
            f = dft_mxu.matmul_mod(v.reshape(-1, m, n1, n2), ring,
                                   "ntt64_e1_fwd", n1, axis=-2,
                                   interpret=False)
            f = modops.mulmod_shoup(f, twd, twsd, p3)
            o = dft_mxu.matmul_mod(f, ring, "ntt64_e2_fwd", n2, axis=-1,
                                   interpret=False)
            return o.reshape(v.shape)

        def new(v):
            """Pair-native chain: matmul pair I/O + Pallas pair bridge
            (ops/pair_bridge.py).  Built EXPLICITLY here — production
            dispatch reverted to the jnp bridge (`old`) after this A/B
            measured the pair chain ~1.04-1.07x slower in-chain (commit
            1372049), so calling ntt_pow_phi_fused would just re-measure
            `old` and silently destroy the rejection evidence."""
            from nfllib_tpu.ops import pair_bridge
            from nfllib_tpu.ops.ntt_pallas_u64 import _split
            assert pair_bridge.supports_shape(n1, n2)
            f = dft_mxu.matmul_mod(v.reshape(-1, m, n1, n2), ring,
                                   "ntt64_e1_fwd", n1, axis=-2,
                                   interpret=False, pair_out=True)
            f = pair_bridge.mulmod_shoup_pairs(f, _split(tw), _split(tws),
                                               ring, interpret=False)
            o = dft_mxu.matmul_mod(f, ring, "ntt64_e2_fwd", n2, axis=-1,
                                   interpret=False)
            return o.reshape(v.shape)

        def fused(v):
            f = dft_mxu.matmul_mod(v.reshape(-1, m, n1, n2), ring,
                                   "ntt64_e1_fwd", n1, axis=-2,
                                   interpret=False, twiddle=(tw, tws))
            o = dft_mxu.matmul_mod(f, ring, "ntt64_e2_fwd", n2, axis=-1,
                                   interpret=False)
            return o.reshape(v.shape)

        def bridge(v):
            y = modops.mulmod_shoup(v.reshape(m, n1, n2), twd, twsd, p3)
            return y.reshape(v.shape)

        a = np.asarray(old(jnp.asarray(x)))
        b = np.asarray(new(jnp.asarray(x)))
        c = np.asarray(fused(jnp.asarray(x)))
        eq = np.array_equal(a, b) and np.array_equal(a, c)
        print(f"2^{lg}: old == new == fused: {eq}", flush=True)

        per_round = _paired_chain_times([
            ("old", old, x, 1),
            ("new", new, x, 1),
            ("fused", fused, x, 1),
            ("bridge", bridge, x, 1),
        ])
        ratio = _paired_stats(per_round, "new", "old")
        fratio = _paired_stats(per_round, "fused", "old")
        bfrac = _paired_stats(per_round, "bridge", "old")

        def med(name):
            v = [t for t in per_round[name] if np.isfinite(t)]
            return float(np.median(v)) * 1e6 if v else None

        def r(v, nd=1):     # None-safe round: all-jitter rounds stay null
            return None if v is None else round(v, nd)

        out[f"2^{lg}"] = {
            "bit_identical": bool(eq),
            "old_us": r(med("old")),
            "new_us": r(med("new")),
            "fused_us": r(med("fused")),
            "bridge_us": r(med("bridge")),
            "new_over_old_paired": r(ratio, 4),
            "fused_over_old_paired": r(fratio, 4),
            "bridge_frac_of_old_paired": r(bfrac, 4),
            "rounds_us": {k: [round(t * 1e6, 1) if np.isfinite(t) else None
                              for t in v] for k, v in per_round.items()},
        }
        print(f"2^{lg}: old {r(med('old'))} us, new {r(med('new'))} us "
              f"(paired {r(ratio, 3)}x), fused {r(fratio, 3)}x, bridge "
              f"{r(med('bridge'))} us ({r(bfrac, 3)} of old)", flush=True)
    root = pathlib.Path(__file__).resolve().parent.parent
    (root / "TWIDDLE_AB.json").write_text(json.dumps(out, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
