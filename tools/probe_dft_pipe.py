"""Paired A/B: software-pipelined dft_mxu u64 kernel vs the plain kernel.

The u64 large-degree roofline (docs/BENCHMARKS.md) names the VPU group-sum
epilogue (~200 us at 2^20), serialized after each block's MXU dots, as the
main residual over the MXU floor.  _kernel_u64_pipe delays the epilogue by
one grid step over a flattened grid so Mosaic can overlap block t-1's
vector work with block t's matmuls.  This probe measures both variants of
the STANDALONE matmul (where the dots+epilogue live) under the round-5
paired adaptive-K protocol, at the production local-DFT sizes (512 = the
2^18 split factor, 1024 = the 2^20 factor).

Usage: python tools/probe_dft_pipe.py [--rounds N]
Writes DFT_PIPE_AB.json at the repo root.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.ops import dft_mxu  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from check_onchip import _paired_chain_times  # noqa: E402


def main():
    rounds = 8
    if "--rounds" in sys.argv:
        i = sys.argv.index("--rounds") + 1
        if i >= len(sys.argv):
            sys.exit("usage: probe_dft_pipe.py [--rounds N]")
        rounds = int(sys.argv[i])
    import jax
    assert jax.default_backend() == "tpu", "paired probe targets the chip"

    out = {"protocol": "paired-interleaved adaptive-K", "cases": {}}
    rng = np.random.default_rng(5)
    for size in (512, 1024):
        ring = nfl.ring_from_modulus("u64", size, 124)
        m = ring.nmoduli
        x = np.empty((1, m, size, size), dtype=np.uint64)
        for cm in range(m):
            x[:, cm] = rng.integers(0, int(ring.moduli[cm]),
                                    (1, size, size), dtype=np.uint64)

        def plain(v, s=size, r=ring):
            return dft_mxu.matmul_mod(v, r, "dft_fwd", s, axis=-2,
                                      interpret=False, pipelined=False)

        def pipe(v, s=size, r=ring):
            return dft_mxu.matmul_mod(v, r, "dft_fwd", s, axis=-2,
                                      interpret=False, pipelined=True)

        # compiled bit-exactness first (the pipelined variant has only been
        # interpret-verified until it runs here)
        import jax.numpy as jnp
        a = np.asarray(jax.jit(plain)(jnp.asarray(x)))
        b = np.asarray(jax.jit(pipe)(jnp.asarray(x)))
        exact = bool((a == b).all())
        print(f"size={size}: compiled pipelined == plain: {exact}",
              flush=True)
        assert exact

        per_round = _paired_chain_times(
            [("plain", plain, x, 1), ("pipe", pipe, x, 1)], rounds=rounds)

        def us(v):      # None (strict JSON) instead of NaN on all-jitter
            r = float(np.nanmedian(v) * 1e6) if np.isfinite(
                np.nanmedian(v)) else None
            return None if r is None else round(r, 2)

        med = {k: us(v) for k, v in per_round.items()}
        ratios = [p / q for p, q in zip(per_round["pipe"],
                                        per_round["plain"])
                  if np.isfinite(p) and np.isfinite(q)]
        ratio = round(float(np.median(ratios)), 4) if ratios else None
        print(f"size={size}: plain {med['plain']} us, "
              f"pipe {med['pipe']} us, paired pipe/plain {ratio}",
              flush=True)
        out["cases"][f"u64_size{size}"] = {
            "plain_us": med["plain"],
            "pipe_us": med["pipe"],
            "paired_ratio_pipe_over_plain": ratio,
            "compiled_bit_exact": exact,
            "rounds": rounds,
        }

    path = pathlib.Path(__file__).resolve().parent.parent / \
        "DFT_PIPE_AB.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"dft_pipe_ab": {k: v["paired_ratio_pipe_over_plain"]
                                      for k, v in out["cases"].items()}}))


if __name__ == "__main__":
    main()
