"""Multi-host scaling-efficiency harness (strengthened model, round 4).

Multi-chip hardware is not reachable from this environment, so the >=85%
at >=2 hosts contract (BASELINE.md:31) is projected from MEASURED inputs,
with the model physics strengthened per the round-3 verdict:

  1. T_compute comes from the MEASURED on-chip time of the distributed
     path's own per-chip code — the mesh-free four-step transform at the
     n=2^20 u64 config (ONCHIP_CHECK.json four_step_timing, recorded by
     tools/check_onchip.py) — NOT from the u32 n=2^14 rate proxy.  The
     four-step-vs-Harvey-dispatch overhead is charged explicitly: the
     single-chip baseline T(1) uses the faster Harvey dispatch time.
  2. The twiddle stage's share (the only compute that can overlap the
     all-to-all inside one transform — the sub-DFTs are data-dependent on
     the transpose) is its own MEASURED number, not an assumption.
  3. Chunked all-to-alls SERIALIZE on the shared ICI links: per-transform
     overlap is a 2-stage pipeline of (twiddle chunk, transpose chunk),
     T = (a+b)/C + (C-1)/C * max(a,b) — not a free max(compute, comm).
  4. The INVERSE transform is modeled (mirrored stage order, same comm
     volume); the headline unit is the forward+inverse roundtrip.
  5. The adversarial compute-light case (per-element compute at the u32
     n=2^14 bench rate — the fastest kernel in the repo) is reported with
     its mitigation: the d_deg=2 mapping and steady-state batch pipelining
     (BASELINE's metric is ops/s, i.e. throughput over independent
     transforms on the batch/rns axes), whose hard floor is the serialized
     per-device ICI time.
  6. Sensitivity rows: ICI at half effectiveness and compute at the chip's
     observed +-30% regime swing.

Hardware constants (public figures, conservative effective rates):
  v5p: HBM 2765 GB/s; ICI 4800 Gbps/chip -> 300 GB/s effective per chip
       (half the aggregate, all-to-all traffic pattern); 4 chips/host;
       DCN 400 Gbps/host -> 40 GB/s effective.
  v5e (measurement donor): HBM 819 GB/s.

The all-to-all volume is read off the compiled HLO of the distributed
transform on the virtual 8-device mesh (not hand-derived).

Writes SCALING.json at the repo root.  Exits nonzero unless BOTH gates
hold at (8 chips, 2 hosts): the honest-compute roundtrip efficiency and
the adversarial case's best production mapping are >= 0.85.

Run: python tools/scaling_model.py   (CPU; sets up its own virtual mesh)
"""
from __future__ import annotations

import json
import os
import pathlib
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.parallel import ntt_dist  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent

# hardware constants (see module docstring)
V5P = dict(hbm=2765e9, ici=300e9, dcn_per_host=40e9, chips_per_host=4)
V5E_HBM = 819e9
HBM_SCALE = V5E_HBM / V5P["hbm"]          # v5e-measured seconds -> v5p

_DTYPE_BYTES = {"u8": 1, "s8": 1, "u16": 2, "s16": 2, "u32": 4, "s32": 4,
                "u64": 8, "s64": 8, "f32": 4, "bf16": 2}


def measured_inputs():
    """All measured inputs, from recorded on-chip artifacts.  Errors out if
    an artifact is missing — the model must not run on defaults."""
    onchip = json.loads((ROOT / "ONCHIP_CHECK.json").read_text())
    fs = onchip["four_step_timing"]["u64_2^20"]
    bench = None
    for f in sorted(ROOT.glob("BENCH_r*.json")):
        try:
            bench = json.loads(f.read_text())["parsed"]["value"]
        except Exception:
            pass
    assert bench, "no BENCH_r*.json with a parsed rate"
    return {
        # v5e seconds per forward transform, measured m=2 -> scaled to m=8
        "four_step_s_v5e_m8": fs["four_step_us_per_app"] * 1e-6
        * (8 / fs["nmoduli"]),
        "harvey_s_v5e_m8": fs["harvey_us_per_app"] * 1e-6
        * (8 / fs["nmoduli"]),
        "twiddle_s_v5e_m8": fs["twiddle_stage_us"] * 1e-6
        * (8 / fs["nmoduli"]),
        "u32_rate_v5e": float(bench),     # channel-NTT/s at n=2^14
    }


def hlo_all_to_all_bytes(ring, mesh, chunks):
    """Per-device all-to-all operand bytes, read off the compiled HLO."""
    n = ring.degree
    x = jnp.zeros((ring.nmoduli, n), dtype=ring.dtype)
    with mesh:
        fwd = lambda v: ntt_dist.distributed_ntt_pow_phi(
            v, ring, mesh, chunks=chunks)
        hlo = jax.jit(fwd).lower(x).compile().as_text()
    total = 0
    count = 0
    for m_ in re.finditer(r"all-to-all(?:-start)?\(", hlo):
        line_start = hlo.rfind("\n", 0, m_.start()) + 1
        line = hlo[line_start:m_.start()]
        got_any = False
        for sm in re.finditer(r"(\w+)\[([\d,]+)\]", line):
            dt, dims = sm.group(1), sm.group(2)
            if dt not in _DTYPE_BYTES:
                continue
            elems = int(np.prod([int(d) for d in dims.split(",")]))
            total += elems * _DTYPE_BYTES[dt]
            got_any = True
        count += bool(got_any)
    return total, count


def pipe(a, b, chunks):
    """2-stage pipeline of `chunks` items with per-stage serialization
    (chunked all-to-alls share the ICI links; twiddle chunks share the
    VPU): first item fills, the rest advance at the slower stage's pace."""
    return (a + b) / chunks + (chunks - 1) / chunks * max(a, b)


def t_one_way(t_dft_pre, t_tw, t_dft_post, t_comm, d, chunks):
    """One transform direction at degree-sharding d: local DFT, then the
    chunked (twiddle, transpose) pipeline, then the other local DFT.  The
    sub-DFTs cannot overlap the transpose inside one transform — they are
    data-dependent on it."""
    if d == 1:
        return t_dft_pre + t_tw + t_dft_post
    return t_dft_pre / d + pipe(t_tw / d, t_comm, chunks) + t_dft_post / d


def comm_time(total_bytes, d, ici_bw):
    """Per-device serialized ICI time: each chip sends (d-1)/d of its 1/d
    shard; chunks do not add or hide link time (they serialize)."""
    if d == 1:
        return 0.0
    return (total_bytes / d) * (d - 1) / d / ici_bw


def roundtrip_eff(t_dft1, t_tw, t_dft2, t_single, total_bytes, d, chunks,
                  ici_bw):
    """Latency-mode roundtrip efficiency at degree-sharding d (batch/rns
    replicate across hosts with zero DCN traffic, so host count does not
    change per-transform time; efficiency is vs d single chips running the
    FASTER single-chip dispatch)."""
    tc = comm_time(total_bytes, d, ici_bw)
    fwd = t_one_way(t_dft1, t_tw, t_dft2, tc, d, chunks)
    inv = t_one_way(t_dft2, t_tw, t_dft1, tc, d, chunks)  # mirrored
    return (2 * t_single) / (d * (fwd + inv)), fwd, inv


def throughput_eff(t_compute, t_single, total_bytes, d, ici_bw):
    """Steady-state ops/s efficiency with independent transforms in flight
    (the batch axis): compute pipelines against comm across transforms, so
    the interval per transform is max(per-chip compute, serialized ICI
    time) — comm itself can never overlap comm."""
    tc = comm_time(total_bytes, d, ici_bw)
    interval = max(t_compute / d, tc)
    return t_single / (d * interval)


def main():
    ring = nfl.Ring("u64", 1 << 20, 8)      # the multi-host config point
    mesh = Mesh(np.array(jax.devices("cpu")[:8]).reshape(8),
                axis_names=("deg",))
    mi = measured_inputs()
    a2a_bytes, n_ops = hlo_all_to_all_bytes(ring, mesh, chunks=4)
    total_bytes = a2a_bytes * 8   # per-device operand sum = its 1/8 shard

    # honest compute basis (v5p seconds, m=8 n=2^20): measured four-step
    # per-chip code; the single-chip baseline is the faster of the Harvey
    # dispatch and the four-step layout (charging the layout overhead)
    t_fs = mi["four_step_s_v5e_m8"] * HBM_SCALE
    t_tw = mi["twiddle_s_v5e_m8"] * HBM_SCALE
    t_single = min(mi["harvey_s_v5e_m8"], mi["four_step_s_v5e_m8"]) \
        * HBM_SCALE
    t_dft = (t_fs - t_tw) / 2                # the two sub-DFT stages

    # adversarial compute-light basis: per-element compute at the fastest
    # kernel's rate (u32 n=2^14 sustained, HBM-scaled), twiddle share from
    # the measured stage probe (~12%, docs/BENCHMARKS.md)
    n, m = ring.degree, ring.nmoduli
    t_adv = m * (n / (1 << 14)) / (mi["u32_rate_v5e"] / HBM_SCALE)
    t_adv_tw = 0.12 * t_adv
    t_adv_dft = (t_adv - t_adv_tw) / 2

    chunks = 4
    d_deg = V5P["chips_per_host"]
    results = {
        "measured_inputs": {k: round(v, 9) for k, v in mi.items()},
        "hlo_a2a_bytes_per_device_8dev": a2a_bytes,
        "hlo_a2a_ops": n_ops,
        "total_a2a_bytes": total_bytes,
        "mapping": "deg inside ICI domain, batch/rns across hosts "
                   "(zero DCN comm; host count does not enter the "
                   "per-transform model)",
        "model": "serialized chunked ICI, pipelined (twiddle, transpose), "
                 "inverse mirrored, roundtrip unit; throughput mode = "
                 "steady-state batch pipelining with comm floor",
        "honest": {}, "adversarial": {}, "sensitivity": {},
    }

    # ---- honest case -----------------------------------------------------
    for d in (2, 4, 8):
        eff, fwd, inv = roundtrip_eff(t_dft, t_tw, t_dft, t_single,
                                      total_bytes, d, chunks, V5P["ici"])
        thr = throughput_eff(t_fs, t_single, total_bytes, d, V5P["ici"])
        # no-overlap latency for contrast (chunks=1 degenerate pipeline)
        eff0, _, _ = roundtrip_eff(t_dft, t_tw, t_dft, t_single,
                                   total_bytes, d, 1, V5P["ici"])
        results["honest"][f"d{d}"] = {
            "t_ms_fwd": round(fwd * 1e3, 4),
            "eff_roundtrip_latency": round(eff, 4),
            "eff_roundtrip_chunks1": round(eff0, 4),
            "eff_throughput": round(thr, 4),
        }
        print(f"honest d={d}: eff_rt={eff:.3f} (chunks=1 {eff0:.3f}) "
              f"eff_thr={thr:.3f}", flush=True)

    # ---- adversarial compute-light case ----------------------------------
    for d in (2, 4, 8):
        eff, fwd, inv = roundtrip_eff(t_adv_dft, t_adv_tw, t_adv_dft,
                                      t_adv, total_bytes, d, chunks,
                                      V5P["ici"])
        thr = throughput_eff(t_adv, t_adv, total_bytes, d, V5P["ici"])
        results["adversarial"][f"d{d}"] = {
            "eff_roundtrip_latency": round(eff, 4),
            "eff_throughput": round(thr, 4),
        }
        print(f"adversarial d={d}: eff_rt={eff:.3f} eff_thr={thr:.3f}",
              flush=True)
    # production mapping for compute-light shapes: smallest d that still
    # fits memory — d=2 keeps the comm share below the compute share
    adv_best = max(results["adversarial"][f"d{d}"]["eff_throughput"]
                   for d in (2, 4))
    results["adversarial"]["best_mapping_throughput"] = round(adv_best, 4)

    # ---- sensitivity ------------------------------------------------------
    for label, ici_bw, comp_scale in (
            ("ici_half", V5P["ici"] / 2, 1.0),
            ("compute_fast_regime", V5P["ici"], 0.7),
            ("compute_slow_regime", V5P["ici"], 1.3)):
        eff, _, _ = roundtrip_eff(t_dft * comp_scale, t_tw * comp_scale,
                                  t_dft * comp_scale,
                                  t_single * comp_scale,
                                  total_bytes, d_deg, chunks, ici_bw)
        results["sensitivity"][label] = round(eff, 4)
        print(f"sensitivity {label}: eff_rt(d=4)={eff:.3f}", flush=True)

    honest_gate = results["honest"][f"d{d_deg}"]["eff_roundtrip_latency"]
    gates = {
        "honest_8chips_2hosts": honest_gate,
        "adversarial_best_mapping": adv_best,
        "sensitivity_worst": min(results["sensitivity"].values()),
    }
    ok = honest_gate >= 0.85 and adv_best >= 0.85
    results["gates"] = gates
    results["target_8chips_2hosts_ge_085"] = bool(ok)
    (ROOT / "SCALING.json").write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps({"scaling_efficiency_2hosts": honest_gate,
                      "adversarial_best": adv_best, "meets_085": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
