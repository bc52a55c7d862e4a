"""Multi-host scaling-efficiency harness (round 5: paired inputs +
mechanism-faithful overlap).

Multi-chip hardware is not reachable from this environment, so the >=85%
at >=2 hosts contract (BASELINE.md:31) is projected from MEASURED inputs.
Round-5 changes close the round-4 verdict items 1-4:

  1. PAIRED inputs (VERDICT weak #2): every compute number comes from the
     interleaved same-session protocol (tools/check_onchip.py
     _paired_chain_times — per-round A/B with adaptive chain lengths, so
     ratios are within-regime and medians ride out the tunnel).  The model
     REFUSES artifacts not recorded under that protocol.  Measured result:
     the four-step layout overhead vs the single-chip dispatch is 1.01x at
     u64 2^20 and 1.00x at 2^18 (the round-4 artifact's 1.19x/1.98x were
     unpaired sequential reads minutes apart).
  2. The overlap mechanism scored is the one that EXISTS on TPU
     (VERDICT weak #3, OVERLAP.json): all-to-all stays SYNCHRONOUS, so the
     a2a path is modeled with NO overlap (chunks=1); the ppermute pipeline
     (the TPU production default, ntt_dist._resolve_transpose) is modeled
     as its real schedule — block twiddles hiding behind d-1 serialized
     hops, first/last blocks exposed.
  3. The gate requires BOTH mechanisms >= 0.85 AND holds in the fast
     -compute regime (0.7x), so a regime swing cannot flip it.
  4. Throughput mode is backed by a real program
     (ntt_dist.distributed_ntt_pow_phi_pipelined, AOT-verified overlap in
     OVERLAP.json batch_pipelined_path), not just arithmetic.

Hardware constants (public figures, conservative effective rates):
  v5p: HBM 2765 GB/s; ICI 4800 Gbps/chip -> 300 GB/s effective per chip
       (half the aggregate, all-to-all traffic pattern); 4 chips/host;
       DCN 400 Gbps/host -> 40 GB/s effective.
  v5e (measurement donor): HBM 819 GB/s.

The all-to-all volume is read off the compiled HLO of the distributed
transform on the virtual 8-device mesh (not hand-derived).

Writes SCALING.json at the repo root.  Exits nonzero unless the gates at
(8 chips, 2 hosts) hold: ppermute + no-overlap-a2a roundtrip efficiency
>= 0.85 (also under the 0.7x fast-compute regime), and the adversarial
case's production mapping >= 0.85.

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
    """All measured inputs, from recorded on-chip artifacts.  Errors out
    if an artifact is missing or was not recorded under the PAIRED
    protocol — the model must not run on defaults or on unpaired
    single-session reads (round-4 weak #2)."""
    onchip = json.loads((ROOT / "ONCHIP_CHECK.json").read_text())
    fs = onchip["four_step_timing"]["u64_2^20"]
    fs32 = onchip["four_step_timing"]["u32_2^14"]
    for row in (fs, fs32):
        assert "paired" in row.get("protocol", ""), \
            "four_step_timing must be recorded by the paired protocol"
    bench = None
    for f in sorted(ROOT.glob("BENCH_r*.json")):
        try:
            bench = json.loads(f.read_text())["parsed"]["value"]
        except Exception:
            pass
    assert bench, "no BENCH_r*.json with a parsed rate"
    m8 = 8 / fs["nmoduli"]
    harvey = fs["harvey_us_per_app"] * 1e-6 * m8
    overhead = fs["four_step_overhead_x"]          # paired, within-regime
    tw_frac = fs["twiddle_frac_of_four_step"]      # paired, within-regime
    return {
        # v5e seconds per forward transform, measured m=2 -> scaled to m=8;
        # four_step/twiddle derived from harvey via PAIRED ratios so one
        # regime's absolute read cannot skew the relative structure
        "harvey_s_v5e_m8": harvey,
        "four_step_overhead_x_paired": overhead,
        "four_step_s_v5e_m8": harvey * overhead,
        "twiddle_frac_paired": tw_frac,
        "twiddle_s_v5e_m8": harvey * overhead * tw_frac,
        "u32_rate_v5e": float(bench),     # channel-NTT/s at n=2^14
        "u32_four_step_overhead_x_paired": fs32["four_step_overhead_x"],
    }


def hlo_all_to_all_bytes(ring, mesh, chunks):
    """Per-device all-to-all operand bytes, read off the compiled HLO."""
    n = ring.degree
    x = jnp.zeros((ring.nmoduli, n), dtype=ring.dtype)
    with mesh:
        fwd = lambda v: ntt_dist.distributed_ntt_pow_phi(
            v, ring, mesh, chunks=chunks, transpose="a2a")
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


_COLLECTIVE_RE = re.compile(
    r"all-to-all|all-reduce|collective-permute|all-gather|reduce-scatter")


def batch_rns_collective_count():
    """Count collectives in the compiled HLO of a batch+rns-sharded NTT —
    the zero-comm property the adversarial mapping's 1.0 efficiency rests
    on.  COMPUTED here (not asserted as prose) so the gate fails loudly if
    a resharding collective ever creeps into the batch/rns path."""
    from jax.sharding import NamedSharding, PartitionSpec as P_

    from nfllib_tpu.ops import ntt as ntt_jnp

    ring = nfl.Ring("u32", 1 << 14, 4)
    ctx = ring.context()
    mesh = Mesh(np.array(jax.devices("cpu")[:8]).reshape(2, 4),
                axis_names=("batch", "rns"))
    sh = NamedSharding(mesh, P_("batch", "rns", None))
    x = jnp.zeros((4, ring.nmoduli, ring.degree), dtype=ring.dtype)
    with mesh:
        hlo = jax.jit(lambda v: ntt_jnp.ntt_pow_phi(v, ctx),
                      in_shardings=sh, out_shardings=sh) \
            .lower(jax.device_put(x, sh)).compile().as_text()
    return len(_COLLECTIVE_RE.findall(hlo))


def comm_time(total_bytes, d, ici_bw):
    """Per-device serialized ICI time: each chip sends (d-1)/d of its 1/d
    shard; chunks/hops do not add or hide link time (they serialize)."""
    if d == 1:
        return 0.0
    return (total_bytes / d) * (d - 1) / d / ici_bw


def t_transpose_a2a(t_tw_dev, t_comm):
    """a2a path, NO overlap: all-to-all is synchronous on TPU
    (OVERLAP.json), so the twiddle and the transpose strictly serialize.
    This is the chunks=1 shape; chunks>1 is modeled identically because
    chunked a2as serialize on the shared links AND cannot async-overlap."""
    return t_tw_dev + t_comm


def t_transpose_ppermute(t_tw_dev, t_comm, d):
    """ppermute pipeline, the TPU production default: d per-block twiddles
    (each t_tw_dev/d) interleave with d-1 serialized hops (each
    t_comm/(d-1)).  Schedule: tw(0); tw(1); [send(s) || tw(s+1) for
    s=1..d-2]; send(d-1) — the first two block twiddles and the last hop
    are exposed, the middle steps advance at the slower stage's pace
    (matches the AOT schedule: OVERLAP.json ppermute_path, compute between
    all but one start/done pair)."""
    if d == 1:
        return t_tw_dev
    blk = t_tw_dev / d
    hop = t_comm / (d - 1)
    return 2 * blk + (d - 2) * max(hop, blk) + hop


def t_one_way(t_dft_pre, t_tw, t_dft_post, t_comm, d, mech):
    """One transform direction at degree-sharding d: local DFT, then the
    (twiddle, transpose) stage under mechanism `mech`, then the other
    local DFT.  The sub-DFTs cannot overlap the transpose inside one
    transform — they are data-dependent on it."""
    if d == 1:
        return t_dft_pre + t_tw + t_dft_post
    tt = (t_transpose_ppermute(t_tw / d, t_comm, d) if mech == "ppermute"
          else t_transpose_a2a(t_tw / d, t_comm))
    return t_dft_pre / d + tt + t_dft_post / d


def roundtrip_eff(t_dft1, t_tw, t_dft2, t_single, total_bytes, d, mech,
                  ici_bw):
    """Latency-mode roundtrip efficiency at degree-sharding d (batch/rns
    replicate across hosts with zero DCN traffic, so host count does not
    change per-transform time; efficiency is vs d single chips running the
    single-chip dispatch)."""
    tc = comm_time(total_bytes, d, ici_bw)
    fwd = t_one_way(t_dft1, t_tw, t_dft2, tc, d, mech)
    inv = t_one_way(t_dft2, t_tw, t_dft1, tc, d, mech)  # mirrored
    return (2 * t_single) / (d * (fwd + inv)), fwd, inv


def throughput_eff(t_compute, t_single, total_bytes, d, ici_bw):
    """Steady-state ops/s efficiency with independent transforms in
    flight: the REAL program is distributed_ntt_pow_phi_pipelined (batch
    loop unrolled, ppermute hops of transform b overlapping transform
    b+1's Mosaic sub-DFTs — OVERLAP.json batch_pipelined_path), so the
    interval per transform is max(per-chip compute, serialized ICI time);
    comm itself can never overlap comm."""
    tc = comm_time(total_bytes, d, ici_bw)
    interval = max(t_compute / d, tc)
    return t_single / (d * interval)


def main():
    ring = nfl.Ring("u64", 1 << 20, 8)      # the multi-host config point
    mesh = Mesh(np.array(jax.devices("cpu")[:8]).reshape(8),
                axis_names=("deg",))
    mi = measured_inputs()
    a2a_bytes, n_ops = hlo_all_to_all_bytes(ring, mesh, chunks=1)
    total_bytes = a2a_bytes * 8   # per-device operand sum = its 1/8 shard

    # honest compute basis (v5p seconds, m=8 n=2^20): PAIRED harvey median
    # with the paired overhead/twiddle ratios applied; the single-chip
    # baseline is the faster of the dispatch and the four-step layout
    t_fs = mi["four_step_s_v5e_m8"] * HBM_SCALE
    t_tw = mi["twiddle_s_v5e_m8"] * HBM_SCALE
    t_single = min(mi["harvey_s_v5e_m8"], mi["four_step_s_v5e_m8"]) \
        * HBM_SCALE
    t_dft = (t_fs - t_tw) / 2                # the two sub-DFT stages

    d_deg = V5P["chips_per_host"]
    results = {
        "measured_inputs": {k: round(v, 9) for k, v in mi.items()},
        "input_protocol": "paired-interleaved adaptive-K "
                          "(ONCHIP_CHECK.json four_step_timing)",
        "hlo_a2a_bytes_per_device_8dev": a2a_bytes,
        "hlo_a2a_ops": n_ops,
        "total_a2a_bytes": total_bytes,
        "mapping": "deg inside ICI domain, batch/rns across hosts "
                   "(zero DCN comm; host count does not enter the "
                   "per-transform model)",
        "model": "a2a scored with NO overlap (synchronous on TPU); "
                 "ppermute scored as its real pipeline (d-1 serialized "
                 "hops, middle block-twiddles hidden, first/last "
                 "exposed); inverse mirrored; roundtrip unit; throughput "
                 "mode = the batch-pipelined program's comm floor",
        "honest": {}, "adversarial": {}, "sensitivity": {},
    }

    # ---- honest case -----------------------------------------------------
    for d in (2, 4, 8):
        eff_pp, fwd, _ = roundtrip_eff(t_dft, t_tw, t_dft, t_single,
                                       total_bytes, d, "ppermute",
                                       V5P["ici"])
        eff_a2a, _, _ = roundtrip_eff(t_dft, t_tw, t_dft, t_single,
                                      total_bytes, d, "a2a", V5P["ici"])
        thr = throughput_eff(t_fs, t_single, total_bytes, d, V5P["ici"])
        results["honest"][f"d{d}"] = {
            "t_ms_fwd_ppermute": round(fwd * 1e3, 4),
            "eff_roundtrip_ppermute": round(eff_pp, 4),
            "eff_roundtrip_a2a_no_overlap": round(eff_a2a, 4),
            "eff_throughput_pipelined": round(thr, 4),
        }
        print(f"honest d={d}: eff_pp={eff_pp:.3f} eff_a2a={eff_a2a:.3f} "
              f"eff_thr={thr:.3f}", flush=True)

    # ---- adversarial compute-light case ----------------------------------
    # all per-element compute at the repo's fastest kernel rate (u32 n=2^14
    # sustained), with the MEASURED paired u32 four-step overhead charged
    # to the deg-sharded mapping.  The production mapping for compute-light
    # shapes is the zero-comm batch/rns axes (the BASELINE ops/s metric is
    # throughput over independent transforms; reference parallelism's own
    # axes, SURVEY.md section 2 closing note) — deg-sharding a small fast
    # transform is the wrong tool and is reported as such.
    n, m = ring.degree, ring.nmoduli
    t_adv = m * (n / (1 << 14)) / (mi["u32_rate_v5e"] / HBM_SCALE)
    ovh32 = mi["u32_four_step_overhead_x_paired"]
    for d in (2, 4, 8):
        tc = comm_time(total_bytes, d, V5P["ici"])
        thr_deg = t_adv / (d * max(ovh32 * t_adv / d, tc))
        results["adversarial"][f"d{d}"] = {
            "eff_throughput_deg_sharded": round(thr_deg, 4),
        }
        print(f"adversarial d={d}: deg-sharded thr={thr_deg:.3f}",
              flush=True)
    # the production mapping's 1.0 is GATED on the zero-collective
    # property, verified on the compiled HLO here and now — if a
    # resharding collective ever creeps into the batch/rns path, the
    # adversarial gate falls back to the computed deg-sharded numbers
    # (and fails, as it should)
    n_coll = batch_rns_collective_count()
    adv_best = (1.0 if n_coll == 0 else
                max(results["adversarial"][f"d{d}"]
                    ["eff_throughput_deg_sharded"] for d in (2, 4, 8)))
    results["adversarial"]["batch_rns_mapping"] = {
        "eff_throughput": adv_best,
        "hlo_collective_ops": n_coll,
        "why": "independent transforms shard the batch/rns mesh axes with "
               "ZERO collectives (verified on the compiled HLO above; "
               "also tests/test_parallel.py test_rns_batch_sharded_ntt); "
               "the deg axis is for degrees too large per chip, not for "
               "throughput on small fast shapes",
    }

    # ---- sensitivity ------------------------------------------------------
    sens = {}
    for label, ici_bw, comp_scale in (
            ("ici_half", V5P["ici"] / 2, 1.0),
            ("compute_fast_regime", V5P["ici"], 0.7),
            ("compute_slow_regime", V5P["ici"], 1.3)):
        row = {}
        for mech in ("ppermute", "a2a"):
            eff, _, _ = roundtrip_eff(
                t_dft * comp_scale, t_tw * comp_scale, t_dft * comp_scale,
                t_single * comp_scale, total_bytes, d_deg, mech, ici_bw)
            row[mech] = round(eff, 4)
        sens[label] = row
        print(f"sensitivity {label}: d=4 pp={row['ppermute']:.3f} "
              f"a2a={row['a2a']:.3f}", flush=True)
    results["sensitivity"] = sens

    h = results["honest"][f"d{d_deg}"]
    gates = {
        "honest_ppermute_8chips_2hosts": h["eff_roundtrip_ppermute"],
        "honest_a2a_no_overlap_8chips_2hosts":
            h["eff_roundtrip_a2a_no_overlap"],
        "fast_regime_ppermute": sens["compute_fast_regime"]["ppermute"],
        "fast_regime_a2a": sens["compute_fast_regime"]["a2a"],
        "adversarial_best_mapping": adv_best,
    }
    # the gate must hold for BOTH transpose mechanisms AND in the fast
    # -compute regime, so neither a mechanism flip nor a chip regime swing
    # can flip it (round-4 weak #1/#2)
    ok = all(v >= 0.85 for v in gates.values())
    results["gates"] = gates
    results["target_8chips_2hosts_ge_085"] = bool(ok)
    (ROOT / "SCALING.json").write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps({"scaling_efficiency_2hosts":
                      gates["honest_ppermute_8chips_2hosts"],
                      "a2a_floor": gates["honest_a2a_no_overlap_8chips_2hosts"],
                      "adversarial_best": adv_best, "meets_085": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
