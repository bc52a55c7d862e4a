"""Multi-host scaling-efficiency harness (model + measured inputs).

Multi-chip hardware is not reachable from this environment, so the >=85%
at >=2 hosts contract (BASELINE.md:31) is projected from first principles
with two MEASURED inputs:

  1. the single-chip sustained throughput recorded by bench.py on the real
     v5e chip (scaled to the v5p target by the HBM-bandwidth ratio — the
     kernel is epilogue/bandwidth-bound, docs/BENCHMARKS.md), and
  2. the actual per-device all-to-all communication volume, extracted from
     the compiled HLO of the distributed transform on the virtual 8-device
     mesh (not hand-derived).

Hardware constants (public figures, conservative effective rates):
  v5p: HBM 2765 GB/s; ICI 4800 Gbps/chip -> 300 GB/s effective per chip
       (half the aggregate, all-to-all traffic pattern); 4 chips/host;
       DCN 400 Gbps/host -> 40 GB/s effective.
  v5e (measurement donor): HBM 819 GB/s.

Model per forward transform of the n=2^20 multi-host config:
  T_compute = per-chip share of the measured whole-transform device time
  T_ici     = per-chip in-host all-to-all bytes / ICI_BW
  T_dcn     = per-host cross-host bytes / DCN_BW
  no overlap: T = T_compute + max(T_ici, T_dcn)
  chunked overlap (parallel/ntt_dist.py chunks>1): the twiddle+local-DFT
  compute pipelines against the transposes, T = max(T_compute, T_comm)
  efficiency(D) = T(D=1) / (D * T(D))

Writes SCALING.json at the repo root and appends nothing (documented in
docs/BENCHMARKS.md).  Exits nonzero if the overlapped projection at
(8 chips, 2 hosts) falls below 0.85.

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.parallel import ntt_dist  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent

# hardware constants (see module docstring)
V5P = dict(hbm=2765e9, ici=300e9, dcn_per_host=40e9, chips_per_host=4)
V5E_HBM = 819e9

_DTYPE_BYTES = {"u8": 1, "s8": 1, "u16": 2, "s16": 2, "u32": 4, "s32": 4,
                "u64": 8, "s64": 8, "f32": 4, "bf16": 2}


def measured_single_chip_rate():
    """Sustained channel-NTT/s at n=2^14 from the most recent bench record
    (per-v5e-chip).  Falls back to the round-3 measured value."""
    best = None
    for f in sorted(ROOT.glob("BENCH_r*.json")):
        try:
            rec = json.loads(f.read_text())
            best = rec["parsed"]["value"]
        except Exception:
            pass
    return float(best) if best else 1.08e6


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
        # the op's result is a tuple of per-destination blocks:
        #   %all-to-all = (u64[8,32,128]{...}, ...) all-to-all(
        # sum every shape in the tuple — that is this device's full send
        # volume for the op
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


def project(ring, d_deg, hosts, total_a2a_bytes, rate_v5e, overlap):
    """Projected per-transform wall time with the degree axis sharded over
    `d_deg` chips inside one ICI domain, replicated/batched over `hosts`
    (cross-host traffic = 0 by construction: the batch/rns axes are
    zero-communication, mirroring the reference's independent cm loops)."""
    n, m = ring.degree, ring.nmoduli
    # measured whole-transform device time, v5e -> v5p by HBM ratio, scaled
    # from the n=2^14 measurement by coefficient count (the fused kernels
    # are epilogue/bandwidth-bound: time ~ elements)
    t14_chan = 1.0 / (rate_v5e * (V5P["hbm"] / V5E_HBM))
    t_full_1chip = t14_chan * m * (n / (1 << 14))
    t_compute = t_full_1chip / d_deg
    if d_deg == 1:
        return t_compute
    # each chip all-to-alls (d-1)/d of its 1/d shard over ICI
    bytes_per_dev = total_a2a_bytes / d_deg * (d_deg - 1) / d_deg
    t_ici = bytes_per_dev / V5P["ici"]
    if overlap:
        return max(t_compute, t_ici)
    return t_compute + t_ici


def project_flat_dcn(ring, d_chips, hosts, total_a2a_bytes, rate_v5e,
                     overlap):
    """The NAIVE mapping for comparison: one flat deg axis across hosts —
    the all-to-all crosses DCN and dominates (this is why the production
    mapping keeps deg inside the ICI domain)."""
    n, m = ring.degree, ring.nmoduli
    t14_chan = 1.0 / (rate_v5e * (V5P["hbm"] / V5E_HBM))
    t_full_1chip = t14_chan * m * (n / (1 << 14))
    t_compute = t_full_1chip / d_chips
    bytes_per_dev = total_a2a_bytes / d_chips * (d_chips - 1) / d_chips
    cross_frac = (d_chips - d_chips / hosts) / max(d_chips - 1, 1)
    t_ici = bytes_per_dev * (1 - cross_frac) / V5P["ici"]
    per_host_cross = bytes_per_dev * cross_frac * (d_chips / hosts)
    t_dcn = per_host_cross / V5P["dcn_per_host"]
    t_comm = max(t_ici, t_dcn)
    return max(t_compute, t_comm) if overlap else t_compute + t_comm


def main():
    ring = nfl.Ring("u64", 1 << 20, 8)      # the multi-host config point
    mesh = Mesh(np.array(jax.devices("cpu")[:8]).reshape(8),
                axis_names=("deg",))
    rate = measured_single_chip_rate()
    a2a_bytes, n_ops = hlo_all_to_all_bytes(ring, mesh, chunks=4)
    # total transposed tensor volume: each device's summed operand bytes on
    # the 8-device mesh are exactly its 1/8 shard (own block included)
    total_bytes = a2a_bytes * 8
    t1 = project(ring, 1, 1, 0, rate, overlap=True)

    results = {"measured_v5e_rate_ntt_s": rate,
               "hlo_a2a_bytes_per_device_8dev": a2a_bytes,
               "hlo_a2a_ops": n_ops,
               "total_a2a_bytes": total_bytes,
               "mapping": "deg inside ICI domain (4 chips/host), "
                          "batch/rns across hosts (zero DCN comm)",
               "configs": {}}
    d_deg = V5P["chips_per_host"]
    for hosts in (2, 4, 8):
        chips = d_deg * hosts
        td_ov = project(ring, d_deg, hosts, total_bytes, rate, overlap=True)
        td_no = project(ring, d_deg, hosts, total_bytes, rate,
                        overlap=False)
        # hosts process disjoint batch shards: aggregate ops/s scales by
        # `hosts` exactly; efficiency vs chips * single-chip rate
        eff_ov = t1 / (d_deg * td_ov)
        eff_no = t1 / (d_deg * td_no)
        flat_ov = project_flat_dcn(ring, chips, hosts, total_bytes, rate,
                                   overlap=True)
        eff_flat = t1 / (chips * flat_ov)
        results["configs"][f"{chips}chips_{hosts}hosts"] = {
            "t_ms_overlap": round(td_ov * 1e3, 4),
            "t_ms_no_overlap": round(td_no * 1e3, 4),
            "efficiency_overlap": round(eff_ov, 4),
            "efficiency_no_overlap": round(eff_no, 4),
            "efficiency_flat_deg_over_dcn": round(eff_flat, 4),
        }
        print(f"H={hosts} ({chips} chips): eff(hier,overlap)={eff_ov:.3f} "
              f"eff(hier,serial)={eff_no:.3f} eff(flat-DCN)={eff_flat:.3f}",
              flush=True)

    target = results["configs"]["8chips_2hosts"]["efficiency_overlap"]
    results["target_8chips_2hosts_ge_085"] = bool(target >= 0.85)
    (ROOT / "SCALING.json").write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps({"scaling_efficiency_2hosts": target,
                      "meets_085": target >= 0.85}))
    return 0 if target >= 0.85 else 1


if __name__ == "__main__":
    raise SystemExit(main())
