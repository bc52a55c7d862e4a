"""Comm/compute overlap evidence for the distributed four-step NTT
(round-3 VERDICT item 5: prove scheduling, don't count ops).

Two independent pieces of evidence, recorded in OVERLAP.json:

1. REAL TPU SCHEDULING (AOT): the transform is compiled ahead-of-time
   against an 8-chip v5e topology (`jax.experimental.topologies`,
   "v5e:2x4") — no multi-chip hardware needed, the actual TPU compiler and
   latency-hiding scheduler run — and the scheduled HLO is inspected:
     * the all-to-all path lowers to SYNCHRONOUS `all-to-all` ops (no
       start/done forms): XLA does not async-ify all_to_all on this
       target, so `chunks>1` pipelining CANNOT overlap on real TPUs —
       this is why the ppermute variant exists;
     * the ppermute path (`transpose="ppermute"`,
       parallel/ntt_dist._ppermute_transpose) lowers to
       `collective-permute-start/done` pairs, and the scheduler places
       OTHER compute (the next block's twiddle fusions) between start and
       done — actual overlap, asserted on the scheduled instruction order.

2. VIRTUAL-MESH WALL CLOCK: on the 8-device CPU mesh (no async
   collectives there), the chunked and ppermute variants must be
   wall-clock neutral vs the monolithic all-to-all (gate: <= 1.25x), so
   the overlap structures are free where they cannot help.

Run from the repo root: python tools/check_overlap.py
"""
from __future__ import annotations

import json
import os
import pathlib
import re
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.parallel import ntt_dist  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent
D = 8


def _aot_compile(transpose, chunks, ring, n1):
    """AOT-compile the forward transform for a v5e:2x4 topology with the
    four-step tables passed as sharded ARGUMENTS (the production builder's
    device_put of table constants needs real devices)."""
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    mesh = Mesh(np.array(topo.devices).reshape(D), ("deg",))
    n2 = ring.degree // n1
    fctx = ntt_dist.get_four_step_context(ring, n1, n2)

    def local(xb, phis, shoupphis, twiddle, twiddle_s):
        f = ntt_dist._TableView(fctx, phis=phis, shoupphis=shoupphis,
                                twiddle=twiddle, twiddle_s=twiddle_s)
        return ntt_dist.four_step_ntt_local(
            xb, f, col_slice=None, axis_name="deg", n_devices=D,
            chunks=chunks, transpose=transpose)

    spec = P(None, None, "deg")
    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,) * 5,
                           out_specs=P(None, "deg", None), check_vma=False))
    sds = jax.ShapeDtypeStruct((ring.nmoduli, n1, n2), ring.dtype,
                               sharding=NamedSharding(mesh, spec))
    with mesh:
        return fn.lower(sds, sds, sds, sds, sds).compile().as_text()


def _parse_schedule(hlo):
    """Instruction lines of the scheduled entry computation."""
    m = re.search(r"ENTRY [^\{]*\{(.*?)\n\}", hlo, re.S)
    body = m.group(1) if m else hlo
    return [ln.strip() for ln in body.splitlines() if "=" in ln]


def _overlap_evidence(hlo):
    """For each collective-permute start/done pair in schedule order, does
    any compute (fusion/multiply/convert) land between them?"""
    lines = _parse_schedule(hlo)
    # map result name -> line index for starts; scan dones
    start_idx = {}
    pairs = []
    for i, ln in enumerate(lines):
        name = ln.split("=", 1)[0].strip().lstrip("%")
        if "collective-permute-start(" in ln:
            start_idx[name] = i
        elif "collective-permute-done(" in ln:
            arg = re.search(r"collective-permute-done\(\s*%?([\w.\-]+)", ln)
            if arg and arg.group(1) in start_idx:
                pairs.append((start_idx[arg.group(1)], i))
    overlapped = 0
    for s, e in pairs:
        between = lines[s + 1:e]
        if any(re.search(r"\b(fusion|multiply|convert|add)\b", ln)
               for ln in between):
            overlapped += 1
    return len(pairs), overlapped


def aot_section():
    ring = nfl.Ring("u64", 1 << 18, 2)
    n1 = 512
    prev = os.environ.get("NFL_TPU_NTT")
    os.environ["NFL_TPU_NTT"] = "jnp"   # scheduling evidence concerns the
    try:                                # twiddle/transpose ops, not the DFTs
        hlo_a2a = _aot_compile("a2a", 2, ring, n1)
        hlo_pp = _aot_compile("ppermute", 1, ring, n1)
    finally:
        if prev is None:
            os.environ.pop("NFL_TPU_NTT", None)
        else:
            os.environ["NFL_TPU_NTT"] = prev
    a2a_sync = hlo_a2a.count(" all-to-all(") + hlo_a2a.count("all-to-all(")
    a2a_async = hlo_a2a.count("all-to-all-start(")
    pp_start = hlo_pp.count("collective-permute-start(")
    pp_done = hlo_pp.count("collective-permute-done(")
    pairs, overlapped = _overlap_evidence(hlo_pp)
    res = {
        "topology": "v5e:2x4 (AOT, real TPU compiler + scheduler)",
        "config": "u64 n=2^18 x 2ch, n1=512, 8-way deg shard",
        "a2a_path": {"sync_all_to_all_ops": a2a_sync,
                     "async_all_to_all_start": a2a_async,
                     "conclusion": "all-to-all stays SYNCHRONOUS on TPU; "
                                   "chunks>1 cannot overlap on this target"},
        "ppermute_path": {"collective_permute_start": pp_start,
                          "collective_permute_done": pp_done,
                          "start_done_pairs_in_schedule": pairs,
                          "pairs_with_compute_between": overlapped},
    }
    # the last permute has no next-block twiddle left to hide, so demand
    # overlap on all but one pair (and at least one genuine overlap)
    ok = (a2a_async == 0 and pp_start >= D - 1 and pp_done == pp_start
          and pairs >= D - 1 and overlapped >= max(1, pairs - 1))
    print(f"AOT: a2a sync={a2a_sync} async={a2a_async}; "
          f"ppermute start/done={pp_start}/{pp_done}, "
          f"pairs={pairs}, overlapped={overlapped}", flush=True)
    return res, ok


def wallclock_section():
    """Virtual 8-device CPU mesh: chunks>1 / ppermute must not cost wall
    clock where async collectives don't exist."""
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    ring = nfl.Ring("u64", 1 << 16, 2)
    mesh = Mesh(np.array(jax.devices("cpu")[:D]).reshape(D), ("deg",))
    rng = np.random.default_rng(11)
    x = np.empty(ring.shape, dtype=ring.dtype)
    for cm in range(ring.nmoduli):
        x[cm] = rng.integers(0, int(ring.moduli[cm]), ring.degree)
    xd = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P(None, "deg")))

    variants = {
        "monolithic": dict(chunks=1),
        "chunks2": dict(chunks=2),
        "chunks4": dict(chunks=4),
        "ppermute": dict(transpose="ppermute"),
    }
    times = {}
    outs = {}
    for name, kw in variants.items():
        fn = lambda v, kw=kw: ntt_dist.distributed_ntt_pow_phi(
            v, ring, mesh, **kw)
        outs[name] = np.asarray(fn(xd))          # warm + correctness
        best = float("inf")
        for _ in range(7):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(xd))
            best = min(best, time.perf_counter() - t0)
        times[name] = best
        print(f"cpu mesh {name:10s}: {best*1e3:.1f} ms", flush=True)
    base = times["monolithic"]
    equal = all(np.array_equal(outs["monolithic"], o) for o in outs.values())
    res = {k: {"ms": round(v * 1e3, 2), "vs_monolithic": round(v / base, 3)}
           for k, v in times.items()}
    res["all_variants_bit_identical"] = bool(equal)
    # chunks>1 must be neutral on CPU (no async there, so any cost is pure
    # overhead); ppermute legitimately pays D-1 sequential hops without an
    # async runtime — its target is TPU (see aot_section), so it only gets
    # a sanity bound here
    ok = equal and times["chunks2"] / base <= 1.25 \
        and times["chunks4"] / base <= 1.25 \
        and times["ppermute"] / base <= 2.0
    return res, ok


def main():
    out = {}
    try:
        aot, aot_ok = aot_section()
    except Exception as e:  # topology API unavailable in some environments
        aot, aot_ok = {"error": f"{type(e).__name__}: {e}"}, False
    out["tpu_aot_scheduling"] = aot
    wc, wc_ok = wallclock_section()
    out["virtual_mesh_wallclock"] = wc
    out["ok"] = bool(aot_ok and wc_ok)
    (ROOT / "OVERLAP.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"overlap_ok": out["ok"]}))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
