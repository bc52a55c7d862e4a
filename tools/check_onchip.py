"""On-chip compiled-kernel correctness artifact.

Runs the golden NTT/INTT byte-equality checks (vectors dumped from the
reference's own compiled templates, tools/golden/nfl_dump.cpp) on the REAL
TPU with the production compiled kernels (interpret=False), and additionally
asserts compiled == interpret for every kernel module in the dispatch —
closing the "interpret-mode tests represent the chip" assumption with a
recorded artifact.

Writes ONCHIP_CHECK.json at the repo root:
  {"backend": ..., "device": ..., "configs": {cfg: {"ntt_golden": bool,
   "intt_golden": bool, "compiled_eq_interpret": bool}}, "ok": bool}

Run from the repo root: python tools/check_onchip.py [--quick]
"""
from __future__ import annotations

import json
import lzma
import pathlib
import struct
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

import nfllib_tpu as nfl  # noqa: E402
from nfllib_tpu.poly import Poly  # noqa: E402
from nfllib_tpu.prng.salsa20 import Salsa20Stream  # noqa: E402
from nfllib_tpu.prng.sampling import uniform  # noqa: E402
from nfllib_tpu.ring import ring_from_modulus  # noqa: E402
from nfllib_tpu.serialize import serialize_poly  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"
KEY = bytes(range(32))          # nfl_dump.cpp's fixed randombytes key

CONFIGS = [
    ("8_60_u32", "u32", 8, 60),
    ("128_14_u16", "u16", 128, 14),
    ("1024_60_u32", "u32", 1024, 60),
    ("4096_60_u32", "u32", 4096, 60),
    ("8192_124_u64", "u64", 8192, 124),
    ("32768_124_u64", "u64", 32768, 124),
]


def load_golden(cfg):
    raw = lzma.open(GOLDEN_DIR / f"nfl_golden_{cfg}.bin.xz").read()
    records, off = {}, 0
    while off < len(raw):
        (nl,) = struct.unpack_from("<I", raw, off)
        off += 4
        name = raw[off:off + nl].decode()
        off += nl
        (dl,) = struct.unpack_from("<Q", raw, off)
        off += 8
        records.setdefault(name, raw[off:off + dl])
        off += dl
    return records


def kernel_module(ring):
    from nfllib_tpu.ops import ntt as ntt_mod
    mod = ntt_mod._fused_mxu_module(ring)
    if mod is not None:
        return mod, "fused_mxu"
    mod = ntt_mod._pallas_backend(ring)
    if mod is not None:
        return mod, "pallas_vpu"
    return None, "jnp"


def check_config(cfg, limb, degree, modbits):
    rec = load_golden(cfg)
    ring = ring_from_modulus(limb, degree, modbits)
    ctx = ring.context()
    stream = Salsa20Stream(KEY)
    a = Poly.sample(ring, uniform(), stream)   # first record drawn in dump

    mod, kind = kernel_module(ring)
    t0 = time.time()
    if kind == "fused_mxu":
        fwd_c = mod.ntt_pow_phi_fused(a.data, ctx, interpret=False)
        inv_c = mod.invntt_pow_invphi_fused(fwd_c, ctx, interpret=False)
        fwd_i = mod.ntt_pow_phi_fused(a.data, ctx, interpret=True)
        inv_i = mod.invntt_pow_invphi_fused(fwd_i, ctx, interpret=True)
    elif kind == "pallas_vpu":
        fwd_c = mod.ntt_fwd(a.data, ctx, twist=True, interpret=False)
        inv_c = mod.intt_bwd(fwd_c, ctx, untwist=True, interpret=False)
        fwd_i = mod.ntt_fwd(a.data, ctx, twist=True, interpret=True)
        inv_i = mod.intt_bwd(fwd_i, ctx, untwist=True, interpret=True)
    else:
        from nfllib_tpu.ops import ntt as ntt_mod
        fwd_c = fwd_i = ntt_mod.ntt_pow_phi(a.data, ctx)
        inv_c = inv_i = ntt_mod.invntt_pow_invphi(fwd_c, ctx)
    elapsed = time.time() - t0

    fwd_bytes = serialize_poly(Poly(fwd_c, ring))
    inv_bytes = serialize_poly(Poly(inv_c, ring))
    res = {
        "kernel": kind,
        "ntt_golden": fwd_bytes == rec["ntt"],
        "intt_golden": inv_bytes == rec["intt"],
        "roundtrip": bool(np.array_equal(np.asarray(inv_c),
                                         np.asarray(a.data))),
        "compiled_eq_interpret": bool(
            np.array_equal(np.asarray(fwd_c), np.asarray(fwd_i))
            and np.array_equal(np.asarray(inv_c), np.asarray(inv_i))),
        "seconds": round(elapsed, 1),
    }
    return res


def main():
    quick = "--quick" in sys.argv
    configs = CONFIGS[:3] if quick else CONFIGS
    out = {
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "configs": {},
    }
    ok = out["backend"] == "tpu"
    if not ok:
        print("WARNING: not running on TPU — artifact records CPU results",
              file=sys.stderr)
    for cfg, limb, degree, modbits in configs:
        res = check_config(cfg, limb, degree, modbits)
        out["configs"][cfg] = res
        ok = ok and res["ntt_golden"] and res["intt_golden"] \
            and res["roundtrip"] and res["compiled_eq_interpret"]
        print(f"{cfg:15s} kernel={res['kernel']:10s} "
              f"ntt={res['ntt_golden']} intt={res['intt_golden']} "
              f"rt={res['roundtrip']} c==i={res['compiled_eq_interpret']} "
              f"({res['seconds']}s)", flush=True)
    out["ok"] = bool(ok)
    path = pathlib.Path(__file__).resolve().parent.parent / \
        "ONCHIP_CHECK.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"onchip_ok": out["ok"]}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
