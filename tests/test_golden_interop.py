"""Byte-equality tests against golden vectors dumped from the *reference's
own compiled templates* (tools/golden/nfl_dump.cpp, built against
/root/reference/include with a fixed Salsa20 key).

Each golden file is a TLV record stream written in a fixed op order; this
test replays the identical op sequence through nfllib_tpu — samplers
consuming a shared Salsa20Stream, modular ops, NTT/INTT, the LWE symmetric
workload, and both serializers — asserting byte identity on every record.
This converts the bit-exactness story (same randomness => same residues,
same ciphertexts, same serialized bytes; reference
tests/nfllib_demo_main_op.cpp:26-58,313-331, include/nfl/poly.hpp:180-191)
from argued-by-construction to tested.
"""
import lzma
import pathlib
import struct

import numpy as np
import pytest

from nfllib_tpu.poly import Poly, shoup
from nfllib_tpu.prng.gaussian import FastGaussianNoise
from nfllib_tpu.prng.salsa20 import Salsa20Stream
from nfllib_tpu.prng.sampling import (
    ZO_dist,
    gaussian,
    hwt_dist,
    non_uniform,
    uniform,
)
from nfllib_tpu.ring import ring_from_modulus
from nfllib_tpu.serialize import serialize_poly

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent.parent / "tools" / "golden"
KEY = bytes(range(32))  # nfl_dump.cpp's fixed randombytes key

CONFIGS = [
    ("8_60_u32", "u32", 8, 60),
    ("128_14_u16", "u16", 128, 14),
    ("1024_60_u32", "u32", 1024, 60),
    ("4096_60_u32", "u32", 4096, 60),
    pytest.param("8192_124_u64", "u64", 8192, 124, marks=pytest.mark.slow),
    pytest.param("32768_124_u64", "u64", 32768, 124, marks=pytest.mark.slow),
    pytest.param("16384_496_u64", "u64", 16384, 496, marks=pytest.mark.slow),
]


def load_golden(cfg):
    path = GOLDEN_DIR / f"nfl_golden_{cfg}.bin.xz"
    if not path.exists():
        pytest.skip(f"golden file {path.name} not present")
    raw = lzma.open(path).read()
    records = []
    off = 0
    while off < len(raw):
        (nl,) = struct.unpack_from("<I", raw, off)
        off += 4
        name = raw[off:off + nl].decode()
        off += nl
        (dl,) = struct.unpack_from("<Q", raw, off)
        off += 8
        records.append((name, raw[off:off + dl]))
        off += dl
    return records


def assert_poly(rec_bytes, p: Poly, name: str, cfg: str):
    got = serialize_poly(p)
    assert got == rec_bytes, (
        f"{cfg}/{name}: {np.frombuffer(got, p.ring.dtype)[:4]} != "
        f"{np.frombuffer(rec_bytes, p.ring.dtype)[:4]} ...")


@pytest.mark.parametrize("cfg,limb,degree,modbits", CONFIGS)
def test_golden_interop(cfg, limb, degree, modbits):
    records = dict_records = load_golden(cfg)
    ring = ring_from_modulus(limb, degree, modbits)
    stream = Salsa20Stream(KEY)
    env = {}
    fgn20 = None
    lwe = {}

    for name, data in records:
        if name == "moduli":
            assert data == np.array(ring.moduli, dtype="<u8").tobytes()
        elif name in ("uniform_a", "uniform_b"):
            p = Poly.sample(ring, uniform(), stream)
            env[name[-1]] = p
            assert_poly(data, p, name, cfg)
        elif name == "add":
            env["c"] = env["a"] + env["b"]
            assert_poly(data, env["c"], name, cfg)
        elif name == "sub":
            assert_poly(data, env["a"] - env["b"], name, cfg)
        elif name == "mul":
            assert_poly(data, env["a"].mulmod(env["b"]), name, cfg)
        elif name == "shoup_prec":
            env["prec"] = env["b"].compute_shoup()
            assert_poly(data, env["prec"], name, cfg)
        elif name == "mulmod_shoup":
            assert_poly(data, shoup(env["a"] * env["b"], env["prec"]),
                        name, cfg)
        elif name == "fma":
            assert_poly(data, env["a"] * env["b"] + env["c"], name, cfg)
        elif name == "fma_shoup":
            # the reference expr `c + shoup(a*b, prec)` evaluates
            # addmod(c, mulmod_shoup(...)) — both canonical; the lazy
            # muladd_shoup functor can differ by p (opt/ops.hpp:54-78)
            assert_poly(
                data,
                env["c"] + shoup(env["a"] * env["b"], env["prec"]),
                name, cfg)
        elif name == "ntt":
            env["antt"] = env["a"].ntt_pow_phi()
            assert_poly(data, env["antt"], name, cfg)
        elif name == "intt":
            back = env["antt"].invntt_pow_invphi()
            assert_poly(data, back, name, cfg)
            assert back == env["a"]
        elif name == "intt_of_b":
            assert_poly(data, env["b"].invntt_pow_invphi(), name, cfg)
        elif name == "non_uniform_4":
            assert_poly(data, Poly.sample(ring, non_uniform(4), stream),
                        name, cfg)
        elif name == "non_uniform_10_amp2":
            assert_poly(data, Poly.sample(ring, non_uniform(10, 2), stream),
                        name, cfg)
        elif name == "zo_7f":
            assert_poly(data, Poly.sample(ring, ZO_dist(0x7F), stream),
                        name, cfg)
        elif name.startswith("hwt_"):
            h = int(name.split("_")[1])
            assert_poly(data, Poly.sample(ring, hwt_dist(h), stream),
                        name, cfg)
        elif name == "gaussian_s20":
            fgn20 = FastGaussianNoise(20, 128, 1 << 14)
            assert_poly(data, Poly.sample(ring, gaussian(fgn20), stream),
                        name, cfg)
        elif name == "gaussian_s20_amp2":
            assert_poly(data, Poly.sample(ring, gaussian(fgn20, 2), stream),
                        name, cfg)
        elif name == "lwe_s":
            lwe["fgn"] = FastGaussianNoise(4, 128, 1 << 10)
            lwe["s"] = Poly.sample(
                ring, gaussian(lwe["fgn"]), stream).ntt_pow_phi()
            assert_poly(data, lwe["s"], name, cfg)
        elif name == "lwe_sprime":
            lwe["sprime"] = lwe["s"].compute_shoup()
            assert_poly(data, lwe["sprime"], name, cfg)
        elif name == "lwe_pka":
            lwe["pka"] = Poly.sample(ring, uniform(), stream)
            assert_poly(data, lwe["pka"], name, cfg)
        elif name == "lwe_pkb":
            pkb = Poly.sample(
                ring, gaussian(lwe["fgn"], 2), stream).ntt_pow_phi()
            lwe["pkb"] = pkb + shoup(lwe["pka"] * lwe["s"], lwe["sprime"])
            assert_poly(data, lwe["pkb"], name, cfg)
        elif name == "lwe_resa":
            u = Poly.sample(ring, gaussian(lwe["fgn"]), stream).ntt_pow_phi()
            e1 = Poly.sample(
                ring, gaussian(lwe["fgn"], 2), stream).ntt_pow_phi()
            e2 = Poly.sample(
                ring, gaussian(lwe["fgn"], 2), stream).ntt_pow_phi()
            lwe["resa"] = u * lwe["pka"] + e1
            lwe["resb"] = u * lwe["pkb"] + e2
            assert_poly(data, lwe["resa"], name, cfg)
        elif name == "lwe_resb":
            assert_poly(data, lwe["resb"], name, cfg)
        elif name == "lwe_dec_raw":
            tmp = (lwe["resb"] - lwe["resa"] * lwe["s"]).invntt_pow_invphi()
            lwe["dec"] = tmp
            assert_poly(data, tmp, name, cfg)
        elif name == "lwe_dec_bits":
            v = np.asarray(lwe["dec"].data)
            p0 = ring.dtype(ring.moduli[0])
            bits = np.where(v < p0 // ring.dtype(2), v % ring.dtype(2),
                            ring.dtype(1) - v % ring.dtype(2))
            got = bits.astype(np.dtype(ring.dtype).newbyteorder("<")).tobytes()
            assert got == data, f"{cfg}/{name}"
        elif name == "serialize_manual":
            assert env["c"].serialize_manually() == data
        elif name == "cereal_binary":
            # cereal's binary archive of the raw C array == the manual bytes
            assert env["c"].serialize_manually() == data
        else:
            raise AssertionError(f"unknown golden record {name!r}")
