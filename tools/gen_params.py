#!/usr/bin/env python3
"""Generate the NFLlib-compatible parameter tables.

The reference library ships static tables of NTT-friendly primes per limb type
(reference: include/nfl/params.hpp:12-121, storage lib/params/params.cpp:3-16).
The primes follow a documented formula ("p = 2**B - i*2*kMaxPolyDegree + 1 for
increasing i", params.hpp:21,53,95): candidates p = 2^B - j*2^(log2(2*n_max)) + 1
for j = 1, 2, ... keeping those that are prime.  Everything except the primitive
roots is therefore *derivable*:

  - P[]               : the primes themselves (formula above)
  - Pn[]              : low word of the Newton quotient,
                        Pn = floor(2^(2w) / p) - 4 * 2^w   (w = representation bits)
                        (used by ops.hpp:201-219 mulmod<uint64_t>)
  - invkMaxPolyDegree : kMaxPolyDegree^-1 mod p            (params.hpp:34-36)

The primitive 2*kMaxPolyDegree-th roots of unity are an arbitrary-but-fixed
choice per prime (params.hpp:31-32).  They cannot be derived from a formula;
they are interop *data* required for bit-exact NTT compatibility, so we extract
them from the reference header, VERIFY primitivity of every one, and store them
in nfllib_tpu/data/params_*.json alongside the regenerated tables.

Run:  python3 tools/gen_params.py [--reference /root/reference]
"""
import argparse
import json
import os
import re
import sys

from sympy import isprime

CONFIGS = {
    # limb-name: (modulus_bits, repr_bits, max_poly_degree, max_nb_moduli)
    "u16": (14, 16, 512, 2),
    "u32": (30, 32, 32768, 291),
    "u64": (62, 64, 1 << 20, 1000),
}
CPP_TYPE = {"u16": "uint16_t", "u32": "uint32_t", "u64": "uint64_t"}


def gen_primes(modulus_bits, max_poly_degree, count):
    """Primes p = 2^modulus_bits - j*2*max_poly_degree + 1, decreasing, prime."""
    base = 1 << modulus_bits
    step = 2 * max_poly_degree
    primes = []
    j = 1
    while len(primes) < count:
        p = base - j * step + 1
        if p <= 0:
            raise RuntimeError("ran out of candidates")
        if isprime(p):
            primes.append(p)
        j += 1
    return primes


def newton_quotient_low(p, repr_bits):
    """Low word of floor(2^(2w)/p); full quotient is 4*2^w + Pn for 2-bit slack."""
    return ((1 << (2 * repr_bits)) // p) - (4 << repr_bits)


def extract_reference_arrays(params_hpp_text, cpp_type):
    """Extract the P/Pn/primitive_roots/invkMaxPolyDegree arrays for one limb."""
    # Isolate the specialization block for this type.
    start = params_hpp_text.index("struct params<%s>" % cpp_type)
    end = params_hpp_text.find("struct params<", start + 10)
    block = params_hpp_text[start:end if end != -1 else len(params_hpp_text)]
    out = {}
    for name in ("P", "Pn", "primitive_roots", "invkMaxPolyDegree"):
        m = re.search(r"value_type %s\[[^\]]*\] = \{([^}]*)\}" % name, block)
        vals = [int(v.strip().rstrip("UL").rstrip("U"))
                for v in m.group(1).split(",") if v.strip()]
        out[name] = vals
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "nfllib_tpu", "data"))
    args = ap.parse_args()

    ref_params = os.path.join(args.reference, "include", "nfl", "params.hpp")
    ref_text = open(ref_params).read() if os.path.exists(ref_params) else None

    os.makedirs(args.out, exist_ok=True)
    for limb, (mbits, wbits, max_deg, max_nmod) in CONFIGS.items():
        print(f"[{limb}] generating {max_nmod} primes of {mbits} bits ...")
        primes = gen_primes(mbits, max_deg, max_nmod)
        pn = [newton_quotient_low(p, wbits) for p in primes]
        inv_deg = [pow(max_deg, -1, p) for p in primes]

        roots = None
        if ref_text is not None:
            ref = extract_reference_arrays(ref_text, CPP_TYPE[limb])
            assert ref["P"] == primes, f"{limb}: prime regeneration mismatch"
            assert ref["Pn"] == pn, f"{limb}: Newton quotient mismatch"
            assert ref["invkMaxPolyDegree"] == inv_deg, f"{limb}: inv mismatch"
            roots = ref["primitive_roots"]
            # verify primitivity: r^(2*max_deg) == 1 and r^max_deg == p-1
            for p, r in zip(primes, roots):
                assert pow(r, 2 * max_deg, p) == 1, (limb, p, r)
                assert pow(r, max_deg, p) == p - 1, (limb, p, r)
            print(f"[{limb}] reference tables match; {len(roots)} roots verified")
        else:
            # Stand-alone fallback: deterministic canonical roots (NOT interop
            # compatible with the reference's arbitrary choices).
            roots = []
            for p in primes:
                g = 2
                while True:
                    r = pow(g, (p - 1) // (2 * max_deg), p)
                    if pow(r, max_deg, p) == p - 1:
                        roots.append(r)
                        break
                    g += 1
            print(f"[{limb}] WARNING: reference not found, canonical roots used")

        data = {
            "limb": limb,
            "modulus_bits": mbits,
            "repr_bits": wbits,
            "max_poly_degree": max_deg,
            "max_nb_moduli": max_nmod,
            "P": primes,
            "Pn": pn,
            "primitive_roots": roots,
            "inv_max_poly_degree": inv_deg,
        }
        path = os.path.join(args.out, f"params_{limb}.json")
        with open(path, "w") as f:
            json.dump(data, f)
        print(f"[{limb}] wrote {path}")


if __name__ == "__main__":
    sys.exit(main())
