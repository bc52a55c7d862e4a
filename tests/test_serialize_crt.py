"""Serialization round-trips (reference poly_serialize_*.cpp) and CRT lift
round-trips + independent oracle (reference tests/poly_mpz.cpp:44-64)."""
import numpy as np
import pytest

import jax.numpy as jnp

import nfllib_tpu as nfl
from nfllib_tpu.crt import mpz2poly, poly2mpz, set_mpz
from nfllib_tpu.serialize import deserialize_poly, serialize_poly

from conftest import CONFIG_MATRIX, make_ring, rand_residues


@pytest.mark.parametrize("degree,agg,limb", CONFIG_MATRIX)
def test_serialize_roundtrip(degree, agg, limb, rng):
    ring = make_ring(min(degree, 256), agg, limb)
    p = nfl.Poly(jnp.asarray(rand_residues(ring, rng)), ring)
    buf = serialize_poly(p)
    assert len(buf) == ring.nmoduli * ring.degree * ring.limb_params.itemsize
    q = deserialize_poly(ring, buf)
    assert p == q
    # byte layout: moduli-major little-endian words (poly.hpp:180-185)
    first = int(np.asarray(p.data)[0, 0])
    it = ring.limb_params.itemsize
    assert buf[:it] == first.to_bytes(it, "little")


@pytest.mark.parametrize("degree,agg,limb", CONFIG_MATRIX)
def test_crt_roundtrip_and_oracle(degree, agg, limb, rng):
    ring = make_ring(min(degree, 32), agg, limb)
    p = nfl.Poly(jnp.asarray(rand_residues(ring, rng)), ring)
    lifted = poly2mpz(p)
    back = mpz2poly(ring, lifted)
    assert p == back
    # independent residue check (tests/poly_mpz.cpp oracle)
    arr = np.asarray(p.data)
    for cm in range(ring.nmoduli):
        pm = int(ring.moduli[cm])
        for i in range(ring.degree):
            assert lifted[i] % pm == int(arr[cm, i])


def test_crt_200bit_inputs(rng):
    """200-bit random big ints reduce and lift consistently
    (mirrors poly_mpz.cpp's large-input check)."""
    ring = make_ring(16, 240, "u32")  # 8 x 30-bit moduli: product > 200 bits
    vals = [int.from_bytes(rng.bytes(25), "little") for _ in range(16)]
    p = mpz2poly(ring, vals)
    lifted = poly2mpz(p)
    prod = ring.context().moduli_product
    assert lifted == [v % prod for v in vals]


def test_set_mpz_broadcast_semantics():
    ring = make_ring(8, 60, "u32")
    p = set_mpz(ring, [-1, 5])
    arr = np.asarray(p.data)
    for cm in range(2):
        pm = int(ring.moduli[cm])
        assert int(arr[cm, 0]) == pm - 1      # fdiv semantics for negatives
        assert int(arr[cm, 1]) == 5
        assert int(arr[cm, 2]) == 0
