"""Parameter table validation (reference include/nfl/params.hpp contracts)."""
import numpy as np
import pytest

import nfllib_tpu as nfl
from nfllib_tpu.params import get_limb_params

# spot values straight out of the reference tables (params.hpp:23-36,54-,96-)
REFERENCE_SPOT_VALUES = {
    "u16": {"P0": 15361, "P1": 13313, "Pn0": 17458,
            "root0": 4989, "invdeg0": 15331},
    "u32": {"P0": 1073479681, "P1": 1072496641, "Pn0": 4195312,
            "root0": 31849551, "invdeg0": 1073446921},
    "u64": {"P0": 4611686018326724609, "P1": 4611686018309947393,
            "Pn0": 1610612720, "root0": 2262382610096409597,
            "invdeg0": 4611681620280213601},
}


@pytest.mark.parametrize("limb", nfl.LIMBS)
def test_tables_match_reference_spot_values(limb):
    lp = get_limb_params(limb)
    sv = REFERENCE_SPOT_VALUES[limb]
    assert lp.P[0] == sv["P0"]
    assert lp.P[1] == sv["P1"]
    assert lp.Pn[0] == sv["Pn0"]
    assert lp.primitive_roots[0] == sv["root0"]
    assert lp.inv_max_poly_degree[0] == sv["invdeg0"]


@pytest.mark.parametrize("limb", nfl.LIMBS)
def test_table_invariants(limb):
    lp = get_limb_params(limb)
    assert len(lp.P) == lp.max_nb_moduli
    two_w = 1 << (2 * lp.repr_bits)
    for i in range(min(5, lp.max_nb_moduli)):
        p = lp.P[i]
        assert p.bit_length() == lp.modulus_bits
        # prime form p = 2^b - j*2*kMaxPolyDegree + 1
        assert (p - 1) % (2 * lp.max_poly_degree) == 0
        # Newton quotient low word (ops.hpp:201-219 contract)
        assert lp.Pn[i] == two_w // p - (4 << lp.repr_bits)
        # inverse degree
        assert (lp.inv_max_poly_degree[i] * lp.max_poly_degree) % p == 1
        # primitive 2*kMaxPolyDegree-th root
        r = lp.primitive_roots[i]
        assert pow(r, lp.max_poly_degree, p) == p - 1


def test_ring_validation():
    with pytest.raises(ValueError):
        nfl.Ring("u16", 48, 1)          # not a power of two
    with pytest.raises(ValueError):
        nfl.Ring("u16", 1024, 1)        # beyond kMaxPolyDegree for u16
    with pytest.raises(ValueError):
        nfl.Ring("u16", 128, 3)         # not enough primes
    with pytest.raises(ValueError):
        nfl.ring_from_modulus("u32", 64, 45)  # not a multiple of 30
    r = nfl.ring_from_modulus("u32", 64, 60)
    assert r.nmoduli == 2


def test_ring_context_twiddles_small():
    ring = nfl.Ring("u32", 8, 2)
    ctx = ring.context()
    for cm in range(2):
        p = int(ring.moduli[cm])
        phi = ctx.phi_int[cm]
        # phi is a primitive 2n-th root
        assert pow(phi, ring.degree, p) == p - 1
        assert np.all(ctx.phis[cm] == np.array(
            [pow(phi, i, p) for i in range(8)], dtype=np.uint32))
        # blocked omegas: [w^0..w^3, (w^2)^0..1, (w^4)^0]
        w = ctx.omega_int[cm]
        expect = [pow(w, e, p) for e in (0, 1, 2, 3, 0, 2, 0)]
        assert list(ctx.omegas[cm]) == expect
        # shoup companions
        assert list(ctx.shoupomegas[cm]) == [
            (e << 32) // p for e in expect]
        # n^-1
        assert (int(ctx.invpolyDegree[cm]) * 8) % p == 1
