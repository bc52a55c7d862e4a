"""Host sampler semantics (reference core.hpp:145-391): hwt_dist's exact
Hamming weight and sign encoding, ZO_dist's ternary support, non_uniform's
centered bound — plus determinism given the stream."""
import numpy as np
import pytest

import nfllib_tpu as nfl
from nfllib_tpu.prng import sampling
from nfllib_tpu.prng.salsa20 import Salsa20Stream

from conftest import make_ring

KEY = b"\x77" * 32


@pytest.mark.parametrize("degree,agg,limb,h", [
    (64, 60, "u32", 16),
    (128, 14, "u16", 33),
    (64, 124, "u64", 64),
])
def test_hwt_exact_weight_and_encoding(degree, agg, limb, h):
    ring = make_ring(degree, agg, limb)
    data = sampling.sample_hwt(ring, Salsa20Stream(KEY), sampling.hwt_dist(h))
    mask = (1 << ring.repr_bits) - 1
    for cm in range(ring.nmoduli):
        p = int(ring.moduli[cm])
        nz = np.nonzero(data[cm])[0]
        assert len(nz) == h                       # exact Hamming weight
        vals = set(int(v) for v in data[cm][nz])
        # +-1 encoded as p-1 / (p+1 mod 2^w) (core.hpp:383-386)
        assert vals <= {(p - 1) & mask, (p + 1) & mask}
    # nonzero positions and signs identical across channels
    nz0 = np.nonzero(data[0])[0]
    sign0 = data[0][nz0] != ((int(ring.moduli[0]) - 1) & mask)
    for cm in range(1, ring.nmoduli):
        nzc = np.nonzero(data[cm])[0]
        np.testing.assert_array_equal(nz0, nzc)
        signc = data[cm][nzc] != ((int(ring.moduli[cm]) - 1) & mask)
        np.testing.assert_array_equal(sign0, signc)


def test_hwt_bounds_and_determinism():
    ring = make_ring(64, 60, "u32")
    with pytest.raises(ValueError):
        sampling.sample_hwt(ring, Salsa20Stream(KEY), sampling.hwt_dist(0))
    with pytest.raises(ValueError):
        sampling.sample_hwt(ring, Salsa20Stream(KEY), sampling.hwt_dist(65))
    a = sampling.sample_hwt(ring, Salsa20Stream(KEY), sampling.hwt_dist(20))
    b = sampling.sample_hwt(ring, Salsa20Stream(KEY), sampling.hwt_dist(20))
    np.testing.assert_array_equal(a, b)
    full = sampling.sample_hwt(ring, Salsa20Stream(KEY),
                               sampling.hwt_dist(64))
    assert np.all(full != 0)


def test_zo_support_and_rate():
    ring = make_ring(4096, 60, "u32")
    data = sampling.sample_zo(ring, Salsa20Stream(KEY),
                              sampling.ZO_dist(0x7F))
    p0 = int(ring.moduli[0])
    vals = set(int(v) for v in np.unique(data[0]))
    assert vals <= {0, p0 - 1, p0 + 1}
    frac = np.count_nonzero(data[0]) / ring.degree
    assert abs(frac - 0x80 / 256) < 0.05          # P(hit) = (rho+1)/256


def test_non_uniform_centered_bound():
    ring = make_ring(4096, 60, "u32")
    ub = 9
    data = sampling.sample_non_uniform(ring, Salsa20Stream(KEY),
                                       sampling.non_uniform(ub))
    for cm in range(ring.nmoduli):
        p = int(ring.moduli[cm])
        v = data[cm].astype(np.int64)
        signed = np.where(v > p // 2, v - p, v)
        assert signed.max() <= ub - 1
        assert signed.min() >= -(ub - 1)
    with pytest.raises(ValueError):
        sampling.sample_non_uniform(
            ring, Salsa20Stream(KEY),
            sampling.non_uniform(int(ring.moduli[0])))
