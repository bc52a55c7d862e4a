"""Device-tier samplers vs the host tier.

uniform / non_uniform / ZO must be bit-identical to the host samplers for the
same (key, nonce); gaussian uses the fixed-consumption formulation and is
checked against its host mirror (get_noise_fixed) on the same keystream, plus
a moments check.
"""
import numpy as np
import pytest

import nfllib_tpu as nfl
from nfllib_tpu.prng import device_sampling as dev
from nfllib_tpu.prng import sampling
from nfllib_tpu.prng.gaussian import FastGaussianNoise
from nfllib_tpu.prng.salsa20 import Salsa20Stream

from conftest import make_ring

KEY = b"\x5A" * 32

CONFIGS = [
    (128, 14, "u16"),
    (256, 60, "u32"),
    (64, 124, "u64"),
]


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_device_uniform_matches_host(degree, agg, limb):
    ring = make_ring(degree, agg, limb)
    want = sampling.sample_uniform(ring, Salsa20Stream(KEY, nonce=3))
    got = np.asarray(dev.device_uniform(ring, KEY, 3))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_device_non_uniform_matches_host(degree, agg, limb):
    ring = make_ring(degree, agg, limb)
    mode = sampling.non_uniform(7, 2)
    want = sampling.sample_non_uniform(ring, Salsa20Stream(KEY), mode)
    got = np.asarray(dev.device_non_uniform(ring, KEY, 0, mode))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("degree,agg,limb", CONFIGS)
def test_device_zo_matches_host(degree, agg, limb):
    ring = make_ring(degree, agg, limb)
    mode = sampling.ZO_dist(0x7F)
    want = sampling.sample_zo(ring, Salsa20Stream(KEY, nonce=9), mode)
    got = np.asarray(dev.device_zo(ring, KEY, 9, mode))
    np.testing.assert_array_equal(want, got)


@pytest.fixture(scope="module")
def fg():
    return FastGaussianNoise(4.0, 128, 1 << 10)


def test_device_gaussian_matches_fixed_host_mirror(fg):
    ring = make_ring(256, 60, "u32")
    n, wp = ring.degree, fg.word_precision
    raw = np.frombuffer(Salsa20Stream(KEY, nonce=5).randombytes(n * wp),
                        dtype=np.uint8).reshape(n, wp).astype(np.uint16)
    want_noise = fg.get_noise_fixed(raw)
    got = np.asarray(dev.device_gaussian(ring, KEY, 5, sampling.gaussian(fg)))
    for cm in range(ring.nmoduli):
        p = int(ring.moduli[cm])
        want = np.where(want_noise < 0, p + want_noise, want_noise)
        np.testing.assert_array_equal(got[cm].astype(np.int64), want)


@pytest.mark.parametrize("sigma", [20.0, 80.0])
def test_device_gaussian_large_sigma_matches_mirror(sigma):
    """Wide Gaussians have many more barriers (nb ~ 2*ceil(t*sigma)) and
    exercise deeper binary searches (incl. heavily-clustered tail barriers
    that differ only in deep words); outputs must equal the exact host
    mirror."""
    fg = FastGaussianNoise(sigma, 128, 1 << 10)
    ring = make_ring(512, 60, "u32")
    n, wp = ring.degree, fg.word_precision
    raw = np.frombuffer(Salsa20Stream(KEY, nonce=9).randombytes(n * wp),
                        dtype=np.uint8).reshape(n, wp).astype(np.uint16)
    want_noise = fg.get_noise_fixed(raw)
    got = np.asarray(dev.device_gaussian(ring, KEY, 9, sampling.gaussian(fg)))
    p = int(ring.moduli[0])
    want = np.where(want_noise < 0, p + want_noise, want_noise)
    np.testing.assert_array_equal(got[0].astype(np.int64), want)


def test_device_gaussian_in_bits_16_matches_mirror():
    """The 16-bit word flavor (reference FastGaussianNoise in_bits=16)
    consumes little-endian 16-bit stream limbs and must equal the exact
    host mirror on the same words."""
    fg16 = FastGaussianNoise(4.0, 128, 1 << 10, in_bits=16)
    ring = make_ring(256, 60, "u32")
    n, wp = ring.degree, fg16.word_precision
    raw = np.frombuffer(Salsa20Stream(KEY, nonce=3).randombytes(n * wp * 2),
                        dtype="<u2").reshape(n, wp)
    want_noise = fg16.get_noise_fixed(raw)
    got = np.asarray(dev.device_gaussian(ring, KEY, 3,
                                         sampling.gaussian(fg16)))
    p = int(ring.moduli[0])
    want = np.where(want_noise < 0, p + want_noise, want_noise)
    np.testing.assert_array_equal(got[0].astype(np.int64), want)


def test_device_gaussian_moments(fg):
    ring = make_ring(8192, 60, "u32")
    got = np.asarray(dev.device_gaussian(ring, KEY, 11,
                                         sampling.gaussian(fg)))
    p0 = int(ring.moduli[0])
    signed = got[0].astype(np.int64)
    signed = np.where(signed > p0 // 2, signed - p0, signed)
    assert abs(signed.mean()) < 0.3
    assert abs(signed.std() - 4.0) < 0.3
    assert np.all(np.abs(signed) <= 6 * 4 + 1)


def test_poly_sample_on_device(fg):
    ring = make_ring(256, 60, "u32")
    a = nfl.Poly.sample_on_device(ring, nfl.uniform(), KEY, 1)
    b = nfl.Poly.sample(ring, nfl.uniform(), Salsa20Stream(KEY, nonce=1))
    assert a == b
