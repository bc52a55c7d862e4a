"""End-to-end LWE symmetric encrypt/decrypt (the reference's acceptance
workload, tests/nfllib_demo_main_op.cpp:260-331): decryptions of encryptions
of zero must sum to exactly zero."""
import pytest

from nfllib_tpu.apps import lwe
from conftest import make_ring


@pytest.mark.parametrize("degree,agg,limb", [
    (128, 14, "u16"),
    (512, 60, "u32"),
])
def test_lwe_zero_sum(degree, agg, limb):
    ring = make_ring(degree, agg, limb)
    assert lwe.run_zero_sum_check(ring, repetitions=5, key=b"\x11" * 32)


@pytest.mark.slow
@pytest.mark.parametrize("degree,agg,limb", [
    (1024, 60, "u32"),
    (512, 124, "u64"),
])
def test_lwe_zero_sum_slow(degree, agg, limb):
    ring = make_ring(degree, agg, limb)
    assert lwe.run_zero_sum_check(ring, repetitions=3, key=b"\x22" * 32)
