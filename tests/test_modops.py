"""Differential tests of jnp modular ops vs the python-int oracle
(mirrors reference tests/test_binary_op.h + nfl_add/sub/mul.cpp)."""
import numpy as np
import pytest

import nfllib_tpu as nfl
from nfllib_tpu import oracle
from nfllib_tpu.ops import modops

from conftest import CONFIG_MATRIX, make_ring, rand_residues

import jax.numpy as jnp


def _oracle_map(fn, *arrs, ring):
    out = np.empty_like(arrs[0])
    m, n = ring.nmoduli, ring.degree
    flat = [a.reshape(-1, m, n) for a in arrs]
    of = out.reshape(-1, m, n)
    for b in range(flat[0].shape[0]):
        for cm in range(m):
            p = int(ring.moduli[cm])
            for i in range(n):
                of[b, cm, i] = fn(*[int(a[b, cm, i]) for a in flat], p)
    return out


@pytest.mark.parametrize("degree,agg,limb", CONFIG_MATRIX)
def test_addmod_submod(degree, agg, limb, rng):
    ring = make_ring(min(degree, 64), agg, limb)  # cap n; op is elementwise
    a = rand_residues(ring, rng)
    b = rand_residues(ring, rng)
    p = jnp.asarray(ring.context().p_col)
    got = np.asarray(modops.addmod(jnp.asarray(a), jnp.asarray(b), p))
    want = _oracle_map(oracle.addmod, a, b, ring=ring)
    np.testing.assert_array_equal(got, want)
    got = np.asarray(modops.submod(jnp.asarray(a), jnp.asarray(b), p))
    want = _oracle_map(oracle.submod, a, b, ring=ring)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("degree,agg,limb", CONFIG_MATRIX)
def test_mulmod(degree, agg, limb, rng):
    ring = make_ring(min(degree, 64), agg, limb)
    ctx = ring.context()
    a = rand_residues(ring, rng)
    b = rand_residues(ring, rng)
    p = jnp.asarray(ctx.p_col)
    pn = jnp.asarray(ctx.pn_col)
    got = np.asarray(modops.mulmod(jnp.asarray(a), jnp.asarray(b), p, pn))
    want = _oracle_map(oracle.mulmod, a, b, ring=ring)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("degree,agg,limb", CONFIG_MATRIX)
def test_compute_shoup_and_mulmod_shoup(degree, agg, limb, rng):
    ring = make_ring(min(degree, 64), agg, limb)
    ctx = ring.context()
    w = ring.repr_bits
    a = rand_residues(ring, rng)
    b = rand_residues(ring, rng)
    p = jnp.asarray(ctx.p_col)
    bprec = np.asarray(modops.compute_shoup(jnp.asarray(b), p))
    want_prec = _oracle_map(
        lambda y, pm: oracle.compute_shoup(y, pm, w), b, ring=ring)
    np.testing.assert_array_equal(bprec, want_prec)

    got = np.asarray(modops.mulmod_shoup(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(bprec), p))
    want = _oracle_map(
        lambda x, y, pm: oracle.mulmod_shoup(
            x, y, oracle.compute_shoup(y, pm, w), pm, w), a, b, ring=ring)
    np.testing.assert_array_equal(got, want)
    # Shoup result equals plain mulmod for canonical inputs
    want_plain = _oracle_map(oracle.mulmod, a, b, ring=ring)
    np.testing.assert_array_equal(got, want_plain)


@pytest.mark.parametrize("degree,agg,limb", CONFIG_MATRIX)
def test_muladd(degree, agg, limb, rng):
    ring = make_ring(min(degree, 64), agg, limb)
    ctx = ring.context()
    w = ring.repr_bits
    r = rand_residues(ring, rng)
    a = rand_residues(ring, rng)
    b = rand_residues(ring, rng)
    p = jnp.asarray(ctx.p_col)
    pn = jnp.asarray(ctx.pn_col)
    got = np.asarray(modops.muladd(
        jnp.asarray(r), jnp.asarray(a), jnp.asarray(b), p, pn))
    want = _oracle_map(oracle.muladd, r, a, b, ring=ring)
    np.testing.assert_array_equal(got, want)

    bprec = modops.compute_shoup(jnp.asarray(b), p)
    got = np.asarray(modops.muladd_shoup(
        jnp.asarray(r), jnp.asarray(a), jnp.asarray(b), bprec, p))
    want = _oracle_map(
        lambda rr, x, y, pm: oracle.muladd_shoup(
            rr, x, y, oracle.compute_shoup(y, pm, w), pm, w),
        r, a, b, ring=ring)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("limb,agg", [("u16", 14), ("u32", 60), ("u64", 124)])
def test_mulmod_muladd_boundary_values(limb, agg):
    """Worst-case operands for the Barrett/Newton quotient error bounds:
    p-1 squared maximizes z, tiny*huge mixes exercise the q underestimate."""
    ring = make_ring(8, agg, limb)
    ctx = ring.context()
    p = jnp.asarray(ctx.p_col)
    pn = jnp.asarray(ctx.pn_col)
    m, n = ring.nmoduli, ring.degree
    pv = np.asarray(ring.moduli, dtype=np.uint64)
    picks = np.array([1, 2, 3, 0, 0, 0, 0, 0], dtype=np.uint64)
    a = (pv[:, None] - 1 - picks[None, :]) % pv[:, None]
    picks2 = np.array([1, 0, 1, 2, 1, 0, 2, 1], dtype=np.uint64)
    b = np.where(picks2[None, :] == 0, pv[:, None] - 1, picks2[None, :])
    a = a.astype(ring.dtype)
    b = b.astype(ring.dtype)
    got = np.asarray(modops.mulmod(jnp.asarray(a), jnp.asarray(b), p, pn))
    want = _oracle_map(oracle.mulmod, a, b, ring=ring)
    np.testing.assert_array_equal(got, want)
    r = (b.astype(np.uint64) * 3 % pv[:, None]).astype(ring.dtype)
    got = np.asarray(modops.muladd(
        jnp.asarray(r), jnp.asarray(a), jnp.asarray(b), p, pn))
    want = _oracle_map(oracle.muladd, r, a, b, ring=ring)
    np.testing.assert_array_equal(got, want)


def test_poly_operator_sugar(rng):
    ring = nfl.ring_from_modulus("u32", 64, 60)
    a = nfl.Poly(jnp.asarray(rand_residues(ring, rng)), ring)
    b = nfl.Poly(jnp.asarray(rand_residues(ring, rng)), ring)
    c = nfl.Poly(jnp.asarray(rand_residues(ring, rng)), ring)

    assert (a + b) - b == a
    # deferred product + shoup rewrite path
    bprec = nfl.compute_shoup(b)
    assert nfl.shoup(a * b, bprec) == a.mulmod(b)
    # fused muladd path: c + a*b
    assert (a * b) + c == c.muladd(a, b)
    assert c + (a * b) == c.muladd(a, b)
    # batched broadcasting
    batch = nfl.Poly(jnp.asarray(rand_residues(ring, rng, batch=(3,))), ring)
    got = (batch + a).data
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(got[i]),
            np.asarray((nfl.Poly(batch.data[i], ring) + a).data))


def test_from_coeffs_set_semantics():
    # reference core.hpp:103-136: broadcast-or-full, zero padding, reduction
    ring = nfl.ring_from_modulus("u16", 8, 28)
    p = nfl.Poly.from_coeffs(ring, [1, 2, 3])
    arr = np.asarray(p.data)
    assert list(arr[0]) == [1, 2, 3, 0, 0, 0, 0, 0]
    assert list(arr[1]) == [1, 2, 3, 0, 0, 0, 0, 0]
    big = int(ring.moduli[0]) + 5
    q = nfl.Poly.from_coeffs(ring, [big], reduce_coeffs=True)
    assert int(np.asarray(q.data)[0, 0]) == 5
    assert int(np.asarray(q.data)[1, 0]) == big % int(ring.moduli[1])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        nfl.Poly.from_coeffs(ring, list(range(9)))  # > degree, != m*n


def test_stream_printer():
    """Reference operator<< format (core.hpp:398-421; tests/nfl_stream.cpp
    gates on str(p)[:4] == '{ 1U' for p = 1)."""
    for limb, agg, suffix in [("u16", 28, "U"), ("u32", 60, "UL"),
                              ("u64", 124, "ULL")]:
        ring = nfl.ring_from_modulus(limb, 8, agg)
        p = nfl.Poly.constant(ring, 1)
        s = str(p)
        assert s[:4] == "{ 1U"
        assert s.startswith("{ 1" + suffix + ", 0" + suffix)
        assert s.endswith("0" + suffix + " }")
        assert s.count(",") == ring.nmoduli * ring.degree - 1
    # Expr forwards the printer through evaluation
    ring = nfl.ring_from_modulus("u32", 8, 60)
    one = nfl.Poly.constant(ring, 1)
    assert str(one + nfl.Poly.zeros(ring))[:4] == "{ 1U"


def test_free_functions_and_accessors(rng):
    """API parity: nfl.add/sub/mul free functions (reference poly.hpp:314-332),
    (cm,i) accessor and storage-order iteration (poly.hpp:156-158)."""
    import nfllib_tpu as nfl
    from conftest import make_ring, rand_residues
    import numpy as np

    ring = make_ring(64, 60, "u32")
    a = nfl.Poly(rand_residues(ring, rng), ring)
    b = nfl.Poly(rand_residues(ring, rng), ring)
    assert nfl.add(a, b) == a + b
    assert nfl.sub(a, b) == a - b
    assert nfl.mul(a, b) == a.mulmod(b)
    arr = np.asarray(a.data)
    assert a(1, 3) == int(arr[1, 3])
    assert list(a)[:64] == arr[0].tolist()
    assert nfl.poly_from_modulus is nfl.ring_from_modulus


@pytest.mark.parametrize("limb,wbits", [("u16", 16), ("u32", 32)])
def test_compute_shoup_barrett_boundaries(limb, wbits):
    """The u16/u32 compute_shoup Barrett path (two multiplies instead of
    emulated % and //) must be exact for UNREDUCED inputs across the full
    word range, including every value adjacent to a multiple of p —
    where floor-division approximations fail first."""
    import nfllib_tpu as nfl
    lp = nfl.get_limb_params(limb)
    dt = np.uint16 if limb == "u16" else np.uint32
    rng = np.random.default_rng(11)
    for p_ in [int(v) for v in lp.P[:4]]:
        ks = np.arange(1, min((1 << wbits) // p_, 4096), dtype=object)
        near = np.concatenate([ks * p_ - 1, ks * p_, ks * p_ + 1,
                               rng.integers(0, 1 << wbits, 4096),
                               np.array([0, 1, (1 << wbits) - 1],
                                        dtype=object)])
        near = np.array([v for v in near if 0 <= v < (1 << wbits)],
                        dtype=np.uint64).astype(dt)
        got = np.asarray(modops.compute_shoup(
            jnp.asarray(near), jnp.asarray(np.array(p_, dtype=dt))))
        want = (((near.astype(object) % p_) << wbits) // p_).astype(dt)
        np.testing.assert_array_equal(got, want)
