"""Distributed execution tests on the virtual 8-device CPU mesh.

The TPU-native replacement for the reference's absent distribution layer
(SURVEY.md §2 note): residue channels (`rns`) and poly batches (`batch`) are
zero-communication mesh axes mirroring the independent `cm` loops (reference
core.hpp:597,610); the degree axis (`deg`) is the four-step NTT with an ICI
all-to-all (parallel/ntt_dist.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import nfllib_tpu as nfl
from nfllib_tpu.ops import ntt as ntt_jnp
from nfllib_tpu.parallel import ntt_dist
from nfllib_tpu.utils import bitrev_indices

from conftest import make_ring, rand_residues


def _mesh(shape, names):
    devs = np.array(jax.devices("cpu")[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, axis_names=names)


# ---------------------------------------------------------------------------
# four-step math vs the Harvey path (single device)
# ---------------------------------------------------------------------------

def test_degenerate_four_step_split_raises():
    """n1/n2 < 2 (or factors that don't multiply to the degree) must raise
    a clear ValueError, not an obscure np.concatenate crash (round-5
    library review)."""
    ring = make_ring(16, 60, "u32")
    for n1, n2 in ((1, 16), (16, 1), (4, 8)):
        with pytest.raises(ValueError, match="four-step factors"):
            ntt_dist.get_four_step_context(ring, n1, n2)


@pytest.mark.parametrize("degree,agg,limb,n1", [
    (64, 60, "u32", 8),
    (256, 60, "u32", 16),
    (256, 14, "u16", 16),
    (64, 124, "u64", 8),
])
def test_four_step_matches_harvey(degree, agg, limb, n1, rng):
    ring = make_ring(degree, agg, limb)
    x = rand_residues(ring, rng)
    n2 = degree // n1
    four = np.asarray(ntt_dist.four_step_reference(x, ring, n1))
    harvey = np.asarray(ntt_jnp.ntt_pow_phi(x, ring.context()))
    # harvey[j] = E[bitrev_n(j)]; four[k1,k2] = E[k1 + n1*k2]
    rev = bitrev_indices(degree)
    E = four.reshape(ring.nmoduli, n1, n2).transpose(0, 2, 1).reshape(
        ring.nmoduli, degree)  # E[k] with k = k1 + n1*k2
    np.testing.assert_array_equal(harvey, E[:, rev])


@pytest.mark.parametrize("degree,agg,limb,n1", [
    (64, 60, "u32", 8),
    (256, 60, "u32", 16),
])
def test_four_step_roundtrip(degree, agg, limb, n1, rng):
    ring = make_ring(degree, agg, limb)
    x = rand_residues(ring, rng)
    y = ntt_dist.four_step_reference(x, ring, n1)
    back = np.asarray(ntt_dist.four_step_reference_inverse(y, ring, n1))
    np.testing.assert_array_equal(back, x)


# ---------------------------------------------------------------------------
# distributed four-step over the deg axis
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_distributed_ntt_matches_single_device(ndev, rng):
    ring = make_ring(256, 60, "u32")
    mesh = _mesh((ndev,), ("deg",))
    x = rand_residues(ring, rng)
    xd = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, "deg")))
    out = np.asarray(ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh))
    want = np.asarray(ntt_dist.four_step_reference(x, ring, 16))
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("ndev", [2, 8])
def test_distributed_roundtrip(ndev, rng):
    ring = make_ring(256, 60, "u32")
    mesh = _mesh((ndev,), ("deg",))
    x = rand_residues(ring, rng)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "deg")))
    y = ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh)
    back = np.asarray(ntt_dist.distributed_invntt_pow_invphi(y, ring, mesh))
    np.testing.assert_array_equal(back, x)


def test_distributed_pointwise_pipeline(rng):
    """NTT-domain pointwise product in the four-step layout: the full
    negacyclic product pipeline never needs a global reorder."""
    ring = make_ring(256, 60, "u32")
    ctx = ring.context()
    mesh = _mesh((4,), ("deg",))
    a = rand_residues(ring, rng)
    b = rand_residues(ring, rng)
    sh = NamedSharding(mesh, P(None, "deg"))
    ad = jax.device_put(jnp.asarray(a), sh)
    bd = jax.device_put(jnp.asarray(b), sh)
    fa = ntt_dist.distributed_ntt_pow_phi(ad, ring, mesh)
    fb = ntt_dist.distributed_ntt_pow_phi(bd, ring, mesh)
    from nfllib_tpu.ops import modops
    prod = modops.mulmod(fa, fb, jnp.asarray(ctx.p_col)[..., None],
                         jnp.asarray(ctx.pn_col)[..., None])
    got = np.asarray(
        ntt_dist.distributed_invntt_pow_invphi(prod, ring, mesh))
    from nfllib_tpu import oracle
    want = oracle.negacyclic_mul_schoolbook(a, b, ring)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# zero-communication rns/batch axes (pjit auto-sharding)
# ---------------------------------------------------------------------------

def test_rns_batch_sharded_ntt(rng):
    ring = make_ring(512, 120, "u32")  # 4 channels
    ctx = ring.context()
    mesh = _mesh((2, 4), ("batch", "rns"))
    x = rand_residues(ring, rng, batch=(4,))
    sh = NamedSharding(mesh, P("batch", "rns", None))
    xd = jax.device_put(jnp.asarray(x), sh)
    fn = jax.jit(lambda v: ntt_jnp.ntt_pow_phi(v, ctx),
                 in_shardings=sh, out_shardings=sh)
    with mesh:
        out = np.asarray(fn(xd))
    want = np.asarray(ntt_jnp.ntt_pow_phi(jnp.asarray(x), ctx))
    np.testing.assert_array_equal(out, want)


def test_mesh_api_shard_poly(rng):
    """parallel.api conveniences: mesh factoring, poly sharding placement,
    and a zero-comm batch+rns sharded op pipeline."""
    from nfllib_tpu.parallel import api
    import nfllib_tpu as nfl

    mesh = api.make_mesh(devices=jax.devices("cpu")[:8])
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "batch": 2, "rns": 2, "deg": 2}
    ring = make_ring(256, 120, "u32")     # 4 channels
    x = rand_residues(ring, rng, batch=(4,))
    p = nfl.Poly(jnp.asarray(x), ring)
    ps = api.shard_poly(p, mesh)
    assert ps == p
    q = (ps + ps).ntt_pow_phi()
    want = (p + p).ntt_pow_phi()
    assert q == want


def test_comm_volume_one_all_to_all_and_balanced_shards(rng):
    """The distributed transform's ONLY communication is one all-to-all
    (asserted on the compiled HLO), and per-device output shards are
    balanced (SURVEY.md §5 comm-backend / work-balance contract)."""
    ring = make_ring(1024, 60, "u32")
    mesh = _mesh((4,), ("deg",))
    x = jnp.asarray(rand_residues(ring, rng))
    with mesh:
        fwd = lambda v: ntt_dist.distributed_ntt_pow_phi(v, ring, mesh)
        hlo = jax.jit(fwd).lower(x).compile().as_text()
        n_a2a = hlo.count(" all-to-all(") + hlo.count(" all-to-all-start(")
        assert n_a2a == 1, f"expected exactly one all-to-all, got {n_a2a}"
        for coll in ("all-reduce(", "all-gather(", "collective-permute("):
            assert coll not in hlo, f"unexpected collective {coll}"
        y = fwd(x)
        shapes = {s.data.shape for s in y.addressable_shards}
        assert len(shapes) == 1, f"unbalanced shards: {sorted(shapes)}"
        # inverse likewise
        inv = lambda v: ntt_dist.distributed_invntt_pow_invphi(v, ring, mesh)
        hlo_i = jax.jit(inv).lower(y).compile().as_text()
        n_a2a_i = (hlo_i.count(" all-to-all(")
                   + hlo_i.count(" all-to-all-start("))
        assert n_a2a_i == 1
        back = inv(y)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


# ---------------------------------------------------------------------------
# production kernels in the distributed path (round-2 VERDICT item 2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("degree,agg,limb,ndev", [
    (256, 60, "u32", 4),
    (1024, 60, "u32", 4),
    (256, 124, "u64", 2),
    (1024, 124, "u64", 4),
])
def test_distributed_mxu_kernels_match_jnp(degree, agg, limb, ndev, rng,
                                           monkeypatch):
    """The fused MXU sub-DFT kernels (ops/dft_mxu.py), dispatched inside
    shard_map (interpret mode off-TPU), are bit-identical to the jnp stage
    loop across the whole distributed forward+inverse pipeline."""
    ring = make_ring(degree, agg, limb)
    mesh = _mesh((ndev,), ("deg",))
    x = rand_residues(ring, rng)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "deg")))

    monkeypatch.setenv("NFL_TPU_NTT", "jnp")
    y_jnp = np.asarray(ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh))

    monkeypatch.setenv("NFL_TPU_NTT", "mxu")
    # fresh builders: the dispatch decision is baked into the traced program
    ntt_dist._build_dist_fwd.cache_clear()
    ntt_dist._build_dist_inv.cache_clear()
    from nfllib_tpu.ops import dft_mxu
    n1 = 1 << (len(bin(degree)) - 3 >> 1)
    assert dft_mxu.supports(ring, n1) or degree < 64
    y_mxu = ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh)
    np.testing.assert_array_equal(np.asarray(y_mxu), y_jnp)
    back = np.asarray(ntt_dist.distributed_invntt_pow_invphi(
        y_mxu, ring, mesh))
    np.testing.assert_array_equal(back, x)

    monkeypatch.setenv("NFL_TPU_NTT", "jnp")
    ntt_dist._build_dist_fwd.cache_clear()
    ntt_dist._build_dist_inv.cache_clear()


def test_dist_tables_sharded_by_construction(rng):
    """The [m, n1, n2] twiddle tables are device_put with the mesh sharding
    at build time: each device holds 1/D of the table (no replicate+gather
    in the compiled program)."""
    ring = make_ring(1024, 60, "u32")
    mesh = _mesh((4,), ("deg",))
    x = jnp.asarray(rand_residues(ring, rng))
    xd = jax.device_put(x, NamedSharding(mesh, P(None, "deg")))
    _ = ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh)
    # the build places the twiddle tables with the column sharding: each
    # device's shard is 1/D of the table
    n1, n2 = 32, 32
    fctx = ntt_dist.get_four_step_context(ring, n1, n2)
    col_sh = NamedSharding(mesh, P(None, None, "deg"))
    t = jax.device_put(np.asarray(fctx.twiddle), col_sh)
    shard_shapes = {s.data.shape for s in t.addressable_shards}
    assert shard_shapes == {(ring.nmoduli, n1, n2 // 4)}


def test_chunked_all_to_all_overlap(rng):
    """chunks > 1 splits twiddle+transpose into independent pieces (the
    comm/compute-overlap structure for multi-host scaling): bit-identical
    to the monolithic transform, with exactly `chunks` all-to-alls in the
    compiled program."""
    ring = make_ring(1024, 60, "u32")
    mesh = _mesh((4,), ("deg",))
    x = jnp.asarray(rand_residues(ring, rng))
    xd = jax.device_put(x, NamedSharding(mesh, P(None, "deg")))
    want = np.asarray(ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh))
    with mesh:
        fwd = lambda v: ntt_dist.distributed_ntt_pow_phi(
            v, ring, mesh, chunks=4)
        hlo = jax.jit(fwd).lower(x).compile().as_text()
        n_a2a = hlo.count(" all-to-all(") + hlo.count(" all-to-all-start(")
        assert n_a2a == 4, f"expected 4 chunked all-to-alls, got {n_a2a}"
        got = np.asarray(fwd(xd))
    np.testing.assert_array_equal(got, want)
    # inverse mirrored: chunked transpose back, bit-identical roundtrip
    y = ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh)
    with mesh:
        inv = lambda v: ntt_dist.distributed_invntt_pow_invphi(
            v, ring, mesh, chunks=2)
        hlo_i = jax.jit(inv).lower(y).compile().as_text()
        n_i = hlo_i.count(" all-to-all(") + hlo_i.count(" all-to-all-start(")
        assert n_i == 2, f"expected 2 chunked all-to-alls, got {n_i}"
        back = np.asarray(inv(y))
    np.testing.assert_array_equal(back, np.asarray(x))


@pytest.mark.slow
def test_multiprocess_distributed_ntt():
    """The EXECUTED multi-host entry: two OS processes join through
    parallel.api.init_distributed, build a cross-process mesh, and the
    distributed NTT is bit-exact vs single-process (tools/
    check_multiprocess.py; also run standalone to record MULTIPROC.json)."""
    import pathlib
    import subprocess
    import sys as _sys

    root = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run([_sys.executable,
                        str(root / "tools" / "check_multiprocess.py")],
                       cwd=str(root), capture_output=True, text=True,
                       timeout=1200)
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.parametrize("limb,agg", [("u32", 60), ("u64", 124)])
@pytest.mark.parametrize("axis", [-2, -1])
def test_dft_mxu_twiddle_epilogue(limb, agg, axis, rng):
    """matmul_mod's in-kernel Shoup-twiddle epilogue == matmul followed by
    a separate mulmod_shoup pass (both tiers, both sides)."""
    from nfllib_tpu.ops import dft_mxu, modops
    from nfllib_tpu.ring import _np_shoup_vec

    ring = make_ring(256, agg, limb)
    size = 16
    m = ring.nmoduli
    x = rand_residues(ring, rng).reshape(m, size, size)
    tw = np.empty((m, size, size), dtype=ring.dtype)
    tws = np.empty((m, size, size), dtype=ring.dtype)
    for cm in range(m):
        p = int(ring.moduli[cm])
        t = rng.integers(0, p, size=(size, size)).astype(np.uint64)
        tw[cm] = t.astype(ring.dtype)
        tws[cm] = _np_shoup_vec(t.reshape(-1), p,
                                ring.repr_bits).reshape(size, size).astype(
                                    ring.dtype)
    want = dft_mxu.matmul_mod(x, ring, "dft_fwd", size, axis=axis,
                              interpret=True)
    p3 = jnp.asarray(ring.context().p_col)[..., None]
    want = np.asarray(modops.mulmod_shoup(want, jnp.asarray(tw),
                                          jnp.asarray(tws), p3))
    got = np.asarray(dft_mxu.matmul_mod(x, ring, "dft_fwd", size, axis=axis,
                                        interpret=True, twiddle=(tw, tws)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("axis", [-2, -1])
@pytest.mark.parametrize("twiddle", [False, True])
def test_dft_mxu_pipelined_matches_plain(axis, twiddle, rng):
    """The software-pipelined u64 kernel (block t's dots + block t-1's
    epilogue over a flattened grid, _kernel_u64_pipe) is bit-identical to
    the plain kernel.  Perf capability kept after rejection: paired A/B on
    chip measured it 1.21-1.43x SLOWER (DFT_PIPE_AB.json) — Mosaic does
    not overlap the previous block's VPU epilogue with the next block's
    MXU dots, and the ping-pong scratch round-trip only costs."""
    from nfllib_tpu.ops import dft_mxu
    from nfllib_tpu.ring import _np_shoup_vec

    ring = make_ring(256, 124, "u64")
    size, B = 16, 2
    m = ring.nmoduli
    x = np.stack([rand_residues(ring, rng).reshape(m, size, size)
                  for _ in range(B)])
    kw = {}
    if twiddle:
        tw = np.empty((m, size, size), dtype=ring.dtype)
        tws = np.empty((m, size, size), dtype=ring.dtype)
        for cm in range(m):
            p = int(ring.moduli[cm])
            t = rng.integers(0, p, size=(size, size)).astype(np.uint64)
            tw[cm] = t
            tws[cm] = _np_shoup_vec(t.reshape(-1), p, 64).reshape(size, size)
        kw["twiddle"] = (tw, tws)
    want = np.asarray(dft_mxu.matmul_mod(x, ring, "dft_fwd", size,
                                         axis=axis, interpret=True,
                                         pipelined=False, **kw))
    got = np.asarray(dft_mxu.matmul_mod(x, ring, "dft_fwd", size,
                                        axis=axis, interpret=True,
                                        pipelined=True, **kw))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_dft_mxu_pipelined_block_transitions(rng):
    """The pipelined kernel at a geometry with REAL block structure
    (size=512: nob=4, nrb=2 under _row_block_pipe) — covers the flattened
    _dside/_eside decomposition across ob/rb boundaries, the fill/drain
    clamps, and the dig-cache invalidation at each new ob, which the
    size-16 case (nob=nrb=1) cannot reach."""
    from nfllib_tpu.ops import dft_mxu

    ring = nfl.ring_from_modulus("u64", 512, 124)
    m = ring.nmoduli
    x = np.empty((1, m, 512, 512), dtype=np.uint64)
    for cm in range(m):
        x[:, cm] = rng.integers(0, int(ring.moduli[cm]), (1, 512, 512),
                                dtype=np.uint64)
    from nfllib_tpu.ops.dft_mxu import _other_block_grid, _row_block_pipe
    oblk, nob = _other_block_grid("u64", 512, 512)
    rblk, nrb = _row_block_pipe(512, oblk)
    assert nob > 1 and nrb > 1, (nob, nrb)   # the geometry under test
    want = np.asarray(dft_mxu.matmul_mod(x, ring, "dft_fwd", 512, axis=-2,
                                         interpret=True, pipelined=False))
    got = np.asarray(dft_mxu.matmul_mod(x, ring, "dft_fwd", 512, axis=-2,
                                        interpret=True, pipelined=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("degree,agg,limb,ndev", [
    (1024, 60, "u32", 4),
    (256, 124, "u64", 2),
    (4096, 124, "u64", 8),
])
def test_ppermute_transpose_variant(degree, agg, limb, ndev, rng):
    """transpose="ppermute" (the variant whose collectives XLA async-ifies
    on real TPUs — tools/check_overlap.py) is bit-identical to the
    all-to-all path, forward and inverse."""
    ring = make_ring(degree, agg, limb)
    mesh = _mesh((ndev,), ("deg",))
    x = rand_residues(ring, rng)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "deg")))
    want = np.asarray(ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh))
    y = ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh,
                                         transpose="ppermute")
    np.testing.assert_array_equal(np.asarray(y), want)
    back = np.asarray(ntt_dist.distributed_invntt_pow_invphi(
        y, ring, mesh, transpose="ppermute"))
    np.testing.assert_array_equal(back, x)
    # the transform's transpose really became ppermutes: vs the a2a path
    # the program drops exactly the one transform all-to-all (any input
    # RESHARDING all-to-all at the jit boundary appears in both) and gains
    # the d-1 collective-permutes
    def a2a_count(hlo):
        return hlo.count(" all-to-all(") + hlo.count("all-to-all-start(")

    with mesh:
        base = jax.jit(lambda v: ntt_dist.distributed_ntt_pow_phi(
            v, ring, mesh)).lower(xd).compile().as_text()
        hlo = jax.jit(lambda v: ntt_dist.distributed_ntt_pow_phi(
            v, ring, mesh, transpose="ppermute")).lower(
                xd).compile().as_text()
    assert a2a_count(hlo) == a2a_count(base) - 1
    assert hlo.count("collective-permute") >= ndev - 1


@pytest.mark.parametrize("degree,agg,limb,ndev,B", [
    (1024, 60, "u32", 4, 3),
    (256, 124, "u64", 2, 4),
])
def test_batch_pipelined_matches_per_element(degree, agg, limb, ndev, B,
                                             rng):
    """distributed_ntt_pow_phi_pipelined (throughput mode: unrolled batch
    loop in ONE program, ppermute transposes the TPU scheduler can overlap
    across batch elements — round-4 VERDICT item 4) is bit-identical per
    element to the latency-mode path, and its compiled program carries one
    ppermute pipeline per batch element with no transform all-to-all."""
    ring = make_ring(degree, agg, limb)
    mesh = _mesh((ndev,), ("deg",))
    xs = np.stack([rand_residues(ring, rng) for _ in range(B)])
    xd = jax.device_put(jnp.asarray(xs),
                        NamedSharding(mesh, P(None, None, "deg")))
    got = np.asarray(ntt_dist.distributed_ntt_pow_phi_pipelined(
        xd, ring, mesh))
    for b in range(B):
        xb = jax.device_put(jnp.asarray(xs[b]),
                            NamedSharding(mesh, P(None, "deg")))
        want = np.asarray(ntt_dist.distributed_ntt_pow_phi(
            xb, ring, mesh, transpose="ppermute"))
        np.testing.assert_array_equal(got[b], want)
    with mesh:
        hlo = jax.jit(lambda v: ntt_dist.distributed_ntt_pow_phi_pipelined(
            v, ring, mesh)).lower(xd).compile().as_text()
    # no TRANSFORM all-to-all (at most one boundary-resharding a2a from the
    # input/output spec change, as in test_ppermute_transpose_variant)
    assert hlo.count(" all-to-all(") + hlo.count("all-to-all-start(") <= 1
    assert hlo.count("collective-permute") >= B * (ndev - 1)


def test_auto_dispatch_honors_mesh_platform(monkeypatch):
    """A CPU mesh in a process whose DEFAULT backend is TPU (the axon
    environment: sitecustomize force-selects the tunnel backend) must
    still resolve 'auto' to a2a and must NOT route the local sub-DFTs to
    compiled Mosaic kernels (they cannot lower for CPU devices)."""
    ring = make_ring(1024, 60, "u32")
    mesh = _mesh((4,), ("deg",))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("NFL_TPU_NTT", raising=False)
    assert ntt_dist._resolve_transpose("auto", 1, mesh) == "a2a"
    assert ntt_dist._resolved_backends(ring, 32, 32, mesh) == (False, False)
    # explicit NFL_TPU_NTT=mxu still forces the kernels (tests/dryrun)
    monkeypatch.setenv("NFL_TPU_NTT", "mxu")
    assert ntt_dist._resolved_backends(ring, 32, 32, mesh) == (True, True)
    # typos in transpose are rejected loudly instead of falling into a2a
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ntt_dist._resolve_transpose("ppermut")
