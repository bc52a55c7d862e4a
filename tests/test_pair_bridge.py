"""ops/pair_bridge.py — pair-native u64 Shoup multiply bit-equality."""
import numpy as np
import jax.numpy as jnp
import pytest

import nfllib_tpu as nfl
from nfllib_tpu.ops import modops, pair_bridge

from conftest import make_ring


@pytest.mark.parametrize("R,C,B", [(8, 128, 1), (16, 256, 3), (64, 128, 1)])
def test_pair_bridge_matches_modops(R, C, B, rng):
    ring = make_ring(1024, 124, "u64")
    m = ring.nmoduli
    shape = (B, m, R, C) if B > 1 else (m, R, C)
    x = np.empty(shape, dtype=np.uint64)
    tw = np.empty((m, R, C), dtype=np.uint64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        x[..., cm, :, :] = rng.integers(0, p, shape[:-3] + (R, C))
        tw[cm] = rng.integers(0, p, (R, C))
    tws = np.empty_like(tw)
    for cm in range(m):
        p = int(ring.moduli[cm])
        tws[cm] = np.array(
            [(int(v) << 64) // p for v in tw[cm].reshape(-1)],
            dtype=object).astype(np.uint64).reshape(R, C)
    p3 = jnp.asarray(ring.context().p_col)[..., None]
    want = np.asarray(modops.mulmod_shoup(
        jnp.asarray(x), jnp.asarray(tw), jnp.asarray(tws), p3))
    got = np.asarray(pair_bridge.mulmod_shoup_u64(
        x, tw, tws, ring, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pair_io_matmul_chain_matches_u64(rng):
    """matmul_mod pair_out -> pair bridge -> matmul_mod pair_in equals the
    all-u64 chain (the large-degree path's new plumbing, at a small
    degree so the whole chain runs in interpret mode quickly)."""
    from nfllib_tpu.ops import dft_mxu
    ring = make_ring(16384, 124, "u64")
    m = ring.nmoduli
    n1, n2 = 128, 128
    x = np.empty((m, n1, n2), dtype=np.uint64)
    tw = np.empty((m, n1, n2), dtype=np.uint64)
    for cm in range(m):
        p = int(ring.moduli[cm])
        x[cm] = rng.integers(0, p, (n1, n2))
        tw[cm] = rng.integers(0, p, (n1, n2))
    tws = np.empty_like(tw)
    for cm in range(m):
        p = int(ring.moduli[cm])
        tws[cm] = np.array(
            [(int(v) << 64) // p for v in tw[cm].reshape(-1)],
            dtype=object).astype(np.uint64).reshape(n1, n2)
    p3 = jnp.asarray(ring.context().p_col)[..., None]

    f64 = dft_mxu.matmul_mod(x, ring, "dft_fwd", n1, axis=-2,
                             interpret=True)
    f64 = modops.mulmod_shoup(f64, jnp.asarray(tw), jnp.asarray(tws), p3)
    want = np.asarray(dft_mxu.matmul_mod(f64, ring, "dft_fwd", n2,
                                         axis=-1, interpret=True))

    fp = dft_mxu.matmul_mod(x, ring, "dft_fwd", n1, axis=-2,
                            interpret=True, pair_out=True)
    twp = ((tw >> np.uint64(32)).astype(np.uint32),
           tw.astype(np.uint32))
    twsp = ((tws >> np.uint64(32)).astype(np.uint32),
            tws.astype(np.uint32))
    fp = pair_bridge.mulmod_shoup_pairs(fp, twp, twsp, ring,
                                        interpret=True)
    got = np.asarray(dft_mxu.matmul_mod(fp, ring, "dft_fwd", n2, axis=-1,
                                        interpret=True))
    np.testing.assert_array_equal(got, want)
