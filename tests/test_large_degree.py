"""Large-degree configs (slow marker): the reference's top config points and
the BASELINE multi-host n=2^20 target, exercised on the virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import nfllib_tpu as nfl
from nfllib_tpu.ops import ntt as ntt_jnp
from nfllib_tpu.parallel import ntt_dist

from conftest import rand_residues

pytestmark = pytest.mark.slow


def test_n2pow20_distributed_roundtrip(rng):
    """n = 2^20 (the u64 tier's kMaxPolyDegree, reference params.hpp:115),
    degree-sharded over 8 devices — the BASELINE multi-host config point."""
    ring = nfl.Ring("u64", 1 << 20, 1)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]).reshape(8), ("deg",))
    x = rand_residues(ring, rng)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "deg")))
    y = ntt_dist.distributed_ntt_pow_phi(xd, ring, mesh)
    back = np.asarray(ntt_dist.distributed_invntt_pow_invphi(y, ring, mesh))
    np.testing.assert_array_equal(back, x)


def test_n32768_u64_matches_reference_path(rng):
    """The reference's largest CI config (32768, 124, u64)."""
    ring = nfl.ring_from_modulus("u64", 32768, 124)
    ctx = ring.context()
    x = rand_residues(ring, rng)
    f = ntt_jnp.ntt_pow_phi(x, ctx)
    back = np.asarray(ntt_jnp.invntt_pow_invphi(f, ctx))
    np.testing.assert_array_equal(back, x)
