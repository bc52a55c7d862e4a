"""The BASELINE 'on-device PRNG + samplers + serialization round-trip' config
point: polynomials sampled entirely on device, serialized in the
NFLlib-compatible byte format, deserialized, and matched against the host
tier."""
import numpy as np

import nfllib_tpu as nfl
from nfllib_tpu.serialize import deserialize_poly, serialize_poly
from nfllib_tpu.prng.salsa20 import Salsa20Stream

from conftest import make_ring

KEY = b"\x61" * 32


def test_ondevice_sample_serialize_roundtrip():
    ring = make_ring(512, 90, "u32")
    for nonce, mode in [(1, nfl.uniform()), (2, nfl.non_uniform(9, 2)),
                        (3, nfl.ZO_dist())]:
        p = nfl.Poly.sample_on_device(ring, mode, KEY, nonce)
        buf = serialize_poly(p)
        assert len(buf) == ring.nmoduli * ring.degree * 4
        q = deserialize_poly(ring, buf)
        assert p == q
        # and identical to the host tier from the same stream position
        h = nfl.Poly.sample(ring, mode, Salsa20Stream(KEY, nonce=nonce))
        assert q == h


def test_batched_serialize_roundtrip():
    import jax.numpy as jnp
    ring = make_ring(256, 60, "u32")
    s = Salsa20Stream(KEY)
    polys = [nfl.Poly.sample(ring, nfl.uniform(), s) for _ in range(3)]
    batch = nfl.Poly(jnp.stack([p.data for p in polys]), ring)
    buf = serialize_poly(batch)
    assert buf == b"".join(serialize_poly(p) for p in polys)
    back = deserialize_poly(ring, buf, batch=(3,))
    assert back == batch
