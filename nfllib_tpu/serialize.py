"""NFLlib-compatible serialization (reference include/nfl/poly.hpp:178-191).

The reference's manual serializer writes the raw residue array — moduli-major,
little-endian limbs, N = nmoduli*degree words (poly.hpp:180-185) — and its
cereal binary archive of the same C array produces the identical byte string.
Both map onto this one format.  Like the reference, the format is
little-endian-only by design (poly.hpp:170-176).

Batched polys serialize as the concatenation of each batch element's bytes.
"""
from __future__ import annotations

import numpy as np

from .poly import Poly
from .ring import Ring


def serialize_poly(p: Poly) -> bytes:
    arr = np.asarray(p.data)
    return arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes()


def deserialize_poly(ring: Ring, buf: bytes, batch=()) -> Poly:
    import jax.numpy as jnp
    shape = tuple(batch) + ring.shape
    count = int(np.prod(shape))
    dt = np.dtype(ring.dtype).newbyteorder("<")
    arr = np.frombuffer(buf, dtype=dt, count=count).astype(ring.dtype)
    return Poly(jnp.asarray(arr.reshape(shape)), ring)
