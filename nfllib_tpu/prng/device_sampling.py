"""On-device polynomial samplers (jit-able, TPU-resident).

Device tier of the sampling subsystem (reference include/nfl/core.hpp:145-391
semantics): the Salsa20 keystream is generated on the accelerator
(salsa20.device_stream_words) and consumed entirely in-graph, so sampling
fuses with downstream NTT/modops without host transfers.

Byte-consumption contracts:
  * uniform / non_uniform / ZO reproduce the host tier EXACTLY for the same
    (key, nonce): same stream layout, same masking quirks, same values.
  * gaussian uses the fixed-consumption branchless formulation (every sample
    eats word_precision big-endian words; output = base + #{barriers <= r},
    see prng/gaussian.py) — equal in DISTRIBUTION to the host walk, but a
    different stream-consumption pattern, so the same (key, nonce) yields
    different (equally distributed) values than the host tier.  hwt_dist is
    host-only: exact reservoir sampling is inherently sequential
    (core.hpp:352-391).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ring import Ring
from .salsa20 import device_stream_words
from .sampling import ZO_dist, gaussian, non_uniform, uniform


def _stream_bytes(key: bytes, nonce: int, nbytes: int):
    """[nbytes] uint8 keystream on device (little-endian word serialization,
    identical bytes to Salsa20Stream.randombytes)."""
    nblocks = (nbytes + 63) // 64
    words = device_stream_words(key, nonce, nblocks).reshape(-1)
    b0 = (words & 0xFF).astype(jnp.uint8)
    b1 = ((words >> 8) & 0xFF).astype(jnp.uint8)
    b2 = ((words >> 16) & 0xFF).astype(jnp.uint8)
    b3 = (words >> 24).astype(jnp.uint8)
    return jnp.stack([b0, b1, b2, b3], axis=-1).reshape(-1)[:nbytes]


def _stream_limbs(key: bytes, nonce: int, count: int, itemsize: int):
    """[count] little-endian unsigned integers of `itemsize` bytes."""
    nbytes = count * itemsize
    nblocks = (nbytes + 63) // 64
    words32 = device_stream_words(key, nonce, nblocks).reshape(-1)
    if itemsize == 2:
        lo = (words32 & 0xFFFF).astype(jnp.uint16)
        hi = (words32 >> 16).astype(jnp.uint16)
        return jnp.stack([lo, hi], axis=-1).reshape(-1)[:count]
    if itemsize == 4:
        return words32[:count]
    w = words32.astype(jnp.uint64)
    return (w[0::2] | (w[1::2] << 32))[:count]


def device_uniform(ring: Ring, key: bytes, nonce: int):
    """Uniform residues, bit-identical to sampling.sample_uniform
    (mask + single conditional subtract, core.hpp:151-186)."""
    lp = ring.limb_params
    total = ring.nmoduli * ring.degree
    vals = _stream_limbs(key, nonce, total, lp.itemsize)
    vals = vals.reshape(ring.nmoduli, ring.degree)
    mask = jnp.asarray((1 << lp.modulus_bits) - 1, dtype=lp.dtype)
    p_col = jnp.asarray(np.array(ring.moduli, dtype=lp.dtype).reshape(-1, 1))
    t = vals & mask
    return jnp.where(t >= p_col, t - p_col, t)


def device_non_uniform(ring: Ring, key: bytes, nonce: int, mode: non_uniform):
    """Bounded centered noise, bit-identical to sampling.sample_non_uniform
    (core.hpp:194-282: wrapping value_type arithmetic, negatives as p + v)."""
    lp = ring.limb_params
    ub = int(mode.upper_bound)
    amp = int(mode.amplifier)
    for p in ring.moduli:
        if ub >= p:
            raise ValueError("upper_bound is larger than the modulus")
    rnd = _stream_limbs(key, nonce, ring.degree, lp.itemsize)
    span = 2 * ub - 1
    mask = jnp.asarray((1 << span.bit_length()) - 1, dtype=lp.dtype)
    t = (rnd & mask).astype(jnp.uint64)
    t = jnp.where(t >= span, t - span, t)
    neg = t >= ub
    p_col = jnp.asarray(np.array([int(p) for p in ring.moduli],
                                 dtype=np.uint64).reshape(-1, 1))
    vals = jnp.where(neg[None, :], p_col + t[None, :] * amp - span * amp,
                     t[None, :] * amp)
    repr_mask = jnp.asarray((1 << lp.repr_bits) - 1, dtype=jnp.uint64)
    return (vals & repr_mask).astype(lp.dtype)


def device_zo(ring: Ring, key: bytes, nonce: int, mode: ZO_dist):
    """Ternary sampler, bit-identical to sampling.sample_zo including the
    non-canonical p+1 encoding of +1 (core.hpp:333-344)."""
    lp = ring.limb_params
    rnd = _stream_bytes(key, nonce, ring.degree)
    hit = rnd <= jnp.uint8(mode.rho)
    bit = (rnd & 2).astype(jnp.uint64)
    p_col = jnp.asarray(np.array([int(p) - 1 for p in ring.moduli],
                                 dtype=np.uint64).reshape(-1, 1))
    vals = jnp.where(hit[None, :], p_col + bit[None, :],
                     jnp.zeros_like(p_col))
    mask = jnp.asarray((1 << lp.repr_bits) - 1, dtype=jnp.uint64)
    return (vals & mask).astype(lp.dtype)


def device_gaussian(ring: Ring, key: bytes, nonce: int, mode: gaussian):
    """Fixed-consumption discrete Gaussian: degree * word_precision big-endian
    stream words per call; output = base_value + #{barriers <= r}, encoded
    per channel as p + v for negative v (core.hpp:306-316).

    #{barriers <= r} is computed searchsorted-style: the barriers are sorted
    (cumulative CDF values), so a branchless per-sample binary search needs
    only ceil(log2(nb+1)) gathered wp-word lexicographic compares —
    O(wp*log nb) per sample instead of the dense O(wp*nb), so cost grows
    logarithmically with sigma (nb ~ 2*ceil(t*sigma)) instead of linearly.
    (A 16-bit prefix table was tried and rejected: tail barriers cluster
    within 2^-16 of 0 and 1, so prefixes collide en masse.)"""
    fg = mode.fg_prng
    amp = int(mode.amplifier)
    wp = fg.word_precision
    n = ring.degree
    if fg.in_bits == 8:
        raw = _stream_bytes(key, nonce, n * wp).reshape(n, wp)
    else:  # in_bits == 16: little-endian 16-bit stream limbs per word
        raw = _stream_limbs(key, nonce, n * wp, 2).reshape(n, wp)

    bw = np.asarray(fg.barrier_words)                      # [nb, wp]
    nb = bw.shape[0]
    r16 = raw.astype(jnp.int32)                            # [n, wp]
    bw_dev = jnp.asarray(bw.astype(np.int32))              # [nb, wp]

    # invariants: barriers[:lo] <= r, barriers[hi:] > r; count = final lo
    lo = jnp.zeros((n,), dtype=jnp.int32)
    hi = jnp.full((n,), nb, dtype=jnp.int32)
    for _ in range(max(1, (nb + 1).bit_length())):
        valid = lo < hi
        mid = (lo + hi) >> 1
        rows = jnp.take(bw_dev, mid, axis=0)               # [n, wp]
        # sign of (r - barrier[mid]) at the first differing word
        acc = jnp.zeros((n,), dtype=jnp.int8)
        for j in range(wp):
            s = jnp.sign(r16[:, j] - rows[:, j]).astype(jnp.int8)
            acc = jnp.where(acc != 0, acc, s)
        le = acc >= 0                                      # barrier[mid] <= r
        lo = jnp.where(valid & le, mid + 1, lo)
        hi = jnp.where(valid & ~le, mid, hi)
    noise = (fg.base_value + lo).astype(jnp.int64) * amp

    p_col = jnp.asarray(np.array([int(p) for p in ring.moduli],
                                 dtype=np.int64).reshape(-1, 1))
    vals = jnp.where(noise[None, :] < 0, p_col + noise[None, :],
                     noise[None, :])
    return vals.astype(ring.dtype)


def device_sample(ring: Ring, mode, key: bytes, nonce: int):
    """Dispatcher mirroring sampling.sample for the device tier."""
    if isinstance(mode, uniform):
        return device_uniform(ring, key, nonce)
    if isinstance(mode, non_uniform):
        return device_non_uniform(ring, key, nonce, mode)
    if isinstance(mode, ZO_dist):
        return device_zo(ring, key, nonce, mode)
    if isinstance(mode, gaussian):
        return device_gaussian(ring, key, nonce, mode)
    raise TypeError(f"no device tier for sampler mode {mode!r} "
                    "(hwt_dist is host-only)")
