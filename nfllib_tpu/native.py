"""ctypes loader for the native host runtime (csrc/nfl_native.cpp).

The TPU framework's equivalent slot for the reference's native PRNG layer
(the qhasm Salsa20 assembly at lib/prng/*.s + fastrandombytes.cpp).  The
library is built on demand with the system C++ compiler and cached next to
the source; everything degrades gracefully to the numpy tier when no
compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "csrc", "nfl_native.cpp")
_SO = os.path.join(_ROOT, "csrc", "libnfl_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-fPIC", "-shared", "-std=c++17",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("NFL_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.nfl_salsa20_stream.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p,
            ctypes.c_char_p]
        lib.nfl_fastrandombytes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
        for suffix in ("u16", "u32", "u64"):
            fn = getattr(lib, f"nfl_uniform_{suffix}")
            fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def salsa20_stream(nbytes: int, nonce: bytes, key: bytes) -> bytes:
    lib = get_lib()
    assert lib is not None
    out = ctypes.create_string_buffer(nbytes)
    lib.nfl_salsa20_stream(out, nbytes, nonce, key)
    return out.raw


def make_state(key: bytes, nonce: int) -> np.ndarray:
    """40-byte fastrandombytes state: key || little-endian nonce."""
    state = np.frombuffer(
        key + int(nonce).to_bytes(8, "little"), dtype=np.uint8).copy()
    return state


def state_nonce(state: np.ndarray) -> int:
    return int.from_bytes(state[32:].tobytes(), "little")


def fastrandombytes(state: np.ndarray, nbytes: int) -> bytes:
    lib = get_lib()
    assert lib is not None
    out = np.empty(nbytes, dtype=np.uint8)
    lib.nfl_fastrandombytes(state.ctypes.data, out.ctypes.data, nbytes)
    return out.tobytes()


def uniform(state: np.ndarray, moduli: np.ndarray, degree: int,
            modulus_bits: int) -> np.ndarray:
    """Native uniform residue sampling (mask + one conditional subtract)."""
    lib = get_lib()
    assert lib is not None
    dt = moduli.dtype
    suffix = {2: "u16", 4: "u32", 8: "u64"}[dt.itemsize]
    m = len(moduli)
    data = np.empty((m, degree), dtype=dt)
    mask = (1 << modulus_bits) - 1
    getattr(lib, f"nfl_uniform_{suffix}")(
        state.ctypes.data, data.ctypes.data,
        np.ascontiguousarray(moduli).ctypes.data, m, degree, mask)
    return data
