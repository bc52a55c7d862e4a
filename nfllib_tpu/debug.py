"""Strict-mod debug checks (reference include/nfl/debug.hpp).

The reference's CHECK_STRICTMOD compiles range-contract assertions into every
modular op (debug.hpp:33-37, ops.hpp:131,148,190,211 ...).  The TPU-native
equivalent is a global flag that inserts jax.debug (host-callback) or eager
assertions validating residues < p at op boundaries.  NTT_STRICTMOD (the final
reduction to [0, p), debug.hpp:31) is always on, as in the reference.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_STRICT = os.environ.get("NFL_TPU_STRICTMOD", "0") not in ("0", "", "false")


def set_strictmod(enabled: bool) -> None:
    global _STRICT
    _STRICT = bool(enabled)


def strictmod_enabled() -> bool:
    return _STRICT


def check_residues(data, p_col) -> None:
    """Assert all residues < p (per channel).  No-op unless strict mode."""
    if not _STRICT:
        return
    ok = jnp.all(data < p_col)
    if isinstance(ok, jax.core.Tracer):
        def _raise(ok_val):
            if not ok_val:
                raise AssertionError("STRICTMOD: residue out of [0, p) range")
        jax.debug.callback(_raise, ok)
    else:
        if not bool(ok):
            raise AssertionError("STRICTMOD: residue out of [0, p) range")
