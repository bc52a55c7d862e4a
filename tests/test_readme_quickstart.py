"""The README quickstart must run verbatim — it is the first thing a user
migrating from the reference tries (reference analog: the demo main at
tests/nfllib_demo_main_op.cpp being a compiled test).

The snippet is EXTRACTED from README.md rather than duplicated, so editing
the README without keeping it runnable turns the suite red.
"""
import pathlib
import re

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _quickstart_block() -> str:
    text = (ROOT / "README.md").read_text()
    m = re.search(r"## Quick start\n+```python\n(.*?)```", text, re.S)
    assert m, "README.md lost its Quick start python block"
    return m.group(1)


def test_readme_quickstart_runs_and_is_consistent():
    ns: dict = {}
    exec(compile(_quickstart_block(), "README.md:quickstart", "exec"), ns)

    import nfllib_tpu as nfl

    a, b, c = ns["a"], ns["b"], ns["c"]
    fa, fb = ns["fa"], ns["fb"]

    # the fused shoup(fa*fb) path must equal the plain mulmod path end to
    # end (negacyclic correctness of NTT-domain pointwise products is
    # oracle-tested in test_ntt.py / test_lwe.py)
    c_plain = fa.mulmod(fb).invntt_pow_invphi()
    np.testing.assert_array_equal(np.asarray(c.data),
                                  np.asarray(c_plain.data))

    # transform roundtrip on the snippet's own values
    np.testing.assert_array_equal(
        np.asarray(fa.invntt_pow_invphi().data), np.asarray(a.data))
    np.testing.assert_array_equal(
        np.asarray(fb.invntt_pow_invphi().data), np.asarray(b.data))

    batch = ns["batch"]
    assert isinstance(batch, nfl.Poly)
    assert batch.data.shape == (64,) + a.data.shape
