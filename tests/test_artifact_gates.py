"""Checked-in evidence artifacts must not record failing gates.

Round-4 VERDICT item 8 / weak #1: the final round-4 commit refreshed
SCALING.json with `target_8chips_2hosts_ge_085: false` and nobody noticed
— the docs kept claiming the gate passed.  This test makes the suite go
red the moment a failing gate (or a skipped dryrun) is checked in, so the
artifact and the documentation cannot diverge silently again.
"""
import json
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

CASES = [
    ("SCALING.json", "target_8chips_2hosts_ge_085"),
    ("OVERLAP.json", "ok"),
    ("ONCHIP_CHECK.json", "ok"),
    ("MULTIPROC.json", "ok"),
    ("U64LARGE.json", "ok"),
]


@pytest.mark.parametrize("fname,key", CASES)
def test_artifact_gate_true(fname, key):
    path = ROOT / fname
    if not path.exists():
        pytest.skip(f"{fname} not present")
    d = json.loads(path.read_text())
    assert d.get(key) is True, (
        f"{fname}: '{key}' is not true — a FAILING gate is checked in; "
        "either fix the regression or document the failure loudly")


def test_multichip_artifacts_ok():
    found = sorted(ROOT.glob("MULTICHIP_r*.json"))
    if not found:
        pytest.skip("no MULTICHIP artifacts")
    for f in found:
        d = json.loads(f.read_text())
        assert d.get("ok") is True and d.get("skipped") is False, f.name


def test_scaling_inputs_are_paired():
    """The scaling model must be fed paired-protocol inputs (round-4 weak
    #2: one unpaired read flapped the gate across regimes)."""
    path = ROOT / "SCALING.json"
    if not path.exists():
        pytest.skip("SCALING.json not present")
    d = json.loads(path.read_text())
    assert "paired" in d.get("input_protocol", ""), (
        "SCALING.json was generated from unpaired inputs")
