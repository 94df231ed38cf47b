"""Committed measurement artifacts must be green (VERDICT r02 #6).

A failing numerics/convergence gate must turn CI red, not ship silently:
these tests read the latest committed round artifacts and assert their
embedded pass flags. They skip only when the artifact doesn't exist yet
(e.g. first round on a fresh clone).
"""
import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest(pattern):
    files = sorted(glob.glob(os.path.join(ROOT, pattern)))
    return files[-1] if files else None


def test_bench_parity_green():
    path = _latest("BENCH_r*.json")
    if path is None:
        pytest.skip("no committed bench artifact")
    with open(path) as f:
        d = json.load(f)
    d = d.get("parsed", d)
    if d.get("parity_ok") is None:
        pytest.skip("bench ran without the parity gate")
    # Round 2's artifact predates the fixed (non-degenerate) gate; enforce
    # from round 3 on.
    if os.path.basename(path) <= "BENCH_r02.json":
        pytest.skip("pre-r03 artifact (degenerate gate, VERDICT r02 Weak #2)")
    assert d["parity_ok"] is True, (
        f"{os.path.basename(path)} shipped with a failing on-chip "
        f"numerics gate: {d.get('detail', {}).get('parity')}")


def test_convergence_bars_green():
    path = _latest("CONVERGENCE_r*.json")
    if path is None:
        pytest.skip("no committed convergence artifact")
    with open(path) as f:
        d = json.load(f)
    if d.get("bars_ok") is None:
        pytest.skip("smoke-preset artifact (no bars)")
    assert d["bars_ok"] is True, (
        f"{os.path.basename(path)} bars: {d.get('bars')} vs "
        f"final {d.get('final')}")


def test_multichip_dryrun_green():
    path = _latest("MULTICHIP_r*.json")
    if path is None:
        pytest.skip("no committed multichip artifact")
    with open(path) as f:
        d = json.load(f)
    assert d.get("ok", d.get("parsed", {}).get("ok")) is True
