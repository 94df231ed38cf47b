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


def test_perf_artifacts_committed():
    """Commit-or-it-didn't-happen (VERDICT r03 #7): when an on-chip
    measurement tool exists, its latest output must be committed at the
    repo root — r03's measurements lived only in /tmp and were lost.
    Enforced from round 4 on (the tools predate the contract)."""
    if _latest("BENCH_r04.json") is None:
        pytest.skip("round 4 bench not recorded yet (fresh clone/branch)")
    # (pattern, tool, key that must be present and non-trivial): an
    # artifact committed as an empty/placeholder file must FAIL, not pass
    # on mere existence (VERDICT r04 Weak #5 — a 0-byte EVENTS_r04.json
    # satisfied the old existence-only check).
    for pattern, tool, key in [
            ("SWEEP_r*.json", "tools/sweep_grad.sh", "best"),
            ("BISECT_r0[4-9]*.json", "tools/bisect_body.py", "sanity_ok"),
            ("EVENTS_r*.json", "tools/profile_events.py",
             "event_overhead_frac")]:
        if not os.path.exists(os.path.join(ROOT, tool)):
            continue
        path = _latest(pattern)
        assert path is not None, (
            f"{tool} exists but no committed {pattern} artifact")
        with open(path) as f:
            d = json.load(f)   # raises on empty/truncated commits
        assert d and d.get(key) is not None, (
            f"{os.path.basename(path)} is missing {key!r} — committed "
            f"without the measurement?")


def test_event_overhead_bar():
    """From round 5 on, the amortized reduction-event overhead must stay
    within 15% of total step time at bench scale (VERDICT r04 #1: events
    measured at 3.46x the steps in round 4)."""
    path = _latest("EVENTS_r0[5-9]*.json")
    if path is None:
        pytest.skip("no committed r05+ events artifact yet")
    with open(path) as f:
        d = json.load(f)
    frac = d.get("event_overhead_frac")
    assert frac is not None and frac <= 0.15, (
        f"{os.path.basename(path)}: event_overhead_frac={frac} "
        f"exceeds the 0.15 bar")


def test_bisect_artifact_sane():
    """The bisect artifact must carry its own internal-consistency flag
    (r03 emitted a 0.047 ms 'full body' — 1500x impossible — silently)."""
    path = _latest("BISECT_r0[4-9]*.json")
    if path is None:
        pytest.skip("no committed r04+ bisect artifact")
    with open(path) as f:
        d = json.load(f)
    assert d.get("sanity_ok") is True, d.get("sanity_errors")
