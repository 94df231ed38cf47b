"""LPIPS metric: availability gating + network forward with synthetic weights.

The real AlexNet weights cannot be downloaded in this environment (the
reference fetches them at runtime, lpipsPyTorch/modules/utils.py:11-20);
tools/export_lpips_weights.py produces them where network exists. These
tests cover both states: weightless (graceful degradation) and weighted
(the JAX network runs and behaves like a distance).
"""
import numpy as np
import pytest

import importlib

L = importlib.import_module("reduced_3dgs_tpu.metrics.lpips")


def _synthetic_weights(rng):
    """Random-but-fixed weights with the exact npz layout of the exporter."""
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(L._ALEX):
        params[f"conv{i}/w"] = rng.normal(
            0, 0.05, (out_ch, in_ch, k, k)).astype(np.float32)
        params[f"conv{i}/b"] = np.zeros((out_ch,), np.float32)
        params[f"lin{i}/w"] = rng.random(out_ch).astype(np.float32)
        in_ch = out_ch
    return params


def test_unavailable_without_weights(tmp_path, monkeypatch):
    monkeypatch.setenv("R3DGS_LPIPS_WEIGHTS", str(tmp_path / "missing.npz"))
    L._load_weights_np.cache_clear()
    assert not L.lpips_available()
    with pytest.raises(RuntimeError, match="weights not found"):
        L.lpips(np.zeros((3, 32, 32), np.float32),
                np.zeros((3, 32, 32), np.float32))


def test_available_via_npz(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    params = _synthetic_weights(rng)
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **params)
    monkeypatch.setenv("R3DGS_LPIPS_WEIGHTS", str(path))
    L._load_weights_np.cache_clear()
    try:
        assert L.lpips_available()
        a = rng.random((3, 64, 64)).astype(np.float32)
        b = rng.random((3, 64, 64)).astype(np.float32)
        d_ab = float(L.lpips(a, b))
        d_aa = float(L.lpips(a, a))
        assert np.isfinite(d_ab) and d_ab > 0
        assert abs(d_aa) < 1e-6          # identical images -> zero distance
        assert d_ab > d_aa
    finally:
        L._load_weights_np.cache_clear()


def test_render_dataset_reports_lpips_when_available(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    np.savez(tmp_path / "w.npz", **_synthetic_weights(rng))
    monkeypatch.setenv("R3DGS_LPIPS_WEIGHTS", str(tmp_path / "w.npz"))
    L._load_weights_np.cache_clear()
    try:
        from reduced_3dgs_tpu.render import render_dataset
        from .test_trainer import _toy_scene
        model, ds = _toy_scene(n=16, hw=32, n_cams=1)
        metrics = render_dataset(model, [ds[0]], str(tmp_path / "out"),
                                 save_images=False)
        assert "lpips" in metrics[0]
        assert np.isfinite(metrics[0]["lpips"])
    finally:
        L._load_weights_np.cache_clear()
