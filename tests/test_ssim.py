"""SSIM: both blur backends must agree with a direct numpy convolution and
with each other (the banded-matmul form is algebraically the zero-padded
'same' separable convolution; vanilla 3DGS uses conv2d with padding=w//2 and
no border renormalization)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reduced_3dgs_tpu.ops import ssim as ssim_mod
from reduced_3dgs_tpu.ops.ssim import ssim, _gaussian_window_np


def _np_blur(x, taps):
    """Direct zero-padded separable convolution, last two axes."""
    pad = len(taps) // 2
    out = np.zeros_like(x)
    xp = np.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (0, 0)])
    for i, t in enumerate(taps):
        out += t * xp[..., i:i + x.shape[-2], :]
    out2 = np.zeros_like(out)
    xp = np.pad(out, [(0, 0)] * (x.ndim - 2) + [(0, 0), (pad, pad)])
    for i, t in enumerate(taps):
        out2 += t * xp[..., :, i:i + x.shape[-1]]
    return out2


@pytest.mark.parametrize("mode", ["matmul", "shift"])
def test_blur_matches_numpy(mode, monkeypatch):
    monkeypatch.setenv("R3DGS_SSIM", mode)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 3, 37, 53)).astype(np.float32)
    taps = _gaussian_window_np(11, 1.5)
    got = np.asarray(ssim_mod._blur(jnp.asarray(x), 11, 1.5))
    np.testing.assert_allclose(got, _np_blur(x, taps), atol=2e-6)


def test_modes_agree_and_ssim_sane(monkeypatch):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(3, 40, 56)).astype(np.float32))
    b = jnp.clip(a + 0.05 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    vals = {}
    for mode in ["matmul", "shift"]:
        monkeypatch.setenv("R3DGS_SSIM", mode)
        vals[mode] = float(ssim(a, b))
        assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    assert vals["matmul"] == pytest.approx(vals["shift"], abs=1e-5)
    assert 0.0 < vals["matmul"] < 1.0
    # gradients agree across modes too
    grads = {}
    for mode in ["matmul", "shift"]:
        monkeypatch.setenv("R3DGS_SSIM", mode)
        grads[mode] = np.asarray(jax.grad(lambda x: ssim(x, b))(a))
    np.testing.assert_allclose(grads["matmul"], grads["shift"],
                               atol=1e-5, rtol=1e-3)
