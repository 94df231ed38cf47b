"""LPIPS perceptual metric (eval-only), JAX implementation.

Equivalent of the reference's lpipsPyTorch/ (AlexNet/VGG16 feature LPIPS,
/root/reference/lpipsPyTorch/modules/*). The reference downloads pretrained
torchvision weights at runtime (modules/utils.py:11-20); this environment has
no network egress and no torchvision, so:

  * the network architecture (AlexNet-features LPIPS with unit-normalised
    activations, 1x1 linear heads, spatial averaging) is implemented here in
    JAX, and
  * weights load from a local .npz (env R3DGS_LPIPS_WEIGHTS or
    <repo>/weights/lpips_alex.npz) with keys conv{0..4}/{w,b} and
    lin{0..4}/w. `lpips_available()` reports whether the metric is usable;
    callers (e.g. render CLI) degrade gracefully.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalisation used by the reference ScalingLayer.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet-features geometry: (out_ch, kernel, stride, pad); maxpool after
# layers 0, 1 (2) per torchvision AlexNet.features.
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}


def default_weights_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.environ.get("R3DGS_LPIPS_WEIGHTS",
                          os.path.join(root, "weights", "lpips_alex.npz"))


@functools.lru_cache(maxsize=1)
def _load_weights_np() -> Optional[dict]:
    path = default_weights_path()
    if not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: np.asarray(data[k]) for k in data.files}


def lpips_available() -> bool:
    return _load_weights_np() is not None


def _conv(x, w, b, stride, pad):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=dn, precision="highest")
    return y + b.reshape(1, -1, 1, 1)


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def _alex_features(params, x):
    feats = []
    for i, (_, _, stride, pad) in enumerate(_ALEX):
        x = _conv(x, params[f"conv{i}/w"], params[f"conv{i}/b"], stride, pad)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return feats


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (n + eps)


def lpips(img1: jnp.ndarray, img2: jnp.ndarray,
          params: Optional[dict] = None) -> jnp.ndarray:
    """LPIPS distance between [C,H,W] images in [0,1].

    Raises RuntimeError when no weights are available."""
    if params is None:
        wnp = _load_weights_np()
        if wnp is None:
            raise RuntimeError(
                "LPIPS weights not found. Export torchvision+lpips weights to "
                f"{default_weights_path()} (keys conv{{0..4}}/w, conv{{0..4}}/b,"
                " lin{0..4}/w); this environment cannot download them.")
        params = {k: jnp.asarray(v) for k, v in wnp.items()}

    def prep(img):
        x = img[None] * 2.0 - 1.0
        return (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) / \
            jnp.asarray(_SCALE).reshape(1, 3, 1, 1)

    f1 = _alex_features(params, prep(img1))
    f2 = _alex_features(params, prep(img2))
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        lin_w = params[f"lin{i}/w"].reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin_w, axis=1))
    return total
