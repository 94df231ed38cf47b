"""Loss/metric helpers (reference `gaussian_splatting.utils.psnr` usage at
train.py:9,52: per-channel PSNR returning a [3, 1] column per image)."""
from __future__ import annotations

import jax.numpy as jnp


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-channel PSNR, shape [C, 1] (matches the reference's concat usage,
    train.py:52)."""
    c = img1.shape[0]
    m = jnp.mean((img1.reshape(c, -1) - img2.reshape(c, -1)) ** 2,
                 axis=1, keepdims=True)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(m, 1e-12)))
