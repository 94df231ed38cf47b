"""SSIM with an 11x11 Gaussian window, matching the vanilla-3DGS training
loss convention (window_size=11, sigma=1.5, C1=0.01^2, C2=0.03^2, 'same'
padding, mean over all pixels/channels). The reference base package's loss is
(1-lambda)*L1 + lambda*(1-SSIM) with lambda=0.2 (SURVEY.md section 1.4)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _gaussian_window_np(window_size: int, sigma: float):
    import numpy as np
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_window(window_size: int, sigma: float):
    # jnp conversion must happen per-trace (a cached jnp array created inside
    # one jit trace would leak its tracer into the next).
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


def _blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable depthwise Gaussian blur, 'same' padding. x: [C,H,W]."""
    g = _gaussian_window(window_size, sigma)
    c = x.shape[0]
    x = x[None]                                        # [1,C,H,W]
    kh = jnp.tile(g.reshape(1, 1, -1, 1), (c, 1, 1, 1))
    kw = jnp.tile(g.reshape(1, 1, 1, -1), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad_h = window_size // 2
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad_h, pad_h), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision="highest")
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad_h, pad_h)], dimension_numbers=dn,
        feature_group_count=c, precision="highest")
    return x[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM between two [C,H,W] images in [0,1]."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu1 = _blur(img1, window_size, sigma)
    mu2 = _blur(img2, window_size, sigma)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size, sigma) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)
