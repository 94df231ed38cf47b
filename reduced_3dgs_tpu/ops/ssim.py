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


def _blur_axis(x: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """1-D 'same' convolution along `axis` as a static-slice shift-add.

    Grouped/depthwise convs do not map onto the TPU MXU (each group is a
    1-wide matmul) and cost ~7 ms per SSIM at 544x976; eleven shifted adds
    are pure VPU work that XLA fuses into one pass, and the backward is the
    mirrored shift-add by autodiff."""
    w = len(taps)
    pad = w // 2
    widths = [(0, 0)] * x.ndim
    widths[axis] = (pad, pad)
    xp = jnp.pad(x, widths)
    n = x.shape[axis]
    acc = None
    for i, t in enumerate(taps):
        term = float(t) * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
        acc = term if acc is None else acc + term
    return acc


def _band_matrix(n: int, taps) -> jnp.ndarray:
    """[n, n] banded blur matrix B[i, j] = taps[j - i + w//2] (zero outside
    the band) — row i of x @ B is the zero-padded 'same' convolution at i.

    Built from iota at trace time (NOT from an eagerly created device
    array: executables that capture concrete device arrays as closure
    constants degrade this runtime's dispatch path, see
    ops/projection.py)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = j - i + len(taps) // 2
    acc = jnp.zeros((n, n), jnp.float32)
    for t, w in enumerate(taps):
        acc = acc + jnp.where(d == t, jnp.float32(w), 0.0)
    return acc


def _blur_matmul(x: jnp.ndarray, taps, precision) -> jnp.ndarray:
    """Separable blur over the last two axes as two banded matmuls.

    The shift-add form is ~22 strided VPU passes over the stack; as
    matmuls the blur rides the MXU instead (the taps matrix is banded but
    the MXU doesn't care). Precision HIGHEST keeps the moment maps in true
    f32 — the default bf16 matmul loses the E[x^2] - E[x]^2 cancellation;
    HIGH (3-pass bf16 decomposition) reproduces f32 at half HIGHEST's MXU
    cost and is exact for these operands' dynamic range."""
    H, W = x.shape[-2], x.shape[-1]
    hp = jnp.einsum("...hw,hu->...uw", x, _band_matrix(H, taps),
                    precision=precision)
    return jnp.einsum("...uw,wv->...uv", hp, _band_matrix(W, taps),
                      precision=precision)


def _blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur over the last two axes, 'same' padding.

    R3DGS_SSIM: "matmul" (default, HIGHEST-precision banded matmuls) /
    "matmul_high" (3-pass bf16 matmuls) / "ladder" (shift-add slices)."""
    taps = _gaussian_window_np(window_size, sigma)
    import os
    # Default matmul_high: measured grad(base) 54.4 vs matmul/HIGHEST's
    # 55.2 ms on the r05 bench scene (bisect A/B), with 3-pass bf16
    # reproducing the f32 moment maps within the bench parity gate.
    mode = os.environ.get("R3DGS_SSIM", "matmul_high")
    if mode == "matmul":
        return _blur_matmul(x, taps, jax.lax.Precision.HIGHEST)
    if mode == "matmul_high":
        return _blur_matmul(x, taps, jax.lax.Precision.HIGH)
    return _blur_axis(_blur_axis(x, taps, x.ndim - 2), taps, x.ndim - 1)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM between two [C,H,W] images in [0,1]."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    # One fused blur over all five moment maps (fewer, wider passes).
    stacked = jnp.stack([img1, img2, img1 * img1, img2 * img2, img1 * img2])
    mu1, mu2, m11, m22, m12 = _blur(stacked, window_size, sigma)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma2_sq = m22 - mu2_sq
    sigma12 = m12 - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)
