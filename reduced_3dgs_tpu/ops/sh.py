"""Spherical-harmonics (degree 0..3) evaluation, TPU-native.

Behavioral contract follows the reference kernels
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/auxiliary.h:22-39
and forward.cu:105-159): real SH basis up to degree 3, the 0.5 offset, and
positive clamping with zero gradient for clamped channels (the clamp mask of
forward.cu:155-158 / backward.cu:32-34 arises naturally from `jnp.maximum`).

Unlike the CUDA kernel there is no per-Gaussian degree branch here: variable
per-Gaussian SH degree is realised by masking the coefficient rows to zero
(see shculling.gaussian_model), which is mathematically identical and keeps
the op fully SIMD. All functions are shape-polymorphic over leading axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

MAX_SH_DEGREE = 3


def num_sh_coeffs(degree: int) -> int:
    """Total number of SH coefficients for a given degree (DC included)."""
    return (degree + 1) ** 2


def sh_basis(dirs: jnp.ndarray, degree: int = MAX_SH_DEGREE) -> jnp.ndarray:
    """Evaluate the real SH basis along unit directions.

    Args:
      dirs: [..., 3] unit view directions.
      degree: max band to evaluate (static int, 0..3).

    Returns:
      [..., (degree+1)**2] basis values, ordered exactly as the reference
      coefficient layout (forward.cu:115-148).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    cols = [SH_C0 * one]
    if degree > 0:
        cols += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        cols += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree > 2:
        cols += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(cols, axis=-1)


def eval_sh(shs: jnp.ndarray, dirs: jnp.ndarray, degree: int = MAX_SH_DEGREE,
            clamp: bool = True) -> jnp.ndarray:
    """SH coefficients -> RGB color along view directions.

    Args:
      shs: [..., K, 3] coefficients with K >= (degree+1)**2.
      dirs: [..., 3] unit directions (Gaussian center minus camera center,
        normalised by the caller or here via `normalize_dirs`).
      degree: static max band.
      clamp: apply the `max(rgb, 0)` clamp of the reference forward pass
        (gradient is zeroed for clamped channels, matching backward.cu:32-34).

    Returns:
      [..., 3] colors, including the +0.5 offset (forward.cu:151).
    """
    basis = sh_basis(dirs, degree)
    k = basis.shape[-1]
    rgb = jnp.einsum("...k,...kc->...c", basis, shs[..., :k, :],
                     precision="highest") + 0.5
    if clamp:
        rgb = jnp.maximum(rgb, 0.0)
    return rgb


def normalize_dirs(vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Normalise direction vectors (reference forward.cu:111-112).

    The guard only binds for zero-length inputs — dead padded slots whose
    xyz coincides with the camera center. rsqrt(|v|^2 + eps^2) instead of
    maximum(norm, eps) or a where-guard: d[v*(v.v+c)^-1/2]/dv at v=0 is
    c^-1/2 * I — FINITE — so dead-row xyz grads (and, through the shared
    campos input, camera gradients in trainable-camera modes) stay finite
    for the multiply-masking in trainer.functional.mask_rows, with no
    select in the hot path (the r03 double-where formulation cost ~23
    ms/step in the bench gradient, tools/bisect_body.py). Real visible
    Gaussians are at least NEAR_CULL_Z from the camera so the eps^2 term
    perturbs |v|^2 >= 0.04 by <= 1e-16 — below f32 resolution."""
    sq = jnp.sum(vecs * vecs, axis=-1, keepdims=True)
    if eps:
        sq = sq + eps * eps
    return vecs * jax.lax.rsqrt(sq)


def degree_coeff_mask(degrees: jnp.ndarray, max_degree: int = MAX_SH_DEGREE) -> jnp.ndarray:
    """Boolean mask over the rest coefficients enabled for each Gaussian.

    Row j (0-based, over the (max_degree+1)**2 - 1 non-DC coefficients) is
    enabled iff j < (deg+1)**2 - 1, matching the reference
    VariableSHGaussianModel.get_features masking
    (/root/reference/reduced_3dgs/shculling/gaussian_model.py:17-29).

    Args:
      degrees: [...] int array of per-Gaussian degrees.

    Returns:
      [..., (max_degree+1)**2 - 1] bool mask.
    """
    n_rest = num_sh_coeffs(max_degree) - 1
    n_enabled = (degrees + 1) ** 2 - 1
    idx = jnp.arange(n_rest)
    return idx[None, :] < n_enabled[..., None]
