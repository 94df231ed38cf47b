"""Packed variable-band SH storage for inference.

TPU-native equivalent of the reference's variable-band inference path
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:245-350 `variableSHPreprocessCUDA`, `getSHOffset` :19-36, host
`inferenceForward` rasterizer_impl.cu:206-355): after SH culling, a
Gaussian of degree d only needs (d+1)^2 SH coefficient rows, so the
inference representation sorts primitives by degree and stores the rest
coefficients RAGGED — exactly sum_i ((deg_i+1)^2 - 1) rows instead of
15 per Gaussian (the reference packs by band with per-band counts/offsets;
here the flat row-major ragged layout plus per-degree group offsets gives
the same footprint with TPU-friendly contiguous slices).

Rendering: each degree group is a contiguous slice (static shape per loaded
model), its colours are evaluated with a statically-truncated SH basis, and
the concatenated colour array feeds the ordinary tiled renderer through
`colors_precomp` — depth sorting and compositing are unchanged, so packed
and dense models render identically (test_packed_sh.py asserts this).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_ops
from ..ops.rasterize.tiled import render_tiled


def pack_variable_sh(params: Dict[str, jnp.ndarray], degrees) -> Dict:
    """Sort Gaussians by SH degree and drop masked coefficient rows.

    Args:
      params: dense parameter dict (xyz, features_dc, features_rest [N,M,3],
        scaling, rotation, opacity).
      degrees: [N] int per-Gaussian degree (0..max).

    Returns a dict with degree-sorted parameters, ragged
    `features_rest_packed` [sum coeffs, 3], per-degree `group_counts`, and
    `degrees` (sorted). Host-side (numpy): packing is an offline/IO step.
    """
    degrees = np.asarray(degrees)
    n = degrees.shape[0]
    order = np.argsort(degrees, kind="stable")
    max_deg = int(degrees.max()) if n else 0

    rest = np.asarray(params["features_rest"])[order]      # [N, M, 3]
    counts = [int((degrees == d).sum()) for d in range(max_deg + 1)]
    rows: List[np.ndarray] = []
    start = 0
    for d, c in enumerate(counts):
        k = (d + 1) ** 2 - 1
        if c and k:
            rows.append(rest[start:start + c, :k, :].reshape(-1, 3))
        start += c
    packed = (np.concatenate(rows, axis=0) if rows
              else np.zeros((0, 3), np.float32))

    out = {k: np.asarray(v)[order] for k, v in params.items()
           if k != "features_rest"}
    out["features_rest_packed"] = packed
    out["group_counts"] = counts
    out["degrees"] = degrees[order]
    return out


def unpack_variable_sh(packed: Dict, max_sh_degree: int = 3) -> Dict:
    """Inverse of pack_variable_sh: rebuild dense [N, M, 3] rest features
    (masked rows zero), in the packed (degree-sorted) order."""
    counts = packed["group_counts"]
    n = sum(counts)
    m = (max_sh_degree + 1) ** 2 - 1
    rest = np.zeros((n, m, 3), np.float32)
    flat = np.asarray(packed["features_rest_packed"])
    start, fstart = 0, 0
    for d, c in enumerate(counts):
        k = (d + 1) ** 2 - 1
        if c and k:
            rest[start:start + c, :k, :] = (
                flat[fstart:fstart + c * k].reshape(c, k, 3))
        fstart += c * k
        start += c
    out = {k: v for k, v in packed.items()
           if k not in ("features_rest_packed", "group_counts", "degrees")}
    out["features_rest"] = rest
    return out


def packed_sh_colors(packed: Dict, campos, max_sh_degree: int = 3):
    """Per-Gaussian RGB from the packed representation (group-wise static
    truncated SH evaluation; matches eval_sh with degree masking)."""
    xyz = jnp.asarray(packed["xyz"])
    dc = jnp.asarray(packed["features_dc"])
    flat = jnp.asarray(packed["features_rest_packed"])
    counts = packed["group_counts"]
    dirs = sh_ops.normalize_dirs(xyz - campos)
    cols = []
    start, fstart = 0, 0
    for d, c in enumerate(counts):
        if c == 0:
            continue
        k = (d + 1) ** 2 - 1
        shs = jnp.concatenate([
            dc[start:start + c],
            flat[fstart:fstart + c * k].reshape(c, k, 3)
        ], axis=1) if k else dc[start:start + c]
        cols.append(sh_ops.eval_sh(shs, dirs[start:start + c], d, clamp=True))
        fstart += c * k
        start += c
    if not cols:
        return jnp.zeros((0, 3), jnp.float32)
    return jnp.concatenate(cols, axis=0)


def packed_num_coeff_rows(degrees) -> int:
    """Ragged rest-coefficient row count: sum((d_i+1)^2 - 1)."""
    d = np.asarray(degrees)
    return int((((d + 1) ** 2) - 1).sum())


def render_packed(packed: Dict, camera, settings=None, model=None,
                  key_buffer_size: Optional[int] = None):
    """Render a packed model through the tiled pipeline (colors_precomp)."""
    from .gaussian_model import GaussianModel
    if model is None:
        model = GaussianModel(3)
    if settings is None:
        settings = model.render_settings(camera)
    colors = packed_sh_colors(packed, settings.campos)
    return render_tiled(
        jnp.asarray(packed["xyz"]),
        jnp.asarray(packed["opacity"]),
        model.scaling_activation(jnp.asarray(packed["scaling"])),
        jnp.asarray(packed["rotation"])
        / jnp.maximum(jnp.linalg.norm(jnp.asarray(packed["rotation"]),
                                      axis=-1, keepdims=True), 1e-12),
        jnp.zeros((packed["xyz"].shape[0], 1, 3), jnp.float32),
        settings, colors_precomp=colors, key_buffer_size=key_buffer_size)
