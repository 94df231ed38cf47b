"""Dense pure-XLA reference renderer (the oracle).

Evaluates every Gaussian against every pixel in global depth order. O(N * P),
intended for tests and small scenes; the production path is `tiled.py`. With
`tile_culling=True` (default) a Gaussian is only composited into pixels whose
16x16 tile lies inside its projected rect, which makes this renderer agree
exactly with the tiled/sorted pipeline (and with the reference CUDA
semantics, where a Gaussian is only ever seen by tiles in its rect,
rasterizer_impl.cu:78-119).

Sort order matches the reference: ascending view depth, ties broken by
Gaussian index (the CUDA radix sort is stable over the emission order,
rasterizer_impl.cu:465-473).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ... import config
from . import common
from .common import RenderSettings


def render_reference(
    means3d: jnp.ndarray,
    opacities_raw: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    shs: jnp.ndarray,
    settings: RenderSettings,
    alive: Optional[jnp.ndarray] = None,
    mean2d_offset_ndc: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    with_stats: bool = False,
    tile_culling: bool = True,
    chunk: int = config.CHUNK,
):
    """Render an image; returns a dict mirroring the reference outputs.

    Keys: "render" [3,H,W], "radii" [N] int32, "final_T" [H,W],
    "depth" [H,W] (alpha-weighted expected depth; an addition over the
    reference, used by the depth-supervision trainer), and with_stats adds
    "gaussians_count", "opacity_important_score", "T_alpha_important_score",
    "touched_pixels", "transmittance_sum" (all [N]).
    """
    N = means3d.shape[0]
    H, W = settings.image_height, settings.image_width
    pre = common.preprocess(means3d, opacities_raw, scales, rotations, shs,
                            settings, alive=alive,
                            mean2d_offset_ndc=mean2d_offset_ndc,
                            colors_precomp=colors_precomp,
                            cov3d_precomp=cov3d_precomp)

    visible = pre.tiles_touched > 0
    # Sort by (visible-last, depth, index): culled Gaussians sink to the end
    # with valid=False so they never composite.
    sort_depth = jnp.where(visible, pre.depths, jnp.inf).astype(jnp.float32)
    gidx = jnp.arange(N, dtype=jnp.int32)
    s_depth, s_gidx = jax.lax.sort((sort_depth, gidx), num_keys=1)
    s_valid = jnp.isfinite(s_depth)

    s_means2d = pre.means2d[s_gidx]
    s_conic = pre.conic[s_gidx]
    s_opacity = pre.opacity[s_gidx]
    s_rgb = pre.rgb[s_gidx]
    s_depths = pre.depths[s_gidx]
    s_rect_min = pre.rect_min[s_gidx]
    s_rect_max = pre.rect_max[s_gidx]

    pix = common.pixel_centers(H, W)
    pix_tile = (pix // jnp.array([config.BLOCK_X, config.BLOCK_Y],
                                 dtype=pix.dtype)).astype(jnp.int32)  # [P,2]

    num_chunks = -(-N // chunk)
    pad = num_chunks * chunk - N

    def pad0(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    c_means2d = pad0(s_means2d).reshape(num_chunks, chunk, 2)
    c_conic = pad0(s_conic).reshape(num_chunks, chunk, 3)
    c_opacity = pad0(s_opacity).reshape(num_chunks, chunk)
    c_rgb = pad0(s_rgb).reshape(num_chunks, chunk, 3)
    c_depths = pad0(s_depths).reshape(num_chunks, chunk)
    c_valid = pad0(s_valid).reshape(num_chunks, chunk)
    c_rect_min = pad0(s_rect_min).reshape(num_chunks, chunk, 2)
    c_rect_max = pad0(s_rect_max).reshape(num_chunks, chunk, 2)

    def body(carry, xs):
        m2d, con, opa, rgb, dep, val, rmin, rmax = xs
        if tile_culling:
            inside = jnp.all(
                (pix_tile[:, None, :] >= rmin[None, :, :])
                & (pix_tile[:, None, :] < rmax[None, :, :]), axis=-1)
        else:
            inside = None
        carry, stats = common.composite_chunk(
            carry, pix, m2d, con, opa, rgb, dep, val,
            pixel_valid=inside, collect_stats=with_stats)
        return carry, stats

    carry = common.init_carry(H * W)
    xs = (c_means2d, c_conic, c_opacity, c_rgb, c_depths, c_valid,
          c_rect_min, c_rect_max)
    carry, stats = jax.lax.scan(jax.checkpoint(body), carry, xs)

    image = common.finalize_color(carry, settings.bg)          # [P,3]
    out = {
        "render": image.T.reshape(3, H, W),
        "radii": pre.radii,
        "final_T": carry.T.reshape(H, W),
        "depth": carry.depth.reshape(H, W),
    }
    if with_stats:
        def unsort(x_chunks):
            flat = x_chunks.reshape(-1)[: N]
            return jnp.zeros((N,), flat.dtype).at[s_gidx].set(flat)
        out["gaussians_count"] = unsort(stats.count).astype(jnp.int32)
        out["opacity_important_score"] = unsort(stats.opacity_score)
        out["T_alpha_important_score"] = unsort(stats.t_alpha_score)
        out["touched_pixels"] = unsort(stats.count).astype(jnp.int32)
        out["transmittance_sum"] = unsort(stats.transmittance)
    return out
