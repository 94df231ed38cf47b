"""Shared per-Gaussian preprocessing and alpha-compositing math.

This is the single source of truth for the rasterizer semantics; both the
dense reference renderer (`reference.py`, the CPU-testable oracle) and the
production tiled renderer (`tiled.py` / `pallas_kernel.py`) are built on the
functions here so that they agree bit-for-bit by construction.

Behavioral contract follows the reference CUDA pipeline
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu):
  * preprocess (forward.cu:353-456): frustum cull, projection, cov3D->cov2D,
    conic, 3-sigma radius, tile rect, in-kernel opacity sigmoid
    (forward.cu:414), SH->RGB with positive clamp.
  * render (forward.cu:461-582): front-to-back compositing with
    alpha = min(0.99, opacity*exp(power)), skip alpha < 1/255, terminate when
    T would drop below 1e-4 (the triggering Gaussian itself is skipped).

The compositing is reformulated to be order-parallel within a chunk: with
abar_i the gated alphas, the incoming transmittance of entry i is
T_in * cumprod_{j<i}(1 - abar_j). Because that product is monotonically
non-increasing, the first index where T_in*(1-abar_i) < 1e-4 under the
"everyone contributes" assumption equals the first index under the reference
sequential semantics, so masking every entry at or after that index
reproduces the CUDA early-termination exactly while keeping the math a
cumprod + weighted sum (VPU-parallel, no sequential dependency).

Gradients are obtained by JAX autodiff through this forward. The reference's
hand-written backward corresponds to the same math: the SH/color clamp mask
(backward.cu:32-34) is `jnp.maximum`'s subgradient, the FoV-clamp gating
(backward.cu:208-209) is `jnp.clip`'s, the in-kernel opacity sigmoid
(backward.cu:433) is autodiff of `jax.nn.sigmoid`, the background coupling
(backward.cu:569-572) follows from compositing onto bg in the forward.
One deliberate deviation: the reference does not gate d(alpha)/d(opacity) by
the alpha<=0.99 clamp (backward.cu:537) while `jnp.minimum` does; the clamp
binds only for opaque near-center pixels and the subgradient choice there is
benign.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ... import config
from .. import projection as proj
from .. import sh as sh_ops


class RenderSettings(NamedTuple):
    """Static + traced rasterization settings.

    Mirrors GaussianRasterizationSettings of the reference
    (/root/reference/submodules/diff-gaussian-rasterization/diff_gaussian_rasterization/__init__.py:169-181)
    minus torch-isms. image size is static (shapes!); matrices are traced.
    """
    image_height: int
    image_width: int
    tanfovx: jnp.ndarray
    tanfovy: jnp.ndarray
    bg: jnp.ndarray                  # [3]
    scale_modifier: float
    viewmatrix: jnp.ndarray          # [4,4] row-vector storage
    projmatrix: jnp.ndarray          # [4,4] row-vector storage (full proj)
    campos: jnp.ndarray              # [3]
    sh_degree: int = 3               # static max degree evaluated


class PreprocessedGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities (forward.cu preprocess outputs)."""
    depths: jnp.ndarray          # [N] view-space z
    means2d: jnp.ndarray         # [N,2] pixel coordinates
    conic: jnp.ndarray           # [N,3] inverse 2D covariance (A,B,C)
    opacity: jnp.ndarray         # [N] activated opacity
    rgb: jnp.ndarray             # [N,3] view-dependent color
    radii: jnp.ndarray           # [N] int32 screen radius (0 = culled)
    rect_min: jnp.ndarray        # [N,2] int32 tile rect (x,y)
    rect_max: jnp.ndarray        # [N,2] int32 tile rect, exclusive
    tiles_touched: jnp.ndarray   # [N] int32


def tile_grid(settings: RenderSettings):
    tiles_x = (settings.image_width + config.BLOCK_X - 1) // config.BLOCK_X
    tiles_y = (settings.image_height + config.BLOCK_Y - 1) // config.BLOCK_Y
    return tiles_x, tiles_y


def preprocess(
    means3d: jnp.ndarray,            # [N,3]
    opacities_raw: jnp.ndarray,      # [N] or [N,1] UNactivated (logit) opacity
    scales: jnp.ndarray,             # [N,3] activated scales
    rotations: jnp.ndarray,          # [N,4] normalised quaternions
    shs: jnp.ndarray,                # [N,K,3] (degree-masked) SH coefficients
    settings: RenderSettings,
    alive: Optional[jnp.ndarray] = None,      # [N] bool; dead slots are culled
    mean2d_offset_ndc: Optional[jnp.ndarray] = None,  # [N,2] zeros; its grad is
    # the screen-space gradient the densifier consumes, pre-scaled by
    # (0.5*W, 0.5*H) exactly like the reference (backward.cu:498-499,583-584).
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
) -> PreprocessedGaussians:
    """Vectorised equivalent of preprocessCUDA (forward.cu:353-456)."""
    H, W = settings.image_height, settings.image_width
    tiles_x, tiles_y = tile_grid(settings)
    focal_x, focal_y = proj.focals_from_fov(W, H, settings.tanfovx, settings.tanfovy)

    opac = opacities_raw.reshape(-1)
    p_view = proj.world_to_view(means3d, settings.viewmatrix)
    depths = p_view[..., 2]
    visible = depths > config.NEAR_CULL_Z
    if alive is not None:
        visible = visible & alive

    p_proj = proj.project_points(means3d, settings.projmatrix)
    if mean2d_offset_ndc is not None:
        p_proj_xy = p_proj[..., :2] + mean2d_offset_ndc
    else:
        p_proj_xy = p_proj[..., :2]

    if cov3d_precomp is None:
        cov3d = proj.build_cov3d(scales, settings.scale_modifier, rotations)
    else:
        cov3d = cov3d_precomp
    cov2d = proj.build_cov2d(means3d, cov3d, settings.viewmatrix,
                             focal_x, focal_y, settings.tanfovx, settings.tanfovy,
                             valid=visible)
    conic, det = proj.invert_cov2d(cov2d)
    visible = visible & (det != 0.0)

    lam_max = proj.cov2d_lambda_max(cov2d, det)
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))
    point_image = jnp.stack(
        [proj.ndc2pix(p_proj_xy[..., 0], W), proj.ndc2pix(p_proj_xy[..., 1], H)], axis=-1)

    opacity = jax.nn.sigmoid(opac)

    # Visibility / radii keep the reference's 3-sigma semantics
    # (forward.cu:429-432): they feed densification stats and screen-size
    # pruning. BINNING uses the exact AXIS-ALIGNED bounding box of the
    # alpha-cutoff contour: the composite gate zeroes every blend with
    # op*exp(power) < 1/255 (ALPHA_EPS, forward.cu:546-548 analog), and
    # max over dy of the splat at offset dx is exp(-dx^2 / (2*Sigma_xx))
    # (Gaussian marginal-maximum identity), so the contour op*G >= 1/255
    # lies inside |dx| <= sqrt(t2*Sigma_xx), |dy| <= sqrt(t2*Sigma_yy)
    # with t2 = 2*ln(255*op) — per-axis widths <= the circumradius
    # sqrt(t2*lambda_max), MUCH tighter for anisotropic splats. Tiles
    # outside the box contribute exactly nothing; dropping their entries
    # changes no output or gradient, only the emitted pair count (a large
    # cut at the low opacities that dominate after opacity resets). The
    # 3-sigma circum-rect stays as the outer clamp (reference's hard cut).
    rect3_min, rect3_max = proj.tile_rect(point_image, radius, tiles_x, tiles_y)
    rect3_wh = jnp.maximum(rect3_max - rect3_min, 0)
    visible = visible & ((rect3_wh[..., 0] * rect3_wh[..., 1]) > 0)

    t2 = jnp.maximum(2.0 * jnp.log(255.0 * jnp.maximum(opacity, 1e-6)), 0.0)
    # Unceiled float widths: tile_rect's floor+1 cover is exact for float
    # radii, so ceil here would only add rect slack.
    bin_wx = jnp.minimum(radius, jnp.sqrt(t2 * jnp.maximum(cov2d[..., 0], 0.0)))
    bin_wy = jnp.minimum(radius, jnp.sqrt(t2 * jnp.maximum(cov2d[..., 2], 0.0)))
    rect_min, rect_max = proj.tile_rect(point_image,
                                        jnp.stack([bin_wx, bin_wy], axis=-1),
                                        tiles_x, tiles_y)
    rect_wh = jnp.maximum(rect_max - rect_min, 0)
    tiles = (rect_wh[..., 0] * rect_wh[..., 1]).astype(jnp.int32)

    if colors_precomp is None:
        dirs = sh_ops.normalize_dirs(means3d - settings.campos)
        rgb = sh_ops.eval_sh(shs, dirs, settings.sh_degree, clamp=True)
    else:
        rgb = colors_precomp

    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(visible, tiles, 0)
    return PreprocessedGaussians(
        depths=depths,
        means2d=point_image,
        conic=conic,
        opacity=opacity,
        rgb=rgb,
        radii=radii,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles_touched,
    )


def mark_visible(means3d: jnp.ndarray, viewmatrix: jnp.ndarray) -> jnp.ndarray:
    """Frustum visibility mask (reference `mark_visible`,
    /root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/rasterizer_impl.cu:149-161).

    `in_frustum` (auxiliary.h:139-159) computes NDC coordinates but its
    decision reduces to the view-space near-plane test z > 0.2; the NDC
    values are discarded, so only the z test is reproduced."""
    p_view = proj.world_to_view(means3d, viewmatrix)
    return p_view[..., 2] > config.NEAR_CULL_Z


class CompositeCarry(NamedTuple):
    """Per-pixel compositing state carried across chunks."""
    T: jnp.ndarray          # [P] transmittance
    done: jnp.ndarray       # [P] bool, early-termination latch
    color: jnp.ndarray      # [P,3]
    depth: jnp.ndarray      # [P] expected-depth accumulator


class ChunkStats(NamedTuple):
    """Per-entry (chunk Gaussian) pixel-aggregated statistics.

    Used by the importance counting pass (reference
    submodules/gaussian-importance/cuda_rasterizer/forward.cu:473-476) and
    the SH-culling transmittance accumulators (forward.cu:560-564):
      count: number of pixels this entry contributed to,
      opacity_score: count * activated opacity (atomicAdd of con_o.w),
      t_alpha_score: sum over pixels of alpha*T,
      transmittance: sum over pixels of incoming T.
    """
    count: jnp.ndarray
    opacity_score: jnp.ndarray
    t_alpha_score: jnp.ndarray
    transmittance: jnp.ndarray


def exclusive_cumprod(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    p = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jnp.take(p, jnp.array([0]), axis=axis))
    return jnp.concatenate([one, jax.lax.slice_in_dim(p, 0, x.shape[axis] - 1, axis=axis)],
                           axis=axis)


def composite_chunk(
    carry: CompositeCarry,
    pix_xy: jnp.ndarray,        # [P,2] pixel centers
    means2d: jnp.ndarray,       # [C,2]
    conic: jnp.ndarray,         # [C,3]
    opacity: jnp.ndarray,       # [C]
    rgb: jnp.ndarray,           # [C,3]
    depths: jnp.ndarray,        # [C]
    valid: jnp.ndarray,         # [C] bool (list-padding / tile-membership mask)
    pixel_valid: Optional[jnp.ndarray] = None,  # [P,C] extra per-pixel gate
    collect_stats: bool = False,
):
    """Composite one depth-ordered chunk of Gaussians over a set of pixels.

    Exact, order-parallel reformulation of the sequential loop in
    renderCUDA (forward.cu:509-570); see module docstring for the argument
    why the early-termination latch is preserved exactly.

    Returns (new_carry, stats) with stats a ChunkStats of [C] arrays (zeros
    unless collect_stats).
    """
    d = means2d[None, :, :] - pix_xy[:, None, :]                  # [P,C,2]
    dx, dy = d[..., 0], d[..., 1]
    A, B, Cc = conic[..., 0], conic[..., 1], conic[..., 2]        # [C]
    power = -0.5 * (A[None] * dx * dx + Cc[None] * dy * dy) - B[None] * dx * dy
    alpha = jnp.minimum(config.ALPHA_MAX, opacity[None, :] * jnp.exp(power))
    gate = (power <= 0.0) & (alpha >= config.ALPHA_EPS) & valid[None, :]
    if pixel_valid is not None:
        gate = gate & pixel_valid
    abar = jnp.where(gate, alpha, 0.0)                            # [P,C]

    T_in = carry.T[:, None] * exclusive_cumprod(1.0 - abar, axis=1)
    test_T = T_in * (1.0 - abar)
    trigger = gate & (test_T < config.T_EPS)
    dead = carry.done[:, None] | (jnp.cumsum(trigger.astype(jnp.int32), axis=1) > 0)
    contrib = gate & ~dead                                        # [P,C]

    w = jnp.where(contrib, abar * T_in, 0.0)                      # [P,C]
    color = carry.color + jnp.matmul(w, rgb, precision='highest')  # [P,3]
    depth = carry.depth + jnp.matmul(w, depths, precision='highest')
    T_new = carry.T * jnp.prod(jnp.where(contrib, 1.0 - abar, 1.0), axis=1)
    done_new = carry.done | jnp.any(trigger, axis=1)
    new_carry = CompositeCarry(T=T_new, done=done_new, color=color, depth=depth)

    if collect_stats:
        contrib_f = contrib.astype(w.dtype)
        count = jnp.sum(contrib_f, axis=0)
        stats = ChunkStats(
            count=count,
            opacity_score=count * opacity,
            t_alpha_score=jnp.sum(w, axis=0),
            transmittance=jnp.sum(jnp.where(contrib, T_in, 0.0), axis=0),
        )
    else:
        z = jnp.zeros_like(opacity)
        stats = ChunkStats(z, z, z, z)
    return new_carry, stats


def init_carry(num_pixels: int, dtype=jnp.float32) -> CompositeCarry:
    return CompositeCarry(
        T=jnp.ones((num_pixels,), dtype),
        done=jnp.zeros((num_pixels,), bool),
        color=jnp.zeros((num_pixels, 3), dtype),
        depth=jnp.zeros((num_pixels,), dtype),
    )


def finalize_color(carry: CompositeCarry, bg: jnp.ndarray) -> jnp.ndarray:
    """C + T * bg per pixel (forward.cu:575-581)."""
    return carry.color + carry.T[:, None] * bg[None, :]


def pixel_centers(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H*W, 2] pixel-center coordinates (x, y), row-major like pix_id."""
    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)                 # [H,W]
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
