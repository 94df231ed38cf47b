"""2DGS (surfel / flat-disk splatting) tiled renderer, TPU-native.

The reference exposes a 2DGS backend through the external gsplat package
(`Gsplat2DGSGaussianModel`, /root/reference/reduced_3dgs/shculling/
gaussian_model.py:5,91-101 and prepare.py:15-30 registry key "gsplat-2dgs").
That backend is CUDA; this module is a ground-up TPU implementation of the
2D Gaussian Splatting forward model (Huang et al., "2D Gaussian Splatting
for Geometrically Accurate Radiance Fields", SIGGRAPH 2024) built on the
same static-shape binning/sorting machinery as the 3DGS tiled renderer
(tiled.py) with autodiff gradients.

Math. Each splat is a flat ellipse: center p, tangent axes t_u, t_v from the
first two columns of the quaternion rotation scaled by (s_u, s_v) (the third
scale is unused). A splat-local point s = (u, v, 1) maps to the world point
X(s) = [s_u t_u | s_v t_v | p] @ s, and through the full projection to
homogeneous PIXEL coordinates hom(s) = M @ s with M 3x3 (NDC->pixel folded
in). Ray-splat intersection is then exact plane intersection (no EWA
approximation): for pixel (px, py),

    k = px * m_w - m_px,  l = py * m_w - m_py,  s_h = cross(k, l),
    (u, v) = (s_h.x / s_h.z, s_h.y / s_h.z),

giving the ray-splat weight G = exp(-(u^2+v^2)/2). A screen-space low-pass
G_2d = exp(-((px-cx)^2+(py-cy)^2)/(2*0.5)) bounds the footprint from below
(the paper's object-space filter, sigma^2 = 0.5 px): alpha uses
max(G, G_2d). Depth is the exact intersection view-space depth, linear in s:
z(s) = m_d . s / s_h.z evaluated at the intersection.

Compositing (front-to-back, alpha clamp 0.99, skip < 1/255, T-termination at
1e-4) and the segmented log-space scan are identical to tiled.py, so the two
renderers share thresholds and early-termination semantics. Outputs add
2DGS-specific maps: expected intersection depth, camera-space normal map,
and the per-pixel depth-distortion accumulator (sum_i w_i * (z_i * A_i -
D_i) with A/D the in-front weight/weighted-depth prefix sums), the loss
terms of the 2DGS paper.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ... import config
from .. import projection as proj
from .. import sh as sh_ops
from .common import RenderSettings
from .tiled import bin_and_sort, default_key_buffer_size

# Screen-space low-pass: sigma^2 in px^2 (2DGS paper's 0.5-px filter).
FILTER_VAR_2D = 0.5
# 3-sigma cutoff used for the binning rect, in splat-local units.
CUTOFF = 3.0


def preprocess_2dgs(means3d, opacities_raw, scales, rotations, shs,
                    settings: RenderSettings,
                    alive: Optional[jnp.ndarray] = None,
                    mean2d_offset_ndc: Optional[jnp.ndarray] = None):
    """Per-splat transforms + binning rects.

    Returns a dict of per-Gaussian arrays:
      M [N,3,3] rows (m_px, m_py, m_w) mapping (u,v,1) -> homogeneous pixel,
      md [N,3] view-depth row, center2d [N,2], normal_view [N,3],
      depths [N], opacity [N], rgb [N,3], radii [N] int32,
      rect_min/rect_max [N,2] int32, tiles_touched [N] int32.
    """
    H, W = settings.image_height, settings.image_width
    tiles_x = (W + config.BLOCK_X - 1) // config.BLOCK_X
    tiles_y = (H + config.BLOCK_Y - 1) // config.BLOCK_Y

    R = proj.quat_to_rotmat(rotations)                    # [N,3,3]
    su = scales[:, 0] * settings.scale_modifier
    sv = scales[:, 1] * settings.scale_modifier
    tu = R[..., :, 0] * su[:, None]                       # [N,3] scaled axis
    tv = R[..., :, 1] * sv[:, None]

    # B [N,4,3]: world homogeneous coords of s=(u,v,1): [X;1] = B @ s.
    # Columns are (t_u, t_v, p); the appended row (0,0,1) supplies the 1.
    B = jnp.concatenate([
        jnp.stack([tu, tv, means3d], axis=-1),            # [N,3,3]
        jnp.broadcast_to(jnp.array([[0.0, 0.0, 1.0]], jnp.float32),
                         (means3d.shape[0], 1, 3)),
    ], axis=-2)                                            # [N,4,3]

    # hom(s) = s @ B^T @ P (row-vector projection storage): build the 3x4
    # NDC rows then fold ndc->pixel. P columns: x, y, z, w. Expanded as
    # broadcasted multiply-adds over the 4 homogeneous components (tiny
    # einsum contractions are banned, see projection.transform_points).
    P = settings.projmatrix                                # [4,4] row-vector
    M4 = sum(P[r][None, :, None] * B[:, r][:, None, :]
             for r in range(4))                            # [N,4,3] rows x,y,z,w
    m_x, m_y, m_w = M4[:, 0], M4[:, 1], M4[:, 3]
    if mean2d_offset_ndc is not None:
        # Shift the whole splat in NDC: its gradient is the screen-space
        # densification signal, matching the 3DGS renderer's convention.
        m_x = m_x + mean2d_offset_ndc[:, 0:1] * m_w
        m_y = m_y + mean2d_offset_ndc[:, 1:2] * m_w
    # pixel px = ((ndc_x + 1) * W - 1) / 2  (proj.ndc2pix)
    m_px = 0.5 * (W * m_x + (W - 1) * m_w)
    m_py = 0.5 * (H * m_y + (H - 1) * m_w)
    M = jnp.stack([m_px, m_py, m_w], axis=1)               # [N,3,3]

    # View-space depth row: z(s) = [X;1] @ V[:,2] = s . (B^T V[:,2]).
    V = settings.viewmatrix
    md = sum(B[:, r] * V[r, 2] for r in range(4))          # [N,3]

    depths = proj.world_to_view(means3d, V)[:, 2]
    visible = depths > config.NEAR_CULL_Z
    if alive is not None:
        visible = visible & alive

    # Center pixel position (s = (0,0,1)) for the low-pass term.
    cw = m_w[:, 2]
    safe_cw = jnp.where(jnp.abs(cw) < 1e-6, 1e-6, cw)
    center2d = jnp.stack([m_px[:, 2], m_py[:, 2]], -1) / safe_cw[:, None]

    opacity = jax.nn.sigmoid(opacities_raw.reshape(-1))

    def corner_aabb(cut):
        """Pixel AABB of the corners p +- cut*(t_u|t_v), padded by the
        low-pass radius at the same cutoff. cut: [N] splat-local units."""
        c = cut[:, None, None]
        corners = (means3d[:, None, :]
                   + c * jnp.stack([tu + tv, tu - tv, -tu + tv, -tu - tv], 1))
        ch = proj.transform_points(corners, P)             # [N,4,4]
        cw4 = jnp.maximum(ch[..., 3], 1e-4)
        cx = proj.ndc2pix(ch[..., 0] / cw4, W)
        cy = proj.ndc2pix(ch[..., 1] / cw4, H)
        lp_rad = jnp.ceil(cut * jnp.sqrt(FILTER_VAR_2D))
        lo_x = jnp.minimum(jnp.min(cx, 1), center2d[:, 0] - lp_rad)
        hi_x = jnp.maximum(jnp.max(cx, 1), center2d[:, 0] + lp_rad)
        lo_y = jnp.minimum(jnp.min(cy, 1), center2d[:, 1] - lp_rad)
        hi_y = jnp.maximum(jnp.max(cy, 1), center2d[:, 1] + lp_rad)
        return lo_x, hi_x, lo_y, hi_y

    # radii / visibility keep the fixed 3-unit cutoff (densify stats
    # contract, mirrors the 3DGS preprocess); BINNING uses the tighter
    # alpha-cutoff extent sqrt(2*ln(255*op)) — the compositing gate
    # (alpha >= 1/255, this file's render kernel) zeroes everything
    # outside it, so the cut is exact (see common.preprocess).
    full = jnp.full_like(opacity, CUTOFF)
    lo_x, hi_x, lo_y, hi_y = corner_aabb(full)
    radius = jnp.ceil(0.5 * jnp.maximum(hi_x - lo_x, hi_y - lo_y))
    grid = jnp.array([tiles_x, tiles_y], jnp.int32)
    block = jnp.array([config.BLOCK_X, config.BLOCK_Y], jnp.float32)
    rmin3 = jnp.clip((jnp.stack([lo_x, lo_y], -1) / block).astype(jnp.int32),
                     0, grid)
    rmax3 = jnp.clip(jnp.floor(jnp.stack([hi_x, hi_y], -1) / block)
                     .astype(jnp.int32) + 1, 0, grid)
    rect3_wh = jnp.maximum(rmax3 - rmin3, 0)
    visible = visible & ((rect3_wh[..., 0] * rect3_wh[..., 1]) > 0)

    t2 = 2.0 * jnp.log(255.0 * jnp.maximum(opacity, 1e-6))
    cut_a = jnp.minimum(full, jnp.sqrt(jnp.maximum(t2, 0.0)))
    lo_x, hi_x, lo_y, hi_y = corner_aabb(cut_a)
    rmin = jnp.clip((jnp.stack([lo_x, lo_y], -1) / block).astype(jnp.int32),
                    0, grid)
    # floor(hi/B) + 1: exact tile cover for float bounds (see
    # projection.tile_rect — the +B-1 idiom under-covers float boundaries).
    rmax = jnp.clip(jnp.floor(jnp.stack([hi_x, hi_y], -1) / block)
                    .astype(jnp.int32) + 1, 0, grid)
    rect_wh = jnp.maximum(rmax - rmin, 0)
    tiles = (rect_wh[..., 0] * rect_wh[..., 1]).astype(jnp.int32)

    dirs = sh_ops.normalize_dirs(means3d - settings.campos)
    rgb = sh_ops.eval_sh(shs, dirs, settings.sh_degree, clamp=True)

    # Camera-space normal (sign-flipped toward the camera like the paper).
    nw = jnp.cross(R[..., :, 0], R[..., :, 1])
    n_view = (nw[:, 0:1] * V[0, :3] + nw[:, 1:2] * V[1, :3]
              + nw[:, 2:3] * V[2, :3])
    n_view = n_view * jnp.where(n_view[:, 2:3] > 0, -1.0, 1.0)

    return dict(
        M=M, md=md, center2d=center2d, normal_view=n_view,
        depths=depths, opacity=opacity, rgb=rgb,
        radii=jnp.where(visible, radius, 0.0).astype(jnp.int32),
        rect_min=rmin, rect_max=rmax,
        tiles_touched=jnp.where(visible, tiles, 0),
    )


def render_tiled_2dgs(
    means3d: jnp.ndarray,
    opacities_raw: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    shs: jnp.ndarray,
    settings: RenderSettings,
    alive: Optional[jnp.ndarray] = None,
    mean2d_offset_ndc: Optional[jnp.ndarray] = None,
    with_stats: bool = False,
    key_buffer_size: Optional[int] = None,
    pixel_chunk: int = 64,
    tile_row_offset=None,
    tile_rows: Optional[int] = None,
    **unused,
):
    """2DGS render through the shared tiled pipeline.

    Same output contract as render_tiled plus "normal" [3,H,W] and
    "distortion" [H,W]. Supports the same viewport (tile band) mode.
    """
    assert config.BLOCK_SIZE % pixel_chunk == 0
    N = means3d.shape[0]
    H, W = settings.image_height, settings.image_width
    tiles_x = (W + config.BLOCK_X - 1) // config.BLOCK_X
    full_tiles_y = (H + config.BLOCK_Y - 1) // config.BLOCK_Y
    if tile_rows is None:
        tiles_y = full_tiles_y
        tile_row_offset = jnp.int32(0)
    else:
        tiles_y = int(tile_rows)
        tile_row_offset = jnp.asarray(tile_row_offset, jnp.int32)
    num_tiles = tiles_x * tiles_y
    K = key_buffer_size or default_key_buffer_size(N, tiles_x, tiles_y)

    pre = preprocess_2dgs(means3d, opacities_raw, scales, rotations, shs,
                          settings, alive=alive,
                          mean2d_offset_ndc=mean2d_offset_ndc)

    ent = bin_and_sort(pre["rect_min"], pre["rect_max"], pre["tiles_touched"],
                       pre["depths"], tiles_x=tiles_x, tiles_y=tiles_y,
                       tile_row_offset=tile_row_offset, K=K)
    s_gidx, s_tile, s_valid = ent["s_gidx"], ent["s_tile"], ent["s_valid"]
    seg_start_pos, seg_ids = ent["seg_start_pos"], ent["seg_ids"]
    overflow, total = ent["overflow"], ent["total"]

    # One fused [21, N] -> [21, K] row gather: per-field scalar/small-row
    # gathers cost ~20 ms each per [1M] entries on v5e (see tiled.py
    # bin_and_sort); a single multi-row 2-D gather is ~6 ms total.
    fields = jnp.concatenate([
        pre["M"].reshape(-1, 9).T, pre["md"].T, pre["center2d"].T,
        pre["opacity"][None, :], pre["rgb"].T, pre["normal_view"].T], axis=0)
    cols = jnp.take(fields, s_gidx, axis=1)                # [21, K]
    e_M = cols[0:9].T.reshape(-1, 3, 3)                    # [K,3,3]
    e_md = cols[9:12].T                                    # [K,3]
    e_c2d = cols[12:14].T                                  # [K,2]
    e_op = cols[14]                                        # [K]
    e_rgb = cols[15:18].T                                  # [K,3]
    e_nrm = cols[18:21].T                                  # [K,3]
    e_tile_x = (s_tile % tiles_x).astype(jnp.float32) * config.BLOCK_X
    e_tile_y = ((jnp.minimum(s_tile // tiles_x, tiles_y - 1)
                 + tile_row_offset).astype(jnp.float32) * config.BLOCK_Y)

    n_pix_chunks = -(-config.BLOCK_SIZE // pixel_chunk)
    p_offsets = jnp.arange(pixel_chunk, dtype=jnp.int32)

    def render_pixel_chunk(p0):
        p = p0 + p_offsets                                          # [P]
        px = e_tile_x[:, None] + (p % config.BLOCK_X)[None, :]      # [K,P]
        py = e_tile_y[:, None] + (p // config.BLOCK_X)[None, :]

        # Ray-splat intersection: s_h = cross(px*m_w - m_px, py*m_w - m_py).
        kx = px * e_M[:, 2, 0:1] - e_M[:, 0, 0:1]
        ky = px * e_M[:, 2, 1:2] - e_M[:, 0, 1:2]
        kz = px * e_M[:, 2, 2:3] - e_M[:, 0, 2:3]
        lx = py * e_M[:, 2, 0:1] - e_M[:, 1, 0:1]
        ly = py * e_M[:, 2, 1:2] - e_M[:, 1, 1:2]
        lz = py * e_M[:, 2, 2:3] - e_M[:, 1, 2:3]
        sx = ky * lz - kz * ly
        sy = kz * lx - kx * lz
        sz = kx * ly - ky * lx
        sz_safe = jnp.where(jnp.abs(sz) < 1e-9, 1e-9, sz)
        u = sx / sz_safe
        v = sy / sz_safe
        rho3d = u * u + v * v                                        # [K,P]

        ddx = px - e_c2d[:, 0:1]
        ddy = py - e_c2d[:, 1:2]
        rho2d = (ddx * ddx + ddy * ddy) / FILTER_VAR_2D
        # the paper's low-pass: take whichever Gaussian is larger
        use3d = rho3d <= rho2d
        rho = jnp.minimum(rho3d, rho2d)
        G = jnp.exp(-0.5 * rho)

        zhit = (e_md[:, 0:1] * u + e_md[:, 1:2] * v + e_md[:, 2:3])
        depth_px = jnp.where(use3d, zhit, e_md[:, 2:3])              # [K,P]

        alpha = jnp.minimum(config.ALPHA_MAX, e_op[:, None] * G)
        gate = ((alpha >= config.ALPHA_EPS) & s_valid[:, None]
                & (depth_px > config.NEAR_CULL_Z))
        abar = jnp.where(gate, alpha, 0.0)

        log1ma = jnp.log1p(-abar)
        csum = jnp.cumsum(log1ma, axis=0)
        lex = csum - log1ma
        lex = lex - lex[seg_start_pos]
        T_in = jnp.exp(lex)

        trigger = gate & (T_in * (1.0 - abar) < config.T_EPS)
        tcum = jnp.cumsum(trigger.astype(jnp.int32), axis=0)
        tcum_ex = tcum - trigger.astype(jnp.int32)
        dead = (tcum_ex - tcum_ex[seg_start_pos]) > 0
        contrib = gate & ~trigger & ~dead                            # [K,P]

        w = jnp.where(contrib, abar * T_in, 0.0)                     # [K,P]
        # Depth-distortion prefix accumulators (in-front weight / depth sums).
        wz = w * depth_px
        A_in = jnp.cumsum(w, 0) - w
        D_in = jnp.cumsum(wz, 0) - wz
        A_in = A_in - A_in[seg_start_pos]
        D_in = D_in - D_in[seg_start_pos]
        dist_term = 2.0 * w * (depth_px * A_in - D_in)

        def seg(x):
            return jax.ops.segment_sum(x, seg_ids, num_segments=num_tiles + 1
                                       )[:num_tiles]

        color = seg(w[:, :, None] * e_rgb[:, None, :])
        depth = seg(wz)
        normal = seg(w[:, :, None] * e_nrm[:, None, :])
        dist = seg(dist_term)
        logT = seg(jnp.where(contrib, log1ma, 0.0))
        if with_stats:
            contrib_f = contrib.astype(w.dtype)
            cnt = jnp.sum(contrib_f, axis=1)
            stats = jnp.stack([
                cnt, cnt * e_op, jnp.sum(w, axis=1),
                jnp.sum(jnp.where(contrib, T_in, 0.0), axis=1)])
        else:
            stats = jnp.zeros((4, 1), w.dtype)
        return color, depth, normal, dist, logT, stats

    def scan_body(acc, p0):
        color, depth, normal, dist, logT, stats = render_pixel_chunk(p0)
        return acc + stats, (color, depth, normal, dist, logT)

    p0s = jnp.arange(n_pix_chunks, dtype=jnp.int32) * pixel_chunk
    stats_entries, (colors, depths_img, normals, dists, logTs) = jax.lax.scan(
        jax.checkpoint(scan_body), jnp.zeros((4, K if with_stats else 1)), p0s)

    padded_h = tiles_y * config.BLOCK_Y
    padded_w = tiles_x * config.BLOCK_X
    crop_h = H if tile_rows is None else padded_h

    def stitch(tile_vals):
        x = tile_vals.transpose(1, 0, 2, *range(3, tile_vals.ndim)).reshape(
            num_tiles, config.BLOCK_SIZE, *tile_vals.shape[3:])
        extra = x.shape[2:]
        x = x.reshape(tiles_y, tiles_x, config.BLOCK_Y, config.BLOCK_X, *extra)
        x = jnp.moveaxis(x, 2, 1).reshape(padded_h, padded_w, *extra)
        return x[:crop_h, :W]

    T_full = jnp.exp(stitch(logTs))
    color_full = stitch(colors)
    image = color_full + T_full[..., None] * settings.bg[None, None, :]
    out = {
        "render": image.transpose(2, 0, 1),
        "radii": pre["radii"],
        "final_T": T_full,
        "depth": stitch(depths_img),
        "normal": stitch(normals).transpose(2, 0, 1),
        "distortion": stitch(dists),
        "overflow": overflow,
        "num_rendered": total,
    }
    if with_stats:
        def scatter_back(vals):
            return jnp.zeros((N,), vals.dtype).at[s_gidx].add(
                jnp.where(s_valid, vals, 0.0))
        out["gaussians_count"] = scatter_back(stats_entries[0]).astype(jnp.int32)
        out["opacity_important_score"] = scatter_back(stats_entries[1])
        out["T_alpha_important_score"] = scatter_back(stats_entries[2])
        out["touched_pixels"] = scatter_back(stats_entries[0]).astype(jnp.int32)
        out["transmittance_sum"] = scatter_back(stats_entries[3])
    return out
