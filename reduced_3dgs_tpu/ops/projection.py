"""Camera/Gaussian projection math, TPU-native.

Pure shape-polymorphic JAX functions covering the per-Gaussian geometry of the
reference preprocess kernel
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:162-241,353-456
and auxiliary.h:41-159). All matrices follow the torch/3DGS storage
convention: `world_view_transform` and `full_proj_transform` are stored such
that points transform as ROW vectors, `p' = [p, 1] @ M` (this is what the
reference CUDA reads via transformPoint4x4, auxiliary.h:68-77, and what
cameras.json-compatible tooling expects).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BLOCK_X, BLOCK_Y, COV2D_LOWPASS, NEAR_CULL_Z


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (r, x, y, z) -> 3x3 rotation matrix.

    Matches the reference convention (forward.cu:223-227; same layout as the
    vanilla-3DGS `build_rotation`). Input is expected to be normalised by the
    caller; the kernel itself never normalises (forward.cu:216).

    Args:
      q: [..., 4] quaternions.

    Returns:
      [..., 3, 3] rotation matrices (acting on column vectors, R @ p).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scales: jnp.ndarray, scale_modifier, rotations: jnp.ndarray) -> jnp.ndarray:
    """Scale + quaternion -> world-space 3x3 covariance (forward.cu:207-241).

    Sigma = R diag(s)^2 R^T with s = scale_modifier * scales.

    Args:
      scales: [..., 3] activated (positive) scales.
      scale_modifier: scalar.
      rotations: [..., 4] normalised quaternions.

    Returns:
      [..., 3, 3] symmetric covariance matrices.
    """
    R = quat_to_rotmat(rotations)
    s = scales * scale_modifier
    RS = R * s[..., None, :]            # R @ diag(s)
    # RS @ RS^T written as a broadcasted contraction (see transform_points
    # for why tiny-contraction matmuls are banned).
    return (RS[..., :, None, 0] * RS[..., None, :, 0]
            + RS[..., :, None, 1] * RS[..., None, :, 1]
            + RS[..., :, None, 2] * RS[..., None, :, 2])


def transform_points(points: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous row-vector transform: [p, 1] @ M -> [..., 4].

    Written as broadcasted multiply-adds, NOT a matmul: [N,3]@[3,4]-shaped
    dot_generals trigger a TPU-runtime pathology that permanently degrades
    the dispatch path of every subsequent executable in the process (~200x,
    observed on v5e via the remote-compile tunnel), and a 3-element
    contraction has no business on the MXU anyway."""
    return (points[..., 0:1] * matrix[0, :] + points[..., 1:2] * matrix[1, :]
            + points[..., 2:3] * matrix[2, :] + matrix[3, :])


def world_to_view(points: jnp.ndarray, viewmatrix: jnp.ndarray) -> jnp.ndarray:
    """World -> camera coordinates (auxiliary.h:58-66 semantics)."""
    return transform_points(points, viewmatrix)[..., :3]


def project_points(points: jnp.ndarray, projmatrix: jnp.ndarray, eps: float = 1e-7):
    """World -> NDC via the full projection matrix (forward.cu:395-398).

    Returns:
      p_proj: [..., 3] NDC coordinates.
    """
    p_hom = transform_points(points, projmatrix)
    p_w = 1.0 / (p_hom[..., 3:4] + eps)
    return p_hom[..., :3] * p_w


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC [-1, 1] -> continuous pixel coordinate (auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def build_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray, viewmatrix: jnp.ndarray,
                focal_x, focal_y, tan_fovx, tan_fovy,
                valid=None) -> jnp.ndarray:
    """EWA 2D screen-space covariance (forward.cu:162-202).

    Includes the 1.3*tan_fov frustum clamp on the view-space point (whose
    zero-gradient-outside behavior, backward.cu:208-209, arises from clip)
    and the +0.3 pixel low-pass on the diagonal.

    Args:
      means3d: [..., 3] world-space centers.
      cov3d: [..., 3, 3] world covariances.
      viewmatrix: [4, 4] row-vector world->view transform.
      valid: optional [...] bool; rows that are culled anyway (near-plane
        fail / dead slots). Their view z is replaced by 1 BEFORE the 1/tz
        divisions: a dead slot sitting exactly on the camera plane (tz=0)
        otherwise produces 0/0 = NaN in the forward, and while per-Gaussian
        parameter grads are row-masked afterwards, grads of SHARED inputs
        (the camera matrices in trainable-camera modes) sum over all rows
        and would be poisoned. The reference never evaluates culled rows at
        all (forward.cu:365-368); this gate is the vectorised equivalent.

    Returns:
      [..., 3] packed (cov_xx, cov_xy, cov_yy).
    """
    t = world_to_view(means3d, viewmatrix)
    tz = t[..., 2]
    if valid is not None:
        tz = jnp.where(valid, tz, 1.0)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    # J: 2x3 Jacobian of the perspective projection at (tx, ty, tz), rows
    # expressed component-wise. Batched [N,2,3]@[3,3]@[N,3,3] matmul chains
    # must NOT be used here: tiny-contraction dot_generals compile to a code
    # path that permanently degrades dispatch on the TPU runtime (measured
    # 200x slowdown of every subsequent executable in the process), besides
    # being MXU-hostile. Everything below is plain vectorized arithmetic.
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz * inv_tz
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz * inv_tz
    # Row-vector storage: p_view = p @ V[:3,:3], so the world->view rotation
    # acting on column vectors is W = V[:3,:3]^T; W[r, c] = viewmatrix[c, r].
    W = viewmatrix[:3, :3]
    # T = J @ W, rows T0 = j00*W0 + j02*W2, T1 = j11*W1 + j12*W2 with Wr the
    # r-th row of W^T = the r-th column of viewmatrix[:3,:3].
    T0 = j00[..., None] * W[:, 0] + j02[..., None] * W[:, 2]   # [..., 3]
    T1 = j11[..., None] * W[:, 1] + j12[..., None] * W[:, 2]
    # cov2d = T Sigma T^T via the quadratic form on each row pair.
    S_T0 = (cov3d[..., :, 0] * T0[..., None, 0]
            + cov3d[..., :, 1] * T0[..., None, 1]
            + cov3d[..., :, 2] * T0[..., None, 2])           # [..., 3]
    S_T1 = (cov3d[..., :, 0] * T1[..., None, 0]
            + cov3d[..., :, 1] * T1[..., None, 1]
            + cov3d[..., :, 2] * T1[..., None, 2])
    cov_xx = jnp.sum(T0 * S_T0, axis=-1) + COV2D_LOWPASS
    cov_xy = jnp.sum(T0 * S_T1, axis=-1)
    cov_yy = jnp.sum(T1 * S_T1, axis=-1) + COV2D_LOWPASS
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def invert_cov2d(cov2d: jnp.ndarray):
    """Packed 2D covariance -> (conic, det) (forward.cu:418-423).

    conic = (A, B, C) such that the Gaussian exponent is
    -0.5*(A dx^2 + C dy^2) - B dx dy.
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    # Double-where: 1/det evaluated at det==0 has an infinite derivative,
    # which turns the zero cotangent of the masked branch into 0*inf = NaN
    # for grads of inputs shared across rows (camera matrices).
    det_safe = jnp.where(det != 0.0, det, 1.0)
    det_inv = jnp.where(det != 0.0, 1.0 / det_safe, 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)
    return conic, det


def cov2d_lambda_max(cov2d: jnp.ndarray, det: jnp.ndarray) -> jnp.ndarray:
    """Max eigenvalue of the 2x2 screen-space covariance (forward.cu:429-431)."""
    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    return mid + disc


def cov2d_extent(cov2d: jnp.ndarray, det: jnp.ndarray) -> jnp.ndarray:
    """Screen-space radius: ceil(3 * sqrt(max eigenvalue)) (forward.cu:429-432)."""
    return jnp.ceil(3.0 * jnp.sqrt(cov2d_lambda_max(cov2d, det)))


def tile_rect(point_image: jnp.ndarray, radius: jnp.ndarray, tiles_x: int, tiles_y: int):
    """Bounding rectangle of overlapped tiles (auxiliary.h:46-56).

    Args:
      point_image: [..., 2] pixel-space centers.
      radius: [...] screen-space radii, or [..., 2] per-axis half-widths
        (the exact AABB of an anisotropic alpha contour, see
        rasterize.common.preprocess).

    Returns:
      (rect_min, rect_max): [..., 2] int32 tile coordinates, max exclusive.
    """
    grid = jnp.array([tiles_x, tiles_y], dtype=jnp.int32)
    block = jnp.array([BLOCK_X, BLOCK_Y], dtype=point_image.dtype)
    if radius.ndim < point_image.ndim:
        radius = radius[..., None]
    rmin = ((point_image - radius) / block).astype(jnp.int32)
    # floor(hi/B) + 1, NOT the reference's (hi + B - 1) / B (auxiliary.h:52):
    # the +B-1 trick equals ceil only for integer hi; with float centers it
    # under-covers by up to one pixel, silently dropping boundary
    # contributions of up to ALPHA_EPS per splat. Harmless under 3-sigma
    # slack, wrong under alpha-tight binning where the rect boundary sits
    # exactly on the 1/255 contour.
    rmax = jnp.floor(
        (point_image + radius) / block).astype(jnp.int32) + 1
    rect_min = jnp.clip(rmin, 0, grid)
    rect_max = jnp.clip(rmax, 0, grid)
    return rect_min, rect_max


def in_frustum(means3d: jnp.ndarray, viewmatrix: jnp.ndarray) -> jnp.ndarray:
    """Near-plane visibility test (auxiliary.h:139-159): view z > 0.2."""
    return world_to_view(means3d, viewmatrix)[..., 2] > NEAR_CULL_Z


def build_projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> jnp.ndarray:
    """Perspective projection matrix in row-vector storage.

    Standard 3DGS convention: NDC x,y in [-1, 1], z in [0, 1], matching the
    NDC assumptions of the redundancy op (redundancy_score.cu:69-70).
    """
    import math
    tan_half_fovx = math.tan(fovx * 0.5)
    tan_half_fovy = math.tan(fovy * 0.5)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    P = jnp.zeros((4, 4), dtype=jnp.float32)
    z_sign = 1.0
    P = P.at[0, 0].set(2.0 * znear / (right - left))
    P = P.at[1, 1].set(2.0 * znear / (top - bottom))
    P = P.at[0, 2].set((right + left) / (right - left))
    P = P.at[1, 2].set((top + bottom) / (top - bottom))
    P = P.at[3, 2].set(z_sign)
    P = P.at[2, 2].set(z_sign * zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    # Column-vector matrix built above; transpose into row-vector storage.
    return P.T


def world_view_transform_from_rt(R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """COLMAP-style (R, T) -> row-vector world_view_transform.

    R is the world->camera rotation as stored by COLMAP/3DGS datasets
    (transposed into world-to-view on the fly, as in vanilla getWorld2View),
    T is the camera-space translation. Returns M with p_view = [p,1] @ M.
    """
    M = jnp.zeros((4, 4), dtype=jnp.float32)
    M = M.at[:3, :3].set(R)          # row-vector: p @ R == R^T-column convention
    M = M.at[3, :3].set(T)
    M = M.at[3, 3].set(1.0)
    return M


def camera_center_from_world_view(world_view: jnp.ndarray) -> jnp.ndarray:
    """Camera position in world space from the row-vector W2V matrix."""
    return jnp.linalg.inv(world_view)[3, :3]


def focals_from_fov(width: int, height: int, tan_fovx, tan_fovy):
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    return focal_x, focal_y
