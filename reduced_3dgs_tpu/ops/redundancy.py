"""Redundancy-metric ops for resolution-aware pruning.

TPU-native equivalents of the reference CUDA ops in
/root/reference/submodules/diff-gaussian-rasterization/reduced_3dgs/redundancy_score.cu
(bindings used by /root/reference/reduced_3dgs/pruning/trainer.py:11-42):

  * find_minimum_projected_pixel_size  (transformCentersNDC, :45-116)
  * sphere_ellipsoid_intersection      (:119-206)
  * allocate_minimum_redundancy_value  (findMinimumRedundancyValue, :6-27)

The atomicMin scatter becomes a deterministic segment-min.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import projection as proj


def find_minimum_projected_pixel_size(
    full_proj: jnp.ndarray,        # [K,4,4] row-vector world->NDC
    inv_full_proj: jnp.ndarray,    # [K,4,4]
    xyz: jnp.ndarray,              # [N,3]
    image_heights: jnp.ndarray,    # [K] int
    image_widths: jnp.ndarray,     # [K] int
    init: float = 10000.0,
) -> jnp.ndarray:
    """Per-point minimum world-space size of one pixel over all cameras.

    Matches transformCentersNDC (redundancy_score.cu:45-116): project the
    center; if inside NDC ([-1,1]^2 x [0,1]), unproject (0,0,z) and
    (2/long_side, 0_or_swap, z) and take the world distance; min over
    cameras, initialised to 10000 (reduced_3dgs.cu:249).
    """
    def per_camera(carry, inputs):
        projm, inv_projm, h, w = inputs
        p_proj = proj.project_points(xyz, projm)                    # [N,3]
        inside = (jnp.all(p_proj <= 1.0, axis=-1)
                  & jnp.all(p_proj >= jnp.array([-1.0, -1.0, 0.0]), axis=-1))
        depth = p_proj[..., 2]

        long_is_w = w > h
        dx = jnp.where(long_is_w, 2.0 / w, 0.0)
        dy = jnp.where(long_is_w, 0.0, 2.0 / h)

        def unproject(x, y, z):
            p = jnp.stack([jnp.broadcast_to(x, z.shape),
                           jnp.broadcast_to(y, z.shape), z], axis=-1)
            hom = proj.transform_points(p, inv_projm)
            return hom[..., :3] / (hom[..., 3:4] + 1e-7)

        start = unproject(0.0, 0.0, depth)
        end = unproject(dx, dy, depth)
        size = jnp.linalg.norm(end - start, axis=-1)
        return jnp.where(inside, jnp.minimum(carry, size), carry), None

    sizes, _ = jax.lax.scan(
        per_camera, jnp.full((xyz.shape[0],), init, xyz.dtype),
        (full_proj, inv_full_proj,
         image_heights.astype(jnp.float32), image_widths.astype(jnp.float32)))
    return sizes


def sphere_ellipsoid_intersection(
    xyz: jnp.ndarray,              # [N,3]
    scales: jnp.ndarray,           # [N,3] activated
    rotations: jnp.ndarray,        # [N,4] normalised quaternions
    neighbour_indices: jnp.ndarray,  # [N,K] int32
    sphere_radius: jnp.ndarray,    # [N]
    use_neighbour_rotation: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Count neighbours whose (radius-augmented) ellipsoid contains the point.

    Matches sphereEllipsoidIntersection (redundancy_score.cu:119-160). Note
    the reference evaluates the test in the rotation frame of the QUERY point
    (`R[idx]`, redundancy_score.cu:147), not the neighbour's; we reproduce
    that by default (use_neighbour_rotation=False) for behavioral parity and
    expose the arguably-intended variant behind the flag.

    Returns:
      (counts [N] int32, mask [N,K] bool).
    """
    # Layout note: [N, K, 3] intermediates put 3 on the minor (lane) axis,
    # which TPU tiling pads to 128 — a 42x memory blowup (~30 GB at 2M
    # points). Work in [K, N] planes instead: K=30 pads only to 32
    # sublanes, N rides the lane axis unpadded.
    n, k = neighbour_indices.shape
    nbr_flat = neighbour_indices.T.reshape(-1)                       # [K*N]
    xyzT = xyz.T                                                     # [3,N]
    # 1-D-index row gathers (2-D indices lower to an index-major minor-3
    # intermediate that TPU tiling pads 42x; see ops/knn._best_k_rows).
    gath = jnp.take(xyzT, nbr_flat, axis=1).reshape(3, k, n)
    diff = [xyzT[a][None, :] - gath[a] for a in range(3)]            # 3x [K,N]
    sg = jnp.take(scales.T, nbr_flat, axis=1).reshape(3, k, n)
    aug = [sg[a] + sphere_radius[None, :] for a in range(3)]         # 3x [K,N]
    if use_neighbour_rotation:
        # R of each NEIGHBOUR: gather quaternion components as [K, N]
        # planes and expand the rotation rows inline.
        qg = jnp.take(rotations.T, nbr_flat, axis=1).reshape(4, k, n)
        Rn = _quat_rot_rows([qg[a] for a in range(4)])               # [3][3] of [K,N]
        local = [sum(diff[i] * Rn[i][j] for i in range(3))
                 for j in range(3)]
    else:
        R = proj.quat_to_rotmat(rotations)                           # [N,3,3]
        local = [sum(diff[i] * R[:, i, j][None, :] for i in range(3))
                 for j in range(3)]
    val = sum((local[j] * local[j]) / (aug[j] * aug[j])
              for j in range(3))                                     # [K,N]
    mask = (val < 1.0).T                                             # [N,K]
    return jnp.sum(mask, axis=1).astype(jnp.int32), mask


def _quat_rot_rows(q):
    """Rotation-matrix entries R[i][j] from quaternion component planes
    q = [r, x, y, z] (each an arbitrary-shape array), matching
    proj.quat_to_rotmat's convention elementwise."""
    r, x, y, z = q
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ]


def allocate_minimum_redundancy_value(
    redundancy_values: jnp.ndarray,   # [N] int32
    neighbour_indices: jnp.ndarray,   # [N,K] int32
    intersection_mask: jnp.ndarray,   # [N,K] bool
    num_points: Optional[int] = None,
) -> jnp.ndarray:
    """For each point, the minimum redundancy value among all points that list
    it as an intersecting neighbour (findMinimumRedundancyValue,
    redundancy_score.cu:6-27; init value = N, reduced_3dgs.cu:276)."""
    n = num_points or redundancy_values.shape[0]
    flat_idx = neighbour_indices.reshape(-1)
    flat_val = jnp.broadcast_to(redundancy_values[:, None],
                                neighbour_indices.shape).reshape(-1)
    flat_val = jnp.where(intersection_mask.reshape(-1), flat_val, n)
    return jax.ops.segment_min(flat_val, flat_idx, num_segments=n,
                               indices_are_sorted=False).astype(jnp.int32)
