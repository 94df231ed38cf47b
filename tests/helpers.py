"""Shared test fixtures: synthetic cameras and Gaussian clouds."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.ops import projection as proj
from reduced_3dgs_tpu.ops.rasterize.common import RenderSettings


def make_settings(height=64, width=64, fovx=math.radians(60), fovy=None,
                  R=None, T=None, bg=(0.0, 0.0, 0.0), sh_degree=3,
                  scale_modifier=1.0):
    """Camera at `T` with world->cam rotation `R` (defaults: identity at origin
    looking down +z in view space)."""
    if fovy is None:
        fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    R = np.eye(3, dtype=np.float32) if R is None else np.asarray(R, np.float32)
    T = np.zeros(3, np.float32) if T is None else np.asarray(T, np.float32)
    world_view = proj.world_view_transform_from_rt(jnp.asarray(R), jnp.asarray(T))
    projm = proj.build_projection_matrix(0.01, 100.0, fovx, fovy)
    full_proj = world_view @ projm
    campos = proj.camera_center_from_world_view(world_view)
    return RenderSettings(
        image_height=height, image_width=width,
        tanfovx=jnp.float32(math.tan(fovx / 2)),
        tanfovy=jnp.float32(math.tan(fovy / 2)),
        bg=jnp.asarray(bg, jnp.float32),
        scale_modifier=scale_modifier,
        viewmatrix=world_view, projmatrix=full_proj, campos=campos,
        sh_degree=sh_degree)


def random_cloud(key, n, spread=0.5, z_center=3.0, z_spread=0.8,
                 scale_lo=-4.5, scale_hi=-2.5, max_sh_degree=3):
    """Random Gaussians in front of the default camera.

    Returns dict of raw (unactivated) parameters plus activated helpers.
    """
    ks = jax.random.split(key, 6)
    m = (max_sh_degree + 1) ** 2
    xyz = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-spread, maxval=spread),
        z_center + jax.random.uniform(ks[1], (n, 1), minval=-z_spread, maxval=z_spread),
    ], axis=1)
    scaling = jax.random.uniform(ks[2], (n, 3), minval=scale_lo, maxval=scale_hi)
    rotation = jax.random.normal(ks[3], (n, 4)) * 0.1 + jnp.array([1.0, 0, 0, 0])
    opacity = jax.random.uniform(ks[4], (n, 1), minval=-1.0, maxval=3.0)
    features = jax.random.normal(ks[5], (n, m, 3)) * 0.3
    features = features.at[:, 0, :].add(0.5)
    return dict(
        xyz=xyz, scaling=scaling, rotation=rotation, opacity=opacity,
        features=features,
        scales=jnp.exp(scaling),
        rotations=rotation / jnp.linalg.norm(rotation, axis=-1, keepdims=True),
    )
