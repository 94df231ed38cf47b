"""Camera pytree and constructors.

Equivalent of the reference base package's `Camera` / `build_camera`
(fields reconstructed from usage: /root/reference/reduced_3dgs/importance/trainer.py:27-44,
/root/reference/reduced_3dgs/train.py:50-56). Matrices are stored in the
row-vector convention (see ops/projection.py).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.struct
import jax.numpy as jnp
import numpy as np

from ..ops import projection as proj


@flax.struct.dataclass
class Camera:
    # Static (shape-determining / python) fields:
    image_height: int = flax.struct.field(pytree_node=False)
    image_width: int = flax.struct.field(pytree_node=False)
    # Traced fields:
    FoVx: jnp.ndarray = None
    FoVy: jnp.ndarray = None
    R: jnp.ndarray = None                      # [3,3] world->view rotation block
    T: jnp.ndarray = None                      # [3] view-space translation
    world_view_transform: jnp.ndarray = None   # [4,4] row-vector
    full_proj_transform: jnp.ndarray = None    # [4,4] row-vector
    camera_center: jnp.ndarray = None          # [3]
    bg_color: jnp.ndarray = None               # [3]
    ground_truth_image: Optional[jnp.ndarray] = None       # [3,H,W]
    ground_truth_image_mask: Optional[jnp.ndarray] = None  # [1,H,W]
    ground_truth_depth: Optional[jnp.ndarray] = None       # [H,W]
    custom_data: Optional[dict] = flax.struct.field(pytree_node=False, default=None)


def build_camera(
    image_height: int,
    image_width: int,
    FoVx: float,
    FoVy: float,
    R=None,
    T=None,
    bg_color=(0.0, 0.0, 0.0),
    ground_truth_image=None,
    ground_truth_image_mask=None,
    ground_truth_depth=None,
    znear: float = 0.01,
    zfar: float = 100.0,
    custom_data=None,
    device=None,  # accepted for API parity; placement is managed by JAX
) -> Camera:
    """Construct a Camera with derived transforms (reference `build_camera`,
    importance/trainer.py:89-93 usage)."""
    del device
    R = jnp.eye(3, dtype=jnp.float32) if R is None else jnp.asarray(R, jnp.float32)
    T = jnp.zeros(3, jnp.float32) if T is None else jnp.asarray(T, jnp.float32)
    world_view = proj.world_view_transform_from_rt(R, T)
    projm = proj.build_projection_matrix(znear, zfar, float(FoVx), float(FoVy))
    full_proj = world_view @ projm
    camera_center = proj.camera_center_from_world_view(world_view)
    return Camera(
        image_height=int(image_height),
        image_width=int(image_width),
        FoVx=jnp.float32(FoVx),
        FoVy=jnp.float32(FoVy),
        R=R, T=T,
        world_view_transform=world_view,
        full_proj_transform=full_proj,
        camera_center=camera_center,
        bg_color=jnp.asarray(bg_color, jnp.float32),
        ground_truth_image=ground_truth_image,
        ground_truth_image_mask=ground_truth_image_mask,
        ground_truth_depth=ground_truth_depth,
        custom_data=custom_data,
    )


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def camera_to_json(idx: int, camera: Camera, img_name: str = "") -> dict:
    """Vanilla-3DGS cameras.json entry (W2C decomposed to C2W pos/rot)."""
    R = np.asarray(camera.R)
    T = np.asarray(camera.T)
    W2C = np.eye(4, dtype=np.float64)
    # row-vector storage -> column-vector math matrix is the transpose
    W2C[:3, :3] = R.T
    W2C[:3, 3] = T
    C2W = np.linalg.inv(W2C)
    pos = C2W[:3, 3]
    rot = C2W[:3, :3]
    return {
        "id": idx,
        "img_name": img_name or f"{idx:05d}",
        "width": camera.image_width,
        "height": camera.image_height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": fov2focal(float(camera.FoVy), camera.image_height),
        "fx": fov2focal(float(camera.FoVx), camera.image_width),
    }


def camera_from_json(entry: dict, **overrides) -> Camera:
    pos = np.array(entry["position"], np.float64)
    rot = np.array(entry["rotation"], np.float64)       # C2W rotation
    C2W = np.eye(4)
    C2W[:3, :3] = rot
    C2W[:3, 3] = pos
    W2C = np.linalg.inv(C2W)
    R = W2C[:3, :3].T                                   # stored convention
    T = W2C[:3, 3]
    fovx = focal2fov(entry["fx"], entry["width"])
    fovy = focal2fov(entry["fy"], entry["height"])
    kwargs = dict(
        image_height=entry["height"], image_width=entry["width"],
        FoVx=fovx, FoVy=fovy, R=R, T=T)
    kwargs.update(overrides)
    return build_camera(**kwargs)


def strip_images(camera: Camera) -> Camera:
    """Drop the (large, sweep-irrelevant) image payloads from a camera.

    custom_data is dropped too: it is a STATIC pytree field, so two
    cameras with different custom_data have different tree structures
    and cannot be stacked."""
    return camera.replace(ground_truth_image=None,
                          ground_truth_image_mask=None,
                          ground_truth_depth=None,
                          custom_data=None)


def stackable(cameras) -> bool:
    """True when the cameras share static shape fields, so their traced
    leaves can be stacked into one batched pytree for a lax.scan sweep."""
    cams = list(cameras)
    if len(cams) < 2:
        return len(cams) == 1
    h, w = cams[0].image_height, cams[0].image_width
    return all(c.image_height == h and c.image_width == w for c in cams)


def stack_cameras(cameras) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree
    (leading axis = camera) for single-dispatch lax.scan sweeps: a
    per-camera dispatch loop pays one remote-tunnel round trip per camera
    (~25 ms measured on the axon v5e link) — 250-camera sweeps must be ONE
    program. Image payloads are stripped (sweeps do not read them)."""
    import jax
    cams = [strip_images(c) for c in cameras]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
