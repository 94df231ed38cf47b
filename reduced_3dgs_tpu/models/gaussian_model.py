"""Gaussian point-cloud model.

TPU-native equivalent of the reference base package's `GaussianModel`
(API reconstructed from usage across /root/reference/reduced_3dgs — see
SURVEY.md section 1.4): raw parameter arrays `_xyz [N,3]`,
`_features_dc [N,1,3]`, `_features_rest [N,M,3]`, `_scaling [N,3]` (log),
`_rotation [N,4]`, `_opacity [N,1]` (logit); activated properties; PLY I/O in
the standard 3DGS layout; densify hooks `update_points_add` /
`update_points_remove`; `forward(camera)` rendering through the tiled
pipeline.

The model is a thin mutable host-side container of device arrays. Everything
compute-heavy is functional: `parameters()` returns the dict pytree the
trainers differentiate, and `set_parameters` writes results back.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset.camera import Camera
from ..ops.rasterize.common import RenderSettings
from ..ops.rasterize.reference import render_reference
from ..ops.rasterize.tiled import default_key_buffer_size, render_tiled
from . import ply as plyio

PARAM_NAMES = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")


def resolve_backend(backend: str) -> str:
    """'auto' -> 'pallas' on accelerator platforms, 'tiled' (XLA) on CPU.

    The Pallas kernels are the fast path on real TPUs (including the
    remote 'axon' platform, whose default_backend() is NOT 'tpu' — a
    literal == 'tpu' check silently routed real-chip training through the
    XLA path); on CPU they would need interpret mode, so the XLA
    segmented-scan path is the default there. Stable per process (the
    platform never changes), so jit cache keys may use the resolved
    value. The Pallas kernels are TPU/Mosaic-specific (SMEM scratch,
    scalar prefetch): on a non-TPU accelerator backend (cuda/rocm) they
    would fail at lowering, so anything that is not TPU-like falls back
    to the XLA tiled path."""
    if backend == "auto":
        import jax
        plat = jax.default_backend()
        return "pallas" if plat in ("tpu", "axon") else "tiled"
    return backend


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


class GaussianModel:
    """Standard 3DGS model (max SH degree `sh_degree`, default 3)."""

    def __init__(self, sh_degree: int = 3, render_backend: str = "auto"):
        self.max_sh_degree = int(sh_degree)
        self.active_sh_degree = int(sh_degree)
        self.scale_modifier = 1.0
        self.debug = False
        self.render_backend = render_backend
        self.spatial_lr_scale = 1.0
        n_rest = (self.max_sh_degree + 1) ** 2 - 1
        self._xyz = jnp.zeros((0, 3), jnp.float32)
        self._features_dc = jnp.zeros((0, 1, 3), jnp.float32)
        self._features_rest = jnp.zeros((0, n_rest, 3), jnp.float32)
        self._scaling = jnp.zeros((0, 3), jnp.float32)
        self._rotation = jnp.zeros((0, 4), jnp.float32)
        self._opacity = jnp.zeros((0, 1), jnp.float32)
        # static key-buffer size used for rendering; grown on overflow
        self._key_buffer_size: Optional[int] = None
        # Capacity-padding support: arrays may be longer than the live count.
        # None means "all rows live" (plain, non-training usage).
        self._n_alive: Optional[int] = None

    # --- activations (quantizer relies on these names, quantizer.py:134-138)
    scaling_activation = staticmethod(jnp.exp)
    scaling_inverse_activation = staticmethod(jnp.log)
    opacity_activation = staticmethod(jax.nn.sigmoid)
    opacity_inverse_activation = staticmethod(inverse_sigmoid)

    # --- properties matching the reference API ---------------------------
    @property
    def get_xyz(self):
        return self._xyz

    @property
    def get_scaling(self):
        return self.scaling_activation(self._scaling)

    @property
    def get_rotation(self):
        # rsqrt(|q|^2 + eps): maximum(|q|, eps) yields NaN GRADIENTS at
        # q = 0 (0-selector times d|q|/dq = 0 * NaN) on dead
        # capacity-padding rows, and grads must stay finite there because
        # the trainer masks them by multiply (functional.mask_rows). The
        # additive-eps form has a finite gradient at q = 0 with no select
        # in the hot path (the r03 double-where cost ~23 ms/step in the
        # bench gradient, tools/bisect_body.py).
        sq = jnp.sum(self._rotation * self._rotation, axis=-1, keepdims=True)
        return self._rotation * jax.lax.rsqrt(sq + 1e-24)

    @property
    def get_opacity(self):
        return self.opacity_activation(self._opacity)

    @property
    def get_features(self):
        return jnp.concatenate([self._features_dc, self._features_rest], axis=1)

    @property
    def num_points(self) -> int:
        if self._n_alive is not None:
            return int(self._n_alive)
        return int(self._xyz.shape[0])

    @property
    def capacity(self) -> int:
        return int(self._xyz.shape[0])

    @property
    def alive_mask(self):
        if self._n_alive is None:
            return None
        return jnp.arange(self.capacity) < self._n_alive

    def __len__(self):
        return self.num_points

    # --- non-trainable per-Gaussian state (degrees, ...) --------------------
    def aux_state(self) -> Dict[str, jnp.ndarray]:
        return {}

    def aux_set(self, aux: Dict[str, jnp.ndarray]):
        del aux
        return self

    def aux_for_new_points(self, m: int) -> Dict[str, jnp.ndarray]:
        """aux_state rows for m newly densified points."""
        del m
        return {}

    # --- parameter pytree --------------------------------------------------
    def parameters(self) -> Dict[str, jnp.ndarray]:
        return {
            "xyz": self._xyz,
            "features_dc": self._features_dc,
            "features_rest": self._features_rest,
            "scaling": self._scaling,
            "rotation": self._rotation,
            "opacity": self._opacity,
        }

    def set_parameters(self, params: Dict[str, jnp.ndarray]):
        self._xyz = params["xyz"]
        self._features_dc = params["features_dc"]
        self._features_rest = params["features_rest"]
        self._scaling = params["scaling"]
        self._rotation = params["rotation"]
        self._opacity = params["opacity"]
        return self

    def to(self, device):  # API parity; JAX manages placement
        return self

    # --- feature masking hook (overridden by VariableSHGaussianModel) ------
    def masked_features(self, params: Dict[str, jnp.ndarray],
                        aux: Optional[Dict[str, jnp.ndarray]] = None) -> jnp.ndarray:
        """[N, 1+M, 3] SH features as used by the renderer."""
        del aux
        return jnp.concatenate([params["features_dc"], params["features_rest"]], 1)

    # --- construction -------------------------------------------------------
    def create_from_pcd(self, points: np.ndarray, colors: np.ndarray,
                        scene_extent: float = 1.0):
        """Initialise from a sparse point cloud (COLMAP init).

        Scales are set from mean 3-NN distances (the reference base package
        calls simple-knn's distCUDA2 for this; ours is ops/knn.py).
        """
        from ..ops.knn import mean_knn_dist_sq
        points = jnp.asarray(points, jnp.float32)
        colors = jnp.asarray(colors, jnp.float32)
        n = points.shape[0]
        fused_color = (colors - 0.5) / 0.28209479177387814
        n_rest = (self.max_sh_degree + 1) ** 2 - 1
        dist2 = jnp.maximum(mean_knn_dist_sq(points), 1e-7)
        scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
        self._xyz = points
        self._features_dc = fused_color[:, None, :]
        self._features_rest = jnp.zeros((n, n_rest, 3), jnp.float32)
        self._scaling = scales
        self._rotation = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
        self._opacity = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
        self.spatial_lr_scale = float(scene_extent)
        self._n_alive = None
        return self

    # --- densification hooks (reference gaussian_model.py:42-80 contract) --
    def update_points_add(self, xyz, features_dc, features_rest, scaling,
                          rotation, opacity):
        """Replace parameter tensors after appending new points."""
        self._xyz, self._features_dc = xyz, features_dc
        self._features_rest, self._scaling = features_rest, scaling
        self._rotation, self._opacity = rotation, opacity
        return self

    def update_points_remove(self, removed_mask, xyz, features_dc,
                             features_rest, scaling, rotation, opacity):
        del removed_mask
        self._xyz, self._features_dc = xyz, features_dc
        self._features_rest, self._scaling = features_rest, scaling
        self._rotation, self._opacity = rotation, opacity
        return self

    # --- rendering ----------------------------------------------------------
    def render_settings(self, camera: Camera) -> RenderSettings:
        return RenderSettings(
            image_height=camera.image_height,
            image_width=camera.image_width,
            tanfovx=jnp.tan(camera.FoVx * 0.5),
            tanfovy=jnp.tan(camera.FoVy * 0.5),
            bg=camera.bg_color,
            scale_modifier=self.scale_modifier,
            viewmatrix=camera.world_view_transform,
            projmatrix=camera.full_proj_transform,
            campos=camera.camera_center,
            sh_degree=self.active_sh_degree,
        )

    def render_array_args(self, params: Dict[str, jnp.ndarray], aux=None):
        rot = params["rotation"]
        # rsqrt(|q|^2 + eps), same rationale as get_rotation: dead zero
        # rows must yield FINITE rotation grads for the multiply-masking
        # in functional.mask_rows, and the additive-eps form does so
        # without the select that cost ~23 ms/step in r03.
        sq = jnp.sum(rot * rot, axis=-1, keepdims=True)
        rot = rot * jax.lax.rsqrt(sq + 1e-24)
        return (params["xyz"], params["opacity"],
                self.scaling_activation(params["scaling"]), rot,
                self.masked_features(params, aux))

    def render(self, params: Dict[str, jnp.ndarray], camera: Camera,
               aux: Optional[Dict[str, jnp.ndarray]] = None,
               alive: Optional[jnp.ndarray] = None,
               mean2d_offset_ndc: Optional[jnp.ndarray] = None,
               with_stats: bool = False,
               key_buffer_size: Optional[int] = None):
        """Functional render from an explicit parameter pytree."""
        settings = self.render_settings(camera)
        args = self.render_array_args(params, aux)
        backend = resolve_backend(self.render_backend)
        if backend == "reference":
            return render_reference(*args, settings, alive=alive,
                                    mean2d_offset_ndc=mean2d_offset_ndc,
                                    with_stats=with_stats)
        return render_tiled(*args, settings, alive=alive,
                            mean2d_offset_ndc=mean2d_offset_ndc,
                            with_stats=with_stats,
                            key_buffer_size=key_buffer_size or self._key_buffer_size,
                            use_pallas=(backend == "pallas"))

    def render_band(self, params, settings, *, aux=None, alive=None,
                    tile_row_offset, tile_rows: int,
                    key_buffer_size: int,
                    mean2d_offset_ndc=None, with_stats: bool = False,
                    use_pallas: Optional[bool] = None):
        """Render a horizontal band of tile rows (multi-chip pixel sharding).

        Uniform dispatch point for the sharded trainer / sharded stats
        sweeps (parallel/): subclasses with a different splatting forward
        model (e.g. 2DGS surfels) override this to route to their renderer,
        so every model family shards the same way."""
        args = self.render_array_args(params, aux)
        if use_pallas is None:
            use_pallas = resolve_backend("auto") == "pallas"
        return render_tiled(*args, settings, alive=alive,
                            mean2d_offset_ndc=mean2d_offset_ndc,
                            with_stats=with_stats,
                            key_buffer_size=key_buffer_size,
                            tile_row_offset=tile_row_offset,
                            tile_rows=tile_rows,
                            use_pallas=use_pallas)

    def _jit_render(self, with_stats: bool, key_buffer_size, has_alive: bool,
                    image_hw, sh_degree: int):
        """Cached jitted render entry. Every device array is an argument —
        capturing them as jit constants degrades the TPU dispatch path (see
        ops/projection.py transform_points note) — and eager rendering is
        unusable over a remote TPU (each op is a tunnel round trip)."""
        cache = getattr(self, "_jit_render_cache", None)
        if cache is None:
            cache = self._jit_render_cache = {}
        key = (with_stats, key_buffer_size, has_alive, image_hw, sh_degree,
               resolve_backend(self.render_backend), self.capacity)
        if key not in cache:
            import jax as _jax

            def fn(params, aux, camera, alive):
                return self.render(params, camera, aux=aux, alive=alive,
                                   with_stats=with_stats,
                                   key_buffer_size=key_buffer_size)

            cache[key] = _jax.jit(fn)
        return cache[key]

    def forward(self, camera: Camera, **kwargs):
        """Render with the model's own parameters (jitted), with automatic
        key-buffer regrowth on overflow (the reference's lazy buffer resize,
        rasterizer_impl.cu:163-202, done host-side at a jit boundary)."""
        aux = kwargs.pop("aux", self.aux_state())
        alive = kwargs.pop("alive", self.alive_mask)
        with_stats = kwargs.pop("with_stats", False)
        kb = kwargs.pop("key_buffer_size", None) or self._key_buffer_size
        if kwargs:
            # Uncommon arguments (offsets, precomputed colors): fall back to
            # the unjitted functional path.
            return self.render(self.parameters(), camera, aux=aux,
                               alive=alive, with_stats=with_stats,
                               key_buffer_size=kb, **kwargs)
        while True:
            fn = self._jit_render(with_stats, kb,
                                  alive is not None,
                                  (camera.image_height, camera.image_width),
                                  self.active_sh_degree)
            out = fn(self.parameters(), aux, camera, alive)
            if "overflow" not in out or not bool(out["overflow"]):
                return out
            tiles = ((-(-camera.image_width // 16))
                     * (-(-camera.image_height // 16)))
            cur = kb or default_key_buffer_size(
                self.capacity, -(-camera.image_width // 16),
                -(-camera.image_height // 16))
            kb = min(cur * 2, max(self.num_points, 1) * tiles)
            self._key_buffer_size = kb

    def __call__(self, camera: Camera, **kwargs):
        return self.forward(camera, **kwargs)

    def mark_visible(self, camera: Camera) -> jnp.ndarray:
        """Frustum visibility of each point (reference
        GaussianRasterizer.markVisible, diff_gaussian_rasterization/__init__.py:188-197)."""
        from ..ops.rasterize.common import mark_visible
        return mark_visible(self._xyz, camera.world_view_transform)

    # --- PLY I/O (standard 3DGS layout) -------------------------------------
    def ply_arrays(self):
        n = self.num_points
        xyz = np.asarray(self._xyz, np.float32)[:n]
        f_dc = np.asarray(self._features_dc, np.float32)[:n].reshape(n, -1)
        # 3DGS PLY stores f_rest transposed: channel-major (M*3 with channel
        # varying slowest), matching the reference ecosystem.
        f_rest = np.asarray(self._features_rest, np.float32)[:n].transpose(0, 2, 1).reshape(n, -1)
        opacities = np.asarray(self._opacity, np.float32)[:n]
        scale = np.asarray(self._scaling, np.float32)[:n]
        rotation = np.asarray(self._rotation, np.float32)[:n]
        return xyz, f_dc, f_rest, opacities, scale, rotation

    def save_ply(self, path: str):
        import os
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        xyz, f_dc, f_rest, opacities, scale, rotation = self.ply_arrays()
        n = xyz.shape[0]
        fields = OrderedDict()
        fields["x"], fields["y"], fields["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        for i, nm in enumerate(["nx", "ny", "nz"]):
            fields[nm] = np.zeros(n, np.float32)
        for i in range(f_dc.shape[1]):
            fields[f"f_dc_{i}"] = f_dc[:, i]
        for i in range(f_rest.shape[1]):
            fields[f"f_rest_{i}"] = f_rest[:, i]
        fields["opacity"] = opacities[:, 0]
        for i in range(scale.shape[1]):
            fields[f"scale_{i}"] = scale[:, i]
        for i in range(rotation.shape[1]):
            fields[f"rot_{i}"] = rotation[:, i]
        vertex = plyio.fields_to_struct(fields, list(fields.keys()))
        plyio.write_ply(path, OrderedDict(vertex=vertex))

    def load_ply(self, path: str):
        elements = plyio.read_ply(path)
        v = elements["vertex"]
        n = len(v)
        xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
        n_rest = (self.max_sh_degree + 1) ** 2 - 1
        f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1).astype(np.float32)
        rest_names = sorted(
            [nm for nm in v.dtype.names if nm.startswith("f_rest_")],
            key=lambda nm: int(nm.split("_")[-1]))
        if rest_names:
            f_rest = np.stack([v[nm] for nm in rest_names], axis=1).astype(np.float32)
            f_rest = f_rest.reshape(n, 3, -1).transpose(0, 2, 1)
        else:
            f_rest = np.zeros((n, n_rest, 3), np.float32)
        opacity = v["opacity"].astype(np.float32)[:, None]
        scale = np.stack([v[f"scale_{i}"] for i in range(3)], axis=1).astype(np.float32)
        rot = np.stack([v[f"rot_{i}"] for i in range(4)], axis=1).astype(np.float32)
        self._xyz = jnp.asarray(xyz)
        self._features_dc = jnp.asarray(f_dc[:, None, :])
        self._features_rest = jnp.asarray(f_rest)
        self._opacity = jnp.asarray(opacity)
        self._scaling = jnp.asarray(scale)
        self._rotation = jnp.asarray(rot)
        self._n_alive = None
        return self


class CameraTrainableGaussianModel(GaussianModel):
    """Variant whose forward keeps gradients flowing to camera tensors.

    In this functional framework every render already differentiates through
    the camera matrices; the distinct class exists for API parity with the
    reference backend registry (prepare.py:18-30) and as a marker used by
    CameraTrainerWrapper.
    """
    pass
