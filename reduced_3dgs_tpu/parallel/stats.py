"""Sharded event sweeps: importance counters and SH-culling colour moments.

The reference runs its full-dataset statistics sweeps (importance counting,
/root/reference/reduced_3dgs/importance/trainer.py:80-98; SH-culling colour
variance, reduced_3dgs.cu:41-203) as sequential single-GPU loops over every
camera. Here the same sweeps run over the trainer's (data, tile) mesh:

  * the "data" axis processes different cameras of a batch concurrently,
  * the "tile" axis renders horizontal pixel bands of each camera
    (ops/rasterize/tiled.py viewport mode), exactly like the sharded train
    step,
  * per-Gaussian counters come back via psum over "tile" (band partial
    sums -> per-camera totals) then a weighted psum over "data" (batch
    totals); cameras that pad a short final batch get weight 0.

SH-culling note: the single-chip path accumulates West-style running
weighted mean/variance per camera (ops/shculling_stats.py, matching
reduced_3dgs.cu:167-198). Summing across data ranks requires the
order-free equivalent — weighted moment sums (W, sum w*c, sum w*c^2) —
which is algebraically identical and numerically benign at f32 for colour
values O(1) over a few hundred cameras.
"""
from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import config
from ..ops import sh as sh_ops
from ..ops.rasterize import common
from ..ops.rasterize.tiled import default_key_buffer_size
from ..ops.shculling_stats import colours_by_degree
from .sharding import band_layout, batch_cameras, cameras_first


def _camera_batches(cameras, n_data):
    """Group same-size cameras into batches of n_data (+ repeat-padding with
    zero weights)."""
    groups = {}
    for cam in cameras:
        groups.setdefault((cam.image_height, cam.image_width), []).append(cam)
    for (h, w), group in groups.items():
        for i in range(0, len(group), n_data):
            chunk = group[i:i + n_data]
            weights = [1.0] * len(chunk)
            while len(chunk) < n_data:
                chunk.append(chunk[0])
                weights.append(0.0)
            yield (h, w), batch_cameras(chunk), jnp.asarray(weights,
                                                            jnp.float32)


def _build_sweep_fn(model, mesh: Mesh, H: int, W: int, key_buffer: int,
                    moments: bool, max_deg: int):
    n_tile = mesh.shape["tile"]
    band_tiles, _, _ = band_layout(H, n_tile)

    @jax.jit
    def run(params, aux, alive, cameras, weights, features, degrees):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P(), P()),
            out_specs=P(), check_vma=False)
        def go(p, aux_, alive_, camera, wgt, feats, degs):
            camera = cameras_first(camera)
            w_cam = wgt[0]
            row0 = jax.lax.axis_index("tile") * band_tiles
            settings = model.render_settings(camera)
            out = model.render_band(
                p, settings, aux=aux_, alive=alive_, with_stats=True,
                key_buffer_size=key_buffer,
                tile_row_offset=row0, tile_rows=band_tiles,
                use_pallas=jax.default_backend() == "tpu")
            # Band partials -> per-camera totals (replicated over "tile").
            cnt = jax.lax.psum(
                out["gaussians_count"].astype(jnp.float32), "tile")
            op_score = jax.lax.psum(out["opacity_important_score"], "tile")
            ta_score = jax.lax.psum(out["T_alpha_important_score"], "tile")
            touched = jax.lax.psum(
                out["touched_pixels"].astype(jnp.float32), "tile")
            transm = jax.lax.psum(out["transmittance_sum"], "tile")

            res = {
                "count": jax.lax.psum(w_cam * cnt, "data"),
                "opacity_score": jax.lax.psum(w_cam * op_score, "data"),
                "t_alpha_score": jax.lax.psum(w_cam * ta_score, "data"),
            }
            if moments:
                present = out["radii"] > 0
                w = jnp.where(present,
                              transm / jnp.maximum(touched, 1.0), 0.0)
                w = w_cam * w                                   # [C]
                dirs = sh_ops.normalize_dirs(
                    p["xyz"] - camera.camera_center)
                cols = colours_by_degree(feats, dirs, degs, max_deg)
                cols = jnp.where(present[:, None, None], cols, 0.0)
                full = cols[:, max_deg, :]                      # [C,3]
                if max_deg > 0:
                    d = jnp.linalg.norm(
                        full[:, None, :] - cols[:, :max_deg, :], axis=-1)
                    d = jnp.where(jnp.isnan(d), 0.0, d)
                else:
                    d = jnp.zeros((p["xyz"].shape[0], 1), jnp.float32)
                res["w_sum"] = jax.lax.psum(w, "data")
                res["m1"] = jax.lax.psum(w[:, None] * full, "data")
                res["m2"] = jax.lax.psum(w[:, None] * full * full, "data")
                res["dist"] = jax.lax.psum(w[:, None] * d, "data")
            return res

        return go(params, aux, alive, cameras, weights, features, degrees)

    return run


def _sweep(model, params, aux, alive, cameras, mesh, *, moments: bool,
           features=None, degrees=None, max_deg: int = 0):
    """Run the sharded stats sweep over all cameras; returns summed dicts."""
    n_data = mesh.shape["data"]
    c = params["xyz"].shape[0]
    if degrees is None:
        degrees = jnp.zeros((c,), jnp.int32)
    if features is None:
        features = jnp.zeros((c, 16, 3), jnp.float32)
    totals = None
    for (h, w), batched, weights in _camera_batches(cameras, n_data):
        tiles_x = -(-w // config.BLOCK_X)
        band_tiles, _, _ = band_layout(h, mesh.shape["tile"])
        key_buffer = default_key_buffer_size(c, tiles_x, band_tiles)
        # Cache lives ON THE MODEL (not module-level): a module cache keyed
        # by id(model) retains every model and its compiled sweeps for the
        # process lifetime (and id() can collide after GC).
        cache = getattr(model, "_sweep_fn_cache", None)
        if cache is None:
            cache = model._sweep_fn_cache = {}
        key = (mesh, h, w, key_buffer, moments, max_deg, c)
        if key not in cache:
            cache[key] = _build_sweep_fn(model, mesh, h, w, key_buffer,
                                         moments, max_deg)
        res = cache[key](params, aux, alive, batched, weights, features,
                         degrees)
        totals = res if totals is None else jax.tree.map(
            jnp.add, totals, res)
    return totals


def sharded_prune_list(model, dataset, mesh: Mesh,
                       resize: Optional[int] = None):
    """Sharded equivalent of importance.trainer.prune_list."""
    from ..dataset.camera import build_camera
    cams = []
    for camera in dataset:
        if resize is not None:
            height, width = camera.image_height, camera.image_width
            scale = resize / max(height, width)
            camera = build_camera(
                image_height=int(height * scale),
                image_width=int(width * scale),
                FoVx=float(camera.FoVx), FoVy=float(camera.FoVy),
                R=camera.R, T=camera.T)
        cams.append(camera)
    params = model.parameters()
    aux = model.aux_state()
    alive = model.alive_mask
    totals = _sweep(model, params, aux, alive, cams, mesh, moments=False)
    m = model.num_points
    return (totals["count"][:m].astype(jnp.int32),
            totals["opacity_score"][:m], totals["t_alpha_score"][:m])


def sharded_colours_variance(cameras, model, params, degrees,
                             active_sh_degree: int, alive, mesh: Mesh):
    """Sharded equivalent of ops.shculling_stats.calculate_colours_variance.

    Returns (avg_distances [N, max(max_deg,1)], variance [N,1,3],
    mean [N,1,3]) with the same normalisation as the single-chip path."""
    max_deg = active_sh_degree
    aux = {"degrees": degrees}
    coeff_mask = sh_ops.degree_coeff_mask(degrees, sh_ops.MAX_SH_DEGREE)
    features = jnp.concatenate(
        [params["features_dc"],
         params["features_rest"] * coeff_mask[..., None]], axis=1)
    totals = _sweep(model, params, aux, alive, list(cameras), mesh,
                    moments=True, features=features, degrees=degrees,
                    max_deg=max_deg)
    w_sum = totals["w_sum"][:, None]                           # [C,1]
    mean = jnp.where(w_sum > 0, totals["m1"] / jnp.maximum(w_sum, 1e-20),
                     0.0)[:, None, :]                          # [C,1,3]
    # variance as the single-chip path returns it: sum w*(c-mean)^2 / wSum
    var_sum = totals["m2"] - totals["m1"] ** 2 / jnp.maximum(w_sum, 1e-20)
    variance = jnp.maximum(var_sum, 0.0)[:, None, :] / jnp.maximum(
        w_sum[..., None], 1e-20)
    avg_dist = totals["dist"] / jnp.maximum(w_sum, 1e-20)
    return avg_dist, variance, mean
