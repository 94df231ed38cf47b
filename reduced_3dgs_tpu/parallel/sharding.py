"""Multi-chip scaling via jax.sharding + shard_map.

The reference is single-process single-GPU (SURVEY.md section 2.5); this
subsystem is new, TPU-first design:

  * mesh ("data", "tile"): the "data" axis parallelises over cameras (pure
    data parallelism — each data rank trains a different view), the "tile"
    axis parallelises PIXELS within a camera (each tile rank rasterises a
    horizontal band of tile rows with Gaussians replicated; this is the
    scene-scale analog of sequence parallelism).
  * Per-band rendering reuses the single-chip tiled renderer's viewport mode
    (ops/rasterize/tiled.py) — a band is a crop of the full tile grid, so
    banding is exact, not an approximation.
  * The rendered bands are all-gathered over the "tile" axis (an image is
    tiny next to the per-Gaussian work) so the photometric loss — including
    SSIM, whose 11x11 window straddles band boundaries — is computed on the
    full image, bitwise identical to single-chip. Gradients: psum/pmean over
    both axes, riding ICI. Densification events operate on replicated state,
    so no resharding is needed.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import config
from ..dataset.camera import Camera
from ..ops.rasterize.tiled import default_key_buffer_size
from ..trainer import functional as F
from ..trainer.base import Trainer
from ..trainer.optimizer import adam_update


def distributed_init() -> bool:
    """Multi-host (multi-process) initialisation, DCN-aware.

    Single-host runs are a no-op. For multi-host, either the launcher
    environment provides coordination (GKE/TPU-VM autodetection inside
    jax.distributed.initialize) or JAX_COORDINATOR_ADDRESS /
    JAX_PROCESS_ID / JAX_NUM_PROCESSES are set explicitly. After this,
    jax.devices() spans every process's chips and make_mesh() lays the
    ("data", "tile") mesh across them — put "data" (pure camera
    parallelism, one psum/pmean of grads per step) across hosts so the
    only inter-host traffic is the gradient reduction over DCN, and keep
    "tile" (per-step band all_gathers) inside a host's ICI domain;
    make_mesh's device order does this by construction (jax.devices()
    groups by process, and the mesh is reshaped (data, tile) row-major).
    """
    import os
    if os.environ.get("JAX_NUM_PROCESSES", "1") not in ("", "1"):
        jax.distributed.initialize(
            coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        return True
    return False


def globalize_tree(tree, mesh: Mesh):
    """Promote every leaf to a fully-replicated GLOBAL array over `mesh`.

    Multi-process (multi-controller) JAX requires jit inputs to be global
    arrays — a process-local single-device array cannot be auto-distributed
    across processes. Every process is assumed to hold the SAME value (the
    trainer's replicated-state invariant), so the promotion is
    communication-free: each process contributes its local copy as the
    replicated shards on its own devices. Leaves that are already global
    over the full mesh pass through. No-op in single-process runs.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils as mh

    def leaf(x):
        if x is None:
            return None
        if isinstance(x, jax.Array) and len(x.sharding.device_set) == mesh.size:
            return x
        return mh.host_local_array_to_global_array(np.asarray(x), mesh, P())

    return jax.tree.map(leaf, tree)


def make_mesh(n_data: Optional[int] = None, n_tile: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = n // n_tile
    assert n_data * n_tile == n, (n_data, n_tile, n)
    return Mesh(np.asarray(devices).reshape(n_data, n_tile), ("data", "tile"))


def batch_cameras(cameras) -> Camera:
    """Stack same-size cameras into one batched Camera pytree (leading axis =
    data rank)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)


def cameras_first(cameras) -> Camera:
    return jax.tree.map(
        lambda x: x[0] if hasattr(x, "ndim") and x.ndim > 0 else x, cameras)


def band_layout(image_height: int, n_tile: int):
    """(tile rows per band, band pixel height, padded full height)."""
    tiles_y = -(-image_height // config.BLOCK_Y)
    band_tiles = -(-tiles_y // n_tile)
    band_h = band_tiles * config.BLOCK_Y
    return band_tiles, band_h, band_h * n_tile


class ShardedTrainer(Trainer):
    """Camera-data-parallel x pixel-band-parallel trainer.

    step() takes a batched Camera pytree with a leading axis of size
    mesh.shape["data"] (see batch_cameras). Parameters, optimizer state and
    accumulators are replicated; gradients are pmean-ed over the whole mesh.
    """

    def __init__(self, model, dataset=None, mesh: Optional[Mesh] = None,
                 **configs):
        super().__init__(model, dataset, **configs)
        self.mesh = mesh if mesh is not None else make_mesh(
            n_data=len(jax.devices()), n_tile=1)

    def _cache_key(self, camera, loss_fn, key_buffer, camera_apply):
        return super()._cache_key(camera, loss_fn, key_buffer, camera_apply) + (
            self.mesh.shape["data"], self.mesh.shape["tile"])

    def _build_step_fn(self, loss_fn, key_buffer: int, camera_apply=None):
        model = self.model
        mesh = self.mesh
        n_tile = mesh.shape["tile"]

        @functools.partial(jax.jit, donate_argnums=(0, 2, 3, 4, 5))
        def step_fn(params, aux, adam, xyz_accum, denom, max_radii,
                    cameras, n_alive, extras, cam_params):
            c = params["xyz"].shape[0]
            alive = F.alive_mask(c, n_alive)
            extras = dict(extras)
            extras["step"] = adam.count
            camera0 = cameras_first(cameras)
            H, W = camera0.image_height, camera0.image_width
            band_tiles, band_h, padded_h = band_layout(H, n_tile)
            has_cam = bool(cam_params)

            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P(), P(), P(), P("data"), P(),
                          P("data") if has_cam else P()),
                out_specs=(P(), P(), P("data"),
                           P("data") if has_cam else P()),
                check_vma=False)
            def device_step(p, aux_, alive_, camera, extras_, cp):
                camera = cameras_first(camera)
                cp = cameras_first(cp) if has_cam else cp
                tile_rank = jax.lax.axis_index("tile")
                row0 = tile_rank * band_tiles
                offset0 = jnp.zeros((c, 2), jnp.float32)

                def lf(diff):
                    pp, off, cpp = diff
                    cam = (camera_apply(camera, cpp)
                           if camera_apply is not None else camera)
                    settings = model.render_settings(cam)
                    band = model.render_band(
                        pp, settings, aux=aux_, alive=alive_,
                        mean2d_offset_ndc=off,
                        key_buffer_size=key_buffer,
                        tile_row_offset=row0, tile_rows=band_tiles,
                        # Pallas kernels per band on real chips; the pure
                        # XLA path on CPU test meshes (interpret mode would
                        # be far slower than the scan path there).
                        use_pallas=jax.default_backend() == "tpu")

                    # Exact full images on every tile rank: gather the
                    # bands. SSIM's 11x11 window straddles band boundaries
                    # and the depth loss normalises by full-image alpha, so
                    # the loss must see the whole frame — bitwise identical
                    # to single-chip.
                    def gather_rows(x, axis):
                        g = jax.lax.all_gather(x, "tile")  # [n_tile, ...]
                        g = jnp.moveaxis(g, 0, axis)
                        shp = list(x.shape)
                        shp[axis] = padded_h
                        g = g.reshape(
                            shp[:axis]
                            + [n_tile, x.shape[axis]] + shp[axis + 1:]
                        ).reshape(shp)
                        idx = [slice(None)] * len(shp)
                        idx[axis] = slice(0, H)
                        return g[tuple(idx)]

                    full = gather_rows(band["render"], 1)       # [3,H,W]
                    full_depth = gather_rows(band["depth"], 0)  # [H,W]
                    full_T = gather_rows(band["final_T"], 0)    # [H,W]
                    out = {
                        "render": full,
                        "radii": band["radii"],
                        "depth": full_depth,
                        "final_T": full_T,
                        "overflow": band["overflow"],
                        "num_rendered": band["num_rendered"],
                    }
                    loss = loss_fn(pp, aux_, out, cam, extras_)
                    return loss, out

                (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(
                    (p, offset0, cp))
                gparams, goff, gcam = grads
                # Every tile rank computes the SAME full-image loss, so the
                # all_gather VJP (a psum-scatter of identical cotangents)
                # hands each rank n_tile x its band's true cotangent —
                # per-rank grads must therefore be MEANed over "tile", not
                # summed (a psum here is n_tile x the true gradient: Adam's
                # scale invariance hides it, but the densify accumulators
                # and grad thresholds do not). Mean over data ranks as the
                # per-step camera average.
                gparams = jax.tree.map(
                    lambda g: jax.lax.pmean(g, ("tile", "data")), gparams)
                loss = jax.lax.pmean(loss, ("data", "tile"))
                goff = jax.lax.pmean(goff, "tile")
                gcam = jax.tree.map(
                    lambda g: jax.lax.pmean(g, "tile")[None], gcam)
                # Densify stats must match D single-chip steps over the same
                # cameras: per-rank visibility (pmax over tile only), grad
                # norms SUMMED over the ranks where visible, and the
                # visible-rank COUNT as the denominator increment (a pmean /
                # any-visible pair undercounts partially visible Gaussians).
                radii_d = jax.lax.pmax(out["radii"], "tile")
                visible_d = radii_d > 0
                norm_d = jnp.linalg.norm(goff, axis=-1)
                vs_norm = jax.lax.psum(
                    jnp.where(visible_d, norm_d, 0.0), "data")
                vis_count = jax.lax.psum(
                    visible_d.astype(jnp.int32), "data")
                radii = jax.lax.pmax(radii_d, "data")
                overflow = jax.lax.pmax(
                    out["overflow"].astype(jnp.int32), ("data", "tile")) > 0
                num_rendered = jax.lax.pmax(out["num_rendered"],
                                            ("data", "tile"))
                imgs0 = jax.tree.map(
                    lambda x: x[None],
                    (out["render"], out["depth"], out["final_T"]))
                return (loss, (gparams, radii, vs_norm, vis_count, overflow,
                               num_rendered), imgs0, gcam)

            (loss, (gparams, radii, vs_norm, vis_count, overflow,
                    num_rendered),
             imgs, gcam) = device_step(params, aux, alive, cameras, extras,
                                       cam_params)
            gparams = F.mask_rows(gparams, alive)
            lr_tree = dict(self.lr_tree(params))
            lr_tree["xyz"] = self.xyz_lr_traced(adam.count)
            new_params, new_adam = adam_update(params, gparams, adam, lr_tree)

            visible = (radii > 0) & alive
            xyz_accum = xyz_accum + jnp.where(alive, vs_norm, 0.0)
            denom = denom + jnp.where(alive, vis_count, 0)
            max_radii = jnp.maximum(max_radii,
                                    jnp.where(visible, radii, 0))
            renders, depths, finalTs = imgs
            out = {
                "render": renders[0],
                "depth": depths[0],
                "final_T": finalTs[0],
                "radii": radii,
                "overflow": overflow,
                "num_rendered": num_rendered,
                "visibility_filter": visible,
                "viewspace_grad_norm": vs_norm,
            }
            return (new_params, new_adam, xyz_accum, denom, max_radii,
                    loss, out, gcam)

        return step_fn

    def update_many(self, outer, cameras):
        """Sharded engines run the audited per-step path (each item may
        itself be a per-data-rank camera list); window fusion is a
        single-chip dispatch-amortization so far."""
        losses = []
        ys = {}
        for camera in cameras:
            loss, out = self.update(outer, camera)
            losses.append(loss)
            # Per-epoch PSNR logging parity with the fused branch (ADVICE
            # r03): out["render"] is rank 0's image; compare against that
            # rank's GT when present.
            cam0 = camera[0] if isinstance(camera, (list, tuple)) else camera
            gt = getattr(cam0, "ground_truth_image", None)
            if gt is not None and getattr(gt, "ndim", 0) == 3:
                mse = jnp.mean((out["render"] - gt) ** 2)
                ys.setdefault("psnr", []).append(
                    -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))
        if len(ys.get("psnr", ())) != len(cameras):
            ys.pop("psnr", None)
        ys["loss"] = losses
        return losses, ys

    def update(self, outer, cameras):
        """One DPxSP step.

        `cameras` is either a list of per-data-rank Cameras (required for
        trainable-camera modes: per-camera adjustment slots are keyed by
        camera identity) or an already-batched Camera pytree.
        """
        self.maybe_advance_schedules()
        loss_fn = outer.loss_pure()
        if not isinstance(cameras, (list, tuple)) and (
                getattr(cameras.world_view_transform, "ndim", 2) == 2):
            # Bare unbatched Camera (e.g. train.py with n_data == 1):
            # promote to a one-element batch rather than misreading its
            # leaves as already carrying a data axis.
            cameras = [cameras]
        if isinstance(cameras, (list, tuple)):
            cam_list = list(cameras)
            n_orig = len(cam_list)
            n_data = self.mesh.shape["data"]
            if len(cam_list) < n_data:   # short final batch: wrap around
                cam_list = (cam_list * n_data)[:n_data]
            batched = batch_cameras(cam_list)
        else:
            cam_list, n_orig, batched = None, 0, cameras
        cam0 = cameras_first(batched)

        camera_apply, cam_params, consumes = None, {}, None
        if cam_list is not None:
            adjs = [outer.camera_adjustment(c) for c in cam_list]
            if all(a is not None for a in adjs):
                cam_params = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *[a[0] for a in adjs])
                camera_apply = adjs[0][1]
                # Wrap-padded duplicates of a short batch must not re-step
                # the SAME per-camera Adam slot: consume only the original
                # entries' gradients.
                consumes = [a[2] for a in adjs[:n_orig]]

        key_buffer = self.key_buffer_for(cam0)
        key = self._cache_key(cam0, loss_fn, key_buffer, camera_apply)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step_fn(loss_fn, key_buffer,
                                                      camera_apply)
        params = self.model.parameters()
        aux = self.model.aux_state()
        args = globalize_tree(
            (params, aux, self.adam, self.xyz_grad_accum,
             self.xyz_grad_denom, self.max_radii2d, batched, self.n_alive,
             outer.loss_scalars(), cam_params), self.mesh)
        (new_params, new_adam, xyz_accum, denom, max_radii, loss, out, gcam
         ) = self._step_fns[key](*args)
        if consumes is not None:
            for i, consume in enumerate(consumes):
                consume(jax.tree.map(lambda g: g[i], gcam))
        self._note_overflow(out, cam0)
        self.model.set_parameters(new_params)
        self.adam = new_adam
        self.xyz_grad_accum, self.xyz_grad_denom = xyz_accum, denom
        self.max_radii2d = max_radii
        self._curr_step += 1
        self._last_step_io_engine = (loss, out, cam0)
        return loss, out


def render_sharded(model, camera: Camera, mesh: Mesh, **kwargs):
    """Inference render with pixels sharded over the mesh's 'tile' axis."""
    n_tile = mesh.shape["tile"]
    H, W = camera.image_height, camera.image_width
    band_tiles, band_h, padded_h = band_layout(H, n_tile)
    params = model.parameters()
    aux = model.aux_state()
    alive = model.alive_mask

    tile_mesh = Mesh(mesh.devices.reshape(-1)[: n_tile], ("tile",))

    # `camera` is an explicit argument (settings built in-trace): capturing
    # device arrays as jit constants degrades the TPU dispatch path (see
    # ops/projection.py transform_points note).
    @functools.partial(jax.jit)
    @functools.partial(jax.shard_map, mesh=tile_mesh, in_specs=(P(), P()),
                       out_specs=P("tile"), check_vma=False)
    def go(args, camera):
        p, aux_, alive_ = args
        settings = model.render_settings(camera)
        row0 = jax.lax.axis_index("tile") * band_tiles
        kw = dict(kwargs)
        kw.setdefault("use_pallas", jax.default_backend() == "tpu")
        kw.setdefault("key_buffer_size", default_key_buffer_size(
            p["xyz"].shape[0], -(-W // config.BLOCK_X), band_tiles))
        band = model.render_band(
            p, settings, aux=aux_, alive=alive_,
            tile_row_offset=row0, tile_rows=band_tiles, **kw)
        return band["render"].transpose(1, 2, 0)[None]

    bands = go((params, aux, alive), camera)
    img = bands.reshape(padded_h, W, 3)[:H]
    return img.transpose(2, 0, 1)


def shard_train_step(trainer: ShardedTrainer, cameras):
    """One DPxSP step over a list of per-data-rank cameras."""
    return trainer.step(batch_cameras(cameras))
