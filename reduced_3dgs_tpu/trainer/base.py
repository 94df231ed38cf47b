"""BaseTrainer / Trainer: the training engine.

TPU-native equivalent of the reference base package's `BaseTrainer` (fixed
learning rates) and `Trainer` (= BaseTrainer + the vanilla-3DGS xyz
exponential LR schedule and SH-degree warm-up), per SURVEY.md section 1.4.
Loss is the standard 3DGS (1-lambda)*L1 + lambda*(1-SSIM), lambda=0.2.

The engine owns capacity-padded parameters, Adam state and densification
accumulators, and runs one fused jitted step: render -> loss -> grads ->
Adam -> accumulator update. Recompiles happen only per distinct
(capacity, image size, active SH degree, key-buffer size) tuple.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset.camera import Camera
from ..ops.ssim import ssim
from ..ops.rasterize.tiled import default_key_buffer_size, max_key_buffer
from ..utils.math import l1_loss
from ..utils.schedule import get_expon_lr_func
from . import functional as F
from .abc import AbstractTrainer
from .optimizer import AdamState, adam_init, adam_update


class BaseTrainer(AbstractTrainer):
    """Engine trainer with fixed learning rates."""

    def __init__(
        self, model, dataset=None, *,
        spatial_lr_scale: Optional[float] = None,
        lambda_dssim: float = 0.2,
        position_lr_init: float = 0.00016,
        feature_lr: float = 0.0025,
        opacity_lr: float = 0.05,
        scaling_lr: float = 0.005,
        rotation_lr: float = 0.001,
        lambda_sh_sparsity: float = 0.0,
        key_buffer_factor: int = 6,
        **unused_configs,
    ):
        self._model = model
        self.dataset = dataset
        if spatial_lr_scale is None:
            if dataset is not None and len(dataset) > 0:
                spatial_lr_scale = dataset.scene_extent()
            else:
                spatial_lr_scale = getattr(model, "spatial_lr_scale", 1.0)
        self.spatial_lr_scale = float(spatial_lr_scale)
        self.lambda_dssim = lambda_dssim
        self.position_lr_init = position_lr_init
        self.feature_lr = feature_lr
        self.opacity_lr = opacity_lr
        self.scaling_lr = scaling_lr
        self.rotation_lr = rotation_lr
        self.lambda_sh_sparsity = lambda_sh_sparsity
        self.key_buffer_factor = key_buffer_factor

        self._curr_step = 0
        self._step_fns: Dict = {}

        # Capacity-padded state
        n = model.num_points
        self.capacity = F.bucket_capacity(max(n, 1))
        params = F.pad_axis0(model.parameters(), self.capacity)
        model.set_parameters(params)
        model._n_alive = n
        model.aux_set(F.pad_axis0(model.aux_state(), self.capacity))
        self.n_alive = jnp.asarray(n, jnp.int32)
        self.adam: AdamState = adam_init(params)
        self.xyz_grad_accum = jnp.zeros((self.capacity,), jnp.float32)
        self.xyz_grad_denom = jnp.zeros((self.capacity,), jnp.int32)
        self.max_radii2d = jnp.zeros((self.capacity,), jnp.float32)
        self._last_step_io_engine = None
        self._key_buffer_size: Dict = {}

    # ------------------------------------------------------------------ api
    @property
    def engine(self):
        return self

    @property
    def model(self):
        return self._model

    @property
    def curr_step(self) -> int:
        return self._curr_step

    @curr_step.setter
    def curr_step(self, v: int):
        self._curr_step = int(v)

    # ----------------------------------------------------------------- loss
    def loss_pure(self):
        # Cached: the returned function's identity is part of the jitted-step
        # cache key, so it must be stable across steps.
        if getattr(self, "_photometric_loss", None) is None:
            lam = self.lambda_dssim
            lam_sh = self.lambda_sh_sparsity

            def photometric(params, aux, out, camera, extras):
                del aux, extras
                render = out["render"]
                gt = camera.ground_truth_image
                if camera.ground_truth_image_mask is not None:
                    render = render * camera.ground_truth_image_mask
                    gt = gt * camera.ground_truth_image_mask
                loss = ((1.0 - lam) * l1_loss(render, gt)
                        + lam * (1.0 - ssim(render, gt)))
                if lam_sh > 0.0:
                    # L1 SH-sparsity: the reference injects lambda' *
                    # sign(sh) straight into the backward per visible
                    # Gaussian (backward.cu:56-121 with lambda' =
                    # lambda_sh_sparsity / (visible*15*3),
                    # rasterizer_impl.cu:549-571); here the same gradient
                    # falls out of autodiffing the explicit L1 term.
                    rest = params["features_rest"]
                    visible = jnp.sum((out["radii"] > 0).astype(jnp.float32))
                    denom = jnp.maximum(visible, 1.0) * rest.shape[1] * 3
                    loss = loss + lam_sh * jnp.sum(jnp.abs(rest)) / denom
                return loss

            self._photometric_loss = photometric
        return self._photometric_loss

    # ------------------------------------------------------------ schedules
    def xyz_lr(self) -> float:
        return self.position_lr_init * self.spatial_lr_scale

    def xyz_lr_traced(self, step):
        """xyz LR as a traced value of the device step counter.

        Computed INSIDE the jitted step from python-float constants: an
        eager `jnp.float32(self.xyz_lr())` argument is a fresh host->device
        scalar transfer on every step, which stalls dispatch over the
        remote TPU tunnel. Subclasses overriding the schedule must keep it
        a pure function of `step` (plus python constants) so the step-fn
        cache stays valid."""
        del step
        return jnp.float32(self.position_lr_init * self.spatial_lr_scale)

    def maybe_advance_schedules(self):
        """Called once per step before the update (Trainer adds behavior)."""
        return None

    def lr_tree(self, params):
        lrs = {
            "xyz": jnp.float32(self.xyz_lr()),
            "features_dc": self.feature_lr,
            "features_rest": self.feature_lr / 20.0,
            "opacity": self.opacity_lr,
            "scaling": self.scaling_lr,
            "rotation": self.rotation_lr,
        }
        return {k: lrs.get(k, 0.0) for k in params}

    # --------------------------------------------------------------- update
    def _cache_key(self, camera: Camera, loss_fn, key_buffer: int, camera_apply):
        mask_shape = (None if camera.ground_truth_image_mask is None
                      else camera.ground_truth_image_mask.shape)
        return (self.capacity, camera.image_height, camera.image_width,
                self.model.active_sh_degree, key_buffer, id(loss_fn), mask_shape,
                id(camera_apply))

    def _build_step_fn(self, loss_fn, key_buffer: int, camera_apply=None):
        model = self.model

        @functools.partial(jax.jit, donate_argnums=(
            () if os.environ.get("R3DGS_NO_DONATE") == "1"
            else (0, 2, 3, 4, 5)))
        def step_fn(params, aux, adam, xyz_accum, denom, max_radii,
                    camera, n_alive, extras, cam_params):
            c = params["xyz"].shape[0]
            alive = F.alive_mask(c, n_alive)
            offset0 = jnp.zeros((c, 2), jnp.float32)
            # Traced step counter for schedule-dependent loss terms (e.g.
            # depth-weight decay) — computed in-graph so wrappers never ship
            # a fresh host scalar every step.
            extras = dict(extras)
            extras["step"] = adam.count

            def lf(diff):
                p, off, cp = diff
                cam = camera_apply(camera, cp) if camera_apply is not None else camera
                out = model.render(p, cam, aux=aux, alive=alive,
                                   mean2d_offset_ndc=off,
                                   key_buffer_size=key_buffer)
                return loss_fn(p, aux, out, cam, extras), out

            (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(
                (params, offset0, cam_params))
            gparams, goff, gcam = grads
            gparams = F.mask_rows(gparams, alive)

            lr_tree = dict(self.lr_tree(params))
            # pre-increment count == curr_step at call time (both start at 0)
            lr_tree["xyz"] = self.xyz_lr_traced(adam.count)
            new_params, new_adam = adam_update(params, gparams, adam, lr_tree)

            radii = out["radii"]
            visible = (radii > 0) & alive
            vs_norm = jnp.linalg.norm(goff, axis=-1)
            xyz_accum = xyz_accum + jnp.where(visible, vs_norm, 0.0)
            denom = denom + visible.astype(jnp.int32)
            max_radii = jnp.maximum(max_radii, jnp.where(visible, radii, 0))

            out = dict(out)
            out["visibility_filter"] = visible
            out["viewspace_grad_norm"] = vs_norm
            return (new_params, new_adam, xyz_accum, denom, max_radii,
                    loss, out, gcam)

        return step_fn

    def _build_step_many_fn(self, loss_fn, key_buffer: int, k: int,
                            with_psnr: bool, with_mask: bool):
        """k full training steps fused into ONE jitted program via lax.scan.

        Amortizes every per-call cost (dispatch over the remote TPU tunnel,
        program launch, input marshaling) across k steps — the reference
        pays a kernel-launch sequence per step (rasterizer_impl.cu:359-504)
        but its host loop is local; over a remote tunnel the per-call cost
        is the single largest step component (PROFILE_r02), so fusing the
        loop is the TPU-native answer. Per-step logging metrics (loss, and
        PSNR when the cameras carry ground truth) are computed IN-graph and
        returned stacked; overflow/num_rendered are reduced over the window
        (the trainer's lazy key-buffer management only needs any/max)."""
        model = self.model

        @functools.partial(jax.jit, donate_argnums=(
            () if os.environ.get("R3DGS_NO_DONATE") == "1"
            else (0, 2, 3, 4, 5)))
        def steps_fn(params, aux, adam, xyz_accum, denom, max_radii,
                     cameras, n_alive, extras):
            c = params["xyz"].shape[0]
            alive = F.alive_mask(c, n_alive)

            def body(carry, camera):
                params, adam, xyz_accum, denom, max_radii = carry
                offset0 = jnp.zeros((c, 2), jnp.float32)
                ex = dict(extras)
                ex["step"] = adam.count

                def lf(diff):
                    p, off = diff
                    out = model.render(p, camera, aux=aux, alive=alive,
                                       mean2d_offset_ndc=off,
                                       key_buffer_size=key_buffer)
                    return loss_fn(p, aux, out, camera, ex), out

                (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(
                    (params, offset0))
                gparams, goff = grads
                gparams = F.mask_rows(gparams, alive)
                lr_tree = dict(self.lr_tree(params))
                lr_tree["xyz"] = self.xyz_lr_traced(adam.count)
                new_params, new_adam = adam_update(params, gparams, adam,
                                                   lr_tree)
                radii = out["radii"]
                visible = (radii > 0) & alive
                vs_norm = jnp.linalg.norm(goff, axis=-1)
                xyz_accum = xyz_accum + jnp.where(visible, vs_norm, 0.0)
                denom = denom + visible.astype(jnp.int32)
                max_radii = jnp.maximum(max_radii, jnp.where(visible, radii, 0))

                ys = {"loss": loss,
                      "overflow": out.get("overflow", jnp.bool_(False)),
                      "num_rendered": out.get("num_rendered", jnp.int32(0))}
                if with_psnr:
                    render = out["render"]
                    gt = camera.ground_truth_image
                    mse = jnp.mean((render - gt) ** 2)
                    ys["psnr"] = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
                    if with_mask:
                        m = camera.ground_truth_image_mask
                        mmse = jnp.mean((render * m - gt * m) ** 2)
                        ys["masked_psnr"] = -10.0 * jnp.log10(
                            jnp.maximum(mmse, 1e-12))
                return (new_params, new_adam, xyz_accum, denom,
                        max_radii), ys

            carry0 = (params, adam, xyz_accum, denom, max_radii)
            carry, ys = jax.lax.scan(body, carry0, cameras)
            window = {"overflow": jnp.any(ys["overflow"]),
                      "num_rendered": jnp.max(ys["num_rendered"])}
            return carry, ys, window

        return steps_fn

    def update_many(self, outer: AbstractTrainer, cameras):
        """Run len(cameras) fused steps (no hook may fire mid-window — the
        caller guarantees it via AbstractTrainer.fires_between). Returns
        (losses [k], ys dict of per-step stacked metrics)."""
        k = len(cameras)

        def _static_sig(c):
            # Fields that must agree across the window for jnp.stack /
            # the scan body to be well-typed: resolution is a static
            # pytree field and GT/mask may be None on some cameras (the
            # reference loader supports per-image resolutions).
            return (c.image_height, c.image_width,
                    c.ground_truth_image is None,
                    c.ground_truth_image is not None
                    and c.ground_truth_image_mask is None)

        homogeneous = all(_static_sig(c) == _static_sig(cameras[0])
                          for c in cameras[1:])
        if (k == 1 or not homogeneous
                or outer.camera_adjustment(cameras[0]) is not None):
            # Trainable cameras thread per-camera grads through the host;
            # keep them (and mixed-resolution / mixed-GT windows, which
            # cannot stack) on the audited single-step path.
            losses = []
            ys = {}
            for camera in cameras:
                loss, out = self.update(outer, camera)
                losses.append(loss)
                if camera.ground_truth_image is not None:
                    gt = camera.ground_truth_image
                    mse = jnp.mean((out["render"] - gt) ** 2)
                    ys.setdefault("psnr", []).append(
                        -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))
            if len(ys.get("psnr", ())) != k:
                ys.pop("psnr", None)  # train.py indexes ys["psnr"][0..k)
            ys["loss"] = losses
            return losses, ys
        self.maybe_advance_schedules()
        loss_fn = outer.loss_pure()
        cam0 = cameras[0]
        key_buffer = self.key_buffer_for(cam0)
        with_psnr = cam0.ground_truth_image is not None
        with_mask = with_psnr and cam0.ground_truth_image_mask is not None
        key = ("many", k, with_psnr, with_mask,
               self._cache_key(cam0, loss_fn, key_buffer, None))
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step_many_fn(
                loss_fn, key_buffer, k, with_psnr, with_mask)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)
        carry, ys, window = self._step_fns[key](
            self.model.parameters(), self.model.aux_state(), self.adam,
            self.xyz_grad_accum, self.xyz_grad_denom, self.max_radii2d,
            stacked, self.n_alive, outer.loss_scalars())
        (new_params, new_adam, xyz_accum, denom, max_radii) = carry
        self.model.set_parameters(new_params)
        self.adam = new_adam
        self.xyz_grad_accum, self.xyz_grad_denom = xyz_accum, denom
        self.max_radii2d = max_radii
        self._curr_step += k
        out_last = {"overflow": window["overflow"],
                    "num_rendered": window["num_rendered"]}
        self._note_overflow(out_last, cameras[-1], steps=k)
        losses = [ys["loss"][i] for i in range(k)]
        self._last_step_io_engine = (losses[-1], out_last, cameras[-1])
        return losses, ys

    def advances_at(self, step: int) -> bool:
        """Would maybe_advance_schedules do anything at the START of
        `step`? (Window-batching boundary protocol — see
        AbstractTrainer.fires_between.)"""
        return False

    def key_buffer_for(self, camera: Camera) -> int:
        tiles_x = -(-camera.image_width // 16)
        tiles_y = -(-camera.image_height // 16)
        hw = (camera.image_height, camera.image_width)
        if hw not in self._key_buffer_size:
            base = default_key_buffer_size(self.capacity, tiles_x, tiles_y)
            self._key_buffer_size[hw] = max(
                base, self.key_buffer_factor * self.capacity)
        return min(self._key_buffer_size[hw],
                   max_key_buffer(self.capacity, tiles_x, tiles_y))

    def grow_key_buffer(self, camera: Camera):
        hw = (camera.image_height, camera.image_width)
        tiles_x = -(-camera.image_width // 16)
        tiles_y = -(-camera.image_height // 16)
        self._key_buffer_size[hw] = min(
            self.key_buffer_for(camera) * 2,
            max_key_buffer(self.capacity, tiles_x, tiles_y))

    def shrink_key_buffer(self, camera: Camera, max_rendered: int):
        """Adapt the static entry buffer down toward observed usage.

        Sized to 1.15x the 64-step peak, rounded up to a x1.15-spaced tier
        of 2048 multiples. Every per-entry stage (sort, gathers, the
        chunk-step kernel grid) scales with the static buffer size, so
        headroom is paid on EVERY step: the earlier sqrt(2) tiers averaged
        ~60% waste (measured K=1.22M for 746k live entries). Undershoot is
        cheap — overflow regrows the buffer at the next drain and the
        truncated frames degrade gracefully. Shrinks apply only a full tier
        down (hysteresis against recompile ping-pong)."""
        hw = (camera.image_height, camera.image_width)
        cur = self.key_buffer_for(camera)
        target = max(int(1.15 * max_rendered), 2048)
        desired = 2048
        while desired < target:
            desired = -(-int(desired * 1.15) // 2048) * 2048
        if desired < cur and int(desired * 1.15) <= cur:
            self._key_buffer_size[hw] = desired

    def _note_overflow(self, out, camera, steps: int = 1):
        """Lazy key-buffer management, shared by single-chip and sharded.

        Runs in arrears, several steps late: reading the flags of the step
        just dispatched would block the host on the whole step and destroy
        dispatch pipelining (a ~40 ms/step stall over the remote TPU
        tunnel); by the time a flag is 8 steps old its bool() is free. A
        step that trained on a truncated entry list still produced a valid
        partial gradient; the buffer regrows for subsequent steps — mirrors
        the reference's lazy buffer resize (rasterizer_impl.cu:163-202).
        The same drain also SHRINKS the buffer toward the observed
        num_rendered: every per-entry op (sort, scans, gathers, chunk grid)
        scales with the static buffer size, and the initial heuristic is
        typically several x too big."""
        if "overflow" not in out:
            return
        backlog = getattr(self, "_overflow_backlog", None)
        if backlog is None:
            backlog = self._overflow_backlog = []
        backlog.append((out["overflow"],
                        out.get("num_rendered", jnp.int32(0)), camera,
                        steps))
        if sum(b[3] for b in backlog) >= 64:
            # One stacked transfer: each individual scalar fetch is a
            # full round trip over the remote TPU tunnel (~25 ms).
            flags = np.asarray(jnp.stack([b[0] for b in backlog]))
            rendered = np.asarray(jnp.stack([b[1] for b in backlog]))
            if flags.any():
                self.grow_key_buffer(backlog[int(flags.argmax())][2])
                # No shrinking for a few drain windows after a grow:
                # during densification the entry count trends up, and
                # grow->shrink->grow ping-pong makes every window a fresh
                # compiled shape.
                self._shrink_cooldown = 3
                # Persistent overflow (the buffer keeps overflowing drain
                # after drain despite regrowing) indicates a pathological
                # scene/config; snapshot once for offline repro
                # (utils/debug.py, reference debug-dump analog).
                streak = getattr(self, "_overflow_streak", 0) + 1
                self._overflow_streak = streak
                if streak == 3:
                    from ..utils.debug import trainer_snapshot
                    trainer_snapshot(
                        self, "persistent_overflow", camera,
                        extra={"num_rendered_max": int(rendered.max()),
                               "key_buffer": self._key_buffer_size})
            elif rendered.max() > 0:
                self._overflow_streak = 0
                cooldown = getattr(self, "_shrink_cooldown", 0)
                import os as _os
                if cooldown > 0:
                    self._shrink_cooldown = cooldown - 1
                elif _os.environ.get("R3DGS_NO_KEY_SHRINK") != "1":
                    self.shrink_key_buffer(camera, int(rendered.max()))
            backlog.clear()

    def update(self, outer: AbstractTrainer, camera: Camera):
        """Fused grads+Adam step using the outermost composed loss."""
        self.maybe_advance_schedules()
        loss_fn = outer.loss_pure()
        adj = outer.camera_adjustment(camera)
        cam_params, camera_apply, consume_cam_grads = (
            adj if adj is not None else ({}, None, None))
        key_buffer = self.key_buffer_for(camera)
        key = self._cache_key(camera, loss_fn, key_buffer, camera_apply)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step_fn(loss_fn, key_buffer,
                                                      camera_apply)
        params = self.model.parameters()
        aux = self.model.aux_state()
        (new_params, new_adam, xyz_accum, denom, max_radii, loss, out, gcam
         ) = self._step_fns[key](
            params, aux, self.adam, self.xyz_grad_accum,
            self.xyz_grad_denom, self.max_radii2d, camera,
            self.n_alive, outer.loss_scalars(), cam_params)
        if consume_cam_grads is not None:
            consume_cam_grads(gcam)
        self._note_overflow(out, camera)
        self.model.set_parameters(new_params)
        self.adam = new_adam
        self.xyz_grad_accum, self.xyz_grad_denom = xyz_accum, denom
        self.max_radii2d = max_radii
        self._curr_step += 1
        self._last_step_io_engine = (loss, out, camera)
        return loss, out

    # -------------------------------------------------- densification plumbing
    def state_trees(self):
        """All [C, ...] trees that must move together on add/remove."""
        return {
            "params": self.model.parameters(),
            "adam_m": self.adam.m,
            "adam_v": self.adam.v,
            "aux": self.model.aux_state(),
            "accum": {
                "xyz_grad_accum": self.xyz_grad_accum,
                "denom": self.xyz_grad_denom,
                "max_radii2d": self.max_radii2d,
            },
        }

    def set_state_trees(self, trees, n_alive):
        self.model.set_parameters(trees["params"])
        self.adam = AdamState(count=self.adam.count, m=trees["adam_m"],
                              v=trees["adam_v"])
        self.model.aux_set(trees["aux"])
        self.xyz_grad_accum = trees["accum"]["xyz_grad_accum"]
        self.xyz_grad_denom = trees["accum"]["denom"]
        self.max_radii2d = trees["accum"]["max_radii2d"]
        self.n_alive = jnp.asarray(n_alive, jnp.int32)
        self.model._n_alive = int(n_alive)

    def grow_capacity(self, min_capacity: int):
        new_cap = F.bucket_capacity(min_capacity)
        if new_cap <= self.capacity:
            return
        trees = F.pad_axis0(self.state_trees(), new_cap)
        self.capacity = new_cap
        self._step_fns.clear()
        self._key_buffer_size.clear()
        self.set_state_trees(trees, int(self.n_alive))

    def reset_densification_stats(self):
        self.xyz_grad_accum = jnp.zeros_like(self.xyz_grad_accum)
        self.xyz_grad_denom = jnp.zeros_like(self.xyz_grad_denom)
        self.max_radii2d = jnp.zeros_like(self.max_radii2d)

    def alive(self) -> jnp.ndarray:
        return F.alive_mask(self.capacity, self.n_alive)


class Trainer(BaseTrainer):
    """BaseTrainer + vanilla schedules: exponential xyz LR decay and the SH
    degree warm-up (one band every 1000 steps)."""

    def __init__(self, model, dataset=None, *,
                 position_lr_init: float = 0.00016,
                 position_lr_final: float = 0.0000016,
                 position_lr_delay_mult: float = 0.01,
                 position_lr_max_steps: int = 30_000,
                 sh_degree_up_interval: int = 1000,
                 **configs):
        super().__init__(model, dataset, position_lr_init=position_lr_init,
                         **configs)
        self.position_lr_final = position_lr_final
        self.position_lr_max_steps = position_lr_max_steps
        self.sh_degree_up_interval = sh_degree_up_interval
        self._xyz_sched = get_expon_lr_func(
            lr_init=position_lr_init * self.spatial_lr_scale,
            lr_final=position_lr_final * self.spatial_lr_scale,
            lr_delay_mult=position_lr_delay_mult,
            max_steps=position_lr_max_steps)
        model.active_sh_degree = 0

    def xyz_lr(self) -> float:
        return self._xyz_sched(self._curr_step)

    def xyz_lr_traced(self, step):
        """Vanilla-3DGS log-lerp schedule, in-graph (see BaseTrainer note).

        Matches utils/schedule.get_expon_lr_func with lr_delay_steps=0."""
        import math
        lr_init = self.position_lr_init * self.spatial_lr_scale
        lr_final = self.position_lr_final * self.spatial_lr_scale
        t = jnp.clip(step.astype(jnp.float32) / self.position_lr_max_steps,
                     0.0, 1.0)
        return jnp.exp(math.log(lr_init) * (1.0 - t)
                       + math.log(lr_final) * t).astype(jnp.float32)

    def maybe_advance_schedules(self):
        if (self._curr_step > 0
                and self._curr_step % self.sh_degree_up_interval == 0
                and self.model.active_sh_degree < self.model.max_sh_degree):
            self.model.active_sh_degree += 1

    def advances_at(self, step: int) -> bool:
        return (step > 0 and step % self.sh_degree_up_interval == 0
                and self.model.active_sh_degree < self.model.max_sh_degree)
