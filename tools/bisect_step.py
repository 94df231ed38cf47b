"""Bisect the fused-step cost with REAL consumption (no *0 folding tricks).

Every stage consumes its outputs via carry + sum(x)*1e-30 so nothing can be
DCE'd, and the carry perturbs the inputs so the axon tunnel cannot dedupe.
"""
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from reduced_3dgs_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
from reduced_3dgs_tpu.shculling import VariableSHGaussianModel
from reduced_3dgs_tpu.trainer import Trainer
from reduced_3dgs_tpu.ops.rasterize import common, tiled
from reduced_3dgs_tpu.ops.rasterize import pallas_kernel as pk
import reduced_3dgs_tpu.trainer.functional as F

N = 200_000
H, W = 544, 976


def build():
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    xyz = jnp.concatenate([
        jax.random.uniform(ks[0], (N, 2), minval=-1.2, maxval=1.2),
        3.5 + jax.random.uniform(ks[1], (N, 1), minval=-1.5, maxval=1.5)], 1)
    feats = jax.random.normal(ks[2], (N, 16, 3)) * 0.2
    model = VariableSHGaussianModel(3, render_backend="pallas")
    model.set_parameters(dict(
        xyz=xyz, features_dc=feats[:, :1] + 0.4, features_rest=feats[:, 1:],
        scaling=jax.random.uniform(ks[3], (N, 3), minval=-5.5, maxval=-4.0),
        rotation=(jax.random.normal(ks[4], (N, 4)) * 0.1
                  + jnp.array([1.0, 0, 0, 0])),
        opacity=jax.random.uniform(ks[5], (N, 1), minval=-2.0, maxval=2.0)))
    model.init_degrees()
    model.active_sh_degree = 3
    cam = build_camera(image_height=H, image_width=W,
                       FoVx=math.radians(70), FoVy=math.radians(45))
    gt = jnp.clip(model(cam)["render"], 0, 1)
    cam = cam.replace(ground_truth_image=gt)
    return model, cam


def timeit(fn, args, steps=20):
    carry = jnp.float32(0.0)
    carry = fn(carry, *args); carry = fn(carry, *args)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(carry, *args)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    model, cam = build()
    ds = CameraDataset([cam])
    trainer = Trainer(model, ds)
    trainer.model.active_sh_degree = 3
    for _ in range(130):
        loss, out = trainer.step(cam)
    jax.block_until_ready(out["render"])
    K = trainer.key_buffer_for(cam)
    K = -(-K // pk.CHUNK) * pk.CHUNK
    params = trainer.model.parameters()
    aux = trainer.model.aux_state()
    n_alive = trainer.n_alive

    settings0 = model.render_settings(cam)
    tiles_x, tiles_y = common.tile_grid(settings0)
    num_tiles = tiles_x * tiles_y
    print(f"# K={K} tiles={tiles_x}x{tiles_y} num_rendered={int(out['num_rendered'])}",
          file=sys.stderr, flush=True)

    def mk_settings():
        return settings0._replace(
            viewmatrix=cam.world_view_transform,
            projmatrix=cam.full_proj_transform,
            campos=cam.camera_center,
            tanfovx=jnp.tan(cam.FoVx * 0.5),
            tanfovy=jnp.tan(cam.FoVy * 0.5),
            bg=cam.bg_color)

    def consume(carry, *xs):
        acc = carry
        for x in xs:
            acc = acc + jnp.sum(x.astype(jnp.float32)) * 1e-30
        return acc

    def pre_of(p, carry):
        p = dict(p)
        p["xyz"] = p["xyz"] + carry * 1e-30
        alive = F.alive_mask(p["xyz"].shape[0], n_alive)
        arr = model.render_array_args(p, aux)
        return common.preprocess(*arr, mk_settings(), alive=alive)

    # --- stages --------------------------------------------------------
    def s_pre(carry, p):
        pre = pre_of(p, carry)
        return consume(carry, pre.depths, pre.means2d, pre.conic,
                       pre.opacity, pre.rgb, pre.rect_min, pre.tiles_touched)

    def binsort(pre):
        return tiled.bin_and_sort(pre.rect_min, pre.rect_max,
                                  pre.tiles_touched, pre.depths,
                                  tiles_x=tiles_x, tiles_y=tiles_y,
                                  tile_row_offset=jnp.int32(0), K=K)

    def s_binsort(carry, p):
        pre = pre_of(p, carry)
        ent = binsort(pre)
        return consume(carry, ent["s_gidx"], ent["s_tile"], ent["s_pos"],
                       ent["offsets"], ent["counts"])

    def s_ranges(carry, p):
        pre = pre_of(p, carry)
        ent = binsort(pre)
        rs, re = tiled.tile_ranges_from_rects(
            pre.rect_min, pre.rect_max, pre.tiles_touched, tiles_x, tiles_y,
            jnp.int32(0), K)
        inv_pos = pk.inverse_permutation(ent["s_pos"])
        return consume(carry, ent["s_gidx"], rs, re, inv_pos)

    def s_gather(carry, p):
        pre = pre_of(p, carry)
        ent = binsort(pre)
        rs, re = tiled.tile_ranges_from_rects(
            pre.rect_min, pre.rect_max, pre.tiles_touched, tiles_x, tiles_y,
            jnp.int32(0), K)
        inv_pos = pk.inverse_permutation(ent["s_pos"])
        e_packed = jnp.take(pk.pack_fields(pre), ent["s_gidx"], axis=1)
        return consume(carry, e_packed, rs, re, inv_pos)

    def s_fwdkernel(carry, p):
        pre = pre_of(p, carry)
        ent = binsort(pre)
        rs, re = tiled.tile_ranges_from_rects(
            pre.rect_min, pre.rect_max, pre.tiles_touched, tiles_x, tiles_y,
            jnp.int32(0), K)
        inv_pos = pk.inverse_permutation(ent["s_pos"])
        steps = pk.step_layout(rs, re, K, num_tiles)
        e_packed = jnp.take(pk.pack_fields(pre), ent["s_gidx"], axis=1)
        color4, final_t, latch = pk.tile_composite_fwd(
            e_packed, *steps, jnp.int32(0), tiles_x, num_tiles, False)
        return consume(carry, color4, final_t, inv_pos)

    def s_cs(carry, p):
        pre = pre_of(p, carry)
        ent = binsort(pre)
        rs, re = tiled.tile_ranges_from_rects(
            pre.rect_min, pre.rect_max, pre.tiles_touched, tiles_x, tiles_y,
            jnp.int32(0), K)
        inv_pos = pk.inverse_permutation(ent["s_pos"])
        color4, final_t = pk.composite_sorted(
            pk.pack_fields(pre), ent["s_gidx"], inv_pos, ent["offsets"],
            ent["counts"], ent["s_tile"], rs, re, jnp.int32(0),
            tiles_x, num_tiles, False)
        return consume(carry, color4, final_t)

    def s_render(carry, p):
        p = dict(p)
        p["xyz"] = p["xyz"] + carry * 1e-30
        alive = F.alive_mask(p["xyz"].shape[0], n_alive)
        o = model.render(p, cam, aux=aux, alive=alive, key_buffer_size=K)
        return consume(carry, o["render"], o["final_T"], o["depth"])

    def s_csgrad(carry, p):
        """grad through composite_sorted ONLY (stop_grad preprocess)."""
        pre = pre_of(p, carry)
        pre = jax.tree_util.tree_map(jax.lax.stop_gradient, pre)
        ent = binsort(pre)
        rs, re = tiled.tile_ranges_from_rects(
            pre.rect_min, pre.rect_max, pre.tiles_touched, tiles_x, tiles_y,
            jnp.int32(0), K)
        inv_pos = pk.inverse_permutation(ent["s_pos"])

        def f(fields10):
            color4, final_t = pk.composite_sorted(
                fields10, ent["s_gidx"], inv_pos, ent["offsets"],
                ent["counts"], ent["s_tile"], rs, re, jnp.int32(0),
                tiles_x, num_tiles, False)
            return jnp.sum(color4) + jnp.sum(final_t)
        val, g = jax.value_and_grad(f)(pk.pack_fields(pre))
        return consume(carry, val, g)

    def s_rendergrad(carry, p):
        p = dict(p)
        p["xyz"] = p["xyz"] + carry * 1e-30
        alive = F.alive_mask(p["xyz"].shape[0], n_alive)

        def f(pp):
            o = model.render(pp, cam, aux=aux, alive=alive, key_buffer_size=K)
            return jnp.sum(o["render"])
        val, g = jax.value_and_grad(f)(p)
        return functools.reduce(
            lambda c, x: consume(c, x), jax.tree_util.tree_leaves(g),
            consume(carry, val))

    def s_lossgrad(carry, p):
        p = dict(p)
        p["xyz"] = p["xyz"] + carry * 1e-30
        alive = F.alive_mask(p["xyz"].shape[0], n_alive)
        loss_fn = trainer.loss_pure()

        def f(pp):
            o = model.render(pp, cam, aux=aux, alive=alive, key_buffer_size=K)
            return loss_fn(pp, aux, o, cam, {})
        val, g = jax.value_and_grad(f)(p)
        return functools.reduce(
            lambda c, x: consume(c, x), jax.tree_util.tree_leaves(g),
            consume(carry, val))

    def s_lossgrad_offset(carry, p):
        """grads wrt (params, offset) with has_aux out — like the real step."""
        p = dict(p)
        p["xyz"] = p["xyz"] + carry * 1e-30
        c = p["xyz"].shape[0]
        alive = F.alive_mask(c, n_alive)
        loss_fn = trainer.loss_pure()
        offset0 = jnp.zeros((c, 2), jnp.float32)

        def f(diff):
            pp, off = diff
            o = model.render(pp, cam, aux=aux, alive=alive,
                             mean2d_offset_ndc=off, key_buffer_size=K)
            return loss_fn(pp, aux, o, cam, {}), o
        (val, o), g = jax.value_and_grad(f, has_aux=True)((p, offset0))
        return functools.reduce(
            lambda c_, x: consume(c_, x), jax.tree_util.tree_leaves(g),
            consume(carry, val, o["render"], o["radii"]))

    def s_fullbody(carry, p):
        """The entire step_fn body: grads + mask + adam + accums.

        Mirrors trainer/base.py step_fn (advisor r02 low): the step
        counter is injected into extras, Adam state is consumed (as
        trainer.adam values, a jit constant — acceptable here: the bisect
        compares stage deltas, not dispatch hygiene), and the denom /
        max_radii accumulator updates are included.
        """
        from reduced_3dgs_tpu.trainer.optimizer import adam_update
        p = dict(p)
        p["xyz"] = p["xyz"] + carry * 1e-30
        c = p["xyz"].shape[0]
        alive = F.alive_mask(c, n_alive)
        loss_fn = trainer.loss_pure()
        offset0 = jnp.zeros((c, 2), jnp.float32)
        extras = {"step": trainer.adam.count}

        def f(diff):
            pp, off = diff
            o = model.render(pp, cam, aux=aux, alive=alive,
                             mean2d_offset_ndc=off, key_buffer_size=K)
            return loss_fn(pp, aux, o, cam, extras), o
        (val, o), grads = jax.value_and_grad(f, has_aux=True)((p, offset0))
        gparams, goff = grads
        gparams = F.mask_rows(gparams, alive)
        lr_tree = dict(trainer.lr_tree(p))
        lr_tree["xyz"] = trainer.xyz_lr_traced(trainer.adam.count)
        new_params, new_adam = adam_update(p, gparams, trainer.adam, lr_tree)
        radii = o["radii"]
        visible = (radii > 0) & alive
        vs_norm = jnp.linalg.norm(goff, axis=-1)
        acc = jnp.where(visible, vs_norm, 0.0)
        denom_new = visible.astype(jnp.int32)
        max_radii_new = jnp.where(visible, radii, 0)
        leaves = (jax.tree_util.tree_leaves(new_params)
                  + jax.tree_util.tree_leaves(new_adam.m)
                  + jax.tree_util.tree_leaves(new_adam.v)
                  + [acc, denom_new, max_radii_new, o["render"]])
        return functools.reduce(lambda c_, x: consume(c_, x), leaves,
                                consume(carry, val))

    stages = [
        ("preprocess", s_pre),
        ("+binsort", s_binsort),
        ("+ranges+invpos", s_ranges),
        ("+gather[10,K]", s_gather),
        ("+fwd_kernel", s_fwdkernel),
        ("composite_sorted(fwd)", s_cs),
        ("full_render", s_render),
        ("grad(kernel only)", s_csgrad),
        ("grad(render sum)", s_rendergrad),
        ("grad(full loss)", s_lossgrad),
        ("grad(loss+offset+aux)", s_lossgrad_offset),
        ("full_body(adam+accum)", s_fullbody),
    ]
    results = {}
    only = os.environ.get("BISECT_ONLY")
    pats = only.split(",") if only else None
    for name, fn in stages:
        if pats and not any(p in name for p in pats):
            continue
        jf = jax.jit(fn)
        ms = timeit(jf, (params,))
        results[name] = round(ms, 2)
        print(f"{name:24s} {ms:8.2f} ms", file=sys.stderr, flush=True)

    # Direct step_fn rebind loop: device cost of the REAL jitted step,
    # excluding trainer.step's host-side python (but including donation).
    if not pats or any("loop" in p for p in pats):
        key = next(iter(trainer._step_fns))
        step_fn = trainer._step_fns[key]
        # COPIES of the live state: step_fn donates argnums (0,2,3,4,5)
        # (trainer/base.py), so feeding the trainer's own buffers would
        # invalidate them and crash the trainer_step_loop below with a
        # deleted-buffer error (advisor r02, medium).
        state = jax.tree_util.tree_map(jnp.copy, (
            trainer.model.parameters(), trainer.model.aux_state(),
            trainer.adam, trainer.xyz_grad_accum, trainer.xyz_grad_denom,
            trainer.max_radii2d))

        def run_one(st):
            p_, aux_, adam_, acc_, den_, mr_ = st
            (np_, na_, nacc_, nden_, nmr_, loss_, out_, _gc) = step_fn(
                p_, aux_, adam_, acc_, den_, mr_, cam, n_alive, {}, {})
            return (np_, aux_, na_, nacc_, nden_, nmr_), loss_
        for _ in range(3):
            state, loss_ = run_one(state)
        jax.block_until_ready(loss_)
        t0 = time.perf_counter()
        for _ in range(20):
            state, loss_ = run_one(state)
        jax.block_until_ready(loss_)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        results["step_fn_loop"] = round(ms, 2)
        print(f"{'step_fn_loop':24s} {ms:8.2f} ms", file=sys.stderr, flush=True)

        # Full trainer.step loop (host python included) for reference.
        t0 = time.perf_counter()
        for _ in range(20):
            loss2, out2 = trainer.step(cam)
        jax.block_until_ready(out2["render"])
        ms = (time.perf_counter() - t0) / 20 * 1e3
        results["trainer_step_loop"] = round(ms, 2)
        print(f"{'trainer_step_loop':24s} {ms:8.2f} ms", file=sys.stderr, flush=True)

    print(json.dumps(results))
    os._exit(0)


if __name__ == "__main__":
    main()
