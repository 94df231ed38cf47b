"""Stage-level timing breakdown of the fused train step on the real chip.

Times incremental PREFIXES of the pipeline (preprocess; +binning; +sort;
+scans/ranges; +forward kernel; +loss; +backward; +adam) as separate jitted
programs and attributes per-stage cost by differencing. Each program returns
a scalar that is folded back into the next call's inputs, so calls are
data-dependency-chained (the axon tunnel dedupes repeated identical calls,
which makes unchained timing loops read ~0 ms).

Writes PROFILE_r{N}.json at the repo root and prints it.

Usage:  python tools/profile_stages.py [--steps 20]
"""
import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu import config
from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
from reduced_3dgs_tpu.shculling import VariableSHGaussianModel
from reduced_3dgs_tpu.trainer import Trainer
from reduced_3dgs_tpu.ops.rasterize import common
from reduced_3dgs_tpu.ops.rasterize import tiled
from reduced_3dgs_tpu.ops.rasterize import pallas_kernel as pk

N_GAUSSIANS = int(os.environ.get("BENCH_N", 200_000))
HEIGHT = int(os.environ.get("BENCH_H", 544))
WIDTH = int(os.environ.get("BENCH_W", 976))


def tree_sum(x):
    leaves = [jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return functools.reduce(jnp.add, leaves)


def build_scene():
    n = N_GAUSSIANS
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    xyz = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-1.2, maxval=1.2),
        3.5 + jax.random.uniform(ks[1], (n, 1), minval=-1.5, maxval=1.5)], 1)
    feats = jax.random.normal(ks[2], (n, 16, 3)) * 0.2
    model = VariableSHGaussianModel(3, render_backend="pallas")
    model.set_parameters(dict(
        xyz=xyz, features_dc=feats[:, :1] + 0.4, features_rest=feats[:, 1:],
        scaling=jax.random.uniform(ks[3], (n, 3), minval=-5.5, maxval=-4.0),
        rotation=(jax.random.normal(ks[4], (n, 4)) * 0.1
                  + jnp.array([1.0, 0, 0, 0])),
        opacity=jax.random.uniform(ks[5], (n, 1), minval=-2.0, maxval=2.0)))
    model.init_degrees()
    model.active_sh_degree = 3
    cam = build_camera(image_height=HEIGHT, image_width=WIDTH,
                       FoVx=math.radians(70), FoVy=math.radians(45))
    gt = jnp.clip(model(cam)["render"], 0, 1)
    cam = cam.replace(ground_truth_image=gt)
    return model, cam


def time_chained(fn, args, steps, carry0=0.0):
    """Time fn(carry, *args) -> scalar carry, chained across calls."""
    carry = jnp.float32(carry0)
    carry = fn(carry, *args)           # compile
    carry = fn(carry, *args)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(carry, *args)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default=None)
    args_cli = ap.parse_args()

    model, cam = build_scene()
    ds = CameraDataset([cam])
    trainer = Trainer(model, ds)
    trainer.model.active_sh_degree = 3
    # settle key-buffer size like bench.py (two drain windows: the first
    # sizes to the warmup transient peak, the second shrinks to steady state)
    for _ in range(130):
        loss, out = trainer.step(cam)
    jax.block_until_ready(out["render"])
    num_rendered = int(out["num_rendered"])
    K = trainer.key_buffer_for(cam)
    K = -(-K // pk.CHUNK) * pk.CHUNK
    capacity = trainer.capacity

    settings = model.render_settings(cam)
    tiles_x, tiles_y = common.tile_grid(settings)
    num_tiles = tiles_x * tiles_y
    params = trainer.model.parameters()
    aux = trainer.model.aux_state()
    alive_n = trainer.n_alive
    print(f"# K={K} capacity={capacity} num_rendered={num_rendered} "
          f"tiles={tiles_x}x{tiles_y}", file=sys.stderr)

    import reduced_3dgs_tpu.trainer.functional as F

    def perturb(params, carry):
        p = dict(params)
        p["xyz"] = p["xyz"] + carry * 1e-30
        return p

    def stage_pre(carry, params, aux, camera, n_alive, adam):
        p = perturb(params, carry)
        alive = F.alive_mask(p["xyz"].shape[0], n_alive)
        arr = model.render_array_args(p, aux)
        pre = common.preprocess(*arr, settings._replace(
            viewmatrix=camera.world_view_transform,
            projmatrix=camera.full_proj_transform,
            campos=camera.camera_center,
            tanfovx=jnp.tan(camera.FoVx * 0.5),
            tanfovy=jnp.tan(camera.FoVy * 0.5),
            bg=camera.bg_color), alive=alive)
        return tree_sum(pre) * 1e-38 + carry + 1, pre

    def mk_settings(camera):
        return settings._replace(
            viewmatrix=camera.world_view_transform,
            projmatrix=camera.full_proj_transform,
            campos=camera.camera_center,
            tanfovx=jnp.tan(camera.FoVx * 0.5),
            tanfovy=jnp.tan(camera.FoVy * 0.5),
            bg=camera.bg_color)

    def emission(pre):
        """bin_and_sort up to (not including) the sort."""
        N = pre.rect_min.shape[0]
        band_rmin_y = jnp.clip(pre.rect_min[:, 1], 0, tiles_y)
        band_rmax_y = jnp.clip(pre.rect_max[:, 1], 0, tiles_y)
        rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
        band_h = jnp.maximum(band_rmax_y - band_rmin_y, 0)
        counts = jnp.where(pre.tiles_touched > 0,
                           (pre.rect_max[:, 0] - pre.rect_min[:, 0]) * band_h,
                           0).astype(jnp.int32)
        offsets = jnp.cumsum(counts) - counts
        total = offsets[-1] + counts[-1]
        gidx = tiled.fill_ids_from_offsets(offsets, counts, K)
        pos = jnp.arange(K, dtype=jnp.int32)
        per_g = jnp.stack([
            offsets.astype(jnp.float32), counts.astype(jnp.float32),
            pre.rect_min[:, 0].astype(jnp.float32), rect_w.astype(jnp.float32),
            band_rmin_y.astype(jnp.float32), pre.depths], axis=0)
        cols = jnp.take(per_g, gidx, axis=1)
        off_e = cols[0].astype(jnp.int32)
        cnt_e = cols[1].astype(jnp.int32)
        rminx_e = cols[2].astype(jnp.int32)
        rw_e = cols[3].astype(jnp.int32)
        rby_e = cols[4].astype(jnp.int32)
        depth_e = cols[5]
        ordinal = pos - off_e
        entry_valid = (ordinal >= 0) & (ordinal < cnt_e) & (pos < total)
        tx = rminx_e + ordinal % rw_e
        ty = rby_e + ordinal // rw_e
        tile_id = jnp.where(entry_valid, ty * tiles_x + tx, num_tiles)
        depth_key = jnp.where(entry_valid, depth_e, jnp.inf)
        return (tile_id.astype(jnp.int32), depth_key.astype(jnp.float32),
                gidx, pos, offsets, counts, total)

    def stage_emit(carry, params, aux, camera, n_alive, adam):
        carry, pre = stage_pre(carry, params, aux, camera, n_alive, adam)
        em = emission(pre)
        return carry + tree_sum(em) * 1e-38, (pre, em)

    def stage_sort(carry, params, aux, camera, n_alive, adam):
        carry, (pre, em) = stage_emit(carry, params, aux, camera, n_alive, adam)
        tile_id, depth_key, gidx, pos = em[:4]
        s_tile, _, s_gidx, s_pos = jax.lax.sort(
            (tile_id, depth_key, gidx, pos), num_keys=2)
        return carry + tree_sum((s_tile, s_gidx, s_pos)) * 1e-38, (pre, em,
                                                               (s_tile, s_gidx, s_pos))

    def stage_ranges(carry, params, aux, camera, n_alive, adam):
        carry, (pre, em, srt) = stage_sort(carry, params, aux, camera, n_alive, adam)
        s_tile, s_gidx, s_pos = srt
        range_start, range_end = tiled.tile_ranges_from_rects(
            pre.rect_min, pre.rect_max, pre.tiles_touched, tiles_x, tiles_y,
            jnp.int32(0), K)
        inv_pos = pk.inverse_permutation(s_pos)
        steps = pk.step_layout(range_start, range_end, K, num_tiles)
        return (carry + tree_sum((range_start, range_end, inv_pos, steps)) * 1e-38,
                (pre, em, srt, range_start, range_end, inv_pos, steps))

    def stage_fwdkernel(carry, params, aux, camera, n_alive, adam):
        carry, (pre, em, srt, rs, re, inv_pos, steps) = stage_ranges(
            carry, params, aux, camera, n_alive, adam)
        s_tile, s_gidx, s_pos = srt
        e_packed = jnp.take(pk.pack_fields(pre), s_gidx, axis=1)
        color4, final_t, latch = pk.tile_composite_fwd(
            e_packed, *steps, jnp.int32(0), tiles_x, num_tiles, False)
        return carry + tree_sum((color4, final_t)) * 1e-38, None

    def stage_forward(carry, params, aux, camera, n_alive, adam):
        p = perturb(params, carry)
        alive = F.alive_mask(p["xyz"].shape[0], n_alive)
        out = model.render(p, camera, aux=aux, alive=alive,
                           key_buffer_size=K)
        return carry + tree_sum(out["render"]) * 1e-38, None

    def stage_loss(carry, params, aux, camera, n_alive, adam):
        p = perturb(params, carry)
        alive = F.alive_mask(p["xyz"].shape[0], n_alive)
        out = model.render(p, camera, aux=aux, alive=alive,
                           key_buffer_size=K)
        loss_fn = trainer.loss_pure()
        loss = loss_fn(p, aux, out, camera, {})
        return carry + loss * 1e-38, None

    def stage_grad(carry, params, aux, camera, n_alive, adam):
        p0 = perturb(params, carry)
        alive = F.alive_mask(p0["xyz"].shape[0], n_alive)
        loss_fn = trainer.loss_pure()

        def lf(p):
            out = model.render(p, camera, aux=aux, alive=alive,
                               key_buffer_size=K)
            return loss_fn(p, aux, out, camera, {})

        loss, grads = jax.value_and_grad(lf)(p0)
        return carry + loss * 1e-38 + tree_sum(grads) * 1e-38, None

    def stage_sort_alt(carry, params, aux, camera, n_alive, adam):
        """Other sort flavor than config.SORT_MODE (same prefix as +sort)."""
        carry, (pre, em) = stage_emit(carry, params, aux, camera, n_alive, adam)
        tile_id, depth_key, gidx, pos = em[:4]
        if config.SORT_MODE == "packed":
            s_tile, _, s_gidx, s_pos = jax.lax.sort(
                (tile_id, depth_key, gidx, pos), num_keys=2)
        else:
            tile_bits = int(num_tiles + 1).bit_length()
            depth_shift = 32 - tile_bits
            dbits = jax.lax.bitcast_convert_type(depth_key, jnp.uint32)
            keyp = ((tile_id.astype(jnp.uint32) << depth_shift)
                    | (dbits >> tile_bits))
            s_key, s_gidx, s_pos = jax.lax.sort((keyp, gidx, pos), num_keys=1)
            s_tile = (s_key >> depth_shift).astype(jnp.int32)
        return carry + tree_sum((s_tile, s_gidx, s_pos)) * 1e-38, None

    def stage_grad_offset(carry, params, aux, camera, n_alive, adam):
        """Like the real step: grads wrt (params, offset), has_aux out."""
        p0 = perturb(params, carry)
        c = p0["xyz"].shape[0]
        alive = F.alive_mask(c, n_alive)
        loss_fn = trainer.loss_pure()
        offset0 = jnp.zeros((c, 2), jnp.float32)

        def lf(diff):
            p, off = diff
            out = model.render(p, camera, aux=aux, alive=alive,
                               mean2d_offset_ndc=off, key_buffer_size=K)
            return loss_fn(p, aux, out, camera, {}), out

        (loss, out), grads = jax.value_and_grad(lf, has_aux=True)((p0, offset0))
        return (carry + loss * 1e-38 + tree_sum(grads) * 1e-38
                + tree_sum(out["render"]) * 1e-38), None

    def stage_full_body(carry, params, aux, camera, n_alive, adam):
        """The entire step_fn body (grads+adam+accums), minus donation."""
        from reduced_3dgs_tpu.trainer.optimizer import adam_update
        p0 = perturb(params, carry)
        c = p0["xyz"].shape[0]
        alive = F.alive_mask(c, n_alive)
        loss_fn = trainer.loss_pure()
        offset0 = jnp.zeros((c, 2), jnp.float32)

        def lf(diff):
            p, off = diff
            out = model.render(p, camera, aux=aux, alive=alive,
                               mean2d_offset_ndc=off, key_buffer_size=K)
            return loss_fn(p, aux, out, camera, {}), out

        (loss, out), grads = jax.value_and_grad(lf, has_aux=True)((p0, offset0))
        gparams, goff = grads
        gparams = F.mask_rows(gparams, alive)
        lr_tree = dict(trainer.lr_tree(p0))
        lr_tree["xyz"] = trainer.xyz_lr_traced(adam.count)
        new_params, new_adam = adam_update(p0, gparams, adam, lr_tree)
        radii = out["radii"]
        visible = (radii > 0) & alive
        vs_norm = jnp.linalg.norm(goff, axis=-1)
        acc = jnp.where(visible, vs_norm, 0.0)
        return (carry + loss * 1e-38 + tree_sum(new_params) * 1e-38
                + tree_sum(new_adam.m) * 1e-38 + tree_sum(acc) * 1e-38), None

    def stage_binsort_real(carry, params, aux, camera, n_alive, adam):
        """The REAL bin_and_sort (incl. seg scans + stop_gradient), not the
        profiler's emission replica — attributes drift between the staged
        pipeline and render_tiled's actual code."""
        carry, pre = stage_pre(carry, params, aux, camera, n_alive, adam)
        ent = tiled.bin_and_sort(pre.rect_min, pre.rect_max,
                                 pre.tiles_touched, pre.depths,
                                 tiles_x=tiles_x, tiles_y=tiles_y,
                                 tile_row_offset=jnp.int32(0), K=K)
        return carry + tree_sum((ent["s_gidx"], ent["s_tile"],
                                 ent["seg_start_pos"])) * 1e-38, (pre, ent)

    def stage_kernel_real(carry, params, aux, camera, n_alive, adam):
        """Real path through composite_sorted (custom_vjp fwd), everything
        in render_tiled's pallas branch except _assemble_outputs."""
        carry, (pre, ent) = stage_binsort_real(carry, params, aux, camera,
                                               n_alive, adam)
        range_start, range_end = tiled.tile_ranges_from_rects(
            pre.rect_min, pre.rect_max, pre.tiles_touched, tiles_x, tiles_y,
            jnp.int32(0), K)
        inv_pos = pk.inverse_permutation(ent["s_pos"])
        color4, final_t = pk.composite_sorted(
            pk.pack_fields(pre), ent["s_gidx"], inv_pos, ent["offsets"],
            ent["counts"], ent["s_tile"], range_start, range_end,
            jnp.int32(0), tiles_x, num_tiles, False)
        return carry + tree_sum((color4, final_t)) * 1e-38, None

    stages = [
        ("preprocess", stage_pre),
        ("emission(bin)", stage_emit),
        ("+sort", stage_sort),
        ("+ranges/scans", stage_ranges),
        ("+fwd_gather+kernel", stage_fwdkernel),
        ("binsort_real", stage_binsort_real),
        ("kernel_real(no assemble)", stage_kernel_real),
        ("full_forward(render)", stage_forward),
        ("+loss(ssim)", stage_loss),
        ("+backward(grads)", stage_grad),
        ("+backward(offset,out)", stage_grad_offset),
        ("+adam+accum(body)", stage_full_body),
        ("alt_sort(thru sort)", stage_sort_alt),
    ]

    results = {}
    prev = 0.0
    fixed = (params, aux, cam, alive_n, trainer.adam)
    for name, fn in stages:
        jitted = jax.jit(lambda c, p, a, camera, na, ad, _fn=fn: _fn(
            c, p, a, camera, na, ad)[0])
        ms = time_chained(jitted, fixed, args_cli.steps)
        results[name] = {"cum_ms": round(ms, 3),
                         "delta_ms": round(ms - prev, 3)}
        prev = ms
        print(f"{name:26s} cum={ms:8.3f} ms   delta={results[name]['delta_ms']:8.3f} ms",
              file=sys.stderr)

    # full trainer step (incl. adam + accum + host roundtrip) for reference
    t0 = time.perf_counter()
    for _ in range(args_cli.steps):
        loss, out = trainer.step(cam)
    jax.block_until_ready(out["render"])
    full_ms = (time.perf_counter() - t0) / args_cli.steps * 1e3
    results["full_train_step"] = {"cum_ms": round(full_ms, 3),
                                  "delta_ms": round(full_ms - prev, 3)}
    print(f"{'full_train_step':26s} cum={full_ms:8.3f} ms", file=sys.stderr)

    payload = {
        "scene": {"n_gaussians": N_GAUSSIANS, "resolution": [HEIGHT, WIDTH],
                  "K": K, "capacity": capacity, "num_rendered": num_rendered,
                  "device": str(jax.devices()[0])},
        "stages": results,
    }
    out_path = args_cli.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROFILE_r02.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
