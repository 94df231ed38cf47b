"""Bisect the step-body overhead: grad-only vs +mask/+adam/+accum variants.

Round-2 profiling attributed ~33 ms of the 70 ms step to "+adam+accum",
which is physically implausible (~70 MB of streaming elementwise work).
This tool adds the body's components back ONE AT A TIME onto the grad
program to find which addition actually costs, all timed chained on the
real chip (same methodology as tools/profile_stages.py).

Usage: python tools/bisect_body.py [--steps 20]
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

from reduced_3dgs_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
from reduced_3dgs_tpu.shculling import VariableSHGaussianModel
from reduced_3dgs_tpu.trainer import Trainer
from reduced_3dgs_tpu.trainer.optimizer import adam_update
import reduced_3dgs_tpu.trainer.functional as F
from reduced_3dgs_tpu.ops.rasterize import pallas_kernel as pk

N_GAUSSIANS = int(os.environ.get("BENCH_N", 200_000))
HEIGHT = int(os.environ.get("BENCH_H", 544))
WIDTH = int(os.environ.get("BENCH_W", 976))


def tree_sum(x):
    leaves = [jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return functools.reduce(jnp.add, leaves)


def build():
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


def time_chained(fn, args, steps):
    carry = jnp.float32(0.0)
    carry = fn(carry, *args)
    carry = fn(carry, *args)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(carry, *args)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args_cli = ap.parse_args()

    model, cam = build()
    ds = CameraDataset([cam])
    trainer = Trainer(model, ds)
    trainer.model.active_sh_degree = 3
    for _ in range(130):
        loss, out = trainer.step(cam)
    jax.block_until_ready(out["render"])
    K = trainer.key_buffer_for(cam)
    K = -(-K // pk.CHUNK) * pk.CHUNK
    print(f"# K={K} num_rendered={int(out['num_rendered'])} "
          f"capacity={trainer.capacity}", file=sys.stderr, flush=True)

    params = trainer.model.parameters()
    aux = trainer.model.aux_state()
    n_alive = trainer.n_alive
    adam = trainer.adam
    loss_fn = trainer.loss_pure()

    def perturb(p, carry):
        p = dict(p)
        p["xyz"] = p["xyz"] + carry * 1e-30
        return p

    def grads_of(params, carry):
        p0 = perturb(params, carry)
        c = p0["xyz"].shape[0]
        alive = F.alive_mask(c, n_alive)
        offset0 = jnp.zeros((c, 2), jnp.float32)

        def lf(diff):
            p, off = diff
            out = model.render(p, cam, aux=aux, alive=alive,
                               mean2d_offset_ndc=off, key_buffer_size=K)
            return loss_fn(p, aux, out, cam, {}), out

        (loss, out), grads = jax.value_and_grad(lf, has_aux=True)((p0, offset0))
        return p0, alive, loss, out, grads

    # --- variants --------------------------------------------------------
    def v_grad(carry, params, adam):
        _, _, loss, out, grads = grads_of(params, carry)
        return carry + loss * 1e-38 + tree_sum(grads) * 1e-38 + tree_sum(out["render"]) * 1e-38

    def v_mask(carry, params, adam):
        _, alive, loss, out, grads = grads_of(params, carry)
        gparams, goff = grads
        gparams = F.mask_rows(gparams, alive)
        return carry + loss * 1e-38 + tree_sum(gparams) * 1e-38 + tree_sum(out["render"]) * 1e-38

    def v_adam(carry, params, adam):
        p0, alive, loss, out, grads = grads_of(params, carry)
        gparams, goff = grads
        gparams = F.mask_rows(gparams, alive)
        lr_tree = dict(trainer.lr_tree(p0))
        lr_tree["xyz"] = trainer.xyz_lr_traced(adam.count)
        new_params, new_adam = adam_update(p0, gparams, adam, lr_tree)
        return (carry + loss * 1e-38 + tree_sum(new_params) * 1e-38
                + tree_sum(new_adam.m) * 1e-38)

    def v_adam_notree(carry, params, adam):
        # Adam but consuming only one leaf of new_params (lets XLA drop the rest)
        p0, alive, loss, out, grads = grads_of(params, carry)
        gparams, goff = grads
        gparams = F.mask_rows(gparams, alive)
        lr_tree = dict(trainer.lr_tree(p0))
        lr_tree["xyz"] = trainer.xyz_lr_traced(adam.count)
        new_params, new_adam = adam_update(p0, gparams, adam, lr_tree)
        return carry + loss * 1e-38 + jnp.sum(new_params["xyz"]) * 1e-38

    def v_accum(carry, params, adam):
        p0, alive, loss, out, grads = grads_of(params, carry)
        gparams, goff = grads
        radii = out["radii"]
        visible = (radii > 0) & alive
        vs_norm = jnp.linalg.norm(goff, axis=-1)
        acc = jnp.where(visible, vs_norm, 0.0)
        return (carry + loss * 1e-38 + tree_sum(gparams) * 1e-38 + tree_sum(acc) * 1e-38
                + tree_sum(out["render"]) * 1e-38)

    def v_full(carry, params, adam):
        p0, alive, loss, out, grads = grads_of(params, carry)
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
                + tree_sum(new_adam.m) * 1e-38 + tree_sum(acc) * 1e-38)

    def v_adam_alone(carry, params, adam):
        # Adam WITHOUT the renderer: grads = params*carry*1e-30 (fake)
        p0 = perturb(params, carry)
        gparams = jax.tree.map(lambda x: x * (carry * 1e-30), p0)
        lr_tree = dict(trainer.lr_tree(p0))
        lr_tree["xyz"] = trainer.xyz_lr_traced(adam.count)
        new_params, new_adam = adam_update(p0, gparams, adam, lr_tree)
        return carry + tree_sum(new_params) * 1e-38 + tree_sum(new_adam.m) * 1e-38

    def v_full_scan(carry, params, adam, k: int = 4):
        # The discriminator for per-CALL overhead: k full bodies fused into
        # one program via lax.scan. If the per-step cost collapses toward
        # grad(base)+eps, the 33 ms is per-call (dispatch/fixed); if it
        # stays, it is genuinely inside the compiled body.
        def body(c2, _):
            p0, alive, loss, out, grads = grads_of(params, c2)
            gparams, goff = grads
            gparams = F.mask_rows(gparams, alive)
            lr_tree = dict(trainer.lr_tree(p0))
            lr_tree["xyz"] = trainer.xyz_lr_traced(adam.count)
            new_params, new_adam = adam_update(p0, gparams, adam, lr_tree)
            radii = out["radii"]
            visible = (radii > 0) & alive
            vs_norm = jnp.linalg.norm(goff, axis=-1)
            acc = jnp.where(visible, vs_norm, 0.0)
            return (c2 + loss * 1e-38 + tree_sum(new_params) * 1e-38
                    + tree_sum(new_adam.m) * 1e-38 + tree_sum(acc) * 1e-38), None
        c_out, _ = jax.lax.scan(body, carry, None, length=k)
        return c_out

    def v_adam_goffnorm(carry, params, adam):
        # adam + the accum WITHOUT consuming out["radii"] (tests whether the
        # radii consumption forces a second live path through preprocess)
        p0, alive, loss, out, grads = grads_of(params, carry)
        gparams, goff = grads
        gparams = F.mask_rows(gparams, alive)
        lr_tree = dict(trainer.lr_tree(p0))
        lr_tree["xyz"] = trainer.xyz_lr_traced(adam.count)
        new_params, new_adam = adam_update(p0, gparams, adam, lr_tree)
        vs_norm = jnp.linalg.norm(goff, axis=-1)
        return (carry + loss * 1e-38 + tree_sum(new_params) * 1e-38
                + tree_sum(new_adam.m) * 1e-38 + jnp.sum(vs_norm) * 1e-38)

    variants = [
        ("grad(base)", v_grad),
        ("+mask_rows", v_mask),
        ("+adam", v_adam),
        ("+adam(drop unused)", v_adam_notree),
        ("+accum(no adam)", v_accum),
        ("full body", v_full),
        ("full body scan(k=4) /step",
         lambda c, p, a: v_full_scan(c, p, a, 4)),
        ("adam alone (no render)", v_adam_alone),
        ("adam+goffnorm (no radii)", v_adam_goffnorm),
    ]
    results = {}
    only = os.environ.get("BISECT_ONLY")
    pats = only.split(",") if only else None
    for name, fn in variants:
        if pats and not any(p in name for p in pats):
            continue
        jfn = jax.jit(fn)
        steps = args_cli.steps
        if "scan" in name:
            steps = max(args_cli.steps // 4, 5)
        ms = time_chained(jfn, (params, adam), steps)
        if "scan(k=4)" in name:
            ms /= 4.0
        results[name] = round(ms, 3)
        print(f"{name:28s} {ms:8.3f} ms", file=sys.stderr)

    # real trainer.step loop
    t0 = time.perf_counter()
    for _ in range(args_cli.steps):
        loss, out = trainer.step(cam)
    jax.block_until_ready(out["render"])
    results["trainer.step loop"] = round(
        (time.perf_counter() - t0) / args_cli.steps * 1e3, 3)
    print(f"{'trainer.step loop':28s} {results['trainer.step loop']:8.3f} ms",
          file=sys.stderr)

    # Internal consistency check (r03 emitted a 0.047 ms "full body" —
    # a 1500x impossibility from donation/caching — without tripping
    # anything). A superset program can only be FASTER than its parts by
    # measurement noise; flag and mark the artifact if that's violated.
    sanity = []
    full = results.get("full body")
    if full is not None:
        parts = [v for k, v in results.items()
                 if k in ("grad(base)", "+mask_rows", "+adam",
                          "+accum(no adam)")]
        if parts and full < max(parts) * 0.85:
            sanity.append(
                f"full body {full} ms < max(component) {max(parts)} ms"
                " - 15%: superset cannot beat its parts; rerun "
                "(donation/caching artifact?)")
    base = results.get("grad(base)")
    if base is not None and base < 1.0:
        sanity.append(f"grad(base) {base} ms is implausibly fast; rerun")
    results["sanity_ok"] = not sanity
    if sanity:
        results["sanity_errors"] = sanity
        for msg in sanity:
            print(f"SANITY FAIL: {msg}", file=sys.stderr)
    print(json.dumps(results))
    if sanity:
        sys.exit(1)


if __name__ == "__main__":
    main()
