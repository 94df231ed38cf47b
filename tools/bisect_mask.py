"""Pin down WHY masking the gradient tree costs ~24 ms on-chip.

tools/bisect_body.py (r03) localized the step-body overhead to
F.mask_rows(gparams, alive): grad-only 45.5 ms -> +mask_rows 69.0 ms, while
adam alone is 1.8 ms and a k=4 fused scan doesn't help (the cost is inside
the compiled program). A [C]-broadcast `where` over ~72 MB of gradients is
<1 ms of streaming work, so something in how XLA schedules/fuses the
backward changes. This tool A/Bs masking variants per leaf to find the
trigger.

Usage: python tools/bisect_mask.py [--steps 10]
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
import reduced_3dgs_tpu.trainer.functional as F
from reduced_3dgs_tpu.ops.rasterize import pallas_kernel as pk

N_GAUSSIANS = int(os.environ.get("BENCH_N", 200_000))
HEIGHT = int(os.environ.get("BENCH_H", 544))
WIDTH = int(os.environ.get("BENCH_W", 976))


def tree_sum(x):
    leaves = [jnp.sum(l.astype(jnp.float32))
              for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
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
    ap.add_argument("--steps", type=int, default=10)
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
    params = trainer.model.parameters()
    aux = trainer.model.aux_state()
    n_alive = trainer.n_alive
    loss_fn = trainer.loss_pure()

    def grads_of(params, carry):
        p0 = dict(params)
        p0["xyz"] = p0["xyz"] + carry * 1e-30
        c = p0["xyz"].shape[0]
        alive = F.alive_mask(c, n_alive)
        offset0 = jnp.zeros((c, 2), jnp.float32)

        def lf(diff):
            p, off = diff
            o = model.render(p, cam, aux=aux, alive=alive,
                             mean2d_offset_ndc=off, key_buffer_size=K)
            return loss_fn(p, aux, o, cam, {}), o
        (loss, o), grads = jax.value_and_grad(lf, has_aux=True)((p0, offset0))
        return alive, loss, grads

    def consume(carry, loss, g):
        return carry + loss * 1e-38 + tree_sum(g) * 1e-38

    def v_none(carry, params):
        _, loss, (gp, goff) = grads_of(params, carry)
        return consume(carry, loss, gp)

    def v_where_all(carry, params):
        alive, loss, (gp, goff) = grads_of(params, carry)
        return consume(carry, loss, F.mask_rows(gp, alive))

    def mask_one(name):
        def v(carry, params):
            alive, loss, (gp, goff) = grads_of(params, carry)
            gp = dict(gp)
            gp[name] = F.mask_rows({name: gp[name]}, alive)[name]
            return consume(carry, loss, gp)
        return v

    def v_mult_all(carry, params):
        alive, loss, (gp, goff) = grads_of(params, carry)
        m = alive.astype(jnp.float32)
        gp = jax.tree.map(
            lambda a: a * m.reshape((m.shape[0],) + (1,) * (a.ndim - 1)), gp)
        return consume(carry, loss, gp)

    def v_where_scalar0(carry, params):
        alive, loss, (gp, goff) = grads_of(params, carry)
        gp = jax.tree.map(
            lambda a: jnp.where(
                alive.reshape((alive.shape[0],) + (1,) * (a.ndim - 1)),
                a, 0.0), gp)
        return consume(carry, loss, gp)

    def v_mask_params_instead(carry, params):
        # Masking the PARAMS post-adam instead of the grads (alternative
        # formulation: dead rows drift but stay masked at use sites).
        alive, loss, (gp, goff) = grads_of(params, carry)
        newp = jax.tree.map(lambda p, g: p - 1e-3 * g, params, gp)
        return consume(carry, loss, F.mask_rows(newp, alive))

    variants = [
        ("no mask", v_none),
        ("where all", v_where_all),
        ("where scalar-0 all", v_where_scalar0),
        ("multiply all", v_mult_all),
        ("mask xyz only", mask_one("xyz")),
        ("mask features_rest only", mask_one("features_rest")),
        ("mask features_dc only", mask_one("features_dc")),
        ("mask rotation only", mask_one("rotation")),
        ("mask scaling only", mask_one("scaling")),
        ("mask opacity only", mask_one("opacity")),
        ("mask params post-update", v_mask_params_instead),
    ]
    results = {}
    only = os.environ.get("BISECT_ONLY")
    pats = only.split(",") if only else None
    for name, fn in variants:
        if pats and not any(p in name for p in pats):
            continue
        ms = time_chained(jax.jit(fn), (params,), args_cli.steps)
        results[name] = round(ms, 3)
        print(f"{name:26s} {ms:8.3f} ms", file=sys.stderr, flush=True)
    print(json.dumps(results))
    os._exit(0)


if __name__ == "__main__":
    main()
