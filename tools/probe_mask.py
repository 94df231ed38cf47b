"""Probe WHY consuming true per-Gaussian grads costs +30 ms over a scalar
tree_sum of the same grads (see tools/bisect_body.py r03 results).

Theory under test: with a LINEAR consumer (sum), XLA pushes the reduction
into the backward and skips materialising the per-Gaussian gradient
pipeline (the segment_reduce_emission gather+cumsum machinery); any
nonlinear consumer (mask, square, adam) forces the real computation.

Usage: python tools/probe_mask.py [--steps 20]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from reduced_3dgs_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from tools.bisect_body import build, tree_sum, time_chained  # noqa: E402
from reduced_3dgs_tpu.dataset import CameraDataset  # noqa: E402
from reduced_3dgs_tpu.trainer import Trainer  # noqa: E402
import reduced_3dgs_tpu.trainer.functional as F  # noqa: E402
from reduced_3dgs_tpu.ops.rasterize import pallas_kernel as pk  # noqa: E402


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
            out = model.render(p, cam, aux=aux, alive=alive,
                               mean2d_offset_ndc=off, key_buffer_size=K)
            return loss_fn(p, aux, out, cam, {}), out

        (loss, out), grads = jax.value_and_grad(lf, has_aux=True)((p0, offset0))
        return alive, loss, out, grads

    def consume_one(key, transform):
        def v(carry, params):
            alive, loss, out, grads = grads_of(params, carry)
            gparams, goff = grads
            g = {k: (transform(x, alive) if k == key or key == "*" else x)
                 for k, x in gparams.items()}
            return carry + loss * 0 + tree_sum(g) * 0 + tree_sum(out["render"]) * 0
        return v

    def mask(x, alive):
        shape = (alive.shape[0],) + (1,) * (x.ndim - 1)
        return jnp.where(alive.reshape(shape), x, jnp.zeros_like(x))

    def mul_mask(x, alive):
        shape = (alive.shape[0],) + (1,) * (x.ndim - 1)
        return x * alive.reshape(shape).astype(x.dtype)

    def square(x, alive):
        return x * x

    variants = [
        ("base(sum)", consume_one("none", mask)),
        ("square all", consume_one("*", square)),
        ("mask xyz only", consume_one("xyz", mask)),
        ("mask f_rest only", consume_one("features_rest", mask)),
        ("mask opacity only", consume_one("opacity", mask)),
        ("mulmask all", consume_one("*", mul_mask)),
    ]
    results = {}
    for name, fn in variants:
        jf = jax.jit(fn)
        ms = time_chained(jf, (params,), args_cli.steps)
        results[name] = round(ms, 3)
        print(f"{name:24s} {ms:8.3f} ms", file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()


def main2():
    """Round 2: where-mask over ALL leaves (= F.mask_rows) vs subsets."""
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
            out = model.render(p, cam, aux=aux, alive=alive,
                               mean2d_offset_ndc=off, key_buffer_size=K)
            return loss_fn(p, aux, out, cam, {}), out

        (loss, out), grads = jax.value_and_grad(lf, has_aux=True)((p0, offset0))
        return alive, loss, out, grads

    def mask(x, alive):
        shape = (alive.shape[0],) + (1,) * (x.ndim - 1)
        return jnp.where(alive.reshape(shape), x, jnp.zeros_like(x))

    def consume_keys(keys):
        def v(carry, params):
            alive, loss, out, grads = grads_of(params, carry)
            gparams, goff = grads
            g = {k: (mask(x, alive) if (keys == "*" or k in keys) else x)
                 for k, x in gparams.items()}
            return (carry + loss * 0 + tree_sum(g) * 0
                    + tree_sum(out["render"]) * 0)
        return v

    variants = [
        ("where-mask ALL", consume_keys("*")),
        ("where xyz+f_dc+f_rest", consume_keys(
            ("xyz", "features_dc", "features_rest"))),
        ("where scaling+rot+op", consume_keys(
            ("scaling", "rotation", "opacity"))),
        ("where xyz+scaling", consume_keys(("xyz", "scaling"))),
        ("where f_dc+f_rest", consume_keys(("features_dc", "features_rest"))),
    ]
    results = {}
    for name, fn in variants:
        jf = jax.jit(fn)
        ms = time_chained(jf, (params,), args_cli.steps)
        results[name] = round(ms, 3)
        print(f"{name:24s} {ms:8.3f} ms", file=sys.stderr, flush=True)
    print(json.dumps(results))
