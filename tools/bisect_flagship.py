"""Attribute the flagship wrapper-onion per-step overhead.

BENCH_r03 measured the flagship (densify-pruning-shculling) steady-state
step at 85.4 ms vs the bare trainer's 69.5 — ~16 ms/step of unattributed
onion overhead with ZERO events firing (curr_step pinned past every event
window). The reference's wrapper hooks are integer compares
(/root/reference/reduced_3dgs/quantization/abc.py:43-49) and cost nothing
measurable; ours must not either.

This tool splits the overhead into layers, timed on the real chip:
  bare step            — bench.py's step_ms baseline (Trainer, plain loss)
  flagship engine only — engine.update(flagship_outer, cam): flagship loss
                         terms (depth/sh-sparsity/scale-reg) + engine
                         differences, NO hook chain, NO model property
  flagship step        — + the wrapper hook chain (optim_step, model hooks)
  flagship step_many   — the production fused-window path bench times

Usage: python tools/bisect_flagship.py [--steps 20]
"""
import argparse
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

N_GAUSSIANS = int(os.environ.get("BENCH_N", 200_000))
HEIGHT = int(os.environ.get("BENCH_H", 544))
WIDTH = int(os.environ.get("BENCH_W", 976))


def build_model():
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


def time_loop(fn, steps, sync):
    fn()
    fn()
    jax.block_until_ready(sync())
    t0 = time.perf_counter()
    for _ in range(steps):
        fn()
    jax.block_until_ready(sync())
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    results = {}

    model, cam = build_model()
    ds = CameraDataset([cam])

    # --- bare trainer (bench.py step_ms baseline) -------------------------
    trainer = Trainer(model, ds)
    trainer.model.active_sh_degree = 3
    state = {}
    for _ in range(130):
        loss, out = trainer.step(cam)
    jax.block_until_ready(out["render"])

    def bare():
        state["loss"], state["out"] = trainer.step(cam)
    results["bare step"] = round(
        time_loop(bare, args.steps, lambda: state["out"]["render"]), 3)
    print(f"{'bare step':24s} {results['bare step']:8.3f} ms",
          file=sys.stderr, flush=True)

    # --- flagship onion, steady state past all event windows --------------
    from reduced_3dgs_tpu.prepare import modes
    fmodel = VariableSHGaussianModel(3, render_backend="pallas")
    fmodel.set_parameters({k: jnp.array(v)
                           for k, v in model.parameters().items()})
    fmodel.init_degrees()
    ftrainer = modes["densify-pruning-shculling"](fmodel, ds)
    ftrainer.curr_step = 25_000
    ftrainer.engine._curr_step = 25_000
    fmodel.active_sh_degree = 3
    for _ in range(130):
        _, fout = ftrainer.step(cam)
    jax.block_until_ready(fout["render"])

    engine = ftrainer.engine

    def eng():
        state["loss"], state["out"] = engine.update(ftrainer, cam)
    results["flagship engine.update"] = round(
        time_loop(eng, args.steps, lambda: state["out"]["render"]), 3)
    print(f"{'flagship engine.update':24s} "
          f"{results['flagship engine.update']:8.3f} ms",
          file=sys.stderr, flush=True)

    def fstep():
        state["loss"], state["out"] = ftrainer.step(cam)
    results["flagship step"] = round(
        time_loop(fstep, args.steps, lambda: state["out"]["render"]), 3)
    print(f"{'flagship step':24s} {results['flagship step']:8.3f} ms",
          file=sys.stderr, flush=True)

    window = int(os.environ.get("BENCH_WINDOW", 16))
    fk = ftrainer.max_window(window)
    fcams = [cam] * fk

    def fmany():
        state["losses"], _ = ftrainer.step_many(fcams)
    n_win = max(args.steps // fk, 3)
    ms = time_loop(fmany, n_win, lambda: state["losses"][-1]) / fk
    results["flagship step_many"] = round(ms, 3)
    results["flagship window"] = fk
    print(f"{'flagship step_many':24s} {results['flagship step_many']:8.3f}"
          f" ms (window {fk})", file=sys.stderr, flush=True)

    results["overhead loss+engine"] = round(
        results["flagship engine.update"] - results["bare step"], 3)
    results["overhead hooks"] = round(
        results["flagship step"] - results["flagship engine.update"], 3)

    # Sanity: a superset program can't beat its parts beyond noise.
    sanity = []
    if results["flagship step"] < results["flagship engine.update"] * 0.85:
        sanity.append("flagship step beats its own engine.update by >15%")
    if results["bare step"] < 1.0:
        sanity.append("bare step implausibly fast; caching artifact")
    results["sanity_ok"] = not sanity
    if sanity:
        results["sanity_errors"] = sanity
        for m in sanity:
            print(f"SANITY FAIL: {m}", file=sys.stderr)
    print(json.dumps(results))
    if sanity:
        sys.exit(1)


if __name__ == "__main__":
    main()
