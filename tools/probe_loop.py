#!/usr/bin/env python
"""Probe the real-training-loop per-step wall time on the chip.

The full-preset convergence run measured ~3 s/step WARM (no events firing,
n_points static) while bench.py's single-step loop on the same class of
program measures ~60-85 ms/step. The differences between the two loops are
(1) cycling 24 distinct cameras vs reusing one, (2) the flagship onion vs
the bare trainer, (3) per-step python glue. This times each combination on
the convergence scene to attribute the gap.

Usage: python tools/probe_loop.py [--steps 30]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from reduced_3dgs_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from tools.convergence_proof import PRESETS, surface_cloud, orbit_cameras
    import jax.numpy as jnp
    import numpy as np
    from reduced_3dgs_tpu.dataset import CameraDataset
    from reduced_3dgs_tpu.models import GaussianModel
    from reduced_3dgs_tpu.prepare import modes
    from reduced_3dgs_tpu.shculling import VariableSHGaussianModel

    cfg = PRESETS["full"]
    cloud = surface_cloud(cfg["n_gt"])
    gt = GaussianModel(3)
    n = cloud["xyz"].shape[0]
    SH_C0 = 0.28209479177387814
    gt.set_parameters(dict(
        xyz=jnp.asarray(cloud["xyz"]),
        features_dc=jnp.asarray((cloud["col"] - 0.5) / SH_C0)[:, None, :],
        features_rest=jnp.zeros((n, 15, 3), jnp.float32),
        scaling=jnp.log(jnp.asarray(cloud["spacing"]))[:, None].repeat(3, 1),
        rotation=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.full((n, 1), 6.0, jnp.float32)))
    cams = orbit_cameras(24, cfg["hw"])
    print("rendering GT views...", file=sys.stderr, flush=True)
    cams = [c.replace(ground_truth_image=jnp.clip(gt(c)["render"], 0, 1))
            for c in cams]
    ds = CameraDataset(cams)

    rng = np.random.default_rng(7)
    sel = rng.choice(n, 30_000, replace=False)
    pts = cloud["xyz"][sel] + rng.normal(0, 0.02, (30_000, 3))
    cols = np.clip(cloud["col"][sel] + rng.normal(0, 0.08, (30_000, 3)), 0, 1)
    model = VariableSHGaussianModel(3)
    model.create_from_pcd(pts.astype(np.float32), cols.astype(np.float32),
                          scene_extent=float(ds.scene_extent()))
    model.init_degrees()
    trainer = modes["densify-pruning-shculling"](
        model, ds, scene_extent=float(ds.scene_extent()),
        densify_from_iter=33, densify_until_iter=1000, densify_interval=10,
        opacity_reset_interval=200, opacity_reset_until_iter=1000,
        prune_from_iter=67, prune_until_iter=1000, prune_interval=10,
        importance_prune_from_iter=1000, importance_prune_until_iter=1333,
        importance_prune_interval=67, cull_at_steps=[1000], iterations=2000)
    # steady state: past every event window, like the tail of the real run
    trainer.curr_step = 1500
    trainer.engine._curr_step = 1500
    model.active_sh_degree = 3

    results = {}

    def timed(tag, fn, sync, steps):
        fn(); fn()
        jax.block_until_ready(sync())
        t0 = time.perf_counter()
        for _ in range(steps):
            fn()
        jax.block_until_ready(sync())
        ms = (time.perf_counter() - t0) / steps * 1e3
        results[tag] = round(ms, 2)
        print(f"{tag:32s} {ms:9.2f} ms/step", file=sys.stderr, flush=True)

    state = {}

    # (a) fixed camera, flagship onion
    def fixed():
        state["loss"], state["out"] = trainer.step(cams[0])
    timed("flagship fixed cam", fixed, lambda: state["out"]["render"],
          args.steps)

    # (b) cycling cameras, flagship onion — the convergence-proof loop
    idx = {"i": 0}
    def cycle():
        i = idx["i"] = (idx["i"] + 1) % len(cams)
        state["loss"], state["out"] = trainer.step(cams[i])
    timed("flagship cycling 24 cams", cycle, lambda: state["out"]["render"],
          args.steps)

    # (c) cycling + per-step host reads the proof loop does
    def cycle_reads():
        i = idx["i"] = (idx["i"] + 1) % len(cams)
        state["loss"], state["out"] = trainer.step(cams[i])
        _ = model.num_points
    timed("cycling + num_points read", cycle_reads,
          lambda: state["out"]["render"], args.steps)

    # (d) fused windows, cycling cameras (train.py's production mode)
    k = trainer.max_window(16)
    print(f"max_window(16) -> {k}", file=sys.stderr, flush=True)
    if k > 1:
        def window():
            i = idx["i"] = (idx["i"] + k) % len(cams)
            wcams = [cams[(i + j) % len(cams)] for j in range(k)]
            state["losses"], _ = trainer.step_many(wcams)
        timed(f"flagship window k={k} (per step)", window,
              lambda: state["losses"][-1], max(args.steps // k, 3))
        results[f"flagship window k={k} (per step)"] = round(
            results[f"flagship window k={k} (per step)"] / k, 2)
        print(f"  = {results[f'flagship window k={k} (per step)']} ms/step",
              file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
