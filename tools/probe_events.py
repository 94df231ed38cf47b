#!/usr/bin/env python
"""Fine-grained on-chip attribution of the reduction-event costs.

profile_events.py reports the amortized schedule totals; this tool breaks
each event into its sub-ops so the optimization targets are measured, not
guessed (VERDICT r04 #1: KNN/mercy/SH-stats/VQ dominated wall-clock 3.46x).

Writes JSON to stdout (and --out).
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

from tools.bisect_body import build  # noqa: E402
from reduced_3dgs_tpu.dataset import CameraDataset  # noqa: E402
from reduced_3dgs_tpu.ops import knn as knn_ops  # noqa: E402
from reduced_3dgs_tpu.ops import redundancy as red_ops  # noqa: E402
from reduced_3dgs_tpu.pruning.trainer import (_camera_mats,  # noqa: E402
                                              calculate_redundancy_metric,
                                              mercy_gaussians)
from reduced_3dgs_tpu.importance.trainer import count_render  # noqa: E402
from reduced_3dgs_tpu.ops.shculling_stats import (  # noqa: E402
    calculate_colours_variance)
from reduced_3dgs_tpu.quantization import VectorQuantizer  # noqa: E402


def timeit(fn, repeats=3):
    out = fn(0)
    jax.block_until_ready(out)
    best = math.inf
    for i in range(1, repeats + 1):
        t0 = time.perf_counter()
        out = fn(i)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    model, cam = build()
    n = model.num_points
    ds = CameraDataset([cam])
    params = model.parameters()
    base_xyz = model._xyz

    ms = {}
    results = {"n_gaussians": int(n),
               "resolution": [int(cam.image_height), int(cam.image_width)],
               "device": str(jax.devices()[0]), "ms": ms}

    def vary(i):
        model._xyz = base_xyz + jnp.float32(i) * 1e-6
        return model._xyz

    # --- KNN: blocked phase vs refine, approx vs exact --------------------
    for tag, kw in [
            ("knn30_b512_o4_r0", dict(window=512, n_orders=4,
                                      refine_rounds=0)),
            ("knn30_b512_o4_r1", dict(window=512, n_orders=4,
                                      refine_rounds=1)),
            ("knn30_b512_o3_r1", dict(window=512, n_orders=3,
                                      refine_rounds=1)),
            ("knn30_b256_o3_r1", dict(window=256, n_orders=3,
                                      refine_rounds=1)),
            ("knn30_b512_o4_r1_exact", dict(window=512, n_orders=4,
                                            refine_rounds=1, approx=False)),
            ("knn30_defaults", dict()),
    ]:
        f = jax.jit(lambda p, kw=kw: knn_ops.knn(p, 30, **kw))
        ms[tag] = timeit(lambda i: f(vary(i)))

    # --- redundancy sub-ops ----------------------------------------------
    full_proj, inv_proj, heights, widths = _camera_mats(ds)
    pix_j = jax.jit(red_ops.find_minimum_projected_pixel_size)
    ms["red_pixel_size"] = timeit(
        lambda i: pix_j(full_proj, inv_proj, vary(i), heights, widths))

    knn_f = jax.jit(lambda p: knn_ops.knn(p, 30))
    _, idx0 = knn_f(base_xyz)
    idx0 = jax.block_until_ready(idx0)
    scales = model.get_scaling
    rots = model.get_rotation
    sphere = jnp.full((n,), 0.01, jnp.float32)

    inter_j = jax.jit(red_ops.sphere_ellipsoid_intersection)
    ms["red_intersection"] = timeit(
        lambda i: inter_j(vary(i), scales, rots, idx0, sphere))

    counts0, mask0 = inter_j(base_xyz, scales, rots, idx0, sphere)
    alloc_j = jax.jit(lambda c, ix, mk: red_ops.
                      allocate_minimum_redundancy_value(c, ix, mk))
    ms["red_segment_min"] = timeit(
        lambda i: alloc_j(counts0 + i, idx0, mask0))

    def red(i):
        vary(i)
        return calculate_redundancy_metric(model, ds)
    ms["redundancy_metric"] = timeit(red)

    def mercy(i):
        vary(i)
        return mercy_gaussians(model, ds)
    ms["mercy_event"] = timeit(mercy)

    # --- render paths: fwd plain vs fwd with stats ------------------------
    def fwd(i):
        vary(i)
        return model.forward(cam)["render"]
    ms["forward_plain"] = timeit(fwd)

    def cnt(i):
        vary(i)
        return count_render(model, cam)
    ms["importance_count_render_per_cam"] = timeit(cnt)

    # --- SH-culling stats per camera (cached jit) -------------------------
    aux = model.aux_state()

    def shc(i):
        p = dict(params, xyz=vary(i))
        return calculate_colours_variance([cam], model, p,
                                          aux["degrees"], 3)
    ms["shculling_stats_per_cam"] = timeit(shc)
    model._xyz = base_xyz

    # --- VQ ----------------------------------------------------------------
    quantizer = VectorQuantizer()
    t0 = time.perf_counter()
    ids, cb = quantizer.quantize(model, update_codebook=True)
    jax.block_until_ready(jax.tree.leaves(ids))
    ms["vq_quantize_cold"] = round((time.perf_counter() - t0) * 1e3, 1)
    t0 = time.perf_counter()
    ids, cb = quantizer.quantize(model, update_codebook=True)
    jax.block_until_ready(jax.tree.leaves(ids))
    ms["vq_quantize_warm"] = round((time.perf_counter() - t0) * 1e3, 1)

    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
