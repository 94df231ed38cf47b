"""On-chip timing of the reduction EVENTS (VERDICT r02 #5).

The photometric step is profiled by tools/profile_stages.py; this tool
times everything that fires on the flagship densify-pruning-shculling
schedule OUTSIDE the step, at bench scale, on the real device:

  * ops.knn with the baked defaults (the redundancy metric's K=30 search)
  * calculate_redundancy_metric (KNN + projected pixel size + intersection)
  * one importance count_render sweep camera (N2 counting pass)
  * one SH-culling stats camera pass (calculate_colours_variance inner)
  * one full VQ quantize (codebook update + assignment, all attributes)

and amortizes them over the reference 30k-iteration schedule
(/root/reference/reduced_3dgs/pruning/trainer.py:115-121 — redundancy
every 100 steps in [1000,15000]; importance/trainer.py:188-200 — sweeps at
15000..20000 every 1000; shculling/trainer.py:98-102 — two stats passes at
15000; quantization/abc.py:33-35 — quantize every 1000 in [5000,30000]).

Writes EVENTS_r03-style JSON to stdout.
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
from reduced_3dgs_tpu.dataset import CameraDataset, build_camera  # noqa: E402
from reduced_3dgs_tpu.ops import knn as knn_ops  # noqa: E402
from reduced_3dgs_tpu.pruning.trainer import calculate_redundancy_metric  # noqa: E402
from reduced_3dgs_tpu.importance.trainer import count_render  # noqa: E402
from reduced_3dgs_tpu.ops.shculling_stats import calculate_colours_variance  # noqa: E402
from reduced_3dgs_tpu.quantization import VectorQuantizer  # noqa: E402


def timeit(fn, repeats=3):
    """fn(i) -> outputs; i varies per call so inputs differ.

    The axon remote runtime caches (executable, args) -> result: repeated
    calls with IDENTICAL device arrays return without executing (measured
    0.1 ms for a 37k-point KNN), and block_until_ready alone can return
    before remote completion — so each timed call ends with a 4-byte
    scalar readback (costs one ~25 ms tunnel round trip, which real
    events also pay)."""
    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32)))
    sync(fn(0))
    best = math.inf
    for i in range(1, repeats + 1):
        t0 = time.perf_counter()
        sync(fn(i))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-cameras", type=int, default=250,
                    help="dataset size assumed for per-camera sweeps")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="steady-state step time for the overhead ratio "
                         "(defaults to the last BENCH json's step_ms)")
    args = ap.parse_args()

    print("building bench model...", flush=True)
    model, cam = build()
    print("model built", flush=True)
    n = model.num_points
    ds = CameraDataset([cam])
    params = model.parameters()
    xyz = params["xyz"]

    results = {"n_gaussians": int(n),
               "resolution": [int(cam.image_height), int(cam.image_width)],
               "device": str(jax.devices()[0]), "ms": {}}
    class _Prog(dict):
        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(f"[events] {k} = {v}", flush=True)
    results["ms"] = ms = _Prog()

    base_xyz = model._xyz

    def vary(i):
        # Fold the repetition index into the positions so the axon result
        # cache (identical executable+args -> replayed result) cannot
        # fake the timing; 1e-6 does not change any code path.
        model._xyz = base_xyz + jnp.float32(i) * 1e-6
        return model._xyz

    # --- KNN with baked defaults (redundancy metric's search) -------------
    knn_j = jax.jit(lambda p: knn_ops.knn(p, 30))
    ms["knn30_defaults"] = round(timeit(lambda i: knn_j(vary(i))), 1)
    knn_r1 = jax.jit(lambda p: knn_ops.knn(p, 30, refine_rounds=1))
    ms["knn30_refine1"] = round(timeit(lambda i: knn_r1(vary(i))), 1)
    knn_r0 = jax.jit(lambda p: knn_ops.knn(p, 30, refine_rounds=0))
    ms["knn30_refine0"] = round(timeit(lambda i: knn_r0(vary(i))), 1)

    # --- full redundancy metric -------------------------------------------
    def red(i):
        vary(i)
        return calculate_redundancy_metric(model, ds)
    ms["redundancy_metric"] = round(timeit(red), 1)

    # --- full mercy event (metric + policy, the per-100-step cost) --------
    from reduced_3dgs_tpu.pruning.trainer import mercy_gaussians

    def mercy(i):
        vary(i)
        return mercy_gaussians(model, ds)
    ms["mercy_event"] = round(timeit(mercy), 1)

    # --- importance counting sweep (scanned path), amortized per camera ---
    # The production path is ONE jitted lax.scan over the stacked dataset
    # (importance/trainer._sweep_counts): measure a real multi-camera sweep
    # and divide, so the number includes neither a per-camera tunnel round
    # trip nor pretends dispatch cost away.
    import math as _math
    from reduced_3dgs_tpu.dataset import build_camera as _bc
    from reduced_3dgs_tpu.importance.trainer import prune_list
    sweep_n = 10
    cams = []
    for j in range(sweep_n):
        a = 0.02 * (j - sweep_n // 2)
        import numpy as _np
        R = _np.array([[_math.cos(a), 0, -_math.sin(a)], [0, 1, 0],
                       [_math.sin(a), 0, _math.cos(a)]], _np.float32)
        cams.append(_bc(image_height=cam.image_height,
                        image_width=cam.image_width,
                        FoVx=float(cam.FoVx), FoVy=float(cam.FoVy), R=R))
    sweep_ds = CameraDataset(cams)

    def cnt_sweep(i):
        vary(i)
        return prune_list(model, sweep_ds)
    ms["importance_count_render_per_cam"] = round(
        timeit(cnt_sweep) / sweep_n, 1)

    # single count_render (dispatch + tunnel round trip included) for
    # reference against the amortized number
    def cnt(i):
        vary(i)
        return count_render(model, cam)
    ms["importance_count_render_single_dispatch"] = round(timeit(cnt), 1)

    # --- SH-culling stats (scanned path), amortized per camera ------------
    aux = model.aux_state()

    def shc(i):
        p = dict(params, xyz=vary(i))
        return calculate_colours_variance(cams, model, p,
                                          aux["degrees"], 3)
    ms["shculling_stats_per_cam"] = round(timeit(shc) / sweep_n, 1)
    model._xyz = base_xyz

    # --- one full VQ quantize (codebook update + assignment) --------------
    quantizer = VectorQuantizer()
    t0 = time.perf_counter()
    ids, cb = quantizer.quantize(model, update_codebook=True)
    jax.block_until_ready(jax.tree.leaves(ids))
    ms["vq_quantize_cold"] = round((time.perf_counter() - t0) * 1e3, 1)
    # Warm-start path: the first warm call compiles the warm_max_iter
    # Lloyd executables (different static max_iter than cold); time the
    # SECOND warm call — in a real run the compile happens once per
    # process and the schedule fires 25 warm events.
    quantizer.quantize(model, update_codebook=True)
    model._opacity = model._opacity + 1e-6   # defeat the axon result cache
    t0 = time.perf_counter()
    ids, cb = quantizer.quantize(model, update_codebook=True)
    jax.block_until_ready(jax.tree.leaves(ids))
    ms["vq_quantize_warm"] = round((time.perf_counter() - t0) * 1e3, 1)

    # --- amortization over the flagship 30k schedule ----------------------
    n_cams = args.n_cameras
    schedule = {
        # redundancy prune: every 100 in [1000, 15000]
        "redundancy_events": 140,
        # importance: sweeps at 15000..20000 every 1000 (6), each over the
        # whole dataset
        "importance_events": 6 * n_cams,
        # SH culling: one event @15000, TWO stats passes over the dataset
        "shculling_events": 2 * n_cams,
        # VQ: every 1000 in [5000, 30000] (in-training) -> 25 warm updates
        "vq_events": 25,
    }
    total_s = (schedule["redundancy_events"] * ms["mercy_event"]
               + schedule["importance_events"]
               * ms["importance_count_render_per_cam"]
               + schedule["shculling_events"] * ms["shculling_stats_per_cam"]
               + schedule["vq_events"] * ms["vq_quantize_warm"]) / 1e3
    step_ms = args.step_ms
    if step_ms is None:
        import glob
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                           reverse=True):
            with open(path) as f:
                d = json.load(f)
            det = d.get("detail", d.get("parsed", {}).get("detail", {}))
            if "step_ms" in det:
                step_ms = det["step_ms"]
                break
    results["schedule"] = schedule
    results["events_total_s"] = round(total_s, 1)
    if step_ms:
        steps_total_s = 30_000 * step_ms / 1e3
        results["steps_total_s"] = round(steps_total_s, 1)
        results["event_overhead_frac"] = round(total_s / steps_total_s, 4)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
