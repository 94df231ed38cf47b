"""Benchmark: fused train-step throughput of the tiled renderer on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The scene is synthetic (no dataset ships with the image): N Gaussians spread
in front of the camera at a real training resolution. The metric is
rays(pixels)/s through the FULL fused training step (render + loss + backward
+ Adam), which is the quantity the reference's training loop is bound by.

vs_baseline: the reference publishes no benchmark tables
(/root/repo/BASELINE.md — "published": {}); its only quantitative claim is a
x1.7 render speedup over vanilla 3DGS on unspecified hardware, which is not
comparable to a fwd+bwd step. We report vs_baseline as the ratio against a
fixed pinned target of 50M pixels/s fwd+bwd per chip (our own north star for
this scene size), so the number is trackable across rounds.
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PINNED_TARGET_PIX_S = 50e6

N_GAUSSIANS = int(os.environ.get("BENCH_N", 200_000))
HEIGHT = int(os.environ.get("BENCH_H", 544))
WIDTH = int(os.environ.get("BENCH_W", 976))
STEPS = int(os.environ.get("BENCH_STEPS", 20))


def main():
    import jax
    import jax.numpy as jnp
    from reduced_3dgs_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
    from reduced_3dgs_tpu.shculling import VariableSHGaussianModel
    from reduced_3dgs_tpu.trainer import Trainer

    backend = os.environ.get("BENCH_BACKEND", "pallas")
    n = N_GAUSSIANS
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    xyz = jnp.concatenate([
        jax.random.uniform(ks[0], (n, 2), minval=-1.2, maxval=1.2),
        3.5 + jax.random.uniform(ks[1], (n, 1), minval=-1.5, maxval=1.5)], 1)
    feats = jax.random.normal(ks[2], (n, 16, 3)) * 0.2
    model = VariableSHGaussianModel(3, render_backend=backend)
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
    ds = CameraDataset([cam])

    # --- on-hardware numerics gate (VERDICT r01 #4): the Pallas kernels
    # must agree with the pure-XLA path ON THE REAL CHIP, not only in
    # interpret mode (a rejected backward variant once passed interpret
    # mode and miscompiled on v5e — pallas_kernel.py history). Forward
    # image AND parameter gradients are compared each round.
    parity_ok, parity_detail = None, {}
    if os.environ.get("BENCH_PARITY", "1") == "1" and backend == "pallas":
        from reduced_3dgs_tpu.trainer import functional as F
        params = model.parameters()
        aux = model.aux_state()
        alive = F.alive_mask(params["xyz"].shape[0], model.num_points)
        model_x = VariableSHGaussianModel(3, render_backend="xla")
        model_x.set_parameters(params)
        model_x.init_degrees()
        model_x.active_sh_degree = 3

        # Compare gradients at PERTURBED params against the unperturbed GT,
        # so the loss is O(1e-2) — a real training regime. Round 2's gate
        # compared gradients AT the loss minimum (gt rendered from the very
        # params being differentiated), where the "gradients" are fp-noise
        # residuals and a max-rel-diff gate measures nothing (VERDICT r02
        # Weak #2).
        pk = jax.random.split(jax.random.PRNGKey(7), 6)
        params_p = dict(
            xyz=params["xyz"] + 0.01 * jax.random.normal(pk[0], params["xyz"].shape),
            features_dc=params["features_dc"]
            + 0.05 * jax.random.normal(pk[1], params["features_dc"].shape),
            features_rest=params["features_rest"]
            + 0.02 * jax.random.normal(pk[2], params["features_rest"].shape),
            scaling=params["scaling"]
            + 0.1 * jax.random.normal(pk[3], params["scaling"].shape),
            rotation=params["rotation"]
            + 0.02 * jax.random.normal(pk[4], params["rotation"].shape),
            opacity=params["opacity"]
            + 0.2 * jax.random.normal(pk[5], params["opacity"].shape))

        def loss_of(m):
            # Every device array is an ARGUMENT: a jitted executable that
            # captures concrete device arrays as closure constants degrades
            # the axon runtime's dispatch path for the rest of the process
            # (~6 ms on every later call), which would skew the timing loop
            # below (see ops/projection.py transform_points note).
            def f(p, camera, gt_img, aux_, alive_):
                out = m.render(p, camera, aux=aux_, alive=alive_,
                               key_buffer_size=1 << 20)
                return jnp.mean((out["render"] - gt_img) ** 2), out["render"]
            return jax.jit(jax.value_and_grad(f, has_aux=True))

        (loss_p, img_p), g_p = loss_of(model)(params_p, cam, gt, aux, alive)
        (loss_x, img_x), g_x = loss_of(model_x)(params_p, cam, gt, aux, alive)
        img_diff = float(jnp.max(jnp.abs(img_p - img_x)))
        grad_rel = {}
        for k in g_p:
            scale = float(jnp.max(jnp.abs(g_x[k]))) or 1.0
            grad_rel[k] = float(jnp.max(jnp.abs(g_p[k] - g_x[k]))) / scale
        parity_ok = bool(img_diff < 5e-3
                         and all(v < 1e-2 for v in grad_rel.values()))
        parity_detail = {"img_max_abs_diff": round(img_diff, 6),
                         "loss": round(float(loss_x), 6),
                         "grad_max_rel_diff": {k: round(v, 6)
                                               for k, v in grad_rel.items()}}

    print("[bench] parity done; building trainer", file=sys.stderr, flush=True)
    trainer = Trainer(model, ds)
    trainer.model.active_sh_degree = 3  # bench the full-SH path

    # warmup / compile: run enough steps for the adaptive key-buffer resize
    # (drained every 64 steps) to settle and recompile before timing. Two
    # full drain windows: the first drain sizes the buffer to the warmup
    # TRANSIENT peak (early steps emit ~40% more entries before Adam settles
    # the scene); the second shrinks it to the steady state that a real
    # training run would track.
    for _ in range(130):
        loss, out = trainer.step(cam)
    jax.block_until_ready(out["render"])
    num_rendered = int(out.get("num_rendered", 0))

    print("[bench] warmup done", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss, out = trainer.step(cam)
    jax.block_until_ready(out["render"])
    dt_single = (time.perf_counter() - t0) / STEPS
    print("[bench] single timing done", file=sys.stderr, flush=True)

    # Fused multi-step windows: the production stepping mode (train.py runs
    # step_many windows sized by max_window). k steps dispatch as ONE jitted
    # lax.scan program, amortizing per-call cost over the remote TPU tunnel.
    window = int(os.environ.get("BENCH_WINDOW", 16))
    dt = dt_single
    fused_ms = None
    if window > 1:
        cams = [cam] * window
        for _ in range(3):
            losses, ys = trainer.step_many(cams)
        jax.block_until_ready(losses[-1])
        n_win = max(STEPS // window, 3)
        t0 = time.perf_counter()
        for _ in range(n_win):
            losses, ys = trainer.step_many(cams)
        jax.block_until_ready(losses[-1])
        fused_ms = (time.perf_counter() - t0) / (n_win * window) * 1e3
        dt = min(dt, fused_ms / 1e3)

    pix_per_s = HEIGHT * WIDTH / dt

    # --- flagship steady-state step (VERDICT r02 #8): the product is the
    # densify-pruning-shculling onion; its per-step cost (accumulators
    # live, no event in the timed window) is the 30k-iteration number.
    #
    # Methodology (VERDICT r04 Weak #3): the r04 bench compared a flagship
    # timed LATE in the training trajectory against a bare step timed
    # EARLY — num_rendered drifts as the scene trains, so the 15.6 ms
    # "overhead" conflated wrapper cost with workload drift. Both are now
    # rebuilt from the SAME parameter snapshot and timed back to back; the
    # gate is flagship <= bare + 3 ms on those paired numbers.
    flagship_ms = None
    bare_paired_ms = None
    flagship_gate_ok = None
    flagship_error = None
    if os.environ.get("BENCH_FLAGSHIP", "1") == "1":
        # Run the flagship section in a KILLABLE SUBPROCESS: the axon
        # tunnel can wedge mid-compile on the flagship program set
        # (observed twice in r05, each time freezing the whole process
        # inside a jax call with no recovery path). A wedged flagship
        # probe must cost its timeout, not the round's headline metric.
        import subprocess
        env = dict(os.environ, BENCH_FLAGSHIP="inner", BENCH_PARITY="0",
                   BENCH_STEPS="3")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=1500)
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith('{"flagship_step_ms"')]
            if line:
                fd = json.loads(line[-1])
                flagship_ms = fd["flagship_step_ms"]
                bare_paired_ms = fd["bare_paired_step_ms"]
                flagship_gate_ok = fd["flagship_gate_ok"]
            else:
                flagship_error = (f"no flagship line; rc={proc.returncode} "
                                  f"tail={proc.stdout[-200:]!r}")
        except subprocess.TimeoutExpired:
            flagship_error = "flagship subprocess timed out (tunnel wedge?)"

    if os.environ.get("BENCH_FLAGSHIP") == "inner":
        from reduced_3dgs_tpu.prepare import modes

        # The flagship and its paired bare reference are timed on the SAME
        # parameter state (the flagship-warmed one) over SHORT horizons
        # (<=64 steps each): long per-trainer re-training drifts the
        # workload itself — under the plain loss (no scale regularizer) a
        # further ~300 steps ballooned num_rendered until the "bare" step
        # read 275 ms (r05 preview), which says nothing about wrapper
        # overhead.
        def time_short(tr, warm_steps):
            tr.model.active_sh_degree = 3
            for _ in range(warm_steps):
                _, o = tr.step(cam)
            jax.block_until_ready(o["render"])
            fk = tr.max_window(window) if window > 1 else 1
            if fk > 1:
                fcams = [cam] * fk
                fl, _ = tr.step_many(fcams)
                jax.block_until_ready(fl[-1])
                t0 = time.perf_counter()
                for _ in range(3):
                    fl, _ = tr.step_many(fcams)
                jax.block_until_ready(fl[-1])
                return (time.perf_counter() - t0) / (3 * fk) * 1e3
            t0 = time.perf_counter()
            for _ in range(48):
                _, o = tr.step(cam)
            jax.block_until_ready(o["render"])
            return (time.perf_counter() - t0) / 48 * 1e3

        print("[bench] fused done; flagship build", file=sys.stderr, flush=True)
        fmodel = VariableSHGaussianModel(3, render_backend=backend)
        fmodel.set_parameters({k: jnp.array(v)
                               for k, v in model.parameters().items()})
        fmodel.init_degrees()
        ftrainer = modes["densify-pruning-shculling"](fmodel, ds)
        # Steady state past the event windows (densify/prune end @15000,
        # importance @20000): only the wrappers' per-step overhead remains.
        ftrainer.curr_step = 25_000
        ftrainer.engine._curr_step = 25_000
        fmodel.active_sh_degree = 3
        print("[bench] flagship warming", file=sys.stderr, flush=True)
        for _ in range(130):
            _, fo = ftrainer.step(cam)
        jax.block_until_ready(fo["render"])
        fsnap = {k: jnp.array(v) for k, v in fmodel.parameters().items()}
        print("[bench] flagship warmed", file=sys.stderr, flush=True)
        flagship_ms = time_short(ftrainer, 2)

        bmodel = VariableSHGaussianModel(3, render_backend=backend)
        bmodel.set_parameters({k: jnp.array(v) for k, v in fsnap.items()})
        bmodel.init_degrees()
        bmodel.active_sh_degree = 3
        print("[bench] flagship timed; paired bare", file=sys.stderr, flush=True)
        bare_paired_ms = time_short(Trainer(bmodel, ds), 80)
        print("[bench] paired bare timed", file=sys.stderr, flush=True)
        flagship_gate_ok = bool(flagship_ms <= bare_paired_ms + 3.0)
        print(json.dumps({
            "flagship_step_ms": round(flagship_ms, 2),
            "bare_paired_step_ms": round(bare_paired_ms, 2),
            "flagship_gate_ok": flagship_gate_ok}))
        return

    result = {
        "metric": "train_step_pixels_per_s",
        "value": round(pix_per_s, 1),
        "unit": "pixels/s (fwd+bwd+adam, single chip)",
        "vs_baseline": round(pix_per_s / PINNED_TARGET_PIX_S, 4),
        "parity_ok": parity_ok,
        "detail": {
            "parity": parity_detail,
            "backend": backend,
            "n_gaussians": n,
            "resolution": [HEIGHT, WIDTH],
            "step_ms": round(dt * 1e3, 2),
            "single_step_ms": round(dt_single * 1e3, 2),
            "fused_step_ms": (round(fused_ms, 2)
                              if fused_ms is not None else None),
            "fused_window": window,
            "flagship_step_ms": (round(flagship_ms, 2)
                                 if flagship_ms is not None else None),
            "bare_paired_step_ms": (round(bare_paired_ms, 2)
                                    if bare_paired_ms is not None else None),
            "flagship_overhead_ms": (round(flagship_ms - bare_paired_ms, 2)
                                     if flagship_ms is not None else None),
            "flagship_gate_ok": flagship_gate_ok,
            "flagship_error": flagship_error,
            "num_rendered": num_rendered,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    # Hard gate (VERDICT r02 #6): a failing numerics gate must turn the
    # round's artifacts red, not ship silently.
    if parity_ok is False:
        sys.exit(1)


if __name__ == "__main__":
    main()
