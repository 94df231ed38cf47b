"""Training CLI + loop (mirrors /root/reference/reduced_3dgs/train.py).

Usage: python -m reduced_3dgs_tpu.train -s <colmap_dir> -d <out_dir>
           [--mode densify-pruning-shculling] [--quantize] ...
"""
from __future__ import annotations

import json
import os
import random
import shutil
from typing import List

import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from .dataset.dataset import prepare_dataset
from .models.gaussian_model import GaussianModel
from .prepare import backends, modes, prepare_gaussians, prepare_trainer
from .quantization import AbstractQuantizer
from .trainer import AbstractTrainer
from .utils.math import psnr


def save_cfg_args(destination: str, sh_degree: int, source: str):
    """cfg_args file for reference-ecosystem viewer compatibility
    (reference train.py:99 / gaussian_splatting.train.save_cfg_args)."""
    os.makedirs(destination, exist_ok=True)
    with open(os.path.join(destination, "cfg_args"), "w") as f:
        f.write("Namespace(data_device='cuda', eval=False, images='images', "
                f"model_path={destination!r}, resolution=-1, "
                f"sh_degree={sh_degree}, source_path={source!r}, "
                "white_background=False)")


def prepare_training(sh_degree: int, source: str, device: str, mode: str,
                     trainable_camera: bool = False, load_ply: str = None,
                     load_camera: str = None, load_mask: bool = True,
                     load_depth: bool = True, backend: str = "tpu",
                     with_scale_reg: bool = False, quantize: bool = False,
                     load_quantized: str = None, configs=None):
    dataset = prepare_dataset(source=source, device=device,
                              trainable_camera=trainable_camera,
                              load_camera=load_camera, load_mask=load_mask,
                              load_depth=load_depth)
    gaussians = prepare_gaussians(sh_degree=sh_degree, source=source,
                                  device=device,
                                  trainable_camera=trainable_camera,
                                  load_ply=load_ply, backend=backend)
    trainer, quantizer = prepare_trainer(gaussians=gaussians, dataset=dataset,
                                         mode=mode,
                                         with_scale_reg=with_scale_reg,
                                         quantize=quantize,
                                         load_quantized=load_quantized,
                                         configs=configs)
    return dataset, gaussians, trainer, quantizer


def training(dataset, gaussians: GaussianModel, trainer: AbstractTrainer,
             quantizer: AbstractQuantizer, destination: str, iteration: int,
             save_iterations: List[int], device: str = "tpu",
             empty_cache_every_step: bool = False, log_interval: int = 10):
    del empty_cache_every_step  # XLA manages memory; flag kept for CLI parity
    shutil.rmtree(os.path.join(destination, "point_cloud"), ignore_errors=True)
    pbar = tqdm(total=iteration, dynamic_ncols=True, desc="Training")
    epoch = list(range(len(dataset)))
    epoch_psnr, epoch_maskpsnr = [], []
    ema_loss, avg_psnr, avg_maskpsnr = 0.0, 0.0, 0.0

    def save(step):
        save_path = os.path.join(destination, "point_cloud",
                                 f"iteration_{step}")
        os.makedirs(save_path, exist_ok=True)
        gaussians.save_ply(os.path.join(save_path, "point_cloud.ply"))
        dataset.save_cameras(os.path.join(destination, "cameras.json"))
        if quantizer:
            quantizer.save_quantized(
                gaussians, os.path.join(save_path, "point_cloud_quantized.ply"))

    # Sharded engines consume one camera PER DATA RANK each step (pure data
    # parallelism over views); single-chip engines consume one camera.
    mesh = getattr(trainer.engine, "mesh", None)
    n_data = int(mesh.shape["data"]) if mesh is not None else 1
    cursor = 0

    # Fused multi-step windows (single-chip): up to `window_max` steps run
    # as ONE jitted program (AbstractTrainer.step_many), amortizing per-call
    # dispatch over the remote-TPU tunnel; windows stop at every hook /
    # schedule / epoch / save boundary so event semantics are identical to
    # the per-step loop (tests/test_step_many.py).
    window_max = (int(os.environ.get("R3DGS_WINDOW", 16))
                  if n_data == 1 else 1)

    step = 1
    while step <= iteration:
        pos = (step - 1) % len(dataset)     # 0-based position in the epoch
        if pos == 0:
            avg_psnr = (float(np.mean([float(x) for x in epoch_psnr]))
                        if epoch_psnr else 0.0)
            avg_maskpsnr = (float(np.mean([float(x) for x in epoch_maskpsnr]))
                            if epoch_maskpsnr else 0.0)
            epoch_psnr, epoch_maskpsnr = [], []
            random.shuffle(epoch)

        # Window size: fused steps may not cross a hook/schedule boundary,
        # an epoch boundary (shuffle), a save iteration, or the end.
        k = trainer.max_window(window_max) if window_max > 1 else 1
        k = min(k, len(dataset) - pos, iteration - step + 1)
        for s in save_iterations:
            if step <= s <= step + k - 1:
                k = s - step + 1
        next_log = log_interval - (step - 1) % log_interval
        camera = None

        if n_data > 1:
            cams = [dataset[epoch[(cursor + j) % len(epoch)]]
                    for j in range(n_data)]
            cursor = (cursor + n_data) % len(epoch)
            camera = cams[0]
            loss, out = trainer.step(cams)
            losses = [loss]
            k = 1
            gt = camera.ground_truth_image
            if gt is not None:
                epoch_psnr.append(psnr(out["render"], gt).mean())
                if camera.ground_truth_image_mask is not None:
                    m = camera.ground_truth_image_mask
                    epoch_maskpsnr.append(psnr(out["render"] * m,
                                               gt * m).mean())
        elif k == 1:
            camera = dataset[epoch[pos]]
            loss, out = trainer.step(camera)
            losses = [loss]
            gt = camera.ground_truth_image
            if gt is not None:
                epoch_psnr.append(psnr(out["render"], gt).mean())
                if camera.ground_truth_image_mask is not None:
                    m = camera.ground_truth_image_mask
                    epoch_maskpsnr.append(psnr(out["render"] * m,
                                               gt * m).mean())
        else:
            cams = [dataset[epoch[pos + j]] for j in range(k)]
            camera = cams[-1]
            losses, ys = trainer.step_many(cams)
            if "psnr" in ys:
                epoch_psnr.extend(ys["psnr"][i] for i in range(k))
            if "masked_psnr" in ys:
                epoch_maskpsnr.extend(ys["masked_psnr"][i] for i in range(k))

        for loss_i in losses:
            ema_loss = 0.4 * loss_i + 0.6 * ema_loss
        if next_log <= k:
            loss_now = float(ema_loss)
            if not np.isfinite(loss_now):
                # Reference-style failure dump (the CUDA rasterizer pickles
                # its kernel args on crash); here: full trainer state +
                # camera to .npz, then abort.
                from .utils.debug import trainer_snapshot
                path = trainer_snapshot(
                    trainer.engine, "nonfinite_loss", camera,
                    extra={"step": step, "loss": loss_now})
                raise RuntimeError(
                    f"non-finite loss {loss_now} at step {step}"
                    + (f"; state dumped to {path}" if path else ""))
            postfix = {"epoch": step // len(dataset),
                       "loss": loss_now,
                       "psnr": avg_psnr, "n": gaussians.num_points}
            if avg_maskpsnr > 0:
                postfix["masked psnr"] = avg_maskpsnr
            pbar.set_postfix(postfix)
        last = step + k - 1
        if last in save_iterations:
            save(last)
        step += k
        pbar.update(k)
    pbar.close()
    save(iteration)


def main(argv=None):
    from argparse import ArgumentParser
    parser = ArgumentParser()
    parser.add_argument("--sh_degree", default=3, type=int)
    parser.add_argument("--backend", choices=backends, default="tpu")
    parser.add_argument("-s", "--source", required=True, type=str)
    parser.add_argument("-d", "--destination", required=True, type=str)
    parser.add_argument("-i", "--iteration", default=30000, type=int)
    parser.add_argument("-l", "--load_ply", default=None, type=str)
    parser.add_argument("--load_camera", default=None, type=str)
    parser.add_argument("--quantize", action="store_true")
    parser.add_argument("--no_image_mask", action="store_true")
    parser.add_argument("--no_depth_data", action="store_true")
    parser.add_argument("--with_scale_reg", action="store_true")
    parser.add_argument("--load_quantized", default=None, type=str)
    parser.add_argument("--mode", choices=list(modes),
                        default="densify-pruning-shculling")
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--mesh", default=None, type=str, metavar="DATAxTILE",
                        help="Train sharded over a (data, tile) device mesh, "
                             "e.g. '2x4' = 2-way camera data parallelism x "
                             "4-way pixel-band parallelism (8 chips). "
                             "'auto' lays all visible devices out as 1xN. "
                             "Multi-host: set JAX_COORDINATOR_ADDRESS / "
                             "JAX_PROCESS_ID / JAX_NUM_PROCESSES (or run "
                             "under a launcher that does) — "
                             "parallel.distributed_init() is called first "
                             "and the mesh spans all processes' devices.")
    parser.add_argument("--empty_cache_every_step", action="store_true")
    parser.add_argument("-o", "--option", default=[], action="append",
                        type=str)
    args = parser.parse_args(argv)
    from .utils.cache import enable_compile_cache
    enable_compile_cache()
    save_cfg_args(args.destination, args.sh_degree, args.source)

    # -o key=value free-form overrides. Values are parsed as python literals
    # (the reference eval()s them, train.py:102; literal_eval is the safe
    # equivalent), falling back to the raw string.
    import ast
    configs = {}
    for o in args.option:
        k, v = o.split("=", 1)
        try:
            configs[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            configs[k] = v

    if args.mesh:
        from .parallel import (ShardedTrainer, distributed_init, make_mesh)
        distributed_init()
        if args.mesh == "auto":
            import jax
            mesh = make_mesh(n_data=1, n_tile=len(jax.devices()))
        else:
            n_data, n_tile = (int(x) for x in args.mesh.lower().split("x"))
            mesh = make_mesh(n_data=n_data, n_tile=n_tile)
        configs.setdefault("trainer_constructor", ShardedTrainer)
        configs.setdefault("mesh", mesh)

    dataset, gaussians, trainer, quantizer = prepare_training(
        sh_degree=args.sh_degree, source=args.source, device=args.device,
        mode=args.mode, trainable_camera="camera" in args.mode,
        load_ply=args.load_ply, load_camera=args.load_camera,
        load_mask=not args.no_image_mask, load_depth=not args.no_depth_data,
        backend=args.backend, with_scale_reg=args.with_scale_reg,
        quantize=args.quantize, load_quantized=args.load_quantized,
        configs=configs)
    dataset.save_cameras(os.path.join(args.destination, "cameras.json"))
    training(dataset=dataset, gaussians=gaussians, trainer=trainer,
             quantizer=quantizer, destination=args.destination,
             iteration=args.iteration, save_iterations=args.save_iterations,
             device=args.device,
             empty_cache_every_step=args.empty_cache_every_step)


if __name__ == "__main__":
    main()
