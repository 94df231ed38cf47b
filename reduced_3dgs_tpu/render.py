"""Rendering / evaluation CLI.

The reference delegates to `python -m gaussian_splatting.render`
(README.md:61); this is the TPU framework's equivalent: render every camera
of a trained model, save images, and report PSNR/SSIM (+LPIPS when weights
are available).

Usage: python -m reduced_3dgs_tpu.render -s <colmap_dir> -d <model_dir> -i 30000
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from .dataset.dataset import prepare_dataset
from .metrics.lpips import lpips, lpips_available
from .ops.ssim import ssim
from .shculling import VariableSHGaussianModel
from .utils.math import psnr


def save_image(path: str, img) -> None:
    from PIL import Image
    arr = np.asarray(jnp.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr.transpose(1, 2, 0)).save(path)


def render_dataset(model, dataset, out_dir: str, save_images: bool = True):
    os.makedirs(out_dir, exist_ok=True)
    metrics = []
    for i, camera in enumerate(dataset):
        out = model(camera)
        img = out["render"]
        if save_images:
            save_image(os.path.join(out_dir, f"{i:05d}.png"), img)
        gt = camera.ground_truth_image
        if gt is not None:
            m = {
                "psnr": float(psnr(img, gt).mean()),
                "ssim": float(ssim(jnp.clip(img, 0, 1), gt)),
            }
            # LPIPS only when weights exist locally (the reference downloads
            # torchvision weights at runtime, lpipsPyTorch/modules/utils.py;
            # this environment cannot — see tools/export_lpips_weights.py).
            if lpips_available():
                m["lpips"] = float(lpips(jnp.clip(img, 0, 1), gt))
            metrics.append(m)
    return metrics


def main(argv=None):
    from argparse import ArgumentParser
    parser = ArgumentParser()
    parser.add_argument("--sh_degree", default=3, type=int)
    parser.add_argument("-s", "--source", required=True, type=str)
    parser.add_argument("-d", "--destination", required=True, type=str)
    parser.add_argument("-i", "--iteration", default=30000, type=int)
    parser.add_argument("--load_quantized", action="store_true")
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--no_save_images", action="store_true")
    args = parser.parse_args(argv)
    from .utils.cache import enable_compile_cache
    enable_compile_cache()

    it_dir = os.path.join(args.destination, "point_cloud",
                          f"iteration_{args.iteration}")
    model = VariableSHGaussianModel(args.sh_degree).to(args.device)
    if args.load_quantized:
        from .quantization import ExcludeZeroSHQuantizer
        ExcludeZeroSHQuantizer().load_quantized(
            model, os.path.join(it_dir, "point_cloud_quantized.ply"))
    else:
        model.load_ply(os.path.join(it_dir, "point_cloud.ply"))
    dataset = prepare_dataset(source=args.source, device=args.device)
    metrics = render_dataset(
        model, dataset, os.path.join(args.destination, "renders"),
        save_images=not args.no_save_images)
    if metrics:
        summary = {k: float(np.mean([m[k] for m in metrics]))
                   for k in metrics[0]}
        summary["n_images"] = len(metrics)
        summary["n_points"] = model.num_points
        print(json.dumps(summary))
        with open(os.path.join(args.destination, "metrics.json"), "w") as f:
            json.dump({"per_image": metrics, "summary": summary}, f)


if __name__ == "__main__":
    main()
