"""Offline post-hoc quantization CLI
(mirrors /root/reference/reduced_3dgs/quantize.py).

Usage: python -m reduced_3dgs_tpu.quantize -s <src> -d <dst> -i <iteration>
Loads a trained PLY, writes point_cloud_quantized.ply, then performs the
quantize -> dequantize round trip and writes the dequantized point_cloud.ply.
"""
from __future__ import annotations

import os
import shutil

from .quantization import ExcludeZeroSHQuantizer
from .shculling import VariableSHGaussianModel


def quantize_ply(sh_degree: int, load_ply: str, save_quantized: str,
                 save_dequantized: str = None, device: str = "tpu",
                 **quantizer_configs):
    gaussians = VariableSHGaussianModel(sh_degree).to(device)
    gaussians.load_ply(load_ply)
    quantizer = ExcludeZeroSHQuantizer(**quantizer_configs)
    quantizer.save_quantized(gaussians, save_quantized)
    if save_dequantized:
        model2 = VariableSHGaussianModel(sh_degree).to(device)
        # round trip through the on-disk representation
        quantizer2 = ExcludeZeroSHQuantizer(**quantizer_configs)
        quantizer2.load_quantized(model2, save_quantized)
        model2.save_ply(save_dequantized)
    return gaussians


def main(argv=None):
    from argparse import ArgumentParser
    parser = ArgumentParser()
    parser.add_argument("--sh_degree", default=3, type=int)
    parser.add_argument("-s", "--source", required=True, type=str)
    parser.add_argument("-d", "--destination", required=True, type=str)
    parser.add_argument("-i", "--iteration", default=30000, type=int)
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("-o", "--option", default=[], action="append", type=str)
    args = parser.parse_args(argv)

    import ast
    configs = {}
    for o in args.option:
        k, v = o.split("=", 1)
        try:
            configs[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            configs[k] = v

    it_dir = os.path.join(args.source, "point_cloud", f"iteration_{args.iteration}")
    out_dir = os.path.join(args.destination, "point_cloud",
                           f"iteration_{args.iteration}")
    os.makedirs(out_dir, exist_ok=True)
    quantize_ply(
        args.sh_degree,
        load_ply=os.path.join(it_dir, "point_cloud.ply"),
        save_quantized=os.path.join(out_dir, "point_cloud_quantized.ply"),
        save_dequantized=os.path.join(out_dir, "point_cloud.ply"),
        device=args.device, **configs)
    for aux in ("cfg_args", "cameras.json"):
        src = os.path.join(args.source, aux)
        if os.path.exists(src) and args.source != args.destination:
            shutil.copy(src, os.path.join(args.destination, aux))


if __name__ == "__main__":
    main()
