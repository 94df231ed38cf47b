#!/usr/bin/env python
"""One-time LPIPS weight exporter: torchvision AlexNet + lpips linear heads
-> weights/lpips_alex.npz consumable by reduced_3dgs_tpu.metrics.lpips.

Run this ON A MACHINE WITH NETWORK ACCESS (it downloads pretrained weights,
exactly like the reference's lpipsPyTorch does at runtime,
/root/reference/lpipsPyTorch/modules/utils.py:11-20), then copy the npz next
to the repo:

    pip install torch torchvision lpips
    python tools/export_lpips_weights.py --out weights/lpips_alex.npz

The npz layout matches metrics/lpips.py::_load_weights_np:
    conv{0..4}/w  [O, I, kH, kW]   AlexNet.features conv kernels
    conv{0..4}/b  [O]              conv biases
    lin{0..4}/w   [C]              LPIPS 1x1 linear head weights (>= 0)

Verification: the script cross-checks the exported npz against the
`lpips` package's AlexNet distance on random images (|diff| < 1e-4).
"""
from __future__ import annotations

import argparse
import os
import sys


def export(out_path: str) -> None:
    import numpy as np
    import torch
    import torchvision

    alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").features.eval()
    convs = [m for m in alex if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, f"expected 5 convs, got {len(convs)}"

    out = {}
    for i, conv in enumerate(convs):
        out[f"conv{i}/w"] = conv.weight.detach().numpy().astype(np.float32)
        out[f"conv{i}/b"] = conv.bias.detach().numpy().astype(np.float32)

    import lpips as lpips_pkg
    net = lpips_pkg.LPIPS(net="alex", verbose=False).eval()
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()        # [1, C, 1, 1]
        out[f"lin{i}/w"] = w.reshape(-1).astype(np.float32)

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(sorted(out)))

    # Cross-check against the lpips package on random inputs.
    rng = np.random.default_rng(0)
    a = rng.random((3, 64, 64), np.float32)
    b = rng.random((3, 64, 64), np.float32)
    ta = torch.from_numpy(a)[None] * 2 - 1
    tb = torch.from_numpy(b)[None] * 2 - 1
    want = float(net(ta, tb))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    os.environ["R3DGS_LPIPS_WEIGHTS"] = out_path
    from reduced_3dgs_tpu.metrics.lpips import lpips as jax_lpips
    got = float(jax_lpips(a, b))
    print(f"lpips package: {want:.6f}  jax: {got:.6f}  diff={abs(want-got):.2e}")
    assert abs(want - got) < 1e-4, "exported weights do not reproduce LPIPS"


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "weights", "lpips_alex.npz"))
    export(p.parse_args().out)
