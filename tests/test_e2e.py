"""End-to-end: synthetic COLMAP dataset -> train CLI -> quantize CLI -> render."""
import json
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reduced_3dgs_tpu.dataset import prepare_dataset
from reduced_3dgs_tpu.dataset.colmap import load_sparse
from .helpers import random_cloud


def _write_colmap_dataset(root, n_points=40, n_cams=3, hw=32):
    """Create a tiny COLMAP-format dataset with rendered images."""
    import math
    from PIL import Image
    from reduced_3dgs_tpu.models import GaussianModel
    from reduced_3dgs_tpu.dataset import build_camera

    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    cloud = random_cloud(jax.random.PRNGKey(0), n_points)
    gt = GaussianModel(3)
    gt.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=cloud["features"][:, :1],
        features_rest=cloud["features"][:, 1:], scaling=cloud["scaling"],
        rotation=cloud["rotation"], opacity=cloud["opacity"]))

    # cameras.bin: one SIMPLE_PINHOLE camera
    focal = hw / (2 * math.tan(0.5))
    with open(os.path.join(root, "sparse", "0", "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, hw, hw))          # SIMPLE_PINHOLE
        f.write(struct.pack("<ddd", focal, hw / 2, hw / 2))

    # images.bin + rendered pngs
    with open(os.path.join(root, "sparse", "0", "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            a = 0.2 * (i - (n_cams - 1) / 2)
            qw, qy = math.cos(a / 2), math.sin(a / 2)
            qvec = np.array([qw, 0.0, qy, 0.0])
            tvec = np.zeros(3)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *qvec))
            f.write(struct.pack("<ddd", *tvec))
            f.write(struct.pack("<i", 1))
            name = f"img{i}.png"
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
            # render ground truth through our own camera model
            from reduced_3dgs_tpu.dataset.colmap import qvec2rotmat
            R_stored = qvec2rotmat(qvec).T
            fov = 2 * math.atan(hw / (2 * focal))
            cam = build_camera(image_height=hw, image_width=hw,
                               FoVx=fov, FoVy=fov, R=R_stored, T=tvec)
            img = np.asarray(jnp.clip(gt(cam)["render"], 0, 1) * 255
                             ).astype(np.uint8).transpose(1, 2, 0)
            Image.fromarray(img).save(os.path.join(root, "images", name))

    # points3D.bin from the gt cloud
    xyz = np.asarray(cloud["xyz"], np.float64)
    with open(os.path.join(root, "sparse", "0", "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for i in range(n_points):
            f.write(struct.pack("<QdddBBBd", i, *xyz[i], 128, 128, 128, 1.0))
            f.write(struct.pack("<Q", 0))
    return root


@pytest.fixture(scope="module")
def colmap_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("colmap"))
    return _write_colmap_dataset(root)


def test_colmap_parsing(colmap_dir):
    cams, images, xyz, rgb = load_sparse(colmap_dir)
    assert len(cams) == 1 and len(images) == 3
    assert xyz.shape == (40, 3) and rgb.shape == (40, 3)


def test_prepare_dataset(colmap_dir):
    ds = prepare_dataset(source=colmap_dir)
    assert len(ds) == 3
    cam = ds[0]
    assert cam.ground_truth_image.shape == (3, 32, 32)
    assert cam.image_width == 32


def test_train_cli_flagship_mode(colmap_dir, tmp_path):
    """python -m reduced_3dgs_tpu.train on the flagship mode, tiny schedule,
    exercising densify+prune+shcull+quantize end to end."""
    from reduced_3dgs_tpu.train import main
    dest = str(tmp_path / "out")
    main([
        "-s", colmap_dir, "-d", dest, "-i", "30",
        "--mode", "densify-pruning-shculling", "--quantize",
        "--save_iterations", "30",
        "-o", "densify_from_iter=5", "-o", "densify_interval=10",
        "-o", "densify_until_iter=20",
        "-o", "prune_from_iter=5", "-o", "prune_interval=10",
        "-o", "prune_until_iter=20",
        "-o", "importance_prune_from_iter=15",
        "-o", "importance_prune_until_iter=20",
        "-o", "importance_prune_interval=5",
        "-o", "cull_at_steps=[25]",
        "-o", "quantize_from_iter=10", "-o", "quantize_interval=10",
        "-o", "num_clusters=16",
    ])
    it_dir = os.path.join(dest, "point_cloud", "iteration_30")
    assert os.path.exists(os.path.join(it_dir, "point_cloud.ply"))
    assert os.path.exists(os.path.join(it_dir, "point_cloud_quantized.ply"))
    assert os.path.exists(os.path.join(dest, "cameras.json"))
    assert os.path.exists(os.path.join(dest, "cfg_args"))

    # quantized file must be substantially smaller than the raw PLY
    raw = os.path.getsize(os.path.join(it_dir, "point_cloud.ply"))
    qt = os.path.getsize(os.path.join(it_dir, "point_cloud_quantized.ply"))
    assert qt < raw

    # offline quantize CLI round trip
    from reduced_3dgs_tpu.quantize import main as qmain
    dest2 = str(tmp_path / "quant")
    qmain(["-s", dest, "-d", dest2, "-i", "30", "-o", "num_clusters=16"])
    assert os.path.exists(os.path.join(
        dest2, "point_cloud", "iteration_30", "point_cloud_quantized.ply"))

    # render CLI
    from reduced_3dgs_tpu.render import main as rmain
    rmain(["-s", colmap_dir, "-d", dest, "-i", "30", "--no_save_images"])
    metrics = json.load(open(os.path.join(dest, "metrics.json")))
    assert metrics["summary"]["n_images"] == 3
    assert np.isfinite(metrics["summary"]["psnr"])


@pytest.mark.parametrize("mode", ["pruning", "densify-pruning",
                                  "densify-shculling"])
def test_modes_run(colmap_dir, tmp_path, mode):
    from reduced_3dgs_tpu.train import main
    dest = str(tmp_path / f"out_{mode}")
    main([
        "-s", colmap_dir, "-d", dest, "-i", "12", "--mode", mode,
        "--save_iterations", "12",
        "-o", "densify_from_iter=4", "-o", "densify_interval=6",
        "-o", "prune_from_iter=4", "-o", "prune_interval=6",
        "-o", "importance_prune_from_iter=8",
        "-o", "importance_prune_until_iter=10",
        "-o", "importance_prune_interval=2",
        "-o", "cull_at_steps=[10]",
    ])
    assert os.path.exists(os.path.join(
        dest, "point_cloud", "iteration_12", "point_cloud.ply"))
