"""Camera datasets.

Equivalent of the reference base package's `CameraDataset` /
`TrainableCameraDataset` / `prepare_dataset` (usage:
/root/reference/reduced_3dgs/train.py:22,67, README.md:80).
"""
from __future__ import annotations

import json
import math
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .camera import Camera, build_camera, camera_from_json, camera_to_json, focal2fov
from .colmap import load_sparse, qvec2rotmat


class CameraDataset:
    """An ordered collection of cameras with ground-truth images."""

    def __init__(self, cameras: List[Camera], image_names: Optional[List[str]] = None):
        self.cameras = list(cameras)
        self.image_names = image_names or [f"{i:05d}" for i in range(len(cameras))]

    def __len__(self):
        return len(self.cameras)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return CameraDataset(self.cameras[idx], self.image_names[idx])
        return self.cameras[idx]

    def __iter__(self):
        return iter(self.cameras)

    def save_cameras(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        entries = [camera_to_json(i, cam, self.image_names[i])
                   for i, cam in enumerate(self.cameras)]
        with open(path, "w") as f:
            json.dump(entries, f)

    @classmethod
    def load_cameras(cls, path: str, **overrides):
        entries = json.load(open(path))
        cams = [camera_from_json(e, **overrides) for e in entries]
        names = [e.get("img_name", f"{i:05d}") for i, e in enumerate(entries)]
        return cls(cams, names)

    def scene_extent(self) -> float:
        """Radius of the camera-position bounding sphere * 1.1 (the vanilla
        3DGS `getNerfppNorm` convention the densifier thresholds assume)."""
        centers = np.stack([np.asarray(c.camera_center) for c in self.cameras])
        avg = centers.mean(axis=0)
        return float(np.linalg.norm(centers - avg, axis=1).max() * 1.1) or 1.0

    def to(self, device):  # API parity
        return self


class TrainableCameraDataset(CameraDataset):
    """Dataset whose camera poses can be optimised (reference
    TrainableCameraDataset contract). Pose deltas live in the camera trainer;
    this class exposes replace() so updated cameras can be written back."""

    def replace(self, idx: int, camera: Camera):
        self.cameras[idx] = camera
        return self


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    img = Image.open(path)
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return arr.transpose(2, 0, 1)  # [3,H,W]


def _maybe_load_mask(source: str, name: str, shape_hw) -> Optional[np.ndarray]:
    stem = os.path.splitext(name)[0]
    for sub in ("masks", "mask"):
        for ext in (".png", ".jpg", ".jpg.png"):
            p = os.path.join(source, sub, stem + ext)
            if os.path.exists(p):
                from PIL import Image
                m = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
                if m.shape == tuple(shape_hw):
                    return m[None]
    return None


def _maybe_load_depth(source: str, name: str, shape_hw) -> Optional[np.ndarray]:
    stem = os.path.splitext(name)[0]
    for sub in ("depths", "depth"):
        for ext in (".npy",):
            p = os.path.join(source, sub, stem + ext)
            if os.path.exists(p):
                d = np.load(p).astype(np.float32)
                if d.shape == tuple(shape_hw):
                    return d
        for ext in (".png",):
            p = os.path.join(source, sub, stem + ext)
            if os.path.exists(p):
                from PIL import Image
                d = np.asarray(Image.open(p), np.float32)
                if d.shape[:2] == tuple(shape_hw):
                    return d
    return None


def colmap_fov(cam) -> tuple:
    """(FoVx, FoVy) from a ColmapCamera."""
    if cam.model == "SIMPLE_PINHOLE" or cam.model == "SIMPLE_RADIAL":
        f = cam.params[0]
        return focal2fov(f, cam.width), focal2fov(f, cam.height)
    if cam.model in ("PINHOLE", "OPENCV"):
        fx, fy = cam.params[0], cam.params[1]
        return focal2fov(fx, cam.width), focal2fov(fy, cam.height)
    raise NotImplementedError(f"COLMAP camera model {cam.model}")


def prepare_dataset(source: str, device: str = "tpu", trainable_camera: bool = False,
                    load_camera: Optional[str] = None, load_mask: bool = True,
                    load_depth: bool = True, image_dir: str = "images",
                    resolution_scale: float = 1.0) -> CameraDataset:
    """Load a COLMAP dataset with images (+ optional masks, depths).

    Mirrors the reference `prepare_dataset` call signature (train.py:22).
    """
    del device
    cls = TrainableCameraDataset if trainable_camera else CameraDataset
    if load_camera:
        return cls.load_cameras(load_camera)
    colmap_cams, colmap_images, _, _ = load_sparse(source)
    cams, names = [], []
    for iid in sorted(colmap_images.keys()):
        img = colmap_images[iid]
        ccam = colmap_cams[img.camera_id]
        fovx, fovy = colmap_fov(ccam)
        # COLMAP: p_cam = R_colmap @ p + t. Our stored row-vector convention
        # needs M[:3,:3] = R_colmap^T so that p @ M[:3,:3] = R_colmap @ p.
        R_stored = qvec2rotmat(img.qvec).T
        img_path = os.path.join(source, image_dir, img.name)
        gt = mask = depth = None
        h, w = ccam.height, ccam.width
        if os.path.exists(img_path):
            gt = _load_image(img_path)
            h, w = gt.shape[1], gt.shape[2]
            if resolution_scale != 1.0:
                from PIL import Image
                im = Image.open(img_path).convert("RGB")
                w = int(w * resolution_scale)
                h = int(h * resolution_scale)
                gt = (np.asarray(im.resize((w, h)), np.float32) / 255.0
                      ).transpose(2, 0, 1)
            if load_mask:
                mask = _maybe_load_mask(source, img.name, (h, w))
            if load_depth:
                depth = _maybe_load_depth(source, img.name, (h, w))
        cams.append(build_camera(
            image_height=h, image_width=w, FoVx=fovx, FoVy=fovy,
            R=R_stored, T=img.tvec,
            ground_truth_image=jnp.asarray(gt) if gt is not None else None,
            ground_truth_image_mask=jnp.asarray(mask) if mask is not None else None,
            ground_truth_depth=jnp.asarray(depth) if depth is not None else None,
        ))
        names.append(os.path.splitext(img.name)[0])
    return cls(cams, names)
