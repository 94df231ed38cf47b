"""Failure snapshots: dump the training state when something goes wrong.

Analog of the reference rasterizer's debug dump — on a CUDA failure it
pickles every kernel argument to `snapshot_fw/bw.dump` for offline repro
(/root/reference/submodules/diff-gaussian-rasterization/diff_gaussian_rasterization/__init__.py:90-97).
Here the failure modes are different (no illegal-memory crashes; instead
non-finite losses or a key buffer that overflows persistently), so the
snapshot is one flat .npz of the trainer state + camera + scalars, written
at most `MAX_SNAPSHOTS` times per process so a crashing loop cannot fill
the disk.

Enable/relocate via R3DGS_SNAPSHOT_DIR (default: ./failure_snapshots;
set to "0" to disable entirely).
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np

MAX_SNAPSHOTS = 8
_written = 0


def snapshot_dir() -> Optional[str]:
    d = os.environ.get("R3DGS_SNAPSHOT_DIR", "failure_snapshots")
    return None if d == "0" else d


def _flatten(prefix: str, obj: Any, out: Dict[str, np.ndarray]) -> None:
    if obj is None:
        return
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(f"{prefix}/{k}" if prefix else str(k), v, out)
        return
    if isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _flatten(f"{prefix}/{i}", v, out)
        return
    if hasattr(obj, "_asdict"):                      # NamedTuple
        _flatten(prefix, obj._asdict(), out)
        return
    try:
        out[prefix] = np.asarray(obj)
    except Exception:
        # repr() of a DELETED jax array (donated buffer) raises too —
        # a snapshot helper must never crash the training step it is
        # trying to document (observed: overflow snapshot at a densify
        # boundary killed a convergence run on a donated [N,3]).
        try:
            out[prefix] = np.asarray(repr(obj))
        except Exception as e:
            out[prefix] = np.asarray(f"<unavailable: {type(obj).__name__}:"
                                     f" {e.__class__.__name__}>")


def dump_failure_snapshot(tag: str, state: Dict[str, Any]) -> Optional[str]:
    """Write `state` (an arbitrary pytree of arrays/scalars) as one .npz.

    Returns the written path, or None when disabled / over the limit."""
    global _written
    d = snapshot_dir()
    if d is None or _written >= MAX_SNAPSHOTS:
        return None
    os.makedirs(d, exist_ok=True)
    flat: Dict[str, np.ndarray] = {}
    _flatten("", state, flat)
    path = os.path.join(d, f"{tag}_{int(time.time())}_{_written}.npz")
    np.savez_compressed(path, **flat)
    _written += 1
    return path


def trainer_snapshot(trainer, tag: str, camera=None,
                     extra: Optional[dict] = None) -> Optional[str]:
    """Snapshot a trainer engine's full state (params, adam, accumulators)."""
    state: Dict[str, Any] = {
        "params": trainer.model.parameters(),
        "aux": trainer.model.aux_state(),
        "n_alive": trainer.n_alive,
    }
    for name in ("xyz_grad_accum", "xyz_grad_denom", "max_radii2d"):
        if hasattr(trainer, name):
            state[name] = getattr(trainer, name)
    if getattr(trainer, "adam", None) is not None:
        state["adam"] = trainer.adam
    if camera is not None:
        state["camera"] = {
            "world_view_transform": camera.world_view_transform,
            "full_proj_transform": camera.full_proj_transform,
            "camera_center": camera.camera_center,
            "image_height": camera.image_height,
            "image_width": camera.image_width,
        }
    if extra:
        state["extra"] = extra
    return dump_failure_snapshot(tag, state)
