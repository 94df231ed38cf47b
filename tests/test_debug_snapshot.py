"""Failure-snapshot mechanism (utils/debug.py, reference debug-dump analog)."""
import numpy as np

from reduced_3dgs_tpu.trainer.base import Trainer
from reduced_3dgs_tpu.utils import debug

from .test_trainer import _perturbed_model, _toy_scene


def test_trainer_snapshot_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("R3DGS_SNAPSHOT_DIR", str(tmp_path))
    monkeypatch.setattr(debug, "_written", 0)
    gt_model, ds = _toy_scene(n=16, hw=32, n_cams=2)
    model = _perturbed_model(gt_model)
    trainer = Trainer(model, ds)
    path = debug.trainer_snapshot(trainer, "unit", ds[0],
                                  extra={"step": 7, "loss": float("nan")})
    assert path is not None
    data = np.load(path)
    assert "params/xyz" in data.files
    assert "camera/world_view_transform" in data.files
    assert int(data["n_alive"]) == model.num_points
    assert int(data["extra/step"]) == 7


def test_snapshot_disabled_and_capped(tmp_path, monkeypatch):
    monkeypatch.setenv("R3DGS_SNAPSHOT_DIR", "0")
    assert debug.dump_failure_snapshot("x", {"a": np.zeros(3)}) is None
    monkeypatch.setenv("R3DGS_SNAPSHOT_DIR", str(tmp_path))
    monkeypatch.setattr(debug, "_written", debug.MAX_SNAPSHOTS)
    assert debug.dump_failure_snapshot("x", {"a": np.zeros(3)}) is None


def test_snapshot_survives_deleted_arrays(tmp_path, monkeypatch):
    """A failure snapshot must never crash on a DONATED (deleted) device
    array: np.asarray raises, and repr() of a deleted array raises too
    (this killed a convergence run at an overflow boundary)."""
    import jax.numpy as jnp
    from reduced_3dgs_tpu.utils import debug

    monkeypatch.setenv("R3DGS_SNAPSHOT_DIR", str(tmp_path))
    monkeypatch.setattr(debug, "_written", 0)
    arr = jnp.ones((4, 3))
    arr.delete()
    path = debug.dump_failure_snapshot(
        "deleted", {"ok": jnp.zeros((2,)), "dead": arr})
    assert path is not None
    import numpy as np
    data = np.load(path, allow_pickle=False)
    assert "dead" in data and "unavailable" in str(data["dead"])
