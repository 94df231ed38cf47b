import math

import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
from reduced_3dgs_tpu.models import GaussianModel
from reduced_3dgs_tpu.trainer import (BaseDensificationTrainer, BaseTrainer,
                                      OpacityResetDensificationTrainer, Trainer)
from .helpers import random_cloud


def _toy_scene(n=40, hw=32, key=0, n_cams=3):
    """A scene rendered from a 'ground truth' cloud; training a perturbed
    clone of it must reduce the loss."""
    cloud = random_cloud(jax.random.PRNGKey(key), n)
    gt_model = GaussianModel(3)
    gt_model.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=cloud["features"][:, :1],
        features_rest=cloud["features"][:, 1:], scaling=cloud["scaling"],
        rotation=cloud["rotation"], opacity=cloud["opacity"]))
    cams = []
    for i in range(n_cams):
        ang = 0.1 * (i - 1)
        R = np.array([[math.cos(ang), 0, -math.sin(ang)],
                      [0, 1, 0],
                      [math.sin(ang), 0, math.cos(ang)]], np.float32)
        cam = build_camera(image_height=hw, image_width=hw, FoVx=1.0, FoVy=1.0,
                           R=R, T=np.array([0, 0, 0], np.float32))
        gt = gt_model(cam)["render"]
        cams.append(cam.replace(ground_truth_image=jnp.clip(gt, 0, 1)))
    ds = CameraDataset(cams)
    return gt_model, ds


def _perturbed_model(gt_model, key=1, sigma=0.05):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    p = gt_model.parameters()
    pert = {k: v + sigma * jax.random.normal(kk, v.shape)
            for (k, v), kk in zip(p.items(), ks)}
    m = GaussianModel(3)
    m.set_parameters(pert)
    return m


def test_base_trainer_reduces_loss():
    gt_model, ds = _toy_scene()
    model = _perturbed_model(gt_model)
    trainer = BaseTrainer(model, ds)
    first_losses, last_losses = [], []
    for it in range(60):
        loss, out = trainer.step(ds[it % len(ds)])
        if it < 6:
            first_losses.append(float(loss))
        if it >= 54:
            last_losses.append(float(loss))
    assert np.mean(last_losses) < 0.6 * np.mean(first_losses), (
        first_losses, last_losses)
    assert trainer.curr_step == 60


def test_trainer_sh_warmup_and_lr_schedule():
    gt_model, ds = _toy_scene(n=10)
    model = _perturbed_model(gt_model)
    trainer = Trainer(model, ds, sh_degree_up_interval=5,
                      position_lr_max_steps=20)
    assert model.active_sh_degree == 0
    lr0 = trainer.xyz_lr()
    for it in range(12):
        trainer.step(ds[it % len(ds)])
    assert model.active_sh_degree == 2
    assert trainer.xyz_lr() < lr0


def test_capacity_padding_transparent():
    gt_model, ds = _toy_scene(n=10)
    model = _perturbed_model(gt_model)
    n0 = model.num_points
    trainer = BaseTrainer(model, ds)
    assert model.num_points == n0
    assert model.capacity >= n0
    loss, out = trainer.step(ds[0])
    assert np.isfinite(float(loss))
    # dead-slot params must not change
    p = np.asarray(model.parameters()["xyz"])[n0:]
    np.testing.assert_allclose(p, 0.0)


def test_densification_trainer_runs_and_changes_counts():
    gt_model, ds = _toy_scene(n=30)
    model = _perturbed_model(gt_model, sigma=0.1)
    trainer = BaseDensificationTrainer(
        model, ds,
        densify_from_iter=2, densify_until_iter=100, densify_interval=5,
        densify_grad_threshold=1e-7,  # aggressive: force clones/splits
        prune_from_iter=2, prune_until_iter=100, prune_interval=5,
        prune_opacity_threshold=0.3)
    n0 = model.num_points
    for it in range(12):
        trainer.step(ds[it % len(ds)])
    assert model.num_points != n0
    assert np.isfinite(float(trainer.step(ds[0])[0]))


def test_opacity_reset():
    gt_model, ds = _toy_scene(n=12)
    model = _perturbed_model(gt_model)
    trainer = OpacityResetDensificationTrainer(
        model, ds, opacity_reset_interval=4,
        densify_from_iter=10_000)  # keep counts stable
    for it in range(4):
        trainer.step(ds[it % len(ds)])
    o = np.asarray(model.get_opacity)[: model.num_points]
    assert (o <= 0.0101).all()


def test_sh_sparsity_loss_gradient():
    """lambda_sh_sparsity adds the reference's L1 gradient lambda'*sign(sh)
    on features_rest (backward.cu:56-121); with a large weight the SH rest
    coefficients shrink faster than without it."""
    gt_model, ds = _toy_scene()

    def run(lam):
        model = _perturbed_model(gt_model)
        tr = BaseTrainer(model, ds, lambda_sh_sparsity=lam)
        for it in range(20):
            loss, _ = tr.step(ds[it % len(ds)])
        p = model.parameters()
        n = model.num_points
        return float(loss), float(jnp.sum(jnp.abs(p["features_rest"][:n])))

    l0, r0 = run(0.0)
    l1, r1 = run(50.0)
    assert l1 > l0          # the sparsity term contributes to the loss
    assert r1 < r0 - 1.0    # and shrinks the SH rest coefficients
    # (Adam normalizes per-coordinate step size, so the shrink rate is
    # bounded by feature_lr/20 per step regardless of the weight.)
