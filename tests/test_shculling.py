import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
from reduced_3dgs_tpu.ops.shculling_stats import (calculate_colours_variance,
                                                  colours_by_degree)
from reduced_3dgs_tpu.ops.sh import SH_C0, eval_sh
from reduced_3dgs_tpu.shculling import (SHCuller, VariableSHGaussianModel,
                                        cull_sh_bands)
from .helpers import random_cloud


def _vs_model(n=30, key=0, uniform_dc=None, rest_scale=0.3):
    cloud = random_cloud(jax.random.PRNGKey(key), n)
    m = VariableSHGaussianModel(3)
    fdc = cloud["features"][:, :1]
    frest = cloud["features"][:, 1:] * (rest_scale / 0.3)
    if uniform_dc is not None:
        fdc = jnp.full_like(fdc, uniform_dc)
    m.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=fdc, features_rest=frest,
        scaling=cloud["scaling"], rotation=cloud["rotation"],
        opacity=cloud["opacity"]))
    m.init_degrees()
    return m


def _cams(n=3, hw=32):
    import math
    cams = []
    for i in range(n):
        a = 0.25 * (i - (n - 1) / 2)
        R = np.array([[math.cos(a), 0, -math.sin(a)], [0, 1, 0],
                      [math.sin(a), 0, math.cos(a)]], np.float32)
        cams.append(build_camera(image_height=hw, image_width=hw,
                                 FoVx=1.0, FoVy=1.0, R=R,
                                 T=np.zeros(3, np.float32)))
    return CameraDataset(cams)


def test_colours_by_degree_stages():
    feats = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 3)) * 0.3
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    degrees = jnp.array([3, 3, 1, 0])
    cols = colours_by_degree(feats, dirs, degrees)
    # stage 3 for a full-degree gaussian equals eval_sh at degree 3
    full = eval_sh(feats, dirs, 3)
    np.testing.assert_allclose(np.asarray(cols[0, 3]), np.asarray(full[0]),
                               rtol=1e-5, atol=1e-6)
    # stage 0 equals DC eval
    dc = eval_sh(feats, dirs, 0)
    np.testing.assert_allclose(np.asarray(cols[:, 0]), np.asarray(dc),
                               rtol=1e-5, atol=1e-6)
    # stages above a gaussian's degree are zero (CUDA early-return)
    np.testing.assert_array_equal(np.asarray(cols[2, 2:]), 0.0)
    np.testing.assert_array_equal(np.asarray(cols[3, 1:]), 0.0)


def test_variance_zero_for_view_independent_colour():
    """Gaussians with zero rest coefficients have view-independent colour:
    the weighted variance must be ~0 and the mean ~ the DC colour."""
    m = _vs_model(n=12, rest_scale=0.0)
    ds = _cams()
    dist, var, mean = calculate_colours_variance(
        ds, m, m.parameters(), m.aux_state()["degrees"], 3, m.alive_mask)
    var = np.asarray(var)
    seen = np.asarray(mean).sum(axis=(1, 2)) != 0
    assert seen.any()
    assert np.abs(var[seen]).max() < 1e-6
    np.testing.assert_array_equal(np.asarray(dist)[seen], 0.0)


def test_cull_sh_bands_zero_rest_goes_degree0():
    m = _vs_model(n=12, rest_scale=0.0)
    ds = _cams()
    cull_sh_bands(m, ds, threshold=6, std_threshold=0.04)
    deg = np.asarray(m.aux_state()["degrees"])
    # view-independent colour -> everything culled to degree 0
    np.testing.assert_array_equal(deg, 0)
    np.testing.assert_array_equal(np.asarray(m._features_rest), 0.0)


def test_cull_sh_bands_keeps_view_dependence():
    m = _vs_model(n=12, rest_scale=3.0)   # strongly view dependent
    ds = _cams()
    deg_before = np.asarray(m.aux_state()["degrees"]).copy()
    cull_sh_bands(m, ds, threshold=0.0001, std_threshold=0.0)
    deg = np.asarray(m.aux_state()["degrees"])
    # thresholds ~0: nothing may be culled
    np.testing.assert_array_equal(deg, deg_before)


def test_low_variance_bakes_mean_into_dc():
    m = _vs_model(n=8, rest_scale=0.0)
    ds = _cams()
    dc_color_before = np.asarray(m._features_dc) * SH_C0 + 0.5
    cull_sh_bands(m, ds, threshold=6, std_threshold=0.04)
    dc_color_after = np.asarray(m._features_dc) * SH_C0 + 0.5
    # for already view-independent gaussians the baked mean is the clamped
    # original DC colour
    np.testing.assert_allclose(dc_color_after,
                               np.clip(dc_color_before, 0, None), atol=1e-4)


def test_shculler_fires_at_step():
    from reduced_3dgs_tpu.trainer import BaseTrainer
    m = _vs_model(n=10, rest_scale=0.0)
    ds = _cams(2, hw=16)
    cams = [c.replace(ground_truth_image=jnp.zeros((3, 16, 16)))
            for c in ds]
    ds = CameraDataset(cams)
    trainer = SHCuller(BaseTrainer(m, ds), ds, cdist_threshold=6,
                       std_threshold=0.04, cull_at_steps=[2])
    trainer.step(ds[0])
    assert np.asarray(m.aux_state()["degrees"])[: m.num_points].max() == 3
    trainer.step(ds[1])  # step 2 -> cull fires
    assert np.asarray(m.aux_state()["degrees"])[: m.num_points].max() == 0


def test_colours_variance_scan_matches_per_camera_loop(monkeypatch):
    """The stacked-camera lax.scan sweep must equal the per-camera
    accumulation loop (same West-style running stats, same order)."""
    import jax
    import numpy as np
    from reduced_3dgs_tpu.dataset import build_camera
    from reduced_3dgs_tpu.dataset import camera as camera_mod
    from reduced_3dgs_tpu.ops.shculling_stats import calculate_colours_variance
    from reduced_3dgs_tpu.shculling import VariableSHGaussianModel
    from .helpers import random_cloud

    cloud = random_cloud(jax.random.PRNGKey(5), 25)
    m = VariableSHGaussianModel(3)
    m.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=cloud["features"][:, :1],
        features_rest=cloud["features"][:, 1:], scaling=cloud["scaling"],
        rotation=cloud["rotation"], opacity=cloud["opacity"]))
    m.init_degrees()
    cams = [build_camera(image_height=32, image_width=32, FoVx=1.0, FoVy=1.0),
            build_camera(image_height=32, image_width=32, FoVx=1.1, FoVy=1.0),
            build_camera(image_height=32, image_width=32, FoVx=1.0, FoVy=1.1)]
    params = m.parameters()
    degrees = m.aux_state()["degrees"]

    scan = calculate_colours_variance(cams, m, params, degrees, 3)
    monkeypatch.setattr(camera_mod, "stackable", lambda cs: False)
    loop = calculate_colours_variance(cams, m, params, degrees, 3)
    for a, b in zip(scan, loop):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
