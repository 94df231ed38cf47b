import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
from reduced_3dgs_tpu.importance import (calculate_v_imp_score, count_render,
                                         prune_gaussians, prune_list,
                                         score2mask)
from reduced_3dgs_tpu.models import GaussianModel
from .helpers import random_cloud


def _model_and_ds(n=30, key=0, hw=32, n_cams=2):
    cloud = random_cloud(jax.random.PRNGKey(key), n)
    m = GaussianModel(3)
    m.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=cloud["features"][:, :1],
        features_rest=cloud["features"][:, 1:], scaling=cloud["scaling"],
        rotation=cloud["rotation"], opacity=cloud["opacity"]))
    cams = [build_camera(image_height=hw, image_width=hw, FoVx=1.0, FoVy=1.0)
            for _ in range(n_cams)]
    return m, CameraDataset(cams)


def test_count_render_outputs():
    m, ds = _model_and_ds()
    out = count_render(m, ds[0])
    for k in ("render", "visibility_filter", "radii", "gaussians_count",
              "opacity_important_score", "T_alpha_important_score"):
        assert k in out, k
    cnt = np.asarray(out["gaussians_count"])
    vis = np.asarray(out["visibility_filter"])
    # visible gaussians generally hit pixels; invisible count zero
    assert (cnt[~vis] == 0).all()
    assert cnt[vis].sum() > 0


def test_prune_list_sums_over_cameras():
    m, ds = _model_and_ds(n_cams=2)
    c1, o1, t1 = prune_list(m, CameraDataset([ds[0]]))
    c2, o2, t2 = prune_list(m, ds)
    assert np.asarray(c2).sum() >= np.asarray(c1).sum()
    assert np.asarray(t2).sum() >= np.asarray(t1).sum() - 1e-5


def test_score2mask_percentile_and_threshold():
    scores = jnp.arange(10.0)
    m1 = np.asarray(score2mask(0.3, scores))
    # index int(0.3*9)=2 -> value 2.0 -> <=2 pruned
    np.testing.assert_array_equal(m1, np.arange(10) <= 2)
    m2 = np.asarray(score2mask(0.9, scores, threshold=1.0))
    np.testing.assert_array_equal(m2, np.arange(10) <= 1)


def test_calculate_v_imp_score_volume_power():
    m, _ = _model_and_ds(n=20)
    imp = jnp.ones(20)
    v0 = np.asarray(calculate_v_imp_score(m, imp, 0.0))
    np.testing.assert_allclose(v0, 1.0, rtol=1e-5)
    v1 = np.asarray(calculate_v_imp_score(m, imp, 0.1))
    assert v1.std() > 0


def test_prune_gaussians_types():
    m, ds = _model_and_ds()
    for ptype, kwargs in [
        ("important_score", {}),
        ("v_important_score", dict(prune_thr_v_important_score=3.0)),
        ("count", dict(prune_thr_count=1)),
        ("T_alpha", dict(prune_thr_T_alpha=1)),
        ("T_alpha_avg", dict(prune_thr_T_alpha_avg=0.001)),
        ("comprehensive", dict(prune_thr_v_important_score=3.0,
                               prune_thr_count=1, prune_thr_T_alpha=1,
                               prune_thr_T_alpha_avg=0.001)),
    ]:
        mask = np.asarray(prune_gaussians(m, ds, prune_type=ptype,
                                          prune_percent=0.1, **kwargs))
        assert mask.shape == (30,), ptype
        assert mask.dtype == bool, ptype


def test_importance_pruner_removes_offscreen_points():
    """Points that never contribute to any camera must be pruned by the
    count criterion."""
    m, ds = _model_and_ds(n=30)
    # move 5 points far off-frustum
    params = m.parameters()
    params = dict(params)
    params["xyz"] = params["xyz"].at[:5].set(jnp.array([100.0, 100.0, -50.0]))
    m.set_parameters(params)
    mask = np.asarray(prune_gaussians(
        m, ds, prune_type="count", prune_percent=0.1, prune_thr_count=1))
    assert mask[:5].all()


def test_importance_resize():
    m, ds = _model_and_ds(hw=64)
    c1, _, _ = prune_list(m, ds, resize=None)
    c2, _, _ = prune_list(m, ds, resize=32)
    # resized render touches ~1/4 of the pixels
    assert 0 < np.asarray(c2).sum() < np.asarray(c1).sum()


def test_prune_list_scan_matches_per_camera_loop():
    """The single-dispatch lax.scan sweep (stackable same-resolution
    cameras) must produce exactly the same summed counters as manual
    per-camera count_render accumulation."""
    import jax.numpy as jnp
    m, ds = _model_and_ds(n=40, key=3, n_cams=3)
    gc, osc, tas = prune_list(m, ds)          # scan path (3 same-res cams)

    n = m.capacity
    c = jnp.zeros((n,), jnp.int32)
    o = jnp.zeros((n,), jnp.float32)
    t = jnp.zeros((n,), jnp.float32)
    for cam in ds:
        out = count_render(m, cam)
        c = c + out["gaussians_count"]
        o = o + out["opacity_important_score"]
        t = t + out["T_alpha_important_score"]
    mpts = m.num_points
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(c[:mpts]))
    np.testing.assert_allclose(np.asarray(osc), np.asarray(o[:mpts]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tas), np.asarray(t[:mpts]),
                               rtol=1e-5, atol=1e-5)
