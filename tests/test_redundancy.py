import math

import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.ops.redundancy import (
    allocate_minimum_redundancy_value, find_minimum_projected_pixel_size,
    sphere_ellipsoid_intersection)
from .helpers import make_settings


def test_pixel_size_scales_with_depth_and_resolution():
    s64 = make_settings(64, 64)
    s128 = make_settings(128, 128)
    pts = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 8.0]])
    a = np.asarray(find_minimum_projected_pixel_size(
        s64.projmatrix[None], jnp.linalg.inv(s64.projmatrix)[None], pts,
        jnp.array([64]), jnp.array([64])))
    b = np.asarray(find_minimum_projected_pixel_size(
        s128.projmatrix[None], jnp.linalg.inv(s128.projmatrix)[None], pts,
        jnp.array([128]), jnp.array([128])))
    # one pixel at depth 8 is ~4x the world size of one pixel at depth 2
    np.testing.assert_allclose(a[1] / a[0], 4.0, rtol=1e-3)
    # doubling resolution halves the pixel world size
    np.testing.assert_allclose(a / b, 2.0, rtol=1e-3)
    # min over both cameras picks the finer one
    both = np.asarray(find_minimum_projected_pixel_size(
        jnp.stack([s64.projmatrix, s128.projmatrix]),
        jnp.stack([jnp.linalg.inv(s64.projmatrix),
                   jnp.linalg.inv(s128.projmatrix)]),
        pts, jnp.array([64, 128]), jnp.array([64, 128])))
    np.testing.assert_allclose(both, b, rtol=1e-5)


def test_pixel_size_outside_frustum_keeps_init():
    s = make_settings(64, 64)
    pts = jnp.array([[100.0, 0.0, 2.0], [0.0, 0.0, -5.0]])
    sizes = np.asarray(find_minimum_projected_pixel_size(
        s.projmatrix[None], jnp.linalg.inv(s.projmatrix)[None], pts,
        jnp.array([64]), jnp.array([64])))
    np.testing.assert_allclose(sizes, 10000.0)


def test_sphere_ellipsoid_intersection_basic():
    # Two points 1 apart; neighbour ellipsoid has scale 0.5 and the sphere
    # radius 0.6: 1 < 0.5 + 0.6 -> intersect. With radius 0.3: no.
    xyz = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    scales = jnp.full((2, 3), 0.5)
    rot = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    idx = jnp.array([[1], [0]], jnp.int32)
    counts, mask = sphere_ellipsoid_intersection(
        xyz, scales, rot, idx, jnp.array([0.6, 0.6]))
    np.testing.assert_array_equal(np.asarray(counts), [1, 1])
    counts2, _ = sphere_ellipsoid_intersection(
        xyz, scales, rot, idx, jnp.array([0.3, 0.3]))
    np.testing.assert_array_equal(np.asarray(counts2), [0, 0])


def test_sphere_ellipsoid_rotation_matters():
    # Anisotropic neighbour (long on y, thin on x) rotated 90deg around z
    # becomes long on x -> the x-offset query point now intersects. Note the
    # reference quirk: the test uses the QUERY point's rotation frame.
    xyz = jnp.array([[1.2, 0, 0], [0.0, 0, 0]])
    scales = jnp.array([[0.1, 2.0, 0.1], [0.1, 2.0, 0.1]])
    idx = jnp.array([[1], [0]], jnp.int32)
    rot_id = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    q90 = jnp.array([math.cos(math.pi / 4), 0.0, 0.0, math.sin(math.pi / 4)])
    rot_90 = jnp.tile(q90[None], (2, 1))
    c_id, _ = sphere_ellipsoid_intersection(
        xyz, scales, rot_id, idx, jnp.array([0.2, 0.2]))
    c_rot, _ = sphere_ellipsoid_intersection(
        xyz, scales, rot_90, idx, jnp.array([0.2, 0.2]))
    assert int(c_id[0]) == 0          # thin x-axis: no intersection
    assert int(c_rot[0]) == 1         # rotated: long axis points at query


def test_allocate_minimum_redundancy_value():
    vals = jnp.array([5, 2, 9], jnp.int32)
    nbrs = jnp.array([[0, 1], [1, 2], [2, 0]], jnp.int32)  # self-included col0
    mask = jnp.array([[True, True], [True, True], [True, False]])
    out = np.asarray(allocate_minimum_redundancy_value(vals, nbrs, mask))
    # Reference semantics initialise the output at P (=3 here,
    # reduced_3dgs.cu:276), so every result is also clamped at P:
    # point0: row0 lists it (5), init 3 -> 3
    # point1: row0 lists it (5), row1 self (2) -> 2
    # point2: row1 lists it (2), row2 self (9) -> 2
    np.testing.assert_array_equal(out, [3, 2, 2])
    # with a large explicit num_points the clamp is inert
    out2 = np.asarray(allocate_minimum_redundancy_value(
        vals, nbrs, mask, num_points=3))
    np.testing.assert_array_equal(out2, out)


def test_calculate_redundancy_metric_integration():
    from reduced_3dgs_tpu.pruning import calculate_redundancy_metric
    from reduced_3dgs_tpu.models import GaussianModel
    from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
    from .helpers import random_cloud

    cloud = random_cloud(jax.random.PRNGKey(0), 40)
    m = GaussianModel(3)
    m.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=cloud["features"][:, :1],
        features_rest=cloud["features"][:, 1:], scaling=cloud["scaling"],
        rotation=cloud["rotation"], opacity=cloud["opacity"]))
    ds = CameraDataset([build_camera(image_height=32, image_width=32,
                                     FoVx=1.0, FoVy=1.0)])
    metric, cube = calculate_redundancy_metric(m, ds, num_neighbours=8)
    metric = np.asarray(metric)
    assert metric.shape == (40,)
    assert (metric >= 1).all()          # every point counts itself
    assert np.asarray(cube).min() > 0


def test_mercy_points_policies():
    from reduced_3dgs_tpu.pruning import mercy_points
    from reduced_3dgs_tpu.models import GaussianModel
    from .helpers import random_cloud

    cloud = random_cloud(jax.random.PRNGKey(1), 50)
    m = GaussianModel(3)
    m.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=cloud["features"][:, :1],
        features_rest=cloud["features"][:, 1:], scaling=cloud["scaling"],
        rotation=cloud["rotation"], opacity=cloud["opacity"]))
    counts = jnp.concatenate([jnp.ones(40), jnp.full((10,), 50.0)])
    mask = np.asarray(mercy_points(m, counts, lambda_mercy=1.0,
                                   mercy_minimum=3,
                                   mercy_type="redundancy_opacity"))
    # only redundant points (last 10) can be pruned, and only the
    # lower-opacity half of them
    assert not mask[:40].any()
    assert 0 < mask[40:].sum() <= 5
    mask_o = np.asarray(mercy_points(m, counts, mercy_type="opacity"))
    assert 0 < mask_o.sum() <= 5  # 4.5% quantile of 50 points


def _model_from(cloud, n):
    from reduced_3dgs_tpu.models import GaussianModel
    m = GaussianModel(3)
    m.set_parameters(dict(
        xyz=cloud["xyz"][:n], features_dc=cloud["features"][:n, :1],
        features_rest=cloud["features"][:n, 1:], scaling=cloud["scaling"][:n],
        rotation=cloud["rotation"][:n], opacity=cloud["opacity"][:n]))
    return m


def test_mercy_gaussians_capacity_padded_matches_live_prefix():
    """The capacity-static mercy path (alive-only statistics, dead-row
    gating) must agree with mercy_points(calculate_redundancy_metric(...))
    computed on a live-only model, for every mercy_type — the dead rows
    are filled with garbage at REAL coordinates (compaction leftovers)."""
    from reduced_3dgs_tpu.pruning import (calculate_redundancy_metric,
                                          mercy_points)
    from reduced_3dgs_tpu.pruning.trainer import mercy_gaussians
    from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
    from .helpers import random_cloud

    n, cap = 40, 56
    cloud = random_cloud(jax.random.PRNGKey(7), cap)
    ds = CameraDataset([build_camera(image_height=32, image_width=32,
                                     FoVx=1.0, FoVy=1.0)])

    live = _model_from(cloud, n)
    metric, _ = calculate_redundancy_metric(live, ds)

    padded = _model_from(cloud, cap)   # rows n..cap = garbage at real coords
    padded._n_alive = n
    assert padded.capacity == cap and padded.num_points == n

    for mercy_type in ("redundancy_opacity", "redundancy_random",
                       "opacity", "redundancy_opacity_opacity"):
        want = np.asarray(mercy_points(
            live, metric, lambda_mercy=1.0, mercy_minimum=3,
            mercy_type=mercy_type))
        got = np.asarray(mercy_gaussians(
            padded, ds, lambda_mercy=1.0, mercy_minimum=3,
            mercy_type=mercy_type))
        assert got.shape == (n,)
        np.testing.assert_array_equal(got, want, err_msg=mercy_type)
