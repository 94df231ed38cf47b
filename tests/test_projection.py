import math

import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.ops import projection as proj
from .helpers import make_settings


def test_quat_identity():
    R = proj.quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)


def test_quat_z_90():
    q = jnp.array([math.cos(math.pi / 4), 0.0, 0.0, math.sin(math.pi / 4)])
    R = np.asarray(proj.quat_to_rotmat(q))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_cov3d_axis_aligned():
    scales = jnp.array([[1.0, 2.0, 3.0]])
    rot = jnp.array([[1.0, 0, 0, 0]])
    cov = np.asarray(proj.build_cov3d(scales, 1.0, rot))[0]
    np.testing.assert_allclose(cov, np.diag([1.0, 4.0, 9.0]), atol=1e-6)


def test_cov3d_rotation_invariant_trace():
    scales = jnp.array([[0.5, 1.0, 2.0]])
    q = jnp.array([[0.3, 0.5, -0.2, 0.7]])
    q = q / jnp.linalg.norm(q)
    cov = np.asarray(proj.build_cov3d(scales, 1.0, q))[0]
    np.testing.assert_allclose(np.trace(cov), 0.25 + 1 + 4, rtol=1e-5)
    np.testing.assert_allclose(cov, cov.T, atol=1e-7)


def test_projection_center_point():
    s = make_settings(64, 64)
    p = jnp.array([[0.0, 0.0, 5.0]])
    ndc = np.asarray(proj.project_points(p, s.projmatrix))[0]
    np.testing.assert_allclose(ndc[:2], [0.0, 0.0], atol=1e-5)
    # z in [0, 1] for znear..zfar
    assert 0.0 < ndc[2] < 1.0


def test_projection_depth_range():
    s = make_settings(64, 64)
    near = np.asarray(proj.project_points(jnp.array([[0, 0, 0.01]]), s.projmatrix))[0, 2]
    far = np.asarray(proj.project_points(jnp.array([[0, 0, 100.0]]), s.projmatrix))[0, 2]
    assert abs(near) < 1e-3 and abs(far - 1.0) < 1e-3


def test_ndc2pix():
    # auxiliary.h:41-44: ((v+1)*S-1)*0.5
    assert float(proj.ndc2pix(jnp.float32(-1.0), 64)) == -0.5
    assert float(proj.ndc2pix(jnp.float32(1.0), 64)) == 63.5
    assert float(proj.ndc2pix(jnp.float32(0.0), 64)) == 31.5


def test_in_frustum_near_cull():
    s = make_settings()
    pts = jnp.array([[0, 0, 0.1], [0, 0, 0.3], [0, 0, -1.0]])
    vis = np.asarray(proj.in_frustum(pts, s.viewmatrix))
    np.testing.assert_array_equal(vis, [False, True, False])


def test_camera_center_roundtrip():
    import jax
    R = np.asarray(proj.quat_to_rotmat(jnp.array([0.9, 0.1, -0.2, 0.3]) /
                                       jnp.linalg.norm(jnp.array([0.9, 0.1, -0.2, 0.3]))))
    cam_pos_world = np.array([1.0, -2.0, 3.0], np.float32)
    # W2V: p_view = R_cw (p - c); row-vector storage M[:3,:3]=R (acting as p@R).
    T = -cam_pos_world @ R
    M = proj.world_view_transform_from_rt(jnp.asarray(R), jnp.asarray(T))
    center = np.asarray(proj.camera_center_from_world_view(M))
    np.testing.assert_allclose(center, cam_pos_world, atol=1e-5)


def test_cov2d_isotropic_scaling_with_focal():
    # An isotropic Gaussian at the optical axis: cov2d ~ (focal * s / z)^2 + lowpass
    s = make_settings(128, 128)
    z = 4.0
    sigma = 0.05
    cov3d = proj.build_cov3d(jnp.array([[sigma] * 3]), 1.0, jnp.array([[1.0, 0, 0, 0]]))
    fx, fy = proj.focals_from_fov(128, 128, s.tanfovx, s.tanfovy)
    cov2d = np.asarray(proj.build_cov2d(jnp.array([[0.0, 0.0, z]]), cov3d,
                                        s.viewmatrix, fx, fy, s.tanfovx, s.tanfovy))[0]
    expect = (float(fx) * sigma / z) ** 2 + 0.3
    np.testing.assert_allclose(cov2d[0], expect, rtol=1e-4)
    np.testing.assert_allclose(cov2d[2], expect, rtol=1e-4)
    np.testing.assert_allclose(cov2d[1], 0.0, atol=1e-6)


def test_tile_rect():
    pt = jnp.array([[31.5, 31.5]])
    rmin, rmax = proj.tile_rect(pt, jnp.array([5.0]), 4, 4)
    np.testing.assert_array_equal(np.asarray(rmin)[0], [1, 1])
    np.testing.assert_array_equal(np.asarray(rmax)[0], [3, 3])


def test_mark_visible():
    import jax.numpy as jnp
    from reduced_3dgs_tpu.dataset import build_camera
    from reduced_3dgs_tpu.ops.rasterize.common import mark_visible

    cam = build_camera(image_height=32, image_width=32, FoVx=1.0, FoVy=1.0)
    pts = jnp.array([[0.0, 0.0, 5.0],    # in front
                     [0.0, 0.0, 0.1],    # inside near-cull (z <= 0.2)
                     [0.0, 0.0, -3.0]])  # behind
    vis = mark_visible(pts, cam.world_view_transform)
    assert vis.tolist() == [True, False, False]
