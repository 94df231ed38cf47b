import os
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reduced_3dgs_tpu.models import GaussianModel
from reduced_3dgs_tpu.models.ply import read_ply, write_ply, fields_to_struct
from reduced_3dgs_tpu.dataset import CameraDataset, build_camera
from .helpers import make_settings, random_cloud


def _make_model(n=20, key=0):
    cloud = random_cloud(jax.random.PRNGKey(key), n)
    m = GaussianModel(3)
    m.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=cloud["features"][:, :1],
        features_rest=cloud["features"][:, 1:], scaling=cloud["scaling"],
        rotation=cloud["rotation"], opacity=cloud["opacity"]))
    return m


def test_ply_roundtrip_raw(tmp_path):
    arr = fields_to_struct(
        {"a": np.arange(5, dtype=np.float32), "b": np.arange(5, dtype=np.uint8)},
        ["a", "b"])
    p = str(tmp_path / "x.ply")
    write_ply(p, OrderedDict(vertex=arr))
    back = read_ply(p)
    np.testing.assert_array_equal(back["vertex"]["a"], arr["a"])
    np.testing.assert_array_equal(back["vertex"]["b"], arr["b"])


def test_model_ply_roundtrip(tmp_path):
    m = _make_model(17)
    p = str(tmp_path / "pc.ply")
    m.save_ply(p)
    m2 = GaussianModel(3)
    m2.load_ply(p)
    for k in ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity"):
        np.testing.assert_allclose(np.asarray(m.parameters()[k]),
                                   np.asarray(m2.parameters()[k]), atol=1e-7,
                                   err_msg=k)


def test_model_ply_layout_matches_reference_schema(tmp_path):
    """Field names/order must match the vanilla-3DGS layout so reference
    ecosystem viewers can open our files."""
    m = _make_model(4)
    p = str(tmp_path / "pc.ply")
    m.save_ply(p)
    v = read_ply(p)["vertex"]
    names = list(v.dtype.names)
    assert names[:6] == ["x", "y", "z", "nx", "ny", "nz"]
    assert names[6:9] == ["f_dc_0", "f_dc_1", "f_dc_2"]
    assert names[9:54] == [f"f_rest_{i}" for i in range(45)]
    assert names[54:] == ["opacity", "scale_0", "scale_1", "scale_2",
                          "rot_0", "rot_1", "rot_2", "rot_3"]


def test_model_render_smoke():
    m = _make_model(25)
    cam = build_camera(image_height=32, image_width=32,
                       FoVx=1.0, FoVy=1.0)
    out = m(cam)
    assert out["render"].shape == (3, 32, 32)
    assert np.isfinite(np.asarray(out["render"])).all()


def test_model_properties():
    m = _make_model(10)
    assert np.all(np.asarray(m.get_scaling) > 0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(m.get_rotation), axis=-1), 1.0, rtol=1e-5)
    o = np.asarray(m.get_opacity)
    assert ((o > 0) & (o < 1)).all()
    assert m.get_features.shape == (10, 16, 3)


def test_cameras_json_roundtrip(tmp_path):
    cams = [build_camera(image_height=32, image_width=48, FoVx=1.1, FoVy=0.9,
                         R=np.eye(3), T=np.array([0.1, 0.2, 0.3]))]
    ds = CameraDataset(cams, ["img0"])
    p = str(tmp_path / "cameras.json")
    ds.save_cameras(p)
    ds2 = CameraDataset.load_cameras(p)
    c1, c2 = cams[0], ds2[0]
    np.testing.assert_allclose(np.asarray(c2.world_view_transform),
                               np.asarray(c1.world_view_transform), atol=1e-5)
    np.testing.assert_allclose(float(c2.FoVx), float(c1.FoVx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c2.camera_center),
                               np.asarray(c1.camera_center), atol=1e-5)


def test_scene_extent():
    cams = [build_camera(image_height=8, image_width=8, FoVx=1.0, FoVy=1.0,
                         T=np.array([float(i), 0, 0])) for i in range(3)]
    ds = CameraDataset(cams)
    # camera centers at x = 0, -1, -2 (T is view-space translation)
    assert ds.scene_extent() == pytest.approx(1.0 * 1.1, rel=1e-5)


def test_create_from_pcd():
    pts = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    cols = np.random.RandomState(1).rand(50, 3).astype(np.float32)
    m = GaussianModel(3)
    m.create_from_pcd(pts, cols, scene_extent=2.0)
    assert m.num_points == 50
    assert np.isfinite(np.asarray(m._scaling)).all()
    np.testing.assert_allclose(np.asarray(m.get_opacity), 0.1, rtol=1e-5)
    # DC features encode the colors: eval at degree0 gives back color
    rgb0 = np.asarray(m._features_dc)[:, 0, :] * 0.28209479177387814 + 0.5
    np.testing.assert_allclose(rgb0, cols, atol=1e-5)
