import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.models.ply import read_ply
from reduced_3dgs_tpu.quantization import (ExcludeZeroSHQuantizer,
                                           VectorQuantizer,
                                           compute_uint_dtype)
from reduced_3dgs_tpu.shculling import VariableSHGaussianModel
from .helpers import random_cloud


def _model(n=64, key=0, zero_rest_frac=0.0):
    cloud = random_cloud(jax.random.PRNGKey(key), n)
    m = VariableSHGaussianModel(3)
    fr = cloud["features"][:, 1:]
    if zero_rest_frac > 0:
        k = int(n * zero_rest_frac)
        fr = fr.at[:k].set(0.0)
    m.set_parameters(dict(
        xyz=cloud["xyz"], features_dc=cloud["features"][:, :1],
        features_rest=fr, scaling=cloud["scaling"],
        rotation=cloud["rotation"], opacity=cloud["opacity"]))
    m.init_degrees()
    return m


def test_compute_uint_dtype():
    assert compute_uint_dtype(256) == "u1"
    assert compute_uint_dtype(255) == "u1"
    assert compute_uint_dtype(1024) == "u2"
    assert compute_uint_dtype(2) == "u1"
    assert compute_uint_dtype(65536 * 2) == "u3"


def test_quantize_dequantize_reduces_error_with_clusters():
    m = _model()
    q_small = VectorQuantizer(num_clusters=4, max_iter=50)
    q_large = VectorQuantizer(num_clusters=32, max_iter=50)
    errs = []
    for q in (q_small, q_large):
        model = _model()
        before = np.asarray(model.get_scaling)
        ids, cb = q.quantize(model, update_codebook=True)
        q.dequantize(model, ids, cb)
        after = np.asarray(model.get_scaling)
        errs.append(np.abs(after - before).mean())
    assert errs[1] < errs[0]


def test_quantize_preserves_xyz():
    m = _model()
    xyz_before = np.asarray(m._xyz).copy()
    q = VectorQuantizer(num_clusters=8, max_iter=20)
    ids, cb = q.quantize(m, update_codebook=True)
    q.dequantize(m, ids, cb)
    np.testing.assert_array_equal(np.asarray(m._xyz), xyz_before)


def test_quantized_ply_roundtrip(tmp_path):
    m = _model(n=40)
    q = VectorQuantizer(num_clusters=16, max_iter=30)
    q.quantize(m, update_codebook=True)
    p = str(tmp_path / "q.ply")
    q.save_quantized(m, p)

    m2 = VariableSHGaussianModel(3)
    q2 = VectorQuantizer(num_clusters=16)
    q2.load_quantized(m2, p)
    assert m2.num_points == 40
    # the loaded model must equal the dequantized original
    ids, cb = q.quantize(m, update_codebook=False)
    q.dequantize(m, ids, cb)
    for k in ("xyz", "opacity", "scaling", "features_dc", "features_rest"):
        np.testing.assert_allclose(np.asarray(m2.parameters()[k]),
                                   np.asarray(m.parameters()[k]),
                                   atol=1e-6, err_msg=k)
    # rotation: reference stores the NORMALISED rotation codebooks
    np.testing.assert_allclose(np.asarray(m2.parameters()["rotation"]),
                               np.asarray(m.parameters()["rotation"]),
                               atol=1e-6)


def test_quantized_ply_schema(tmp_path):
    """Byte-layout parity with the reference format (README.md:181-206)."""
    m = _model(n=10)
    q = VectorQuantizer(num_clusters=256, num_clusters_scaling=1024,
                        max_iter=5)
    q.quantize(m, update_codebook=True)
    p = str(tmp_path / "q.ply")
    q.save_quantized(m, p)
    el = read_ply(p)
    v = el["vertex"]
    assert list(v.dtype.names) == [
        "x", "y", "z", "nx", "ny", "nz", "rot_re", "rot_im", "opacity",
        "scale", "f_dc", "f_rest_0_0", "f_rest_0_1", "f_rest_0_2",
        "f_rest_1_0", "f_rest_1_1", "f_rest_1_2",
        "f_rest_2_0", "f_rest_2_1", "f_rest_2_2"]
    assert v.dtype["rot_re"] == np.dtype("u1")      # 256 clusters
    assert v.dtype["scale"] == np.dtype("u2")       # 1024 clusters
    assert set(el.keys()) == {
        "vertex", "codebook_rot_re", "codebook_rot_im", "codebook_opacity",
        "codebook_scaling", "codebook_f_dc", "codebook_f_rest_0",
        "codebook_f_rest_1", "codebook_f_rest_2"}
    assert list(el["codebook_f_rest_1"].dtype.names) == [
        f"f_rest_1_{i}" for i in range(5)]
    assert list(el["codebook_rot_im"].dtype.names) == [
        "rot_im_0", "rot_im_1", "rot_im_2"]


def test_exclude_zero_sh_reserves_zero_id():
    m = _model(n=60, zero_rest_frac=0.5)
    q = ExcludeZeroSHQuantizer(num_clusters=8, max_iter=30)
    cb, ids = q.produce_clusters_degree_features_rest(m, 0)
    cb, ids = np.asarray(cb), np.asarray(ids)
    # centroid 0 is exactly zero
    np.testing.assert_array_equal(cb[0], 0.0)
    # zero rows map to id 0; non-zero rows never do
    fr = np.asarray(m._features_rest)
    flat = fr.transpose(0, 2, 1).reshape(-1, 15)[:, :3]
    zero_rows = (np.abs(flat) < 1e-8).all(axis=1).reshape(-1, 3)
    np.testing.assert_array_equal(ids == 0, zero_rows)


def test_exclude_zero_dequantize_keeps_zeros():
    m = _model(n=60, zero_rest_frac=0.5)
    q = ExcludeZeroSHQuantizer(num_clusters=8, max_iter=30)
    ids, cb = q.quantize(m, update_codebook=True)
    q.dequantize(m, ids, cb)
    fr = np.asarray(m._features_rest)
    np.testing.assert_array_equal(fr[:30], 0.0)


def test_quantize_trainer_wrapper_hook():
    from reduced_3dgs_tpu.quantization import VectorQuantizeTrainerWrapper
    from reduced_3dgs_tpu.trainer import BaseTrainer
    from reduced_3dgs_tpu.dataset import CameraDataset, build_camera

    m = _model(n=30)
    cam = build_camera(image_height=16, image_width=16, FoVx=1.0, FoVy=1.0,
                       ground_truth_image=jnp.zeros((3, 16, 16)))
    ds = CameraDataset([cam])
    trainer = VectorQuantizeTrainerWrapper(
        BaseTrainer(m, ds), num_clusters=8,
        quantize_from_iter=2, quantize_until_iter=100, quantize_interval=2)
    before = np.asarray(m._scaling).copy()
    trainer.engine._curr_step = 2   # at a quantize step
    _ = trainer.model               # property hook fires quantize+dequantize
    after = np.asarray(m._scaling)[: m.num_points]
    assert not np.allclose(after, before[: m.num_points])
    # values are snapped to at most 8 distinct rows
    assert len(np.unique(after.round(5), axis=0)) <= 8
