"""Packed variable-band SH inference path (reference N1.4 parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.models.packed_sh import (pack_variable_sh,
                                               packed_num_coeff_rows,
                                               packed_sh_colors,
                                               render_packed,
                                               unpack_variable_sh)
from reduced_3dgs_tpu.models.gaussian_model import GaussianModel
from reduced_3dgs_tpu.ops import sh as sh_ops
from tests.helpers import make_settings, random_cloud


def _params_and_degrees(n=40, key=0):
    c = random_cloud(jax.random.PRNGKey(key), n)
    params = dict(xyz=c["xyz"], features_dc=c["features"][:, :1],
                  features_rest=c["features"][:, 1:],
                  scaling=c["scaling"], rotation=c["rotation"],
                  opacity=c["opacity"])
    degrees = jnp.asarray(
        np.random.RandomState(key).randint(0, 4, size=n), jnp.int32)
    return params, degrees


def test_pack_roundtrip_and_size():
    params, degrees = _params_and_degrees(48, key=1)
    packed = pack_variable_sh(params, degrees)
    assert packed["features_rest_packed"].shape[0] == packed_num_coeff_rows(degrees)
    # strictly smaller than dense storage unless everything is degree 3
    assert packed["features_rest_packed"].shape[0] <= 48 * 15
    dense = unpack_variable_sh(packed)
    # round trip reproduces the degree-masked features in sorted order
    order = np.argsort(np.asarray(degrees), kind="stable")
    mask = sh_ops.degree_coeff_mask(degrees, 3)
    want = np.asarray(params["features_rest"] * mask[..., None])[order]
    np.testing.assert_allclose(dense["features_rest"], want, atol=1e-7)


def test_packed_colors_match_masked_eval():
    params, degrees = _params_and_degrees(32, key=2)
    packed = pack_variable_sh(params, degrees)
    settings = make_settings(32, 32)
    got = packed_sh_colors(packed, settings.campos)
    order = np.argsort(np.asarray(degrees), kind="stable")
    mask = sh_ops.degree_coeff_mask(degrees, 3)
    shs = jnp.concatenate(
        [params["features_dc"], params["features_rest"] * mask[..., None]], 1)
    dirs = sh_ops.normalize_dirs(params["xyz"] - settings.campos)
    want = np.asarray(sh_ops.eval_sh(shs, dirs, 3, clamp=True))[order]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_packed_render_matches_dense():
    from reduced_3dgs_tpu.dataset import build_camera
    from reduced_3dgs_tpu.shculling import VariableSHGaussianModel

    params, degrees = _params_and_degrees(40, key=3)
    model = VariableSHGaussianModel(3)
    model.set_parameters(dict(params))
    model.aux_set({"degrees": degrees})
    cam = build_camera(image_height=32, image_width=32, FoVx=1.0, FoVy=1.0)
    dense_out = model(cam)

    packed = pack_variable_sh(params, degrees)
    packed_out = render_packed(packed, cam, model=GaussianModel(3))
    np.testing.assert_allclose(np.asarray(packed_out["render"]),
                               np.asarray(dense_out["render"]), atol=1e-4)
