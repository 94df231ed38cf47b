import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.ops import sh as sh_ops


def _ref_eval(shs, d, deg):
    """Direct transliteration of the polynomial (independent re-derivation)."""
    x, y, z = d
    c = sh_ops.SH_C0 * shs[0] + 0.5
    if deg > 0:
        c = c - sh_ops.SH_C1 * y * shs[1] + sh_ops.SH_C1 * z * shs[2] - sh_ops.SH_C1 * x * shs[3]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        c = (c + sh_ops.SH_C2[0] * x * y * shs[4] + sh_ops.SH_C2[1] * y * z * shs[5]
             + sh_ops.SH_C2[2] * (2 * zz - xx - yy) * shs[6]
             + sh_ops.SH_C2[3] * x * z * shs[7] + sh_ops.SH_C2[4] * (xx - yy) * shs[8])
    if deg > 2:
        xx, yy, zz = x * x, y * y, z * z
        c = (c + sh_ops.SH_C3[0] * y * (3 * xx - yy) * shs[9]
             + sh_ops.SH_C3[1] * x * y * z * shs[10]
             + sh_ops.SH_C3[2] * y * (4 * zz - xx - yy) * shs[11]
             + sh_ops.SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * shs[12]
             + sh_ops.SH_C3[4] * x * (4 * zz - xx - yy) * shs[13]
             + sh_ops.SH_C3[5] * z * (xx - yy) * shs[14]
             + sh_ops.SH_C3[6] * x * (xx - 3 * yy) * shs[15])
    return np.maximum(c, 0.0)


def test_eval_sh_matches_direct_formula():
    rng = np.random.RandomState(0)
    shs = rng.randn(5, 16, 3).astype(np.float32)
    dirs = rng.randn(5, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg in range(4):
        got = sh_ops.eval_sh(jnp.asarray(shs), jnp.asarray(dirs), degree=deg)
        want = np.stack([_ref_eval(shs[i], dirs[i], deg) for i in range(5)])
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_degree0_is_dc_only():
    shs = jnp.zeros((2, 16, 3)).at[:, 0, :].set(1.0)
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = sh_ops.eval_sh(shs, d, degree=3)
    np.testing.assert_allclose(np.asarray(out), sh_ops.SH_C0 * 1.0 + 0.5, rtol=1e-6)


def test_clamp_zeroes_gradient():
    shs = jnp.zeros((1, 16, 3)).at[0, 0, 0].set(-10.0)  # heavily negative -> clamped
    d = jnp.array([[0.0, 0.0, 1.0]])

    def f(s):
        return jnp.sum(sh_ops.eval_sh(s, d, degree=0))

    g = jax.grad(f)(shs)
    assert float(g[0, 0, 0]) == 0.0
    shs2 = shs.at[0, 0, 0].set(10.0)
    g2 = jax.grad(f)(shs2)
    assert abs(float(g2[0, 0, 0]) - sh_ops.SH_C0) < 1e-6


def test_degree_coeff_mask():
    degrees = jnp.array([0, 1, 2, 3])
    mask = sh_ops.degree_coeff_mask(degrees)
    counts = np.asarray(mask.sum(axis=1))
    np.testing.assert_array_equal(counts, [0, 3, 8, 15])
