import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.ops.rasterize import render_reference
from reduced_3dgs_tpu.ops.rasterize.common import RenderSettings
from .helpers import make_settings, random_cloud


def _single_gaussian(opacity_logit=4.0, z=3.0, scale=0.08):
    xyz = jnp.array([[0.0, 0.0, z]])
    scales = jnp.array([[scale] * 3])
    rot = jnp.array([[1.0, 0, 0, 0]])
    opa = jnp.array([[opacity_logit]])
    shs = jnp.zeros((1, 16, 3)).at[:, 0, :].set(jnp.array([1.0, 0.5, -0.2]))
    return xyz, opa, scales, rot, shs


def test_single_gaussian_peak_at_center():
    s = make_settings(64, 64, bg=(0, 0, 0))
    out = render_reference(*_single_gaussian(), s)
    img = np.asarray(out["render"])
    assert img.shape == (3, 64, 64)
    # Peak at the image center for a Gaussian on the optical axis.
    peak = np.unravel_index(np.argmax(img[0]), img[0].shape)
    assert abs(peak[0] - 31.5) <= 1 and abs(peak[1] - 31.5) <= 1
    assert np.asarray(out["radii"])[0] > 0


def test_analytic_alpha_compositing():
    """One Gaussian: pixel value must equal color * alpha + bg * (1-alpha)."""
    s = make_settings(64, 64, bg=(0.2, 0.3, 0.4))
    xyz, opa, scales, rot, shs = _single_gaussian(opacity_logit=1.0)
    out = render_reference(xyz, opa, scales, rot, shs, s)
    img = np.asarray(out["render"])

    from reduced_3dgs_tpu.ops.rasterize.common import preprocess
    pre = preprocess(xyz, opa, scales, rot, shs, s)
    m2d = np.asarray(pre.means2d)[0]
    conic = np.asarray(pre.conic)[0]
    o = float(np.asarray(pre.opacity)[0])
    color = np.asarray(pre.rgb)[0]
    px, py = 31, 31
    dx, dy = m2d[0] - px, m2d[1] - py
    power = -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) - conic[1] * dx * dy
    alpha = min(0.99, o * np.exp(power))
    expect = color * alpha + np.array([0.2, 0.3, 0.4]) * (1 - alpha)
    np.testing.assert_allclose(img[:, py, px], expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["final_T"])[py, px], 1 - alpha, rtol=1e-4)


def test_background_only_outside():
    s = make_settings(64, 64, bg=(1.0, 0.0, 0.5))
    out = render_reference(*_single_gaussian(scale=0.01), s)
    img = np.asarray(out["render"])
    np.testing.assert_allclose(img[:, 0, 0], [1.0, 0.0, 0.5], atol=1e-5)


def test_behind_camera_culled():
    s = make_settings(32, 32)
    xyz = jnp.array([[0.0, 0.0, -3.0]])
    _, opa, scales, rot, shs = _single_gaussian()
    out = render_reference(xyz, opa, scales, rot, shs, s)
    assert int(np.asarray(out["radii"])[0]) == 0
    np.testing.assert_allclose(np.asarray(out["final_T"]), 1.0)


def test_alive_mask():
    s = make_settings(32, 32)
    cloud = random_cloud(jax.random.PRNGKey(0), 16)
    alive = jnp.zeros((16,), bool)
    out = render_reference(cloud["xyz"], cloud["opacity"], cloud["scales"],
                           cloud["rotations"], cloud["features"], s, alive=alive)
    np.testing.assert_array_equal(np.asarray(out["radii"]), 0)
    np.testing.assert_allclose(np.asarray(out["final_T"]), 1.0)


def test_depth_ordering_occlusion():
    """A near opaque red Gaussian must occlude a far green one."""
    s = make_settings(64, 64, bg=(0, 0, 0))
    xyz = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    scales = jnp.full((2, 3), 0.15)
    rot = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    opa = jnp.full((2, 1), 12.0)  # sigmoid ~ 1 -> alpha clamped at 0.99
    shs = jnp.zeros((2, 16, 3))
    shs = shs.at[0, 0].set(jnp.array([2.0, -1.0, -1.0]))   # red-ish near
    shs = shs.at[1, 0].set(jnp.array([-1.0, 2.0, -1.0]))   # green far
    out = render_reference(xyz, opa, jnp.exp(jnp.log(scales)), rot, shs, s)
    img = np.asarray(out["render"])
    c = img[:, 32, 32]
    # near color = (2, -1, -1) DC -> rgb (1.064, 0.218, 0.218);
    # far color has green 1.064 which must NOT leak through the occluder.
    assert c[0] > 0.9
    assert c[1] < 0.3
    assert np.asarray(out["final_T"])[32, 32] < 1e-2


def test_order_independent_of_input_permutation():
    key = jax.random.PRNGKey(1)
    cloud = random_cloud(key, 40)
    s = make_settings(48, 48, bg=(0.1, 0.1, 0.1))
    out1 = render_reference(cloud["xyz"], cloud["opacity"], cloud["scales"],
                            cloud["rotations"], cloud["features"], s)
    perm = jax.random.permutation(jax.random.PRNGKey(2), 40)
    out2 = render_reference(cloud["xyz"][perm], cloud["opacity"][perm],
                            cloud["scales"][perm], cloud["rotations"][perm],
                            cloud["features"][perm], s)
    np.testing.assert_allclose(np.asarray(out1["render"]),
                               np.asarray(out2["render"]), atol=2e-5)


def test_gradients_finite_difference():
    """Directional-derivative check of d(loss)/d(xyz, opacity, scaling).

    The render is piecewise smooth (tile rects, sort order, alpha thresholds
    are discrete), so a finite-difference probe can occasionally cross a
    boundary; probing several random directions and requiring a majority to
    match the analytic directional derivative makes the check robust while
    still catching any systematic gradient bug.
    """
    s = make_settings(32, 32, bg=(0.0, 0.0, 0.0))
    cloud = random_cloud(jax.random.PRNGKey(3), 6)
    target = jnp.ones((3, 32, 32)) * 0.3

    @jax.jit
    def loss(xyz, opacity, scaling):
        out = render_reference(
            xyz, opacity, jnp.exp(scaling),
            cloud["rotations"], cloud["features"], s)
        return jnp.mean((out["render"] - target) ** 2)

    args = (cloud["xyz"], cloud["opacity"], cloud["scaling"])
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*args)
    n_ok, n_probe = 0, 8
    for p in range(n_probe):
        dirs = [jax.random.normal(jax.random.PRNGKey(100 + p * 3 + i), a.shape)
                for i, a in enumerate(args)]
        dirs = [d / jnp.linalg.norm(d) for d in dirs]
        eps = 3e-4
        plus = [a + eps * d for a, d in zip(args, dirs)]
        minus = [a - eps * d for a, d in zip(args, dirs)]
        fd = (float(loss(*plus)) - float(loss(*minus))) / (2 * eps)
        analytic = sum(float(jnp.vdot(g, d)) for g, d in zip(grads, dirs))
        if abs(fd - analytic) <= 0.08 * max(abs(fd), abs(analytic), 1e-4):
            n_ok += 1
    assert n_ok >= n_probe - 2, f"only {n_ok}/{n_probe} directional probes matched"


def test_mean2d_offset_gradient_scaling():
    """d(loss)/d(ndc offset) must carry the 0.5*W / 0.5*H pixel scaling
    (backward.cu:498-499), which the densifier thresholds assume."""
    s = make_settings(32, 64)  # W=64, H=32 distinct
    cloud = random_cloud(jax.random.PRNGKey(4), 5)
    zeros = jnp.zeros((5, 2))

    weights = jnp.sin(jnp.arange(3 * 32 * 64) * 0.37).reshape(3, 32, 64)

    @jax.jit
    def loss(off):
        out = render_reference(cloud["xyz"], cloud["opacity"], cloud["scales"],
                               cloud["rotations"], cloud["features"], s,
                               mean2d_offset_ndc=off)
        return jnp.mean(out["render"] * weights)

    g = jax.jit(jax.grad(loss))(zeros)
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient wrt ndc offset must match a central finite difference (this is
    # the quantity the densifier thresholds, pre-scaled by 0.5*W / 0.5*H).
    for col in (0, 1):
        eps = 3e-3  # small-eps FDs drown in f32 noise on the tiny mean loss
        fd = (float(loss(zeros.at[:, col].add(eps)))
              - float(loss(zeros.at[:, col].add(-eps)))) / (2 * eps)
        np.testing.assert_allclose(float(g[:, col].sum()), fd, rtol=6e-2,
                                   atol=1e-5)


def test_stats_outputs():
    s = make_settings(32, 32)
    cloud = random_cloud(jax.random.PRNGKey(5), 12)
    out = render_reference(cloud["xyz"], cloud["opacity"], cloud["scales"],
                           cloud["rotations"], cloud["features"], s, with_stats=True)
    cnt = np.asarray(out["gaussians_count"])
    osc = np.asarray(out["opacity_important_score"])
    tas = np.asarray(out["T_alpha_important_score"])
    tr = np.asarray(out["transmittance_sum"])
    assert cnt.shape == (12,) and (cnt >= 0).all()
    # opacity score is count * activated opacity
    opac = np.asarray(jax.nn.sigmoid(cloud["opacity"]))[:, 0]
    np.testing.assert_allclose(osc, cnt * opac, rtol=1e-4, atol=1e-5)
    # T*alpha score and transmittance bounded by count
    assert (tas <= cnt + 1e-4).all() and (tr <= cnt + 1e-4).all()
    # T*alpha summed over gaussians = sum over pixels of (1 - final_T)
    np.testing.assert_allclose(tas.sum(), (1 - np.asarray(out["final_T"])).sum(),
                               rtol=1e-3)
