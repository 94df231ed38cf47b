import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reduced_3dgs_tpu.ops.rasterize.reference import render_reference
from reduced_3dgs_tpu.ops.rasterize.tiled import render_tiled
from .helpers import make_settings, random_cloud


def _args(n=60, key=0, spread=0.8):
    cloud = random_cloud(jax.random.PRNGKey(key), n, spread=spread)
    return (cloud["xyz"], cloud["opacity"], cloud["scales"],
            cloud["rotations"], cloud["features"])


@pytest.mark.parametrize("hw", [(32, 32), (48, 80), (33, 47)])
def test_forward_matches_reference(hw):
    h, w = hw
    s = make_settings(h, w, bg=(0.15, 0.25, 0.35))
    args = _args(70, key=1)
    ref = render_reference(*args, s)
    til = render_tiled(*args, s)
    assert not bool(til["overflow"])
    np.testing.assert_allclose(np.asarray(til["render"]),
                               np.asarray(ref["render"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(til["final_T"]),
                               np.asarray(ref["final_T"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(til["depth"]),
                               np.asarray(ref["depth"]), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(til["radii"]),
                                  np.asarray(ref["radii"]))


def test_forward_matches_reference_opaque_overlap():
    """Heavy overlap + near-opaque Gaussians exercises early termination."""
    s = make_settings(32, 32, bg=(1, 1, 1))
    cloud = random_cloud(jax.random.PRNGKey(7), 120, spread=0.15)
    opa = jnp.full_like(cloud["opacity"], 8.0)  # sigmoid ~ 0.9997
    ref = render_reference(cloud["xyz"], opa, cloud["scales"],
                           cloud["rotations"], cloud["features"], s)
    til = render_tiled(cloud["xyz"], opa, cloud["scales"],
                       cloud["rotations"], cloud["features"], s)
    # Early termination must kick in somewhere
    assert (np.asarray(ref["final_T"]) < 2e-4).any()
    np.testing.assert_allclose(np.asarray(til["render"]),
                               np.asarray(ref["render"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(til["final_T"]),
                               np.asarray(ref["final_T"]), atol=3e-5)


def test_gradients_match_reference():
    s = make_settings(32, 32, bg=(0.3, 0.1, 0.6))
    args = _args(40, key=2)
    target = jnp.linspace(0, 1, 3 * 32 * 32).reshape(3, 32, 32)

    def loss(render_fn, xyz, opa, scales, rot, shs):
        out = render_fn(xyz, opa, scales, rot, shs, s)
        return jnp.mean(jnp.abs(out["render"] - target))

    g_ref = jax.grad(lambda *a: loss(render_reference, *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_til = jax.grad(lambda *a: loss(render_tiled, *a), argnums=(0, 1, 2, 3, 4))(*args)
    names = ["xyz", "opacity", "scales", "rot", "shs"]
    for gr, gt, nm in zip(g_ref, g_til, names):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                                   rtol=2e-3, atol=2e-5, err_msg=nm)


def test_stats_match_reference():
    s = make_settings(48, 48)
    args = _args(50, key=3)
    ref = render_reference(*args, s, with_stats=True)
    til = render_tiled(*args, s, with_stats=True)
    np.testing.assert_array_equal(np.asarray(til["gaussians_count"]),
                                  np.asarray(ref["gaussians_count"]))
    for k in ["opacity_important_score", "T_alpha_important_score",
              "transmittance_sum"]:
        np.testing.assert_allclose(np.asarray(til[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_overflow_flag():
    s = make_settings(64, 64)
    args = _args(50, key=4)
    out = render_tiled(*args, s, key_buffer_size=8)
    assert bool(out["overflow"])
    out2 = render_tiled(*args, s)
    assert not bool(out2["overflow"])
    assert int(out2["num_rendered"]) > 0


def test_pixel_chunk_invariance():
    s = make_settings(32, 32)
    args = _args(30, key=5)
    a = render_tiled(*args, s, pixel_chunk=256)
    b = render_tiled(*args, s, pixel_chunk=32)
    np.testing.assert_allclose(np.asarray(a["render"]), np.asarray(b["render"]),
                               atol=1e-6)


@pytest.mark.parametrize("emission", ["gather", "scan", "carry"])
@pytest.mark.parametrize("sort", ["2key", "packed"])
def test_emission_sort_modes_match_reference(emission, sort, monkeypatch):
    """Every binning/sort strategy must produce the same image (packed sort
    only quantizes the depth ORDER between near-equal depths, invisible at
    these scales)."""
    from reduced_3dgs_tpu import config as cfg
    monkeypatch.setattr(cfg, "EMISSION_MODE", emission)
    monkeypatch.setattr(cfg, "SORT_MODE", sort)
    s = make_settings(48, 80, bg=(0.15, 0.25, 0.35))
    args = _args(90, key=8)
    ref = render_reference(*args, s)
    til = render_tiled(*args, s)
    assert not bool(til["overflow"])
    np.testing.assert_allclose(np.asarray(til["render"]),
                               np.asarray(ref["render"]), atol=5e-5)
    np.testing.assert_allclose(np.asarray(til["final_T"]),
                               np.asarray(ref["final_T"]), atol=5e-5)


def test_jit_and_vmap_compatible():
    s = make_settings(32, 32)
    args = _args(30, key=6)
    f = jax.jit(lambda *a: render_tiled(*a, s)["render"])
    img = f(*args)
    assert img.shape == (3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_tight_binning_exact_vs_unbinned_low_opacity():
    """Alpha-tight binning must be EXACT: vs the truly unbinned dense
    composite (tile_culling=False ignores rects entirely), at post-reset
    opacities (sigmoid(-4.6) ~ 0.01) where the tight rect cuts hardest —
    image, transmittance, AND gradients. Guards against an over-tight
    contour radius, which rect-based parity tests can't see (both sides
    share the rect)."""
    s = make_settings(48, 80, bg=(0.2, 0.4, 0.6))
    cloud = random_cloud(jax.random.PRNGKey(11), 90, spread=0.8)
    # big splats (so 3-sigma rects span many tiles) at mixed low opacities
    scaling = jnp.clip(cloud["scaling"] + 1.5, -3.0, -1.0)
    opa = jax.random.uniform(jax.random.PRNGKey(12), (90, 1),
                             minval=-5.5, maxval=-2.0)
    args = (cloud["xyz"], opa, jnp.exp(scaling), cloud["rotations"],
            cloud["features"])
    ref = render_reference(*args, s, tile_culling=False)
    til = render_tiled(*args, s)
    assert not bool(til["overflow"])
    np.testing.assert_allclose(np.asarray(til["render"]),
                               np.asarray(ref["render"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(til["final_T"]),
                               np.asarray(ref["final_T"]), atol=3e-5)

    target = jnp.linspace(0, 1, 3 * 48 * 80).reshape(3, 48, 80)

    def loss(render_fn, *a, **kw):
        out = render_fn(*a, s, **kw)
        return jnp.mean(jnp.abs(out["render"] - target))

    g_ref = jax.grad(lambda *a: loss(render_reference, *a,
                                     tile_culling=False),
                     argnums=(0, 1, 2, 3, 4))(*args)
    g_til = jax.grad(lambda *a: loss(render_tiled, *a),
                     argnums=(0, 1, 2, 3, 4))(*args)
    for gr, gt, nm in zip(g_ref, g_til,
                          ["xyz", "opacity", "scales", "rot", "shs"]):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                                   rtol=2e-3, atol=2e-5, err_msg=nm)
