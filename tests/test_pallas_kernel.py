"""Pallas compositing kernels vs the XLA segmented-scan path (interpret mode
on CPU; the same kernels compile for real on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reduced_3dgs_tpu.ops.rasterize.tiled import render_tiled
from .helpers import make_settings, random_cloud


def _args(n=60, key=1, spread=0.8, opaque=False):
    cloud = random_cloud(jax.random.PRNGKey(key), n, spread=spread)
    opa = jnp.full_like(cloud["opacity"], 8.0) if opaque else cloud["opacity"]
    return (cloud["xyz"], opa, cloud["scales"],
            cloud["rotations"], cloud["features"])


@pytest.mark.parametrize("hw,opaque", [((32, 32), False), ((48, 80), False),
                                       ((32, 32), True)])
def test_pallas_forward_matches_xla(hw, opaque):
    h, w = hw
    s = make_settings(h, w, bg=(0.2, 0.4, 0.6))
    args = _args(70, key=2, opaque=opaque)
    ref = render_tiled(*args, s)
    pal = render_tiled(*args, s, use_pallas=True, pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(pal["render"]),
                               np.asarray(ref["render"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal["final_T"]),
                               np.asarray(ref["final_T"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal["depth"]),
                               np.asarray(ref["depth"]), atol=5e-4)


def test_pallas_gradients_match_xla():
    s = make_settings(32, 32, bg=(0.1, 0.2, 0.3))
    args = _args(40, key=3)
    target = jnp.linspace(0, 1, 3 * 32 * 32).reshape(3, 32, 32)

    def loss(use_pallas, *a):
        out = render_tiled(*a, s, use_pallas=use_pallas,
                           pallas_interpret=True)
        # exercise color, T (via bg) and depth cotangents
        return (jnp.mean(jnp.abs(out["render"] - target))
                + 0.05 * jnp.mean(out["depth"])
                + 0.05 * jnp.mean(out["final_T"]))

    g_x = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_p = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3, 4))(*args)
    for gx, gp, nm in zip(g_x, g_p, ["xyz", "op", "scale", "rot", "shs"]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=2e-3, atol=3e-5, err_msg=nm)


def test_pallas_gradients_opaque_early_termination():
    s = make_settings(32, 32, bg=(1.0, 1.0, 1.0))
    args = _args(100, key=4, spread=0.15, opaque=True)

    def loss(use_pallas, *a):
        out = render_tiled(*a, s, use_pallas=use_pallas,
                           pallas_interpret=True)
        return jnp.mean(out["render"] ** 2)

    ref_out = render_tiled(*args, s)
    assert (np.asarray(ref_out["final_T"]) < 2e-4).any()  # latch exercised
    g_x = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1))(*args)
    g_p = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1))(*args)
    for gx, gp, nm in zip(g_x, g_p, ["xyz", "opacity"]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=3e-3, atol=5e-5, err_msg=nm)


def test_pallas_viewport_band():
    s = make_settings(64, 48)
    args = _args(50, key=5)
    full = render_tiled(*args, s, use_pallas=True, pallas_interpret=True)
    bands = []
    for b in range(2):
        out = render_tiled(*args, s, tile_row_offset=b * 2, tile_rows=2,
                           use_pallas=True, pallas_interpret=True)
        bands.append(np.asarray(out["render"]))
    stitched = np.concatenate(bands, axis=1)[:, :64, :]
    np.testing.assert_allclose(stitched, np.asarray(full["render"]),
                               atol=1e-4)


@pytest.mark.parametrize("scan_mode", ["ladder", "mxu", "mxu-tri3"])
def test_pallas_scan_modes_match_xla(scan_mode, monkeypatch):
    """Both within-chunk scan strategies (VPU rotate ladder and log-space
    MXU triangular matmul) must match the XLA path for render AND
    gradients — including with the early-termination latch engaged.
    SCAN_MODE is read at trace time, so monkeypatch + cache clear re-bakes
    the kernels (ADVICE r03: mxu previously had zero CI coverage)."""
    from reduced_3dgs_tpu.ops.rasterize import pallas_kernel as pk
    if scan_mode == "mxu-tri3":
        # tri3's manual bf16x3 decomposition executes as real ops even in
        # interpret mode, so this parametrization covers its arithmetic.
        monkeypatch.setattr(pk, "SCAN_MODE", "mxu")
        monkeypatch.setattr(pk, "TRI_MODE", "tri3")
    else:
        monkeypatch.setattr(pk, "SCAN_MODE", scan_mode)
    jax.clear_caches()
    try:
        s = make_settings(32, 32, bg=(1.0, 1.0, 1.0))
        args = _args(100, key=4, spread=0.15, opaque=True)

        ref_out = render_tiled(*args, s)
        assert (np.asarray(ref_out["final_T"]) < 2e-4).any()
        pal_out = render_tiled(*args, s, use_pallas=True,
                               pallas_interpret=True)
        np.testing.assert_allclose(np.asarray(pal_out["render"]),
                                   np.asarray(ref_out["render"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pal_out["final_T"]),
                                   np.asarray(ref_out["final_T"]), atol=1e-4)

        def loss(use_pallas, *a):
            out = render_tiled(*a, s, use_pallas=use_pallas,
                               pallas_interpret=True)
            return (jnp.mean(out["render"] ** 2)
                    + 0.05 * jnp.mean(out["final_T"]))

        g_x = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1))(*args)
        g_p = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1))(*args)
        for gx, gp, nm in zip(g_x, g_p, ["xyz", "opacity"]):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                       rtol=3e-3, atol=5e-5, err_msg=nm)
    finally:
        jax.clear_caches()  # don't leak monkeypatched-mode compilations


@pytest.mark.parametrize("scan_mode", ["ladder", "mxu"])
def test_pallas_bwd_moments_match_xla(scan_mode, monkeypatch):
    """R3DGS_BWD_MOMENTS=1 replaces the backward kernel's ten per-entry
    cross-sublane reductions with two MXU contractions (tile-relative pixel
    moments + color grads). Must match the XLA path bit-for-tolerance in
    both scan modes, including with the early-termination latch engaged."""
    from reduced_3dgs_tpu.ops.rasterize import pallas_kernel as pk
    monkeypatch.setattr(pk, "BWD_MOMENTS", True)
    monkeypatch.setattr(pk, "SCAN_MODE", scan_mode)
    jax.clear_caches()
    try:
        s = make_settings(32, 32, bg=(1.0, 1.0, 1.0))
        args = _args(100, key=4, spread=0.15, opaque=True)
        assert (np.asarray(render_tiled(*args, s)["final_T"]) < 2e-4).any()
        target = jnp.linspace(0, 1, 3 * 32 * 32).reshape(3, 32, 32)

        def loss(use_pallas, *a):
            out = render_tiled(*a, s, use_pallas=use_pallas,
                               pallas_interpret=True)
            return (jnp.mean(jnp.abs(out["render"] - target))
                    + 0.05 * jnp.mean(out["depth"])
                    + 0.05 * jnp.mean(out["final_T"]))

        g_x = jax.grad(lambda *a: loss(False, *a),
                       argnums=(0, 1, 2, 3, 4))(*args)
        g_p = jax.grad(lambda *a: loss(True, *a),
                       argnums=(0, 1, 2, 3, 4))(*args)
        for gx, gp, nm in zip(g_x, g_p, ["xyz", "op", "scale", "rot", "shs"]):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                       rtol=3e-3, atol=5e-5, err_msg=nm)
    finally:
        jax.clear_caches()


def test_pallas_stats_match_xla():
    """The kernel's per-entry counters reduced per Gaussian must equal the
    XLA segmented-scan stats path (importance counting + SH-culling
    accumulators)."""
    s = make_settings(48, 48)
    args = _args(60, key=6)
    ref = render_tiled(*args, s, with_stats=True)
    pal = render_tiled(*args, s, with_stats=True, use_pallas=True,
                       pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(pal["gaussians_count"]),
                                  np.asarray(ref["gaussians_count"]))
    for k in ["opacity_important_score", "T_alpha_important_score",
              "transmittance_sum"]:
        np.testing.assert_allclose(np.asarray(pal[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(pal["render"]),
                               np.asarray(ref["render"]), atol=1e-4)
