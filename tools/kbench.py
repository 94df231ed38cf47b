"""Kernel-only microbench: time the Pallas fwd/bwd compositing at bench scale.

Much lighter than the full-step tools (small programs, fast compiles) so
kernel strategy knobs can be swept on-chip:

    R3DGS_ALIGN={0,1} R3DGS_SCAN={ladder,mxu} R3DGS_CHUNK={128,256,512} \
        python tools/kbench.py

Prints one JSON line with fwd/bwd kernel times and the custom-VJP
round trip (gather + kernels + scatter-free reduction).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from reduced_3dgs_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from tools.bisect_body import build  # noqa: E402
from reduced_3dgs_tpu import config  # noqa: E402
from reduced_3dgs_tpu.ops.rasterize import common, tiled  # noqa: E402
from reduced_3dgs_tpu.ops.rasterize import pallas_kernel as pk  # noqa: E402


def time_chained(fn, args, steps=20):
    carry = jnp.float32(0.0)
    carry = fn(carry, *args)
    carry = fn(carry, *args)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(carry, *args)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args_cli = ap.parse_args()

    model, cam = build()
    params = model.parameters()
    settings = model.render_settings(cam)
    tiles_x, tiles_y = common.tile_grid(settings)
    num_tiles = tiles_x * tiles_y
    align = pk.CHUNK if config.ALIGN_SEGMENTS else 0

    # render_array_args applies the activations (exp scales, normalized
    # quats, degree-masked SH) exactly like model.render does.
    pre = common.preprocess(
        *model.render_array_args(params, model.aux_state()), settings)

    # Pick K the way a settled trainer would: probe slots at a generous K,
    # then re-bin at the 1.15x tier.
    K0 = -(-tiled.default_key_buffer_size(params["xyz"].shape[0], tiles_x,
                                          tiles_y) // pk.CHUNK) * pk.CHUNK
    ent = tiled.bin_and_sort(pre.rect_min, pre.rect_max, pre.tiles_touched,
                             pre.depths, tiles_x=tiles_x, tiles_y=tiles_y,
                             tile_row_offset=jnp.int32(0), K=K0,
                             align_chunk=align)
    slots = int(ent["total_slots"])
    K = 2048
    while K < int(1.15 * slots) and K < K0:
        K = -(-int(K * 1.15) // 2048) * 2048
    K = min(-(-K // pk.CHUNK) * pk.CHUNK, K0)
    ent = tiled.bin_and_sort(pre.rect_min, pre.rect_max, pre.tiles_touched,
                             pre.depths, tiles_x=tiles_x, tiles_y=tiles_y,
                             tile_row_offset=jnp.int32(0), K=K,
                             align_chunk=align)
    if align:
        rs, re = ent["range_start"], ent["range_end"]
    else:
        rs, re = tiled.tile_ranges_from_rects(
            pre.rect_min, pre.rect_max, pre.tiles_touched, tiles_x, tiles_y,
            jnp.int32(0), K)
    steps = pk.step_layout(rs, re, K, num_tiles, bool(align))
    fields10 = pk.pack_fields(pre)
    e_packed = jnp.take(fields10, ent["s_gidx"], axis=1, mode="clip")
    inv_pos = pk.inverse_permutation(ent["s_pos"])
    row0 = jnp.int32(0)

    fwd_j = jax.jit(lambda c, ep, *st: pk.tile_composite_fwd(
        ep + c * 1e-30, *st, row0, tiles_x, num_tiles, False))

    def fwd_fn(carry, ep):
        color4, final_t, latch = fwd_j(carry, ep, *steps)
        return carry + jnp.sum(color4[0, 0]) * 0

    fwd_ms = time_chained(jax.jit(fwd_fn), (e_packed,), args_cli.steps)

    color4, final_t, latch = fwd_j(jnp.float32(0), e_packed, *steps)
    g_c = jnp.ones_like(color4[:num_tiles]) * 0.5
    g_t = jnp.ones_like(final_t[:num_tiles]) * 0.1

    def bwd_fn(carry, ep, ft, lt, gc, gt):
        grads = pk.tile_composite_bwd(
            ep + carry * 1e-30, *steps, row0, tiles_x, num_tiles,
            jnp.concatenate([ft[:num_tiles],
                             jnp.ones((1, pk.BLOCK, 1), ft.dtype)]),
            jnp.concatenate([lt[:num_tiles],
                             jnp.zeros((1, pk.BLOCK, 1), lt.dtype)]),
            jnp.concatenate([gc, jnp.zeros((1, pk.BLOCK, 4), gc.dtype)]),
            jnp.concatenate([gt, jnp.zeros((1, pk.BLOCK, 1), gt.dtype)]))
        return carry + jnp.sum(grads[:, 0]) * 0

    bwd_ms = time_chained(jax.jit(bwd_fn),
                          (e_packed, final_t, latch, g_c, g_t),
                          args_cli.steps)

    # Full custom-VJP round trip (gather + fwd + bwd + emission reduction).
    def vjp_fn(carry, f10):
        def f(ff):
            c4, ft = pk.composite_sorted(
                ff, ent["s_gidx"], inv_pos, ent["offsets"], ent["counts"],
                ent["s_tile"], rs, re, row0, tiles_x, num_tiles, False,
                bool(align))
            return jnp.sum(c4 * 0.5) + jnp.sum(ft * 0.1)
        val, g = jax.value_and_grad(f)(f10 + carry * 1e-30)
        return carry + val * 0 + jnp.sum(g) * 0

    vjp_ms = time_chained(jax.jit(vjp_fn), (fields10,), args_cli.steps)

    # Emission + sort (+ranges/layout) alone, at the settled K.
    def binsort_fn(carry, rmin, rmax, touched, depths):
        e = tiled.bin_and_sort(rmin, rmax, touched, depths + carry * 1e-30,
                               tiles_x=tiles_x, tiles_y=tiles_y,
                               tile_row_offset=jnp.int32(0), K=K,
                               align_chunk=align)
        return (carry + jnp.sum(e["s_gidx"][:8]) * 0
                + jnp.sum(e["s_pos"][:8]) * 0)

    binsort_ms = time_chained(
        jax.jit(binsort_fn),
        (pre.rect_min, pre.rect_max, pre.tiles_touched, pre.depths),
        args_cli.steps)

    # Preprocess (project + cov2D + SH) fwd and fwd+bwd.
    arr = model.render_array_args(params, model.aux_state())

    def prep_fn(carry, xyz, *rest):
        p = common.preprocess(xyz + carry * 1e-30, *rest, settings)
        return carry + jnp.sum(p.means2d[:8]) * 0

    prep_ms = time_chained(jax.jit(prep_fn), tuple(arr), args_cli.steps)

    def prep_grad_fn(carry, xyz, *rest):
        def f(x):
            p = common.preprocess(x, *rest, settings)
            return (jnp.sum(p.means2d * 1e-6) + jnp.sum(p.conic * 1e-6)
                    + jnp.sum(p.rgb * 1e-6) + jnp.sum(p.opacity * 1e-6))
        val, g = jax.value_and_grad(f)(xyz + carry * 1e-30)
        return carry + val * 0 + jnp.sum(g[:8]) * 0

    prep_grad_ms = time_chained(jax.jit(prep_grad_fn), tuple(arr),
                                args_cli.steps)

    # SSIM loss fwd+bwd at bench resolution.
    from reduced_3dgs_tpu.ops.ssim import ssim
    img = jnp.clip(color4[:num_tiles, :, :3].reshape(-1)[
        : 3 * settings.image_height * settings.image_width].reshape(
        3, settings.image_height, settings.image_width), 0, 1)
    gt_img = jnp.roll(img, 1, axis=1)

    def ssim_fn(carry, a, b):
        def f(x):
            return 1.0 - ssim(x, b)
        val, g = jax.value_and_grad(f)(a + carry * 1e-30)
        return carry + val * 0 + jnp.sum(g[:, :2, :2]) * 0

    ssim_ms = time_chained(jax.jit(ssim_fn), (img, gt_img), args_cli.steps)

    print(json.dumps({
        "align": bool(align), "scan": pk.SCAN_MODE, "chunk": pk.CHUNK,
        "sort": config.SORT_MODE, "emission": config.EMISSION_MODE,
        "K": int(K), "slots": slots, "total": int(ent["total"]),
        "static_grid_steps": int(steps[0].shape[0]),
        "fwd_kernel_ms": round(fwd_ms, 2), "bwd_kernel_ms": round(bwd_ms, 2),
        "fwd_bwd_vjp_ms": round(vjp_ms, 2),
        "binsort_ms": round(binsort_ms, 2),
        "preprocess_ms": round(prep_ms, 2),
        "preprocess_grad_ms": round(prep_grad_ms, 2),
        "ssim_grad_ms": round(ssim_ms, 2),
        "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
