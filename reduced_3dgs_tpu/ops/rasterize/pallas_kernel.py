"""Pallas TPU fast path for the per-tile compositing stage.

The XLA tiled renderer (tiled.py) materialises [K, pixel_chunk] intermediates
in HBM for the segmented scan; this kernel keeps everything VMEM-resident per
tile and adds per-pixel early termination (skipping whole chunks once every
pixel in the tile has latched), matching the reference renderCUDA's work
model (forward.cu:461-582) on TPU hardware.

Layout: the (tile,depth)-sorted entries are packed into one [K, 16] f32
array (fields below), so each compositing chunk is a single contiguous
[CHUNK, 16] DMA. In-kernel orientation is entries-on-sublanes x
pixels-on-lanes ([CHUNK, 256]), making per-entry fields natural [CHUNK, 1]
columns (no transposes) and the within-chunk transmittance scan a sublane
cumsum in log space — exactly the math of tiled.py, so the two paths agree
to float tolerance.

The backward kernel mirrors the reference backward replay
(backward.cu:437-595): it walks chunks back-to-front, reconstructs each
entry's incoming transmittance by dividing suffix products out of the saved
final_T (the T = T/(1-alpha) replay of backward.cu:541), uses the saved
per-pixel latch ordinal (n_contrib, backward.cu:484-485) to gate
contributions, and accumulates per-entry gradients. Because every sorted
entry belongs to exactly one tile, per-entry gradient writes are exclusive —
the CUDA atomicAdds (backward.cu:561-592) become plain stores here, and the
final per-Gaussian reduction is a deterministic segment-sum outside the
kernel.

Field layout of e_packed[:, i]:
  0:x 1:y 2:conicA 3:conicB 4:conicC 5:opacity 6:r 7:g 8:b 9:depth 10-15:pad
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config

CHUNK = 256
N_FIELDS = 16
BLOCK = config.BLOCK_SIZE           # 256 pixels per tile
BIG = 2 ** 30  # python int: jnp constants at module scope would be traced captures


def _pixel_rows(tile_ids, tiles_x: int, row_offset):
    """Per-tile pixel center coordinates, [1, 256] rows (x and y)."""
    t = tile_ids
    tx = (t % tiles_x) * config.BLOCK_X
    ty = (t // tiles_x + row_offset) * config.BLOCK_Y
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
    px = (tx + lane % config.BLOCK_X).astype(jnp.float32)
    py = (ty + lane // config.BLOCK_X).astype(jnp.float32)
    return px, py


def _chunk_fields(buf):
    """Split a [CHUNK, 16] chunk into per-field [CHUNK, 1] columns."""
    return (buf[:, 0:1], buf[:, 1:2], buf[:, 2:3], buf[:, 3:4], buf[:, 4:5],
            buf[:, 5:6], buf[:, 6:7], buf[:, 7:8], buf[:, 8:9], buf[:, 9:10])


def _alpha_gate(buf, px, py, start, c, end):
    """Common alpha/gate computation for one chunk. Returns
    (abar [CHUNK,256], gate, not_clamped [CHUNK,256], G, dx, dy, fields)."""
    x, y, A, B, C, op, r, g, b, depth = _chunk_fields(buf)
    sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    valid = (start + c * CHUNK + sub) < end                  # [CHUNK,1]
    dx = x - px                                              # [CHUNK,256]
    dy = y - py
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    G = jnp.exp(power)
    raw = op * G
    not_clamped = raw < config.ALPHA_MAX
    alpha = jnp.minimum(config.ALPHA_MAX, raw)
    gate = (power <= 0.0) & (alpha >= config.ALPHA_EPS) & valid
    abar = jnp.where(gate, alpha, 0.0)
    return abar, gate, not_clamped, G, dx, dy, (x, y, A, B, C, op, r, g, b, depth)


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(range_start, range_end, row_off,       # scalar prefetch
                e_packed,                              # ANY (HBM)
                color_out, t_out, latch_out,           # VMEM blocks
                buf, sem,                              # scratch
                *, tiles_x: int):
    t = pl.program_id(0)
    start = range_start[t]
    end = range_end[t]
    px, py = _pixel_rows(t, tiles_x, row_off[0])

    num = end - start
    n_chunks = (num + CHUNK - 1) // CHUNK

    def dma(c, slot):
        return pltpu.make_async_copy(
            e_packed.at[pl.ds(start + c * CHUNK, CHUNK), :],
            buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def body(state):
        c, T, C4, latch = state
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, (c + 1) % 2).start()

        dma(c, slot).wait()
        chunk = buf[slot]
        abar, gate, _, _, _, _, f = _alpha_gate(chunk, px, py, start, c, end)
        _, _, _, _, _, _, r, g, b, depth = f

        log1ma = jnp.log(1.0 - abar)
        csum = jnp.cumsum(log1ma, axis=0)
        T_in = T * jnp.exp(csum - log1ma)                    # [CHUNK,256]
        trigger = gate & (T_in * (1.0 - abar) < config.T_EPS)
        sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BLOCK), 0)
        ordinal = start + c * CHUNK + sub
        latch_new = jnp.minimum(
            latch, jnp.min(jnp.where(trigger, ordinal, BIG), axis=0,
                           keepdims=True))
        contrib = gate & (ordinal < latch_new)
        w = jnp.where(contrib, abar * T_in, 0.0)
        C4 = C4 + jnp.concatenate([
            jnp.sum(w * r, axis=0, keepdims=True),
            jnp.sum(w * g, axis=0, keepdims=True),
            jnp.sum(w * b, axis=0, keepdims=True),
            jnp.sum(w * depth, axis=0, keepdims=True)], axis=0)
        T = T * jnp.exp(jnp.sum(jnp.where(contrib, log1ma, 0.0), axis=0,
                                keepdims=True))
        return c + 1, T, C4, latch_new

    def cond(state):
        c, _, _, latch = state
        return (c < n_chunks) & jnp.any(latch >= BIG)

    T0 = jnp.ones((1, BLOCK), jnp.float32)
    C40 = jnp.zeros((4, BLOCK), jnp.float32)
    latch0 = jnp.full((1, BLOCK), BIG, jnp.int32)
    c, T, C4, latch = jax.lax.while_loop(
        cond, body, (jnp.int32(0), T0, C40, latch0))

    # Pixels that never latched "contributed everything": latch = end.
    latch = jnp.minimum(latch, end)
    color_out[0] = C4
    t_out[0] = T
    latch_out[0] = latch


def tile_composite_fwd(e_packed, range_start, range_end, row_offset,
                       tiles_x: int, num_tiles: int, interpret: bool = False):
    """Run the forward compositing kernel over all tiles.

    Returns (color4 [T,4,256], final_T [T,1,256], latch [T,1,256] int32)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, 4, BLOCK), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, N_FIELDS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, 4, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, BLOCK), jnp.int32),
        ),
        interpret=interpret,
    )(range_start, range_end, jnp.asarray([row_offset], jnp.int32), e_packed)


# --------------------------------------------------------------------------
# Backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(range_start, range_end, row_off,        # scalar prefetch
                e_packed, final_t, latch_in, g_color, g_t,   # inputs
                grad_out,                               # ANY (HBM) [K,16]
                buf, gbuf, sem, gsem,                   # scratch
                *, tiles_x: int):
    t = pl.program_id(0)
    start = range_start[t]
    end = range_end[t]
    px, py = _pixel_rows(t, tiles_x, row_off[0])

    num = end - start
    n_chunks = (num + CHUNK - 1) // CHUNK
    latch = latch_in[0]                                   # [1,256] int32
    T_final = final_t[0]                                  # [1,256]
    g4 = g_color[0]                                       # [4,256]
    gT = g_t[0]                                           # [1,256]

    def dma_in(c, slot):
        return pltpu.make_async_copy(
            e_packed.at[pl.ds(start + c * CHUNK, CHUNK), :],
            buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma_in(n_chunks - 1, (n_chunks - 1) % 2).start()

    def body(state):
        ci, T_end, S = state                # ci counts down; T_end = T after
        c = ci - 1                          # this chunk; S = suffix sums
        slot = c % 2

        @pl.when(c >= 1)
        def _():
            dma_in(c - 1, (c - 1) % 2).start()

        dma_in(c, slot).wait()
        chunk = buf[slot]
        abar, gate, not_clamped, G, dx, dy, f = _alpha_gate(
            chunk, px, py, start, c, end)
        x, y, A, B, C, op, r, g, b, depth = f

        sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BLOCK), 0)
        ordinal = start + c * CHUNK + sub
        contrib = gate & (ordinal < latch)

        log1ma = jnp.where(contrib, jnp.log(1.0 - abar), 0.0)
        # Replay: T_in_k = T_end / prod_{j>=k}(1-abar_j)
        #               = T_end * exp(prefix_exclusive_k - total)
        tot_log = jnp.sum(log1ma, axis=0, keepdims=True)
        prefix_ex = jnp.cumsum(log1ma, axis=0) - log1ma
        T_in = T_end * jnp.exp(prefix_ex - tot_log)         # T before entry
        w = jnp.where(contrib, abar * T_in, 0.0)

        # c . g per (entry, pixel)
        cdotg = (r * g4[0:1] + g * g4[1:2] + b * g4[2:3] + depth * g4[3:4])
        # per-entry c4 gradients: [CHUNK] each
        g_r = jnp.sum(w * g4[0:1], axis=1, keepdims=True)
        g_g = jnp.sum(w * g4[1:2], axis=1, keepdims=True)
        g_b = jnp.sum(w * g4[2:3], axis=1, keepdims=True)
        g_d = jnp.sum(w * g4[3:4], axis=1, keepdims=True)

        # dL/dabar_k = contrib * [ cdotg*T_in - (S_after + T_final*gT)/(1-abar) ]
        # suffix sums of w*cdotg EXCLUSIVE of k, then add the carry S.
        wc = w * cdotg
        tot_wc = jnp.sum(wc, axis=0, keepdims=True)
        prefix_incl_wc = jnp.cumsum(wc, axis=0)
        S_after = (tot_wc - prefix_incl_wc) + S              # [CHUNK,256]
        dabar = jnp.where(
            contrib,
            cdotg * T_in - S_after / (1.0 - abar),
            0.0)
        # alpha = min(0.99, op*G): minimum's subgradient (match tiled.py)
        dalpha = jnp.where(not_clamped, dabar, 0.0)
        dG = op * dalpha
        dop = jnp.sum(G * dalpha, axis=1, keepdims=True)     # [CHUNK,1]
        dpower = dG * G
        ddx = dpower * (-A * dx - B * dy)
        ddy = dpower * (-C * dy - B * dx)
        gx = jnp.sum(ddx, axis=1, keepdims=True)
        gy = jnp.sum(ddy, axis=1, keepdims=True)
        gA = jnp.sum(dpower * (-0.5 * dx * dx), axis=1, keepdims=True)
        gB = jnp.sum(dpower * (-dx * dy), axis=1, keepdims=True)
        gC = jnp.sum(dpower * (-0.5 * dy * dy), axis=1, keepdims=True)
        zeros = jnp.zeros_like(gx)
        gbuf[slot] = jnp.concatenate(
            [gx, gy, gA, gB, gC, dop, g_r, g_g, g_b, g_d,
             zeros, zeros, zeros, zeros, zeros, zeros], axis=1)
        copy_out = pltpu.make_async_copy(
            gbuf.at[slot],
            grad_out.at[pl.ds(start + c * CHUNK, CHUNK), :],
            gsem.at[slot])
        copy_out.start()
        copy_out.wait()

        T_start = T_end * jnp.exp(-tot_log)
        S_new = S + tot_wc
        return c, T_start, S_new

    def cond(state):
        ci, _, _ = state
        return ci > 0

    S0 = T_final * gT                                     # [1,256]
    jax.lax.while_loop(cond, body, (n_chunks, T_final, S0))


def tile_composite_bwd(e_packed, range_start, range_end, row_offset,
                       tiles_x: int, num_tiles: int,
                       final_t, latch, g_color4, g_t,
                       interpret: bool = False):
    """Backward kernel. Returns per-entry gradients packed like e_packed
    (fields 0-9 = d(x,y,A,B,C,op,r,g,b,depth))."""
    k = e_packed.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, BLOCK), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, BLOCK), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, N_FIELDS), jnp.float32),
            pltpu.VMEM((2, CHUNK, N_FIELDS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, N_FIELDS), jnp.float32),
        interpret=interpret,
    )(range_start, range_end, jnp.asarray([row_offset], jnp.int32),
      e_packed, final_t, latch, g_color4, g_t)
    # rows never covered by a tile range (sentinel/padding entries) are
    # uninitialised memory: their true gradient is zero.
    total = range_end[num_tiles - 1]
    row = jnp.arange(k, dtype=jnp.int32)[:, None]
    return jnp.where(row < total, grads, 0.0)


# --------------------------------------------------------------------------
# custom_vjp wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def composite_pallas(e_packed, range_start, range_end, row_offset,
                     tiles_x: int, num_tiles: int, interpret: bool = False):
    """Differentiable per-tile compositing via the Pallas kernels.

    Args:
      e_packed: [K, 16] sorted entry fields (see module docstring).
    Returns:
      (color4 [T,4,256], final_T [T,1,256]).
    """
    color4, final_t, _ = tile_composite_fwd(
        e_packed, range_start, range_end, row_offset, tiles_x, num_tiles,
        interpret)
    return color4, final_t


def _composite_fwd(e_packed, range_start, range_end, row_offset,
                   tiles_x, num_tiles, interpret):
    color4, final_t, latch = tile_composite_fwd(
        e_packed, range_start, range_end, row_offset, tiles_x, num_tiles,
        interpret)
    return (color4, final_t), (e_packed, range_start, range_end, row_offset,
                               final_t, latch)


def _composite_bwd(tiles_x, num_tiles, interpret, res, cot):
    e_packed, range_start, range_end, row_offset, final_t, latch = res
    g_color4, g_t = cot
    grads = tile_composite_bwd(
        e_packed, range_start, range_end, row_offset, tiles_x, num_tiles,
        final_t, latch, g_color4, g_t, interpret)
    return grads, None, None, None


composite_pallas.defvjp(_composite_fwd, _composite_bwd)


def pack_entries(means2d, conic, opacity, rgb, depth):
    """Pack sorted per-entry fields into the [K + CHUNK, 16] kernel layout.

    One extra CHUNK of zero rows is appended so the kernel's fixed-size chunk
    DMA never goes out of bounds (XLA dynamic-slice would otherwise CLAMP the
    start index and silently misalign the last chunk of the last tiles)."""
    cols = [means2d[:, 0], means2d[:, 1], conic[:, 0], conic[:, 1],
            conic[:, 2], opacity, rgb[:, 0], rgb[:, 1], rgb[:, 2], depth]
    packed = jnp.stack(cols, axis=1)
    return jnp.pad(packed, ((0, CHUNK), (0, N_FIELDS - packed.shape[1])))


def unpack_grads(grads):
    """[K,16] gradient fields -> (d_means2d, d_conic, d_opacity, d_rgb, d_depth)."""
    return (grads[:, 0:2], grads[:, 2:5], grads[:, 5], grads[:, 6:9],
            grads[:, 9])
