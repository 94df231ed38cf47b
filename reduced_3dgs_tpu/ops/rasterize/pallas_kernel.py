"""Pallas TPU fast path for the per-tile compositing stage.

TPU-native re-design of the reference renderCUDA tile kernels
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:461-582, backward.cu:437-595). The CUDA kernel assigns one
threadblock per image tile and loops over that tile's depth-sorted entries;
a literal translation (grid over tiles, data-dependent while loop per tile)
underutilises the TPU badly: grid steps serialise behind per-tile DMA
latency and loop-predicate scalar syncs. Instead this kernel STREAMS the
entry buffer:

  * The (tile, depth)-sorted entries are re-packed so every tile's segment
    is padded up to a CHUNK=256 multiple — each fixed [16, CHUNK] chunk then
    belongs to exactly one tile (fields on sublanes, entries on lanes; a
    [K, 16] layout is uncompilable against Mosaic's 128-lane tiling).
  * The grid is a flat, static walk over chunks. Entry chunks are
    auto-pipelined VMEM blocks; the per-tile accumulator state (color4,
    transmittance, early-termination latch) lives in OUTPUT blocks whose
    index map is the chunk's tile id (scalar-prefetched) — consecutive
    chunks of one tile revisit the same resident block, the
    flash-attention accumulator idiom. No manual DMA, no while loops.
  * Early termination: once every pixel of a tile has latched
    (T below 1e-4, forward.cu:549-554), remaining chunks of that tile are
    predicated off with `pl.when`.

In-kernel orientation is pixels-on-sublanes x entries-on-lanes
([BLOCK=256, CHUNK=256] intermediates): per-entry fields are [1, C] rows,
per-pixel state is [P, 1] columns, and the within-chunk transmittance scan
in log space is a lane-axis cumulative sum evaluated as one [C, C]
triangular MXU matmul per chunk (Mosaic has no cumsum; the matmul rides the
otherwise-idle MXU, overlapped with VPU compositing math).

The backward kernel walks the same chunk grid in reverse, reconstructing
each entry's incoming transmittance by dividing suffix products out of the
saved final_T (the T = T/(1-alpha) replay of backward.cu:541) and gating by
the saved per-pixel latch ordinal (n_contrib, backward.cu:484-485). Each
chunk's per-entry gradients are an exclusive output block — the CUDA
atomicAdds (backward.cu:561-592) become deterministic block writes, and the
final per-Gaussian reduction is a segment-sum outside the kernel.

Sublane field order of packed entries[i, :]:
  0:x 1:y 2:conicA 3:conicB 4:conicC 5:opacity 6:r 7:g 8:b 9:depth 10-15:pad
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config

CHUNK = 256
N_FIELDS = 10
BLOCK = config.BLOCK_SIZE           # 256 pixels per tile
BIG = 2 ** 30  # python int: jnp constants at module scope would be traced captures


def _cumsum_lanes(x, exclusive: bool = False):
    """Cumulative sum over the lane (entry) axis of a [P, CHUNK] block.

    Mosaic has no cumsum lowering for the tensor core; a log2(CHUNK)-step
    shift-add ladder of lane rotates is exact in f32 and stays on the VPU
    (a triangular MXU matmul would run in bf16 by default and lose
    compositing precision)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    s = 1
    while s < CHUNK:
        acc = acc + jnp.where(lane >= s, pltpu.roll(acc, s, 1), 0.0)
        s *= 2
    return acc - x if exclusive else acc


def _pixel_cols(tile_id, tiles_x: int, row_offset):
    """Pixel center coordinates of one tile as [BLOCK, 1] columns (x, y)."""
    tx = (tile_id % tiles_x) * config.BLOCK_X
    ty = (tile_id // tiles_x + row_offset) * config.BLOCK_Y
    sub = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    px = (tx + sub % config.BLOCK_X).astype(jnp.float32)
    py = (ty + sub // config.BLOCK_X).astype(jnp.float32)
    return px, py


def _chunk_fields(buf):
    """Split a [16, CHUNK] chunk into per-field [1, CHUNK] rows."""
    return (buf[0:1, :], buf[1:2, :], buf[2:3, :], buf[3:4, :], buf[4:5, :],
            buf[5:6, :], buf[6:7, :], buf[7:8, :], buf[8:9, :], buf[9:10, :])


def _alpha_gate(buf, px, py, ordinal, limit):
    """Common alpha/gate computation for one chunk. Returns
    (abar [P,C], gate, not_clamped, G, dx, dy, fields)."""
    x, y, A, B, C, op, r, g, b, depth = _chunk_fields(buf)
    valid = ordinal < limit                                  # [1,C]
    dx = x - px                                              # [P,C]
    dy = y - py
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    G = jnp.exp(power)
    raw = op * G
    not_clamped = raw < config.ALPHA_MAX
    alpha = jnp.minimum(config.ALPHA_MAX, raw)
    gate = (power <= 0.0) & (alpha >= config.ALPHA_EPS) & valid
    abar = jnp.where(gate, alpha, 0.0)
    return (abar, gate, not_clamped, G, dx, dy,
            (x, y, A, B, C, op, r, g, b, depth))


# --------------------------------------------------------------------------
# Chunk-grid layout (shared by forward and backward)
# --------------------------------------------------------------------------

def chunk_layout(range_start, range_end, k: int, num_tiles: int):
    """Pad each tile's entry segment up to a CHUNK multiple.

    Static padded capacity: Kpad = roundup(k) + num_tiles*CHUNK (every tile
    can waste at most one partial chunk). Returns (src, src_valid,
    chunk_tile [Cpad], chunk_limit [Cpad], pad_start [T], pad_cnt [T]):
    padded position q holds original sorted entry src[q] (if src_valid[q]),
    chunk c belongs to tile chunk_tile[c] (num_tiles = sentinel) and its
    entries are valid below global padded ordinal chunk_limit[c].
    """
    counts = range_end - range_start                        # [T]
    tile_chunks = -(-counts // CHUNK)                       # ceil
    pad_sizes = tile_chunks * CHUNK
    pad_start = jnp.cumsum(pad_sizes) - pad_sizes           # [T] exclusive
    total_pad = pad_start[-1] + pad_sizes[-1]

    kpad = (-(-k // CHUNK) + num_tiles) * CHUNK
    n_chunks = kpad // CHUNK
    # Owner tile of each chunk: scatter each nonempty tile's id at its first
    # chunk, then forward-fill with a running max (XLA searchsorted lowers to
    # a sequential while loop on TPU; this is all vector work).
    ids = jnp.arange(num_tiles, dtype=jnp.int32)
    seed = jnp.zeros((n_chunks,), jnp.int32).at[
        jnp.where(counts > 0, pad_start // CHUNK, n_chunks)
    ].max(ids, mode="drop")
    ct = jax.lax.associative_scan(jnp.maximum, seed)        # [Cpad]

    c0 = jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK
    chunk_tile = jnp.where(c0 < total_pad, ct, num_tiles)
    chunk_limit = jnp.where(c0 < total_pad, pad_start[ct] + counts[ct], 0)

    q = jnp.arange(kpad, dtype=jnp.int32)
    t_of_q = ct[q // CHUNK]
    rel = q - pad_start[t_of_q]
    src = range_start[t_of_q] + rel
    src_valid = (rel < counts[t_of_q]) & (q < total_pad)
    return src, src_valid, chunk_tile, chunk_limit, pad_start, counts


def _pad_entries(e_packed, src, src_valid):
    """[16, K] sorted entries -> [16, Kpad] chunk-aligned padded entries."""
    e = jnp.take(e_packed, src, axis=1)
    return jnp.where(src_valid[None, :], e, 0.0)


def _unpad_grads(grads_padded, s_tile, range_start, pad_start, k: int,
                 num_tiles: int):
    """[16, Kpad] padded per-entry grads -> [16, K] sorted-entry grads.

    The padding map is injective, so the inverse is a pure gather: sorted
    entry j of tile t = s_tile[j] sits at padded position
    pad_start[t] + (j - range_start[t]). Sentinel entries get zero."""
    j = jnp.arange(k, dtype=jnp.int32)
    t_of_j = jnp.clip(s_tile, 0, num_tiles - 1)
    q = pad_start[t_of_j] + (j - range_start[t_of_j])
    g = jnp.take(grads_padded, jnp.clip(q, 0, grads_padded.shape[1] - 1),
                 axis=1)
    return jnp.where((s_tile < num_tiles)[None, :], g, 0.0)


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(chunk_tile, chunk_limit, row_off,       # scalar prefetch
                e_ref,                                  # [16, CHUNK] block
                color_ref, t_ref, latch_ref,            # [BLOCK, *] tile state
                *, tiles_x: int, num_tiles: int):
    c = pl.program_id(0)
    t = chunk_tile[c]
    sentinel = t >= num_tiles
    first = jnp.logical_or(c == 0, chunk_tile[jnp.maximum(c - 1, 0)] != t)

    @pl.when(first & jnp.logical_not(sentinel))
    def _():
        color_ref[0] = jnp.zeros((BLOCK, 4), jnp.float32)
        t_ref[0] = jnp.ones((BLOCK, 1), jnp.float32)
        latch_ref[0] = jnp.full((BLOCK, 1), BIG, jnp.int32)

    @pl.when(jnp.logical_not(sentinel))
    def _():
        latch = latch_ref[0]

        @pl.when(jnp.any(latch >= BIG))
        def _():
            px, py = _pixel_cols(t, tiles_x, row_off[0])
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            ordinal = c * CHUNK + lane                       # [1,C] padded pos
            abar, gate, _, _, _, _, f = _alpha_gate(
                e_ref[:, :], px, py, ordinal, chunk_limit[c])
            _, _, _, _, _, _, r, g, b, depth = f

            T = t_ref[0]
            log1ma = jnp.log(1.0 - abar)                     # [P,C]
            lex = _cumsum_lanes(log1ma, exclusive=True)
            T_in = T * jnp.exp(lex)                          # [P,C]
            trigger = gate & (T_in * (1.0 - abar) < config.T_EPS)
            latch_new = jnp.minimum(
                latch, jnp.min(jnp.where(trigger, ordinal, BIG), axis=1,
                               keepdims=True))               # [P,1]
            contrib = gate & (ordinal < latch_new)
            w = jnp.where(contrib, abar * T_in, 0.0)
            color_ref[0] = color_ref[0] + jnp.concatenate([
                jnp.sum(w * r, axis=1, keepdims=True),
                jnp.sum(w * g, axis=1, keepdims=True),
                jnp.sum(w * b, axis=1, keepdims=True),
                jnp.sum(w * depth, axis=1, keepdims=True)], axis=1)
            t_ref[0] = T * jnp.exp(
                jnp.sum(jnp.where(contrib, log1ma, 0.0), axis=1,
                        keepdims=True))
            latch_ref[0] = latch_new


def tile_composite_fwd(e_padded, chunk_tile, chunk_limit, row_offset,
                       tiles_x: int, num_tiles: int, interpret: bool = False):
    """Run the forward compositing kernel over the padded chunk grid.

    Returns (color4 [T+1,256,4], final_T [T+1,256,1], latch [T+1,256,1]);
    row num_tiles is the sentinel bucket, rows of chunkless tiles are
    garbage — callers mask with the tile counts."""
    n_chunks = e_padded.shape[1] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((N_FIELDS, CHUNK),
                               lambda c, ct, cl, ro: (0, c),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, BLOCK, 4), lambda c, ct, cl, ro: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1), lambda c, ct, cl, ro: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1), lambda c, ct, cl, ro: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, num_tiles=num_tiles),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles + 1, BLOCK, 4), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles + 1, BLOCK, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles + 1, BLOCK, 1), jnp.int32),
        ),
        interpret=interpret,
    )(chunk_tile, chunk_limit, jnp.asarray([row_offset], jnp.int32), e_padded)


# --------------------------------------------------------------------------
# Backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(chunk_tile, chunk_limit, row_off,       # scalar prefetch
                e_ref, final_t, latch_in, g_color, g_t,  # blocks
                grads_ref,                              # [16, CHUNK] block
                t_run, s_acc, maxlatch,                 # scratch
                *, tiles_x: int, num_tiles: int):
    n = pl.num_programs(0)
    rc = n - 1 - pl.program_id(0)                        # chunk, reversed
    t = chunk_tile[rc]
    sentinel = t >= num_tiles
    first = jnp.logical_or(rc == n - 1,
                           chunk_tile[jnp.minimum(rc + 1, n - 1)] != t)

    @pl.when(first & jnp.logical_not(sentinel))
    def _():
        t_run[:, :] = final_t[0]
        s_acc[:, :] = final_t[0] * g_t[0]
        maxlatch[0, 0] = jnp.max(latch_in[0])

    # Chunks entirely at-or-after every pixel's latch contribute nothing.
    live = jnp.logical_and(jnp.logical_not(sentinel),
                           rc * CHUNK < maxlatch[0, 0])

    @pl.when(jnp.logical_not(live))
    def _():
        grads_ref[:, :] = jnp.zeros((N_FIELDS, CHUNK), jnp.float32)

    @pl.when(live)
    def _():
        px, py = _pixel_cols(t, tiles_x, row_off[0])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        ordinal = rc * CHUNK + lane
        abar, gate, not_clamped, G, dx, dy, f = _alpha_gate(
            e_ref[:, :], px, py, ordinal, chunk_limit[rc])
        x, y, A, B, C, op, r, g, b, depth = f

        latch = latch_in[0]                               # [P,1]
        g4 = g_color[0]                                   # [P,4]
        T_end = t_run[:, :]                               # [P,1]
        S = s_acc[:, :]                                   # [P,1]

        contrib = gate & (ordinal < latch)
        log1ma = jnp.where(contrib, jnp.log(1.0 - abar), 0.0)
        # Replay: T_in_k = T_end / prod_{j>=k}(1-abar_j)
        #               = T_end * exp(prefix_exclusive_k - total)
        tot_log = jnp.sum(log1ma, axis=1, keepdims=True)    # [P,1]
        prefix_ex = _cumsum_lanes(log1ma, exclusive=True)
        T_in = T_end * jnp.exp(prefix_ex - tot_log)         # T before entry
        w = jnp.where(contrib, abar * T_in, 0.0)

        # c . g per (pixel, entry)
        cdotg = (r * g4[:, 0:1] + g * g4[:, 1:2] + b * g4[:, 2:3]
                 + depth * g4[:, 3:4])                      # [P,C]
        # per-entry c4 gradients: [1,C] each
        g_r = jnp.sum(w * g4[:, 0:1], axis=0, keepdims=True)
        g_g = jnp.sum(w * g4[:, 1:2], axis=0, keepdims=True)
        g_b = jnp.sum(w * g4[:, 2:3], axis=0, keepdims=True)
        g_d = jnp.sum(w * g4[:, 3:4], axis=0, keepdims=True)

        # dL/dabar_k = contrib * [ cdotg*T_in - (S_after + T_final*gT)/(1-abar) ]
        # suffix sums of w*cdotg EXCLUSIVE of k, then add the carry S.
        wc = w * cdotg
        tot_wc = jnp.sum(wc, axis=1, keepdims=True)
        prefix_incl_wc = _cumsum_lanes(wc)
        S_after = (tot_wc - prefix_incl_wc) + S              # [P,C]
        dabar = jnp.where(
            contrib,
            cdotg * T_in - S_after / (1.0 - abar),
            0.0)
        # alpha = min(0.99, op*G): minimum's subgradient (match tiled.py).
        dalpha = jnp.where(not_clamped, dabar, 0.0)
        # Gate G before multiplying by (zero) gradients: gated-out entries
        # can have power > 0 => G = inf, and 0 * inf would poison the
        # per-entry reductions with NaNs.
        G_gated = jnp.where(gate, G, 0.0)
        dG = op * dalpha
        dop = jnp.sum(G_gated * dalpha, axis=0, keepdims=True)  # [1,C]
        dpower = dG * G_gated
        ddx = dpower * (-A * dx - B * dy)
        ddy = dpower * (-C * dy - B * dx)
        gx = jnp.sum(ddx, axis=0, keepdims=True)
        gy = jnp.sum(ddy, axis=0, keepdims=True)
        gA = jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
        gB = jnp.sum(dpower * (-dx * dy), axis=0, keepdims=True)
        gC = jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
        grads_ref[:, :] = jnp.concatenate(
            [gx, gy, gA, gB, gC, dop, g_r, g_g, g_b, g_d], axis=0)  # [10,C]

        t_run[:, :] = T_end * jnp.exp(-tot_log)
        s_acc[:, :] = S + tot_wc


def tile_composite_bwd(e_padded, chunk_tile, chunk_limit, row_offset,
                       tiles_x: int, num_tiles: int,
                       final_t, latch, g_color4, g_t,
                       interpret: bool = False):
    """Backward kernel over the reversed chunk grid. Returns padded per-entry
    gradients ([16, Kpad]; sublanes 0-9 = d(x,y,A,B,C,op,r,g,b,depth))."""
    kpad = e_padded.shape[1]
    n_chunks = kpad // CHUNK
    rev = n_chunks - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N_FIELDS, CHUNK),
                         lambda c, ct, cl, ro: (0, rev - c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1),
                         lambda c, ct, cl, ro: (ct[rev - c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1),
                         lambda c, ct, cl, ro: (ct[rev - c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 4),
                         lambda c, ct, cl, ro: (ct[rev - c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1),
                         lambda c, ct, cl, ro: (ct[rev - c], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_FIELDS, CHUNK),
                               lambda c, ct, cl, ro: (0, rev - c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, num_tiles=num_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_FIELDS, kpad), jnp.float32),
        interpret=interpret,
    )(chunk_tile, chunk_limit, jnp.asarray([row_offset], jnp.int32),
      e_padded, final_t, latch, g_color4, g_t)


# --------------------------------------------------------------------------
# custom_vjp wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def composite_pallas(e_packed, s_tile, range_start, range_end, row_offset,
                     tiles_x: int, num_tiles: int, interpret: bool = False):
    """Differentiable per-tile compositing via the Pallas chunk-grid kernels.

    Args:
      e_packed: [16, K] (tile,depth)-sorted entry fields (see module
        docstring); s_tile [K] each entry's tile id (num_tiles = sentinel);
      tile segment ranges given by range_start/range_end [T].
    Returns:
      (color4 [T,256,4], final_T [T,256,1]); empty tiles come out as
      color 0 / T 1.
    """
    out, _ = _composite_fwd(e_packed, s_tile, range_start, range_end,
                            row_offset, tiles_x, num_tiles, interpret)
    return out


def _composite_fwd(e_packed, s_tile, range_start, range_end, row_offset,
                   tiles_x, num_tiles, interpret):
    k = e_packed.shape[1]
    src, src_valid, chunk_tile, chunk_limit, pad_start, counts = chunk_layout(
        range_start, range_end, k, num_tiles)
    e_padded = _pad_entries(e_packed, src, src_valid)
    color4, final_t, latch = tile_composite_fwd(
        e_padded, chunk_tile, chunk_limit, row_offset, tiles_x, num_tiles,
        interpret)
    # Mask tiles that never got a chunk (their state rows are garbage).
    nonempty = (counts > 0)[:, None, None]
    color4 = jnp.where(nonempty, color4[:num_tiles], 0.0)
    final_t = jnp.where(nonempty, final_t[:num_tiles], 1.0)
    latch = jnp.where(nonempty, latch[:num_tiles], 0)
    # e_padded and the chunk layout go into the residuals so the backward
    # pass re-runs neither the padding gather nor the layout scans.
    return (color4, final_t), (e_padded, chunk_tile, chunk_limit, pad_start,
                               s_tile, range_start, row_offset, final_t,
                               latch)


def _composite_bwd(tiles_x, num_tiles, interpret, res, cot):
    (e_padded, chunk_tile, chunk_limit, pad_start, s_tile, range_start,
     row_offset, final_t, latch) = res
    g_color4, g_t = cot
    k = s_tile.shape[0]
    grads_padded = tile_composite_bwd(
        e_padded, chunk_tile, chunk_limit, row_offset, tiles_x, num_tiles,
        jnp.concatenate([final_t, jnp.ones((1, BLOCK, 1), final_t.dtype)]),
        jnp.concatenate([latch, jnp.zeros((1, BLOCK, 1), latch.dtype)]),
        jnp.concatenate([g_color4, jnp.zeros((1, BLOCK, 4), g_color4.dtype)]),
        jnp.concatenate([g_t, jnp.zeros((1, BLOCK, 1), g_t.dtype)]),
        interpret)
    grads = _unpad_grads(grads_padded, s_tile, range_start, pad_start, k,
                         num_tiles)
    return grads, None, None, None, None


composite_pallas.defvjp(_composite_fwd, _composite_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def composite_from_fields(fields10, s_gidx, inv_pos, offsets, counts,
                          s_tile, range_start, range_end, row_offset,
                          tiles_x: int, num_tiles: int,
                          interpret: bool = False):
    """Compositing straight from per-Gaussian fields: fuses the per-entry
    gather, the chunk padding, and their transposes into the kernel's
    custom VJP.

    Forward: one [10, Kpad] gather fields10[:, s_gidx[src]] builds the
    chunk-aligned entry buffer directly. Backward: the padded per-entry
    gradients are gathered once into EMISSION order (where each Gaussian's
    entries are one contiguous run) and reduced by differencing a running
    prefix sum at the [offset, offset+count) boundaries — no scatter ever
    materialises (XLA's gather transpose is a serial scatter-add on TPU,
    ~12 ms for 1.2M updates; this path is ~4x cheaper end to end).

    Args: fields10 [10, N] (pack_fields), s_gidx/s_pos-derived inv_pos /
    offsets / counts / s_tile from bin_and_sort, tile ranges [T].
    Returns (color4 [T,256,4], final_T [T,256,1]).
    """
    out, _ = _cff_fwd(fields10, s_gidx, inv_pos, offsets, counts, s_tile,
                      range_start, range_end, row_offset, tiles_x, num_tiles,
                      interpret)
    return out


def _cff_fwd(fields10, s_gidx, inv_pos, offsets, counts, s_tile,
             range_start, range_end, row_offset, tiles_x, num_tiles,
             interpret):
    k = s_gidx.shape[0]
    src, src_valid, chunk_tile, chunk_limit, pad_start, counts_tile = \
        chunk_layout(range_start, range_end, k, num_tiles)
    padded_idx = jnp.take(s_gidx, src, axis=0)
    e_padded = jnp.where(src_valid[None, :],
                         jnp.take(fields10, padded_idx, axis=1), 0.0)
    color4, final_t, latch = tile_composite_fwd(
        e_padded, chunk_tile, chunk_limit, row_offset, tiles_x, num_tiles,
        interpret)
    nonempty = (counts_tile > 0)[:, None, None]
    color4 = jnp.where(nonempty, color4[:num_tiles], 0.0)
    final_t = jnp.where(nonempty, final_t[:num_tiles], 1.0)
    latch = jnp.where(nonempty, latch[:num_tiles], 0)
    res = (e_padded, chunk_tile, chunk_limit, pad_start, s_tile, range_start,
           row_offset, final_t, latch, inv_pos, offsets, counts,
           fields10.shape[1])
    return (color4, final_t), res


def _cff_bwd(tiles_x, num_tiles, interpret, res, cot):
    (e_padded, chunk_tile, chunk_limit, pad_start, s_tile, range_start,
     row_offset, final_t, latch, inv_pos, offsets, counts, n) = res
    g_color4, g_t = cot
    grads_padded = tile_composite_bwd(
        e_padded, chunk_tile, chunk_limit, row_offset, tiles_x, num_tiles,
        jnp.concatenate([final_t, jnp.ones((1, BLOCK, 1), final_t.dtype)]),
        jnp.concatenate([latch, jnp.zeros((1, BLOCK, 1), latch.dtype)]),
        jnp.concatenate([g_color4, jnp.zeros((1, BLOCK, 4), g_color4.dtype)]),
        jnp.concatenate([g_t, jnp.zeros((1, BLOCK, 1), g_t.dtype)]),
        interpret)
    # Emission-order positions in the padded buffer.
    j = inv_pos                                            # sorted position
    t_of = jnp.clip(jnp.take(s_tile, j), 0, num_tiles - 1)
    q = jnp.take(pad_start, t_of) + (j - jnp.take(range_start, t_of))
    valid = jnp.take(s_tile, j) < num_tiles
    g_em = jnp.where(valid[None, :],
                     jnp.take(grads_padded,
                              jnp.clip(q, 0, grads_padded.shape[1] - 1),
                              axis=1), 0.0)                # [10, K]
    prefix = jnp.concatenate(
        [jnp.zeros((g_em.shape[0], 1), g_em.dtype),
         jnp.cumsum(g_em, axis=1)], axis=1)
    dfields = (jnp.take(prefix, offsets + counts, axis=1)
               - jnp.take(prefix, offsets, axis=1))        # [10, N]
    return dfields, None, None, None, None, None, None, None, None


composite_from_fields.defvjp(_cff_fwd, _cff_bwd)


def pack_entries(means2d, conic, opacity, rgb, depth):
    """Pack sorted per-entry fields into the [10, K] kernel layout."""
    cols = [means2d[:, 0], means2d[:, 1], conic[:, 0], conic[:, 1],
            conic[:, 2], opacity, rgb[:, 0], rgb[:, 1], rgb[:, 2], depth]
    return jnp.stack(cols, axis=0)                         # [10, K]


def pack_fields(pre):
    """Per-Gaussian field matrix [10, N] in the kernel's sublane order."""
    return jnp.stack([
        pre.means2d[:, 0], pre.means2d[:, 1], pre.conic[:, 0],
        pre.conic[:, 1], pre.conic[:, 2], pre.opacity, pre.rgb[:, 0],
        pre.rgb[:, 1], pre.rgb[:, 2], pre.depths], axis=0)


@jax.custom_vjp
def gather_pack(fields10, s_gidx, inv_pos, offsets, counts):
    """e_packed[:, j] = fields10[:, s_gidx[j]] with a scatter-free VJP.

    XLA's gather transpose is a scatter-add, which TPUs execute serially
    (~12 ms for 1.2M updates on v5e — the dominant backward cost). The
    entries were EMITTED per Gaussian in one contiguous run (bin_and_sort's
    offsets/counts), so the transpose is instead: permute entry cotangents
    back to emission order (inv_pos, a pure gather), take a running prefix
    sum along entries, and difference it at each Gaussian's [offset,
    offset+count) boundaries. Gradients have mixed signs, so the f32 prefix
    stays O(sqrt(K)) and the differencing is well-conditioned.
    """
    return fields10[:, s_gidx]


def _gather_pack_fwd(fields10, s_gidx, inv_pos, offsets, counts):
    return fields10[:, s_gidx], (s_gidx, inv_pos, offsets, counts,
                                 fields10.shape[1])


def _gather_pack_bwd(res, g):
    s_gidx, inv_pos, offsets, counts, n = res
    g_em = jnp.take(g, inv_pos, axis=1)                    # emission order
    prefix = jnp.concatenate(
        [jnp.zeros((g.shape[0], 1), g.dtype), jnp.cumsum(g_em, axis=1)],
        axis=1)                                            # [10, K+1]
    d = (jnp.take(prefix, offsets + counts, axis=1)
         - jnp.take(prefix, offsets, axis=1))              # [10, N]
    return d, None, None, None, None


gather_pack.defvjp(_gather_pack_fwd, _gather_pack_bwd)


def inverse_permutation(s_pos):
    """inv[e] = sorted position of emission index e (one auxiliary sort)."""
    k = s_pos.shape[0]
    _, inv = jax.lax.sort((s_pos, jnp.arange(k, dtype=jnp.int32)),
                          num_keys=1)
    return inv


def unpack_grads(grads, k: int):
    """[16, K] gradient fields -> (d_means2d, d_conic, d_opacity, d_rgb,
    d_depth), each [k, ...] in sorted-entry order."""
    g = grads[:, :k]
    return (g[0:2].T, g[2:5].T, g[5], g[6:9].T, g[9])
