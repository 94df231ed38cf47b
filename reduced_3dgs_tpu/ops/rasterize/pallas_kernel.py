"""Pallas TPU fast path for the per-tile compositing stage.

TPU-native re-design of the reference renderCUDA tile kernels
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:461-582, backward.cu:437-595). The CUDA kernel assigns one
threadblock per image tile and loops over that tile's depth-sorted entries;
a literal translation (grid over tiles, data-dependent while loop per tile)
underutilises the TPU badly: grid steps serialise behind per-tile DMA
latency and loop-predicate scalar syncs. Instead this kernel STREAMS the
(tile, depth)-sorted entry buffer in fixed [16, CHUNK=256] blocks (fields
on sublanes, entries on lanes; a [K, 16] layout is uncompilable against
Mosaic's 128-lane tiling):

  * The grid is a flat, static walk over (chunk, tile) INCIDENCES: one grid
    step per maximal run of one tile's entries inside one chunk. Tile
    segments are NOT padded to chunk multiples — a chunk crossing a tile
    boundary is simply visited twice, with the step's [lo, hi) entry range
    masking the other tile's lanes. Step count = K/CHUNK + #nonempty-tile
    boundaries; the entry buffer is consumed compact and in place (the
    earlier pad-to-chunk layout cost two full [16, Kpad] gathers plus
    ~num_tiles*CHUNK wasted entries per frame).
  * Entry chunks are auto-pipelined VMEM blocks whose index map revisits
    the same block across a boundary (no re-fetch). The per-tile
    accumulator state (color4, transmittance, early-termination latch)
    lives in SCRATCH, carried across the steps of a tile, and each tile's
    OUTPUT block (index = the step's scalar-prefetched tile id) is written
    exactly once at the tile's last step. Accumulating directly into
    revisited output blocks instead serialises the pipeline behind the
    block DMAs (8x slower measured), and its reversed-grid flavor
    miscompiles — see tile_composite_bwd. No manual DMA, no while loops.
  * Early termination: once every pixel of a tile has latched
    (T below 1e-4, forward.cu:549-554), remaining steps of that tile are
    predicated off with `pl.when`.

In-kernel orientation is pixels-on-sublanes x entries-on-lanes
([BLOCK=256, CHUNK=256] intermediates): per-entry fields are [1, C] rows,
per-pixel state is [P, 1] columns, and the within-chunk transmittance scan
in log space is a lane-axis shift-add ladder (Mosaic has no cumsum
lowering).

The backward kernel walks the same step grid in reverse, reconstructing
each entry's incoming transmittance by dividing suffix products out of the
saved final_T (the T = T/(1-alpha) replay of backward.cu:541) and gating by
the saved per-pixel latch position (n_contrib, backward.cu:484-485). Each grid
step writes an exclusive per-step gradient block (boundary chunks are
summed outside the kernel) — the CUDA atomicAdds (backward.cu:561-592)
become deterministic block writes, and the final per-Gaussian reduction is
a segment-difference of a prefix sum outside the kernel (see
`composite_sorted`).

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

# Entries per grid-step block (lane axis). 256 measured best... pending a
# 512 A/B on hardware: fewer, fatter steps pipeline better but waste more
# lanes at tile boundaries. Env knob for on-chip A/B without edits.
import os as _os
CHUNK = int(_os.environ.get("R3DGS_CHUNK", "256"))
N_FIELDS = 10
BLOCK = config.BLOCK_SIZE           # 256 pixels per tile
BIG = 2 ** 30  # python int: jnp constants at module scope would be traced captures
# Within-chunk scan strategy: "mxu" computes the transmittance prefix as a
# log-space [P,C]@[C,C] triangular matmul (Precision.HIGHEST keeps f32
# accuracy on the MXU) — one matmul replaces the 8-level rotate ladder
# (24 VPU ops) in the forward and BOTH ladders (48 ops) in the backward.
# "ladder" keeps the shift-add ladder (exact linear-space products).
# Default "mxu": the r03 on-chip sweep measured mxu/align0 at 61.4 ms vs
# ladder/align1 (the old default) at 69.9 ms on the 200k bench scene —
# ~12% step win (SWEEP_r04.json re-measures and commits this).
SCAN_MODE = _os.environ.get("R3DGS_SCAN", "mxu")
# MXU pass count for the triangular-scan matmuls. The operands are an f32
# [P,C] block against a 0/1 matrix: the 0/1 side is EXACT in bf16, so a
# 3-pass f32x3 decomposition of the other side would already reproduce the
# f32 sum — but Mosaic has NO lowering for Precision.HIGH inside Pallas
# kernels (NotImplementedError at trace time on v5e; "high" briefly shipped
# as the default and broke every mxu-scan compile on chip). "tri3" instead
# decomposes the f32 operand into three bf16 terms MANUALLY and issues
# three bf16 matmuls — HIGH's arithmetic without the unsupported lowering.
# Default "default" (1-pass bf16): the r05 bench parity gate measured its
# scan error directly against the full-precision XLA path on chip
# (TRIDEFAULT_r05.json: img_max_abs_diff 0.0021 vs tri3's 0.0015, both an
# order of magnitude inside the 5e-3 gate; every grad_max_rel_diff
# <= 4e-4 vs the 1e-2 gate) at 52.1 ms/step vs tri3's 54.8. The r04
# "not production-safe" judgement was an assertion, not a measurement —
# the parity gate exists to answer exactly this (VERDICT r04 #5). "tri3"
# (f32-faithful 3-pass, 55.6 in SWEEP_r04) and "highest" remain for A/B.
TRI_MODE = _os.environ.get("R3DGS_TRI_PRECISION", "default")
if TRI_MODE == "high":          # docs/back-compat alias for the 3-pass mode
    TRI_MODE = "tri3"
_TRI_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "tri3": jax.lax.Precision.DEFAULT,      # precision handled manually
    "default": jax.lax.Precision.DEFAULT,
}
if TRI_MODE not in _TRI_PRECISIONS:
    raise ValueError(
        f"R3DGS_TRI_PRECISION={TRI_MODE!r}: valid values are "
        f"{sorted(_TRI_PRECISIONS)} (or 'high', an alias for 'tri3')")
TRI_PRECISION = _TRI_PRECISIONS[TRI_MODE]


def _tri_dot(x, tri, contract_tri_dim: int):
    """x [P,C] contracted with the 0/1 triangular matrix on the MXU.

    contract_tri_dim=1: exclusive-prefix orientation (tri[c, j], sum over
    j); 0: strict-suffix orientation. In "tri3" mode x is split into three
    bf16 terms (x = hi + mid + lo exactly in f32) and contracted term-wise
    in bf16 — the 0/1 side is exact in bf16, so the three f32-accumulated
    bf16 matmuls reproduce the f32 contraction (Precision.HIGH semantics,
    which Mosaic cannot lower natively) at half the MXU passes of HIGHEST."""
    dims = (((1,), (contract_tri_dim,)), ((), ()))
    if TRI_MODE != "tri3":
        return jax.lax.dot_general(x, tri, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=TRI_PRECISION)
    hi = x.astype(jnp.bfloat16)
    rem = x - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    tri_b = tri.astype(jnp.bfloat16)
    out = None
    for term in (hi, mid, lo):
        d = jax.lax.dot_general(term, tri_b, dims,
                                preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out
# Backward reduction strategy: "1" collapses the ten per-entry reductions
# (gx, gy, gA, gB, gC, dop + four color grads) into TWO small MXU matmuls —
# a [6,P]@[P,C] tile-relative pixel-moment contraction and a [4,P]@[P,C]
# color-grad contraction — eliminating ~8 full [P,C] VPU intermediates and
# ten cross-sublane reduction ladders per grid step (see _bwd_kernel).
#
# Measured SLOWER than the default ladders (61.4 vs 56.1 ms/step,
# SWEEP_r04.json), and the explanation is structural, not noise: the
# contractions are [few, 256] x [256, 256] matmuls at HIGHEST precision —
# 6 serial bf16 MXU passes over tiny operands, so launch latency and
# precision passes dominate, while the reductions they replace are single
# cross-sublane ladders the VPU overlaps with the (already serialized)
# triangular-scan matmuls. The backward's bottleneck is the per-step
# scan/replay dependency chain, not reduction op count — adding MXU work
# to a scan-bound pipeline cannot pay. Kept behind the flag for A/B.
BWD_MOMENTS = _os.environ.get("R3DGS_BWD_MOMENTS", "0") == "1"
# Forward early-exit flag maintenance: the per-step SMEM maxlatch refresh is
# a serial scalar chain between consecutive steps of a tile (each step's
# predicate waits on the previous step's full vector reduce). "0" skips the
# refresh — SEMANTICALLY IDENTICAL (contrib masks by latch position either
# way; the flag only skips provably-dead steps) but trades dead-step work
# for pipeline freedom. Scene-dependent: A/B on chip via the sweep.
EARLY_EXIT = _os.environ.get("R3DGS_EARLY_EXIT", "1") == "1"


def _tri_matrix():
    """tri[c, j] = 1.0 iff j < c (strict lower in the [c, j] orientation).

    Contracted against the lane axis it yields prefix/suffix sums on the
    MXU: dot(x, tri, contract x.1 with tri.1) = exclusive prefix;
    contract x.1 with tri.0 = strict suffix."""
    c = jnp.arange(CHUNK, dtype=jnp.int32)
    return (c[None, :] < c[:, None]).astype(jnp.float32)


def _cumsum_lanes(x, exclusive: bool = False):
    """Cumulative sum over the lane (entry) axis of a [P, CHUNK] block.

    Mosaic has no cumsum lowering for the tensor core; a log2(CHUNK)-step
    shift-add ladder of lane rotates is exact in f32 and stays on the VPU
    (a triangular MXU matmul would run in bf16 by default and lose
    compositing precision)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    s = 1
    while s < x.shape[1]:
        acc = acc + jnp.where(lane >= s, pltpu.roll(acc, s, 1), 0.0)
        s *= 2
    return acc - x if exclusive else acc


def _cumprod_lanes(x):
    """Inclusive cumulative product over the lane axis of a [P, CHUNK] block.

    Same rotate ladder as _cumsum_lanes with (*, 1) instead of (+, 0). The
    forward kernel uses this directly on (1 - abar) — products of factors
    <= 1 only lose to underflow, exactly where the early-termination latch
    has already killed the tile — so the log->ladder->exp round trip (two
    extra transcendentals per pixel-entry pair) is forward-only waste. The
    backward replay still runs in log space: it divides suffix products out
    of final_T, which must not underflow (backward.cu:541 analog)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    s = 1
    while s < x.shape[1]:
        acc = acc * jnp.where(lane >= s, pltpu.roll(acc, s, 1), 1.0)
        s *= 2
    return acc


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


def _alpha_gate(buf, px, py, gpos, lo, hi):
    """Common alpha/gate computation for one step. `gpos` [1, C] is each
    lane's global sorted position; only lanes in [lo, hi) belong to this
    step's tile. Returns (abar [P,C], gate, not_clamped, G, dx, dy,
    fields)."""
    x, y, A, B, C, op, r, g, b, depth = _chunk_fields(buf)
    valid = (gpos >= lo) & (gpos < hi)                       # [1,C]
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
# Step grid layout (shared by forward and backward)
# --------------------------------------------------------------------------

def step_layout(range_start, range_end, k: int, num_tiles: int,
                aligned: bool = False):
    """Flatten (chunk, tile) incidences over the compact sorted buffer.

    Grid step s processes the entries [step_lo[s], step_hi[s]) of chunk
    step_chunk[s], all belonging to tile step_tile[s] (num_tiles =
    sentinel/padding). Steps ascend in buffer position, so consecutive
    steps of one tile are adjacent (forward accumulator blocks) AND
    consecutive steps of one chunk are adjacent (backward gradient
    blocks). Static step count: k/CHUNK + num_tiles + 2 (each nonempty
    tile adds at most one boundary incidence; +1 sentinel segment covering
    [end-of-last-tile, k), +1 slack). Everything here is O(num_tiles)-sized
    vector work — no [K]-sized gathers.

    aligned=True (bin_and_sort align_chunk=CHUNK): every tile segment
    starts on a chunk boundary, so no chunk is shared by two tiles and the
    static grid shrinks to k/CHUNK + 2 (at bench scale: 5.2k -> 3.2k grid
    steps, of which ~2k were full-work boundary revisits).

    Requires k % CHUNK == 0.
    """
    from .tiled import fill_ids_from_offsets
    assert k % CHUNK == 0, k
    n_chunks = k // CHUNK
    seg_start = jnp.concatenate([range_start, range_end[-1:]])
    seg_end = jnp.concatenate(
        [range_end, jnp.full((1,), k, range_end.dtype)])
    cnt = seg_end - seg_start                                # [T+1]
    first_c = seg_start // CHUNK
    last_c = jnp.maximum(seg_end - 1, seg_start) // CHUNK
    n_inc = jnp.where(cnt > 0, last_c - first_c + 1, 0).astype(jnp.int32)
    inc_off = jnp.cumsum(n_inc) - n_inc
    total_steps = inc_off[-1] + n_inc[-1]

    S = k // CHUNK + 2 if aligned else k // CHUNK + num_tiles + 2
    seg = fill_ids_from_offsets(inc_off, n_inc, S)           # [S]
    si = jnp.arange(S, dtype=jnp.int32)
    chunk = first_c[seg].astype(jnp.int32) + (si - inc_off[seg])
    in_rng = si < total_steps
    step_chunk = jnp.where(in_rng, chunk, n_chunks - 1)
    step_tile = jnp.where(in_rng, jnp.minimum(seg, num_tiles), num_tiles)
    lo = jnp.maximum(seg_start[seg], chunk * CHUNK)
    hi = jnp.minimum(seg_end[seg], (chunk + 1) * CHUNK)
    step_lo = jnp.where(in_rng, lo, 0).astype(jnp.int32)
    step_hi = jnp.where(in_rng, hi, 0).astype(jnp.int32)
    return step_chunk, step_tile, step_lo, step_hi


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(step_chunk, step_tile, step_lo, step_hi, row_off,  # prefetch
                e_ref, tri_ref,                         # [16|C, CHUNK] blocks
                color_ref, t_ref, latch_ref,            # [BLOCK, *] tile state
                *rest,                                  # [stats_ref,] scratch
                tiles_x: int, num_tiles: int, with_stats: bool = False):
    if with_stats:
        stats_ref, color_acc, t_run, latch_acc, maxlatch = rest
    else:
        color_acc, t_run, latch_acc, maxlatch = rest
    s = pl.program_id(0)
    n = pl.num_programs(0)
    t = step_tile[s]
    sentinel = t >= num_tiles
    first = jnp.logical_or(s == 0, step_tile[jnp.maximum(s - 1, 0)] != t)
    last = jnp.logical_or(s == n - 1,
                          step_tile[jnp.minimum(s + 1, n - 1)] != t)

    @pl.when(first & jnp.logical_not(sentinel))
    def _():
        color_acc[:, :] = jnp.zeros((BLOCK, 4), jnp.float32)
        t_run[:, :] = jnp.ones((BLOCK, 1), jnp.float32)
        latch_acc[:, :] = jnp.full((BLOCK, 1), BIG, jnp.int32)
        maxlatch[0, 0] = BIG

    # Early termination: skip once every pixel of the tile has latched
    # (forward.cu:549-554). The flag lives in SMEM so the predicate does not
    # synchronise on vector state.
    live = jnp.logical_and(jnp.logical_not(sentinel), maxlatch[0, 0] >= BIG)

    if with_stats:
        @pl.when(jnp.logical_not(live))
        def _():
            stats_ref[0] = jnp.zeros((8, CHUNK), jnp.float32)

    @pl.when(live)
    def _():
        latch = latch_acc[:, :]
        px, py = _pixel_cols(t, tiles_x, row_off[0])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        gpos = step_chunk[s] * CHUNK + lane                 # [1,C] sorted pos
        abar, gate, _, _, _, _, f = _alpha_gate(
            e_ref[:, :], px, py, gpos, step_lo[s], step_hi[s])
        _, _, _, _, op, r, g, b, depth = f[1:]

        T = t_run[:, :]
        one_m = 1.0 - abar                                   # [P,C]
        if SCAN_MODE == "mxu":
            # Log-space prefix on the MXU: one [P,C]@[C,C] triangular
            # matmul (HIGHEST = f32-accurate) replaces the 8-level rotate
            # ladder. Also the SAME arithmetic the backward replay uses
            # (exp of log1p sums), so the saved final_T seeds it without
            # representation mismatch.
            l1m = jnp.log1p(-abar)                           # 0 where gated out
            lex = _tri_dot(l1m, tri_ref[:, :], 1)            # excl prefix
            T_in = T * jnp.exp(lex)
            trigger = gate & (T_in * one_m < config.T_EPS)
        else:
            cum = _cumprod_lanes(one_m)                      # inclusive
            lane_pos = jax.lax.broadcasted_iota(jnp.int32, cum.shape, 1)
            exc = jnp.where(lane_pos >= 1, pltpu.roll(cum, 1, 1), 1.0)
            T_in = T * exc                                   # [P,C]
            trigger = gate & (T * cum < config.T_EPS)        # = T_in*(1-abar)
        latch_new = jnp.minimum(
            latch, jnp.min(jnp.where(trigger, gpos, BIG), axis=1,
                           keepdims=True))                   # [P,1]
        contrib = gate & (gpos < latch_new)
        w = jnp.where(contrib, abar * T_in, 0.0)
        # One [P,C]@[C,5] MXU matmul replaces four lane reductions plus the
        # transmittance update: columns are (r,g,b,depth,1), so column 4 is
        # sum(w), and the telescoping identity
        #   sum_k a_k T_in_k = T * (1 - prod_contrib(1-a_k))
        # gives the chunk's transmittance product as T - sum(w) — the
        # second (masked) cumprod ladder previously computed it directly.
        # HIGHEST precision keeps the accumulation in f32 on the MXU.
        rgbd1 = jnp.concatenate(
            [r, g, b, depth, jnp.ones_like(r)], axis=0)      # [5,C]
        sums = jax.lax.dot_general(
            w, rgbd1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [P,5]
        color_acc[:, :] = color_acc[:, :] + sums[:, :4]
        if SCAN_MODE == "mxu":
            # Multiplicative T update (contrib-masked log sum): immune to
            # the T - sum(w) cancellation when a chunk absorbs nearly all
            # transmittance (ADVICE r02), and exactly the backward's
            # total-log replay quantity.
            tot_l = jnp.sum(jnp.where(contrib, l1m, 0.0), axis=1,
                            keepdims=True)
            t_run[:, :] = T * jnp.exp(tot_l)
        else:
            t_run[:, :] = jnp.maximum(T - sums[:, 4:5], 0.0)
        latch_acc[:, :] = latch_new

        if with_stats:
            # Per-entry pixel-aggregated counters (importance counting pass,
            # N2 forward.cu:473-476, and the SH-culling transmittance
            # accumulators, forward.cu:560-564), matching common.ChunkStats.
            cnt = jnp.sum(contrib.astype(jnp.float32), axis=0, keepdims=True)
            stats_ref[0] = jnp.concatenate([
                cnt, cnt * op, jnp.sum(w, axis=0, keepdims=True),
                jnp.sum(jnp.where(contrib, T_in, 0.0), axis=0, keepdims=True),
                jnp.zeros((4, CHUNK), jnp.float32)], axis=0)  # [8, C]

        # Refresh the early-exit flag only when the tile has further steps:
        # a per-step SMEM write makes every step's predicate wait on the
        # previous step's full vector reduce (a serial scalar chain that
        # defeats pipelining); most tiles span 1-3 chunks and never need
        # the flag at all. (EARLY_EXIT=0 drops the refresh entirely —
        # identical output, no dead-step skipping, no scalar chain.)
        if EARLY_EXIT:
            @pl.when(jnp.logical_not(last))
            def _():
                maxlatch[0, 0] = jnp.max(latch_new)

    # One output write per tile, at its last step: the per-step state lives
    # entirely in scratch. (Accumulating directly into revisited output
    # blocks serialises the pipeline behind the block DMAs — observed 8x
    # slower — and the reversed-grid flavor of that pattern miscompiles;
    # see tile_composite_bwd.)
    @pl.when(last & jnp.logical_not(sentinel))
    def _():
        color_ref[0] = color_acc[:, :]
        t_ref[0] = t_run[:, :]
        latch_ref[0] = latch_acc[:, :]


def tile_composite_fwd(e_packed, step_chunk, step_tile, step_lo, step_hi,
                       row_offset, tiles_x: int, num_tiles: int,
                       interpret: bool = False, with_stats: bool = False):
    """Run the forward compositing kernel over the incidence-step grid.

    e_packed: [16, K] compact (tile, depth)-sorted entry fields, K % CHUNK
    == 0. Returns (color4 [T+1,256,4], final_T [T+1,256,1], latch
    [T+1,256,1][, stats [8, K]]); row num_tiles is the sentinel bucket,
    rows of empty tiles are garbage — callers mask with the tile counts.
    Stats rows 0-3 per sorted entry: contributing-pixel count, count *
    opacity, sum of blend weights, sum of incoming transmittance (the N2
    counting pass + SH-culling accumulators); written as exclusive
    per-step blocks and combined by chunk like the backward gradients."""
    k = e_packed.shape[1]
    n_steps = step_chunk.shape[0]
    out_specs = [
        pl.BlockSpec((1, BLOCK, 4),
                     lambda s, sc, st, sl, sh, ro: (st[s], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK, 1),
                     lambda s, sc, st, sl, sh, ro: (st[s], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK, 1),
                     lambda s, sc, st, sl, sh, ro: (st[s], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_tiles + 1, BLOCK, 4), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles + 1, BLOCK, 1), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles + 1, BLOCK, 1), jnp.int32),
    ]
    if with_stats:
        out_specs.append(
            pl.BlockSpec((1, 8, CHUNK),
                         lambda s, sc, st, sl, sh, ro: (s, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_steps, 8, CHUNK), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((N_FIELDS, CHUNK),
                               lambda s, sc, st, sl, sh, ro: (0, sc[s]),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK, CHUNK),
                               lambda s, sc, st, sl, sh, ro: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, 4), jnp.float32),
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.VMEM((BLOCK, 1), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, num_tiles=num_tiles,
                          with_stats=with_stats),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(step_chunk, step_tile, step_lo, step_hi,
      jnp.asarray([row_offset], jnp.int32), e_packed, _tri_matrix())
    if not with_stats:
        return out
    color4, final_t, latch, s_steps = out
    s_chunks = jax.ops.segment_sum(s_steps, step_chunk,
                                   num_segments=k // CHUNK)
    stats = jnp.moveaxis(s_chunks, 0, 1).reshape(8, k)
    return color4, final_t, latch, stats


# --------------------------------------------------------------------------
# Backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(step_chunk, step_tile, step_lo, step_hi, row_off,  # prefetch
                e_ref, tri_ref, final_t, latch_in, g_color, g_t,  # blocks
                grads_ref,                              # [16, CHUNK] block
                t_run, s_acc, maxlatch,                 # scratch
                *, tiles_x: int, num_tiles: int):
    n = pl.num_programs(0)
    rs = n - 1 - pl.program_id(0)                        # step, reversed
    t = step_tile[rs]
    c = step_chunk[rs]
    nxt = jnp.minimum(rs + 1, n - 1)
    sentinel = t >= num_tiles
    first_tile = jnp.logical_or(rs == n - 1, step_tile[nxt] != t)

    @pl.when(first_tile & jnp.logical_not(sentinel))
    def _():
        t_run[:, :] = final_t[0]
        s_acc[:, :] = final_t[0] * g_t[0]
        maxlatch[0, 0] = jnp.max(latch_in[0])

    # Steps entirely at-or-after every pixel's latch contribute nothing
    # (and must not touch the T/S replay state).
    live = jnp.logical_and(jnp.logical_not(sentinel),
                           step_lo[rs] < maxlatch[0, 0])

    @pl.when(jnp.logical_not(live))
    def _():
        grads_ref[0] = jnp.zeros((N_FIELDS, CHUNK), jnp.float32)

    @pl.when(live)
    def _():
        px, py = _pixel_cols(t, tiles_x, row_off[0])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        gpos = c * CHUNK + lane
        abar, gate, not_clamped, G, dx, dy, f = _alpha_gate(
            e_ref[:, :], px, py, gpos, step_lo[rs], step_hi[rs])
        x, y, A, B, C, op, r, g, b, depth = f

        latch = latch_in[0]                               # [P,1]
        g4 = g_color[0]                                   # [P,4]
        T_end = t_run[:, :]                               # [P,1]
        S = s_acc[:, :]                                   # [P,1]

        contrib = gate & (gpos < latch)
        log1ma = jnp.where(contrib, jnp.log(1.0 - abar), 0.0)
        # Replay: T_in_k = T_end / prod_{j>=k}(1-abar_j)
        #               = T_end * exp(prefix_exclusive_k - total)
        tot_log = jnp.sum(log1ma, axis=1, keepdims=True)    # [P,1]
        if SCAN_MODE == "mxu":
            prefix_ex = _tri_dot(log1ma, tri_ref[:, :], 1)
        else:
            prefix_ex = _cumsum_lanes(log1ma, exclusive=True)
        T_in = T_end * jnp.exp(prefix_ex - tot_log)         # T before entry
        w = jnp.where(contrib, abar * T_in, 0.0)

        # c . g per (pixel, entry)
        cdotg = (r * g4[:, 0:1] + g * g4[:, 1:2] + b * g4[:, 2:3]
                 + depth * g4[:, 3:4])                      # [P,C]
        if BWD_MOMENTS:
            # per-entry c4 gradients as ONE [4,P]@[P,C] MXU contraction
            # (g4 is f32; HIGH = f32x3 passes reproduces the f32 sum).
            gcol = jax.lax.dot_general(
                g4, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)         # [4,C]
            g_r, g_g, g_b, g_d = (gcol[0:1], gcol[1:2], gcol[2:3],
                                  gcol[3:4])
        else:
            # per-entry c4 gradients: [1,C] each
            g_r = jnp.sum(w * g4[:, 0:1], axis=0, keepdims=True)
            g_g = jnp.sum(w * g4[:, 1:2], axis=0, keepdims=True)
            g_b = jnp.sum(w * g4[:, 2:3], axis=0, keepdims=True)
            g_d = jnp.sum(w * g4[:, 3:4], axis=0, keepdims=True)

        # dL/dabar_k = contrib * [ cdotg*T_in - (S_after + T_final*gT)/(1-abar) ]
        # suffix sums of w*cdotg EXCLUSIVE of k, then add the carry S.
        wc = w * cdotg
        tot_wc = jnp.sum(wc, axis=1, keepdims=True)
        if SCAN_MODE == "mxu":
            # Strict suffix sum = same triangular matrix contracted on its
            # OTHER axis (tri[j, c] = c < j).
            S_after = _tri_dot(wc, tri_ref[:, :], 0) + S
        else:
            prefix_incl_wc = _cumsum_lanes(wc)
            S_after = (tot_wc - prefix_incl_wc) + S          # [P,C]
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
        dpower = dG * G_gated
        if BWD_MOMENTS:
            # All position/conic reductions from ONE [6,P]@[P,C] moment
            # matmul: rows are sums of dpower * {1, u, v, u^2, v^2, u*v}
            # over TILE-RELATIVE pixel coords u = sub % 16, v = sub // 16.
            # Tile-relative keeps the polynomial expansion below
            # cancellation-free: dx = x' - u with u in [0,16), so expanded
            # terms stay the magnitude of dx itself (expanding in absolute
            # pixel coords would cancel x^2 ~ 1e6 down to dx^2 ~ 1e2 and
            # amplify f32 rounding ~1e4x). The moment matrix holds ints
            # <= 225 — exact in bf16, so HIGH precision is exact too.
            lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
            u = (lane_p % config.BLOCK_X).astype(jnp.float32)   # [1,P]
            v = (lane_p // config.BLOCK_X).astype(jnp.float32)
            Mt = jnp.concatenate(
                [jnp.ones_like(u), u, v, u * u, v * v, u * v], axis=0)
            mom = jax.lax.dot_general(
                Mt, dpower, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)         # [6,C]
            m1, mu, mv = mom[0:1], mom[1:2], mom[2:3]
            muu, mvv, muv = mom[3:4], mom[4:5], mom[5:6]
            tx = ((t % tiles_x) * config.BLOCK_X).astype(jnp.float32)
            ty = ((t // tiles_x + row_off[0])
                  * config.BLOCK_Y).astype(jnp.float32)
            xr = x - tx                                      # [1,C]
            yr = y - ty
            sdx = xr * m1 - mu                   # sum_p dpower * dx
            sdy = yr * m1 - mv
            sdxx = xr * xr * m1 - 2.0 * xr * mu + muu
            sdyy = yr * yr * m1 - 2.0 * yr * mv + mvv
            sdxy = xr * yr * m1 - xr * mv - yr * mu + muv
            gx = -A * sdx - B * sdy
            gy = -C * sdy - B * sdx
            gA = -0.5 * sdxx
            gB = -sdxy
            gC = -0.5 * sdyy
            # m1 = op * sum_p(dalpha * G_gated) exactly (op constant per
            # entry), so dop = m1 / op; guard op == 0 (sigmoid underflow:
            # gate kills those pairs, making the true dop 0).
            op_safe = jnp.where(op > 0.0, op, 1.0)
            dop = jnp.where(op > 0.0, m1 / op_safe, 0.0)
        else:
            dop = jnp.sum(G_gated * dalpha, axis=0, keepdims=True)  # [1,C]
            ddx = dpower * (-A * dx - B * dy)
            ddy = dpower * (-C * dy - B * dx)
            gx = jnp.sum(ddx, axis=0, keepdims=True)
            gy = jnp.sum(ddy, axis=0, keepdims=True)
            gA = jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
            gB = jnp.sum(dpower * (-dx * dy), axis=0, keepdims=True)
            gC = jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
        grads_ref[0] = jnp.concatenate(
            [gx, gy, gA, gB, gC, dop, g_r, g_g, g_b, g_d], axis=0)  # [10,C]

        t_run[:, :] = T_end * jnp.exp(-tot_log)
        s_acc[:, :] = S + tot_wc


def tile_composite_bwd(e_packed, step_chunk, step_tile, step_lo, step_hi,
                       row_offset, tiles_x: int, num_tiles: int,
                       final_t, latch, g_color4, g_t,
                       interpret: bool = False):
    """Backward kernel over the reversed step grid. Returns per-entry
    gradients in compact sorted order ([16, K]; sublanes 0-9 =
    d(x,y,A,B,C,op,r,g,b,depth)); sentinel entries come out zero.

    Each grid step writes an EXCLUSIVE [10, CHUNK] gradient block; the <=2
    steps sharing a boundary chunk are then combined by a segment-sum
    outside the kernel. (Accumulating in place into a revisited output
    block — mirroring the forward's tile-state idiom but over the REVERSED
    grid — miscompiled in large fused programs on v5e: a handful of entries
    came out non-finite, which the downstream prefix-sum reduction then
    amplified to every Gaussian.)"""
    k = e_packed.shape[1]
    n_steps = step_chunk.shape[0]
    rev = n_steps - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((N_FIELDS, CHUNK),
                         lambda s, sc, st, sl, sh, ro: (0, sc[rev - s]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, CHUNK),
                         lambda s, sc, st, sl, sh, ro: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1),
                         lambda s, sc, st, sl, sh, ro: (st[rev - s], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1),
                         lambda s, sc, st, sl, sh, ro: (st[rev - s], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 4),
                         lambda s, sc, st, sl, sh, ro: (st[rev - s], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK, 1),
                         lambda s, sc, st, sl, sh, ro: (st[rev - s], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_FIELDS, CHUNK),
                               lambda s, sc, st, sl, sh, ro: (rev - s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
    )
    g_steps = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, num_tiles=num_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_steps, N_FIELDS, CHUNK),
                                       jnp.float32),
        interpret=interpret,
    )(step_chunk, step_tile, step_lo, step_hi,
      jnp.asarray([row_offset], jnp.int32),
      e_packed, _tri_matrix(), final_t, latch, g_color4, g_t)
    g_chunks = jax.ops.segment_sum(g_steps, step_chunk,
                                   num_segments=k // CHUNK)
    return jnp.moveaxis(g_chunks, 0, 1).reshape(N_FIELDS, k)


# --------------------------------------------------------------------------
# custom_vjp wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def composite_sorted(fields10, s_gidx, inv_pos, offsets, counts,
                     s_tile, range_start, range_end, row_offset,
                     tiles_x: int, num_tiles: int,
                     interpret: bool = False, aligned: bool = False):
    """Differentiable per-tile compositing straight from per-Gaussian
    fields; the per-entry gather and its transpose are part of the custom
    VJP so no scatter ever materialises.

    Forward: one [10, K] gather fields10[:, s_gidx] builds the compact
    sorted entry buffer consumed by the kernel in place. Backward: the
    kernel emits per-entry gradients in sorted order; they are gathered
    once into EMISSION order (where each Gaussian's entries are one
    contiguous run) and reduced by differencing a running prefix sum at the
    [offset, offset+count) boundaries (XLA's gather transpose is a serial
    scatter-add on TPU, ~12 ms for 1.2M updates; this path is ~4x cheaper
    end to end). Gradients have mixed signs, so the f32 prefix stays
    O(sqrt(K)) and the differencing is well-conditioned.

    Args: fields10 [10, N] (pack_fields); s_gidx/inv_pos/offsets/counts/
    s_tile from bin_and_sort (K % 256 == 0); tile ranges [T].
    Returns (color4 [T,256,4], final_T [T,256,1]); empty tiles come out as
    color 0 / T 1.
    """
    out, _ = _cs_fwd(fields10, s_gidx, inv_pos, offsets, counts, s_tile,
                     range_start, range_end, row_offset, tiles_x, num_tiles,
                     interpret, aligned)
    return out


def _cs_fwd(fields10, s_gidx, inv_pos, offsets, counts, s_tile,
            range_start, range_end, row_offset, tiles_x, num_tiles,
            interpret, aligned):
    k = s_gidx.shape[0]
    steps = step_layout(range_start, range_end, k, num_tiles, aligned)
    # Sentinel entries hold real (finite) Gaussian fields; the kernel masks
    # them by the step's [lo, hi) range, so no zeroing pass is needed.
    # mode="clip": alignment-padding entries carry ids >= N (bin_and_sort
    # align_chunk) and jnp.take's default fill mode would plant NaNs that
    # poison the kernel's masked sums (0 * NaN).
    e_packed = jnp.take(fields10, s_gidx, axis=1, mode="clip")  # [10, K]
    color4, final_t, latch = tile_composite_fwd(
        e_packed, *steps, row_offset, tiles_x, num_tiles, interpret)
    nonempty = (range_end - range_start > 0)[:, None, None]
    color4 = jnp.where(nonempty, color4[:num_tiles], 0.0)
    final_t = jnp.where(nonempty, final_t[:num_tiles], 1.0)
    latch = jnp.where(nonempty, latch[:num_tiles], 0)
    res = (e_packed, steps, row_offset, final_t, latch, inv_pos, offsets,
           counts)
    return (color4, final_t), res


def segment_reduce_emission(vals, inv_pos, offsets, counts):
    """[R, K] sorted-entry values -> [R, N] per-Gaussian sums, scatter-free.

    Entries were EMITTED per Gaussian in one contiguous run (bin_and_sort's
    offsets/counts), so the per-Gaussian reduction is: permute the sorted
    values back to emission order (inv_pos, a pure gather), take a running
    prefix sum along entries, and difference it at each Gaussian's
    [offset, offset+count) boundaries. XLA's scatter-add alternative runs
    serially on TPU (~12 ms per 1.2M updates)."""
    g_em = jnp.take(vals, inv_pos, axis=1)                  # emission order
    prefix = jnp.concatenate(
        [jnp.zeros((vals.shape[0], 1), vals.dtype),
         jnp.cumsum(g_em, axis=1)], axis=1)                 # [R, K+1]
    hi = jnp.minimum(offsets + counts, g_em.shape[1])
    lo = jnp.minimum(offsets, g_em.shape[1])
    return jnp.take(prefix, hi, axis=1) - jnp.take(prefix, lo, axis=1)


def _cs_bwd(tiles_x, num_tiles, interpret, aligned, res, cot):
    (e_packed, steps, row_offset, final_t, latch, inv_pos, offsets,
     counts) = res
    g_color4, g_t = cot
    grads = tile_composite_bwd(
        e_packed, *steps, row_offset, tiles_x, num_tiles,
        jnp.concatenate([final_t, jnp.ones((1, BLOCK, 1), final_t.dtype)]),
        jnp.concatenate([latch, jnp.zeros((1, BLOCK, 1), latch.dtype)]),
        jnp.concatenate([g_color4, jnp.zeros((1, BLOCK, 4), g_color4.dtype)]),
        jnp.concatenate([g_t, jnp.zeros((1, BLOCK, 1), g_t.dtype)]),
        interpret)                                          # [10, K] sorted
    dfields = segment_reduce_emission(grads, inv_pos, offsets, counts)
    return dfields, None, None, None, None, None, None, None, None


composite_sorted.defvjp(_cs_fwd, _cs_bwd)


def pack_fields(pre):
    """Per-Gaussian field matrix [10, N] in the kernel's sublane order."""
    return jnp.stack([
        pre.means2d[:, 0], pre.means2d[:, 1], pre.conic[:, 0],
        pre.conic[:, 1], pre.conic[:, 2], pre.opacity, pre.rgb[:, 0],
        pre.rgb[:, 1], pre.rgb[:, 2], pre.depths], axis=0)


def inverse_permutation(s_pos):
    """inv[e] = sorted position of emission index e (one auxiliary sort)."""
    k = s_pos.shape[0]
    _, inv = jax.lax.sort((s_pos, jnp.arange(k, dtype=jnp.int32)),
                          num_keys=1)
    return inv
