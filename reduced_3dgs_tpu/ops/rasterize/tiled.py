"""Production tiled renderer: static-shape binning + sort + segmented compositing.

TPU-native re-design of the reference host pipeline
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/rasterizer_impl.cu:359-504):

  CUDA                                   here (single fused XLA program)
  ----------------------------------     --------------------------------------
  CUB InclusiveSum(tiles_touched)        jnp.cumsum
  D2H copy of num_rendered (sync!)       static key-buffer K + overflow flag
  duplicateWithKeys 64-bit [tile|depth]  jnp.repeat(total_repeat_length=K) +
                                         per-entry ordinal -> tile coordinates
  CUB RadixSort of packed uint64 keys    jax.lax.sort((tile, depth, id), 2 keys)
                                         (two 32-bit keys, no uint64 needed)
  identifyTileRanges                     searchsorted per tile
  renderCUDA sequential per-pixel loop   segmented log-space scan over the
                                         sorted entry buffer (see below)

Compositing without any sequential loop: for sorted entry k with gated alpha
abar (see common.py for the gating/early-termination semantics), the incoming
transmittance at its pixel is

    T_in[k] = exp( Lex[k] ),   Lex = segmented exclusive cumsum of
                                     log(1 - abar) over the entry's tile,

which is exact because 1 - abar >= 0.01 (the 0.99 alpha clamp) keeps the logs
finite. The early-termination latch ("first entry whose test_T drops below
1e-4 kills all later entries in the tile", forward.cu:549-554) becomes a
segmented cumulative count of triggers. Per-pixel colors are segment-sums of
w = abar * T_in; per-Gaussian gradients come out of autodiff as deterministic
scatter-adds (replacing the reference backward's atomicAdds,
backward.cu:561-592); the replay division T/(1-alpha) of backward.cu:541 is
exactly the autodiff of the log-space cumsum.

There is no dynamic `num_rendered`: the key buffer size K is static. If the
true number of (tile, Gaussian) pairs exceeds K, entries are dropped from the
end of the emission order, and the returned `overflow` flag tells the caller
to re-dispatch with a larger buffer (mirrors the reference's lazy buffer
resize, rasterizer_impl.cu:163-202).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ... import config
from . import common
from .common import RenderSettings


def max_key_buffer(n: int, tiles_x: int, tiles_y: int) -> int:
    """Hard upper bound on occupied entry slots for n Gaussians.

    Without alignment this is n * num_tiles (every Gaussian in every
    tile); segment alignment (ALIGN_SEGMENTS) can add up to one CHUNK of
    padding per nonempty tile on top."""
    cap = max(n, 1) * tiles_x * tiles_y
    if config.ALIGN_SEGMENTS:
        # Padding bound: at most one CHUNK per NONEMPTY tile, and nonempty
        # tiles <= num_tiles unconditionally (a former 2n bound was wrong:
        # one huge Gaussian can touch every tile, ADVICE r03 — with tiles >
        # 2n the cap was unsatisfiable and the renderer stayed in permanent
        # overflow).
        from .pallas_kernel import CHUNK
        cap += tiles_x * tiles_y * CHUNK
    return cap


def default_key_buffer_size(n: int, tiles_x: int, tiles_y: int) -> int:
    """Heuristic static key-buffer size (callers may override/regrow)."""
    base = int(min(max(6 * n, 2048), max(n, 1) * tiles_x * tiles_y))
    if config.ALIGN_SEGMENTS:
        # Segment alignment (Pallas path) pads every nonempty tile to a
        # CHUNK multiple; allow for it up front so small scenes don't start
        # in permanent overflow. The adaptive trainer resize tracks the
        # padded slot count afterwards either way.
        from .pallas_kernel import CHUNK
        base += min(tiles_x * tiles_y, 2 * max(n, 1)) * CHUNK
    return base


def fill_ids_from_offsets(offsets, counts, K: int):
    """ids[pos] = i for pos in [offsets[i], offsets[i] + counts[i]).

    Static-shape replacement for jnp.repeat(arange(N), counts,
    total_repeat_length=K): jnp.repeat lowers to a searchsorted, which on
    TPU becomes a sequential while loop; a boundary scatter + running max is
    pure vector work."""
    n = offsets.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    seed = jnp.zeros((K,), jnp.int32).at[
        jnp.where(counts > 0, offsets, K)
    ].max(ids, mode="drop")
    return jax.lax.associative_scan(jnp.maximum, seed)


def tile_counts_from_rects(rect_min, rect_max, tiles_touched,
                           tiles_x: int, tiles_y: int, tile_row_offset):
    """Exact per-tile entry counts [Ty*Tx], scatter-free.

    Counts come from one MXU matmul of 0/1 interval indicators
    (count[ty, tx] = sum_g in-y(g, ty) * in-x(g, tx)) — exact, since bf16
    holds 0/1 exactly and the MXU accumulates in f32. Replaces a [K]-sized
    scatter-min (~12 ms at 1M entries on v5e; this is <1 ms)."""
    band_rmin_y = jnp.clip(rect_min[:, 1] - tile_row_offset, 0, tiles_y)
    band_rmax_y = jnp.clip(rect_max[:, 1] - tile_row_offset, 0, tiles_y)
    gate = tiles_touched > 0
    ty = jnp.arange(tiles_y, dtype=jnp.int32)
    tx = jnp.arange(tiles_x, dtype=jnp.int32)
    in_y = ((ty[:, None] >= band_rmin_y[None, :])
            & (ty[:, None] < band_rmax_y[None, :])
            & gate[None, :]).astype(jnp.bfloat16)          # [Ty, N]
    in_x = ((tx[:, None] >= rect_min[None, :, 0])
            & (tx[:, None] < rect_max[None, :, 0])).astype(jnp.bfloat16)
    cnt = jax.lax.dot_general(in_y, in_x,
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return cnt.reshape(-1).astype(jnp.int32)               # [Ty*Tx]


def aligned_tile_layout(cnt, align_chunk: int):
    """Chunk-aligned per-tile segment layout from exact tile counts.

    Each nonempty tile's sorted segment is padded up to a multiple of
    `align_chunk` so every Pallas grid step covers exactly one tile
    (pallas_kernel.step_layout emits no boundary incidences). Returns
    (padded_start [T], pad [T], slots) where slots = total occupied entry
    slots including padding."""
    pcnt = jnp.where(cnt > 0,
                     -(-cnt // align_chunk) * align_chunk, 0)
    pad = pcnt - cnt
    padded_start = jnp.cumsum(pcnt) - pcnt
    return padded_start.astype(jnp.int32), pad.astype(jnp.int32), (
        padded_start[-1] + pcnt[-1]).astype(jnp.int32)


def tile_ranges_from_rects(rect_min, rect_max, tiles_touched,
                           tiles_x: int, tiles_y: int, tile_row_offset,
                           K: int, align_chunk: int = 0):
    """Per-tile [start, end) ranges in the sorted entry buffer, scatter-free.

    The sorted buffer is grouped by tile, so range_start is the exclusive
    cumsum of per-tile entry counts (padded counts when `align_chunk` > 0
    — see aligned_tile_layout; the end still excludes the padding).

    Under overflow (total > K) the clip to K only approximates the
    truncated buffer's grouping; overflow frames are transient (the
    trainer regrows the buffer at the next drain) and foreign entries are
    alpha-gated out, so the partial render degrades gracefully."""
    cnt = tile_counts_from_rects(rect_min, rect_max, tiles_touched,
                                 tiles_x, tiles_y, tile_row_offset)
    if align_chunk:
        start, _, _ = aligned_tile_layout(cnt, align_chunk)
        return (jnp.minimum(start, K).astype(jnp.int32),
                jnp.minimum(start + cnt, K).astype(jnp.int32))
    cum = jnp.cumsum(cnt)
    return (jnp.minimum(cum - cnt, K).astype(jnp.int32),
            jnp.minimum(cum, K).astype(jnp.int32))


def tile_ranges(s_tile, K: int, num_tiles: int):
    """Per-tile [start, end) ranges in the sorted entry buffer.

    Search-free identifyTileRanges (rasterizer_impl.cu:124-146): scatter
    each segment's first position, then backfill empty tiles with the next
    segment's start via a reverse running min."""
    pos = jnp.arange(K, dtype=jnp.int32)
    firsts = jnp.full((num_tiles + 2,), K, jnp.int32).at[s_tile].min(pos)
    firsts = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(firsts)))
    return firsts[:num_tiles], firsts[1:num_tiles + 1]


def bin_and_sort(rect_min, rect_max, tiles_touched, depths, *,
                 tiles_x: int, tiles_y: int, tile_row_offset, K: int,
                 align_chunk: int = 0):
    """Static-shape duplicateWithKeys + radix sort + tile-range extraction.

    Shared by the 3DGS and 2DGS tiled renderers. Returns a dict with the
    (tile, depth)-sorted entry buffer:
      s_gidx [K] source Gaussian index, s_tile [K] tile id (num_tiles =
      sentinel), s_valid [K], seg_start_pos [K] (index where each entry's
      tile segment starts), seg_ids [K], pos [K], overflow (bool), total.

    align_chunk > 0 (the Pallas path): each nonempty tile's sorted segment
    is padded to a multiple of align_chunk by emitting one extra run of
    `pad[t]` dummy entries per tile (ids N+t, depth +inf so they sort to
    the segment's tail). Aligned segments make every Pallas grid step cover
    exactly one tile — no boundary incidences, no sentinel walk (the step
    grid shrinks ~40% at bench scale). The dict then also carries exact
    range_start/range_end [T] and total_slots (occupied entries INCLUDING
    padding — the quantity the static buffer must hold, reported as
    num_rendered so the trainer's adaptive buffer sizing tracks it);
    overflow likewise gates on total_slots.
    """
    N = rect_min.shape[0]
    num_tiles = tiles_x * tiles_y
    band_rmin_y = jnp.clip(rect_min[:, 1] - tile_row_offset, 0, tiles_y)
    band_rmax_y = jnp.clip(rect_max[:, 1] - tile_row_offset, 0, tiles_y)
    rect_w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    band_h_tiles = jnp.maximum(band_rmax_y - band_rmin_y, 0)
    counts = jnp.where(tiles_touched > 0,
                       (rect_max[:, 0] - rect_min[:, 0]) * band_h_tiles,
                       0).astype(jnp.int32)               # [N]
    offsets = jnp.cumsum(counts) - counts                 # exclusive
    total = offsets[-1] + counts[-1]

    range_start = range_end = None
    if align_chunk:
        tile_cnt = tile_counts_from_rects(
            rect_min, rect_max, tiles_touched, tiles_x, tiles_y,
            tile_row_offset)                               # [T]
        padded_start, pad, total_slots = aligned_tile_layout(
            tile_cnt, align_chunk)
        range_start = jnp.minimum(padded_start, K).astype(jnp.int32)
        range_end = jnp.minimum(padded_start + tile_cnt, K).astype(jnp.int32)
        pad_off = total + (jnp.cumsum(pad) - pad)          # pad runs after real
        # Emission machinery below treats padding as N extra "Gaussians"
        # with ids N..N+T-1: run id >= N marks a padding entry of tile
        # (id - N).
        emit_offsets = jnp.concatenate([offsets, pad_off])
        emit_counts = jnp.concatenate([counts, pad])
        n_runs = N + num_tiles
    else:
        total_slots = total
        emit_offsets, emit_counts, n_runs = offsets, counts, N
    overflow = total_slots > K

    pos = jnp.arange(K, dtype=jnp.int32)
    assert K < (1 << 24)
    emission_mode = config.EMISSION_MODE
    if emission_mode == "carry" and not (tiles_x < 256 and tiles_y < 256):
        # The carry packing rides three tile-rect fields on one exact f32
        # carrier in base 256; grids of >= 256 tiles (images >= 4096 px on
        # an axis) fall back to the gather emission instead of corrupting
        # right-edge rects.
        emission_mode = "gather"
    if emission_mode == "carry":
        # Leanest emission: ONE carry-forward max-scan yields both the
        # entry's Gaussian id and that Gaussian's emission offset (both are
        # non-decreasing at run starts, and runs are contiguous because
        # offsets is the exclusive cumsum of counts). Validity needs no
        # per-entry counts: every pos < total lies in exactly one run, so
        # entry_valid is just pos < total. The remaining per-Gaussian
        # lookups shrink to a [2, K] gather: the three tile-rect fields
        # (each < 256, guaranteed by the gather fallback above) ride one exact f32 carrier.
        assert tiles_x < 256 and tiles_y < 256, (tiles_x, tiles_y)
        ids = jnp.arange(n_runs, dtype=jnp.int32)
        seed_idx = jnp.where(emit_counts > 0, emit_offsets, K)
        gseed = jnp.zeros((K,), jnp.int32).at[seed_idx].max(ids, mode="drop")
        oseed = jnp.zeros((K,), jnp.int32).at[seed_idx].max(emit_offsets,
                                                            mode="drop")
        gidx, off_e = jax.lax.associative_scan(
            lambda a, b: (jnp.maximum(a[0], b[0]), jnp.maximum(a[1], b[1])),
            (gseed, oseed))
        packed = (jnp.clip(rect_min[:, 0], 0, 255)
                  + 256 * jnp.clip(rect_w, 1, 255)
                  + 65536 * jnp.clip(band_rmin_y, 0, 255))
        per_g = jnp.stack([packed.astype(jnp.float32), depths], axis=0)
        cols = jnp.take(per_g, gidx, axis=1, mode="clip")       # [2, K]
        pr = cols[0].astype(jnp.int32)
        rminx_e = pr % 256
        rw_e = (pr // 256) % 256
        rby_e = pr // 65536
        depth_e = cols[1]
        ordinal = pos - off_e
        entry_valid = (pos < total) & (gidx < N)
    elif emission_mode == "scan":
        # One row scatter of each Gaussian's record at its segment start +
        # a carry-forward (last-write-wins) associative scan. Avoids the
        # separate fill_ids scatter AND the [6, K] row gather: scatter cost
        # scales with the number of UPDATES (N), not with row width.
        n_idx = jnp.arange(n_runs, dtype=jnp.float32)
        pad_fill = jnp.zeros((n_runs - N,), jnp.float32)
        rows = jnp.stack([
            jnp.ones((n_runs,), jnp.float32), n_idx,
            emit_offsets.astype(jnp.float32),
            emit_counts.astype(jnp.float32),
            jnp.concatenate([rect_min[:, 0].astype(jnp.float32), pad_fill]),
            jnp.concatenate([rect_w.astype(jnp.float32), pad_fill + 1.0]),
            jnp.concatenate([band_rmin_y.astype(jnp.float32), pad_fill]),
            jnp.concatenate([depths, pad_fill])], axis=1)   # [n_runs, 8]
        seed_idx = jnp.where(emit_counts > 0, emit_offsets, K)
        seeds = jnp.zeros((K, 8), jnp.float32).at[seed_idx].set(
            rows, mode="drop")
        rec = jax.lax.associative_scan(
            lambda a, b: jnp.where(b[..., :1] > 0, b, a), seeds, axis=0)
        gidx = rec[:, 1].astype(jnp.int32)
        off_e = rec[:, 2].astype(jnp.int32)
        cnt_e = rec[:, 3].astype(jnp.int32)
        rminx_e = rec[:, 4].astype(jnp.int32)
        rw_e = jnp.maximum(rec[:, 5].astype(jnp.int32), 1)
        rby_e = rec[:, 6].astype(jnp.int32)
        depth_e = rec[:, 7]
    else:
        gidx = fill_ids_from_offsets(emit_offsets, emit_counts, K)  # [K]
        # ONE fused row-gather for every per-entry lookup: 1-D scalar
        # gathers cost ~20 ms per [1M] on v5e while a [rows, N] -> [rows, K]
        # 2-D gather of the same indices is ~6 ms TOTAL. Integer fields ride
        # an f32 carrier exactly (all values < 2^24; K is capped below that).
        per_g = jnp.stack([
            offsets.astype(jnp.float32), counts.astype(jnp.float32),
            rect_min[:, 0].astype(jnp.float32), rect_w.astype(jnp.float32),
            band_rmin_y.astype(jnp.float32), depths], axis=0)   # [6, N]
        cols = jnp.take(per_g, gidx, axis=1, mode="clip")       # [6, K]
        off_e = cols[0].astype(jnp.int32)
        cnt_e = cols[1].astype(jnp.int32)
        rminx_e = cols[2].astype(jnp.int32)
        rw_e = cols[3].astype(jnp.int32)
        rby_e = cols[4].astype(jnp.int32)
        depth_e = cols[5]
    if emission_mode != "carry":
        ordinal = pos - off_e
        entry_valid = ((ordinal >= 0) & (ordinal < cnt_e) & (pos < total)
                       & (gidx < N))

    tx = rminx_e + ordinal % rw_e
    ty = rby_e + ordinal // rw_e
    tile_id = jnp.where(entry_valid, ty * tiles_x + tx, num_tiles)
    if align_chunk:
        # Padding entries carry their tile id directly (run id - N); depth
        # stays +inf so they sort to the segment tail, where the kernel's
        # [lo, hi) range mask (hi excludes padding) never reads them.
        is_pad = (gidx >= N) & (pos < total_slots)
        tile_id = jnp.where(is_pad, jnp.minimum(gidx - N, num_tiles - 1),
                            tile_id)

    depth_key = jnp.where(entry_valid, depth_e, jnp.inf)
    if config.SORT_MODE == "packed":
        # Single uint32 key: [tile_bits | truncated positive-float depth
        # bits]. IEEE-754 bit patterns of positive floats are monotone, so
        # truncating to the low field's width only quantizes the depth
        # ORDER (~2^-10 relative resolution at 12 tile bits) — swaps occur
        # only between depths that close, where compositing nearly
        # commutes. The reference sorts the full 32-bit pattern inside a
        # 64-bit key (rasterizer_impl.cu duplicateWithKeys); one-key
        # sorting is measurably cheaper than the two-key form on TPU.
        tile_bits = int(num_tiles + 1).bit_length()
        depth_shift = 32 - tile_bits
        dbits = jax.lax.bitcast_convert_type(
            jnp.where(jnp.isfinite(depth_key), depth_key,
                      jnp.float32(3.4e38)), jnp.uint32)
        key = ((tile_id.astype(jnp.uint32) << depth_shift)
               | (dbits >> tile_bits))
        s_key, s_gidx, s_pos = jax.lax.sort((key, gidx, pos), num_keys=1)
        s_tile = (s_key >> depth_shift).astype(jnp.int32)
    else:
        s_tile, _, s_gidx, s_pos = jax.lax.sort(
            (tile_id.astype(jnp.int32), depth_key.astype(jnp.float32),
             gidx, pos), num_keys=2)
    s_valid = s_tile < num_tiles
    if align_chunk:
        s_valid = s_valid & (s_gidx < N)

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), s_tile[1:] != s_tile[:-1]])
    seg_start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0))          # [K]
    # Binning/sort outputs are discrete decisions (emission order, indices,
    # counts): semantically non-differentiable. stop_gradient keeps the
    # depth sort key out of the autodiff graph — gradients reach the
    # renderer only through the gathered per-Gaussian fields.
    out = dict(s_gidx=s_gidx, s_tile=s_tile, s_valid=s_valid, s_pos=s_pos,
               seg_start_pos=seg_start_pos,
               seg_ids=jnp.minimum(s_tile, num_tiles), pos=pos,
               overflow=overflow, total=total, total_slots=total_slots,
               offsets=offsets, counts=counts)
    if align_chunk:
        out["range_start"], out["range_end"] = range_start, range_end
    return jax.lax.stop_gradient(out)


def render_tiled(
    means3d: jnp.ndarray,
    opacities_raw: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    shs: jnp.ndarray,
    settings: RenderSettings,
    alive: Optional[jnp.ndarray] = None,
    mean2d_offset_ndc: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    with_stats: bool = False,
    key_buffer_size: Optional[int] = None,
    pixel_chunk: int = 64,
    tile_row_offset=None,
    tile_rows: Optional[int] = None,
    use_pallas: bool = False,
    pallas_interpret: Optional[bool] = None,
):
    """Render an image through the tiled pipeline.

    Returns the same dict as `render_reference` plus "overflow" (bool) and
    "num_rendered" (int32).

    Viewport mode (multi-chip pixel sharding): when `tile_rows` is given,
    only the horizontal band of `tile_rows` tile rows starting at traced
    `tile_row_offset` is rendered; "render"/"final_T"/"depth" then cover
    the band (height tile_rows*16, cropped to the image's right edge only).
    The projection is that of the FULL image — a band is a crop, not a
    separate camera.
    """
    assert config.BLOCK_SIZE % pixel_chunk == 0, "pixel_chunk must divide 256"
    N = means3d.shape[0]
    H, W = settings.image_height, settings.image_width
    tiles_x, full_tiles_y = common.tile_grid(settings)
    if tile_rows is None:
        tiles_y = full_tiles_y
        tile_row_offset = jnp.int32(0)
        out_h = H
    else:
        tiles_y = int(tile_rows)
        tile_row_offset = jnp.asarray(tile_row_offset, jnp.int32)
        out_h = tiles_y * config.BLOCK_Y
    num_tiles = tiles_x * tiles_y
    K = key_buffer_size or default_key_buffer_size(N, tiles_x, tiles_y)
    if use_pallas:
        from .pallas_kernel import CHUNK as _PK_CHUNK
        K = -(-K // _PK_CHUNK) * _PK_CHUNK  # Pallas grid needs aligned K

    pre = common.preprocess(means3d, opacities_raw, scales, rotations, shs,
                            settings, alive=alive,
                            mean2d_offset_ndc=mean2d_offset_ndc,
                            colors_precomp=colors_precomp,
                            cov3d_precomp=cov3d_precomp)

    from . import pallas_kernel as pk
    align = pk.CHUNK if (use_pallas and config.ALIGN_SEGMENTS) else 0
    ent = bin_and_sort(pre.rect_min, pre.rect_max, pre.tiles_touched,
                       pre.depths, tiles_x=tiles_x, tiles_y=tiles_y,
                       tile_row_offset=tile_row_offset, K=K,
                       align_chunk=align)
    s_gidx, s_tile, s_valid = ent["s_gidx"], ent["s_tile"], ent["s_valid"]
    seg_start_pos, pos = ent["seg_start_pos"], ent["pos"]
    # total_slots (= entries incl. per-tile alignment padding) is what the
    # static buffer must hold: report it as num_rendered so the trainer's
    # adaptive resize tracks the real requirement.
    overflow, total = ent["overflow"], ent["total_slots"]

    if use_pallas:
        # Fast path: per-tile Pallas compositing kernels fed straight from
        # the per-Gaussian field matrix — the per-entry gather and its
        # scatter-free transpose are fused into the kernel custom VJP, and
        # the kernel consumes the compact sorted buffer in place.
        if pallas_interpret is None:
            pallas_interpret = jax.default_backend() != "tpu"
        if align:
            range_start, range_end = ent["range_start"], ent["range_end"]
        else:
            range_start, range_end = tile_ranges_from_rects(
                pre.rect_min, pre.rect_max, pre.tiles_touched, tiles_x,
                tiles_y, tile_row_offset, K)
        inv_pos = pk.inverse_permutation(ent["s_pos"])
        per_gauss_stats = None
        if with_stats:
            # Counting/stats pass (importance pruning, SH culling): an
            # inference sweep — run the kernel primally, reduce the
            # per-entry counters per Gaussian with the emission
            # prefix-difference. Not differentiable (the reference's
            # count pass has no autograd either, N2 __init__.py:139-188).
            steps = pk.step_layout(range_start, range_end, K, num_tiles,
                                   bool(align))
            e_packed = jnp.take(pk.pack_fields(pre), s_gidx, axis=1,
                                mode="clip")
            color4, final_t, _, stats8 = pk.tile_composite_fwd(
                e_packed, *steps, tile_row_offset, tiles_x, num_tiles,
                bool(pallas_interpret), with_stats=True)
            nonempty = (range_end - range_start > 0)[:, None, None]
            color4 = jnp.where(nonempty, color4[:num_tiles], 0.0)
            final_t = jnp.where(nonempty, final_t[:num_tiles], 1.0)
            per_gauss_stats = pk.segment_reduce_emission(
                stats8[:4], inv_pos, ent["offsets"], ent["counts"])
            color4, final_t, per_gauss_stats = jax.lax.stop_gradient(
                (color4, final_t, per_gauss_stats))
        else:
            color4, final_t = pk.composite_sorted(
                pk.pack_fields(pre), s_gidx, inv_pos,
                ent["offsets"], ent["counts"], s_tile, range_start,
                range_end, tile_row_offset, tiles_x, num_tiles,
                bool(pallas_interpret), bool(align))
        colors = color4[:, :, :3]                           # [T,256,3]
        depths_img = color4[:, :, 3]                        # [T,256]
        T_img_tiles = final_t[:, :, 0]
        out = _assemble_outputs(
            colors, depths_img, T_img_tiles, pre, settings, tiles_x, tiles_y,
            H, W, tile_rows, overflow, total, None, s_gidx, s_valid,
            N, False)
        if with_stats:
            out["gaussians_count"] = per_gauss_stats[0].astype(jnp.int32)
            out["opacity_important_score"] = per_gauss_stats[1]
            out["T_alpha_important_score"] = per_gauss_stats[2]
            out["touched_pixels"] = per_gauss_stats[0].astype(jnp.int32)
            out["transmittance_sum"] = per_gauss_stats[3]
        return out

    # --- gather per-entry data (XLA segmented-scan path) -------------------
    # One fused [10, N] -> [10, K] row gather (see bin_and_sort: scalar
    # gathers cost ~20 ms per [1M] on v5e, the fused 2-D gather ~6 ms).
    from .pallas_kernel import pack_fields
    cols = jnp.take(pack_fields(pre), s_gidx, axis=1)      # [10, K]
    e_means2d = cols[0:2].T                                # [K,2]
    e_conic = cols[2:5].T                                  # [K,3]
    e_opacity = cols[5]                                    # [K]
    e_rgb = cols[6:9].T                                    # [K,3]
    e_depth = cols[9]                                      # [K]
    e_tile_x = (s_tile % tiles_x).astype(jnp.float32) * config.BLOCK_X
    e_tile_y = ((jnp.minimum(s_tile // tiles_x, tiles_y - 1)
                 + tile_row_offset).astype(jnp.float32) * config.BLOCK_Y)

    seg_ids = ent["seg_ids"]                               # [K], sentinel bucket

    n_pix_chunks = -(-config.BLOCK_SIZE // pixel_chunk)
    p_offsets = jnp.arange(pixel_chunk, dtype=jnp.int32)

    def render_pixel_chunk(p0):
        """Composite every entry against `pixel_chunk` pixels of its tile.

        Returns per-(tile, pixel) color/log-T and per-entry stats.
        """
        p = p0 + p_offsets                                          # [P]
        px = e_tile_x[:, None] + (p % config.BLOCK_X)[None, :]      # [K,P]
        py = e_tile_y[:, None] + (p // config.BLOCK_X)[None, :]
        dx = e_means2d[:, 0:1] - px
        dy = e_means2d[:, 1:2] - py
        A, B, C = e_conic[:, 0:1], e_conic[:, 1:2], e_conic[:, 2:3]
        power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
        alpha = jnp.minimum(config.ALPHA_MAX, e_opacity[:, None] * jnp.exp(power))
        gate = (power <= 0.0) & (alpha >= config.ALPHA_EPS) & s_valid[:, None]
        abar = jnp.where(gate, alpha, 0.0)                          # [K,P]

        log1ma = jnp.log1p(-abar)
        csum = jnp.cumsum(log1ma, axis=0)
        lex = csum - log1ma                                          # inclusive -> exclusive
        lex = lex - lex[seg_start_pos]                               # segment-local
        T_in = jnp.exp(lex)

        trigger = gate & (T_in * (1.0 - abar) < config.T_EPS)
        tcum = jnp.cumsum(trigger.astype(jnp.int32), axis=0)
        tcum_ex = tcum - trigger.astype(jnp.int32)
        dead = (tcum_ex - tcum_ex[seg_start_pos]) > 0
        contrib = gate & ~trigger & ~dead                            # [K,P]

        w = jnp.where(contrib, abar * T_in, 0.0)                     # [K,P]
        # Per-(tile, pixel) accumulation.
        color = jax.ops.segment_sum(w[:, :, None] * e_rgb[:, None, :],
                                    seg_ids, num_segments=num_tiles + 1)
        depth = jax.ops.segment_sum(w * e_depth[:, None],
                                    seg_ids, num_segments=num_tiles + 1)
        logT = jax.ops.segment_sum(jnp.where(contrib, log1ma, 0.0),
                                   seg_ids, num_segments=num_tiles + 1)
        if with_stats:
            contrib_f = contrib.astype(w.dtype)
            cnt = jnp.sum(contrib_f, axis=1)                         # [K]
            stats = jnp.stack([
                cnt,
                cnt * e_opacity,
                jnp.sum(w, axis=1),
                jnp.sum(jnp.where(contrib, T_in, 0.0), axis=1),
            ])                                                       # [4,K]
        else:
            stats = jnp.zeros((4, 1), w.dtype)
        return color[:num_tiles], depth[:num_tiles], logT[:num_tiles], stats

    def scan_body(acc, p0):
        color, depth, logT, stats = render_pixel_chunk(p0)
        return acc + stats, (color, depth, logT)

    p0s = jnp.arange(n_pix_chunks, dtype=jnp.int32) * pixel_chunk
    stats_entries, (colors, depths_img, logTs) = jax.lax.scan(
        jax.checkpoint(scan_body), jnp.zeros((4, K if with_stats else 1)), p0s)
    # colors: [n_pix_chunks, T, P, 3] -> [T, BLOCK_SIZE, 3]
    colors = colors.transpose(1, 0, 2, 3).reshape(num_tiles, config.BLOCK_SIZE, 3)
    depths_img = depths_img.transpose(1, 0, 2).reshape(num_tiles, config.BLOCK_SIZE)
    T_img_tiles = jnp.exp(logTs.transpose(1, 0, 2).reshape(num_tiles, config.BLOCK_SIZE))
    return _assemble_outputs(
        colors, depths_img, T_img_tiles, pre, settings, tiles_x, tiles_y,
        H, W, tile_rows, overflow, total, stats_entries, s_gidx, s_valid,
        N, with_stats)


def _assemble_outputs(colors, depths_img, T_img_tiles, pre, settings,
                      tiles_x, tiles_y, H, W, tile_rows, overflow, total,
                      stats_entries, s_gidx, s_valid, N, with_stats):
    # --- stitch tiles back into the image and crop padding -----------------
    padded_h = tiles_y * config.BLOCK_Y
    padded_w = tiles_x * config.BLOCK_X
    crop_h = H if tile_rows is None else padded_h

    def stitch(tile_vals):
        extra = tile_vals.shape[2:]
        x = tile_vals.reshape(tiles_y, tiles_x, config.BLOCK_Y, config.BLOCK_X, *extra)
        x = jnp.moveaxis(x, 2, 1).reshape(padded_h, padded_w, *extra)
        return x[:crop_h, :W]

    T_full = stitch(T_img_tiles)
    color_full = stitch(colors)
    depth_full = stitch(depths_img)
    image = color_full + T_full[..., None] * settings.bg[None, None, :]

    out = {
        "render": image.transpose(2, 0, 1),
        "radii": pre.radii,
        "final_T": T_full,
        "depth": depth_full,
        "overflow": overflow,
        "num_rendered": total,
    }
    if with_stats:
        def scatter_back(vals):
            return jnp.zeros((N,), vals.dtype).at[s_gidx].add(
                jnp.where(s_valid, vals, 0.0))
        out["gaussians_count"] = scatter_back(stats_entries[0]).astype(jnp.int32)
        out["opacity_important_score"] = scatter_back(stats_entries[1])
        out["T_alpha_important_score"] = scatter_back(stats_entries[2])
        out["touched_pixels"] = scatter_back(stats_entries[0]).astype(jnp.int32)
        out["transmittance_sum"] = scatter_back(stats_entries[3])
    return out
