"""Spatial K-nearest-neighbours, TPU-native.

Equivalent of the reference's simple-knn extension
(/root/reference/submodules/simple-knn/simple_knn.cu):
  * `mean_knn_dist_sq`  ~ distCUDA2 (simple_knn.cu:150-185): per-point mean of
    the 3 smallest squared distances INCLUDING self (the CUDA loop never
    skips idx, so best[0] = 0) — used for COLMAP scale init.
  * `knn`               ~ distIndex2 / knn_index2 (simple_knn.cu:391-522):
    K nearest neighbour squared distances + indices, self excluded — used by
    redundancy pruning with K=30 (pruning/trainer.py:25).

Design: the CUDA version walks Morton-ordered boxes outward with box-distance
rejection (exact search). On TPU the hot path must avoid per-row gathers
entirely (a [rows, C, 3] neighbour gather pads its minor dim 3 -> 128 under
(8,128) tiling — the round-4 implementation spent 23 s at 200k points almost
entirely on such gathers). Instead:

  1. Sort the cloud along a Morton curve ONCE per ordering ([N,3] permute —
     the only gather), reshape into contiguous blocks of B points, and score
     each block against itself + its neighbouring blocks with dense
     elementwise math + top_k. Zero irregular memory access; every operand
     is a contiguous reshape/shift of the sorted array.
  2. Union the per-ordering top-k lists from several ROTATED copies of the
     cloud (rotations decorrelate the space-filling curves far better than
     diagonal jitter) via an id-sort dedup merge over [N, n_orders*k].
  3. Optional NN-descent refinement rounds (neighbours-of-neighbours through
     the top-`sample` incumbents) for recall on adversarial density
     contrasts; these do gather, so rounds are kept narrow and few.

Recall is measured against an exact oracle on a 1000x-density-contrast
clustered cloud (tools/knn_recall.py -> KNN_RECALL.json); the defaults below
are the measured >=0.95-recall settings.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits over 30 (Morton interleave), uint32."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(points: jnp.ndarray, lo=None, hi=None,
                 jitter: float = 0.0) -> jnp.ndarray:
    """30-bit Morton codes over the point AABB (simple_knn.cu:47-72)."""
    if lo is None:
        lo = jnp.min(points, axis=0)
    if hi is None:
        hi = jnp.max(points, axis=0)
    extent = jnp.maximum(hi - lo, 1e-12)
    u = (points - lo) / extent
    if jitter:
        u = jnp.clip(u + jitter, 0.0, 1.0)
    q = jnp.clip((u * 1023.0), 0, 1023).astype(jnp.uint32)
    return (_expand_bits(q[:, 0]) * 4 + _expand_bits(q[:, 1]) * 2
            + _expand_bits(q[:, 2])).astype(jnp.uint32)


# Fixed rotations decorrelating the Morton orderings. A diagonal jitter only
# shifts the same space-filling curve; a rotation changes which pairs of
# nearby points land in the same curve window, which is what recovers
# recall on clustered clouds (measured: jitter-only orderings plateau at
# ~0.6 recall@30 on a 1000x-density-contrast cloud; see tools/knn_recall.py).
def _order_rotation(i: int) -> jnp.ndarray:
    if i == 0:
        return jnp.eye(3, dtype=jnp.float32)
    import numpy as _np
    rng = _np.random.default_rng(1234 + i)
    q, _ = _np.linalg.qr(rng.normal(size=(3, 3)))
    return jnp.asarray(q.astype(_np.float32))


def _row_chunk_for(n_cand: int, budget_bytes: int = 10 ** 9) -> int:
    """Rows per chunk so a [R, C, 3] gather's padded intermediate stays
    bounded: the minor dim pads 3 -> 128 under TPU (8,128) tiling — 42x the
    logical size (an unchunked 37k x 930 gather allocated 17.7 GB and OOMed
    v5e). Used by the (gathering) refine rounds and ops/redundancy."""
    return max(256, budget_bytes // (n_cand * 128 * 4))


def _topk_bucket_sel(dist: jnp.ndarray, k: int):
    """k smallest along the last axis via strided-bucket min + a k-step
    selection scan — measured 57 ms vs lax.top_k's 202 ms and
    approx_max_k's 122 ms on [262k, 1536] (v5e).

    Stage 1 reduces W candidates to min(W, 128) buckets (bucket = position
    mod 128, so CONSECUTIVE candidates — which is where Morton-sorted true
    neighbours cluster — land in distinct buckets; only pairs exactly
    n*128 apart can collide). Stage 2 extracts the k smallest bucket mins
    with k argmin+mask passes (exact over the bucket mins). Returns
    (values, positions-along-the-last-axis) like lax.top_k."""
    *lead, w = dist.shape
    if w <= 128:
        nbk, bw = 1, w
        r = dist[..., None, :]
    else:
        bw = 128
        pad = (-w) % bw
        if pad:
            dist = jnp.pad(dist, [(0, 0)] * len(lead) + [(0, pad)],
                           constant_values=jnp.inf)
        nbk = (w + pad) // bw
        r = dist.reshape(*lead, nbk, bw)
    bmin = jnp.min(r, axis=-2)                              # [..., bw]
    barg = jnp.argmin(r, axis=-2).astype(jnp.int32)         # stride index

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, bmin.shape,
                                         bmin.ndim - 1)

    def body(v, _):
        m = jnp.min(v, axis=-1)
        am = jnp.argmin(v, axis=-1).astype(jnp.int32)
        v = jnp.where(lane_iota == am[..., None], jnp.inf, v)
        return v, (m, am)

    _, (vals, lanes) = jax.lax.scan(body, bmin, None, length=k)
    # scan stacks along axis 0: [k, ...] -> [..., k]
    vals = jnp.moveaxis(vals, 0, -1)
    lanes = jnp.moveaxis(lanes, 0, -1)
    stride = jnp.take_along_axis(barg, lanes, axis=-1)
    return vals, stride * bw + lanes


_TOPK_IMPL = os.environ.get("R3DGS_KNN_TOPK", "approx")


def _topk_neg(dist: jnp.ndarray, k: int, approx: bool):
    """(values, positions) of the k SMALLEST along the last axis."""
    if approx and dist.shape[-1] > 2 * k:
        if _TOPK_IMPL == "approx":
            neg, pos = jax.lax.approx_max_k(-dist, k, recall_target=0.99)
            return -neg, pos
        return _topk_bucket_sel(dist, k)
    neg, pos = jax.lax.top_k(-dist, k)
    return -neg, pos


def _merge_klists(dists: jnp.ndarray, ids: jnp.ndarray, k: int,
                  approx: bool = False):
    """Merge m INTERNALLY-duplicate-free candidate lists per row.

    dists/ids: [N, m, w]. An id appearing in several lists keeps only its
    first occurrence; later copies get inf distance so the final top-k
    can't waste slots on duplicates. The dedup is m(m-1)/2 pairwise
    [N, w, w] equality tests — measured 6x faster than the id-argsort
    formulation (row-wise argsort + take_along_axis on the lane axis cost
    1.17 s at [262k, 120] on v5e; this path 0.2 s)."""
    n, m, w = ids.shape
    if m > 1:
        dups = [jnp.zeros((n, w), bool)]
        for b in range(1, m):
            hit = jnp.zeros((n, w), bool)
            for a in range(b):
                hit = hit | jnp.any(
                    ids[:, b, :, None] == ids[:, a, None, :], axis=-1)
            dups.append(hit)
        dists = jnp.where(jnp.stack(dups, axis=1), jnp.inf, dists)
    dd = dists.reshape(n, m * w)
    d, pos = _topk_neg(dd, k, approx)
    return d, jnp.take_along_axis(ids.reshape(n, m * w), pos, axis=1)


def _block_group_count(block: int, n_cand: int,
                       budget_bytes: int = 512 * 1024 ** 2) -> int:
    """Blocks per lax.map step so the [g, B, C] distance tensor (plus its
    top_k intermediates, ~3x) stays within budget."""
    per_block = block * n_cand * 4 * 3
    return max(1, budget_bytes // per_block)


def _order_blocked_topk(pts: jnp.ndarray, valid: Optional[jnp.ndarray],
                        rot: Optional[jnp.ndarray], k: int, block: int,
                        neighbors: int, approx: bool):
    """Top-k per point from ONE Morton ordering, blocked-contiguous.

    Candidates for a point in sorted-block b are all points of blocks
    [b-neighbors .. b+neighbors] — guaranteed rank coverage of at least
    `neighbors*block` on each side. Everything after the single [N]
    permutation is contiguous reshapes and shifts: no row gathers.
    Returns (dists [N,k], ids [N,k]) in ORIGINAL index space/row order.
    """
    n = pts.shape[0]
    rp = pts @ rot.T if rot is not None else pts
    order = jnp.argsort(morton_codes(rp)).astype(jnp.int32)

    pad = (-n) % block
    sp = jnp.pad(pts[order], ((0, pad), (0, 0)))
    sid = jnp.pad(order, (0, pad), constant_values=-1)       # -1 = pad slot
    sv = (jnp.pad(valid[order], (0, pad), constant_values=False)
          if valid is not None
          else jnp.pad(jnp.ones((n,), bool), (0, pad), constant_values=False))
    nb = (n + pad) // block

    blocks = sp.reshape(nb, block, 3)
    bids = sid.reshape(nb, block)
    bval = sv.reshape(nb, block)

    # Extended arrays: `neighbors` invalid blocks on each end, then the
    # candidate set of block b is ext[b : b + 2*neighbors + 1] flattened.
    nbh = neighbors
    ext_p = jnp.pad(blocks, ((nbh, nbh), (0, 0), (0, 0)))
    ext_i = jnp.pad(bids, ((nbh, nbh), (0, 0)), constant_values=-1)
    ext_v = jnp.pad(bval, ((nbh, nbh), (0, 0)), constant_values=False)
    cand_p = jnp.concatenate(
        [ext_p[s:s + nb] for s in range(2 * nbh + 1)], axis=1)  # [nb,C,3]
    cand_i = jnp.concatenate(
        [ext_i[s:s + nb] for s in range(2 * nbh + 1)], axis=1)  # [nb,C]
    cand_v = jnp.concatenate(
        [ext_v[s:s + nb] for s in range(2 * nbh + 1)], axis=1)  # [nb,C]
    c = cand_p.shape[1]

    def score(args):
        q, qi, cp, ci, cv = args
        # Exact squared distances with the coordinate axis OUTSIDE the
        # (sublane, lane) tile: [g,3,B,C] keeps the wide B/C axes in the
        # hardware tile. The naive [g,B,C,3] layout puts 3 in the 128-lane
        # axis (42x padding waste, measured 4.1 s/order at 262k); the
        # |q|^2+|c|^2-2qc matmul expansion is fast but its cancellation
        # error (~1e-7 * |x|^2 absolute) misorders near-tied neighbours
        # (measured -0.023 recall@30 on the clustered-cloud oracle).
        diff = (q.transpose(0, 2, 1)[:, :, :, None]
                - cp.transpose(0, 2, 1)[:, :, None, :])        # [g,3,B,C]
        dist = jnp.sum(diff * diff, axis=1)                    # [g,B,C]
        bad = (ci[:, None, :] == qi[:, :, None]) | ~cv[:, None, :]
        dist = jnp.where(bad, jnp.inf, dist)
        if approx and _TOPK_IMPL == "noagg" and dist.shape[-1] > 4 * k:
            # Skip the per-order exact aggregation: approx_max_k's
            # UNAGGREGATED bucket minima (a few x k of them) go straight
            # to the cross-order merge, which runs one final top-k anyway.
            # Bucket minima are internally duplicate-free (distinct
            # candidate positions), which is all _merge_klists needs.
            neg, pos = jax.lax.approx_max_k(-dist, k, recall_target=0.95,
                                            aggregate_to_topk=False)
            d = -neg
        else:
            d, pos = _topk_neg(dist, k, approx)
        # Map top-k positions to global ids from the per-block [C] table:
        # a vmapped small-table gather, NOT take_along_axis over a
        # broadcast [g,B,C] id tensor (which materializes 1.6 GB at 262k
        # and gathers along the lane axis).
        ids = jax.vmap(lambda tbl, p: tbl[p])(ci, pos)
        return d, ids

    g = _block_group_count(block, c)
    if nb <= g:
        d, ids = score((blocks, bids, cand_p, cand_i, cand_v))
        w = d.shape[-1]                 # k, or the noagg candidate width
        d, ids = d.reshape(-1, w), ids.reshape(-1, w)
    else:
        gpad = (-nb) % g
        def padg(a, fill=0):
            return jnp.pad(a, ((0, gpad),) + ((0, 0),) * (a.ndim - 1),
                           constant_values=fill).reshape(
                               (-1, g) + a.shape[1:])
        d, ids = jax.lax.map(score, (padg(blocks), padg(bids, -1),
                                     padg(cand_p), padg(cand_i, -1),
                                     padg(cand_v, False)))
        w = d.shape[-1]
        d, ids = d.reshape(-1, w)[:nb * block], ids.reshape(-1, w)[:nb * block]

    # Back to original row order (pad slots live at sorted ranks >= n and
    # are never referenced by rank_of). One combined [Np, 2w] gather: the
    # minor dim pads to 128 either way, so fusing d and ids (f32-bitcast)
    # into one array halves the gather cost.
    rank_of = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    # Bit 30 is OR-ed in before the int->float bitcast: bare ids (< 2^23)
    # are DENORMAL float bit patterns, which the TPU data path flushes to
    # zero (measured: recall 0 on-chip, perfect on CPU). With the exponent
    # bit set the pattern is a normal float and survives; mask it off after.
    tag = jnp.int32(0x40000000)
    packed = jnp.concatenate(
        [d, jax.lax.bitcast_convert_type(ids | tag, jnp.float32)], axis=1)
    packed = packed[rank_of]
    return packed[:, :w], jax.lax.bitcast_convert_type(
        packed[:, w:], jnp.int32) & ~tag


def _chunked_refine(pts, mask, k, d, i, row_chunk: int, sample: int,
                    approx: bool):
    """One NN-descent round: candidates = incumbents U neighbours-of-the-
    top-`sample`-incumbents, built PER CHUNK so the padded gather
    intermediates stay bounded (full-table construction costs ~N*k*sample
    ints live at once). The candidate set is (1+sample) internally-
    duplicate-free k-lists, merged with the pairwise dedup.

    Gather economy (each [R, C] row gather costs ~3 us per 1000 row-cands
    on v5e, locality-insensitive — measured): incumbent DISTANCES ride in
    from the previous round instead of being re-gathered, dead points are
    excluded by their far-corner coordinates rather than a ~mask[flat]
    bool gather (~340 ms/round at 262k), and query rows arrive as
    contiguous chunk slices, not an idx_c gather."""
    n = pts.shape[0]
    sample = min(sample, k)
    idx_all = jnp.arange(n, dtype=jnp.int32)

    def one(args):
        idx_c, p_c, d_c, i_c = args
        r = idx_c.shape[0]
        nn2 = jnp.take(i, i_c[:, :sample], axis=0)         # [R, s, k]
        flat = nn2.reshape(r, sample * k)
        df = p_c[:, None, :] - pts[flat]                   # [R, s*k, 3]
        dist = jnp.sum(df * df, axis=-1)
        invalid = flat == idx_c[:, None]
        dist = jnp.where(invalid, jnp.inf, dist).reshape(r, sample, k)
        return _merge_klists(
            jnp.concatenate([d_c[:, None, :], dist], axis=1),
            jnp.concatenate([i_c[:, None, :], nn2], axis=1), k, approx)

    if n <= row_chunk:
        return one((idx_all, pts, d, i))
    pad = (-n) % row_chunk
    nb = (n + pad) // row_chunk

    def padr(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)).reshape(
            (nb, row_chunk) + a.shape[1:])

    d2, i2 = jax.lax.map(one, (padr(idx_all), padr(pts), padr(d), padr(i)))
    return d2.reshape(-1, k)[:n], i2.reshape(-1, k)[:n]


# R3DGS_KNN_TOPK: "approx" (default, lax.approx_max_k) / "bucketsel"
# (strided-bucket min + selection scan) / "noagg" (unaggregated bucket
# minima straight to the merge) / "exact" (lax.top_k everywhere).
_APPROX_DEFAULT = _TOPK_IMPL != "exact"


def knn(points: jnp.ndarray, k: int, window: int = 512,
        mask: Optional[jnp.ndarray] = None, n_orders: int = 2,
        refine_rounds: int = 2, neighbors: int = 1,
        refine_sample: int = 4,
        row_chunk: int = 65536,
        approx: Optional[bool] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K nearest neighbours (squared distances, indices), self excluded.

    Phases (see module docstring):
      1. Blocked Morton search per rotated ordering: block size = `window`,
         candidates = own + `neighbors` adjacent blocks each side
         (guaranteed rank coverage >= neighbors*window per side).
      2. Id-sort dedup merge of the `n_orders` top-k lists.
      3. `refine_rounds` NN-descent rounds through the top-`refine_sample`
         incumbents.

    The reference's simple-knn is an exact outward box-walk
    (simple_knn.cu:391-522); this is the static-shape approximate
    equivalent with measured, data-driven defaults: on the 262k-point
    1000x-density-contrast oracle cloud the defaults below measured
    recall@30 = 0.955 in ~1.3 s on v5e (KNN_RECALL.json; the round-4
    gather-based implementation needed 23.3 s at 200k for 0.968).

    Args:
      points: [N, 3].
      k: number of neighbours.
      window: Morton block size (per-ordering candidates =
        (2*neighbors+1)*window).
      mask: [N] bool; False points are neither queried usefully nor
        returned as neighbours of alive points.
      n_orders: number of rotated Morton orderings to union.
      refine_rounds: neighbour-of-neighbour merge rounds.
      neighbors: adjacent candidate blocks per side.
      refine_sample: incumbents expanded per refine round.
      approx: use the TPU-native approx top-k (recall_target 0.99) for the
        wide reductions; None = R3DGS_KNN_TOPK env default ("approx").

    Returns:
      (dists_sq [N, k], indices [N, k] int32). Rows of masked-out points
      contain inf / arbitrary indices.
    """
    points = jnp.asarray(points)   # host numpy in => traced indexing works
    n = points.shape[0]
    if approx is None:
        approx = _APPROX_DEFAULT
    if mask is not None:
        # Push dead points to the far corner so they sort away from live ones.
        far = jnp.max(points, axis=0) + 10.0 * (
            jnp.max(points, axis=0) - jnp.min(points, axis=0) + 1.0)
        pts = jnp.where(mask[:, None], points, far[None, :])
    else:
        pts = points

    ds, ids = [], []
    for o in range(n_orders):
        d_o, i_o = _order_blocked_topk(
            pts, mask, _order_rotation(o) if o else None, k,
            block=window, neighbors=neighbors, approx=approx)
        ds.append(d_o)
        ids.append(i_o)
    if n_orders > 1 or ds[0].shape[1] != k:
        d, i = _merge_klists(jnp.stack(ds, axis=1),
                             jnp.stack(ids, axis=1), k, approx)
    else:
        d, i = ds[0], ids[0]

    refine_chunk = min(row_chunk, _row_chunk_for(k + refine_sample * k))
    for _ in range(refine_rounds):
        d, i = _chunked_refine(pts, mask, k, d, i, refine_chunk,
                               refine_sample, approx)
    return d, i


def knn_index_subset(points: jnp.ndarray, k: int, neighbor_mask: jnp.ndarray,
                     **kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN where only flagged points may be returned as neighbours.

    Parity with simple-knn's `distIndexQ` (simple_knn.cu:524-651): a
    query-subset KNN restricted to a flagged neighbour subset; here the
    restriction is the blocked search's mask argument."""
    return knn(points, k, mask=neighbor_mask, **kwargs)


def knn_exact(points: jnp.ndarray, k: int,
              mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact O(N^2) KNN (tests / small N oracle)."""
    d = points[:, None, :] - points[None, :, :]
    dist = jnp.sum(d * d, axis=-1)
    n = points.shape[0]
    eye = jnp.eye(n, dtype=bool)
    dist = jnp.where(eye, jnp.inf, dist)
    if mask is not None:
        dist = jnp.where(mask[None, :], dist, jnp.inf)
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx.astype(jnp.int32)


def mean_knn_dist_sq(points: jnp.ndarray, window: int = 64,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean of the 3 smallest squared distances including self (distCUDA2).

    The CUDA kernel's candidate set includes the point itself (distance 0),
    so the result is (d1^2 + d2^2)/3 with d1, d2 the two nearest neighbours
    (simple_knn.cu:157-185).
    """
    d2, _ = knn(points, 2, window=window, mask=mask, n_orders=2,
                refine_rounds=0)
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
    return jnp.sum(d2, axis=1) / 3.0
