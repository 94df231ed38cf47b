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
rejection (exact search). On TPU we keep the Morton ordering but take a fixed
candidate window around each point's rank — O(N*W) with static shapes, fully
vectorised. Recall is boosted by taking the union of windows from several
jittered Morton orderings (a standard trick for approximate KNN on sorted
space-filling curves). For the statistical use these ops serve (scale init,
redundancy counting), window KNN with W >= 8K is empirically
indistinguishable from exact; tests measure recall against the exact O(N^2)
path.
"""
from __future__ import annotations

import functools
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


def _window_candidates(order: jnp.ndarray, window: int) -> jnp.ndarray:
    """[N, window] candidate point-indices around each point's sorted rank."""
    n = order.shape[0]
    rank_of = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    half = window // 2
    offs = jnp.arange(window, dtype=jnp.int32) - half
    cand_rank = jnp.clip(rank_of[:, None] + offs[None, :], 0, n - 1)
    return order[cand_rank]                      # [N, window]


def _row_chunk_for(n_cand: int, budget_bytes: int = 10 ** 9) -> int:
    """Rows per chunk so the gather's padded intermediate stays bounded.

    A [R, C, 3] candidate gather materializes with the minor dim padded
    3 -> 128 by TPU (8,128) tiling — 42x the logical size (an unchunked
    37k x 930 gather allocated 17.7 GB and OOMed v5e; measured on-chip:
    scalar per-coordinate gathers avoid the padding but run 8x slower
    than bounded-chunk 3-wide gathers, 859 vs 107 ms at that scale)."""
    return max(256, budget_bytes // (n_cand * 128 * 4))


def _best_k_rows(pts, mask, k, idx, cand_rows, dedup: bool):
    """Top-k nearest among `cand_rows` for query rows `idx` (self excluded).

    Callers bound the row count via _row_chunk_for: the [R, C, 3] gather
    pads its minor dim 3 -> 128 on TPU, so R must be capped for memory."""
    d = pts[idx][:, None, :] - pts[cand_rows]          # [R, C, 3]
    dist = jnp.sum(d * d, axis=-1)
    invalid = cand_rows == idx[:, None]
    if mask is not None:
        invalid = invalid | ~mask[cand_rows]
    # Deduplicate repeated candidates (same index ==> same distance;
    # keeping both would push a true neighbour out of the top-k). Sort each
    # row's candidate ids, flag equal-adjacent entries, and unsort via the
    # inverse permutation — O(C log C) per row instead of the O(C^2)
    # pairwise compare (which at window=256 x 2 orders materialised
    # [rows, 512, 512] bools and dominated the whole op).
    if dedup:
        order_c = jnp.argsort(cand_rows, axis=1)
        sorted_c = jnp.take_along_axis(cand_rows, order_c, axis=1)
        dup_sorted = jnp.concatenate(
            [jnp.zeros_like(sorted_c[:, :1], bool),
             sorted_c[:, 1:] == sorted_c[:, :-1]], axis=1)
        inv = jnp.argsort(order_c, axis=1)
        invalid = invalid | jnp.take_along_axis(dup_sorted, inv, axis=1)
    dist = jnp.where(invalid, jnp.inf, dist)
    neg, pos = jax.lax.top_k(-dist, k)
    return -neg, jnp.take_along_axis(cand_rows, pos, axis=1)


def _chunked_refine(pts, mask, k, i, row_chunk: int):
    """One NN-descent round, candidates built PER CHUNK.

    Materialising the full [N, k*k] neighbours-of-neighbours table before
    chunking costs ~N*k^2 ints live at once (7+ GB at 2M points, k=30);
    gathering it inside the mapped chunk keeps peak memory at the chunk
    size like the window phase."""
    n = pts.shape[0]
    idx_all = jnp.arange(n, dtype=jnp.int32)

    def one(args):
        idx_c, i_c = args
        nn2 = jnp.take(i, i_c, axis=0).reshape(i_c.shape[0], k * k)
        cand = jnp.concatenate([i_c, nn2], axis=1)       # [R, k + k*k]
        return _best_k_rows(pts, mask, k, idx_c, cand, dedup=True)

    if n <= row_chunk:
        return one((idx_all, i))
    pad = (-n) % row_chunk
    idx_p = jnp.pad(idx_all, (0, pad))
    i_p = jnp.pad(i, ((0, pad), (0, 0)))
    nb = (n + pad) // row_chunk
    d2, i2 = jax.lax.map(one, (idx_p.reshape(nb, row_chunk),
                               i_p.reshape(nb, row_chunk, k)))
    return d2.reshape(-1, k)[:n], i2.reshape(-1, k)[:n]


def _chunked_best_k(pts, mask, k, cand, row_chunk: int, dedup: bool):
    n = pts.shape[0]
    idx_all = jnp.arange(n, dtype=jnp.int32)
    if n <= row_chunk:
        return _best_k_rows(pts, mask, k, idx_all, cand, dedup)
    pad = (-n) % row_chunk
    idx_p = jnp.pad(idx_all, (0, pad))
    cand_p = jnp.pad(cand, ((0, pad), (0, 0)))
    nb = (n + pad) // row_chunk
    d, i = jax.lax.map(
        lambda a: _best_k_rows(pts, mask, k, a[0], a[1], dedup),
        (idx_p.reshape(nb, row_chunk), cand_p.reshape(nb, row_chunk, -1)))
    return d.reshape(-1, k)[:n], i.reshape(-1, k)[:n]


def knn(points: jnp.ndarray, k: int, window: int = 256,
        mask: Optional[jnp.ndarray] = None, n_orders: int = 3,
        refine_rounds: int = 4,
        row_chunk: int = 65536) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K nearest neighbours (squared distances, indices), self excluded.

    Two phases, both static-shape and TPU-friendly:
      1. Morton-window search: union of rank windows from `n_orders`
         orderings of ROTATED copies of the cloud (rotations decorrelate
         the space-filling curves far better than diagonal jitter).
      2. NN-descent refinement: `refine_rounds` rounds of
         neighbours-of-neighbours — candidates = current [N, k] neighbour
         lists gathered through themselves ([N, k*k]) merged with the
         incumbents. Pure gathers + top_k; each round multiplies the miss
         rate by ~0.55. Measured recall@30 on a 262k-point, 1000x-density-
         contrast clustered cloud vs an exact oracle (KNN_RECALL.json):
         window search alone 0.59; +2 rounds 0.87; +4 rounds 0.968 — the
         defaults below are those measured >=0.95 settings.

    The reference's simple-knn is an exact outward box-walk
    (simple_knn.cu:391-522); this is the static-shape equivalent with
    measured, data-driven defaults.

    Args:
      points: [N, 3].
      k: number of neighbours.
      window: candidates per Morton ordering.
      mask: [N] bool; False points are neither queried usefully nor returned
        as neighbours of alive points.
      n_orders: number of rotated Morton orderings to union.
      refine_rounds: neighbour-of-neighbour merge rounds.

    Returns:
      (dists_sq [N, k], indices [N, k] int32). Rows of masked-out points
      contain inf / arbitrary indices.
    """
    points = jnp.asarray(points)   # host numpy in => traced indexing works
    n = points.shape[0]
    if mask is not None:
        # Push dead points to the far corner so they sort away from live ones.
        far = jnp.max(points, axis=0) + 10.0 * (
            jnp.max(points, axis=0) - jnp.min(points, axis=0) + 1.0)
        pts = jnp.where(mask[:, None], points, far[None, :])
    else:
        pts = points

    cands = []
    for i in range(n_orders):
        rot_pts = pts @ _order_rotation(i).T if i else pts
        codes = morton_codes(rot_pts)
        order = jnp.argsort(codes).astype(jnp.int32)
        cands.append(_window_candidates(order, window))
    cand = jnp.concatenate(cands, axis=1)        # [N, n_orders*window]

    d, i = _chunked_best_k(pts, mask, k, cand,
                           min(row_chunk,
                               _row_chunk_for(n_orders * window)),
                           dedup=n_orders > 1)

    # NN-descent refinement. k*k candidate blocks are ~4x smaller than the
    # window phase's, so rounds are cheap relative to phase 1.
    refine_chunk = max(1, (row_chunk * window * n_orders) // max(k * k, 1))
    refine_chunk = min(refine_chunk, _row_chunk_for(k + k * k))
    for _ in range(refine_rounds):
        d, i = _chunked_refine(pts, mask, k, i, refine_chunk)
    return d, i


def knn_index_subset(points: jnp.ndarray, k: int, neighbor_mask: jnp.ndarray,
                     **kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN where only flagged points may be returned as neighbours.

    Parity with simple-knn's `distIndexQ` (simple_knn.cu:524-651): a
    query-subset KNN restricted to a flagged neighbour subset; here the
    restriction is the window search's mask argument."""
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
    d2, _ = knn(points, 2, window=window, mask=mask, n_orders=2)
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
    return jnp.sum(d2, axis=1) / 3.0
