"""Capacity-padded state surgery for densification events.

All training state (parameters, Adam moments, densification accumulators,
per-Gaussian degrees) lives in arrays of a fixed capacity C with the first
`n_alive` slots live. Densify/prune events are jitted, static-shape ops:
additions scatter into free slots (with mode='drop' overflow detection),
removals compact via a stable argsort gather. This replaces the reference's
torch optimizer-state editing (vanilla `cat_tensors_to_optimizer` /
`_prune_optimizer`) without ever changing array shapes — shape changes (and
hence recompiles) happen only on rare capacity growth.
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..config import CAPACITY_GRANULARITY


def bucket_capacity(n: int, granularity: int = CAPACITY_GRANULARITY,
                    headroom: float = 1.3) -> int:
    """Capacity bucket: headroom, then round up to the next sqrt(2)-spaced
    tier (multiples of the granularity). Tiers keep the number of distinct
    compiled shapes logarithmic in N while capping padding waste at ~41%
    (power-of-two tiers wasted up to 2x, which every per-Gaussian op pays)."""
    target = max(int(n * headroom), granularity)
    cap = granularity
    while cap < target:
        cap = -(-int(cap * 1.4142135) // granularity) * granularity
    return cap


def pad_axis0(tree: Any, capacity: int) -> Any:
    def pad(a):
        if a.ndim == 0:
            return a
        extra = capacity - a.shape[0]
        if extra < 0:
            raise ValueError("capacity smaller than array")
        widths = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)
    return jax.tree.map(pad, tree)


def alive_mask(capacity: int, n_alive) -> jnp.ndarray:
    return jnp.arange(capacity) < n_alive


def mask_rows(tree: Any, keep: jnp.ndarray) -> Any:
    """Zero rows where keep is False.

    MULTIPLY by a 0/1 mask, not `where`: where-masking all six gradient
    leaves against the shared bool vector compiled ~24 ms/step slower on
    v5e (tools/bisect_mask.py, r03). Caveat from that round: the
    double-where normalization hardening that originally enabled multiply
    relocated the same ~23 ms into grad(base) itself — the select against
    a shared vector is the pathological shape wherever it appears. The
    forward therefore uses select-free additive-eps guards
    (rsqrt(|v|^2 + eps^2)) so dead-row values stay FINITE with no where:
    projection.project_points w+1e-7, build_cov2d tz gate,
    GaussianModel.get_rotation / render_array_args rsqrt norm,
    sh.normalize_dirs rsqrt (invert_cov2d keeps its double-where — it
    guards a measure-zero det==0, not the shared alive vector). Finiteness
    is asserted by tests/test_step_many.py::test_dead_row_grads_finite;
    BISECT_r04.json re-measures grad(base) after the rsqrt fix.

    Safety net (ADVICE r03): the multiply form turns any non-finite
    dead-row gradient into NaN (0*inf) and silently NaNs parameters via
    Adam; the invariant rests on every forward path keeping dead rows
    finite. R3DGS_SAFE_MASK=1 switches back to the where form for
    debugging a NaN'd run — slower, but discards dead-row garbage.
    """
    safe = os.environ.get("R3DGS_SAFE_MASK", "0") == "1"

    def f(a):
        if a.ndim == 0:
            return a
        shape = (keep.shape[0],) + (1,) * (a.ndim - 1)
        if safe:
            return jnp.where(keep.reshape(shape), a, jnp.zeros_like(a))
        return a * keep.reshape(shape).astype(a.dtype)
    return jax.tree.map(f, tree)


def compact(tree: Any, keep: jnp.ndarray, n_alive) -> Tuple[Any, jnp.ndarray]:
    """Stable compaction: kept rows move to the front preserving order.

    Returns (gathered tree with non-kept rows zeroed, new n_alive).
    keep must already be False for rows >= n_alive.
    """
    c = keep.shape[0]
    # stable: sort by (not keep) with index tiebreaker
    perm = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    new_n = jnp.sum(keep.astype(jnp.int32))
    live = alive_mask(c, new_n)

    def g(a):
        if a.ndim == 0:
            return a
        out = a[perm]
        shape = (c,) + (1,) * (a.ndim - 1)
        return out * live.reshape(shape).astype(a.dtype)
    return jax.tree.map(g, tree), new_n


def scatter_append(tree: Any, values: Any, select: jnp.ndarray, n_alive,
                   copies: int = 1):
    """Append `copies` transformed rows per selected row into free slots.

    Args:
      tree: state pytree of [C, ...] arrays.
      values: pytree like `tree` holding, per leaf, a [C, copies, ...] array of
        the rows to append for every selected source row (ignored where
        ~select).
      select: [C] bool source-selection mask.
      n_alive: current live count.

    Returns:
      (new_tree, new_n_alive, overflow): rows land at
      n_alive + copies*rank(select) + j; writes beyond capacity are dropped
      and flagged.
    """
    c = select.shape[0]
    rank = jnp.cumsum(select.astype(jnp.int32)) - 1          # [C]
    num_sel = jnp.sum(select.astype(jnp.int32))
    base = n_alive + copies * rank
    new_n = n_alive + copies * num_sel
    overflow = new_n > c

    def g(a, vals):
        if a.ndim == 0:
            return a
        out = a
        for j in range(copies):
            dest = jnp.where(select, base + j, c)            # c -> dropped
            out = out.at[dest].set(vals[:, j], mode="drop")
        return out

    new_tree = jax.tree.map(g, tree, values)
    return new_tree, jnp.minimum(new_n, c), overflow


def duplicate_values(tree: Any, copies: int = 1) -> Any:
    """values pytree for scatter_append that just duplicates source rows."""
    def f(a):
        if a.ndim == 0:
            return a
        return jnp.broadcast_to(a[:, None], (a.shape[0], copies) + a.shape[1:])
    return jax.tree.map(f, tree)
