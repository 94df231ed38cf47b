"""Explicit Adam with per-leaf learning rates and a prunable state tree.

The reference relies on torch.optim.Adam with per-param-group LRs and
manually edits `exp_avg`/`exp_avg_sq` when points are added or removed
(vanilla-3DGS `cat_tensors_to_optimizer` / `_prune_optimizer`, inherited via
the base package). We keep the state as an explicit pytree so densify/prune
events can gather/scatter it with the parameters in one jitted op.

Hyperparameters follow vanilla 3DGS: betas (0.9, 0.999), eps 1e-15.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: jnp.ndarray            # scalar int32
    m: Any                        # pytree like params
    v: Any                        # pytree like params


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), m=zeros,
                     v=jax.tree.map(jnp.zeros_like, params))


def adam_update(params, grads, state: AdamState, lr_tree,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """One Adam step. `lr_tree` matches the params pytree structure (leaves
    may be python floats or traced scalars)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    new_m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.m, grads)
    new_v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * (g * g), state.v, grads)

    def apply(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree.map(apply, params, new_m, new_v, lr_tree)
    return new_params, AdamState(count=count, m=new_m, v=new_v)
