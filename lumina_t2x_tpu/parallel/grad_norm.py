"""Gradient-norm utilities — API parity with `lumina_next_t2i/grad_norm.py:10-60`.

The reference hand-computes the global L2 grad norm under tensor parallelism:
TP-sharded params counted once across the mp group, replicated params divided
by mp size, two NCCL all-reduces (`grad_norm.py:31-53`). Under GSPMD none of
that bookkeeping exists — `optax.global_norm` over the sharded pytree is the
global norm, with XLA inserting the cross-shard reductions — but the same
function names are provided so reference-side training code maps 1:1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .sharding import model_parallel_dim_dict


def get_model_parallel_dim_dict(params) -> dict:
    """path -> TP-sharded dim (None if replicated) (`grad_norm.py:10-30`)."""
    return model_parallel_dim_dict(params)


def calculate_l2_grad_norm(grads, model_parallel_dim_dict=None) -> jax.Array:
    """Global L2 norm of the gradient pytree (`grad_norm.py:33-53`).

    `model_parallel_dim_dict` is accepted for signature parity and ignored:
    sharded arrays already represent the global tensor.
    """
    return optax.global_norm(grads)


def scale_grad(grads, factor):
    """Uniformly rescale gradients (`grad_norm.py:56-60`)."""
    return jax.tree.map(lambda g: g * factor, grads)


def clip_grad_norm(grads, max_norm: float, eps: float = 1e-6):
    """norm + clip in one call: grads * min(1, max_norm / (norm + eps))."""
    norm = calculate_l2_grad_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + eps))
    return scale_grad(grads, scale), norm
