"""Classifier-free guidance wrappers.

The reference implements CFG inside each model's `forward_with_cfg`
(`lumina_next_t2i/models/model.py:866-913`): the conditional half-batch is
duplicated, run together with the unconditional rows, and guidance is applied
to the first 3 channels only. Here CFG is a model-agnostic functional wrapper
so any denoiser can be guided, and the whole guided drift stays inside the
jitted sampling scan.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def cfg_wrapper(model_fn: Callable, cfg_scale: float, num_cfg_channels: int = 3):
    """Wrap `model_fn(x, t)` for duplicated-batch CFG.

    Expects x of shape (2B, ...) where rows [0:B] are conditional and rows
    [B:2B] unconditional (conditioning is baked into model_fn). Guidance is
    applied to the first `num_cfg_channels` channels (channel axis 1), matching
    the reference's 3-channel convention (`model.py:908`); pass
    num_cfg_channels=-1 to guide all channels.
    """

    def guided(x, t):
        b2 = x.shape[0]
        b = b2 // 2
        half = x[:b]
        combined = jnp.concatenate([half, half], axis=0)
        out = model_fn(combined, t)
        nc = out.shape[1] if num_cfg_channels in (-1, None) else num_cfg_channels
        eps, rest = out[:, :nc], out[:, nc:]
        cond_eps, uncond_eps = eps[:b], eps[b:]
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=1)

    return guided


def cfg_interval_wrapper(model_fn: Callable, cfg_scale: float, num_cfg_channels: int = 3,
                         t_low: float = 0.0, t_high: float = 1.0):
    """CFG active only within [t_low, t_high] (guidance-interval trick)."""
    guided = cfg_wrapper(model_fn, cfg_scale, num_cfg_channels)
    unguided = cfg_wrapper(model_fn, 1.0, num_cfg_channels)

    def fn(x, t):
        active = jnp.logical_and(t[0] >= t_low, t[0] <= t_high)
        return jax.lax.cond(active, lambda xx: guided(xx, t), lambda xx: unguided(xx, t), x)

    return fn
