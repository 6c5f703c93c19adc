"""Mini transport: the collapsed single-file flow API of lumina_next_t2i_mini
(`lumina_next_t2i_mini/transport.py:1-111`), covering the SD3 integration
path and img2img schedule truncation.

- `training_losses_mini`: pure linear-path velocity MSE with uniform t
  (`transport.py:20-54`);
- `MiniODE`: Lumina mode integrates forward t: 0 -> 1 with the t-shift warp;
  SD3 mode reverses time (t: 1 -> 0), applies the *SD3-style* shift
  t -> f t / (1 + (f-1) t), scales timesteps by 1000, and folds CFG into the
  drift with uncond-first chunking (`transport.py:70-107`);
- `strength` truncates the schedule for img2img (`transport.py:79-80`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .solvers import odeint_fixed


def training_losses_mini(rng, model_fn: Callable, x1, loss_mask=None):
    """Linear-path velocity MSE, uniform t (`transport.py:20-54`)."""
    t_rng, noise_rng = jax.random.split(rng)
    b = x1.shape[0]
    t = jax.random.uniform(t_rng, (b,))
    x0 = jax.random.normal(noise_rng, x1.shape, x1.dtype)
    t_ = t.reshape(b, *([1] * (x1.ndim - 1)))
    xt = t_ * x1 + (1.0 - t_) * x0
    ut = x1 - x0
    out = model_fn(xt, t)
    sq = (out.astype(jnp.float32) - ut.astype(jnp.float32)) ** 2
    if loss_mask is not None:
        m = loss_mask.astype(jnp.float32)
        loss = jnp.sum((sq * m).reshape(b, -1), -1) / jnp.maximum(jnp.sum(m.reshape(b, -1), -1), 1.0)
    else:
        loss = jnp.mean(sq.reshape(b, -1), axis=-1)
    return {"loss": loss}


class MiniODE:
    def __init__(self, num_steps: int, sampler_type: str = "euler",
                 time_shifting_factor: Optional[float] = None, t0: float = 0.0,
                 t1: float = 1.0, use_sd3: bool = False, strength: float = 1.0):
        if use_sd3:
            t = jnp.linspace(t1, t0, num_steps)
            if time_shifting_factor:
                t = (time_shifting_factor * t) / (1.0 + (time_shifting_factor - 1.0) * t)
        else:
            t = jnp.linspace(t0, t1, num_steps)
            if time_shifting_factor:
                t = t / (t + time_shifting_factor - time_shifting_factor * t)
        if strength != 1.0:
            t = t[int(num_steps * (1.0 - strength)):]
        self.t = t
        self.use_sd3 = use_sd3
        self.sampler_type = sampler_type

    def sample(self, x, model_fn: Callable, cfg_scale: Optional[float] = None,
               return_all: bool = False):
        """Lumina mode: model_fn(x, t_batch). SD3 mode: model_fn(x, t*1000)
        with in-loop CFG over duplicated halves (uncond, cond chunks)."""
        b = x.shape[0]

        if not self.use_sd3:
            def drift(xx, t_scalar):
                return model_fn(xx, jnp.full((b,), t_scalar))
        else:
            assert cfg_scale is not None

            def drift(xx, t_scalar):
                t = jnp.full((b,), t_scalar * 1000.0)
                half = xx[: b // 2]
                xx2 = jnp.concatenate([half, half], axis=0)
                out = model_fn(xx2, t)
                uncond, cond = jnp.split(out, 2, axis=0)
                guided = uncond + cfg_scale * (cond - uncond)
                return jnp.concatenate([guided, guided], axis=0)

        return odeint_fixed(drift, x, self.t, method=self.sampler_type, return_all=return_all)
