"""Conditional flow matching (CFM) for audio / music.

TPU-native re-design of the reference's `CFM(LatentDiffusion_audio)`
(`lumina_music/models/diffusion/ddpm_audio.py:994-1164`, byte-duplicated in
lumina_audio):

- OT-CFM objective (`ddpm_audio.py:1001-1022`):
    u_t = x1 - (1 - sigma_min) x0
    x_t = t x1 + (1 - (1 - sigma_min) t) x0,     sigma_min = 1e-4,
  with t drawn as an integer step in [0, num_timesteps) and normalized;
- sampling (`ddpm_audio.py:1047-1057`): the reference wraps torchdyn
  `NeuralODE` (euler, 25 steps, t in [0,1], model receives t*1000 as a long
  tensor); here the trajectory is a `lax.scan` euler loop calling
  `model_fn(x, t_scaled)`;
- CFG via duplicated batch, uncond first (`Wrapper_cfg`,
  `ddpm_audio.py:1146-1163`):  e = e_uncond + w (e_cond - e_uncond);
- `t_start` truncation and `x_latent` warm-start (audio img2img analogue,
  `ddpm_audio.py:1103-1108`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .solvers import odeint_fixed


class CFM:
    def __init__(self, sigma_min: float = 1e-4, num_timesteps: int = 1000):
        self.sigma_min = sigma_min
        self.num_timesteps = num_timesteps

    def p_losses(self, rng, model_fn: Callable, x1, *, t=None):
        """OT-CFM MSE loss; model_fn(x_t, t_int) with t_int in [0, N)."""
        t_rng, noise_rng = jax.random.split(rng)
        b = x1.shape[0]
        if t is None:
            t = jax.random.randint(t_rng, (b,), 0, self.num_timesteps)
        x0 = jax.random.normal(noise_rng, x1.shape, x1.dtype)
        ut = x1 - (1.0 - self.sigma_min) * x0
        t_n = (t.astype(jnp.float32) / self.num_timesteps).reshape(b, *([1] * (x1.ndim - 1)))
        x_noisy = t_n * x1 + (1.0 - (1.0 - self.sigma_min) * t_n) * x0
        model_output = model_fn(x_noisy, t)
        loss = jnp.mean(
            (model_output.astype(jnp.float32) - ut.astype(jnp.float32)) ** 2,
            axis=tuple(range(1, x1.ndim)),
        )
        return {"loss": loss.mean(), "loss_simple": loss}

    def sample(self, rng, model_fn: Callable, shape, *, num_steps: int = 25,
               solver: str = "euler", t_start: Optional[int] = None, x_latent=None,
               return_traj: bool = False):
        """Integrate the flow from noise; model_fn(x, t_int_batch) as in
        training. Mirrors `CFM.sample` (`ddpm_audio.py:1025-1057`)."""
        ts = jnp.linspace(0.0, 1.0, num_steps)
        if t_start is not None:
            ts = ts[t_start:]
        x0 = jax.random.normal(rng, shape) if x_latent is None else x_latent
        b = x0.shape[0]

        def drift(x, t_scalar):
            t_int = jnp.full((b,), t_scalar * self.num_timesteps)
            return model_fn(x, t_int)

        return odeint_fixed(drift, x0, ts, method=solver, return_all=return_traj)

    def sample_cfg(self, rng, model_fn: Callable, shape, cond, uncond, *,
                   guidance_scale: float = 1.0, num_steps: int = 25, solver: str = "euler",
                   t_start: Optional[int] = None, x_latent=None):
        """CFG sampling (`Wrapper_cfg`, `ddpm_audio.py:1146-1163`):
        model_fn(x_in, t_in, c_in) with c_in = concat([uncond, cond])."""
        c_in = jnp.concatenate([uncond, cond], axis=0)

        def guided(x, t_int):
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t_int, t_int], axis=0)
            out = model_fn(x_in, t_in, c_in)
            e_uncond, e_cond = jnp.split(out, 2, axis=0)
            return e_uncond + guidance_scale * (e_cond - e_uncond)

        return self.sample(rng, guided, shape, num_steps=num_steps, solver=solver,
                           t_start=t_start, x_latent=x_latent)
