"""Audio / music generation pipeline glue + LDM scaffold utilities.

Covers the reference's latent-diffusion scaffolding for lumina_audio /
lumina_music (SURVEY.md §2.7):

- beta schedules + DDIM timestep/sigma tables (`models/diffusion/util.py:23-309`)
  and a `lax.scan` DDIM sampler (`models/diffusion/ddim.py:9-319`, the legacy
  pre-CFM path);
- `instantiate_from_config` / `get_obj_from_str` target-string factories
  (`models/util.py:109-126`) for OmegaConf-style YAML configs;
- `LambdaLinearScheduler` warmup LR (`models/lr_scheduler.py:4-82`);
- the generation flow (`demo_music.py:40-392`): text -> (CLAP/)T5 features ->
  CFM sample over FlagDiT-1D -> 1-D VAE decode -> BigVGAN vocoder -> wav.
"""

from __future__ import annotations

import importlib
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# beta schedules + DDIM tables (`models/diffusion/util.py`)
# ---------------------------------------------------------------------------


def make_beta_schedule(schedule: str, n_timestep: int, linear_start=1e-4, linear_end=2e-2,
                       cosine_s=8e-3):
    if schedule == "linear":
        betas = np.linspace(linear_start**0.5, linear_end**0.5, n_timestep,
                            dtype=np.float64) ** 2
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas.astype(np.float64)


def make_ddim_timesteps(ddim_discr_method: str, num_ddim_timesteps: int,
                        num_ddpm_timesteps: int):
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif ddim_discr_method == "quad":
        ddim_timesteps = (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8),
                                      num_ddim_timesteps) ** 2).astype(int)
    else:
        raise NotImplementedError(ddim_discr_method)
    return ddim_timesteps + 1


def make_ddim_sampling_parameters(alphacums, ddim_timesteps, eta: float):
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


def extract_into_tensor(a, t, x_shape):
    out = jnp.take(jnp.asarray(a), t)
    return out.reshape(t.shape[0], *([1] * (len(x_shape) - 1)))


def ddim_sample(rng, model_fn: Callable, shape, *, num_ddpm_timesteps=1000,
                num_steps=50, eta=0.0, beta_schedule="linear", cfg_fn=None):
    """Legacy DDIM sampler as a lax.scan (`ddim.py:9-319`); model_fn predicts
    eps(x, t_int). `cfg_fn`, when given, replaces model_fn as the eps
    predictor — the classifier-free-guided combination the reference builds
    in `p_sample_ddim` (`ddim.py:230-246`).

    Timesteps keep the reference's deliberate +1 (`util.py:54-55`, "add one
    to get the final alpha values right"): the model is conditioned at
    t in {1, c+1, ...} and alphas indexed there, with alphas_prev anchored
    at alphacums[0] — the final step is a REAL denoise to the data scale
    (subtracting 1 instead would make the last step an identity update)."""
    betas = make_beta_schedule(beta_schedule, num_ddpm_timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas)
    ts = make_ddim_timesteps("uniform", num_steps, num_ddpm_timesteps)
    sigmas, a_t, a_prev = make_ddim_sampling_parameters(alphas_cumprod, ts, eta)

    x = jax.random.normal(rng, shape)
    seq = jnp.asarray(np.stack([ts, a_t, a_prev, sigmas], axis=1)[::-1].copy(), jnp.float32)
    eps_fn = cfg_fn if cfg_fn is not None else model_fn

    def step(carry, row):
        x, key = carry
        t, at, aprev, sigma = row[0], row[1], row[2], row[3]
        b = x.shape[0]
        eps = eps_fn(x, jnp.full((b,), t))
        pred_x0 = (x - jnp.sqrt(1.0 - at) * eps) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - aprev - sigma**2, 0.0)) * eps
        key, sub = jax.random.split(key)
        noise = sigma * jax.random.normal(sub, x.shape)
        x = jnp.sqrt(aprev) * pred_x0 + dir_xt + noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, rng), seq)
    return x


# ---------------------------------------------------------------------------
# config-string factory (`models/util.py:109-126`)
# ---------------------------------------------------------------------------


def get_obj_from_str(string: str, reload: bool = False):
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config):
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    return get_obj_from_str(config["target"])(**config.get("params", {}))


# ---------------------------------------------------------------------------
# LR schedule (`models/lr_scheduler.py:4-82`)
# ---------------------------------------------------------------------------


def lambda_linear_schedule(warm_up_steps, f_min, f_max, f_start, cycle_lengths,
                           verbosity_interval: int = 0):
    """`LambdaLinearScheduler` with the reference's full cycle-list
    semantics (`models/lr_scheduler.py:37-59,85-104`): each of the five
    arguments is a per-cycle list (scalars are promoted to one cycle); the
    active cycle is the first whose cumulative end >= step (inclusive, like
    `find_in_interval`'s `n <= cl`); within a cycle: linear warmup
    f_start -> f_max over warm_up_steps, then linear decay
    f_min + (f_max - f_min) * (L - n) / L — deliberately NOT clamped at
    f_min, matching the reference (which applies no min()). Steps beyond the
    last cycle stay in it (the reference would crash there; training never
    exceeds the configured total)."""
    as_list = lambda v: list(v) if isinstance(v, (list, tuple)) else [v]
    wu, fmn, fmx, fst, cl = (as_list(v) for v in
                             (warm_up_steps, f_min, f_max, f_start, cycle_lengths))
    assert len(wu) == len(fmn) == len(fmx) == len(fst) == len(cl), \
        "all five schedule arguments must have the same number of cycles"
    cum = np.cumsum([0] + cl)
    wu_a, fmn_a, fmx_a, fst_a, cl_a = (jnp.asarray(v, jnp.float32)
                                       for v in (wu, fmn, fmx, fst, cl))
    ends = jnp.asarray(cum[1:], jnp.float32)
    starts = jnp.asarray(cum[:-1], jnp.float32)

    def f(step):
        s = jnp.asarray(step, jnp.float32)
        cycle = jnp.clip(jnp.sum(s > ends), 0, len(cl) - 1)
        n = s - starts[cycle]
        if verbosity_interval > 0 and not isinstance(step, jax.core.Tracer):
            if int(step) % verbosity_interval == 0:
                import logging

                logging.getLogger(__name__).info(
                    f"lr schedule: step {int(step)} cycle {int(cycle)}")
        warm = fst_a[cycle] + (fmx_a[cycle] - fst_a[cycle]) * n / jnp.maximum(wu_a[cycle], 1.0)
        decay = fmn_a[cycle] + (fmx_a[cycle] - fmn_a[cycle]) * (cl_a[cycle] - n) / cl_a[cycle]
        return jnp.where(n < wu_a[cycle], warm, decay)

    return f


# ---------------------------------------------------------------------------
# End-to-end generation (`demo_music.py:40-392` GenSamples path)
# ---------------------------------------------------------------------------


def generate_audio(
    rng,
    denoiser_fn: Callable,
    vae_decode_fn: Callable,
    vocoder_fn: Optional[Callable],
    *,
    cond,
    uncond,
    latent_shape,
    guidance_scale: float = 3.0,
    num_steps: int = 25,
    solver: str = "euler",
    scale_factor: float = 1.0,
):
    """cond/uncond text features -> CFM latent sample -> mel decode -> wav.

    denoiser_fn(x, t_int, context) is the FlagDiT-1D apply;
    vae_decode_fn(z) -> mel; vocoder_fn(mel) -> waveform (optional).

    scale_factor is the LDM latent scaling (`ddpm.py:773` decode_first_stage
    computes z/scale_factor before the VAE; the shipped configs use
    `scale_by_std: true` so trained checkpoints carry a non-1 value in their
    `scale_factor` buffer) — pass it or decoded mels come out at the wrong
    amplitude scale.
    """
    from ..transport.cfm import CFM

    cfm = CFM()
    z = cfm.sample_cfg(
        rng, denoiser_fn, latent_shape, cond, uncond,
        guidance_scale=guidance_scale, num_steps=num_steps, solver=solver,
    )
    mel = vae_decode_fn(z / scale_factor)
    if vocoder_fn is None:
        return mel, None
    return mel, vocoder_fn(mel)
