"""Flow-matching transport: training losses and samplers.

Functional JAX re-design of the reference transport module
(`lumina_next_t2i/transport/transport.py:41-450`). Differences from the
reference are deliberate TPU idioms:

- everything is a pure function of (rng, params, inputs) — no hidden state;
- model callables have signature `model_fn(x, t) -> out` with `t` of shape
  (B,), and are expected to close over parameters / conditioning;
- samplers return functions whose whole denoise loop is one `lax.scan` /
  `lax.while_loop` graph (compiled once, no per-step dispatch);
- classifier-free guidance is folded into the drift function (like the mini
  pipeline's SD3 path, `lumina_next_t2i_mini/transport.py:96-107`).
"""

from __future__ import annotations

import enum
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import path as path_mod
from .solvers import make_time_grid, odeint_adaptive, odeint_dopri8, odeint_fixed, sdeint


class ModelType(enum.Enum):
    NOISE = enum.auto()
    SCORE = enum.auto()
    VELOCITY = enum.auto()


class PathType(enum.Enum):
    LINEAR = enum.auto()
    GVP = enum.auto()
    VP = enum.auto()


class WeightType(enum.Enum):
    NONE = enum.auto()
    VELOCITY = enum.auto()
    LIKELIHOOD = enum.auto()


_PATHS = {
    PathType.LINEAR: path_mod.LinearPath,
    PathType.GVP: path_mod.GVPPath,
    PathType.VP: path_mod.VPPath,
}


def sample_t(rng, batch: int, snr_type: str = "uniform", t0: float = 0.0, t1: float = 1.0):
    """Sample training times according to `snr_type`.

    Supports uniform / uniform_{t0}_{t1} / lognorm / shift_{f}
    (`transport.py:106-126`).
    """
    if snr_type.startswith("uniform"):
        if "_" in snr_type:
            _, lo, hi = snr_type.split("_")
            t0, t1 = float(lo), float(hi)
        t = jax.random.uniform(rng, (batch,)) * (t1 - t0) + t0
    elif snr_type == "lognorm":
        u = jax.random.normal(rng, (batch,))
        t = jax.nn.sigmoid(u) * (t1 - t0) + t0
    elif snr_type.startswith("shift"):
        try:
            shift_factor = float(snr_type.split("_")[1])
        except Exception:
            raise ValueError(
                f"illegal snr_type: {snr_type}; time shift should be shift_{{factor}}, like shift_3.0"
            )
        t = jax.random.uniform(rng, (batch,))
        t = (shift_factor * t) / (1.0 + (shift_factor - 1.0) * t)
    else:
        raise ValueError(f"Unknown snr type: {snr_type}")
    return t


def mean_flat(x):
    return jnp.mean(x.reshape(x.shape[0], -1), axis=-1)


class Transport:
    """Holds the (static) transport configuration; all methods are pure."""

    def __init__(self, *, model_type, path_type, loss_type, train_eps, sample_eps, snr_type):
        self.model_type = model_type
        self.path_type = path_type
        self.loss_type = loss_type
        self.path_sampler = _PATHS[path_type]()
        self.train_eps = train_eps
        self.sample_eps = sample_eps
        self.snr_type = snr_type

    # -- intervals ----------------------------------------------------------

    def check_interval(self, train_eps, sample_eps, *, diffusion_form="SBDM", sde=False,
                       reverse=False, eval=False, last_step_size=0.0):
        """Integration interval selection (`transport.py:67-93`)."""
        t0, t1 = 0.0, 1.0
        eps = train_eps if not eval else sample_eps
        if self.path_type == PathType.VP:
            t1 = 1.0 - eps if (not sde or last_step_size == 0) else 1.0 - last_step_size
        elif self.path_type in (PathType.LINEAR, PathType.GVP) and (
            self.model_type != ModelType.VELOCITY or sde
        ):
            t0 = eps if (diffusion_form == "SBDM" and sde) or self.model_type != ModelType.VELOCITY else 0
            t1 = 1.0 - eps if (not sde or last_step_size == 0) else 1.0 - last_step_size
        if reverse:
            t0, t1 = 1.0 - t0, 1.0 - t1
        return t0, t1

    # -- prior --------------------------------------------------------------

    def prior_logp(self, z):
        """Standard normal log-density per batch element (`transport.py:57-65`)."""
        z = z.reshape(z.shape[0], -1)
        n = z.shape[1]
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(z**2, axis=-1) / 2.0

    # -- training -----------------------------------------------------------

    def training_losses(self, rng, model_fn: Callable, x1, loss_mask=None):
        """Velocity-matching MSE loss (`transport.py:130-164`).

        Args:
          rng: PRNG key; split internally for t and noise.
          model_fn: (x_t, t) -> prediction; closes over params + conditioning.
          x1: data batch (B, ...). Variable-resolution batches are handled by
            passing `loss_mask` (B, ...) with 1 on valid pixels — the TPU
            replacement for the reference's per-item python lists
            (`transport.py:147-158`): items are padded to the bucket shape and
            masked out of the per-item mean.
        Returns dict with "loss" (B,) and "task_loss" (B,).
        """
        t_rng, noise_rng = jax.random.split(rng)
        b = x1.shape[0]
        t0, t1 = self.check_interval(self.train_eps, self.sample_eps)
        t = sample_t(t_rng, b, self.snr_type, t0, t1)
        x0 = jax.random.normal(noise_rng, x1.shape, x1.dtype)
        xt, ut = self.path_sampler.interpolant(t, x0, x1)
        model_output = model_fn(xt, t)
        if self.model_type != ModelType.VELOCITY:
            raise NotImplementedError("training is defined for velocity models only (as in the reference)")
        sq = (model_output.astype(jnp.float32) - ut.astype(jnp.float32)) ** 2
        if loss_mask is not None:
            m = loss_mask.astype(jnp.float32)
            task_loss = jnp.sum((sq * m).reshape(b, -1), axis=-1) / jnp.maximum(
                jnp.sum(m.reshape(b, -1), axis=-1), 1.0
            )
        else:
            task_loss = mean_flat(sq)
        return {"loss": task_loss, "task_loss": jax.lax.stop_gradient(task_loss)}

    # -- drift / score ------------------------------------------------------

    def get_drift(self):
        """Probability-flow ODE drift (`transport.py:166-197`)."""

        def score_ode(x, t, model_fn):
            drift_mean, drift_var = self.path_sampler.drift(x, t)
            return -drift_mean + drift_var * model_fn(x, t)

        def noise_ode(x, t, model_fn):
            drift_mean, drift_var = self.path_sampler.drift(x, t)
            sigma_t, _ = self.path_sampler.sigma_t(path_mod.expand_t_like_x(t, x))
            score = model_fn(x, t) / -sigma_t
            return -drift_mean + drift_var * score

        def velocity_ode(x, t, model_fn):
            return model_fn(x, t)

        if self.model_type == ModelType.NOISE:
            return noise_ode
        if self.model_type == ModelType.SCORE:
            return score_ode
        return velocity_ode

    def get_score(self):
        """Score function under the chosen parameterization (`transport.py:199-218`)."""
        if self.model_type == ModelType.NOISE:
            return lambda x, t, model_fn: model_fn(x, t) / -self.path_sampler.sigma_t(
                path_mod.expand_t_like_x(t, x)
            )[0]
        if self.model_type == ModelType.SCORE:
            return lambda x, t, model_fn: model_fn(x, t)
        if self.model_type == ModelType.VELOCITY:
            return lambda x, t, model_fn: self.path_sampler.velocity_to_score(model_fn(x, t), x, t)
        raise NotImplementedError()


class Sampler:
    """Sampling-side companion to Transport (`transport.py:221-450`)."""

    def __init__(self, transport: Transport):
        self.transport = transport
        self.drift = transport.get_drift()
        self.score = transport.get_score()

    # -- ODE ----------------------------------------------------------------

    def time_grid(self, num_steps: int, time_shifting_factor=None, reverse=False):
        """The ODE time grid sample_ode integrates over (exposed so callers
        can drive the trajectory in slices, see `odeint_fixed`)."""
        t0, t1 = self.transport.check_interval(
            self.transport.train_eps, self.transport.sample_eps, sde=False,
            eval=True, reverse=reverse, last_step_size=0.0,
        )
        return make_time_grid(t0, t1, num_steps, time_shifting_factor)

    def sample_ode(self, *, sampling_method="dopri5", num_steps=50, atol=1e-6, rtol=1e-3,
                   reverse=False, time_shifting_factor=None, return_all=False):
        """Return `sample_fn(x_init, model_fn) -> samples`.

        The returned function is jit-compatible end to end; `model_fn(x, t)`
        receives t of shape (B,).
        """
        transport = self.transport
        base_drift = self.drift

        if reverse:
            drift = lambda x, t, model_fn: base_drift(x, jnp.ones_like(t) * (1.0 - t), model_fn)
        else:
            drift = base_drift

        ts = self.time_grid(num_steps, time_shifting_factor, reverse=reverse)
        adaptive = sampling_method.lower() in ("dopri5", "dopri8", "adaptive")

        def sample_fn(x, model_fn):
            b = jax.tree.leaves(x)[0].shape[0]

            def f(xx, t_scalar):
                return drift(xx, jnp.full((b,), t_scalar, dtype=jnp.float32), model_fn)

            if adaptive:
                solver = odeint_dopri8 if sampling_method.lower() == "dopri8" else odeint_adaptive
                return solver(f, x, ts, atol=atol, rtol=rtol, return_all=return_all)
            return odeint_fixed(f, x, ts, method=sampling_method, return_all=return_all)

        return sample_fn

    # -- SDE ----------------------------------------------------------------

    def _sde_drift_diffusion(self, diffusion_form, diffusion_norm):
        def diffusion_fn(x, t, model_fn):
            return self.transport.path_sampler.diffusion(x, t, form=diffusion_form, norm=diffusion_norm)

        def sde_drift(x, t, model_fn):
            return self.drift(x, t, model_fn) + diffusion_fn(x, t, model_fn) * self.score(x, t, model_fn)

        return sde_drift, diffusion_fn

    def _last_step_fn(self, sde_drift, last_step, last_step_size):
        """Configurable final step (`transport.py:255-283`)."""
        if last_step is None:
            return lambda x, t, model_fn: x
        if last_step == "Mean":
            return lambda x, t, model_fn: x + sde_drift(x, t, model_fn) * last_step_size
        if last_step == "Tweedie":
            alpha = self.transport.path_sampler.alpha_t
            sigma = self.transport.path_sampler.sigma_t
            return lambda x, t, model_fn: x / alpha(t)[0][0] + (sigma(t)[0][0] ** 2) / alpha(t)[0][
                0
            ] * self.score(x, t, model_fn)
        if last_step == "Euler":
            return lambda x, t, model_fn: x + self.drift(x, t, model_fn) * last_step_size
        raise NotImplementedError(last_step)

    def sample_sde(self, *, sampling_method="Euler", diffusion_form="SBDM", diffusion_norm=1.0,
                   last_step="Mean", last_step_size=0.04, num_steps=250):
        """Return `sample_fn(rng, x_init, model_fn) -> x_final` (`transport.py:285-344`)."""
        if last_step is None:
            last_step_size = 0.0
        sde_drift, sde_diffusion = self._sde_drift_diffusion(diffusion_form, diffusion_norm)
        t0, t1 = self.transport.check_interval(
            self.transport.train_eps, self.transport.sample_eps,
            diffusion_form=diffusion_form, sde=True, eval=True, reverse=False,
            last_step_size=last_step_size,
        )
        ts = make_time_grid(t0, t1, num_steps)
        last_fn = self._last_step_fn(sde_drift, last_step, last_step_size)

        def sample_fn(rng, x, model_fn):
            b = jax.tree.leaves(x)[0].shape[0]

            def batched(fn):
                return lambda xx, t_scalar: fn(xx, jnp.full((b,), t_scalar, dtype=jnp.float32), model_fn)

            x_last, _ = sdeint(
                batched(sde_drift), batched(sde_diffusion), x, ts, rng,
                method=sampling_method.lower(),
            )
            t_last = jnp.full((b,), t1, dtype=jnp.float32)
            return last_fn(x_last, t_last, model_fn)

        return sample_fn

    # -- likelihood ---------------------------------------------------------

    def sample_ode_likelihood(self, *, sampling_method="dopri5", num_steps=50, atol=1e-6, rtol=1e-3):
        """Hutchinson-estimator exact likelihood (`transport.py:393-450`).

        Uses forward-mode `jax.jvp` for the Jacobian-vector product (cheaper
        than the reference's autograd vjp construction).
        """
        transport = self.transport
        drift = self.drift

        t0, t1 = transport.check_interval(
            transport.train_eps, transport.sample_eps, sde=False, eval=True,
            reverse=False, last_step_size=0.0,
        )
        ts = make_time_grid(t0, t1, num_steps)
        adaptive = sampling_method.lower() in ("dopri5", "dopri8", "adaptive")

        def sample_fn(rng, x, model_fn):
            b = x.shape[0]
            eps = jax.random.rademacher(rng, x.shape, dtype=x.dtype)

            def f(state, t_scalar):
                xx, _ = state
                t = jnp.full((b,), 1.0 - t_scalar, dtype=jnp.float32)
                fdrift = lambda z: drift(z, t, model_fn)
                d, jvp_out = jax.jvp(fdrift, (xx,), (eps,))
                logp_grad = jnp.sum((jvp_out * eps).reshape(b, -1), axis=-1)
                return (-d, logp_grad)

            init = (x, jnp.zeros((b,), x.dtype))
            if adaptive:
                solver = odeint_dopri8 if sampling_method.lower() == "dopri8" else odeint_adaptive
                z_final, delta_logp = solver(f, init, ts, atol=atol, rtol=rtol)
            else:
                z_final, delta_logp = odeint_fixed(f, init, ts, method=sampling_method)
            prior_logp = transport.prior_logp(z_final)
            logp = prior_logp - delta_logp
            return logp, z_final

        return sample_fn
