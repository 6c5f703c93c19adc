"""Coupling plans (interpolant paths) for flow matching.

Defines the time-dependent interpolation x_t = alpha_t * x1 + sigma_t * x0
between noise (x0, t=0) and data (x1, t=1), and the conversions between
velocity / score / noise parameterizations.

Feature parity with the reference implementation's path definitions
(`lumina_next_t2i/transport/path.py:19-201`): Linear (ICPlan), VP (VPCPlan)
and GVP (GVPCPlan) plans, drift/diffusion terms for the associated SDE, and
the constant/SBDM/sigma/linear/decreasing/increasing-decreasing diffusion
forms. All math is pure jnp and safe under jit.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def expand_t_like_x(t, x):
    """Reshape a (B,) time vector for broadcasting against (B, ...) data."""
    return t.reshape(t.shape[0], *([1] * (x.ndim - 1)))


class LinearPath:
    """Linear coupling: alpha_t = t, sigma_t = 1 - t.

    Mirrors the behavior of ICPlan (`transport/path.py:19-144`).
    """

    def alpha_t(self, t):
        return t, jnp.ones_like(t)

    def sigma_t(self, t):
        return 1.0 - t, -jnp.ones_like(t)

    def d_alpha_alpha_ratio(self, t):
        return 1.0 / t

    def drift(self, x, t):
        """Score-parameterized SDE drift; returns (-drift_mean, diffusion_var)."""
        t = expand_t_like_x(t, x)
        alpha_ratio = self.d_alpha_alpha_ratio(t)
        sigma_t, d_sigma_t = self.sigma_t(t)
        drift = alpha_ratio * x
        diffusion = alpha_ratio * (sigma_t**2) - sigma_t * d_sigma_t
        return -drift, diffusion

    def diffusion(self, x, t, form="constant", norm=1.0):
        t = expand_t_like_x(t, x)
        if form == "constant":
            return jnp.full_like(t, norm)
        if form == "SBDM":
            return norm * self.drift(x, t)[1]
        if form == "sigma":
            return norm * self.sigma_t(t)[0]
        if form == "linear":
            return norm * (1.0 - t)
        if form == "decreasing":
            return 0.25 * (norm * jnp.cos(jnp.pi * t) + 1.0) ** 2
        if form == "increasing-decreasing":
            return norm * jnp.sin(jnp.pi * t) ** 2
        raise NotImplementedError(f"Diffusion form {form} not implemented")

    # ---- parameterization conversions -------------------------------------

    def velocity_to_score(self, velocity, x, t):
        t = expand_t_like_x(t, x)
        alpha_t, d_alpha_t = self.alpha_t(t)
        sigma_t, d_sigma_t = self.sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = sigma_t**2 - reverse_alpha_ratio * d_sigma_t * sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def velocity_to_noise(self, velocity, x, t):
        t = expand_t_like_x(t, x)
        alpha_t, d_alpha_t = self.alpha_t(t)
        sigma_t, d_sigma_t = self.sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = reverse_alpha_ratio * d_sigma_t - sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def score_to_velocity(self, score, x, t):
        drift_mean, var = self.drift(x, t)
        return var * score - drift_mean

    # ---- interpolant ------------------------------------------------------

    def interpolant(self, t, x0, x1):
        """Return (x_t, u_t): the point on the path and its velocity."""
        t = expand_t_like_x(t, x1)
        alpha_t, d_alpha_t = self.alpha_t(t)
        sigma_t, d_sigma_t = self.sigma_t(t)
        xt = alpha_t * x1 + sigma_t * x0
        ut = d_alpha_t * x1 + d_sigma_t * x0
        return xt, ut


class VPPath(LinearPath):
    """Variance-preserving path (`transport/path.py:147-180`)."""

    def __init__(self, sigma_min=0.1, sigma_max=20.0):
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def _log_mean_coeff(self, t):
        return -0.25 * ((1.0 - t) ** 2) * (self.sigma_max - self.sigma_min) - 0.5 * (1.0 - t) * self.sigma_min

    def _d_log_mean_coeff(self, t):
        return 0.5 * (1.0 - t) * (self.sigma_max - self.sigma_min) + 0.5 * self.sigma_min

    def alpha_t(self, t):
        alpha = jnp.exp(self._log_mean_coeff(t))
        d_alpha = alpha * self._d_log_mean_coeff(t)
        return alpha, d_alpha

    def sigma_t(self, t):
        p_sigma_t = 2.0 * self._log_mean_coeff(t)
        sigma = jnp.sqrt(1.0 - jnp.exp(p_sigma_t))
        d_sigma = jnp.exp(p_sigma_t) * (2.0 * self._d_log_mean_coeff(t)) / (-2.0 * sigma)
        return sigma, d_sigma

    def d_alpha_alpha_ratio(self, t):
        return self._d_log_mean_coeff(t)

    def drift(self, x, t):
        t = expand_t_like_x(t, x)
        beta_t = self.sigma_min + (1.0 - t) * (self.sigma_max - self.sigma_min)
        return -0.5 * beta_t * x, beta_t / 2.0


class GVPPath(LinearPath):
    """Generalized VP (trigonometric) path (`transport/path.py:183-201`)."""

    def alpha_t(self, t):
        return jnp.sin(t * jnp.pi / 2.0), jnp.pi / 2.0 * jnp.cos(t * jnp.pi / 2.0)

    def sigma_t(self, t):
        return jnp.cos(t * jnp.pi / 2.0), -jnp.pi / 2.0 * jnp.sin(t * jnp.pi / 2.0)

    def d_alpha_alpha_ratio(self, t):
        return jnp.pi / (2.0 * jnp.tan(t * jnp.pi / 2.0))
