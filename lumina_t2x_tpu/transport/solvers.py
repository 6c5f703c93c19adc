"""ODE / SDE solvers compiled as single XLA programs.

TPU-native replacement for the reference's solver stack
(`lumina_next_t2i/transport/integrators.py:1-116`, which wraps
`torchdiffeq.odeint` for fixed-step euler/midpoint/rk4 and adaptive
dopri5/dopri8, plus hand-written Euler-Maruyama / Heun SDE loops):

- fixed-step solvers run as a `lax.scan` over the step grid so the whole
  denoise trajectory is one compiled graph (no per-step host dispatch);
- dopri5/dopri8 run a `lax.while_loop` with a PI step-size controller and
  torchdiffeq-matching dense output: save points are interpolated from the
  crossing step's Hermite polynomial, never clipping the step sequence;
- SDE solvers thread a PRNG key through the scan carry.

The time-shift warp t -> t / (t + f - f*t) matches
`integrators.py:97-99`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def time_shift(t, factor: Optional[float]):
    """Warp a time grid toward t=0 (`integrators.py:97-99`)."""
    if factor is None:
        return t
    return t / (t + factor - factor * t)


def make_time_grid(t0: float, t1: float, num_steps: int, time_shifting_factor: Optional[float] = None):
    t = jnp.linspace(t0, t1, num_steps)
    return time_shift(t, time_shifting_factor)


# ---------------------------------------------------------------------------
# Fixed-step ODE solvers (lax.scan)
# ---------------------------------------------------------------------------


def _axpy(x, a, k):
    """x + a * k over pytrees."""
    return jax.tree.map(lambda xx, kk: xx + a * kk, x, k)


def _euler_step(f, x, t, dt):
    return _axpy(x, dt, f(x, t))


def _midpoint_step(f, x, t, dt):
    k1 = f(x, t)
    return _axpy(x, dt, f(_axpy(x, 0.5 * dt, k1), t + 0.5 * dt))


def _heun_step(f, x, t, dt):
    k1 = f(x, t)
    k2 = f(_axpy(x, dt, k1), t + dt)
    return jax.tree.map(lambda xx, a, b: xx + 0.5 * dt * (a + b), x, k1, k2)


def _rk4_step(f, x, t, dt):
    k1 = f(x, t)
    k2 = f(_axpy(x, 0.5 * dt, k1), t + 0.5 * dt)
    k3 = f(_axpy(x, 0.5 * dt, k2), t + 0.5 * dt)
    k4 = f(_axpy(x, dt, k3), t + dt)
    return jax.tree.map(
        lambda xx, a, b, c, d: xx + dt / 6.0 * (a + 2.0 * b + 2.0 * c + d), x, k1, k2, k3, k4
    )


_FIXED_STEPPERS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "heun": _heun_step,
    "rk4": _rk4_step,
}


def odeint_fixed(
    drift_fn: Callable,
    x0,
    ts,
    method: str = "midpoint",
    return_all: bool = False,
):
    """Integrate dx/dt = drift_fn(x, t) along the grid `ts`.

    Args:
      drift_fn: (pytree x, scalar t) -> pytree dx/dt. `t` is a scalar traced
        value; the callee is responsible for broadcasting to the batch.
      x0: initial state (pytree of arrays).
      ts: (n,) array of time points; the solution is advanced over the n-1
        intervals. Matches torchdiffeq semantics where the returned trajectory
        includes the initial point.
      method: euler | midpoint | heun | rk4.
      return_all: if True, return the full (n, ...) trajectory; otherwise only
        the final state (what the sampling pipelines consume via `[-1]`,
        `sample.py:234`).
    """
    try:
        stepper = _FIXED_STEPPERS[method.lower()]
    except KeyError:
        raise NotImplementedError(f"Unknown fixed-step method: {method}")

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)

    def body(x, t_pair):
        t, t_next = t_pair[0], t_pair[1]
        x_next = stepper(drift_fn, x, t, t_next - t)
        return x_next, (x_next if return_all else None)

    x_final, ys = jax.lax.scan(body, x0, t_pairs)
    if return_all:
        return jax.tree.map(
            lambda first, rest: jnp.concatenate([first[None], rest], axis=0), x0, ys
        )
    return x_final


# ---------------------------------------------------------------------------
# Adaptive Runge-Kutta (Dormand-Prince) under lax.while_loop
# ---------------------------------------------------------------------------

# Dopri5 Butcher tableau (fp64 literals, cast at trace time).
_DOPRI5_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DOPRI5_A = [
    np.array([]),
    np.array([1 / 5]),
    np.array([3 / 40, 9 / 40]),
    np.array([44 / 45, -56 / 15, 32 / 9]),
    np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
_DOPRI5_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DOPRI5_B_ERR = _DOPRI5_B - np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


# torchdiffeq's dopri5 dense-output midpoint weights (`_impl/dopri5.py`
# DPS_C_MID): y(t + dt/2) ~= y0 + dt * sum(C_MID_i * k_i).
_DOPRI5_C_MID = np.array([
    6025192743 / 30085553152 / 2, 0.0, 51252292925 / 65400821598 / 2,
    -2691868925 / 45128329728 / 2, 187940372067 / 1594534317056 / 2,
    -1776094331 / 19743644256 / 2, 11237099 / 235043384 / 2,
])


def _interp_fit(y0, y1, y_mid, f0, f1, dt):
    """Quartic Hermite through (y0, f0), (y_mid), (y1, f1) on [0, 1] — the
    torchdiffeq dense-output polynomial (`_impl/interp.py:_interp_fit`)."""
    a = jax.tree.map(lambda Y0, Y1, YM, F0, F1:
                     2 * dt * (F1 - F0) - 8 * (Y0 + Y1) + 16 * YM,
                     y0, y1, y_mid, f0, f1)
    b = jax.tree.map(lambda Y0, Y1, YM, F0, F1:
                     dt * (5 * F0 - 3 * F1) + 18 * Y0 + 14 * Y1 - 32 * YM,
                     y0, y1, y_mid, f0, f1)
    c = jax.tree.map(lambda Y0, Y1, YM, F0, F1:
                     dt * (F1 - 4 * F0) - 11 * Y0 - 5 * Y1 + 16 * YM,
                     y0, y1, y_mid, f0, f1)
    d = jax.tree.map(lambda F0: dt * F0, f0)
    return (a, b, c, d, y0)


def _interp_eval(coefs, frac):
    """Evaluate the fitted polynomial at frac in [0, 1] (Horner)."""
    a, b, c, d, e = coefs
    x = jnp.clip(frac, 0.0, 1.0)
    return jax.tree.map(
        lambda A, B, C, D, E: E + x * (D + x * (C + x * (B + x * A))),
        a, b, c, d, e,
    )


def _tree_where(pred, if_true, if_false):
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), if_true, if_false)


def _rms_norm(tree):
    leaves = jax.tree.leaves(jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32) ** 2), tree))
    total = sum(leaves)
    n = sum(np.prod(a.shape) for a in jax.tree.leaves(tree))
    return jnp.sqrt(total / n)


def _error_ratio(err, x0, x1, atol, rtol):
    tol_sq = jax.tree.map(
        lambda e, a, b: (
            (e.astype(jnp.float32) / (atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b)).astype(jnp.float32))) ** 2
        ),
        err,
        x0,
        x1,
    )
    leaves = jax.tree.leaves(jax.tree.map(jnp.sum, tol_sq))
    total = sum(leaves)
    n = sum(np.prod(a.shape) for a in jax.tree.leaves(err))
    return jnp.sqrt(total / n)


def _is_descending(ts) -> bool:
    """True for a reverse-time save grid. ts must be concrete (it always is:
    the grids come from `make_time_grid` on python floats at trace time)."""
    return bool(np.asarray(ts)[1] < np.asarray(ts)[0])


def _solve_reflected(solver, drift_fn, x0, ts, **kw):
    """Integrate a DESCENDING grid by time reflection: y(s) = x(-s) solves
    dy/ds = -f(y, -s) on the ascending grid -ts. (The adaptive while-loops
    assume forward time; without this they would exit immediately and
    silently return x0 for reverse-time sampling.)"""

    def neg_drift(x, s):
        return jax.tree.map(lambda v: -v, drift_fn(x, -s))

    return solver(neg_drift, x0, -np.asarray(ts), **kw)


def odeint_adaptive(
    drift_fn: Callable,
    x0,
    ts,
    atol: float = 1e-6,
    rtol: float = 1e-3,
    max_steps: int = 4096,
    return_all: bool = False,
):
    """Adaptive dopri5 with a PI step-size controller and torchdiffeq-style
    DENSE OUTPUT (`integrators.py:104-116` delegates to torchdiffeq's
    odeint): step sizes are chosen freely by the controller — save points
    never clip a step — and each requested ts is read off the quartic
    Hermite interpolant of the step that crossed it (midpoint estimate via
    DPS_C_MID, `torchdiffeq/_impl/dopri5.py`). The trajectory is therefore
    identical whether 2 or 200 save points are requested.
    """
    if _is_descending(ts):
        return _solve_reflected(odeint_adaptive, drift_fn, x0, ts, atol=atol,
                                rtol=rtol, max_steps=max_steps, return_all=return_all)
    n_stages = 7
    safety, min_factor, max_factor = 0.9, 0.2, 10.0
    order = 5.0

    def rk_step(x, t, dt, k0):
        # FSAL: stage 0 is drift(x, t) — the previous accepted step already
        # produced it as its stage 6 (torchdiffeq reuses it the same way),
        # so it arrives via `k0`: 6 fresh model evaluations per step, not 7
        ks = [k0]
        for i in range(1, n_stages):
            xi = x
            for j, aij in enumerate(_DOPRI5_A[i]):
                xi = jax.tree.map(lambda xx, kk: xx + dt * aij * kk, xi, ks[j])
            ks.append(drift_fn(xi, t + _DOPRI5_C[i] * dt))
        x_next = x
        err = jax.tree.map(jnp.zeros_like, x)
        y_mid = x
        for i in range(n_stages):
            if _DOPRI5_B[i] != 0.0:
                x_next = jax.tree.map(lambda xx, kk: xx + dt * _DOPRI5_B[i] * kk, x_next, ks[i])
            if _DOPRI5_B_ERR[i] != 0.0:
                err = jax.tree.map(lambda ee, kk: ee + dt * _DOPRI5_B_ERR[i] * kk, err, ks[i])
            if _DOPRI5_C_MID[i] != 0.0:
                y_mid = jax.tree.map(lambda ym, kk: ym + dt * _DOPRI5_C_MID[i] * kk, y_mid, ks[i])
        # FSAL: ks[6] is drift(x_next, t + dt)
        return x_next, err, y_mid, ks[0], ks[6]

    def advance_past(carry, t_end):
        """Step adaptively until t >= t_end; the step that crosses t_end
        leaves its interpolant in the carry."""
        x, t, dt, f0, coefs, ct0, cdt = carry

        def cond(state):
            _, t, _, _, _, _, _, nsteps = state
            return jnp.logical_and(t < t_end - 1e-12, nsteps < max_steps)

        def body(state):
            x, t, dt, f0, coefs, ct0, cdt, nsteps = state
            x_prop, err, y_mid, k0, f1 = rk_step(x, t, dt, f0)
            ratio = _error_ratio(err, x, x_prop, atol, rtol)
            accept = ratio <= 1.0
            new_coefs = _interp_fit(x, x_prop, y_mid, k0, f1, dt)
            coefs = jax.tree.map(lambda n, o: jnp.where(accept, n, o), new_coefs, coefs)
            ct0 = jnp.where(accept, t, ct0)
            cdt = jnp.where(accept, dt, cdt)
            x = _tree_where(accept, x_prop, x)
            t = jnp.where(accept, t + dt, t)
            # on accept the next step starts at x_next, whose drift is f1
            # (FSAL); on reject x/t are unchanged and f0 remains valid
            f0 = _tree_where(accept, f1, f0)
            factor = jnp.clip(
                safety * jnp.power(jnp.maximum(ratio, 1e-10), -1.0 / order),
                min_factor,
                max_factor,
            )
            return x, t, dt * factor, f0, coefs, ct0, cdt, nsteps + 1

        x, t, dt, f0, coefs, ct0, cdt = jax.lax.while_loop(
            cond, body, (x, t, dt, f0, coefs, ct0, cdt, jnp.array(0, jnp.int32))
        )[:7]
        x_save = _interp_eval(coefs, (t_end - ct0) / cdt)
        return (x, t, dt, f0, coefs, ct0, cdt), x_save

    dt_init = (ts[-1] - ts[0]) / 100.0
    # degenerate initial interpolant: constant x0 (covers t_end == ts[0])
    zero = jax.tree.map(jnp.zeros_like, x0)
    coefs0 = (zero, zero, zero, zero, x0)
    f0_init = drift_fn(x0, ts[0])
    carry0 = (x0, ts[0], dt_init, f0_init, coefs0, ts[0], jnp.array(1.0, jnp.float32))

    def save_body(carry, t_end):
        carry, x_save = advance_past(carry, t_end)
        return carry, (x_save if return_all else None)

    if return_all:
        carry, ys = jax.lax.scan(save_body, carry0, ts[1:])
        return jax.tree.map(lambda first, rest: jnp.concatenate([first[None], rest], axis=0), x0, ys)
    carry, _ = jax.lax.scan(save_body, carry0, ts[1:])
    return _interp_eval(carry[4], (ts[-1] - carry[5]) / carry[6])


# ---------------------------------------------------------------------------
# SDE solvers (Euler-Maruyama / Heun), rng threaded through the scan carry
# ---------------------------------------------------------------------------


def odeint_dopri8(
    drift_fn: Callable,
    x0,
    ts,
    atol: float = 1e-6,
    rtol: float = 1e-3,
    max_steps: int = 4096,
    return_all: bool = False,
):
    """8th-order Dormand-Prince (DOP853) under lax.while_loop.

    Covers the reference CLI's dopri8 surface (`sample.py:73-78`,
    `settings.yaml:26`). Coefficients come from scipy's published DOP853
    tables; the combined 5th/3rd-order error estimator follows Hairer's
    algorithm (as in torchdiffeq/scipy).
    """
    if _is_descending(ts):
        return _solve_reflected(odeint_dopri8, drift_fn, x0, ts, atol=atol,
                                rtol=rtol, max_steps=max_steps, return_all=return_all)
    from scipy.integrate._ivp import dop853_coefficients as _dc

    n_stages = int(_dc.N_STAGES)  # 12
    A = np.asarray(_dc.A)[: n_stages, : n_stages]
    B = np.asarray(_dc.B)
    C = np.asarray(_dc.C)[: n_stages]
    E3 = np.asarray(_dc.E3)  # 13 entries (includes f(x_new))
    E5 = np.asarray(_dc.E5)
    safety, min_factor, max_factor, order = 0.9, 0.2, 10.0, 8.0

    n_el = sum(np.prod(a.shape) for a in jax.tree.leaves(x0))

    def rk_step(x, t, dt, k0):
        # FSAL: DOP853's k13 = drift(x_next, t+dt) is the next step's first
        # stage (C[0] == 0) — it arrives via `k0`, saving one of the 13
        # model evaluations per step
        ks = [k0]
        for i in range(1, n_stages):
            xi = x
            for j in range(i):
                if A[i, j] != 0.0:
                    xi = jax.tree.map(lambda xx, kk: xx + dt * A[i, j] * kk, xi, ks[j])
            ks.append(drift_fn(xi, t + C[i] * dt))
        x_next = x
        for i in range(n_stages):
            if B[i] != 0.0:
                x_next = jax.tree.map(lambda xx, kk: xx + dt * B[i] * kk, x_next, ks[i])
        ks.append(drift_fn(x_next, t + dt))  # k13

        def weighted(E):
            acc = jax.tree.map(jnp.zeros_like, x)
            for i, e in enumerate(E):
                if e != 0.0:
                    acc = jax.tree.map(lambda aa, kk: aa + e * kk, acc, ks[i])
            return acc

        # ks[12] is drift(x_next, t + dt)
        return x_next, weighted(E5), weighted(E3), ks[0], ks[12]

    def error_norm(x, x_new, err5, err3, dt):
        def scaled_sq(e):
            sq = jax.tree.map(
                lambda ee, a, b: (
                    ee.astype(jnp.float32)
                    / (atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b)).astype(jnp.float32))
                ) ** 2,
                e, x, x_new,
            )
            return sum(jax.tree.leaves(jax.tree.map(jnp.sum, sq)))

        e5, e3 = scaled_sq(err5), scaled_sq(err3)
        denom = e5 + 0.01 * e3
        corr = jnp.where(denom > 0, e5 / jnp.sqrt(denom * n_el), 0.0)
        return jnp.abs(dt) * corr

    # DOCUMENTED DEVIATION from torchdiffeq: dopri8 clips the crossing step
    # at each save boundary instead of dense-output interpolation (so the
    # step sequence depends on the save grid). DOP853's solver-order dense
    # output needs 3 extra drift (model) evaluations per step (scipy's
    # extended-stage D-matrix interpolant) — a 25% cost increase a diffusion
    # sampler should not pay — while low-order interpolation of 8th-order
    # steps would lose accuracy at save points. Clipping keeps save-point
    # values at full solver accuracy. dopri5 (the default adaptive path)
    # matches torchdiffeq dense output exactly.
    def advance_to(x, t_start, t_end, dt0, f0):
        def cond(state):
            _, t, _, _, nsteps = state
            return jnp.logical_and(t < t_end - 1e-12, nsteps < max_steps)

        def body(state):
            x, t, dt, f0, nsteps = state
            # dt is the CONTROLLER'S preferred step; clip only the executed
            # step at the save boundary, and do not let a boundary sliver
            # poison the preference carried into the next segment
            dt_step = jnp.minimum(dt, t_end - t)
            clipped = dt_step < dt
            x_prop, err5, err3, _, f1 = rk_step(x, t, dt_step, f0)
            ratio = error_norm(x, x_prop, err5, err3, dt_step)
            accept = ratio <= 1.0
            x_new = _tree_where(accept, x_prop, x)
            t_new = jnp.where(accept, t + dt_step, t)
            f0 = _tree_where(accept, f1, f0)
            factor = jnp.clip(
                safety * jnp.power(jnp.maximum(ratio, 1e-10), -1.0 / order),
                min_factor, max_factor,
            )
            # accepted boundary-clipped step: keep the old preference (its
            # small error says nothing about the full-size step); otherwise
            # the usual controller update from the executed step
            dt_new = jnp.where(accept & clipped, dt, dt_step * factor)
            return x_new, t_new, dt_new, f0, nsteps + 1

        x, _, dt, f0, _ = jax.lax.while_loop(
            cond, body, (x, t_start, dt0, f0, jnp.array(0, jnp.int32)))
        return x, dt, f0

    dt_init = (ts[-1] - ts[0]) / 50.0
    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    f0_init = drift_fn(x0, ts[0])

    def save_body(carry, t_pair):
        x, dt, f0 = carry
        x, dt, f0 = advance_to(x, t_pair[0], t_pair[1], dt, f0)
        return (x, dt, f0), (x if return_all else None)

    (x_final, _, _), ys = jax.lax.scan(save_body, (x0, dt_init, f0_init), t_pairs)
    if return_all:
        return jax.tree.map(lambda first, rest: jnp.concatenate([first[None], rest], axis=0), x0, ys)
    return x_final


def sdeint(
    drift_fn: Callable,
    diffusion_fn: Callable,
    x0,
    ts,
    rng: jax.Array,
    method: str = "euler",
    return_all: bool = False,
):
    """Integrate an SDE along `ts`; matches `integrators.py:27-49` semantics.

    Returns (x_last, mean_x_last) or the full trajectory of x if return_all.
    The final point returned is the *pre-last-step* state (the reference's sde
    loop stops at t[-2]; the configurable last step is applied by the Sampler).
    """
    dt = ts[1] - ts[0]

    def em_step(rng, x, mean_x, t):
        w = jax.random.normal(rng, x.shape, x.dtype)
        dw = w * jnp.sqrt(dt)
        drift = drift_fn(x, t)
        diffusion = diffusion_fn(x, t)
        mean_x = x + drift * dt
        x = mean_x + jnp.sqrt(2.0 * diffusion) * dw
        return x, mean_x

    def heun_step(rng, x, mean_x, t):
        w = jax.random.normal(rng, x.shape, x.dtype)
        dw = w * jnp.sqrt(dt)
        diffusion = diffusion_fn(x, t)
        xhat = x + jnp.sqrt(2.0 * diffusion) * dw
        k1 = drift_fn(xhat, t)
        xp = xhat + dt * k1
        k2 = drift_fn(xp, t + dt)
        return xhat + 0.5 * dt * (k1 + k2), xhat

    steppers = {"euler": em_step, "heun": heun_step}
    try:
        stepper = steppers[method.lower()]
    except KeyError:
        raise NotImplementedError(f"Unknown SDE method: {method}")

    def body(carry, t):
        rng, x, mean_x = carry
        rng, sub = jax.random.split(rng)
        x, mean_x = stepper(sub, x, mean_x, t)
        return (rng, x, mean_x), (x if return_all else None)

    (rng, x, mean_x), ys = jax.lax.scan(body, (rng, x0, x0), ts[:-1])
    if return_all:
        return ys
    return x, mean_x
