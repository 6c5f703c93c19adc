"""Rotary position embeddings, TPU-native.

The reference computes RoPE with complex64 tensors (`torch.polar` +
`view_as_complex` multiply, `lumina_next_t2i/models/model.py:254-282,915-963`).
TPUs have no fast complex path, so here angles are real and rotation is the
explicit cos/sin pair formula — mathematically identical:
  (x0 + i x1) * e^{i phi} = (x0 cos - x1 sin) + i (x0 sin + x1 cos).

Covered reference behaviors:
- 1-D RoPE with NTK-aware theta scaling and linear position scaling
  (`lumina_t2i/models/model.py:924-960`);
- 2-D axis-factorized RoPE: frequency dims split half-height/half-width via
  arange(0, dim, 4) (`lumina_next_t2i/models/model.py:915-963`);
- time-aware scaled RoPE: the linear-vs-NTK choice switches at
  `scale_watershed` as a function of the current diffusion time
  (`model.py:944-951`). Unlike the reference — which rebuilds the table on
  host every solver step from `t.item()` (`model.py:883-889`, a host sync) —
  the factors here are traced scalars, so the whole schedule stays inside one
  jitted sampling loop.

All angle math runs in float32; `apply_rope` keeps a float32 island and casts
back to the input dtype (mirroring the autocast-disabled island at
`model.py:278-282`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _scale_factors(scale_factor, scale_watershed, timestep):
    """Time-aware selection of (linear_factor, ntk_factor) (`model.py:944-951`)."""
    timestep = jnp.asarray(timestep, jnp.float32)
    below = timestep < scale_watershed
    linear_factor = jnp.where(below, scale_factor, 1.0)
    ntk_factor = jnp.where(below, 1.0, scale_factor)
    return linear_factor, ntk_factor


def rope_angles_1d(
    head_dim: int,
    positions,
    theta: float = 10000.0,
    linear_factor=1.0,
    ntk_factor=1.0,
):
    """Angles for 1-D RoPE: (len(positions), head_dim // 2), float32.

    freq_k = (theta * ntk)^(-2k/d) / linear for k in [0, d/2); the reference's
    `t / rope_scaling_factor` position scaling (`model.py:957`) is equivalent
    to dividing the frequencies by linear_factor.
    """
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32)[: head_dim // 2] / head_dim
    theta_eff = theta * jnp.asarray(ntk_factor, jnp.float32)
    freqs = jnp.exp(-exponents * jnp.log(theta_eff)) / jnp.asarray(linear_factor, jnp.float32)
    positions = jnp.asarray(positions, jnp.float32)
    return jnp.outer(positions, freqs)


def rope_angles_2d(
    head_dim: int,
    height: int,
    width: int,
    theta: float = 10000.0,
    linear_factor=1.0,
    ntk_factor=1.0,
):
    """Angles for 2-D axis-factorized RoPE: (height, width, head_dim // 2).

    Per position (i, j) the angle vector INTERLEAVES the axis frequencies:
    [phi_h[i,0], phi_w[j,0], phi_h[i,1], phi_w[j,1], ...] — the reference
    concatenates on a trailing singleton dim and flattens
    (`model.py:959-961`), which interleaves, not halves. Frequencies are
    (theta*ntk)^(-4k/d)/linear (`model.py:952-957`). Requires
    head_dim % 4 == 0 (`model.py:731`).
    """
    assert head_dim % 4 == 0, "2d rope needs head dim to be divisible by 4"
    exponents = jnp.arange(0, head_dim, 4, dtype=jnp.float32)[: head_dim // 4] / head_dim
    theta_eff = theta * jnp.asarray(ntk_factor, jnp.float32)
    freqs = jnp.exp(-exponents * jnp.log(theta_eff)) / jnp.asarray(linear_factor, jnp.float32)
    angles_h = jnp.outer(jnp.arange(height, dtype=jnp.float32), freqs)  # (H, d/4)
    angles_w = jnp.outer(jnp.arange(width, dtype=jnp.float32), freqs)  # (W, d/4)
    grid = jnp.stack(
        [
            jnp.broadcast_to(angles_h[:, None, :], (height, width, head_dim // 4)),
            jnp.broadcast_to(angles_w[None, :, :], (height, width, head_dim // 4)),
        ],
        axis=-1,
    )  # (H, W, d/4, 2)
    return grid.reshape(height, width, head_dim // 2)


def rope_angles_2d_timeaware(
    head_dim: int,
    height: int,
    width: int,
    theta: float = 10000.0,
    scale_factor=1.0,
    scale_watershed=1.0,
    timestep=1.0,
):
    """2-D angles with the time-aware linear/NTK watershed switch.

    `timestep` may be a traced scalar (current diffusion time), keeping the
    per-step frequency recomputation inside the compiled sampling loop.
    """
    linear_factor, ntk_factor = _scale_factors(scale_factor, scale_watershed, timestep)
    return rope_angles_2d(head_dim, height, width, theta, linear_factor, ntk_factor)


def apply_rope(x, angles):
    """Rotate pairs of channels of x by `angles`.

    Args:
      x: (..., seq, n_heads, head_dim).
      angles: (seq, head_dim // 2) or (batch, seq, head_dim // 2), float32.
    Returns:
      Rotated tensor with x.dtype (math in float32).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    *lead, seq, n_heads, head_dim = xf.shape
    xf = xf.reshape(*lead, seq, n_heads, head_dim // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    if angles.ndim == 2:
        cos = jnp.cos(angles)[None, :, None, :]
        sin = jnp.sin(angles)[None, :, None, :]
    else:  # (B, seq, d/2) per-item angles (variable aspect batches)
        cos = jnp.cos(angles)[:, :, None, :]
        sin = jnp.sin(angles)[:, :, None, :]
    out0 = x0 * cos - x1 * sin
    out1 = x0 * sin + x1 * cos
    out = jnp.stack([out0, out1], axis=-1).reshape(*lead, seq, n_heads, head_dim)
    return out.astype(orig_dtype)
