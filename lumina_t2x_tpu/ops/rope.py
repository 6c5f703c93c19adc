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

import functools

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


@functools.lru_cache(maxsize=8)
def _pair_swap_matrix(head_dim: int):
    """(D, D) 0/1 matrix M with (x @ M)[..., 2k] = x[..., 2k+1] and vice
    versa. Doing the adjacent-pair swap as a tiny matmul keeps it on the
    (otherwise idle) MXU — the naive stride-2 slice + stack formulation
    forces TPU lane relayouts on the VPU (measured 2.2 ms vs 1.2 ms for a
    q+k rotation pair at 2B 4k-token shapes). Exact for every dtype: each
    output element is a single 1.0 * x product."""
    import numpy as np

    m = np.zeros((head_dim, head_dim), np.float32)
    for i in range(0, head_dim, 2):
        m[i + 1, i] = 1.0
        m[i, i + 1] = 1.0
    return m


def rot_tables(angles, head_dim: int):
    """Lane-expand (..., head_dim//2) angles to (..., head_dim) float32
    (cos_full, sin_signed) tables for the interleaved-pair rotation
      out = x * cos_full + swap_pairs(x) * sin_signed:
    cos_full repeats each cos twice; sin_signed = (-s0, s0, -s1, s1, ...).
    Single home for the sign/interleave convention — shared by `apply_rope`
    and the fused rope+attention Pallas kernels (flash_attention.py), which
    must stay in sync with `_pair_swap_matrix`."""
    cos = jnp.cos(angles.astype(jnp.float32))
    sin = jnp.sin(angles.astype(jnp.float32))
    cos_full = jnp.repeat(cos, 2, axis=-1)
    sin_signed = jnp.stack([-sin, sin], axis=-1).reshape(*sin.shape[:-1], head_dim)
    return cos_full, sin_signed


def apply_rope(x, angles):
    """Rotate pairs of channels of x by `angles`.

    Interleaved-pair convention, matching the reference's complex-multiply
    view (`model.py:278-282,368-369`):
      out[2k]   = x[2k] cos_k - x[2k+1] sin_k
      out[2k+1] = x[2k] sin_k + x[2k+1] cos_k
    computed as  x * cos_full + swap_pairs(x) * sin_signed  (one fused f32
    multiply-add pass; the swap rides the MXU, see _pair_swap_matrix).

    Args:
      x: (..., seq, n_heads, head_dim).
      angles: (seq, head_dim // 2) or (batch, seq, head_dim // 2), float32.
    Returns:
      Rotated tensor with x.dtype (math in float32).
    """
    orig_dtype = x.dtype
    head_dim = x.shape[-1]
    if angles.ndim == 2:
        ang = angles[None, :, None, :]
    else:  # (B, seq, d/2) per-item angles (variable aspect batches)
        ang = angles[:, :, None, :]
    cos_full, sin_signed = rot_tables(ang, head_dim)
    swap = jnp.asarray(_pair_swap_matrix(head_dim), orig_dtype)
    swapped = jax.lax.dot_general(
        x, swap, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=orig_dtype
    )
    out = x.astype(jnp.float32) * cos_full + swapped.astype(jnp.float32) * sin_signed
    if out.shape != x.shape:  # broadcasting against (1, seq, 1, d) tables can
        out = out.reshape(x.shape)  # add a leading axis to low-rank inputs
    return out.astype(orig_dtype)
