"""Normalization ops.

RMSNorm replaces the reference's apex `FusedRMSNorm` CUDA kernel
(`lumina_next_t2i/models/components.py:1-55`): on TPU, XLA fuses the
rsqrt-mean-scale chain into surrounding ops, so the path is plain jnp math in
a float32 island (matching the reference fallback
`x * rsqrt(mean(x^2) + eps) * w` computed on floated input).

Design decision (no hand-written Pallas norm kernel): apex exists on GPU
because eager torch launches one CUDA kernel per elementwise op; under XLA
the whole rsqrt-mean-scale chain lands in a single fusion with its neighbors
(verified in the 2B HLO dumps, `exps/artifacts/b1b2_hlo/`: no standalone
norm kernels survive scheduling — every norm is folded into a producer or
consumer fusion), so a custom kernel could only re-create what the compiler
already emits while BLOCKING fusion across its boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, weight=None, eps: float = 1e-5):
    """x * rsqrt(mean(x^2) + eps) * weight, computed in float32.

    `weight=None` gives the parameter-free variant (the reference's
    `PFRMSNorm`, `Next-DiT-ImageNet/models/models.py:76-118`)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    return normed.astype(x.dtype)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm with optional affine, float32 island.

    `weight=None` gives the reference final layer's elementwise_affine=False
    LayerNorm (`model.py:634-637`).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    normed = (xf - mean) * (var + eps) ** -0.5
    if weight is not None:
        normed = normed * weight.astype(jnp.float32)
    if bias is not None:
        normed = normed + bias.astype(jnp.float32)
    return normed.astype(x.dtype)
