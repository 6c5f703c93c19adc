"""Shared model building blocks (flax.linen).

TPU-native re-implementations of the reference's layer vocabulary:
timestep/label/caption embedders (`lumina_next_t2i/models/model.py:37-129`),
gated joint self+cross attention (`model.py:137-438`), SwiGLU feed-forward
(`model.py:441-502`), final layers (`model.py:627-662`,
`Next-DiT-ImageNet/models/models.py:799-833`).

Conventions:
- parameters live in float32 (`param_dtype`); activations run in `dtype`
  (bf16 on TPU) with float32 islands for norms / RoPE / softmax — mirroring
  the reference's autocast discipline;
- tensor-parallel fairscale layers become plain Dense; the column/row split
  is recovered by GSPMD sharding rules (`parallel/sharding.py`), not by the
  module code;
- the CFG label/caption dropout mask needs no cross-rank broadcast (reference
  `model.py:106-122`): under SPMD the PRNG key is replicated, so every shard
  draws the same mask by construction.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import default_attn_scale, pool_kv_2d, resolve_impl, sdpa
from ..ops.attention import attention as attention_op
from ..ops.norms import layer_norm as layer_norm_op
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope


def modulate(x, scale, shift=None):
    """x * (1 + scale) (+ shift); scale/shift are (B, D), x is (B, S, D)."""
    out = x * (1.0 + scale[:, None, :]).astype(x.dtype)
    if shift is not None:
        out = out + shift[:, None, :].astype(x.dtype)
    return out


class RMSNorm(nn.Module):
    """RMSNorm, always computed in float32.

    With `use_scale=True` (default) this is the reference's apex/vanilla
    `RMSNorm` with a learned gain (`components.py:1-55`); with
    `use_scale=False` it is the parameter-free `PFRMSNorm`
    (`Next-DiT-ImageNet/models/models.py:76-118`) used for the SandwichNorm2
    inner norms.
    """

    eps: float = 1e-5
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        weight = (self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
                  if self.use_scale else None)
        return rms_norm(x, weight, self.eps)


class LayerNorm(nn.Module):
    """LayerNorm (float32 island), optional affine."""

    eps: float = 1e-6
    use_affine: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_affine:
            w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
            b = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        else:
            w = b = None
        return layer_norm_op(x, w, b, self.eps)


def timestep_embedding(t, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding (`model.py:63-82`): cos then sin halves."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """Sinusoidal frequencies -> 2-layer SiLU MLP (`model.py:37-87`)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        t_freq = timestep_embedding(t, self.frequency_embedding_size)
        init = nn.initializers.normal(stddev=0.02)
        h = nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp_0")(
            t_freq.astype(self.dtype)
        )
        h = nn.silu(h)
        return nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype, param_dtype=self.param_dtype, name="mlp_2")(h)


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout (`model.py:90-129`).

    The +1 null class is appended when dropout_prob > 0; dropped labels map to
    it. Dropout uses the 'label_dropout' rng collection.
    """

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels, train: bool = False, force_drop_ids=None):
        use_cfg = self.dropout_prob > 0
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_classes + int(use_cfg), self.hidden_size),
            self.param_dtype,
        )
        if (train and use_cfg) or (force_drop_ids is not None):
            if force_drop_ids is None:
                rng = self.make_rng("label_dropout")
                drop = jax.random.uniform(rng, (labels.shape[0],)) < self.dropout_prob
            else:
                drop = force_drop_ids == 1
            labels = jnp.where(drop, self.num_classes, labels)
        return table[labels].astype(self.dtype)


class CaptionEmbedder(nn.Module):
    """LayerNorm + zero-init projection of pooled caption features
    (`model.py:702-711`)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cap_pooled):
        h = LayerNorm(eps=1e-5, name="norm")(cap_pooled)
        return nn.Dense(
            self.hidden_size, kernel_init=nn.initializers.zeros, dtype=self.dtype, param_dtype=self.param_dtype, name="proj"
        )(h)


def pooled_caption(cap_feats, cap_mask):
    """Masked mean over caption tokens (`model.py:847-849`)."""
    m = cap_mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(cap_feats.astype(jnp.float32) * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1e-6
    )
    return pooled.astype(cap_feats.dtype)


def ffn_hidden_size(hidden_dim: int, multiple_of: int,
                    ffn_dim_multiplier=None) -> int:
    """LLaMA SwiGLU width: 2/3 of the nominal hidden, optional multiplier,
    rounded UP to multiple_of (`model.py:314-320`). Checkpoint-shape-
    determining — the dense FeedForward and the MoE experts must share it.
    """
    hidden = int(2 * hidden_dim / 3)
    if ffn_dim_multiplier is not None:
        hidden = int(ffn_dim_multiplier * hidden)
    return multiple_of * ((hidden + multiple_of - 1) // multiple_of)


class FeedForward(nn.Module):
    """SwiGLU MLP: w2(silu(w1 x) * w3 x) (`model.py:441-502`)."""

    dim: int
    hidden_dim: int  # nominal 4*dim; actual = multiple_of-rounded 2/3 of this
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = ffn_hidden_size(self.hidden_dim, self.multiple_of,
                                 self.ffn_dim_multiplier)
        init = nn.initializers.xavier_uniform()
        x1 = nn.Dense(hidden, use_bias=False, kernel_init=init, dtype=self.dtype, param_dtype=self.param_dtype, name="w1")(x)
        x3 = nn.Dense(hidden, use_bias=False, kernel_init=init, dtype=self.dtype, param_dtype=self.param_dtype, name="w3")(x)
        return nn.Dense(self.dim, use_bias=False, kernel_init=init, dtype=self.dtype, param_dtype=self.param_dtype, name="w2")(
            nn.silu(x1) * x3
        )


class Attention(nn.Module):
    """Joint self-attention (+ optional gated text cross-attention)
    (`model.py:137-438`).

    Self-attention runs through the flash/XLA dispatcher with the key mask
    standing in for varlen unpadding; cross-attention to caption features uses
    the XLA path (tiny KV) with the per-head zero-init tanh gate
    (`model.py:420-434`).
    """

    dim: int
    n_heads: int
    n_kv_heads: Optional[int] = None
    qk_norm: bool = False
    y_dim: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # visual-anagrams `kv_merge` long-sequence trick
    # (`visual_anagrams/models/nextdit.py:342-358`): AvgPool rotated K/V over
    # the (gh, gw) token grid with kernel=stride=kv_merge_ratio; queries stay
    # full length. The fork's `batch_query` chunking is numerically an
    # identity and is subsumed by the flash kernel's KV-block streaming.
    kv_pool_grid: Optional[Tuple[int, int]] = None
    kv_merge_ratio: int = 1

    @nn.compact
    def __call__(self, x, x_mask, angles, y=None, y_mask=None, attn_scale: Optional[float] = None):
        b, s, _ = x.shape
        n_kv = self.n_kv_heads or self.n_heads
        head_dim = self.dim // self.n_heads
        init = nn.initializers.xavier_uniform()

        xq = nn.Dense(self.n_heads * head_dim, use_bias=False, kernel_init=init,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="wq")(x)
        xk = nn.Dense(n_kv * head_dim, use_bias=False, kernel_init=init,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="wk")(x)
        xv = nn.Dense(n_kv * head_dim, use_bias=False, kernel_init=init,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="wv")(x)

        if self.qk_norm:
            # LayerNorm over the full flattened head dims, as in the reference
            # at model-parallel size 1 (`model.py:211-213`).
            xq = LayerNorm(eps=1e-5, name="q_norm")(xq)
            xk = LayerNorm(eps=1e-5, name="k_norm")(xk)

        xq = xq.reshape(b, s, self.n_heads, head_dim)
        xk = xk.reshape(b, s, n_kv, head_dim)
        xv = xv.reshape(b, s, n_kv, head_dim)

        scale = attn_scale if attn_scale is not None else default_attn_scale(head_dim)
        impl = resolve_impl(self.attn_impl)
        kv_merge = self.kv_merge_ratio > 1 and self.kv_pool_grid is not None
        fuse_rope = (
            angles is not None and impl == "flash" and angles.ndim == 2
            and not kv_merge  # pooling happens AFTER rotation — needs rotated k
            and os.environ.get("LUMINA_FUSE_ROPE", "0") == "1"
        )
        if fuse_rope:
            # Fused rope+attention kernel — OFF by default: measured on v5e,
            # XLA already fuses apply_rope into the flash wrapper's
            # transpose/pad copy (rope+flash 6.20ms vs plain flash 6.33ms at
            # 2B shapes), while in-kernel rotation repeats per grid step
            # (6.90ms). Kept as an opt-in for hardware/shapes where the
            # prologue fusion doesn't happen. NOTE: xq stays UNROTATED here —
            # the cross-attn branch then rotates q in-kernel (rotate_k=False),
            # matching the reference, which rotates xq before the y-branch
            # (`model.py:367-427`).
            from ..ops.flash_attention import flash_attention_rope

            out = flash_attention_rope(xq, xk, xv, angles, kv_mask=x_mask, scale=scale)
        else:
            if angles is not None:
                xq = apply_rope(xq, angles)
                xk = apply_rope(xk, angles)
            xk_s, xv_s, x_mask_s = xk, xv, x_mask
            if kv_merge:
                gh, gw = self.kv_pool_grid
                r = self.kv_merge_ratio
                xk_s, xv_s = pool_kv_2d(xk, xv, gh, gw, r)
                if x_mask_s is not None:
                    # a pooled key is valid if any source key in its window is
                    # (the reference strides the all-ones mask, nextdit.py:359)
                    m = x_mask_s.reshape(b, gh // r, r, gw // r, r)
                    x_mask_s = m.max(axis=(2, 4)).reshape(b, -1)
            out = attention_op(xq, xk_s, xv_s, kv_mask=x_mask_s, scale=scale, impl=impl)
            if impl == "flash" and os.environ.get("LUMINA_FLASH_CALIBRATE", "0") == "1":
                # Static-max calibration probe (sampling pipelines run one
                # short trajectory under LUMINA_FLASH_CALIBRATE=1, read the
                # sown lse ranges, then call set_flash_static_max — see
                # `pipelines/sample_lib.autocalibrate_flash_static_max`).
                # Only the streaming kernel honors the static bound, so only
                # those call sites contribute.
                from ..ops.flash_attention import flash_lse_range, streams_kv

                if streams_kv(xk_s.shape[1]):
                    self.sow("calibration", "self_attn_lse_range",
                             flash_lse_range(xq, xk_s, xv_s, x_mask_s, scale))

        if self.y_dim > 0 and y is not None:
            yk = nn.Dense(n_kv * head_dim, use_bias=False, kernel_init=init,
                          dtype=self.dtype, param_dtype=self.param_dtype, name="wk_y")(y)
            if self.qk_norm:
                yk = LayerNorm(eps=1e-5, name="ky_norm")(yk)
            yv = nn.Dense(n_kv * head_dim, use_bias=False, kernel_init=init,
                          dtype=self.dtype, param_dtype=self.param_dtype, name="wv_y")(y)
            ly = y.shape[1]
            yk = yk.reshape(b, ly, n_kv, head_dim)
            yv = yv.reshape(b, ly, n_kv, head_dim)
            gate = self.param("gate", nn.initializers.zeros, (self.n_heads,), jnp.float32)
            # cross-attn always uses the default 1/sqrt(d) scale
            # (`model.py:427-432`); routed through the flash kernel on TPU —
            # the XLA path materializes (B, H, Sq, Ly) fp32 logits in HBM,
            # which dominates cross-attn time at 4k tokens.
            if fuse_rope:
                # xq is unrotated in this branch; rotate it in-kernel, keys stay
                # unrotated (reference applies rope to xq only, never to yk)
                from ..ops.flash_attention import flash_attention_rope

                out_y = flash_attention_rope(xq, yk, yv, angles, kv_mask=y_mask,
                                             rotate_k=False)
            else:
                out_y = attention_op(xq, yk, yv, kv_mask=y_mask, impl=impl)
            out = out + out_y * jnp.tanh(gate).astype(out.dtype)[None, None, :, None]

        out = out.reshape(b, s, self.n_heads * head_dim)
        return nn.Dense(self.dim, use_bias=False, kernel_init=init, dtype=self.dtype, param_dtype=self.param_dtype, name="wo")(out)


class FinalLayer(nn.Module):
    """Final LayerNorm + adaLN modulate + zero-init projection.

    modulation="scale": NextDiT T2I scale-only (`model.py:627-662`);
    modulation="shift_scale": Flag-DiT / ImageNet shift+scale 2-chunk
    (`Next-DiT-ImageNet/models/models.py:818-833`).
    """

    hidden_size: int
    patch_size: int
    out_channels: int
    modulation: str = "scale"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        h = LayerNorm(eps=1e-6, use_affine=False, name="norm_final")(x)
        mod_dim = self.hidden_size if self.modulation == "scale" else 2 * self.hidden_size
        mod = nn.Dense(mod_dim, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="adaLN_modulation")(nn.silu(c))
        if self.modulation == "scale":
            h = modulate(h, mod)
        else:
            shift, scale = jnp.split(mod, 2, axis=-1)
            h = modulate(h, scale, shift)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            kernel_init=nn.initializers.zeros, dtype=self.dtype, param_dtype=self.param_dtype, name="linear",
        )(h)


def patchify(x, patch_size: int):
    """(B, C, H, W) -> (B, L, p*p*C) tokens, last dim ordered (C, ph, pw)
    (`model.py:774-779`)."""
    b, c, h, w = x.shape
    p = patch_size
    x = x.reshape(b, c, h // p, p, w // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, H/p, W/p, C, p, p)
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def unpatchify(tokens, h: int, w: int, patch_size: int, out_channels: int):
    """(B, L, p*p*C_out) -> (B, C_out, H, W); token last dim ordered
    (ph, pw, C_out) per the reference final layer (`model.py:743-755`)."""
    b = tokens.shape[0]
    p = patch_size
    gh, gw = h // p, w // p
    x = tokens[:, : gh * gw].reshape(b, gh, gw, p, p, out_channels)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(b, out_channels, h, w)


def _is_weight_dot(prim, params) -> bool:
    """A dot_general with no batch dims — the shape class of weight matmuls
    (jax's own `dots_with_no_batch_dims_saveable` criterion)."""
    if prim.name != "dot_general":
        return False
    (_, _), (lhs_batch, rhs_batch) = params["dimension_numbers"]
    return not lhs_batch and not rhs_batch


def _dots_slim_policy(prim, *avals, **params) -> bool:
    """Save weight-matmul outputs EXCEPT expanding ones (output larger than
    the activation input). In a DiT block that recomputes exactly the FFN
    up-projections w1/w3 (dim -> ~2.7*dim hidden; the two dominant
    activations, ~6% extra step FLOPs to recompute) while keeping
    qkv/attn-out/w2-down outputs resident. At 4096 tokens this roughly
    halves saved-residual HBM vs the plain `dots` policy and is what lets
    per-chip batch >= 2 compile at 1024px on a 16 GB v5e."""
    if not _is_weight_dot(prim, params):
        return False
    (lhs_c, rhs_c), _ = params["dimension_numbers"]
    lhs, rhs = avals[0], avals[1]
    m = math.prod(d for i, d in enumerate(lhs.shape) if i not in set(lhs_c))
    n = math.prod(d for i, d in enumerate(rhs.shape) if i not in set(rhs_c))
    return m * n <= math.prod(lhs.shape)


def maybe_remat(block_cls, remat: bool, policy: str = "dots"):
    """Wrap a scanned block class in nn.remat with a selective checkpoint
    policy (the reference's `--checkpointing` / FSDP activation checkpointing,
    `lumina_next_t2i/train.py:206-212`, is all-or-nothing full-block remat).

    policy:
      - "full": save nothing, recompute the whole block forward in the
        backward (max memory savings, ~33% extra FLOPs);
      - "dots" (default): `dots_with_no_batch_dims_saveable` — keep every
        weight-matmul output (the MXU work), recompute only elementwise
        chains, norms and attention during the backward. On a 16 GB v5e this
        fits the 600M/4k-token step at per-chip batch 1;
      - "dots_slim": like "dots" but recompute the expanding FFN
        up-projections too (see `_dots_slim_policy`) — the policy for
        per-chip batch >= 2 at 4096 tokens.
    """
    if not remat:
        return block_cls
    kwargs = {"prevent_cse": False}
    if policy == "dots":
        kwargs["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif policy == "dots_slim":
        kwargs["policy"] = _dots_slim_policy
    elif policy != "full":
        raise ValueError(
            f"unknown remat policy: {policy!r} (use 'full', 'dots' or 'dots_slim')")
    return nn.remat(block_cls, **kwargs)
