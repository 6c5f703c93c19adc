"""Flag-DiT — LLaMA-style DiT (the original 5B text-to-image backbone and the
ImageNet ablation variant).

TPU-native re-design of `lumina_t2i/models/model.py:1-991` (text-conditioned,
`DiT_Llama`) and `Flag-DiT-ImageNet/models/model.py:1-705` (class-cond):

- 1-D RoPE over the token sequence with NTK-aware theta scaling and linear
  position scaling (`lumina_t2i/models/model.py:924-960`, end=40000; ImageNet
  variant end=4096);
- learnable `[eol]` token appended per image row + `[pad]` token
  (`model.py:738-741,779-786`): sequence length per item is
  (H/p) * (W/p + 1);
- pre-norm blocks with 6-chunk adaLN — (shift, scale, gate) for both attention
  and FFN, gates NOT tanh'd (`model.py:595-609`);
- gated zero-init cross-attention to caption features (text variant);
- shift+scale 2-chunk final layer (`model.py:624-662`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import default_attn_scale, proportional_attn_scale
from ..ops.rope import rope_angles_1d
from .layers import (
    maybe_remat,
    Attention,
    CaptionEmbedder,
    FeedForward,
    FinalLayer,
    LabelEmbedder,
    RMSNorm,
    TimestepEmbedder,
    modulate,
    patchify,
    pooled_caption,
)


class FlagDiTBlock(nn.Module):
    """Pre-norm block with 6-chunk adaLN (`lumina_t2i/models/model.py:507-621`)."""

    dim: int
    n_heads: int
    n_kv_heads: Optional[int]
    multiple_of: int
    ffn_dim_multiplier: Optional[float]
    norm_eps: float
    qk_norm: bool
    y_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, x_mask, angles, y, y_mask, adaln_input, attn_scale=None):
        mod = nn.Dense(6 * self.dim, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="adaLN_modulation")(nn.silu(adaln_input))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

        y_normed = RMSNorm(eps=self.norm_eps, name="attention_y_norm")(y) if y is not None else None
        attn_out = Attention(
            dim=self.dim, n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            qk_norm=self.qk_norm, y_dim=self.y_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, attn_impl=self.attn_impl, name="attention",
        )(
            modulate(RMSNorm(eps=self.norm_eps, name="attention_norm")(x), scale_msa, shift_msa),
            x_mask, angles, y_normed, y_mask, attn_scale,
        )
        x = x + gate_msa[:, None, :].astype(x.dtype) * attn_out

        mlp_out = FeedForward(
            dim=self.dim, hidden_dim=4 * self.dim, multiple_of=self.multiple_of,
            ffn_dim_multiplier=self.ffn_dim_multiplier, dtype=self.dtype,
            param_dtype=self.param_dtype, name="feed_forward",
        )(modulate(RMSNorm(eps=self.norm_eps, name="ffn_norm")(x), scale_mlp, shift_mlp))
        x = x + gate_mlp[:, None, :].astype(x.dtype) * mlp_out
        return x


class _ScannedFlagDiTBlock(FlagDiTBlock):
    @nn.compact
    def __call__(self, x, x_mask, angles, y, y_mask, adaln_input, attn_scale=None):
        return FlagDiTBlock.__call__(self, x, x_mask, angles, y, y_mask, adaln_input, attn_scale), None


class FlagDiT(nn.Module):
    """Text-conditioned Flag-DiT (`lumina_t2i/models/model.py:665-991`).

    Set num_classes > 0 and cap_feat_dim = 0 for the class-conditional
    ImageNet variant (`Flag-DiT-ImageNet/models/model.py:523-694` — which has
    no [eol] token handling difference: it uses plain 1-D positions over the
    patch sequence and no caption cross-attention).
    """

    patch_size: int = 2
    in_channels: int = 4
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    learn_sigma: bool = True
    qk_norm: bool = False
    cap_feat_dim: int = 0  # >0: text cross-attention
    num_classes: int = 0  # >0: class-conditional
    class_dropout_prob: float = 0.1
    rope_theta: float = 10000.0
    use_eol_token: bool = True
    dtype: jnp.dtype = jnp.float32
    # dtype of stored params (fp32 default; bf16 halves param HBM for the
    # 5B/7B configs on one chip)
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    scan_blocks: bool = True
    remat: bool = False
    remat_policy: str = "dots"  # see layers.maybe_remat

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @nn.compact
    def __call__(
        self,
        x,
        t,
        cap_feats=None,
        cap_mask=None,
        y=None,
        *,
        rope_scaling_factor: float = 1.0,
        ntk_factor: float = 1.0,
        proportional_attn: bool = False,
        base_seqlen: Optional[int] = None,
        train: bool = False,
        force_drop_ids=None,
    ):
        b, c, h, w = x.shape
        p = self.patch_size
        head_dim = self.dim // self.n_heads
        gh, gw = h // p, w // p

        tokens = patchify(x.astype(self.dtype), p)  # (B, gh*gw, p*p*C)
        tokens = nn.Dense(
            self.dim, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="x_embedder",
        )(tokens)

        if self.use_eol_token:
            eol = self.param("eol_token", nn.initializers.normal(stddev=0.02),
                             (self.dim,), self.param_dtype)
            tokens = tokens.reshape(b, gh, gw, self.dim)
            eol_col = jnp.broadcast_to(eol.astype(tokens.dtype), (b, gh, 1, self.dim))
            tokens = jnp.concatenate([tokens, eol_col], axis=2).reshape(b, gh * (gw + 1), self.dim)
            seq_len = gh * (gw + 1)
        else:
            seq_len = gh * gw

        angles = rope_angles_1d(
            head_dim, jnp.arange(seq_len), self.rope_theta,
            linear_factor=rope_scaling_factor, ntk_factor=ntk_factor,
        )

        cond_dim = min(self.dim, 1024)
        t_emb = TimestepEmbedder(cond_dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="t_embedder")(t)
        if self.num_classes > 0:
            cond = t_emb + LabelEmbedder(
                self.num_classes, cond_dim, self.class_dropout_prob, dtype=self.dtype,
                param_dtype=self.param_dtype, name="y_embedder",
            )(y, train=train, force_drop_ids=force_drop_ids)
            cap_feats_c = cap_mask_c = None
        else:
            cond = t_emb + CaptionEmbedder(cond_dim, dtype=self.dtype,
                                           param_dtype=self.param_dtype, name="cap_embedder")(
                pooled_caption(cap_feats.astype(self.dtype), cap_mask)
            )
            cap_feats_c, cap_mask_c = cap_feats.astype(self.dtype), cap_mask

        attn_scale = (
            proportional_attn_scale(seq_len, base_seqlen, head_dim)
            if proportional_attn and base_seqlen
            else default_attn_scale(head_dim)
        )

        block_kwargs = dict(
            dim=self.dim, n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            multiple_of=self.multiple_of, ffn_dim_multiplier=self.ffn_dim_multiplier,
            norm_eps=self.norm_eps, qk_norm=self.qk_norm, y_dim=self.cap_feat_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, attn_impl=self.attn_impl,
        )
        if self.scan_blocks:
            block_cls = _ScannedFlagDiTBlock
            block_cls = maybe_remat(block_cls, self.remat, self.remat_policy)
            blocks = nn.scan(
                block_cls,
                variable_axes={"params": 0, "calibration": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=self.n_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )(**block_kwargs, name="layers")
            tokens, _ = blocks(tokens, None, angles, cap_feats_c, cap_mask_c, cond, attn_scale)
        else:
            for i in range(self.n_layers):
                tokens = FlagDiTBlock(**block_kwargs, name=f"layers_{i}")(
                    tokens, None, angles, cap_feats_c, cap_mask_c, cond, attn_scale
                )

        tokens = FinalLayer(
            self.dim, p, self.out_channels, modulation="shift_scale", dtype=self.dtype,
            param_dtype=self.param_dtype, name="final_layer",
        )(tokens, cond)

        # unpatchify, dropping the [eol] column (`model.py:743-768`)
        if self.use_eol_token:
            tokens = tokens.reshape(b, gh, gw + 1, p * p * self.out_channels)[:, :, :gw]
            tokens = tokens.reshape(b, gh * gw, p * p * self.out_channels)
        x_out = tokens.reshape(b, gh, gw, p, p, self.out_channels)
        x_out = jnp.einsum("nhwpqc->nchpwq", x_out).reshape(b, self.out_channels, h, w)
        if self.learn_sigma:
            x_out = x_out[:, : self.out_channels // 2]
        return x_out.astype(jnp.float32)


def forward_with_cfg(model, variables, x, t, cfg_scale, num_cfg_channels: int = 3,
                     rope_scaling_factor: float = 1.0, ntk_factor: float = 1.0,
                     mutable=False, **cond_kwargs):
    """Duplicated-half-batch CFG (`lumina_t2i/models/model.py:866-922`).

    `mutable` forwards to `model.apply` (static-max calibration probe);
    when set, returns `(velocity, updates)`."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = model.apply(
        variables, combined, t,
        rope_scaling_factor=rope_scaling_factor, ntk_factor=ntk_factor,
        mutable=mutable, **cond_kwargs,
    )
    updates = None
    if mutable:
        out, updates = out
    eps, rest = out[:, :num_cfg_channels], out[:, num_cfg_channels:]
    b = eps.shape[0] // 2
    cond_eps, uncond_eps = eps[:b], eps[b:]
    half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    vel = jnp.concatenate([eps, rest], axis=1)
    return (vel, updates) if mutable else vel


# -- configs -----------------------------------------------------------------


def FlagDiT_5B_patch2(**kwargs):
    """`DiT_Llama_5B_patch2` (`lumina_t2i/models/model.py:990-991`).

    cap_feat_dim defaults to 4096 (LLaMA-2-7B features) but stays
    overridable — the sampler passes the active text encoder's width."""
    kwargs.setdefault("cap_feat_dim", 4096)
    return FlagDiT(patch_size=2, dim=3072, n_layers=32, n_heads=32, **kwargs)


def FlagDiT_ImageNet_600M_patch2(**kwargs):
    """`Flag-DiT-ImageNet` 600M (`model.py:696-697`)."""
    return FlagDiT(patch_size=2, dim=1536, n_layers=16, n_heads=32, num_classes=1000,
                   use_eol_token=False, **kwargs)


def FlagDiT_ImageNet_3B_patch2(**kwargs):
    return FlagDiT(patch_size=2, dim=3072, n_layers=32, n_heads=32, num_classes=1000,
                   use_eol_token=False, **kwargs)


def FlagDiT_ImageNet_7B_patch2(**kwargs):
    return FlagDiT(patch_size=2, dim=4096, n_layers=32, n_heads=32, num_classes=1000,
                   use_eol_token=False, **kwargs)
