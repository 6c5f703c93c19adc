"""Class-conditional NextDiT for ImageNet (the ablation/benchmark family).

TPU-native re-design of `Next-DiT-ImageNet/models/models.py:836-1055`
(`DiT_Llama`, class-conditional, 2-D RoPE, sandwich-norm-2 blocks):

- block = `TransformerBlockSandwichNorm2` (`models.py:692-796`): fp32 RMSNorm
  (PFRMSNorm) *inner* norms with scale-modulate, plain RMSNorm *outer* norms,
  4-chunk adaLN (scale, tanh-gate) — note gates are tanh'd, shifts absent;
- final layer uses shift+scale 2-chunk adaLN (`models.py:818-833`), unlike
  the T2I NextDiT's scale-only;
- conditioning = timestep embedding + label embedding with CFG dropout
  (`models.py:933-935`);
- no cross-attention, no token masking (fixed-resolution class-cond batches).

This is the minimum end-to-end slice model (BASELINE.json config 1:
600M class-conditional 256**2 sampling, midpoint solver).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import default_attn_scale
from ..ops.rope import rope_angles_2d
from .layers import (
    maybe_remat,
    Attention,
    FeedForward,
    FinalLayer,
    LabelEmbedder,
    RMSNorm,
    TimestepEmbedder,
    modulate,
    patchify,
    unpatchify,
)


class NextDiTImageNetBlock(nn.Module):
    """`TransformerBlockSandwichNorm2` (`models.py:692-796`)."""

    dim: int
    n_heads: int
    n_kv_heads: Optional[int]
    multiple_of: int
    ffn_dim_multiplier: Optional[float]
    norm_eps: float
    qk_norm: bool
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, angles, adaln_input):
        mod = nn.Dense(4 * self.dim, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="adaLN_modulation")(nn.silu(adaln_input))
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, axis=-1)

        attn_out = Attention(
            dim=self.dim, n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            qk_norm=self.qk_norm, y_dim=0, dtype=self.dtype,
            param_dtype=self.param_dtype, attn_impl=self.attn_impl,
            name="attention",
        )(
            # inner norms are parameter-free (PFRMSNorm, `models.py:744-746`)
            modulate(RMSNorm(eps=self.norm_eps, use_scale=False,
                             name="attention_norm1")(x), scale_msa),
            None, angles, None, None, default_attn_scale(self.dim // self.n_heads),
        )
        x = x + jnp.tanh(gate_msa)[:, None, :].astype(x.dtype) * RMSNorm(
            eps=self.norm_eps, name="attention_norm"
        )(attn_out)

        mlp_out = FeedForward(
            dim=self.dim, hidden_dim=4 * self.dim, multiple_of=self.multiple_of,
            ffn_dim_multiplier=self.ffn_dim_multiplier, dtype=self.dtype,
            param_dtype=self.param_dtype, name="feed_forward",
        )(modulate(RMSNorm(eps=self.norm_eps, use_scale=False, name="ffn_norm1")(x),
                   scale_mlp))
        x = x + jnp.tanh(gate_mlp)[:, None, :].astype(x.dtype) * RMSNorm(
            eps=self.norm_eps, name="ffn_norm"
        )(mlp_out)
        return x


class _ScannedBlock(NextDiTImageNetBlock):
    @nn.compact
    def __call__(self, x, angles, adaln_input):
        return NextDiTImageNetBlock.__call__(self, x, angles, adaln_input), None


class NextDiTImageNet(nn.Module):
    """Class-conditional NextDiT (`models.py:836-1035`)."""

    patch_size: int = 2
    in_channels: int = 4
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    qk_norm: bool = False
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.float32
    # dtype of stored params (fp32 default; bf16 halves param HBM for the
    # 3B/7B configs on one chip)
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    scan_blocks: bool = True
    remat: bool = False
    remat_policy: str = "dots"  # see layers.maybe_remat

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @nn.compact
    def __call__(self, x, t, y, *, rope_scaling_factor: float = 1.0, ntk_factor: float = 1.0,
                 train: bool = False, force_drop_ids=None):
        """x: (B, C, H, W); t: (B,); y: (B,) int labels."""
        b, c, h, w = x.shape
        p = self.patch_size
        head_dim = self.dim // self.n_heads
        gh, gw = h // p, w // p

        angles = rope_angles_2d(
            head_dim, gh, gw, self.rope_theta,
            linear_factor=rope_scaling_factor, ntk_factor=ntk_factor,
        ).reshape(gh * gw, head_dim // 2)

        tokens = patchify(x.astype(self.dtype), p)
        tokens = nn.Dense(
            self.dim, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="x_embedder",
        )(tokens)

        cond_dim = min(self.dim, 1024)
        t_emb = TimestepEmbedder(cond_dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="t_embedder")(t)
        y_emb = LabelEmbedder(
            self.num_classes, cond_dim, self.class_dropout_prob, dtype=self.dtype,
            param_dtype=self.param_dtype, name="y_embedder",
        )(y, train=train, force_drop_ids=force_drop_ids)
        adaln_input = t_emb + y_emb

        block_kwargs = dict(
            dim=self.dim, n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            multiple_of=self.multiple_of, ffn_dim_multiplier=self.ffn_dim_multiplier,
            norm_eps=self.norm_eps, qk_norm=self.qk_norm, dtype=self.dtype,
            param_dtype=self.param_dtype, attn_impl=self.attn_impl,
        )
        if self.scan_blocks:
            block_cls = _ScannedBlock
            block_cls = maybe_remat(block_cls, self.remat, self.remat_policy)
            blocks = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=self.n_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )(**block_kwargs, name="layers")
            tokens, _ = blocks(tokens, angles, adaln_input)
        else:
            for i in range(self.n_layers):
                tokens = NextDiTImageNetBlock(**block_kwargs, name=f"layers_{i}")(
                    tokens, angles, adaln_input
                )

        tokens = FinalLayer(
            self.dim, p, self.out_channels, modulation="shift_scale", dtype=self.dtype,
            param_dtype=self.param_dtype, name="final_layer",
        )(tokens, adaln_input)

        out = unpatchify(tokens, h, w, p, self.out_channels)
        if self.learn_sigma:
            out = out[:, : self.out_channels // 2]
        return out.astype(jnp.float32)


def forward_with_cfg(model, variables, x, t, y, cfg_scale, num_cfg_channels: int = 3, **kwargs):
    """Duplicated-half-batch CFG (`models.py:946-974`).

    `y` is passed by KEYWORD: NextDiTImageNet takes (x, t, y) but the
    class-conditional FlagDiT configs share the text model's signature
    (x, t, cap_feats=None, ..., y=None) — positional y would silently land
    in cap_feats."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = model.apply(variables, combined, t, y=y, **kwargs)
    eps, rest = out[:, :num_cfg_channels], out[:, num_cfg_channels:]
    b = eps.shape[0] // 2
    cond_eps, uncond_eps = eps[:b], eps[b:]
    half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=1)


# -- configs (`models.py:1042-1055`) ----------------------------------------


def NextDiT_ImageNet_Tiny_patch2(**kwargs):
    """~1M-param debug config (no reference analogue): CLI smoke tests and
    CPU drives of the class-cond pipelines."""
    return NextDiTImageNet(patch_size=2, dim=64, n_layers=2, n_heads=4,
                           multiple_of=16, **kwargs)


def NextDiT_ImageNet_Small_patch2(**kwargs):
    """~25M-param config (no reference analogue): the in-environment quality
    demonstration — small enough to train from scratch to convergence on
    procedural pixel-space data (`data/shapes.py`) in minutes on one chip."""
    return NextDiTImageNet(patch_size=2, dim=384, n_layers=8, n_heads=8,
                           multiple_of=64, **kwargs)


def NextDiT_ImageNet_600M_patch2(**kwargs):
    return NextDiTImageNet(patch_size=2, dim=1536, n_layers=16, n_heads=32, **kwargs)


def NextDiT_ImageNet_2B_patch2(**kwargs):
    return NextDiTImageNet(patch_size=2, dim=2304, n_layers=24, n_heads=32, **kwargs)


def NextDiT_ImageNet_3B_patch2(**kwargs):
    return NextDiTImageNet(patch_size=2, dim=3072, n_layers=32, n_heads=32, **kwargs)


def NextDiT_ImageNet_7B_patch2(**kwargs):
    return NextDiTImageNet(patch_size=2, dim=4096, n_layers=32, n_heads=32, **kwargs)
