"""Region-controlled compositional NextDiT.

TPU-native re-design of
`lumina_next_compositional_generation/models/model.py:337-451,852-899`:

- caption features carry num_y rows: region captions [0..R-1], then the
  negative/unconditional caption as the last row; the image batch is the CFG
  pair (cond, uncond);
- cross-attention runs per caption row: the cond image's queries attend every
  region caption, the uncond image's queries attend the last caption
  (`model.py:423`);
- the joint mask `y_mask & region_mask` restricts each region caption to its
  spatial cells (`model.py:427-431`); queries outside a caption's region
  produce NaN rows in the reference and are nan_to_num'ed to zero
  (`model.py:442`) — here the same semantics fall out of multiplying the
  attention output by the query-side region mask (no NaNs ever materialize);
- per-region outputs are summed into the cond row; the uncond row takes the
  last caption's output (`model.py:444-446`);
- region layout: an h_split x w_split grid over patch space with the quirky
  `region_id = (h+1)*(w+1)-1` indexing and an all-ones last region, mirrored
  exactly (`model.py:872-886`);
- adaLN conditioning pools the *global* caption (`model.py:865-870`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import attention as attention_op
from ..ops.attention import default_attn_scale, proportional_attn_scale, sdpa
from ..ops.rope import apply_rope, rope_angles_2d_timeaware
from .layers import (
    maybe_remat,
    CaptionEmbedder,
    FeedForward,
    FinalLayer,
    LayerNorm,
    RMSNorm,
    TimestepEmbedder,
    modulate,
    patchify,
    pooled_caption,
    unpatchify,
)


def build_region_mask(num_y: int, grid_h: int, grid_w: int, h_split_num: int, w_split_num: int):
    """(num_y, grid_h*grid_w) bool mask (`model.py:872-886`)."""
    mask = np.zeros((num_y, grid_h, grid_w), np.float32)
    hp, wp = grid_h // h_split_num, grid_w // w_split_num
    for hs in range(h_split_num):
        for ws in range(w_split_num):
            region_id = (hs + 1) * (ws + 1) - 1
            mask[region_id, hp * hs : hp * (hs + 1), wp * ws : wp * (ws + 1)] = 1
    mask[-1, :, :] = 1
    return jnp.asarray(mask.reshape(num_y, grid_h * grid_w) > 0.5)


class CompositionalAttention(nn.Module):
    """Self-attention + per-region caption cross-attention."""

    dim: int
    n_heads: int
    n_kv_heads: Optional[int] = None
    qk_norm: bool = False
    y_dim: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, x_mask, angles, y, y_mask, region_mask, attn_scale=None):
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
            xq = LayerNorm(eps=1e-5, name="q_norm")(xq)
            xk = LayerNorm(eps=1e-5, name="k_norm")(xk)
        xq = xq.reshape(b, s, self.n_heads, head_dim)
        xk = xk.reshape(b, s, n_kv, head_dim)
        xv = xv.reshape(b, s, n_kv, head_dim)
        xq = apply_rope(xq, angles)
        xk = apply_rope(xk, angles)

        out = attention_op(
            xq, xk, xv, kv_mask=x_mask,
            scale=attn_scale if attn_scale is not None else default_attn_scale(head_dim),
            impl=self.attn_impl,
        )

        if self.y_dim > 0 and y is not None:
            num_y, ly = y.shape[0], y.shape[1]
            yk = nn.Dense(n_kv * head_dim, use_bias=False, kernel_init=init,
                          dtype=self.dtype, param_dtype=self.param_dtype, name="wk_y")(y)
            if self.qk_norm:
                yk = LayerNorm(eps=1e-5, name="ky_norm")(yk)
            yv = nn.Dense(n_kv * head_dim, use_bias=False, kernel_init=init,
                          dtype=self.dtype, param_dtype=self.param_dtype, name="wv_y")(y)
            yk = yk.reshape(num_y, ly, n_kv, head_dim)
            yv = yv.reshape(num_y, ly, n_kv, head_dim)
            gate = self.param("gate", nn.initializers.zeros, (self.n_heads,), jnp.float32)

            # cond queries attend all region captions; uncond row -> last cap
            q_rep = jnp.concatenate(
                [jnp.broadcast_to(xq[0:1], (num_y - 1, s, self.n_heads, head_dim)), xq[-1:]],
                axis=0,
            )
            out_y = sdpa(q_rep, yk, yv, kv_mask=y_mask)  # (num_y, S, H, D)
            # query-side region restriction (== reference nan_to_num of fully
            # masked rows)
            out_y = out_y * region_mask[:, :, None, None].astype(out_y.dtype)
            out_y = out_y * jnp.tanh(gate).astype(out_y.dtype)[None, None, :, None]
            out_y_cond = jnp.sum(out_y[:-1], axis=0, keepdims=True)
            out_y = jnp.concatenate([out_y_cond, out_y[-1:]], axis=0)
            out = out + out_y

        out = out.reshape(b, s, self.n_heads * head_dim)
        return nn.Dense(self.dim, use_bias=False, kernel_init=init, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="wo")(out)


class CompositionalBlock(nn.Module):
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
    def __call__(self, x, x_mask, angles, y, y_mask, region_mask, adaln_input, attn_scale=None):
        mod = nn.Dense(4 * self.dim, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="adaLN_modulation")(nn.silu(adaln_input))
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, axis=-1)

        y_normed = RMSNorm(eps=self.norm_eps, name="attention_y_norm")(y)
        attn_out = CompositionalAttention(
            dim=self.dim, n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            qk_norm=self.qk_norm, y_dim=self.y_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, attn_impl=self.attn_impl, name="attention",
        )(
            modulate(RMSNorm(eps=self.norm_eps, name="attention_norm1")(x), scale_msa),
            x_mask, angles, y_normed, y_mask, region_mask, attn_scale,
        )
        x = x + jnp.tanh(gate_msa)[:, None, :].astype(x.dtype) * RMSNorm(
            eps=self.norm_eps, name="attention_norm2"
        )(attn_out)

        mlp_out = FeedForward(
            dim=self.dim, hidden_dim=4 * self.dim, multiple_of=self.multiple_of,
            ffn_dim_multiplier=self.ffn_dim_multiplier, dtype=self.dtype,
            param_dtype=self.param_dtype, name="feed_forward",
        )(modulate(RMSNorm(eps=self.norm_eps, name="ffn_norm1")(x), scale_mlp))
        x = x + jnp.tanh(gate_mlp)[:, None, :].astype(x.dtype) * RMSNorm(
            eps=self.norm_eps, name="ffn_norm2"
        )(mlp_out)
        return x


class _ScannedCompositionalBlock(CompositionalBlock):
    @nn.compact
    def __call__(self, x, x_mask, angles, y, y_mask, region_mask, adaln_input, attn_scale=None):
        return (
            CompositionalBlock.__call__(self, x, x_mask, angles, y, y_mask, region_mask,
                                        adaln_input, attn_scale),
            None,
        )


class NextDiTCompositional(nn.Module):
    """NextDiT with region-masked caption cross-attention (`model.py:677-899`)."""

    patch_size: int = 2
    in_channels: int = 4
    dim: int = 2304
    n_layers: int = 24
    n_heads: int = 32
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    learn_sigma: bool = True
    qk_norm: bool = False
    cap_feat_dim: int = 2048
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    scan_blocks: bool = True
    remat: bool = False
    remat_policy: str = "dots"  # see layers.maybe_remat

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @nn.compact
    def __call__(self, x, t, cap_feats, cap_mask, global_cap_feats, global_cap_mask, *,
                 h_split_num: int = 1, w_split_num: int = 1, rope_timestep=1.0,
                 scale_factor: float = 1.0, scale_watershed: float = 1.0,
                 proportional_attn: bool = False, base_seqlen: Optional[int] = None):
        """x: (2, C, H, W) CFG pair; cap_feats: (num_y, Ly, D) region captions
        + trailing negative caption; global_cap_*: (2, Lg, D) for adaLN."""
        b, c, h, w = x.shape
        p = self.patch_size
        head_dim = self.dim // self.n_heads
        gh, gw = h // p, w // p
        seq_len = gh * gw

        grid_angles = rope_angles_2d_timeaware(
            head_dim, gh, gw, self.rope_theta, scale_factor=scale_factor,
            scale_watershed=scale_watershed, timestep=rope_timestep,
        )
        angles = grid_angles.reshape(seq_len, head_dim // 2)
        region_mask = build_region_mask(cap_feats.shape[0], gh, gw, h_split_num, w_split_num)

        tokens = patchify(x.astype(self.dtype), p)
        tokens = nn.Dense(
            self.dim, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="x_embedder",
        )(tokens)
        self.param("pad_token", nn.initializers.normal(stddev=0.02), (self.dim,),
                   self.param_dtype)

        cond_dim = min(self.dim, 1024)
        t_emb = TimestepEmbedder(cond_dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="t_embedder")(t)
        cap_emb = CaptionEmbedder(cond_dim, dtype=self.dtype,
                                  param_dtype=self.param_dtype, name="cap_embedder")(
            pooled_caption(global_cap_feats.astype(self.dtype), global_cap_mask)
        )
        adaln_input = t_emb + cap_emb

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
        cap_feats_c = cap_feats.astype(self.dtype)
        if self.scan_blocks:
            block_cls = _ScannedCompositionalBlock
            block_cls = maybe_remat(block_cls, self.remat, self.remat_policy)
            blocks = nn.scan(
                block_cls, variable_axes={"params": 0}, split_rngs={"params": True},
                in_axes=nn.broadcast, length=self.n_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )(**block_kwargs, name="layers")
            tokens, _ = blocks(tokens, None, angles, cap_feats_c, cap_mask, region_mask,
                               adaln_input, attn_scale)
        else:
            for i in range(self.n_layers):
                tokens = CompositionalBlock(**block_kwargs, name=f"layers_{i}")(
                    tokens, None, angles, cap_feats_c, cap_mask, region_mask,
                    adaln_input, attn_scale
                )

        tokens = FinalLayer(self.dim, p, self.out_channels, modulation="scale",
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="final_layer")(tokens, adaln_input)
        out = unpatchify(tokens, h, w, p, self.out_channels)
        if self.learn_sigma:
            out = out[:, : self.out_channels // 2]
        return out.astype(jnp.float32)


def forward_with_cfg(model, variables, x, t, cap_feats, cap_mask, cfg_scale, *,
                     global_cap_feats, global_cap_mask, h_split_num=1, w_split_num=1,
                     scale_factor=1.0, scale_watershed=1.0, base_seqlen=None,
                     proportional_attn=False, num_cfg_channels: int = 3):
    """CFG over the (cond, uncond) pair (`model.py:901-955`)."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = model.apply(
        variables, combined, t, cap_feats, cap_mask, global_cap_feats, global_cap_mask,
        h_split_num=h_split_num, w_split_num=w_split_num, rope_timestep=t[0],
        scale_factor=scale_factor, scale_watershed=scale_watershed,
        proportional_attn=proportional_attn, base_seqlen=base_seqlen,
    )
    eps, rest = out[:, :num_cfg_channels], out[:, num_cfg_channels:]
    bb = eps.shape[0] // 2
    cond_eps, uncond_eps = eps[:bb], eps[bb:]
    half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=1)


def NextDiT_2B_patch2_Compositional(**kwargs):
    return NextDiTCompositional(patch_size=2, dim=2304, n_layers=24, n_heads=32, **kwargs)
