"""FlagDiT-1D — the temporal denoiser for text-to-audio / text-to-music.

TPU-native re-design of
`lumina_music/models/diffusion/flag_large_dit.py:485-659` (byte-duplicated in
lumina_audio): a non-parallel Flag-DiT over (B, C, T) mel-spectrogram
latents:

- `proj_in` linear embedding of latent channels (`flag_large_dit.py:514`);
- 1-D RoPE over time, end=max_len=1000, NTK/linear scaling options
  (`flag_large_dit.py:580-613`);
- pre-norm blocks with 6-chunk adaLN (shift/scale/gate x2, raw gates) and
  gated cross-attention to the text context (`flag_large_dit.py:375-458`);
  adaLN input dim here is the FULL hidden size (unlike the image DiTs'
  min(dim, 1024));
- conditioning = timestep embedding + pooled-context embedding
  (`flag_large_dit.py:563-571`);
- FinalLayer: LayerNorm + shift/scale adaLN + Linear(hidden -> out_channels)
  — channel-wise, no patching (`flag_large_dit.py:460-482`);
- FlagDiTv2's DiT-style zero-init scheme (`flag_large_dit.py:634-657`) is
  the default here (zero adaLN, zero final layer).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import default_attn_scale, proportional_attn_scale
from ..ops.rope import rope_angles_1d
from .flag_dit import FlagDiTBlock
from .layers import maybe_remat, LayerNorm, TimestepEmbedder, modulate, pooled_caption


class FlagDiT1D(nn.Module):
    """(B, C, T) -> (B, C, T) velocity prediction."""

    in_channels: int
    context_dim: int
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    max_len: int = 1000
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    qk_norm: bool = False
    rope_theta: float = 10000.0
    rope_scaling_factor: float = 1.0
    ntk_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    scan_blocks: bool = True
    remat: bool = False
    remat_policy: str = "dots"  # see layers.maybe_remat

    @nn.compact
    def __call__(self, x, t, context, *, proportional_attn: bool = False,
                 base_seqlen: Optional[int] = None):
        b, c, seq = x.shape
        head_dim = self.hidden_size // self.num_heads

        h = x.astype(self.dtype).transpose(0, 2, 1)  # (B, T, C)
        h = nn.Dense(self.hidden_size, kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj_in")(h)

        angles = rope_angles_1d(
            head_dim, jnp.arange(seq), self.rope_theta,
            linear_factor=self.rope_scaling_factor, ntk_factor=self.ntk_factor,
        )

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="t_embedder")(t)
        context = context.astype(self.dtype)
        cap_mask = jnp.ones(context.shape[:2], jnp.int32)
        cap_pool = pooled_caption(context, cap_mask)
        cap_emb = nn.Dense(
            self.hidden_size, kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="cap_embedder_proj",
        )(LayerNorm(eps=1e-5, name="cap_embedder_norm")(cap_pool))
        adaln_input = t_emb + cap_emb

        attn_scale = (
            proportional_attn_scale(seq, base_seqlen, head_dim)
            if proportional_attn and base_seqlen
            else default_attn_scale(head_dim)
        )
        block_kwargs = dict(
            dim=self.hidden_size, n_heads=self.num_heads, n_kv_heads=self.n_kv_heads,
            multiple_of=self.multiple_of, ffn_dim_multiplier=self.ffn_dim_multiplier,
            norm_eps=self.norm_eps, qk_norm=self.qk_norm, y_dim=self.context_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, attn_impl=self.attn_impl,
        )
        if self.scan_blocks:
            from .flag_dit import _ScannedFlagDiTBlock

            block_cls = _ScannedFlagDiTBlock
            block_cls = maybe_remat(block_cls, self.remat, self.remat_policy)
            blocks = nn.scan(
                block_cls, variable_axes={"params": 0}, split_rngs={"params": True},
                in_axes=nn.broadcast, length=self.depth,
                metadata_params={nn.PARTITION_NAME: None},
            )(**block_kwargs, name="blocks")
            h, _ = blocks(h, None, angles, context, cap_mask, adaln_input, attn_scale)
        else:
            for i in range(self.depth):
                h = FlagDiTBlock(**block_kwargs, name=f"blocks_{i}")(
                    h, None, angles, context, cap_mask, adaln_input, attn_scale
                )

        # final layer (`flag_large_dit.py:460-482`)
        h_norm = LayerNorm(eps=1e-6, use_affine=False, name="final_norm")(h)
        mod = nn.Dense(2 * self.hidden_size, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="final_adaLN_modulation")(nn.silu(adaln_input))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h_out = modulate(h_norm, scale, shift)
        h_out = nn.Dense(self.in_channels, kernel_init=nn.initializers.zeros,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="final_linear")(h_out)
        return h_out.transpose(0, 2, 1).astype(jnp.float32)  # (B, C, T)
