"""MMDiT (Stable Diffusion 3 transformer) — flax implementation.

The reference's mini pipeline trains/samples SD3 through the same flow
framework by importing diffusers' `SD3Transformer2DModel`
(`lumina_next_t2i_mini/sample_sd3.py:33-116`,
`train_dreambooth_sd3.py:25,466`). diffusers is not a dependency here, so
the backbone itself is provided: the MMDiT dual-stream architecture —

- image tokens: 2x2 patchify -> linear -> learned-position-free (2D sincos
  positional embedding);
- context tokens: text features -> linear; pooled text + timestep -> adaLN
  conditioning vector;
- each block modulates the two streams with separate 6-chunk adaLN
  (shift/scale/gate for attention and MLP), projects per-stream QKV with
  optional qk RMSNorm, runs JOINT attention over [context; image], splits
  back, applies per-stream output projections and GELU MLPs;
- the final block drops the context stream (context_pre_only); final layer =
  adaLN shift/scale + zero-init linear to patch^2 * out_channels.

Pairs with `transport/mini.MiniODE(use_sd3=True)` (reversed-time schedule,
t*1000, in-loop CFG) and the DreamBooth trainer.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import sdpa
from ..ops.norms import rms_norm
from .layers import LayerNorm, TimestepEmbedder, modulate, patchify, unpatchify


def sincos_pos_embed_2d(dim: int, gh: int, gw: int,
                        max_size: Optional[int] = None,
                        base_size: Optional[int] = None):
    """2-D sin-cos positional embedding, diffusers-convention.

    Matches diffusers' `PatchEmbed`/`get_2d_sincos_pos_embed` exactly (the
    values real SD3 checkpoints' trained `x_embedder` expects; the table is a
    persistent `pos_embed.pos_embed` buffer there, but it is a deterministic
    function of (dim, grid), so recomputing it is equivalent — the importer
    cross-checks when the buffer is present):

    - the FIRST dim/2 channels encode the COLUMN (w) coordinate and the
      second half the row — diffusers builds `np.meshgrid(grid_w, grid_h)`
      and feeds `grid[0]` (the meshed w coordinates) to the half it calls
      `emb_h`;
    - with `max_size` (SD3: `pos_embed_max_size=192`) positions come from a
      (max_size, max_size) grid scaled by `base_size/max_size` (SD3:
      `base_size = sample_size//patch = 64`) and the (gh, gw) window is
      CENTER-cropped out (`PatchEmbed.cropped_pos_embed`);
    - without `max_size`, positions are `arange * base_size/g` (diffusers'
      non-cropped branch has `base_size == grid_size`, i.e. plain arange).
    """
    if max_size is None:
        ph = np.arange(gh, dtype=np.float64) * ((base_size / gh) if base_size else 1.0)
        pw = np.arange(gw, dtype=np.float64) * ((base_size / gw) if base_size else 1.0)
    else:
        if gh > max_size or gw > max_size:
            raise ValueError(f"grid ({gh},{gw}) exceeds pos_embed_max_size {max_size}")
        scale = (base_size or max_size) / max_size
        top, left = (max_size - gh) // 2, (max_size - gw) // 2
        ph = (top + np.arange(gh, dtype=np.float64)) * scale
        pw = (left + np.arange(gw, dtype=np.float64)) * scale

    def one_axis(pos, d):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=np.float64) / (d / 2.0))
        out = np.einsum("p,f->pf", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (n, d)

    ew = one_axis(pw, dim // 2)  # (gw, dim/2) — w coordinate, first half
    eh = one_axis(ph, dim // 2)
    grid = np.concatenate(
        [np.repeat(ew[None, :, :], gh, 0), np.repeat(eh[:, None, :], gw, 1)], axis=-1
    )
    return jnp.asarray(grid.reshape(gh * gw, dim), jnp.float32)


class MMDiTBlock(nn.Module):
    dim: int
    n_heads: int
    qk_norm: bool = True
    context_pre_only: bool = False
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, cond):
        """x: image tokens (B, Sx, D); c: context tokens (B, Sc, D);
        cond: (B, D) adaLN vector. Returns (x, c) (c=None if pre_only)."""
        head_dim = self.dim // self.n_heads
        zeros = nn.initializers.zeros

        x_mod = nn.Dense(6 * self.dim, kernel_init=zeros, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="x_adaLN")(nn.silu(cond))
        sx1, scx1, gx1, sx2, scx2, gx2 = jnp.split(x_mod, 6, axis=-1)
        n_c_chunks = 2 if self.context_pre_only else 6
        c_mod = nn.Dense(n_c_chunks * self.dim, kernel_init=zeros, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="c_adaLN")(nn.silu(cond))
        c_chunks = jnp.split(c_mod, n_c_chunks, axis=-1)

        def qkv(h, prefix):
            q = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name=f"{prefix}_q")(h)
            k = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name=f"{prefix}_k")(h)
            v = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name=f"{prefix}_v")(h)
            b, s, _ = h.shape
            q = q.reshape(b, s, self.n_heads, head_dim)
            k = k.reshape(b, s, self.n_heads, head_dim)
            if self.qk_norm:
                wq = self.param(f"{prefix}_q_norm", nn.initializers.ones, (head_dim,),
                                jnp.float32)
                wk = self.param(f"{prefix}_k_norm", nn.initializers.ones, (head_dim,),
                                jnp.float32)
                # eps=1e-6: diffusers' JointTransformerBlock builds its
                # Attention with eps=1e-6, which flows into norm_q/norm_k
                q = rms_norm(q, wq, eps=1e-6)
                k = rms_norm(k, wk, eps=1e-6)
            return q, k, v.reshape(b, s, self.n_heads, head_dim)

        x_in = modulate(LayerNorm(eps=1e-6, use_affine=False, name="x_norm1")(x), scx1, sx1)
        c_in = modulate(LayerNorm(eps=1e-6, use_affine=False, name="c_norm1")(c),
                        c_chunks[1], c_chunks[0])
        qx, kx, vx = qkv(x_in, "x")
        qc, kc, vc = qkv(c_in, "c")
        # joint attention over [context; image]
        q = jnp.concatenate([qc, qx], axis=1)
        k = jnp.concatenate([kc, kx], axis=1)
        v = jnp.concatenate([vc, vx], axis=1)
        attn = sdpa(q, k, v)
        sc = c.shape[1]
        attn_c, attn_x = attn[:, :sc], attn[:, sc:]
        b = x.shape[0]

        x_attn = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="x_proj")(
            attn_x.reshape(b, -1, self.dim)
        )
        x = x + gx1[:, None, :].astype(x.dtype) * x_attn
        x_mlp_in = modulate(LayerNorm(eps=1e-6, use_affine=False, name="x_norm2")(x), scx2, sx2)
        hidden = int(self.dim * self.mlp_ratio)
        x_mlp = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="x_mlp_out")(
            nn.gelu(nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="x_mlp_in")(x_mlp_in),
                    approximate=True)
        )
        x = x + gx2[:, None, :].astype(x.dtype) * x_mlp

        if self.context_pre_only:
            return x, None

        c_attn = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="c_proj")(
            attn_c.reshape(b, -1, self.dim)
        )
        c = c + c_chunks[2][:, None, :].astype(c.dtype) * c_attn
        c_mlp_in = modulate(LayerNorm(eps=1e-6, use_affine=False, name="c_norm2")(c),
                            c_chunks[4], c_chunks[3])
        c_mlp = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="c_mlp_out")(
            nn.gelu(nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="c_mlp_in")(c_mlp_in),
                    approximate=True)
        )
        c = c + c_chunks[5][:, None, :].astype(c.dtype) * c_mlp
        return x, c


class MMDiT(nn.Module):
    """SD3-style dual-stream transformer: (B, C, H, W) latents + text."""

    patch_size: int = 2
    in_channels: int = 16
    dim: int = 1536
    n_layers: int = 24
    n_heads: int = 24
    context_dim: int = 4096
    pooled_dim: int = 2048
    out_channels: Optional[int] = None
    qk_norm: bool = True
    # SD3 positional-embedding geometry: the released checkpoints' x_embedder
    # is trained against a 192x192 table with positions scaled by 64/192
    # (sample_size 128 / patch 2), center-cropped per resolution. None = plain
    # arange positions over the actual grid (from-scratch trainings).
    pos_embed_max_size: Optional[int] = None
    pos_embed_base_size: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, context, pooled):
        """x: (B, C, H, W); t: (B,) timesteps (SD3 convention: ~[0, 1000]);
        context: (B, Sc, context_dim); pooled: (B, pooled_dim)."""
        b, ch, h, w = x.shape
        p = self.patch_size
        out_ch = self.out_channels or self.in_channels
        gh, gw = h // p, w // p

        tokens = patchify(x.astype(self.dtype), p)
        tokens = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="x_embedder")(tokens)
        tokens = tokens + sincos_pos_embed_2d(
            self.dim, gh, gw, max_size=self.pos_embed_max_size,
            base_size=self.pos_embed_base_size,
        )[None].astype(tokens.dtype)

        c = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="context_embedder")(
            context.astype(self.dtype)
        )
        t_emb = TimestepEmbedder(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="t_embedder")(t)
        pooled_emb = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="pooled_in")(
            nn.silu(nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="pooled_hidden")(
                pooled.astype(self.dtype)))
        )
        cond = t_emb + pooled_emb

        for i in range(self.n_layers):
            tokens, c = MMDiTBlock(
                dim=self.dim, n_heads=self.n_heads, qk_norm=self.qk_norm,
                context_pre_only=(i == self.n_layers - 1), dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )(tokens, c if c is not None else jnp.zeros_like(tokens[:, :0]), cond)

        mod = nn.Dense(2 * self.dim, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="final_adaLN")(nn.silu(cond))
        shift, scale = jnp.split(mod, 2, axis=-1)
        tokens = modulate(LayerNorm(eps=1e-6, use_affine=False, name="final_norm")(tokens),
                          scale, shift)
        tokens = nn.Dense(p * p * out_ch, kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, param_dtype=self.param_dtype, name="final_linear")(tokens)
        return unpatchify(tokens, h, w, p, out_ch).astype(jnp.float32)


def MMDiT_SD3_Medium(**kwargs):
    """SD3-medium-shaped config (24 layers, dim 1536, 16 latent channels)."""
    kwargs.setdefault("pos_embed_max_size", 192)
    kwargs.setdefault("pos_embed_base_size", 64)
    return MMDiT(patch_size=2, in_channels=16, dim=1536, n_layers=24, n_heads=24, **kwargs)
