"""NextDiT — the flagship 2B text-to-image denoiser backbone.

TPU-native re-design of the reference NextDiT
(`lumina_next_t2i/models/model.py:665-999`). Behavior parity:

- 2-D axis-factorized RoPE with time-aware linear/NTK watershed scaling
  (`model.py:883-889,915-963`) — computed *inside* the jitted forward from a
  traced `rope_timestep`, instead of the reference's per-solver-step host
  recompute via `t.item()`;
- sandwich norm: RMSNorm before and after both attention and FFN
  (`model.py:554-558,594-624`);
- 4-chunk adaLN (scale + tanh-gate, no shift) from SiLU + zero-init linear of
  the min(dim,1024)-d conditioning (`model.py:560-569,594-595`);
- gated zero-init cross-attention to caption features (`model.py:420-434`);
- proportional attention softmax scale for resolution extrapolation
  (`model.py:373-376`);
- variable-aspect batches via per-item `img_sizes` + pad token
  (`patchify_and_embed`, `model.py:770-834`): on TPU the batch is padded to a
  static bucket shape and valid tokens are gathered to the front with
  trace-time index maps (static shapes; masks instead of unpadding);
- `learn_sigma` doubles output channels, second half dropped
  (`model.py:859-864`); CFG applied to the first 3 channels
  (`model.py:901-913`).

Tensor parallelism (the reference's fairscale Column/RowParallelLinear,
`model.py:16-17`) is *not* in this file: weights are plain Dense and the
parallel layout comes from GSPMD sharding rules in `parallel/sharding.py`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import anagram_attn_scale, default_attn_scale, proportional_attn_scale
from ..ops.rope import rope_angles_2d_timeaware
from .layers import (
    maybe_remat,
    Attention,
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


class NextDiTBlock(nn.Module):
    """Sandwich-norm transformer block with 4-chunk adaLN
    (`model.py:505-624`)."""

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
    kv_pool_grid: Optional[Tuple[int, int]] = None
    kv_merge_ratio: int = 1

    @nn.compact
    def __call__(self, x, x_mask, angles, y, y_mask, adaln_input, attn_scale=None):
        mod = nn.Dense(4 * self.dim, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="adaLN_modulation")(nn.silu(adaln_input))
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, axis=-1)

        y_normed = RMSNorm(eps=self.norm_eps, name="attention_y_norm")(y) if y is not None else None
        attn_out = Attention(
            dim=self.dim, n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            qk_norm=self.qk_norm, y_dim=self.y_dim, dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl, kv_pool_grid=self.kv_pool_grid,
            kv_merge_ratio=self.kv_merge_ratio, name="attention",
        )(
            modulate(RMSNorm(eps=self.norm_eps, name="attention_norm1")(x), scale_msa),
            x_mask, angles, y_normed, y_mask, attn_scale,
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


class _ScannedNextDiTBlock(NextDiTBlock):
    """Block with (carry, out) signature for nn.scan over layers."""

    @nn.compact
    def __call__(self, x, x_mask, angles, y, y_mask, adaln_input, attn_scale=None):
        x = NextDiTBlock.__call__(self, x, x_mask, angles, y, y_mask, adaln_input, attn_scale)
        return x, None


class NextDiT(nn.Module):
    """See module docstring. Config mirrors `model.py:670-685`."""

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
    cap_feat_dim: int = 5120
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.float32
    # dtype of the stored parameters (fp32 default; bf16 halves param HBM —
    # how release checkpoints serve 5B on one chip)
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    scan_blocks: bool = True
    remat: bool = False
    remat_policy: str = "dots"  # see layers.maybe_remat
    # context parallelism: shard the token axis over this mesh axis (GSPMD
    # partitions attention; the manual ring kernel lives in
    # ops/context_parallel.py). The reference has no sequence parallelism at
    # all (SURVEY.md §2.1) — this is the TPU-native extension.
    seq_shard_axis: Optional[str] = None

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @nn.compact
    def __call__(
        self,
        x,
        t,
        cap_feats,
        cap_mask,
        *,
        img_sizes: Optional[Sequence[Tuple[int, int]]] = None,
        rope_timestep=1.0,
        scale_factor: float = 1.0,
        scale_watershed: float = 1.0,
        proportional_attn: bool = False,
        base_seqlen: Optional[int] = None,
        attn_scale_variant: str = "proportional",
        kv_merge_ratio: int = 1,
        train: bool = False,
    ):
        """Denoise step.

        Args:
          x: (B, C, H, W) latents, padded to the bucket shape when img_sizes
            is given.
          t: (B,) diffusion times in [0, 1].
          cap_feats: (B, Ly, cap_feat_dim) caption features; cap_mask (B, Ly).
          img_sizes: optional static per-item (H_i, W_i) — the reference's
            list path.
          rope_timestep: scalar (traced ok) driving time-aware RoPE scaling.
        Returns: (B, out_ch_kept, H, W) velocity prediction.
        """
        b, c, h, w = x.shape
        p = self.patch_size
        head_dim = self.dim // self.n_heads
        gh, gw = h // p, w // p
        seq_len = gh * gw

        # -- RoPE angles for the (gh, gw) grid, time-aware scaling in-graph --
        grid_angles = rope_angles_2d_timeaware(
            head_dim, gh, gw, self.rope_theta,
            scale_factor=scale_factor, scale_watershed=scale_watershed,
            timestep=rope_timestep,
        )  # (gh, gw, head_dim//2)

        # -- patchify + embed -------------------------------------------------
        tokens = patchify(x.astype(self.dtype), p)  # (B, L, p*p*C)
        tokens = nn.Dense(
            self.dim, kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name="x_embedder",
        )(tokens)

        pad_token = self.param("pad_token", nn.initializers.normal(stddev=0.02),
                               (self.dim,), self.param_dtype)

        if img_sizes is None:
            x_mask = jnp.ones((b, seq_len), jnp.int32)
            angles = grid_angles.reshape(seq_len, head_dim // 2)
            item_sizes = [(h, w)] * b
        else:
            assert len(img_sizes) == b
            item_sizes = list(img_sizes)
            gather_rows, mask_rows, angle_rows = [], [], []
            for (hi, wi) in item_sizes:
                ghi, gwi = hi // p, wi // p
                idx = (np.arange(ghi)[:, None] * gw + np.arange(gwi)[None, :]).reshape(-1)
                n = idx.shape[0]
                gather_rows.append(
                    np.concatenate([idx, np.full((seq_len - n,), idx[-1], idx.dtype)]).astype(np.int32)
                )
                m = np.zeros((seq_len,), np.int32)
                m[:n] = 1
                mask_rows.append(m)
                item_angles = grid_angles[:ghi, :gwi].reshape(ghi * gwi, head_dim // 2)
                # pad freqs with the last row (`model.py:821-827`)
                item_angles = jnp.concatenate(
                    [item_angles, jnp.broadcast_to(item_angles[-1:], (seq_len - n, head_dim // 2))],
                    axis=0,
                )
                angle_rows.append(item_angles)
            gather_idx = jnp.asarray(np.stack(gather_rows))  # (B, L)
            x_mask = jnp.asarray(np.stack(mask_rows))  # (B, L)
            angles = jnp.stack(angle_rows)  # (B, L, d/2)
            tokens = jnp.take_along_axis(tokens, gather_idx[:, :, None], axis=1)
            tokens = jnp.where(
                x_mask[:, :, None].astype(bool), tokens, pad_token.astype(tokens.dtype)[None, None, :]
            )

        if self.seq_shard_axis is not None:
            from jax.sharding import PartitionSpec as _P

            tokens = jax.lax.with_sharding_constraint(
                tokens, _P(None, self.seq_shard_axis, None)
            )

        # -- conditioning -----------------------------------------------------
        cond_dim = min(self.dim, 1024)
        t_emb = TimestepEmbedder(cond_dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="t_embedder")(t)
        cap_emb = CaptionEmbedder(cond_dim, dtype=self.dtype,
                                  param_dtype=self.param_dtype, name="cap_embedder")(
            pooled_caption(cap_feats.astype(self.dtype), cap_mask)
        )
        adaln_input = t_emb + cap_emb

        if proportional_attn and base_seqlen:
            # visual-anagrams alters the entropy-preserving scale to
            # log_base(seqlen)/sqrt(d) (`visual_anagrams/models/nextdit.py:333`)
            scale_fn = (anagram_attn_scale if attn_scale_variant == "anagram"
                        else proportional_attn_scale)
            attn_scale = scale_fn(seq_len, base_seqlen, head_dim)
        else:
            attn_scale = default_attn_scale(head_dim)

        if kv_merge_ratio > 1:
            assert img_sizes is None, "kv_merge_ratio requires the uniform-grid path"
            assert gh % kv_merge_ratio == 0 and gw % kv_merge_ratio == 0

        block_kwargs = dict(
            dim=self.dim, n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            multiple_of=self.multiple_of, ffn_dim_multiplier=self.ffn_dim_multiplier,
            norm_eps=self.norm_eps, qk_norm=self.qk_norm, y_dim=self.cap_feat_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, attn_impl=self.attn_impl,
            kv_pool_grid=(gh, gw) if kv_merge_ratio > 1 else None,
            kv_merge_ratio=kv_merge_ratio,
        )
        cap_feats_c = cap_feats.astype(self.dtype)
        if self.scan_blocks:
            block_cls = _ScannedNextDiTBlock
            block_cls = maybe_remat(block_cls, self.remat, self.remat_policy)
            blocks = nn.scan(
                block_cls,
                # "calibration" carries the static-max probe's sown lse
                # ranges (stacked along the layer axis); inert unless the
                # caller passes mutable=["calibration"]
                variable_axes={"params": 0, "calibration": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=self.n_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )(**block_kwargs, name="layers")
            tokens, _ = blocks(tokens, x_mask, angles, cap_feats_c, cap_mask, adaln_input, attn_scale)
        else:
            for i in range(self.n_layers):
                tokens = NextDiTBlock(**block_kwargs, name=f"layers_{i}")(
                    tokens, x_mask, angles, cap_feats_c, cap_mask, adaln_input, attn_scale
                )

        tokens = FinalLayer(
            self.dim, p, self.out_channels, modulation="scale", dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="final_layer",
        )(tokens, adaln_input)

        # -- unpatchify (scatter back for the list path) ----------------------
        if img_sizes is not None:
            inv_rows = []
            for i, (hi, wi) in enumerate(item_sizes):
                ghi, gwi = hi // p, wi // p
                inv = np.zeros((seq_len,), np.int32)
                valid = (np.arange(ghi)[:, None] * gw + np.arange(gwi)[None, :]).reshape(-1)
                inv[valid] = np.arange(valid.shape[0])
                inv_rows.append(inv)
            inv_idx = jnp.asarray(np.stack(inv_rows))
            grid_valid = jnp.take_along_axis(x_mask, inv_idx, axis=1)  # 1 where grid pos is valid
            tokens = jnp.take_along_axis(tokens, inv_idx[:, :, None], axis=1)
            tokens = tokens * grid_valid[:, :, None].astype(tokens.dtype)

        out = unpatchify(tokens, h, w, p, self.out_channels)
        if self.learn_sigma:
            out = out[:, : self.out_channels // 2]
        return out.astype(jnp.float32)


def forward_with_cfg(
    model: NextDiT,
    variables,
    x,
    t,
    cap_feats,
    cap_mask,
    cfg_scale,
    *,
    scale_factor: float = 1.0,
    scale_watershed: float = 1.0,
    base_seqlen: Optional[int] = None,
    proportional_attn: bool = False,
    attn_scale_variant: str = "proportional",
    kv_merge_ratio: int = 1,
    num_cfg_channels: int = 3,
    mutable=False,
):
    """Duplicated-half-batch CFG forward (`model.py:866-913`).

    Jit-compatible: time-aware RoPE frequencies derive from the traced t[0].
    `mutable` is forwarded to `model.apply` (the static-max calibration probe
    passes `["calibration"]`); when set, returns `(velocity, updates)`.
    """
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = model.apply(
        variables, combined, t, cap_feats, cap_mask,
        rope_timestep=t[0], scale_factor=scale_factor, scale_watershed=scale_watershed,
        proportional_attn=proportional_attn, base_seqlen=base_seqlen,
        attn_scale_variant=attn_scale_variant, kv_merge_ratio=kv_merge_ratio,
        mutable=mutable,
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


# -- configs (`model.py:994-999`) -------------------------------------------


def NextDiT_2B_patch2(**kwargs):
    return NextDiT(patch_size=2, dim=2304, n_layers=24, n_heads=32, **kwargs)


def NextDiT_2B_GQA_patch2(**kwargs):
    return NextDiT(patch_size=2, dim=2304, n_layers=24, n_heads=32, n_kv_heads=8, **kwargs)


def NextDiT_600M_patch2(**kwargs):
    """Small config matching the ImageNet 600M width (`models.py:1042`)."""
    return NextDiT(patch_size=2, dim=1536, n_layers=16, n_heads=32, **kwargs)


def NextDiT_Tiny_patch2(**kwargs):
    """~1M-param debug config (no reference analogue): smoke-testing CLIs,
    soak-harness dry runs, CI paths where a real family member is too slow."""
    return NextDiT(patch_size=2, dim=64, n_layers=2, n_heads=4,
                   multiple_of=16, **kwargs)
