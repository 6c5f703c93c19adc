"""Mixture-of-Experts NextDiT (class-conditional, the Next-DiT-MoE family).

TPU-native re-design of `Next-DiT-MoE/models/{models,models1,models2}.py`:

- **TimeMoE** (`models.py:451-478`): gate logits come from the conditioning
  vector (timestep embedding) and broadcast to every token of the item, so
  expert choice is *per item*. The reference loops over experts in python
  with boolean gathers (`models.py:464-477`); here the per-item structure is
  exploited directly — expert weight matrices are gathered per (item, slot)
  and applied as batched einsums. Exactly lossless (no capacity), compute =
  top_k x dense FFN.
- **SpaceMoE** (`models1.py`, `models2.py:480-506`): per-token gating. The
  serial loop becomes static-capacity one-hot dispatch/combine einsums (the
  GSPMD MoE idiom) with softmax-renormalized top-k weights; capacity_factor
  controls the lossless-ness / padding trade-off.
- **Both** (`models2.py:692-819`): block carries feed_forward_time AND
  feed_forward_space with separate sandwich norms and a 6-chunk adaLN.

Top-k weights are softmaxed over the selected logits only
(`models.py:465-470`), matching the reference.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import default_attn_scale
from ..ops.rope import rope_angles_2d
from .layers import (
    ffn_hidden_size,
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


def _ffn_hidden(dim: int, multiple_of: int, ffn_dim_multiplier: Optional[float]) -> int:
    # the dense FeedForward's formula, shared so expert shapes can never
    # silently diverge from the importable checkpoint shapes
    return ffn_hidden_size(4 * dim, multiple_of, ffn_dim_multiplier)


class TimeMoEFFN(nn.Module):
    """Per-item top-k expert SwiGLU (`models.py:451-478`)."""

    dim: int
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    num_experts: int = 8
    num_experts_per_tok: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        """x: (B, S, d); cond: (B, C) — the timestep embedding (the gate
        Dense infers C; there is deliberately no width field to get stale).
        """
        e, k = self.num_experts, self.num_experts_per_tok
        hidden = _ffn_hidden(self.dim, self.multiple_of, self.ffn_dim_multiplier)
        init = nn.initializers.xavier_uniform()
        w1 = self.param("w1", init, (e, self.dim, hidden), self.param_dtype)
        w3 = self.param("w3", init, (e, self.dim, hidden), self.param_dtype)
        w2 = self.param("w2", init, (e, hidden, self.dim), self.param_dtype)
        gate_logits = nn.Dense(e, use_bias=False, dtype=jnp.float32, name="gate")(
            cond.astype(jnp.float32)
        )  # (B, E)
        top_w, top_i = jax.lax.top_k(gate_logits, k)  # (B, k)
        weights = jax.nn.softmax(top_w, axis=-1).astype(x.dtype)  # (B, k)

        out = jnp.zeros_like(x)
        for slot in range(k):
            sel = top_i[:, slot]  # (B,)
            w1s = jnp.take(w1, sel, axis=0).astype(self.dtype)  # (B, d, h)
            w3s = jnp.take(w3, sel, axis=0).astype(self.dtype)
            w2s = jnp.take(w2, sel, axis=0).astype(self.dtype)
            h1 = jnp.einsum("bsd,bdh->bsh", x, w1s)
            h3 = jnp.einsum("bsd,bdh->bsh", x, w3s)
            y = jnp.einsum("bsh,bhd->bsd", nn.silu(h1) * h3, w2s)
            out = out + weights[:, slot, None, None] * y
        return out


class SpaceMoEFFN(nn.Module):
    """Per-token top-k expert SwiGLU with static-capacity dispatch
    (`models2.py:480-506`).

    With `ep_axis` set, the stacked expert weights and the (E, C, d) expert
    compute shard over that mesh axis — true expert parallelism: GSPMD turns
    the dispatch/combine einsums into the all-to-all exchanges over ICI that
    the reference's serial per-rank expert loop never had (SURVEY.md §2.1:
    "no expert-parallel dispatch").
    """

    dim: int
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    num_experts: int = 4
    num_experts_per_tok: int = 2
    capacity_factor: float = 2.0
    ep_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        e, k = self.num_experts, self.num_experts_per_tok
        t = b * s
        capacity = int(math.ceil(t * k / e * self.capacity_factor))
        hidden = _ffn_hidden(self.dim, self.multiple_of, self.ffn_dim_multiplier)
        init = nn.initializers.xavier_uniform()
        w1 = self.param("w1", init, (e, self.dim, hidden), self.param_dtype).astype(self.dtype)
        w3 = self.param("w3", init, (e, self.dim, hidden), self.param_dtype).astype(self.dtype)
        w2 = self.param("w2", init, (e, hidden, self.dim), self.param_dtype).astype(self.dtype)

        xt = x.reshape(t, d)
        gate_logits = nn.Dense(e, use_bias=False, dtype=jnp.float32, name="gate")(
            xt.astype(jnp.float32)
        )  # (T, E)
        top_w, top_i = jax.lax.top_k(gate_logits, k)
        weights = jax.nn.softmax(top_w, axis=-1)  # (T, k) fp32

        sel = jax.nn.one_hot(top_i, e, dtype=jnp.float32)  # (T, k, E)
        combine_w = jnp.einsum("tk,tke->te", weights, sel)  # (T, E)
        mask = sel.sum(axis=1)  # (T, E) 0/1
        pos = jnp.cumsum(mask, axis=0) - 1.0  # (T, E) position in expert queue
        keep = mask * (pos < capacity)  # overflow tokens dropped
        pos = jnp.clip(pos, 0, capacity - 1).astype(jnp.int32)
        dispatch = keep[..., None] * jax.nn.one_hot(pos, capacity, dtype=jnp.float32)  # (T,E,C)

        expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), xt)  # (E, C, d)
        if self.ep_axis is not None:
            from jax.sharding import PartitionSpec as _P

            expert_in = jax.lax.with_sharding_constraint(expert_in, _P(self.ep_axis))
            w1 = jax.lax.with_sharding_constraint(w1, _P(self.ep_axis))
            w3 = jax.lax.with_sharding_constraint(w3, _P(self.ep_axis))
            w2 = jax.lax.with_sharding_constraint(w2, _P(self.ep_axis))
        h1 = jnp.einsum("ecd,edh->ech", expert_in, w1)
        h3 = jnp.einsum("ecd,edh->ech", expert_in, w3)
        expert_out = jnp.einsum("ech,ehd->ecd", nn.silu(h1) * h3, w2)  # (E, C, d)
        if self.ep_axis is not None:
            from jax.sharding import PartitionSpec as _P

            expert_out = jax.lax.with_sharding_constraint(expert_out, _P(self.ep_axis))
        out = jnp.einsum("tec,ecd->td", (dispatch * combine_w[..., None]).astype(x.dtype), expert_out)
        return out.reshape(b, s, d)


class NextDiTMoEBlock(nn.Module):
    """Sandwich-norm-2 block with a MoE FFN.

    moe_mode: "time" -> 4-chunk adaLN + TimeMoE FFN (`models.py:662-771`);
    "space" -> 4-chunk + SpaceMoE (`models1.py`); "both" -> 6-chunk adaLN,
    TimeMoE then SpaceMoE with separate norms (`models2.py:692-819`);
    "dense" -> plain FeedForward.
    """

    dim: int
    n_heads: int
    n_kv_heads: Optional[int]
    multiple_of: int
    ffn_dim_multiplier: Optional[float]
    norm_eps: float
    qk_norm: bool
    moe_mode: str = "time"
    num_experts: int = 8
    num_experts_per_tok: int = 2
    capacity_factor: float = 2.0
    ep_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, angles, adaln_input, time_input):
        n_chunks = 6 if self.moe_mode == "both" else 4
        mod = nn.Dense(n_chunks * self.dim, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="adaLN_modulation")(nn.silu(adaln_input))
        chunks = jnp.split(mod, n_chunks, axis=-1)

        scale_msa, gate_msa = chunks[0], chunks[1]
        attn_out = Attention(
            dim=self.dim, n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            qk_norm=self.qk_norm, y_dim=0, dtype=self.dtype,
            param_dtype=self.param_dtype, attn_impl=self.attn_impl,
            name="attention",
        )(
            modulate(RMSNorm(eps=self.norm_eps, use_scale=False, name="attention_norm1")(x), scale_msa),
            None, angles, None, None, default_attn_scale(self.dim // self.n_heads),
        )
        x = x + jnp.tanh(gate_msa)[:, None, :].astype(x.dtype) * RMSNorm(
            eps=self.norm_eps, name="attention_norm"
        )(attn_out)

        moe_kwargs = dict(
            dim=self.dim, multiple_of=self.multiple_of,
            ffn_dim_multiplier=self.ffn_dim_multiplier,
            num_experts=self.num_experts, num_experts_per_tok=self.num_experts_per_tok,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

        if self.moe_mode == "both":
            scale_t, gate_t, scale_s, gate_s = chunks[2], chunks[3], chunks[4], chunks[5]
            t_out = TimeMoEFFN(**moe_kwargs, name="feed_forward_time")(
                modulate(RMSNorm(eps=self.norm_eps, use_scale=False, name="ffn_norm_time1")(x), scale_t), time_input
            )
            x = x + jnp.tanh(gate_t)[:, None, :].astype(x.dtype) * RMSNorm(
                eps=self.norm_eps, name="ffn_norm_time"
            )(t_out)
            s_out = SpaceMoEFFN(**moe_kwargs, capacity_factor=self.capacity_factor,
                                ep_axis=self.ep_axis, name="feed_forward_space")(
                modulate(RMSNorm(eps=self.norm_eps, use_scale=False, name="ffn_norm_space1")(x), scale_s)
            )
            x = x + jnp.tanh(gate_s)[:, None, :].astype(x.dtype) * RMSNorm(
                eps=self.norm_eps, name="ffn_norm_space"
            )(s_out)
            return x

        scale_mlp, gate_mlp = chunks[2], chunks[3]
        h = modulate(RMSNorm(eps=self.norm_eps, use_scale=False, name="ffn_norm1")(x), scale_mlp)
        if self.moe_mode == "time":
            ffn_out = TimeMoEFFN(**moe_kwargs, name="feed_forward")(h, time_input)
        elif self.moe_mode == "space":
            ffn_out = SpaceMoEFFN(**moe_kwargs, capacity_factor=self.capacity_factor,
                                  ep_axis=self.ep_axis, name="feed_forward")(h)
        else:
            ffn_out = FeedForward(
                dim=self.dim, hidden_dim=4 * self.dim, multiple_of=self.multiple_of,
                ffn_dim_multiplier=self.ffn_dim_multiplier, dtype=self.dtype,
                param_dtype=self.param_dtype, name="feed_forward",
            )(h)
        x = x + jnp.tanh(gate_mlp)[:, None, :].astype(x.dtype) * RMSNorm(
            eps=self.norm_eps, name="ffn_norm"
        )(ffn_out)
        return x


class _ScannedMoEBlock(NextDiTMoEBlock):
    @nn.compact
    def __call__(self, x, angles, adaln_input, time_input):
        return NextDiTMoEBlock.__call__(self, x, angles, adaln_input, time_input), None


class NextDiTMoE(nn.Module):
    """Class-conditional NextDiT with MoE FFNs (`models.py:806-1013`)."""

    patch_size: int = 2
    in_channels: int = 4
    dim: int = 1536
    n_layers: int = 16
    n_heads: int = 32
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    qk_norm: bool = False
    moe_mode: str = "time"
    num_experts: int = 8
    num_experts_per_tok: int = 2
    capacity_factor: float = 2.0
    ep_axis: Optional[str] = None
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
    def __call__(self, x, t, y, *, rope_scaling_factor: float = 1.0, ntk_factor: float = 1.0,
                 train: bool = False, force_drop_ids=None):
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
        # TimeMoE gates see the raw timestep embedding (`models.py:895-903`)
        time_input = t_emb

        block_kwargs = dict(
            dim=self.dim, n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            multiple_of=self.multiple_of, ffn_dim_multiplier=self.ffn_dim_multiplier,
            norm_eps=self.norm_eps, qk_norm=self.qk_norm, moe_mode=self.moe_mode,
            num_experts=self.num_experts, num_experts_per_tok=self.num_experts_per_tok,
            capacity_factor=self.capacity_factor, ep_axis=self.ep_axis,
            dtype=self.dtype, param_dtype=self.param_dtype, attn_impl=self.attn_impl,
        )
        if self.scan_blocks:
            block_cls = _ScannedMoEBlock
            block_cls = maybe_remat(block_cls, self.remat, self.remat_policy)
            blocks = nn.scan(
                block_cls, variable_axes={"params": 0}, split_rngs={"params": True},
                in_axes=nn.broadcast, length=self.n_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )(**block_kwargs, name="layers")
            tokens, _ = blocks(tokens, angles, adaln_input, time_input)
        else:
            for i in range(self.n_layers):
                tokens = NextDiTMoEBlock(**block_kwargs, name=f"layers_{i}")(
                    tokens, angles, adaln_input, time_input
                )

        tokens = FinalLayer(
            self.dim, p, self.out_channels, modulation="shift_scale", dtype=self.dtype,
            param_dtype=self.param_dtype, name="final_layer",
        )(tokens, adaln_input)

        out = unpatchify(tokens, h, w, p, self.out_channels)
        if self.learn_sigma:
            out = out[:, : self.out_channels // 2]
        return out.astype(jnp.float32)


# -- configs (`models.py:1015-1044`, `models1.py:1015`, `models2.py:695`) ----


def NextDiT_MoE_600M_patch2_Time(**kwargs):
    return NextDiTMoE(dim=1536, n_layers=16, n_heads=32, moe_mode="time",
                      num_experts=8, num_experts_per_tok=2, **kwargs)


def NextDiT_MoE_600M_patch2_Spatial(**kwargs):
    return NextDiTMoE(dim=1536, n_layers=16, n_heads=32, moe_mode="space",
                      num_experts=8, num_experts_per_tok=2, **kwargs)


def NextDiT_MoE_600M_patch2_Both(**kwargs):
    return NextDiTMoE(dim=1536, n_layers=16, n_heads=32, moe_mode="both",
                      num_experts=4, num_experts_per_tok=2, **kwargs)
