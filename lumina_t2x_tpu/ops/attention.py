"""Attention ops: masked scaled-dot-product attention with GQA and custom
softmax scale.

TPU-native replacement for the reference's attention stack
(`lumina_next_t2i/models/model.py:285-438`):

- the reference unpads tokens into a varlen buffer and calls CUDA
  `flash_attn_varlen_func`; on TPU, shapes must be static, so padded buckets
  plus key masks replace unpadding entirely — the flash kernel skips masked
  blocks instead of compacting memory (`SURVEY.md §2.9`);
- proportional attention's custom softmax scale
  (sqrt(log(seqlen, base_seqlen) / head_dim), `model.py:373-376`) is passed
  straight through as `scale`;
- GQA (n_kv_heads < n_heads, `model.py:158-162`) is handled by grouped
  einsums — no materialized KV-head repeat.

`attention()` dispatches between the XLA path (reference implementation,
differentiable, runs everywhere) and the Pallas flash kernel
(`ops/flash_attention.py`) for the TPU hot path.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e9  # large-negative instead of -inf: keeps fully-masked rows finite


def proportional_attn_scale(seqlen: int, base_seqlen: int, head_dim: int) -> float:
    """Entropy-preserving softmax scale for resolution extrapolation
    (`model.py:373-376`)."""
    return math.sqrt(math.log(seqlen, base_seqlen) / head_dim)


def default_attn_scale(head_dim: int) -> float:
    return math.sqrt(1.0 / head_dim)


def anagram_attn_scale(seqlen: int, base_seqlen: int, head_dim: int) -> float:
    """Visual-anagrams' altered proportional scale
    log_base(seqlen) / sqrt(head_dim) (`visual_anagrams/models/nextdit.py:333`)."""
    return math.log(seqlen, base_seqlen) / math.sqrt(head_dim)


def pool_kv_2d(k, v, grid_h: int, grid_w: int, merge_ratio: int):
    """Average-pool K/V over the 2-D token grid — the visual-anagrams
    `kv_merge` long-sequence trick (`visual_anagrams/models/nextdit.py:342-358`):
    keys/values of an (H, W) grid are AvgPool2d'ed with kernel=stride=
    merge_ratio, shrinking the KV length by merge_ratio^2 while queries stay
    full length.

    k, v: (B, S, Hkv, D) with S == grid_h * grid_w. Returns pooled (k, v)
    of length (grid_h // r) * (grid_w // r).
    """
    if merge_ratio <= 1:
        return k, v

    def pool(x):
        b, s, hh, d = x.shape
        x = x.reshape(b, grid_h, grid_w, hh, d)
        gh, gw = grid_h // merge_ratio, grid_w // merge_ratio
        x = x[:, : gh * merge_ratio, : gw * merge_ratio]
        x = x.reshape(b, gh, merge_ratio, gw, merge_ratio, hh, d).mean(axis=(2, 4))
        return x.reshape(b, gh * gw, hh, d)

    return pool(k), pool(v)


def sdpa(
    q,
    k,
    v,
    kv_mask=None,
    scale: Optional[float] = None,
    logits_dtype=jnp.float32,
):
    """Masked scaled-dot-product attention (non-causal), XLA path.

    Args:
      q: (B, Sq, Hq, D)
      k, v: (B, Sk, Hkv, D) — Hkv may divide Hq (GQA).
      kv_mask: optional (B, Sk) with 1/True on valid keys; masked keys get
        -inf logits (equivalent to the reference's varlen unpadding).
      scale: softmax scale; default 1/sqrt(D).
    Returns:
      (B, Sq, Hq, D) in q.dtype.
    """
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    assert hq % hkv == 0, f"query heads {hq} must be a multiple of kv heads {hkv}"
    rep = hq // hkv
    if scale is None:
        scale = default_attn_scale(d)

    qg = q.reshape(b, sq, hkv, rep, d)
    # logits: (B, Hkv, rep, Sq, Sk)
    logits = jnp.einsum("bqhrd,bkhd->bhrqk", qg, k, preferred_element_type=logits_dtype)
    logits = logits * jnp.asarray(scale, logits_dtype)
    if kv_mask is not None:
        bias = jnp.where(kv_mask.astype(bool)[:, None, None, None, :], 0.0, _NEG_INF)
        logits = logits + bias.astype(logits_dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhrqk,bkhd->bqhrd", probs.astype(v.dtype), v)
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def resolve_impl(impl: str) -> str:
    """'auto' -> flash on TPU backends, xla elsewhere. The check is an
    allowlist: the Pallas kernel lowers through Mosaic-TPU, so a GPU (or any
    other) backend must take the sdpa path rather than fail at compile."""
    if impl == "auto":
        return "flash" if jax.default_backend().startswith("tpu") or \
            jax.default_backend() == "axon" else "xla"
    return impl


def attention(
    q,
    k,
    v,
    kv_mask=None,
    scale: Optional[float] = None,
    impl: str = "auto",
):
    """Dispatch between the XLA sdpa path and the Pallas flash kernel.

    impl: "xla" | "flash" | "auto". "auto" uses flash on TPU backends for
    self-attention-sized problems and falls back to XLA elsewhere (mirrors the
    reference's use_flash_attn flag + SDPA fallback,
    `lumina_next_t2i_mini/models/nextdit.py:328-372`).
    """
    impl = resolve_impl(impl)
    if impl == "flash":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, kv_mask=kv_mask, scale=scale)
    return sdpa(q, k, v, kv_mask=kv_mask, scale=scale)
