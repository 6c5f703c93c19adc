"""Context (sequence) parallel attention over the device mesh.

The reference reaches 128K-token sequences with single-device mechanisms only
(SURVEY.md §5: varlen flash attention + RoPE scaling; "no ring attention, no
Ulysses"). This module is the TPU-native *extension*: shard the token axis
across chips and let attention run distributed over ICI —

- `allgather_context_attention`: Q stays sequence-sharded; K/V/mask
  all-gather over the axis (cheap with GQA KV heads), then the local flash /
  XLA kernel runs on full keys. One collective, maximal overlap; memory
  O(S) for KV only.
- `ring_context_attention`: K/V blocks rotate around the ring via
  `lax.ppermute` while each device folds its block into a running
  (max, denominator, accumulator) online-softmax state — memory O(S/n),
  bandwidth-optimal; the classic ring attention.

Both are `shard_map` programs over a named mesh axis and match single-device
attention exactly (modulo fp accumulation order).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .attention import default_attn_scale, sdpa

_NEG_BIG = -1e30


def allgather_context_attention(q, k, v, mesh: Mesh, axis: str = "data",
                                kv_mask=None, scale: Optional[float] = None):
    """q/k/v: (B, S, H, D) global arrays (sharded or not — shard_map
    partitions them); returns (B, S, H, D) sequence-sharded the same way."""
    if scale is None:
        scale = default_attn_scale(q.shape[-1])
    if kv_mask is None:
        kv_mask = jnp.ones(k.shape[:2], jnp.int32)

    def local_fn(q_loc, k_loc, v_loc, mask_loc):
        k_all = jax.lax.all_gather(k_loc, axis, axis=1, tiled=True)
        v_all = jax.lax.all_gather(v_loc, axis, axis=1, tiled=True)
        mask_all = jax.lax.all_gather(mask_loc, axis, axis=1, tiled=True)
        return sdpa(q_loc, k_all, v_all, kv_mask=mask_all, scale=scale)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )(q, k, v, kv_mask)


def _block_attention_stats(q, k, v, mask, scale):
    """Unnormalized local attention: returns (m, l, acc) in fp32.

    m: (B, Hkv, rep, Sq) row max; l: (B, Hkv, rep, Sq) row denominator;
    acc: (B, Hkv, rep, Sq, D) unnormalized numerator — the ring combine
    broadcasts over these axes.
    """
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    rep = hq // hkv
    qg = q.reshape(b, sq, hkv, rep, d)
    logits = jnp.einsum("bqhrd,bkhd->bhrqk", qg, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    bias = jnp.where(mask.astype(bool)[:, None, None, None, :], 0.0, _NEG_BIG)
    logits = logits + bias
    m = jnp.max(logits, axis=-1)  # (b, hkv, rep, sq)
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)  # (b, hkv, rep, sq)
    acc = jnp.einsum("bhrqk,bkhd->bhrqd", p, v.astype(jnp.float32))
    return m, l, acc


def ring_context_attention(q, k, v, mesh: Mesh, axis: str = "data",
                           kv_mask=None, scale: Optional[float] = None):
    """Ring attention: O(S/n) memory per device, ppermute KV rotation."""
    if scale is None:
        scale = default_attn_scale(q.shape[-1])
    if kv_mask is None:
        kv_mask = jnp.ones(k.shape[:2], jnp.int32)
    n = mesh.shape[axis]

    def local_fn(q_loc, k_loc, v_loc, mask_loc):
        b, sq, hq, d = q_loc.shape
        hkv = k_loc.shape[2]
        rep = hq // hkv
        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, _):
            k_cur, v_cur, mask_cur, m_run, l_run, acc_run = carry
            # rotate FIRST: the local block is folded before the loop, so a
            # ring of n devices pays exactly n-1 K/V/mask rotations (the old
            # rotate-last form permuted blocks the final iteration discarded)
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            mask_cur = jax.lax.ppermute(mask_cur, axis, perm)
            m_blk, l_blk, acc_blk = _block_attention_stats(
                q_loc, k_cur, v_cur, mask_cur, scale
            )
            m_new = jnp.maximum(m_run, m_blk)
            a1 = jnp.exp(m_run - m_new)
            a2 = jnp.exp(m_blk - m_new)
            l_new = l_run * a1 + l_blk * a2
            acc_new = acc_run * a1[..., None] + acc_blk * a2[..., None]
            return (k_cur, v_cur, mask_cur, m_new, l_new, acc_new), None

        # fold the resident block, then rotate through the other n-1
        m0, l0, acc0 = _block_attention_stats(q_loc, k_loc, v_loc, mask_loc, scale)
        (k_f, v_f, mask_f, m, l, acc), _ = jax.lax.scan(
            step, (k_loc, v_loc, mask_loc, m0, l0, acc0), None, length=n - 1
        )
        out = acc / jnp.maximum(l[..., None], 1e-30)
        out = jnp.moveaxis(out, 3, 1).reshape(b, sq, hq, d)  # (b,hkv,rep,sq,d)->(b,sq,h,d)
        return out.astype(q_loc.dtype)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )(q, k, v, kv_mask)
