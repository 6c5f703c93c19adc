"""Pallas TPU flash attention (non-causal, masked, GQA, custom scale).

TPU-native replacement for the reference's CUDA `flash_attn_varlen_func`
(`lumina_next_t2i/models/model.py:18-19,378-405`). The reference compacts
variable-length sequences into an unpadded buffer (`_upad_input`,
`model.py:285-335`); TPU programs need static shapes, so instead sequences are
padded to static bucket sizes and invalid keys are masked — the kernel streams
K/V tiles through VMEM and masked tiles simply contribute zero probability.

Kernel structure (one compiled program per shape bucket):
- grid (batch, q_head, q_blocks, kv_blocks), kv innermost ("arbitrary"
  semantics — sequential, carries the online-softmax state);
- online softmax with running max/denominator in float32 VMEM scratch;
- GQA handled in the K/V BlockSpec index maps (q head h reads kv head
  h // rep) — the KV-head repeat at `model.py:423-426` never materializes;
- proportional-attention scale (`model.py:373-376`) is a kernel parameter.

Training uses `jax.custom_vjp`: forward runs the kernel, backward recomputes
through the XLA sdpa path (flash-style fused backward kernel is a later
optimization; the hot benchmark path — inference — runs fully in the kernel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import default_attn_scale, sdpa

_NEG_INF = -2.3819763e38  # most-negative bf16-representable float32


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]  # (bk, D)
    v = v_ref[0, 0]  # (bk, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    s = s * scale
    kmask = mask_ref[0]  # (1, bk) int32
    s = jnp.where(kmask != 0, s, _NEG_INF)

    m_prev = m_ref[:, 0:1]  # (bq, 1)
    l_prev = l_ref[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)  # (bq, 1)
    p = jnp.exp(s - m_next)  # (bq, bk)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_next, l_ref.shape)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, D)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(ki == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)  # fully-masked rows -> 0, not NaN
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "logits_dtype_unused")
)
def _flash_attention_fwd_impl(q, k, v, kv_mask, scale, block_q, block_k, logits_dtype_unused=None):
    """q: (B, Sq, Hq, D); k/v: (B, Sk, Hkv, D); kv_mask: (B, Sk) int32."""
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    rep = hq // hkv

    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    # (B, H, S, D) layout: S and D are the tiled (sublane, lane) dims.
    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    # (B, 1, Sk): the dummy middle dim keeps the Mosaic block shape legal
    # (second-to-last block dim == full array dim).
    mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))[:, None, :]

    grid = (b, hq, sq_p // block_q, sk_p // block_k)

    # Interpret mode lets the same kernel run in CPU tests (the Mosaic
    # compiler only targets TPU).
    interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denominator
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq_p * sk_p * d,
            bytes_accessed=(b * hq * sq_p * d + 2 * b * hkv * sk_p * d + b * hq * sq_p * d)
            * q.dtype.itemsize,
            transcendentals=b * hq * sq_p * sk_p,
        ),
        interpret=interpret,
    )(mask, qt, kt, vt)

    return out[:, :, :sq].transpose(0, 2, 1, 3)


def _pick_blocks(sq: int, sk: int, d: int):
    import os

    # defaults tuned on v5e at 4k tokens (1024/2048 beats 512/1024 by ~4.5%
    # end-to-end); overridable for sweeps
    block_q = int(os.environ.get("LUMINA_FLASH_BQ", 0)) or min(1024, _round_up(sq, 128))
    block_k = int(os.environ.get("LUMINA_FLASH_BK", 0)) or min(2048, _round_up(sk, 128))
    return min(block_q, _round_up(sq, 128)), min(block_k, _round_up(sk, 128))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, kv_mask, scale):
    block_q, block_k = _pick_blocks(q.shape[1], k.shape[1], q.shape[3])
    return _flash_attention_fwd_impl(q, k, v, kv_mask, scale, block_q, block_k)


def _fwd(q, k, v, kv_mask, scale):
    return _flash_attention(q, k, v, kv_mask, scale), (q, k, v, kv_mask)


def _bwd(scale, res, g):
    q, k, v, kv_mask = res
    # Recompute through the XLA path; gradients match the kernel's math.
    _, vjp = jax.vjp(lambda qq, kk, vv: sdpa(qq, kk, vv, kv_mask=kv_mask, scale=scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, kv_mask=None, scale: Optional[float] = None):
    """Flash attention entry point; see module docstring.

    Args:
      q: (B, Sq, Hq, D); k, v: (B, Sk, Hkv, D); kv_mask: optional (B, Sk).
    """
    if scale is None:
        scale = default_attn_scale(q.shape[-1])
    if kv_mask is None:
        kv_mask = jnp.ones((k.shape[0], k.shape[1]), jnp.int32)
    return _flash_attention(q, k, v, kv_mask, float(scale))
