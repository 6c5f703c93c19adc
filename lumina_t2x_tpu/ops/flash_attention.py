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
- online softmax with a running max in float32 VMEM scratch; the softmax
  denominator is folded into the PV matmul as an all-ones column of V
  (`_flash_kernel_fused_sum`) so the VPU row-sum pass disappears — at <= 2
  batch rows only, where XLA aliases the ones-concat for free; at >= 3 rows
  the kernels compute the denominator as an in-kernel VPU row-sum instead
  (`_denom_fused_ones`), because the materialized concat costs ~75 MB of
  HBM per layer at 2B/4k (the former B>1 per-sample regression);
- Sk <= 1024 dispatches to a single-pass whole-KV kernel with no online
  state (`_flash_small_kv_kernel`) — caption cross-attention and the
  1-D audio models live here;
- `set_flash_static_max(bound)` / `set_flash_static_max_train(bound)`
  (first-class per-model calibration, installed by
  `pipelines/sample_lib.autocalibrate_flash_static_max` and
  `pipelines/train_lib.autocalibrate_flash_static_max_train` respectively;
  read at trace time and part of the cache key) replace the running max with
  a fixed bound (`_flash_kernel_static_max`) for bounded-logit (qk-norm)
  models. The slots are separate so a sampling-era bound never leaks into
  training; the `LUMINA_FLASH_STATIC_MAX=<bound>` /
  `LUMINA_FLASH_STATIC_MAX_TRAIN=<bound>` env vars remain as per-path
  operator overrides;
- GQA handled in the K/V BlockSpec index maps (q head h reads kv head
  h // rep) — the KV-head repeat at `model.py:423-426` never materializes;
- proportional-attention scale (`model.py:373-376`) is a kernel parameter.

Training uses `jax.custom_vjp` with fully fused Pallas backward kernels
(flash-attention-2 style): the residual-saving forward additionally emits the
log-sum-exp rows; backward recomputes probabilities from LSE with
`delta = rowsum(dO * O)` precomputed by XLA. Default is a SINGLE-SWEEP kernel
(`_bwd_fused_kernel`): dK/dV accumulate over the inner q loop while each
(kv, q) tile also writes its dQ contribution to per-kv-block partials that
XLA sums afterwards — one recompute of s/exp/dp instead of two (~5% e2e on
a 600M train step). Falls back to separate dQ and dK/dV kernels when the
fp32 partials array would exceed ~1 GiB (LUMINA_FLASH_FUSED_BWD=0/1
overrides). GQA gradients are summed over the query-head group in the
wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import default_attn_scale, sdpa
from .rope import rot_tables as _rot_tables

_NEG_INF = -2.3819763e38  # most-negative bf16-representable float32


def _flash_kernel_static_max(mask_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, *,
                             scale, d: int, static_max: float,
                             fused_ones: bool = True):
    """Fused-sum forward with a FIXED softmax max bound instead of the online
    running max — removes the only remaining full VPU reduction pass over the
    logits (~1 ms/layer at 2B 4k-token shapes). Opt-in via
    LUMINA_FLASH_STATIC_MAX=<bound>: only numerically safe when the caller
    can bound the scaled logits (|s| <= bound; exponents clamp at +55, see
    below) —
    e.g. qk-norm models (`model.py:211-220`) with known norm gains. Masked
    keys still contribute exactly zero (exp(NEG_INF - M) == 0)."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
    # Clamp the exponent so a misconfigured bound (actual logits above
    # static_max) degrades accuracy instead of silently flooding the
    # accumulator with inf/NaN. 55 (not the f32 headroom ~88): the fp32
    # accumulator sums up to Sk clamped terms, and exp(55) * 131072 keys
    # ~= 1e29 still clears fp32's 3.4e38 by nine orders of magnitude,
    # whereas exp(80) would overflow past ~6e3 saturated keys.
    p = jnp.exp(jnp.minimum(s - static_max, 55.0))
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if not fused_ones:  # rows >= 3: denominator via VPU row-sum (see _fused_sum_step)
        pv = jnp.concatenate([pv, jnp.sum(p, axis=-1, keepdims=True)], axis=-1)
    acc_ref[:] = acc_ref[:] + pv

    @pl.when(ki == nk - 1)
    def _finalize():
        denom = jnp.maximum(acc_ref[:, d:d + 1], 1e-30)
        o_ref[0, 0] = (acc_ref[:, :d] / denom).astype(o_ref.dtype)


# First-class install points for the static-max softmax bound. TWO separate
# slots (ADVICE r4): the inference slot is installed by
# `pipelines/sample_lib.autocalibrate_flash_static_max` (margin 6, EMA
# weights) and read ONLY by the primal no-grad dispatch; the train slot is
# installed by `pipelines/train_lib.autocalibrate_flash_static_max_train`
# (margin 8, re-probed at each process start because weights drift) and read
# ONLY by the custom_vjp forward (`_fwd`, which also covers the remat
# backward-recompute). A sampling-calibrated bound or an inference env pin
# therefore can never silently apply to a training step in the same process.
# The LUMINA_FLASH_STATIC_MAX / LUMINA_FLASH_STATIC_MAX_TRAIN env vars remain
# ONLY as per-path operator override pins; pipelines communicate calibrated
# bounds through this module state.
_flash_static_max: Optional[float] = None
_flash_static_max_train: Optional[float] = None


def set_flash_static_max(bound: Optional[float]) -> None:
    """Install (or clear, with None) the fixed softmax bound used by the
    streaming flash kernel on the INFERENCE (primal, no-grad) path. Read at
    trace time — callers must set it before the first trace of the program
    that should use it."""
    global _flash_static_max
    _flash_static_max = float(bound) if bound is not None else None


def set_flash_static_max_train(bound: Optional[float]) -> None:
    """Install (or clear) the fixed softmax bound for the TRAINING path
    (custom_vjp forward + backward-recompute). Kept separate from the
    inference slot so a sampling-side calibration in the same process never
    leaks into training, where weights drift past a sampling-era bound."""
    global _flash_static_max_train
    _flash_static_max_train = float(bound) if bound is not None else None


def get_flash_static_max(train: bool = False) -> Optional[float]:
    """The bound the next trace will use (env pin wins over the setting)."""
    return _static_max_bound(train=train)


def _static_max_bound(train: bool = False) -> Optional[float]:
    import os

    if train:
        v = os.environ.get("LUMINA_FLASH_STATIC_MAX_TRAIN", "")
        return float(v) if v else _flash_static_max_train
    v = os.environ.get("LUMINA_FLASH_STATIC_MAX", "")
    return float(v) if v else _flash_static_max


def streams_kv(sk: int) -> bool:
    """True when a call with Sk keys dispatches to the streaming
    online-softmax kernel — the only kernel `LUMINA_FLASH_STATIC_MAX`
    affects (the small-KV single-pass kernel computes its row max for free,
    and cross-attention lives there)."""
    return sk > _SMALL_KV_MAX


def flash_lse_range(q, k, v, kv_mask=None, scale=None):
    """(max, min) over valid query rows of the attention log-sum-exp, as a
    stacked (2,) f32 array. Calibration probe for the static-max kernel:
    `lse >= rowmax(scaled logits)` always, and `lse <= rowmax + log(Sk)`, so
    `max(lse)` is a tight safe upper bound for `static_max` and
    `max(lse) - min(lse)` bounds the row-max spread that decides whether a
    single global bound can serve every row without f32 exp underflow."""
    b, sq, hq, d = q.shape
    if scale is None:
        scale = default_attn_scale(d)
    if kv_mask is None:
        kv_mask = jnp.ones((b, k.shape[1]), jnp.int32)
    block_q, block_k = _pick_blocks(sq, k.shape[1], d)
    _, lse = _flash_fwd_res_impl(q, k, v, kv_mask, scale, block_q, block_k)
    rows = lse[:, :, :sq, 0]
    return jnp.stack([jnp.max(rows), jnp.min(rows)])


def _fused_sum_step(mask_ref, q_ref, k_ref, v_ref, m_ref, acc_ref, *, scale,
                    fused_ones: bool = True):
    """One online-softmax step accumulating output AND denominator in
    `acc_ref` ((block_q, d+1); col d is `sum_k p`). Two denominator modes:

    - `fused_ones=True` (rows <= 2): V carries an extra all-ones column, so
      the denominator rides the PV matmul on the MXU and the separate VPU
      row-sum pass disappears (measured ~0.5 ms/layer at 2B 4k-token
      shapes). Numerator and denominator share the same bf16-rounded `p`.
    - `fused_ones=False` (rows >= 3): V keeps its natural d columns and the
      denominator is a VPU row-sum of the f32 `p`. Why: at >= 3 batch rows
      XLA stops aliasing the wrapper's ones-column concatenate as a free
      ConcatBitcast and materializes a bf16 (B, H, Sk, d+1) copy (~75 MB of
      HBM write+read PER LAYER at 2B/4k/B4 — the B>1 per-sample regression
      mechanism, `exps/artifacts/b1b2_hlo/`); the in-kernel row-sum costs
      one extra VPU pass over logits already resident in registers, far
      below the copy.

    Shared by the inference (`_flash_kernel_fused_sum`) and residual
    (`_flash_kernel_res`) kernels; the variants differ only in their
    finalize blocks."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
    m_prev = m_ref[:, 0:1]
    m_next = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if not fused_ones:
        pv = jnp.concatenate([pv, jnp.sum(p, axis=-1, keepdims=True)], axis=-1)
    acc_ref[:] = acc_ref[:] * alpha + pv


def _flash_kernel_fused_sum(mask_ref, q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *,
                            scale, d: int, fused_ones: bool = True):
    """Inference forward: fused-sum online softmax (see _fused_sum_step)."""
    _fused_sum_step(mask_ref, q_ref, k_ref, v_ref, m_ref, acc_ref, scale=scale,
                    fused_ones=fused_ones)

    @pl.when(pl.program_id(3) == pl.num_programs(3) - 1)
    def _finalize():
        denom = jnp.maximum(acc_ref[:, d:d + 1], 1e-30)
        o_ref[0, 0] = (acc_ref[:, :d] / denom).astype(o_ref.dtype)


def _flash_small_kv_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    """Single-pass kernel for small KV (Sk <= _SMALL_KV_MAX == 1024: caption
    cross-attention, `model.py:420-434`, and the FlagDiT-1D audio/music
    self-attention): the whole K/V fits one block, so the online
    max/denominator scratch — whose per-grid-step init/finalize traffic
    dominates at tiny KV (measured 1.9 ms vs ~0.4 ms per layer at 2B
    shapes) — is dropped entirely."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0, 0] = (pv / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


# whole-KV-in-one-block threshold for the single-pass kernel. 1024 keys =
# 4 MB of f32 logits per 1024-row q block in VMEM; covers caption
# cross-attention (<=256) and the audio/music FlagDiT-1D self-attention
# (max_len=1000, `flag_large_dit.py:485-659`).
_SMALL_KV_MAX = 1024


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _flash_small_kv_impl(q, k, v, kv_mask, scale, block_q):
    """q: (B, Sq, Hq, D); k/v: (B, Sk, Hkv, D) with Sk <= _SMALL_KV_MAX."""
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    rep = hq // hkv
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, 128)

    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))[:, None, :]

    grid = (b, hq, sq_p // block_q)
    interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        functools.partial(_flash_small_kv_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, sk_p), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_p, d), lambda bi, hi, qi: (bi, hi // rep, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_p, d), lambda bi, hi, qi: (bi, hi // rep, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq_p * sk_p * d,
            bytes_accessed=(2 * b * hq * sq_p * d + 2 * b * hkv * sk_p * d) * q.dtype.itemsize,
            transcendentals=b * hq * sq_p * sk_p,
        ),
        interpret=interpret,
    )(mask, qt, kt, vt)

    return out[:, :, :sq].transpose(0, 2, 1, 3)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _denom_fused_ones(b: int) -> bool:
    """Denominator mode for the streaming forward kernels. Default: the
    ones-column MXU trick at <= 2 batch rows (where XLA aliases the concat
    for free) and the in-kernel VPU row-sum at >= 3 rows (where the concat
    materializes a ~75 MB/layer HBM copy at 2B/4k — the B>1 per-sample
    regression, `exps/artifacts/b1b2_hlo/`). LUMINA_FLASH_DENOM=ones|rowsum
    pins either mode for sweeps."""
    import os

    mode = os.environ.get("LUMINA_FLASH_DENOM", "auto")
    if mode == "ones":
        return True
    if mode == "rowsum":
        return False
    return b <= 2


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_k", "static_max",
                                    "fused_ones"))
def _flash_attention_fwd_impl(q, k, v, kv_mask, scale, block_q, block_k,
                              static_max=None, fused_ones=None):
    """q: (B, Sq, Hq, D); k/v: (B, Sk, Hkv, D); kv_mask: (B, Sk) int32.

    `static_max` selects the fixed-bound kernel; like block_q/block_k it is
    read from the environment OUTSIDE this jit boundary (in _flash_attention)
    so it participates in the jit cache key. Note _flash_attention itself is
    normally traced inside the caller's outer jit, so the env is only
    re-read when THAT jit retraces — an already-compiled sampler/train step
    does not see a mid-process env change. `fused_ones` (static, part of the
    cache key) pins the denominator mode; None derives it from the batch
    rows + env (`_denom_fused_ones` — an env flip at the SAME rows count
    needs the explicit arg or a fresh process to escape the jit cache)."""
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    rep = hq // hkv
    if fused_ones is None:
        fused_ones = _denom_fused_ones(b)

    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    # (B, H, S, D) layout: S and D are the tiled (sublane, lane) dims.
    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    # (B, 1, Sk): the dummy middle dim keeps the Mosaic block shape legal
    # (second-to-last block dim == full array dim).
    mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))[:, None, :]
    if fused_ones:
        # ones column for the fused denominator (see _fused_sum_step); at
        # b <= 2 XLA aliases this concat into the transpose/pad copy above.
        vt = jnp.concatenate([vt, jnp.ones((b, hkv, sk_p, 1), vt.dtype)], axis=-1)
    vd = d + 1 if fused_ones else d

    grid = (b, hq, sq_p // block_q, sk_p // block_k)

    # Interpret mode lets the same kernel run in CPU tests (the Mosaic
    # compiler only targets TPU).
    interpret = jax.default_backend() == "cpu"

    if static_max is not None:
        kernel = functools.partial(_flash_kernel_static_max, scale=scale, d=d,
                                   static_max=static_max, fused_ones=fused_ones)
        scratch = [pltpu.VMEM((block_q, d + 1), jnp.float32)]  # acc + denom col
    else:
        kernel = functools.partial(_flash_kernel_fused_sum, scale=scale, d=d,
                                   fused_ones=fused_ones)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, d + 1), jnp.float32),  # output accumulator + denom col
        ]

    out = pl.pallas_call(
        kernel,
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
                (1, 1, block_k, vd),
                lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        scratch_shapes=scratch,
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


def _flash_kernel_res(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref,
                      acc_ref, *, scale, d, fused_ones: bool = True):
    """Forward + log-sum-exp residual (lane-replicated to width 128). The
    denominator rides the fused ones-column of V or an in-kernel row-sum
    (see _fused_sum_step) and doubles as the LSE source at finalize."""
    _fused_sum_step(mask_ref, q_ref, k_ref, v_ref, m_ref, acc_ref, scale=scale,
                    fused_ones=fused_ones)

    @pl.when(pl.program_id(3) == pl.num_programs(3) - 1)
    def _finalize():
        l = jnp.maximum(acc_ref[:, d:d + 1], 1e-30)
        o_ref[0, 0] = (acc_ref[:, :d] / l).astype(o_ref.dtype)
        lse = m_ref[:, 0:1] + jnp.log(l)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_kernel_res_static_max(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                                 acc_ref, *, scale, d, static_max: float,
                                 fused_ones: bool = True):
    """Forward + LSE residual with the FIXED softmax bound (training-side
    counterpart of `_flash_kernel_static_max`): drops the online running-max
    scratch and its per-block rescale. The LSE stays EXACT within the
    calibrated window — `lse = bound + log(sum_j exp(s_j - bound))` is the
    same number the online kernel produces as long as the exp clamp never
    fires (calibration margin guarantees that) — so the backward kernels,
    which reconstruct p = exp(s - lse), are untouched."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
    p = jnp.exp(jnp.minimum(s - static_max, 55.0))  # clamp: see static_max kernel
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if not fused_ones:  # rows >= 3: denominator via VPU row-sum (see _fused_sum_step)
        pv = jnp.concatenate([pv, jnp.sum(p, axis=-1, keepdims=True)], axis=-1)
    acc_ref[:] = acc_ref[:] + pv

    @pl.when(ki == pl.num_programs(3) - 1)
    def _finalize():
        l = jnp.maximum(acc_ref[:, d:d + 1], 1e-30)
        o_ref[0, 0] = (acc_ref[:, :d] / l).astype(o_ref.dtype)
        lse = static_max + jnp.log(l)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "static_max", "fused_ones"))
def _flash_fwd_res_impl(q, k, v, kv_mask, scale, block_q, block_k,
                        static_max=None, fused_ones=None):
    """Forward returning (out, lse) for the backward pass."""
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    rep = hq // hkv
    if fused_ones is None:
        fused_ones = _denom_fused_ones(b)
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))[:, None, :]
    if fused_ones:
        # ones column for the fused denominator/LSE (see _flash_kernel_res)
        vt = jnp.concatenate([vt, jnp.ones((b, hkv, sk_p, 1), vt.dtype)], axis=-1)
    vd = d + 1 if fused_ones else d

    grid = (b, hq, sq_p // block_q, sk_p // block_k)
    interpret = jax.default_backend() == "cpu"

    if static_max is not None:
        kernel = functools.partial(_flash_kernel_res_static_max, scale=scale,
                                   d=d, static_max=static_max,
                                   fused_ones=fused_ones)
        scratch = [pltpu.VMEM((block_q, d + 1), jnp.float32)]  # acc + denom col
    else:
        kernel = functools.partial(_flash_kernel_res, scale=scale, d=d,
                                   fused_ones=fused_ones)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d + 1), jnp.float32),
        ]

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, vd), lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, sq_p, 128), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(mask, qt, kt, vt)
    return out[:, :, :sq].transpose(0, 2, 1, 3), lse


def _bwd_dq_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_acc, *, scale):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0, 0]   # (bq, D)
    k = k_ref[0, 0]   # (bk, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]  # (bq, D)
    lse = lse_ref[0, 0][:, 0:1]  # (bq, 1)
    delta = delta_ref[0, 0][:, 0:1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
    # clamp: legit s - lse <= 0; padded rows carry garbage lse and dO == 0
    p = jnp.exp(jnp.minimum(s - lse, 0.0))  # (bq, bk)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (bq, bk)
    ds = p * (dp - delta) * scale
    dq_acc[:] += jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]   # (bq, D)
    k = k_ref[0, 0]   # (bk, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, 0:1]
    delta = delta_ref[0, 0][:, 0:1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
    p = jnp.exp(jnp.minimum(s - lse, 0.0))  # (bq, bk)
    dv_acc[:] += jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # (bk, D)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (bq, bk)
    ds = p * (dp - delta) * scale  # (bq, bk)
    dk_acc[:] += jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # (bk, D)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dqp_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    """Single-sweep backward: dK/dV accumulated over the inner q loop exactly
    as `_bwd_dkv_kernel`, plus the dQ contribution of each (kv, q) tile
    written to a per-kv-block partials output (`dqp`). The separate dQ kernel
    — and with it a second full recompute of s = q@k^T, exp, and dp — is
    eliminated; XLA reduces the partials over the kv axis afterwards. TPU has
    no atomics and Pallas outputs may not be revisited across non-consecutive
    grid steps, so distinct (ki, qi) output blocks + an XLA sum is the
    TPU-native accumulation pattern."""
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]   # (bq, D)
    k = k_ref[0, 0]   # (bk, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, 0:1]
    delta = delta_ref[0, 0][:, 0:1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
    p = jnp.exp(jnp.minimum(s - lse, 0.0))  # (bq, bk)
    dv_acc[:] += jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # (bk, D)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (bq, bk)
    ds = p * (dp - delta) * scale  # (bq, bk)
    dk_acc[:] += jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # (bk, D)
    dqp_ref[0, 0, 0] = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)  # (bq, D)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_prepare(q, k, v, kv_mask, out, g, block_q, block_k):
    """Shared backward preamble: pad/transpose operands to (B, H, S_p, D)
    kernel layout and precompute `delta = rowsum(dO * O)` lane-replicated
    like lse. Single home for this logic — used by both the fused and the
    two-kernel backward impls."""
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    dot = jnp.pad(g.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))[:, None, :]

    delta = jnp.einsum("bshd,bshd->bhs", g.astype(jnp.float32), out.astype(jnp.float32))
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))[..., None]
    delta = jnp.broadcast_to(delta, (b, hq, sq_p, 128))
    return qt, kt, vt, dot, mask, delta, sq_p, sk_p


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_bwd_impl(q, k, v, kv_mask, out, lse, g, scale, block_q, block_k):
    """Returns (dq, dk_per_qhead, dv_per_qhead); GQA group-sum happens in the
    caller."""
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    rep = hq // hkv
    qt, kt, vt, dot, mask, delta, sq_p, sk_p = _bwd_prepare(
        q, k, v, kv_mask, out, g, block_q, block_k)

    interpret = jax.default_backend() == "cpu"

    # ---- dQ: grid (b, hq, q_blocks, kv_blocks), kv innermost ----
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(b, hq, sq_p // block_q, sk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(mask, qt, kt, vt, dot, lse, delta)

    # ---- dK/dV: grid (b, hq, kv_blocks, q_blocks), q innermost ----
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(b, hq, sk_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki, qi: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi // rep, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi // rep, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, hq, sk_p, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(mask, qt, kt, vt, dot, lse, delta)

    dq = dq[:, :, :sq].transpose(0, 2, 1, 3)
    dk = dk[:, :, :sk].transpose(0, 2, 1, 3)  # (B, Sk, Hq, D)
    dv = dv[:, :, :sk].transpose(0, 2, 1, 3)
    return dq, dk, dv


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_bwd_fused_impl(q, k, v, kv_mask, out, lse, g, scale, block_q, block_k):
    """Single-sweep backward (see _bwd_fused_kernel): one kernel pass emits
    dK, dV, and per-kv-block dQ partials; dq = partials.sum(kv axis) in XLA.
    Versus _flash_bwd_impl this removes the dQ kernel's full recompute of
    s/exp/dp (two matmul passes + one exp pass per tile) at the cost of
    nk * |dQ| fp32 HBM traffic for the partials — a win while that array
    stays modest (see _use_fused_bwd)."""
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    rep = hq // hkv
    qt, kt, vt, dot, mask, delta, sq_p, sk_p = _bwd_prepare(
        q, k, v, kv_mask, out, g, block_q, block_k)
    nk = sk_p // block_k

    interpret = jax.default_backend() == "cpu"

    dqp, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale),
        grid=(b, hq, nk, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki, qi: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi // rep, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi // rep, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, ki, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, nk, sq_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, hq, sk_p, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(mask, qt, kt, vt, dot, lse, delta)

    dq = dqp.sum(axis=2).astype(q.dtype)
    dq = dq[:, :, :sq].transpose(0, 2, 1, 3)
    dk = dk[:, :, :sk].transpose(0, 2, 1, 3)  # (B, Sk, Hq, D)
    dv = dv[:, :, :sk].transpose(0, 2, 1, 3)
    return dq, dk, dv


def _use_fused_bwd(b, sq, hq, d, block_q, block_k, sk) -> bool:
    import os

    v = os.environ.get("LUMINA_FLASH_FUSED_BWD", "")
    if v:
        return v != "0"
    # auto: fused wins while the fp32 dQ-partials array (nk * |dQ|, with sq
    # padded to block_q exactly as the impl pads it) stays small next to
    # HBM; past that the extra traffic eats the saved recompute
    nk = _round_up(sk, block_k) // block_k
    partial_bytes = 4 * b * hq * _round_up(sq, block_q) * d * nk
    return partial_bytes <= 1 << 30  # 1 GiB


def _flash_bwd(q, k, v, kv_mask, out, lse, g, scale, block_q, block_k):
    if _use_fused_bwd(q.shape[0], q.shape[1], q.shape[2], q.shape[3],
                      block_q, block_k, k.shape[1]):
        return _flash_bwd_fused_impl(q, k, v, kv_mask, out, lse, g, scale, block_q, block_k)
    return _flash_bwd_impl(q, k, v, kv_mask, out, lse, g, scale, block_q, block_k)


def _pick_blocks(sq: int, sk: int, d: int):
    import os

    # defaults tuned END-TO-END on v5e at 4k tokens: 1024/2048 gives
    # 621 ms/step vs 627 (512/1024) and 630 (512/4096 — faster in isolation
    # but worse scheduled into the full graph); overridable for sweeps
    block_q = int(os.environ.get("LUMINA_FLASH_BQ", 0)) or min(1024, _round_up(sq, 128))
    block_k = int(os.environ.get("LUMINA_FLASH_BK", 0)) or min(2048, _round_up(sk, 128))
    return min(block_q, _round_up(sq, 128)), min(block_k, _round_up(sk, 128))


def _pick_bwd_blocks(sq: int, sk: int, d: int):
    import os

    # swept on v5e at B2/S4096/H24(kv8)/D96: isolated bwd 512/512 17.5ms ->
    # 1024/1024 15.5ms; e2e 600M train step 305 -> 296 ms/step; 2048-block
    # variants VMEM-OOM. Overridable for sweeps.
    block_q = int(os.environ.get("LUMINA_FLASH_BWD_BQ", 0)) or min(1024, _round_up(sq, 128))
    block_k = int(os.environ.get("LUMINA_FLASH_BWD_BK", 0)) or min(1024, _round_up(sk, 128))
    return min(block_q, _round_up(sq, 128)), min(block_k, _round_up(sk, 128))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, kv_mask, scale):
    block_q, block_k = _pick_blocks(q.shape[1], k.shape[1], q.shape[3])
    if k.shape[1] <= _SMALL_KV_MAX:
        return _flash_small_kv_impl(q, k, v, kv_mask, scale, block_q)
    return _flash_attention_fwd_impl(q, k, v, kv_mask, scale, block_q, block_k,
                                     static_max=_static_max_bound())


def _fwd(q, k, v, kv_mask, scale):
    block_q, block_k = _pick_blocks(q.shape[1], k.shape[1], q.shape[3])
    # the calibrated bound applies to the streaming self-attention sites only
    # (mirrors the primal dispatch above: small-KV cross-attention computes
    # its max for free and was never part of the calibration probe). This is
    # the TRAIN slot: _fwd only runs under differentiation, and a bound
    # calibrated for sampling must not leak into training (ADVICE r4).
    static_max = _static_max_bound(train=True) if streams_kv(k.shape[1]) else None
    out, lse = _flash_fwd_res_impl(q, k, v, kv_mask, scale, block_q, block_k,
                                   static_max=static_max)
    return out, (q, k, v, kv_mask, out, lse)


def _bwd(scale, res, g):
    q, k, v, kv_mask, out, lse = res
    hq, hkv = q.shape[2], k.shape[2]
    block_q, block_k = _pick_bwd_blocks(q.shape[1], k.shape[1], q.shape[3])
    dq, dk, dv = _flash_bwd(q, k, v, kv_mask, out, lse, g, scale, block_q, block_k)
    if hq != hkv:  # GQA: sum gradients over the query-head group
        b, sk, _, d = dk.shape
        rep = hq // hkv
        dk = dk.reshape(b, sk, hkv, rep, d).sum(axis=3)
        dv = dv.reshape(b, sk, hkv, rep, d).sum(axis=3)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


_flash_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused RoPE + flash attention
# ---------------------------------------------------------------------------
#
# Opt-in (LUMINA_FUSE_ROPE=1): measured on v5e at 2B shapes, XLA already
# fuses apply_rope into the wrapper's transpose/pad copy (rope+flash 6.20ms
# vs plain flash 6.33ms), so the fused kernel (6.90ms — rotation repeats per
# grid step) does NOT win there; it exists for hardware/shapes where that
# prologue fusion is unavailable. The interleaved-pair rotation happens
# inside the kernel on the VMEM tiles:
#   out[2k]   = x[2k] cos_k - x[2k+1] sin_k
#   out[2k+1] = x[2k] sin_k + x[2k+1] cos_k
# implemented as  x * cos_full + swap_pairs(x) * sin_signed  where cos_full
# repeats each cos twice, sin_signed = (-s0, s0, -s1, s1, ...), and
# swap_pairs swaps adjacent lanes via two pltpu.rolls selected by lane
# parity. The backward kernels rotate q/k the same way for the recompute and
# inverse-rotate (negated sin) the accumulated dq/dk at finalize — rotation
# is orthogonal, so rot^{-1} = rot(-angle).


def _swap_pairs(x):
    d = x.shape[1]
    left = pltpu.roll(x, d - 1, 1)  # lane i <- i+1 (shift must be >= 0)
    right = pltpu.roll(x, 1, 1)     # lane i <- i-1
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lanes % 2 == 0, left, right)


def _rotate_tile(x, cos_full, sin_signed):
    """x (b, D) bf16/f32; tables (b, D) f32; returns x.dtype."""
    xf = x.astype(jnp.float32)
    out = xf * cos_full + _swap_pairs(xf) * sin_signed
    return out.astype(x.dtype)


def _flash_rope_kernel(mask_ref, q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                       o_ref, m_ref, l_ref, acc_ref, *, scale):
    q = _rotate_tile(q_ref[0, 0], cq_ref[:], sq_ref[:])
    k = _rotate_tile(k_ref[0, 0], ck_ref[:], sk_ref[:])
    _flash_core(mask_ref, q, k, v_ref[0, 0], o_ref, m_ref, l_ref, acc_ref, scale=scale)


def _flash_rope_q_kernel(mask_ref, q_ref, k_ref, v_ref, cq_ref, sq_ref,
                         o_ref, m_ref, l_ref, acc_ref, *, scale):
    """Query-only rotation: cross-attention, where caption keys carry no
    positional rotation (reference rotates xq before the y-branch,
    `lumina_next_t2i/models/model.py:367-427`)."""
    q = _rotate_tile(q_ref[0, 0], cq_ref[:], sq_ref[:])
    _flash_core(mask_ref, q, k_ref[0, 0], v_ref[0, 0], o_ref, m_ref, l_ref, acc_ref,
                scale=scale)


def _flash_core(mask_ref, q, k, v, o_ref, m_ref, l_ref, acc_ref, *, scale):
    """Online-softmax body shared by the plain and fused-rope kernels."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
    m_prev = m_ref[:, 0:1]
    l_prev = l_ref[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_next, l_ref.shape)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(ki == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "rotate_k"))
def _flash_rope_fwd_impl(q, k, v, kv_mask, cos_full, sin_signed, scale, block_q, block_k,
                         rotate_k=True):
    """q/k unrotated; rotation fused. angles tables are (S, D) fp32.
    rotate_k=False rotates only q (cross-attention to unrotated caption keys)."""
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    rep = hq // hkv
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    mask = jnp.pad(kv_mask.astype(jnp.int32), ((0, 0), (0, sk_p - sk)))[:, None, :]
    cq = jnp.pad(cos_full, ((0, sq_p - sq), (0, 0)))
    sq_t = jnp.pad(sin_signed, ((0, sq_p - sq), (0, 0)))

    grid = (b, hq, sq_p // block_q, sk_p // block_k)
    interpret = jax.default_backend() == "cpu"

    in_specs = [
        pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_q, d), lambda bi, hi, qi, ki: (qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_q, d), lambda bi, hi, qi, ki: (qi, 0), memory_space=pltpu.VMEM),
    ]
    operands = [mask, qt, kt, vt, cq, sq_t]
    if rotate_k:
        kernel = _flash_rope_kernel
        in_specs += [
            pl.BlockSpec((block_k, d), lambda bi, hi, qi, ki: (ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, d), lambda bi, hi, qi, ki: (ki, 0), memory_space=pltpu.VMEM),
        ]
        operands += [
            jnp.pad(cos_full, ((0, sk_p - sk), (0, 0))),
            jnp.pad(sin_signed, ((0, sk_p - sk), (0, 0))),
        ]
    else:
        kernel = _flash_rope_q_kernel

    out = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # rope tables (4x (block, D) f32) push past the default 16MB
            # scoped-vmem limit at the tuned 1024/2048 blocks
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :, :sq].transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_rope(q, k, v, kv_mask, angles, scale, rotate_k):
    d = q.shape[3]
    cos_full, sin_signed = _rot_tables(angles, d)
    block_q, block_k = _pick_blocks(q.shape[1], k.shape[1], d)
    return _flash_rope_fwd_impl(q, k, v, kv_mask, cos_full, sin_signed, scale,
                                block_q, block_k, rotate_k)


def _rope_fwd(q, k, v, kv_mask, angles, scale, rotate_k):
    return (_flash_attention_rope(q, k, v, kv_mask, angles, scale, rotate_k),
            (q, k, v, kv_mask, angles))


def _rope_bwd(scale, rotate_k, res, g):
    """Backward: rotate q (and k if rotate_k) in XLA, run the plain flash
    backward, inverse-rotate dq (and dk). Rotation is orthogonal, so this is
    exact."""
    from .rope import apply_rope

    q, k, v, kv_mask, angles = res
    q_rot = apply_rope(q, angles)
    k_rot = apply_rope(k, angles) if rotate_k else k
    block_q, block_k = _pick_blocks(q.shape[1], k.shape[1], q.shape[3])
    out, lse = _flash_fwd_res_impl(q_rot, k_rot, v, kv_mask, scale, block_q, block_k)
    bq, bk = _pick_bwd_blocks(q.shape[1], k.shape[1], q.shape[3])
    dq_rot, dk_rot, dv = _flash_bwd(q_rot, k_rot, v, kv_mask, out, lse, g, scale, bq, bk)
    hq, hkv = q.shape[2], k.shape[2]
    if hq != hkv:
        b, sk, _, d = dk_rot.shape
        rep = hq // hkv
        dk_rot = dk_rot.reshape(b, sk, hkv, rep, d).sum(axis=3)
        dv = dv.reshape(b, sk, hkv, rep, d).sum(axis=3)
    dq = apply_rope(dq_rot, -angles)
    dk = apply_rope(dk_rot, -angles) if rotate_k else dk_rot
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None, None


_flash_attention_rope.defvjp(_rope_fwd, _rope_bwd)


def flash_attention_rope(q, k, v, angles, kv_mask=None, scale: Optional[float] = None,
                         rotate_k: bool = True):
    """Flash attention with the RoPE rotation fused into the kernel.

    q/k are UNROTATED; `angles` is the (Sq, head_dim//2) fp32 angle table.
    With rotate_k=True (self-attention, Sq == Sk) this matches
    `flash_attention(apply_rope(q), apply_rope(k), v)` bit-exactly for shared
    bf16 inputs; inside a full bf16 model, outputs can differ by a few ulp
    because XLA's excess-precision fusion may carry fp32 from the preceding
    norm into the rotation, while this kernel rounds its operands to bf16
    first (measured ~2% max / 0.05% mean on 600M outputs). With
    rotate_k=False (cross-attention) only q is rotated and k/v keep their
    own (caption) length.
    """
    _check_gqa_heads(q.shape[2], k.shape[2])
    if scale is None:
        scale = default_attn_scale(q.shape[-1])
    if kv_mask is None:
        kv_mask = jnp.ones((k.shape[0], k.shape[1]), jnp.int32)
    q, scale = _fold_traced_scale(q, scale)
    return _flash_attention_rope(q, k, v, kv_mask, angles.astype(jnp.float32),
                                 scale, bool(rotate_k))


def _fold_traced_scale(q, scale):
    """The Pallas kernels take `scale` as a static closure constant. Under
    nn.remat, python-float args get tensorized into 0-d tracers; fold such a
    scale into q instead ((q*s)@k == s*(q@k)) and run the kernel at 1.0."""
    if isinstance(scale, (int, float)):
        return q, float(scale)
    return q * jnp.asarray(scale, q.dtype), 1.0


def _check_gqa_heads(hq: int, hkv: int):
    """Fail fast on a non-divisible GQA config: the kernels' kv-head block
    index is hi // (hq // hkv); with floor-divided rep an out-of-range index
    would be CLAMPED by Pallas and the last q heads would silently attend
    the wrong kv head (sdpa asserts the same invariant)."""
    if hq % hkv != 0:
        raise ValueError(f"GQA requires n_q_heads ({hq}) divisible by "
                         f"n_kv_heads ({hkv})")


def flash_attention(q, k, v, kv_mask=None, scale: Optional[float] = None):
    """Flash attention entry point; see module docstring.

    Args:
      q: (B, Sq, Hq, D); k, v: (B, Sk, Hkv, D); kv_mask: optional (B, Sk).
    """
    _check_gqa_heads(q.shape[2], k.shape[2])
    if scale is None:
        scale = default_attn_scale(q.shape[-1])
    if kv_mask is None:
        kv_mask = jnp.ones((k.shape[0], k.shape[1]), jnp.int32)
    q, scale = _fold_traced_scale(q, scale)
    return _flash_attention(q, k, v, kv_mask, scale)
