"""Static-max kernel VPU-op-reduction variants, measured on-chip.

head_packing_experiment.py established that the D=72 flash forward is
VPU-bound: per head, MXU time fits 0.877us/D-unit (78% of the bf16 peak-rate
floor — MXU dot time is ~linear in the contraction dim, so head_dim 72
wastes no lanes) plus ~57us/head of per-logit work (mask select, scale mul,
sub, min, exp, bf16 cast), which is 47% of kernel time at D=72 and is what
makes H32xD72 cost 1.31x H18xD128 at equal useful FLOPs. Head-packing cannot
reduce per-logit work (the logit count B*H*S^2 is fixed by the architecture)
— but removing ops from the per-logit chain can. Variants timed here:

  v0  current static-max kernel: s=dot*scale; s=where(mask,s,-inf);
      p=exp(min(s-B,55)); cast               [mul, sel, sub, min, exp, cast]
  v1  reorder: p=exp(min(s*scale-B,55)); p=where(mask,p,0)
      (mul+sub fusable into one FMA; select moves after exp)
  v2  v1 with exp2 and prefolded log2(e): p=exp2(min(s*c1-B2,79.3))
  v3  v2 without the mask select (valid when the caller passes no mask and
      the KV length needs no padding — exactly the headline 1024^2 shapes)

Timing: scan-amortized, marginal-differenced (64-16 iters), min of 3,
device->host readback (NOTES.md tunnel rules).

Drive with: python exps/vpu_op_reduction.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lumina_t2x_tpu.core.logging import enable_compile_cache
enable_compile_cache()

_NEG_INF = -2.3819763e38
LOG2E = 1.4426950408889634


def _kernel_v0(mask_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, *, scale, d, bound):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0] != 0, s, _NEG_INF)
    p = jnp.exp(jnp.minimum(s - bound, 55.0))
    acc_ref[:] += jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(3) - 1)
    def _fin():
        o_ref[0, 0] = (acc_ref[:, :d] / jnp.maximum(acc_ref[:, d:d+1], 1e-30)).astype(o_ref.dtype)


def _kernel_v1(mask_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, *, scale, d, bound):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(jnp.minimum(s * scale - bound, 55.0))
    p = jnp.where(mask_ref[0] != 0, p, 0.0)
    acc_ref[:] += jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(3) - 1)
    def _fin():
        o_ref[0, 0] = (acc_ref[:, :d] / jnp.maximum(acc_ref[:, d:d+1], 1e-30)).astype(o_ref.dtype)


def _kernel_v2(mask_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, *, scale, d, bound):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c1 = scale * LOG2E
    b2 = bound * LOG2E
    s = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(jnp.minimum(s * c1 - b2, 55.0 * LOG2E))
    p = jnp.where(mask_ref[0] != 0, p, 0.0)
    acc_ref[:] += jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(3) - 1)
    def _fin():
        o_ref[0, 0] = (acc_ref[:, :d] / jnp.maximum(acc_ref[:, d:d+1], 1e-30)).astype(o_ref.dtype)


def _kernel_v3(mask_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, *, scale, d, bound):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c1 = scale * LOG2E
    b2 = bound * LOG2E
    s = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(jnp.minimum(s * c1 - b2, 55.0 * LOG2E))
    acc_ref[:] += jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(3) - 1)
    def _fin():
        o_ref[0, 0] = (acc_ref[:, :d] / jnp.maximum(acc_ref[:, d:d+1], 1e-30)).astype(o_ref.dtype)


def _kernel_v4(mask_ref, q_ref, k_ref, v_ref, o_ref, sa_ref, sb_ref, acc_ref, *,
               scale, d, bound):
    """Software-pipelined static-max: grid has nk+1 steps; step ki issues the
    MXU QK^T for block ki FIRST (into alternating scratch buffers), then the
    VPU exp + MXU PV for block ki-1 — the exp has no dependency on the
    just-issued dot, so the scheduler can overlap VPU and MXU. BlockSpec
    index maps deliver k of block ki and v/mask of block ki-1 (clamped at
    the edges; the pl.when guards make the clamped fetches dead)."""
    ki = pl.program_id(3)
    nk1 = pl.num_programs(3)
    nk = nk1 - 1

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def qk_into(ref):
        ref[:] = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(ki < nk, ki % 2 == 0))
    def _():
        qk_into(sa_ref)

    @pl.when(jnp.logical_and(ki < nk, ki % 2 == 1))
    def _():
        qk_into(sb_ref)

    def pv_from(ref):
        p = jnp.exp(jnp.minimum(ref[:] * scale - bound, 55.0))
        p = jnp.where(mask_ref[0] != 0, p, 0.0)
        acc_ref[:] += jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(ki > 0, ki % 2 == 1))
    def _():
        pv_from(sa_ref)

    @pl.when(jnp.logical_and(ki > 0, ki % 2 == 0))
    def _():
        pv_from(sb_ref)

    @pl.when(ki == nk)
    def _fin():
        o_ref[0, 0] = (acc_ref[:, :d] / jnp.maximum(acc_ref[:, d:d+1], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _loop_v4(q, k, v, mask, n_iter):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q, block_k = 1024, 2048
    nk = sk // block_k
    scale = 1.0 / (d ** 0.5)
    bound = 16.14

    qt0 = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = jnp.concatenate([v.transpose(0, 2, 1, 3),
                          jnp.ones((b, h, sk, 1), v.dtype)], axis=-1)
    m2 = mask[:, None, :]
    kern = functools.partial(_kernel_v4, scale=scale, d=d, bound=16.14)

    def call(qt):
        return pl.pallas_call(
            kern,
            grid=(b, h, sq // block_q, nk + 1),
            in_specs=[
                pl.BlockSpec((1, 1, block_k),
                             lambda bi, hi, qi, ki: (bi, 0, jnp.maximum(ki - 1, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bi, hi, qi, ki: (bi, hi, jnp.minimum(ki, nk - 1), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k, d + 1),
                             lambda bi, hi, qi, ki: (bi, hi, jnp.maximum(ki - 1, 0), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, block_k), jnp.float32),
                pltpu.VMEM((block_q, block_k), jnp.float32),
                pltpu.VMEM((block_q, d + 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(m2, qt, kt, vt)

    def body(c, _):
        out = call(c)
        return (c + out * jnp.bfloat16(1e-6)).astype(c.dtype), ()

    c, _ = jax.lax.scan(body, qt0, None, length=n_iter)
    return jnp.sum(c.astype(jnp.float32))


def check_v4(b=2, s=4096, h=4, d=72):
    """Numerical check of v4 against v0 at a small config."""
    key = jax.random.PRNGKey(9)
    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, h, d), jnp.bfloat16)
    mask = jnp.ones((b, s), jnp.int32).at[:, -37:].set(0)
    r0 = float(_loop(q, k, v, mask, "v0", 1))
    r4 = float(_loop_v4(q, k, v, mask, 1))
    print(f"  v4 check: v0 sum {r0:.6f} vs v4 sum {r4:.6f}")


def measure_v4(b=2, s=4096, h=32, d=72):
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, h, d), jnp.bfloat16)
    mask = jnp.ones((b, s), jnp.int32)
    ts = {}
    for n_iter in (16, 64):
        float(_loop_v4(q, k, v, mask, n_iter))
        best = float("inf")
        for r in range(3):
            q2 = q + jnp.bfloat16(1e-3 * (r + 1))
            t0 = time.perf_counter()
            float(_loop_v4(q2, k, v, mask, n_iter))
            best = min(best, time.perf_counter() - t0)
        ts[n_iter] = best
    per = (ts[64] - ts[16]) / 48
    fl = 4 * b * h * s * s * d
    print(f"  v4: {per*1e3:7.3f} ms/call  {fl/per/1e12:6.1f} TF/s useful")
    return per


KERNELS = {"v0": _kernel_v0, "v1": _kernel_v1, "v2": _kernel_v2, "v3": _kernel_v3}


@functools.partial(jax.jit, static_argnames=("variant", "n_iter"))
def _loop(q, k, v, mask, variant, n_iter):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q, block_k = 1024, 2048
    scale = 1.0 / (d ** 0.5)
    bound = 16.14  # the calibrated 2B bound (NOTES.md)

    qt0 = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = jnp.concatenate([v.transpose(0, 2, 1, 3),
                          jnp.ones((b, h, sk, 1), v.dtype)], axis=-1)
    m2 = mask[:, None, :]
    kern = functools.partial(KERNELS[variant], scale=scale, d=d, bound=bound)

    def call(qt):
        return pl.pallas_call(
            kern,
            grid=(b, h, sq // block_q, sk // block_k),
            in_specs=[
                pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k, d + 1), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            scratch_shapes=[pltpu.VMEM((block_q, d + 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(m2, qt, kt, vt)

    def body(c, _):
        out = call(c)
        return (c + out * jnp.bfloat16(1e-6)).astype(c.dtype), ()

    c, _ = jax.lax.scan(body, qt0, None, length=n_iter)
    return jnp.sum(c.astype(jnp.float32))


def measure(variant, b=2, s=4096, h=32, d=72):
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, h, d), jnp.bfloat16)
    mask = jnp.ones((b, s), jnp.int32)
    ts = {}
    for n_iter in (16, 64):
        float(_loop(q, k, v, mask, variant, n_iter))
        best = float("inf")
        for r in range(3):
            q2 = q + jnp.bfloat16(1e-3 * (r + 1))
            t0 = time.perf_counter()
            float(_loop(q2, k, v, mask, variant, n_iter))
            best = min(best, time.perf_counter() - t0)
        ts[n_iter] = best
    per = (ts[64] - ts[16]) / 48
    fl = 4 * b * h * s * s * d
    print(f"  {variant}: {per*1e3:7.3f} ms/call  {fl/per/1e12:6.1f} TF/s useful")
    return per


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["ops", "v4"], default=None)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")
    if args.only in (None, "ops"):
        print("== static-max VPU variants, B2/S4096/H32/D72, marginal (64-16 iters)")
        base = None
        for v in ("v0", "v1", "v2", "v3"):
            t = measure(v)
            if base is None:
                base = t
            else:
                print(f"      -> {100*(1-t/base):+.1f}% vs v0")
    if args.only in (None, "v4"):
        print("== v4: software-pipelined static-max (MXU/VPU overlap)")
        check_v4()
        measure_v4()
