"""Why does per-sample sampling throughput FALL with batch? (VERDICT r2 #6)

BENCH_r02: batch 1 = 0.063 samples/s vs batch 2 = 0.059 (-7% per sample) at
2B/1024^2, where attention FLOPs scale linearly and GEMMs should only get
BETTER with batch. This probe decomposes the regression on the real chip
(profiler capture is unavailable through the tunnel relay, so this is the
falsification-by-parts route; timing per NOTES rules — marginal-differenced
trajectories, varied inputs, device readback):

  (a) end-to-end per-step time via the REAL bench sampler at steps {4,12},
      batch 1/2: per_step = (T12 - T4) / 8 removes dispatch+setup;
  (b) the flash fwd kernel alone at rows b in {2,4,8} (B1 sample = CFG rows
      2, B2 = rows 4): chained-scan per-call time, per-row;
  (c) the dominant GEMM (b*4096, 2304)@(2304, 2304) per-row at the same rows;
  (d) same as (b) for the cross-attention small-KV kernel (4096 q, 256 kv).

Whichever of (b)/(c)/(d) shows super-linear row scaling is the regression;
if none do, the loss is in XLA scheduling between ops (fusion boundaries),
which (a) quantifies.

Drive: python exps/batch_scaling_probe.py [--skip_e2e]
"""

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/lumina_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/lumina_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

S, H, D, MODEL_DIM = 4096, 32, 72, 2304
CAP = 256


def _readback_time(fn, *args, repeats=3, vary_index=0):
    float(fn(*args))  # compile + warm
    best = float("inf")
    for r in range(repeats):
        a = list(args)
        a[vary_index] = a[vary_index] + jnp.asarray(1e-3 * (r + 1), a[vary_index].dtype)
        t0 = time.perf_counter()
        float(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _flash_loop(q, k, v, mask, n_iter):
    from lumina_t2x_tpu.ops.flash_attention import flash_attention

    def body(c, _):
        out = flash_attention(c, k, v, kv_mask=mask, scale=D**-0.5)
        return (c + out * jnp.bfloat16(1e-6)).astype(c.dtype), ()

    c, _ = jax.lax.scan(body, q, None, length=n_iter)
    return jnp.sum(c.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _gemm_loop(x, w, n_iter):
    def body(c, _):
        out = jax.lax.dot(c, w, preferred_element_type=jnp.float32)
        return (c + out.astype(c.dtype) * jnp.bfloat16(1e-6)).astype(c.dtype), ()

    c, _ = jax.lax.scan(body, x, None, length=n_iter)
    return jnp.sum(c.astype(jnp.float32))


def kernel_rows_sweep(n_iter=24):
    key = jax.random.PRNGKey(0)
    print(f"== (b) flash fwd kernel, S={S} H={H} D={D}, per-ROW time "
          f"({n_iter} chained iters, min of 3)")
    base = None
    for b in (2, 4, 8):
        q = jax.random.normal(key, (b, S, H, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, b), (b, S, H, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, b + 100), (b, S, H, D), jnp.bfloat16)
        mask = jnp.ones((b, S), jnp.int32)
        dt = _readback_time(_flash_loop, q, k, v, mask, n_iter) / n_iter
        per_row = dt / b * 1e3
        base = base or per_row
        print(f"  rows={b}: {dt*1e3:8.2f} ms/call  {per_row:7.2f} ms/row "
              f"({per_row/base*100:5.1f}% of rows=2)")

    print(f"== (d) cross-attn small-KV kernel, Sq={S} Skv={CAP}")
    base = None
    for b in (2, 4, 8):
        q = jax.random.normal(key, (b, S, H, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, b + 1), (b, CAP, H, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, b + 2), (b, CAP, H, D), jnp.bfloat16)
        mask = jnp.ones((b, CAP), jnp.int32)
        dt = _readback_time(_flash_loop, q, k, v, mask, n_iter) / n_iter
        per_row = dt / b * 1e3
        base = base or per_row
        print(f"  rows={b}: {dt*1e3:8.2f} ms/call  {per_row:7.2f} ms/row "
              f"({per_row/base*100:5.1f}% of rows=2)")

    print(f"== (c) GEMM (rows*{S},{MODEL_DIM})@({MODEL_DIM},{MODEL_DIM}) per-row")
    base = None
    for b in (2, 4, 8):
        x = jax.random.normal(key, (b * S, MODEL_DIM), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(key, b + 3),
                              (MODEL_DIM, MODEL_DIM), jnp.bfloat16)
        dt = _readback_time(_gemm_loop, x, w, n_iter) / n_iter
        per_row = dt / b * 1e3
        base = base or per_row
        print(f"  rows={b}: {dt*1e3:8.2f} ms/call  {per_row:7.2f} ms/row "
              f"({per_row/base*100:5.1f}% of rows=2)")


def e2e_per_step(batches=(1, 2), steps_pair=(4, 12)):
    from lumina_t2x_tpu.pipelines.sample_lib import (
        autocalibrate_flash_static_max, build_t2i_sample_fn)
    from lumina_t2x_tpu.models import get_model

    print(f"== (a) end-to-end marginal per-step time, 1024^2, steps {steps_pair}")
    model = get_model("NextDiT_2B_patch2", cap_feat_dim=2048, qk_norm=True,
                      dtype=jnp.bfloat16, attn_impl="flash")
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 32, 32))
    cap0 = jax.random.normal(rng, (2, 8, 2048))
    variables = jax.jit(model.init)(jax.random.fold_in(rng, 2), x0,
                                    jnp.zeros((2,)), cap0,
                                    jnp.ones((2, 8), jnp.int32))
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables)

    for batch in batches:
        cap = jax.random.normal(jax.random.fold_in(rng, 1), (2 * batch, CAP, 2048))
        mask = jnp.ones((2 * batch, CAP), jnp.int32)
        autocalibrate_flash_static_max(model, variables, cap, mask,
                                       width=1024, height=1024, cfg_scale=4.0,
                                       time_shifting_factor=4.0)
        times = {}
        for ns in steps_pair:
            fn = jax.jit(build_t2i_sample_fn(
                model, width=1024, height=1024, num_steps=ns, solver="euler",
                cfg_scale=4.0, time_shifting_factor=4.0))
            out = fn(variables, rng, cap, mask)
            jax.block_until_ready(out)
            best = float("inf")
            for r in range(2):
                t0 = time.perf_counter()
                out = fn(variables, jax.random.fold_in(rng, r + 7), cap, mask)
                float(jnp.sum(out))
                best = min(best, time.perf_counter() - t0)
            times[ns] = best
        per_step = (times[steps_pair[1]] - times[steps_pair[0]]) / (
            steps_pair[1] - steps_pair[0])
        print(f"  batch={batch}: per-step {per_step*1e3:7.1f} ms  "
              f"per-sample-step {per_step/batch*1e3:7.1f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip_e2e", action="store_true")
    p.add_argument("--skip_kernels", action="store_true")
    args = p.parse_args()
    if not args.skip_kernels:
        kernel_rows_sweep()
    if not args.skip_e2e:
        e2e_per_step()


if __name__ == "__main__":
    main()
