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
from lumina_t2x_tpu.core.logging import enable_compile_cache
enable_compile_cache()

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


def model_fwd_sweep(attn_impl="flash", n_layers=None, rows=(2, 4)):
    """(e/f) bare-model forward at CFG row counts: full 2B (flash/xla) or a
    1-layer d=2304 model. Reproduces the e2e regression without the solver."""
    from lumina_t2x_tpu.models import get_model
    from lumina_t2x_tpu.models.next_dit import NextDiT

    if n_layers is None:
        model = get_model("NextDiT_2B_patch2", cap_feat_dim=2048, qk_norm=True,
                          dtype=jnp.bfloat16, attn_impl=attn_impl)
    else:
        model = NextDiT(patch_size=2, dim=2304, n_layers=n_layers, n_heads=32,
                        cap_feat_dim=2048, qk_norm=True, dtype=jnp.bfloat16,
                        attn_impl=attn_impl)
    rng = jax.random.PRNGKey(0)
    s_img = 128  # 1024^2 latent
    x0 = jax.random.normal(rng, (2, 4, s_img, s_img))
    cap0 = jax.random.normal(rng, (2, 8, 2048))
    variables = jax.jit(model.init)(jax.random.fold_in(rng, 2), x0,
                                    jnp.zeros((2,)), cap0,
                                    jnp.ones((2, 8), jnp.int32))
    variables = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if a.dtype == jnp.float32 else a, variables)

    @functools.partial(jax.jit, static_argnames=("n",))
    def fwd_loop(v, x, t, cap, mask, n):
        def body(c, _):
            out = model.apply(v, c, t, cap, mask)
            return (c + out * jnp.bfloat16(1e-6)).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    print(f"== (e/f) bare fwd attn={attn_impl} layers={n_layers or 'full'}, "
          "marginal per-row")
    base = None
    for b in rows:
        x = jax.random.normal(rng, (b, 4, s_img, s_img), jnp.bfloat16)
        t = jnp.full((b,), 0.5, jnp.float32)
        cap = jax.random.normal(jax.random.fold_in(rng, b), (b, CAP, 2048), jnp.bfloat16)
        mask = jnp.ones((b, CAP), jnp.int32)
        hi = _readback_time(fwd_loop, variables, x, t, cap, mask, 8, vary_index=1)
        lo = _readback_time(fwd_loop, variables, x, t, cap, mask, 2, vary_index=1)
        per = (hi - lo) / 6
        pr = per / b * 1e3
        base = base or pr
        print(f"  rows={b}: {per*1e3:8.1f} ms/call {pr:7.1f} ms/row "
              f"({pr/base*100:5.1f}%)", flush=True)


def attn_block_sweep(with_ln_rope=False):
    """(g/h) the in-model attention data path in isolation: dense ->
    [qk-LayerNorm -> RoPE ->] flash -> dense. Flat (g) / improving (h)
    per-row — the Pallas/XLA boundary is NOT the regression."""
    from lumina_t2x_tpu.ops.rope import apply_rope, rope_angles_2d

    key = jax.random.PRNGKey(0)
    W = {n: jax.random.normal(jax.random.fold_in(key, i),
                              (MODEL_DIM, MODEL_DIM), jnp.bfloat16) * 0.02
         for i, n in enumerate(("wq", "wk", "wv", "wo"))}
    g_q = jnp.ones((MODEL_DIM,), jnp.float32)
    angles = rope_angles_2d(D, 64, 64).reshape(S, -1)

    def ln(x, g):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g).astype(x.dtype)

    from lumina_t2x_tpu.ops.flash_attention import flash_attention

    @functools.partial(jax.jit, static_argnames=("n",))
    def block_loop(x, mask, n):
        b = x.shape[0]

        def body(c, _):
            q = (c @ W["wq"], c @ W["wk"])
            if with_ln_rope:
                q = (ln(q[0], g_q), ln(q[1], g_q))
            q, k = (a.reshape(b, S, H, D) for a in q)
            v = (c @ W["wv"]).reshape(b, S, H, D)
            if with_ln_rope:
                q, k = apply_rope(q, angles), apply_rope(k, angles)
            o = flash_attention(q, k, v, kv_mask=mask, scale=D**-0.5)
            o = o.reshape(b, S, MODEL_DIM) @ W["wo"]
            return (c + o * jnp.bfloat16(1e-6)).astype(c.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    print(f"== (g/h) attn block ln_rope={with_ln_rope}, marginal per-row")
    base = None
    for b in (2, 4, 8):
        x = jax.random.normal(jax.random.fold_in(key, b + 50), (b, S, MODEL_DIM),
                              jnp.bfloat16)
        mask = jnp.ones((b, S), jnp.int32)
        hi = _readback_time(block_loop, x, mask, 24)
        lo = _readback_time(block_loop, x, mask, 8)
        per = (hi - lo) / 16
        pr = per / b * 1e3
        base = base or pr
        print(f"  rows={b}: {per*1e3:8.2f} ms/call {pr:7.2f} ms/row "
              f"({pr/base*100:5.1f}%)", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip_e2e", action="store_true")
    p.add_argument("--skip_kernels", action="store_true")
    p.add_argument("--fwd", choices=["flash", "xla", "1layer", "block",
                                     "block_ln_rope"], default=None,
                   help="run one bisection leg instead of the default sweep")
    args = p.parse_args()
    if args.fwd == "flash":
        return model_fwd_sweep("flash")
    if args.fwd == "xla":
        return model_fwd_sweep("xla")
    if args.fwd == "1layer":
        return model_fwd_sweep("flash", n_layers=1)
    if args.fwd == "block":
        return attn_block_sweep(False)
    if args.fwd == "block_ln_rope":
        return attn_block_sweep(True)
    if not args.skip_kernels:
        kernel_rows_sweep()
    if not args.skip_e2e:
        e2e_per_step()


if __name__ == "__main__":
    main()
