"""Headline benchmark: 2B NextDiT text-to-image sampling throughput on TPU.

Metric (BASELINE.json): samples/sec/chip at 1024^2 for the 2B Next-DiT with a
30-step ODE (midpoint solver, CFG 4.0) — the full denoise loop compiled as one
XLA program, bf16, Pallas flash attention on TPU.

vs_baseline: the reference publishes no throughput numbers
(`BASELINE.md`); the denominator is a roofline estimate of the reference
stack on A100: ~2.05 PFLOP per 30-step CFG sample (2 * 2.3e9 params * 4096
tokens * 2 CFG * 2 solver evals/step * 30 steps * ~1.13 attention overhead)
at 40% MFU of 312 bf16 TFLOP/s => ~0.061 samples/sec/A100. vs_baseline >= 2.0
meets the north-star (2x A100 per chip).
"""

import json
import time

import jax
import jax.numpy as jnp

A100_REFERENCE_SAMPLES_PER_SEC = 0.061

NUM_STEPS = 30
RES = 1024
LATENT = RES // 8  # 128


def main():
    from lumina_t2x_tpu.models import get_model
    from lumina_t2x_tpu.pipelines.sample_lib import build_t2i_sample_fn

    on_tpu = jax.default_backend() not in ("cpu",)
    model = get_model(
        "NextDiT_2B_patch2", cap_feat_dim=2048, qk_norm=True,
        dtype=jnp.bfloat16, attn_impl="flash" if on_tpu else "xla",
    )

    rng = jax.random.PRNGKey(0)
    cap_len = 256
    b = 1  # per-chip batch of 1 sample (CFG doubles internally)
    x0 = jax.random.normal(rng, (2, 4, 32, 32))
    cap = jax.random.normal(jax.random.fold_in(rng, 1), (2 * b, cap_len, 2048))
    mask = jnp.ones((2 * b, cap_len), jnp.int32)

    variables = jax.jit(model.init)(
        jax.random.fold_in(rng, 2), x0, jnp.zeros((2,)), cap[:2], mask[:2]
    )
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
    )

    sample_fn = build_t2i_sample_fn(
        model, width=RES, height=RES, num_steps=NUM_STEPS, solver="midpoint",
        cfg_scale=4.0, time_shifting_factor=4.0,
    )
    jitted = jax.jit(sample_fn)

    # warmup/compile
    out = jitted(variables, rng, cap, mask)
    jax.block_until_ready(out)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = jitted(variables, jax.random.fold_in(rng, i), cap, mask)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    dt = min(times)
    samples_per_sec = b / dt
    print(
        json.dumps(
            {
                "metric": "samples/sec/chip at 1024^2 (2B NextDiT, 30-step midpoint ODE, CFG)",
                "value": round(samples_per_sec, 4),
                "unit": "samples/sec",
                "vs_baseline": round(samples_per_sec / A100_REFERENCE_SAMPLES_PER_SEC, 3),
                "per_step_latency_ms": round(dt / NUM_STEPS * 1000, 2),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
