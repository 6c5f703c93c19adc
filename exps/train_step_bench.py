"""Pure training-step timing at configurable batch (TPU, one harness).

Drive with: `python exps/train_step_bench.py --batch 1 2 4 [--model ...]`.
Measures the jitted full train step (fwd+bwd+clip+AdamW+EMA, dots-remat,
bf16 compute, flash attention) with a forced device->host readback per step
(the tunnel's async handles make block_until_ready timings fake — NOTES.md).
Batch scaling is the open lever on the 600M step's ~29-33% MFU: the
d=1536 GEMMs and head_dim-48 attention contractions are shape-limited at
B=1 (NOTES.md round-2 journal), so larger per-chip batch is the remaining
way to fill the MXU.
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lumina_t2x_tpu.core.logging import enable_compile_cache
enable_compile_cache()


def bench_batch(model_name: str, batch: int, image_size: int, steps: int,
                remat_policy: str = "dots"):
    from lumina_t2x_tpu.models import get_model
    from lumina_t2x_tpu.pipelines.train_lib import (
        create_optimizer, create_train_state, make_train_step)
    from lumina_t2x_tpu.transport import create_transport

    model = get_model(model_name, qk_norm=True, dtype=jnp.bfloat16,
                      attn_impl="flash", remat=True, remat_policy=remat_policy)
    latent = image_size // 8
    rng = jax.random.PRNGKey(0)
    batch_data = {
        "x": jax.random.normal(rng, (batch, 4, latent, latent)),
        "y": jnp.zeros((batch,), jnp.int32),
    }
    cond = lambda b: {"y": b["y"]}
    opt = create_optimizer(1e-4)
    state = create_train_state(jax.random.PRNGKey(1), model, batch_data, opt, cond)
    transport = create_transport("Linear", "velocity", snr_type="lognorm")
    step = jax.jit(make_train_step(model, transport, opt, cond, grad_clip=2.0),
                   donate_argnums=(0,))

    state, m = step(state, batch_data, jax.random.PRNGKey(2))
    float(m["loss"])  # compile + real readback
    times = []
    for i in range(steps):
        b = {"x": jax.random.normal(jax.random.fold_in(rng, i), batch_data["x"].shape),
             "y": batch_data["y"]}
        t0 = time.perf_counter()
        state, m = step(state, b, jax.random.fold_in(jax.random.PRNGKey(2), i))
        float(m["loss"])  # force readback
        times.append(time.perf_counter() - t0)
    dt = min(times)
    tokens = batch * (latent // 2) ** 2
    print(f"{model_name} B={batch} {image_size}px ({tokens} tok, {remat_policy}): "
          f"{dt * 1000:.1f} ms/step  {batch / dt:.2f} imgs/sec")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="NextDiT_ImageNet_600M_patch2")
    p.add_argument("--batch", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--remat_policy", default="dots",
                   choices=["dots", "dots_slim", "full"])
    args = p.parse_args()
    for b in args.batch:
        bench_batch(args.model, b, args.image_size, args.steps,
                    remat_policy=args.remat_policy)


if __name__ == "__main__":
    main()
