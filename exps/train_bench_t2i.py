"""Training-throughput probe for the flagship T2I models (VERDICT r2 #2/#3).

Drives the REAL train step (`pipelines/train_lib.make_train_step`: loss, bwd,
clip, AdamW(+EMA), one jit program) for caption-conditioned NextDiT at the
reference recipe semantics (`Next-DiT-ImageNet/exps/600M_bs256_...sh`: bf16
compute, qk-norm, lognorm SNR) and reports imgs/sec + analytic MFU.

The 2B full train state (params+mu+nu+EMA, even all-bf16 = 4 x 4.6 GB) cannot
fit one 16 GB v5e — the reference needs >=32 GPUs for 2B training too — so
`--mode grad` additionally measures the fwd+bwd gradient computation alone
(params bf16 + grads bf16 fits), which is what settles the d=2304 MFU
shape-limit question; optimizer+EMA are HBM-bandwidth passes measured at
600M where the full state fits.

MFU accounting is ANALYTIC per-component (not 2*P*T): at 256 tokens the
per-sample adaLN projections carry ~10% of parameters but ~0 of the token
FLOPs, so 2*P*T would inflate MFU. Backward = 2x forward matmul FLOPs; remat
recompute is NOT counted as useful work.

Usage:
  python exps/train_bench_t2i.py --model NextDiT_2B_patch2 --image_size 256 \
      --batch 8 16 32 --mode grad --param_dtype bf16 --remat_policy dots_slim
  python exps/train_bench_t2i.py --model NextDiT_600M_patch2 --image_size 256 \
      --batch 16 32 --mode full
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lumina_t2x_tpu.core.logging import enable_compile_cache
enable_compile_cache()

V5E_PEAK_TFLOPS = 197.0


def t2i_train_flops_per_image(model, image_size: int, cap_len: int) -> float:
    """Analytic matmul FLOPs for ONE training step image (fwd + 2x bwd).
    Class-conditional (ImageNet) models have no caption branch: cap_len=0."""
    from lumina_t2x_tpu.models.layers import ffn_hidden_size

    d, L = model.dim, model.n_layers
    hd = d // model.n_heads
    dkv = (model.n_kv_heads or model.n_heads) * hd
    hidden = ffn_hidden_size(4 * d, model.multiple_of, model.ffn_dim_multiplier)
    S = (image_size // 8 // model.patch_size) ** 2
    Sc = cap_len
    ydim = getattr(model, "cap_feat_dim", 0) if cap_len else 0
    cond = min(d, 1024)

    per_block = (
        2 * S * (2 * d * d + 2 * d * dkv)          # wq, wo, wk, wv
        + 2 * Sc * (2 * ydim * dkv)                # wk_y, wv_y
        + 2 * S * (3 * d * hidden)                 # SwiGLU w1/w3/w2
        + 4 * S * S * d + 4 * S * Sc * d           # self + cross attention
        + 2 * cond * 4 * d                         # adaLN (per sample)
    )
    p = model.patch_size
    embed = 2 * S * (p * p * model.in_channels * d) * 2  # x_embedder + final linear
    head = 2 * cond * d + 2 * Sc * ydim * cond           # final adaLN + cap pool proj
    fwd = L * per_block + embed + head
    return 3.0 * fwd  # bwd = 2x fwd matmul FLOPs


def build(model_name: str, image_size: int, batch: int, cap_len: int,
          remat_policy: str, param_dtype, opt_kind: str):
    from lumina_t2x_tpu.models import get_model
    from lumina_t2x_tpu.pipelines.train_lib import (
        FusedAdafactorEMA, FusedAdamWEMA, create_optimizer, create_train_state,
        make_train_step)
    from lumina_t2x_tpu.transport import create_transport

    class_cond = "ImageNet" in model_name or "MoE" in model_name
    kwargs = dict(qk_norm=True, dtype=jnp.bfloat16,
                  attn_impl="flash" if jax.default_backend() != "cpu" else "xla",
                  remat=True, remat_policy=remat_policy, param_dtype=param_dtype)
    if not class_cond:
        kwargs["cap_feat_dim"] = 2048
    model = get_model(model_name, **kwargs)
    latent = image_size // 8
    rng = jax.random.PRNGKey(0)
    batch_data = {"x": jax.random.normal(rng, (batch, 4, latent, latent), jnp.float32)}
    if class_cond:
        batch_data["y"] = jnp.zeros((batch,), jnp.int32)
        cond = lambda b: {"y": b["y"]}
    else:
        batch_data["cap_feats"] = jax.random.normal(
            jax.random.fold_in(rng, 1), (batch, cap_len, 2048), jnp.float32)
        batch_data["cap_mask"] = jnp.ones((batch, cap_len), jnp.int32)
        cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
    transport = create_transport("Linear", "velocity", snr_type="lognorm")
    if opt_kind == "adafactor":
        # the 2B-on-one-chip configuration (--optimizer adafactor in the
        # trainer CLI): sublinear second moments + stochastic-rounded bf16
        # params/EMA — the ONLY layout whose full train state fits 16 GB at 2B
        opt = FusedAdafactorEMA(5e-4)
    elif opt_kind == "fused":
        opt = FusedAdamWEMA(5e-4)
    else:
        opt = create_optimizer(5e-4)
    return model, batch_data, cond, transport, opt


def run_full(model_name, image_size, batch, cap_len, remat_policy, param_dtype,
             opt_kind, steps, micro_batches=1):
    from lumina_t2x_tpu.pipelines.train_lib import create_train_state, make_train_step

    model, batch_data, cond, transport, opt = build(
        model_name, image_size, batch, cap_len, remat_policy, param_dtype, opt_kind)
    state = create_train_state(jax.random.PRNGKey(1), model, batch_data, opt, cond)
    step = jax.jit(make_train_step(model, transport, opt, cond, grad_clip=2.0,
                                   micro_batches=micro_batches),
                   donate_argnums=(0,))
    state, m = step(state, batch_data, jax.random.PRNGKey(2))
    float(m["loss"])
    times = []
    for i in range(steps):
        b = dict(batch_data)
        b["x"] = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(3), i),
                                   batch_data["x"].shape)
        t0 = time.perf_counter()
        state, m = step(state, b, jax.random.fold_in(jax.random.PRNGKey(2), i))
        float(m["loss"])  # force real readback through the tunnel
        times.append(time.perf_counter() - t0)
    return times, model


def run_grad(model_name, image_size, batch, cap_len, remat_policy, param_dtype,
             opt_kind, steps):
    """fwd+bwd+global-norm only (no optimizer state in HBM)."""
    model, batch_data, cond, transport, opt = build(
        model_name, image_size, batch, cap_len, remat_policy, param_dtype, opt_kind)
    import optax

    t0 = jnp.zeros((batch,), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(1),
         "label_dropout": jax.random.PRNGKey(11)},
        batch_data["x"], t0, **cond(batch_data))
    params = variables["params"]

    def loss_fn(p, batch, drop_rng, loss_rng):
        def model_fn(xt, t):
            return model.apply({"params": p}, xt, t, train=True,
                               rngs={"label_dropout": drop_rng}, **cond(batch))
        terms = transport.training_losses(loss_rng, model_fn, batch["x"])
        return terms["loss"].mean()

    @jax.jit
    def grad_step(p, batch, drop_rng, loss_rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch, drop_rng, loss_rng)
        return loss, optax.global_norm(
            jax.tree.map(lambda g: g.astype(jnp.float32), grads))

    loss, gn = grad_step(params, batch_data, jax.random.PRNGKey(4), jax.random.PRNGKey(5))
    float(loss)
    times = []
    for i in range(steps):
        b = dict(batch_data)
        b["x"] = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(3), i),
                                   batch_data["x"].shape)
        t0_ = time.perf_counter()
        loss, gn = grad_step(params, b, jax.random.fold_in(jax.random.PRNGKey(4), i),
                             jax.random.fold_in(jax.random.PRNGKey(5), i))
        float(loss)
        times.append(time.perf_counter() - t0_)
    return times, model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="NextDiT_2B_patch2")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch", type=int, nargs="+", default=[8, 16])
    p.add_argument("--cap_len", type=int, default=256)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--mode", choices=["full", "grad"], default="full")
    p.add_argument("--opt", choices=["fused", "optax", "adafactor"],
                   default="fused")
    p.add_argument("--param_dtype", choices=["fp32", "bf16"], default="fp32")
    p.add_argument("--remat_policy", default="dots",
                   choices=["dots", "dots_slim", "full"])
    p.add_argument("--microbatch", type=int, default=0,
                   help="micro_batches for the in-graph accumulation scan "
                        "(full mode; 0/1 = no accumulation). The flagship "
                        "recipes train micro-bs 2 at 1024px "
                        "(`lumina_t2i/exps/5B_bs512_..._1024px_sdxlvae.sh`)")
    args = p.parse_args()
    pdt = jnp.bfloat16 if args.param_dtype == "bf16" else jnp.float32

    for b in args.batch:
        try:
            if args.mode == "full":
                times, model = run_full(args.model, args.image_size, b,
                                        args.cap_len, args.remat_policy, pdt,
                                        args.opt, args.steps,
                                        micro_batches=max(args.microbatch, 1))
            else:
                times, model = run_grad(args.model, args.image_size, b,
                                        args.cap_len, args.remat_policy, pdt,
                                        args.opt, args.steps)
        except Exception as e:  # OOM legs report and continue
            print(json.dumps({"model": args.model, "batch": b, "mode": args.mode,
                              "error": str(e)[:200]}))
            continue
        dt = min(times)
        class_cond = "ImageNet" in args.model or "MoE" in args.model
        flops = t2i_train_flops_per_image(
            model, args.image_size, 0 if class_cond else args.cap_len) * b
        tf = flops / dt / 1e12
        import statistics

        print(json.dumps({
            "model": args.model, "image_size": args.image_size, "batch": b,
            "mode": args.mode, "opt": args.opt, "param_dtype": args.param_dtype,
            "remat": args.remat_policy, "microbatch": args.microbatch,
            "ms_per_step": round(dt * 1000, 1),
            "ms_per_step_median": round(statistics.median(times) * 1000, 1),
            "spread_pct": round((max(times) - dt) / dt * 100, 2),
            "imgs_per_sec": round(b / dt, 2), "tflops_per_sec": round(tf, 1),
            "mfu_vs_197tf": round(tf / V5E_PEAK_TFLOPS, 3),
        }))


if __name__ == "__main__":
    main()
