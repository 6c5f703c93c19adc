"""Full-train-step overhead decomposition (VERDICT r3 #4).

BENCH_r03: 600M ImageNet 256px B16 runs ~77-79 TF/s in "grad" mode (fwd + bwd +
global-norm) but 47.7 TF/s in "full" mode (+ clip/AdamW/EMA/guard) — the
optimizer phase costs ~90+ ms/step where an HBM-bandwidth estimate says the
fused pass should cost ~27 ms (params+mu+nu+EMA fp32 = 9.6 GB state, read+write
= ~22 GB of traffic at ~810 GB/s). This probe times each candidate contributor
in isolation on the real chip. One 600M fp32 train state is ~9.6 GB, so legs
CANNOT share a 16 GB chip: run ONE leg per process:

  for leg in grad optpass opt_guard full_nokeep full full_bf16st; do
      python exps/fullstep_decomposition.py --legs $leg; done

Legs:
  grad        fwd+bwd+global-norm — the exact bench `--mode grad` measurement
              (imported from exps.train_bench_t2i so numbers are comparable)
  optpass     the fused AdamW+EMA pass ALONE on synthetic grads, donated state
              (the optimizer pass does identical arithmetic regardless of grad
              values, so random grads time it exactly)
  opt_guard   optpass + the skipped-step keep-select (is the select fused, or
              does it double state traffic?)
  full_nokeep complete step minus the non-finite guard's keep-select
  full        the shipped make_train_step (bench "full" mode)
  full_bf16st complete step with bf16 mu/nu/EMA (half the optimizer state
              traffic; the accuracy story is in NOTES.md)

Each timing is min over N steps with a device->host scalar readback (tunnel
rule: block_until_ready alone can return before the relay finishes).
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="NextDiT_ImageNet_600M_patch2")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--cap_len", type=int, default=256)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--remat_policy", default="dots_slim")
    p.add_argument("--opt", choices=["fused", "adafactor"], default="fused",
                   help="adafactor = the 2B-on-one-chip layout (pair with "
                        "--param_dtype bf16; the optpass leg then includes "
                        "the stochastic-rounding PRNG cost)")
    p.add_argument("--param_dtype", choices=["fp32", "bf16"], default="fp32")
    p.add_argument("--legs", nargs="+",
                   default=["grad", "optpass", "opt_guard", "full_nokeep",
                            "full", "full_bf16st"])
    args = p.parse_args()

    from exps.train_bench_t2i import build, run_grad, t2i_train_flops_per_image
    from lumina_t2x_tpu.pipelines.train_lib import (
        FusedAdamWEMA, create_train_state, make_train_step)
    import optax

    pdt = jnp.bfloat16 if args.param_dtype == "bf16" else jnp.float32
    model, batch_data, cond, transport, opt = build(
        args.model, args.image_size, args.batch, args.cap_len,
        args.remat_policy, pdt, args.opt)
    class_cond = "ImageNet" in args.model or "MoE" in args.model
    flops = t2i_train_flops_per_image(
        model, args.image_size, 0 if class_cond else args.cap_len) * args.batch

    results = {}

    def report(name, dt):
        tf = flops / dt / 1e12
        results[name] = dict(ms=round(dt * 1000, 1), tflops=round(tf, 1))
        print(json.dumps({"leg": name, "ms_per_step": results[name]["ms"],
                          "tflops_per_sec": results[name]["tflops"]}), flush=True)

    def fresh_state(optimizer=None):
        return create_train_state(jax.random.PRNGKey(1), model, batch_data,
                                  optimizer or opt, cond)

    def fresh_batch(i):
        b = dict(batch_data)
        b["x"] = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(3), i),
                                   batch_data["x"].shape)
        return b

    # ---- grad: the bench's own fwd+bwd+norm measurement ----------------------
    if "grad" in args.legs:
        times, _ = run_grad(args.model, args.image_size, args.batch, args.cap_len,
                            args.remat_policy, pdt, args.opt, args.steps)
        report("grad", min(times))

    # ---- optpass / opt_guard: fused AdamW+EMA alone, donated state -----------
    def make_optpass(with_guard: bool):
        def optpass(st, grads, scale_seed):
            # fold a varying scalar in so the tunnel can't memoize the call
            scale = 1.0 + 0.0 * scale_seed
            kw = {}
            if args.opt == "adafactor" and args.param_dtype == "bf16":
                # include the stochastic-rounding PRNG cost (the shipped
                # trainer threads an rng for bf16 stores)
                kw["rng"] = jax.random.fold_in(
                    jax.random.PRNGKey(17), scale_seed.astype(jnp.int32))
            params, opt_state, ema = opt.step(
                grads, st.params, st.opt_state, st.ema_params, 0.9999, scale,
                **kw)
            if with_guard:
                skipped = scale_seed < 0  # always False at runtime
                keep = lambda new, old: jax.tree.map(
                    lambda n, o: jnp.where(skipped, o, n), new, old)
                params = keep(params, st.params)
                opt_state = keep(opt_state, st.opt_state)
                ema = keep(ema, st.ema_params)
            return st.replace(step=st.step + 1, params=params,
                              opt_state=opt_state, ema_params=ema)
        return jax.jit(optpass, donate_argnums=(0,))

    for name, guard in (("optpass", False), ("opt_guard", True),
                        ("optpass_nosr", False), ("optpass_rbg", False)):
        if name not in args.legs:
            continue
        if name == "optpass_nosr":
            # isolate the stochastic-rounding PRNG: same pass, round-to-nearest
            from lumina_t2x_tpu.pipelines.train_lib import FusedAdafactorEMA
            opt = FusedAdafactorEMA(5e-4, stochastic_rounding=False)
        elif name == "optpass_rbg":
            # hardware RngBitGenerator noise instead of threefry
            os.environ["LUMINA_SR_PRNG"] = "rbg"
        st = fresh_state()
        # synthetic grads: the optimizer pass is value-independent arithmetic
        leaves, treedef = jax.tree.flatten(st.params)
        keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        grads0 = jax.tree.unflatten(treedef, [
            0.01 * jax.random.normal(k, l.shape, l.dtype)
            for k, l in zip(keys, leaves)])
        fn = make_optpass(guard)
        st = fn(st, grads0, jnp.float32(0))
        float(st.step)
        times = []
        for i in range(args.steps):
            t0 = time.perf_counter()
            st = fn(st, grads0, jnp.float32(i + 1))
            float(st.step)
            times.append(time.perf_counter() - t0)
        report(name, min(times))
        del st, grads0

    # ---- full variants --------------------------------------------------------
    def run_full(step_fn, name, st=None):
        st = st if st is not None else fresh_state()
        jit_step = jax.jit(step_fn, donate_argnums=(0,))
        st, m = jit_step(st, fresh_batch(0), jax.random.PRNGKey(2))
        float(m["loss"])
        times = []
        for i in range(args.steps):
            b = fresh_batch(i + 1)
            t0 = time.perf_counter()
            st, m = jit_step(st, b, jax.random.fold_in(jax.random.PRNGKey(2), i))
            float(m["loss"])
            times.append(time.perf_counter() - t0)
        report(name, min(times))

    if "full" in args.legs:
        run_full(make_train_step(model, transport, opt, cond, grad_clip=2.0), "full")

    if "full_nokeep" in args.legs:
        # same step with the non-finite guard's keep-select removed (grad_clip
        # scale stays)
        def loss_fn(p_, batch, drop_rng, loss_rng):
            def model_fn(xt, t):
                return model.apply({"params": p_}, xt, t, train=True,
                                   rngs={"label_dropout": drop_rng}, **cond(batch))
            return transport.training_losses(loss_rng, model_fn, batch["x"])["loss"].mean()

        def step_nokeep(st, batch, rng):
            step_rng = jax.random.fold_in(rng, st.step)
            drop_rng, loss_rng = jax.random.split(step_rng)
            loss, grads = jax.value_and_grad(loss_fn)(st.params, batch, drop_rng, loss_rng)
            gn = optax.global_norm(jax.tree.map(lambda g: g.astype(jnp.float32), grads))
            scale = jnp.minimum(1.0, 2.0 / (gn + 1e-6))
            params, opt_state, ema = opt.step(
                grads, st.params, st.opt_state, st.ema_params, 0.9999, scale)
            return st.replace(step=st.step + 1, params=params,
                              opt_state=opt_state, ema_params=ema), \
                {"loss": loss, "grad_norm": gn}
        run_full(step_nokeep, "full_nokeep")

    if "full_bf16st" in args.legs:
        opt_bf = FusedAdamWEMA(5e-4)
        st_bf = fresh_state(opt_bf)
        adam, e1, e2 = st_bf.opt_state
        st_bf = st_bf.replace(
            opt_state=(optax.ScaleByAdamState(
                count=adam.count,
                mu=jax.tree.map(lambda a: a.astype(jnp.bfloat16), adam.mu),
                nu=jax.tree.map(lambda a: a.astype(jnp.bfloat16), adam.nu)),
                e1, e2),
            ema_params=jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                    st_bf.ema_params))
        run_full(make_train_step(model, transport, opt_bf, cond, grad_clip=2.0),
                 "full_bf16st", st=st_bf)

    print(json.dumps({"decomposition": results}))


if __name__ == "__main__":
    main()
