"""Audio / music training application (CFM over FlagDiT-1D).

The reference ships the CFM objective and Lightning scaffolding but not the
actual training loop (`SURVEY.md §2.7`: "Lightning training API (training
loop itself not shipped)"). This app completes the stack: OT-CFM loss
(`transport/cfm.py`) over FlagDiT-1D mel-latents with the same
train_lib-style machinery as the image trainers (AdamW, global-norm clip,
EMA, sharded step, checkpoints).

Data: a directory of precomputed mel-latent .npy files (B-agnostic,
(C, T) each) paired with caption-feature .npy files, or synthetic:// for
smoke/perf runs.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import (AsyncCheckpointSaver, find_auto_resume,
                               load_checkpoint, save_checkpoint)
from ..core.logging import MetricsWriter, Throughput, create_logger
from ..models.flag_dit_1d import FlagDiT1D
from ..parallel import create_mesh, distributed_init
from ..pipelines.train_lib import TrainState, create_optimizer, make_sharded_train_step, place_state
from ..transport.cfm import CFM


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="lumina audio/music trainer (TPU)")
    p.add_argument("--task", choices=["music", "audio"], default="music")
    p.add_argument("--data_path", type=str, default="synthetic://")
    p.add_argument("--results_dir", type=str, default="results/audio")
    p.add_argument("--latent_channels", type=int, default=20)
    p.add_argument("--latent_length", type=int, default=256)
    p.add_argument("--context_dim", type=int, default=1024)
    p.add_argument("--context_len", type=int, default=77)
    p.add_argument("--hidden_size", type=int, default=1152)
    p.add_argument("--depth", type=int, default=28)
    p.add_argument("--num_heads", type=int, default=16)
    p.add_argument("--global_batch_size", type=int, default=32)
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--grad_clip", type=float, default=2.0)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--precision", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--model_parallel_size", type=int, default=1)
    p.add_argument("--checkpointing", action="store_true")
    p.add_argument("--remat_policy", choices=["dots", "dots_slim", "full"],
                   default="dots")
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--ckpt_every", type=int, default=10_000)
    p.add_argument("--keep_last", type=int, default=0,
                   help="prune all but the newest N complete checkpoints")
    p.add_argument("--async_save", action="store_true",
                   help="overlap checkpoint serialization with training")
    p.add_argument("--global_seed", type=int, default=0)
    return p.parse_args(argv)


def synthetic_audio_batches(args) -> Iterator[Dict]:
    rng = np.random.default_rng(args.global_seed + jax.process_index())
    b = args.global_batch_size // jax.process_count()
    while True:
        yield {
            "x": rng.standard_normal((b, args.latent_channels, args.latent_length),
                                     np.float32),
            "context": rng.standard_normal((b, args.context_len, args.context_dim),
                                           np.float32),
        }


def npy_audio_batches(args) -> Iterator[Dict]:
    """Directory layout: <data_path>/{latents,captions}/<id>.npy."""
    lat_dir = os.path.join(args.data_path, "latents")
    cap_dir = os.path.join(args.data_path, "captions")
    ids = sorted(os.path.splitext(f)[0] for f in os.listdir(lat_dir) if f.endswith(".npy"))
    rng = np.random.default_rng(args.global_seed + jax.process_index())
    b = args.global_batch_size // jax.process_count()
    while True:
        pick = rng.choice(len(ids), b)
        xs, ctxs = [], []
        for i in pick:
            x = np.load(os.path.join(lat_dir, ids[i] + ".npy"))[:, : args.latent_length]
            if x.shape[1] < args.latent_length:
                x = np.pad(x, ((0, 0), (0, args.latent_length - x.shape[1])))
            c = np.load(os.path.join(cap_dir, ids[i] + ".npy"))[: args.context_len]
            if c.shape[0] < args.context_len:
                c = np.pad(c, ((0, args.context_len - c.shape[0]), (0, 0)))
            xs.append(x)
            ctxs.append(c)
        yield {"x": np.stack(xs).astype(np.float32),
               "context": np.stack(ctxs).astype(np.float32)}


def make_cfm_train_step(model, cfm: CFM, optimizer, grad_clip: float, ema_decay: float):
    def step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            def model_fn(x_noisy, t):
                return model.apply({"params": params}, x_noisy, t, batch["context"])

            terms = cfm.p_losses(step_rng, model_fn, batch["x"])
            return terms["loss"], terms

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(lambda e, p: e * ema_decay + (1 - ema_decay) * p,
                           state.ema_params, params)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state,
                             ema_params=ema), {"loss": loss, "grad_norm": gnorm}

    return step


def main(argv=None):
    from ..core import enable_compile_cache

    enable_compile_cache()
    args = parse_args(argv)
    distributed_init()
    mesh = create_mesh(args.model_parallel_size)
    exp_dir = os.path.join(args.results_dir, args.task)
    logger = create_logger(exp_dir, jax.process_index() == 0)
    metrics = MetricsWriter(exp_dir, jax.process_index() == 0)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    model = FlagDiT1D(
        in_channels=args.latent_channels, context_dim=args.context_dim,
        hidden_size=args.hidden_size, depth=args.depth, num_heads=args.num_heads,
        dtype=dtype, remat=args.checkpointing,
        remat_policy=args.remat_policy,
    )
    batches = (synthetic_audio_batches(args) if args.data_path.startswith("synthetic://")
               else npy_audio_batches(args))
    first = next(batches)

    optimizer = create_optimizer(args.lr, args.wd)
    rng = jax.random.PRNGKey(args.global_seed)
    variables = model.init(rng, jnp.asarray(first["x"]), jnp.zeros((first["x"].shape[0],)),
                           jnp.asarray(first["context"]))
    params = variables["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info(f"FlagDiT1D params={n/1e6:.1f}M task={args.task}")
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema_params=jax.tree.map(jnp.array, params))

    resume = find_auto_resume(exp_dir) if args.auto_resume else None
    if resume:
        state = load_checkpoint(resume, state)
        logger.info(f"resumed from {resume}")

    cfm = CFM()
    step_fn = make_cfm_train_step(model, cfm, optimizer, args.grad_clip, args.ema_decay)
    jitted, _ = make_sharded_train_step(mesh, step_fn, state, fsdp=True)
    state = place_state(mesh, state, fsdp=True)

    meter = Throughput()
    meter.start()
    saver = (AsyncCheckpointSaver(keep_last=args.keep_last)
             if args.async_save else None)
    batch = first
    for step in range(int(state.step), args.max_steps):
        if jax.process_count() > 1:
            # assemble per-process local batches into the global sharded
            # array (same as train.py; a raw numpy batch would be treated
            # as a full replicated global value — silently wrong data)
            from ..parallel.mesh import form_global_batch

            batch = form_global_batch(mesh, batch)
        state, m = jitted(state, batch, rng)
        if (step + 1) % args.log_every == 0:
            tp = meter.step(args.log_every * args.global_batch_size, sync_array=m["loss"])
            logger.info(
                f"(step={step + 1:07d}) Train Loss: {float(m['loss']):.4f}, "
                f"Train Grad Norm: {float(m['grad_norm']):.4f}, "
                f"items/sec: {tp['items_per_sec']:.1f}"
            )
            metrics.write(step + 1, {"train/loss": float(m["loss"]),
                                     "train/grad_norm": float(m["grad_norm"])})
        if (step + 1) % args.ckpt_every == 0 or (step + 1) == args.max_steps:
            if saver is not None:
                path = saver.save(exp_dir, step + 1, state, model_args=vars(args))
                logger.info(f"initiated async save to {path}")
            else:
                path = save_checkpoint(exp_dir, step + 1, state,
                                       model_args=vars(args), keep_last=args.keep_last)
                logger.info(f"saved checkpoint to {path}")
        batch = next(batches)
    if saver is not None:
        saver.close()
    metrics.close()
    return state


if __name__ == "__main__":
    main()
