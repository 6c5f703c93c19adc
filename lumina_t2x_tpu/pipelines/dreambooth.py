"""DreamBooth fine-tuning (subject-driven personalization).

Counterpart of `lumina_next_t2i_mini/train_dreambooth_sd3.py:396+` (an
HF-Accelerate script around `SD3Transformer2DModel`): fine-tune a flow
denoiser on a handful of instance images with prior-preservation —

  loss = MSE(instance batch) + prior_loss_weight * MSE(class batch)

where the class batch is pre-generated with the class prompt to anchor the
prior. The flow objective is the mini linear-velocity loss
(`transport/mini.py`); the full train-step machinery (sharding, EMA, clip,
AdamW) is reused from `train_lib`.

Two conditioning modes, keyed on the model family:
- NextDiT family (default): (cap_feats, cap_mask) from `--text_encoder`
  (or hashed stand-ins);
- MMDiT/SD3 (`--model MMDiT_*`): (context, pooled) from the CLIP-L ⊕ CLIP-G
  (⊕ T5) triple encoder (`codecs/clip_text.SD3PromptEncoder`) — the same
  `pipe.encode_prompt` features the reference script consumes
  (`train_dreambooth_sd3.py` `encode_prompt`/`compute_text_embeddings`);
  pass `--clip_l/--clip_g` (and optionally `--t5`) for real weights, else
  the debug towers keep the path runnable. The SD3 loss convention
  (x_σ = (1-σ)x1 + σ x0, target = noise - x1, timesteps = σ·1000) is folded
  into a sign/timestep wrapper around the shared mini loss.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import save_checkpoint
from ..core.logging import create_logger
from ..models import get_model
from ..transport.mini import training_losses_mini
from .train_lib import TrainState, create_optimizer, create_train_state


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DreamBooth fine-tuning (TPU)")
    p.add_argument("--model", type=str, default="NextDiT_2B_patch2")
    p.add_argument("--pretrained_ckpt", type=str, default=None)
    p.add_argument("--instance_data_dir", type=str, required=True)
    p.add_argument("--class_data_dir", type=str, default=None)
    p.add_argument("--instance_prompt", type=str, required=True)
    p.add_argument("--class_prompt", type=str, default=None)
    p.add_argument("--with_prior_preservation", action="store_true")
    p.add_argument("--prior_loss_weight", type=float, default=1.0)
    p.add_argument("--output_dir", type=str, default="dreambooth_out")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=500)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--max_grad_norm", type=float, default=1.0,
                   help="global-norm gradient clip (the reference's "
                        "accelerate clip_grad_norm_)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA decay for the saved 'ema' stream; 0 = the ema "
                        "stream exactly tracks the fine-tuned weights")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cap_feat_dim", type=int, default=2048)
    p.add_argument("--text_encoder", type=str, default=None)
    p.add_argument("--clip_l", type=str, default=None,
                   help="SD3 mode: local HF dir for the CLIP-L tower")
    p.add_argument("--clip_g", type=str, default=None,
                   help="SD3 mode: local HF dir for the CLIP-G tower")
    p.add_argument("--t5", type=str, default=None,
                   help="SD3 mode: local HF dir for the T5 encoder (optional)")
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--precision", choices=["fp32", "bf16"], default="bf16")
    return p.parse_args(argv)


def _image_latents(paths, resolution, vae=None, vae_variables=None, vae_type="ema",
                   rng=None, latent_channels: int = 4):
    from PIL import Image

    from ..data.imgproc import center_crop_arr, to_latent_input

    imgs = np.stack([
        to_latent_input(center_crop_arr(Image.open(p).convert("RGB"), resolution))
        for p in paths
    ])
    if vae is None:
        # latent stand-in: 8x avg-pool, channel-tiled to the model's latent
        # width (4 for SD VAEs, 16 for SD3) — smoke mode without VAE weights
        b, c, h, w = imgs.shape
        pooled = imgs.reshape(b, c, h // 8, 8, w // 8, 8).mean((3, 5))
        reps = -(-latent_channels // c)
        return np.concatenate([pooled] * reps, axis=1)[:, :latent_channels]
    from ..codecs.vae import encode_to_latent

    return np.asarray(encode_to_latent(vae, vae_variables, jnp.asarray(imgs), rng, vae_type))


def _caption_features(prompt: str, n: int, cap_feat_dim: int, text_encoder=None):
    if text_encoder is not None:
        feats, mask = text_encoder.encode([prompt] * n)
        return np.asarray(feats), np.asarray(mask)
    ly = 32
    from ..utils import stable_text_seed

    r = np.random.default_rng(stable_text_seed(prompt))
    feats = np.repeat(r.standard_normal((1, ly, cap_feat_dim)).astype(np.float32), n, 0)
    return feats, np.ones((n, ly), np.int32)


def _caption_features_sd3(prompt: str, n: int, encoder):
    """(context, pooled) rows for an SD3 batch — `compute_text_embeddings`
    in the reference script (one prompt repeated over the batch)."""
    ctx, pooled = encoder.encode([prompt] * n)
    return np.asarray(ctx), np.asarray(pooled)


def dreambooth_batches(args, text_encoder=None, vae=None, vae_variables=None,
                       sd3_encoder=None, latent_channels: int = 4) -> Iterator[Dict]:
    exts = (".jpg", ".jpeg", ".png", ".webp")
    inst_paths = sorted(
        os.path.join(args.instance_data_dir, f)
        for f in os.listdir(args.instance_data_dir) if f.lower().endswith(exts)
    )
    cls_paths = []
    if args.with_prior_preservation:
        # the reference script errors on this combination too: without class
        # images the step would split instance rows in half and mislabel (or
        # NaN at batch size 1)
        if not args.class_data_dir:
            raise ValueError("--with_prior_preservation requires --class_data_dir")
        cls_paths = sorted(
            os.path.join(args.class_data_dir, f)
            for f in os.listdir(args.class_data_dir) if f.lower().endswith(exts)
        )
        if not cls_paths:
            raise ValueError(f"--class_data_dir {args.class_data_dir!r} "
                             "contains no images")
    rng = np.random.default_rng(args.seed)
    b = args.train_batch_size
    while True:
        pick = rng.choice(len(inst_paths), b)
        x_inst = _image_latents([inst_paths[i] for i in pick], args.resolution,
                                vae, vae_variables,
                                rng=jax.random.PRNGKey(int(rng.integers(1 << 30))),
                                latent_channels=latent_channels)
        if sd3_encoder is not None:
            ctx_i, pool_i = _caption_features_sd3(args.instance_prompt, b, sd3_encoder)
            batch = {"x": x_inst, "context": ctx_i, "pooled": pool_i}
        else:
            cf_i, cm_i = _caption_features(args.instance_prompt, b,
                                           args.cap_feat_dim, text_encoder)
            batch = {"x": x_inst, "cap_feats": cf_i, "cap_mask": cm_i}
        if cls_paths:
            pick_c = rng.choice(len(cls_paths), b)
            x_cls = _image_latents([cls_paths[i] for i in pick_c], args.resolution,
                                   vae, vae_variables,
                                   rng=jax.random.PRNGKey(int(rng.integers(1 << 30))),
                                   latent_channels=latent_channels)
            # instance rows then class rows (`train_dreambooth_sd3.py` concat)
            if sd3_encoder is not None:
                ctx_c, pool_c = _caption_features_sd3(args.class_prompt or "",
                                                      b, sd3_encoder)
                batch = {"x": np.concatenate([x_inst, x_cls]),
                         "context": np.concatenate([ctx_i, ctx_c]),
                         "pooled": np.concatenate([pool_i, pool_c])}
            else:
                cf_c, cm_c = _caption_features(args.class_prompt or "", b,
                                               args.cap_feat_dim, text_encoder)
                batch = {
                    "x": np.concatenate([x_inst, x_cls]),
                    "cap_feats": np.concatenate([cf_i, cf_c]),
                    "cap_mask": np.concatenate([cm_i, cm_c]),
                }
        yield batch


def make_dreambooth_step(model, optimizer, prior_loss_weight: float,
                         with_prior: bool, ema_decay: float = 0.0,
                         grad_clip: float = 1.0, sd3: bool = False):
    """Prior-preservation train step: split the batch into (instance, class)
    halves and weight the class loss (`train_dreambooth_sd3.py` loss block).
    Clips at `grad_clip` global norm (the reference's accelerate
    clip_grad_norm_) and maintains the `ema` stream — with ema_decay=0 it
    exactly tracks the fine-tuned params, so the checkpoint's 'ema' subtree
    (what every sampler restores) always holds usable weights."""
    import optax

    def step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            def model_fn(xt, t):
                if sd3:
                    # SD3 convention bridge (`train_dreambooth_sd3.py` loss
                    # block): the reference trains on x_σ = (1-σ)x1 + σ x0
                    # with target = noise - x1 and timesteps = σ·1000; the
                    # shared mini loss uses t = 1-σ and target x1 - x0, so
                    # feed (1-t)·1000 and negate the prediction
                    return -model.apply({"params": params}, xt,
                                        (1.0 - t) * 1000.0,
                                        batch["context"], batch["pooled"])
                return model.apply({"params": params}, xt, t,
                                   batch["cap_feats"], batch["cap_mask"])

            terms = training_losses_mini(step_rng, model_fn, batch["x"])
            per_item = terms["loss"]
            if with_prior:
                half = per_item.shape[0] // 2
                inst = per_item[:half].mean()
                prior = per_item[half:].mean()
                return inst + prior_loss_weight * prior, {"instance_loss": inst,
                                                          "prior_loss": prior}
            return per_item.mean(), {}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        if grad_clip and grad_clip > 0:
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(lambda e, q: e * ema_decay + (1.0 - ema_decay) * q,
                           state.ema_params, params)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, ema_params=ema)
        return new_state, {"loss": loss, "grad_norm": gnorm, **aux}

    return step


def main(argv=None):
    from ..core import enable_compile_cache

    enable_compile_cache()
    args = parse_args(argv)
    logger = create_logger(args.output_dir)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    sd3 = args.model.startswith("MMDiT")
    text_encoder = sd3_encoder = None
    if sd3:
        from ..codecs.clip_text import build_sd3_prompt_encoder

        sd3_encoder = build_sd3_prompt_encoder(args.clip_l, args.clip_g, args.t5)
        if not (args.clip_l and args.clip_g):
            logger.warning("SD3 mode without --clip_l/--clip_g: prompts are "
                           "encoded by random debug towers")
        model = get_model(args.model, dtype=dtype)
        cond = lambda b: {"context": b["context"], "pooled": b["pooled"]}
    else:
        if args.text_encoder:
            from ..codecs.text_encoders import DecoderTextEncoder

            text_encoder = DecoderTextEncoder.from_pretrained(args.text_encoder,
                                                              dtype=dtype)
            args.cap_feat_dim = text_encoder.hidden_size
        model = get_model(args.model, cap_feat_dim=args.cap_feat_dim,
                          dtype=dtype, qk_norm=True)
        cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
    vae = vae_variables = None
    if args.vae_ckpt:
        from ..codecs.vae import load_vae

        # SD3's 16-channel VAE has no quant convs
        vae, vae_variables = (load_vae(args.vae_ckpt, z_channels=16,
                                       use_quant_conv=False)
                              if sd3 else load_vae(args.vae_ckpt))
    batches = dreambooth_batches(args, text_encoder, vae, vae_variables,
                                 sd3_encoder=sd3_encoder,
                                 latent_channels=16 if sd3 else 4)
    first = next(batches)
    optimizer = create_optimizer(args.learning_rate)
    state = create_train_state(jax.random.PRNGKey(args.seed), model, first, optimizer, cond)
    if args.pretrained_ckpt:
        from ..core.checkpoint import init_from

        loaded = init_from(args.pretrained_ckpt, state.params)
        # seed the EMA stream too: it is what the samplers restore
        state = state.replace(params=loaded,
                              ema_params=jax.tree.map(jnp.array, loaded))
        logger.info(f"loaded pretrained weights from {args.pretrained_ckpt}")

    step = jax.jit(make_dreambooth_step(model, optimizer, args.prior_loss_weight,
                                        args.with_prior_preservation,
                                        ema_decay=args.ema_decay,
                                        grad_clip=args.max_grad_norm, sd3=sd3))
    rng = jax.random.PRNGKey(args.seed)
    batch = first
    for i in range(args.max_train_steps):
        state, m = step(state, batch, rng)
        if (i + 1) % 50 == 0 or i == 0:
            logger.info(f"(step={i + 1:07d}) Train Loss: {float(m['loss']):.4f}")
        batch = next(batches)
    path = save_checkpoint(args.output_dir, int(state.step), state, model_args=vars(args))
    logger.info(f"saved to {path}")
    return state


if __name__ == "__main__":
    main()
