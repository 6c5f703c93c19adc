"""Batch sampling application.

Counterpart of `lumina_next_t2i/sample.py:85-341` and the ImageNet samplers:
text-file/label-list -> images (PNG when a VAE is available, .npy latents
otherwise), with a `data.json` manifest of all generation parameters
(`sample.py:152-258`) and `--debug` mode that runs the randomly-initialized
pipeline end to end (`sample.py:131-142`).

Resolution syntax mirrors the reference: "<category>:<W>x<H>" entries;
category > 1 enables resolution extrapolation (time-aware RoPE scaling +
proportional attention).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import find_auto_resume, load_model_args
from ..models import get_model
from .sample_lib import (autocalibrate_flash_static_max,
                         build_class_cond_sample_fn, build_t2i_sample_fn)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="lumina-t2x-tpu sampler")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--model", type=str, default="NextDiT_ImageNet_600M_patch2")
    p.add_argument("--image_save_path", type=str, default="samples")
    p.add_argument("--caption_path", type=str, default=None, help="txt file, one prompt per line")
    p.add_argument("--labels", type=str, default=None, help="comma-separated class ids")
    p.add_argument("--resolution", type=str, nargs="+", default=["1:256x256"])
    p.add_argument("--num_sampling_steps", type=int, default=30)
    p.add_argument("--solver", type=str, default="midpoint",
                   choices=["euler", "midpoint", "heun", "rk4", "dopri5", "dopri8"])
    p.add_argument("--atol", type=float, default=1e-6,
                   help="adaptive-solver absolute tolerance (dopri5/dopri8)")
    p.add_argument("--rtol", type=float, default=1e-3,
                   help="adaptive-solver relative tolerance (dopri5/dopri8)")
    p.add_argument("--cfg_scale", type=float, default=4.0)
    p.add_argument("--time_shifting_factor", type=float, default=1.0)
    p.add_argument("--scaling_watershed", type=float, default=0.3)
    p.add_argument("--proportional_attn", action="store_true")
    p.add_argument("--qk_norm", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precision", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--bf16_params", action="store_true",
                   help="store model params in bf16 (halves param HBM; "
                        "required for 5B/7B single-chip inference)")
    p.add_argument("--vae", type=str, choices=["ema", "mse", "sdxl", "sd3"], default="ema")
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--pixel_space", action="store_true",
                   help="the model denoises RGB pixels directly (a "
                        "--pixel_space-trained checkpoint): outputs are PNGs, "
                        "no VAE; auto-detected from the checkpoint's model_args")
    p.add_argument("--num_classes", type=int, default=None,
                   help="class-cond label-embedding size (auto-detected from "
                        "the checkpoint's model_args)")
    p.add_argument("--text_encoder", type=str, default=None, help="HF path of the caption LM")
    p.add_argument("--cap_feat_dim", type=int, default=None,
                   help="caption feature width (2048 Gemma-2B, 4096 LLaMA-2-7B); "
                        "default: the model config's own width (e.g. 4096 for "
                        "FlagDiT_5B_patch2, 2048 for the NextDiT registry entries)")
    p.add_argument("--train_res", type=int, default=1024)
    p.add_argument("--model_parallel_size", type=int, default=1,
                   help="shard params tensor-parallel over a (data, model) "
                        "mesh for multi-chip inference (the reference's MP "
                        "sampling path, lumina_t2i/sample.py process groups)")
    p.add_argument("--debug", action="store_true", help="random weights, no checkpoint needed")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_fid_samples", type=int, default=0,
                   help="class-cond: sample N images over random classes and dump an "
                        "ADM-evaluator-format npz (the reference's FID workflow)")
    return p.parse_args(argv)


def parse_resolution(entry: str):
    """"<category>:<W>x<H>" -> (category, W, H) (`sample.py` resolution list)."""
    if ":" in entry:
        cat, wh = entry.split(":")
    else:
        cat, wh = "1", entry
    w, h = wh.lower().split("x")
    return int(cat), int(w), int(h)


def _maybe_shard_params(args, variables):
    """TP-shard the restored params over a (data, model) mesh when
    --model_parallel_size > 1. The jitted sampler is mesh-agnostic: GSPMD
    reads the NamedShardings off the param arrays and inserts the TP
    collectives (tested: tests/test_sharding.py::TestShardedSampling)."""
    if args.model_parallel_size <= 1:
        return variables
    from ..parallel import create_mesh, shard_params

    mesh = create_mesh(model_parallel_size=args.model_parallel_size)
    return {"params": shard_params(mesh, variables["params"])}


def main(argv=None):
    from ..core import enable_compile_cache

    enable_compile_cache()
    args = parse_args(argv)
    os.makedirs(args.image_save_path, exist_ok=True)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    rng = jax.random.PRNGKey(args.seed)

    # -- model + weights -----------------------------------------------------
    # resolve the EFFECTIVE model name first: a checkpoint's recorded
    # model_args override args.model, and everything downstream
    # (class-cond branch choice, cap_feat_dim defaulting) must key on the
    # resolved name, not the CLI default
    train_args = {}
    if args.ckpt and not args.debug:
        train_args = load_model_args(args.ckpt)
        args.model = train_args.get("model", args.model)

    is_class_cond = args.labels is not None or "ImageNet" in args.model or "MoE" in args.model
    if train_args.get("pixel_space"):
        args.pixel_space = True
    if args.num_classes is None and train_args.get("num_classes") is not None:
        args.num_classes = int(train_args["num_classes"])

    model_kwargs = dict(qk_norm=args.qk_norm, dtype=dtype)
    if args.pixel_space:
        model_kwargs["in_channels"] = 3
    if is_class_cond and args.num_classes is not None:
        model_kwargs["num_classes"] = args.num_classes
    if args.bf16_params:
        # store params in bf16 (release-checkpoint layout): halves param HBM,
        # which is what lets the 5B/7B configs run inference on one chip
        model_kwargs["param_dtype"] = jnp.bfloat16
    if not is_class_cond:
        if args.cap_feat_dim is not None:
            model_kwargs["cap_feat_dim"] = args.cap_feat_dim
        elif train_args.get("cap_feat_dim"):
            model_kwargs["cap_feat_dim"] = int(train_args["cap_feat_dim"])
        elif "FlagDiT" not in args.model:
            # Gemma-2B width, the lumina_next default; FlagDiT configs keep
            # their own registry default (4096, LLaMA-2-7B features).
            model_kwargs["cap_feat_dim"] = 2048
    if train_args.get("qk_norm"):
        model_kwargs["qk_norm"] = True
    model = get_model(args.model, **model_kwargs)

    manifest = {"args": vars(args), "items": []}
    info_path = os.path.join(args.image_save_path, "data.json")

    if is_class_cond:
        labels = [int(x) for x in (args.labels or "207,360,387,974").split(",")]
        cat, w, h = parse_resolution(args.resolution[0])
        latent = w if args.pixel_space else w // 8
        chans = 3 if args.pixel_space else 4
        y = jnp.asarray(labels, jnp.int32)
        x_init = jnp.zeros((1, chans, latent, latent))
        t0 = jnp.zeros((1,))
        # keyword y: class-cond FlagDiT shares the text signature where the
        # third positional slot is cap_feats (see imagenet forward_with_cfg)
        variables = jax.jit(model.init)(rng, x_init, t0, y=y[:1])
        if args.ckpt and not args.debug:
            import orbax.checkpoint as ocp

            variables = {"params": ocp.StandardCheckpointer().restore(
                os.path.join(os.path.abspath(args.ckpt), "ema"), variables["params"]
            )}
        variables = _maybe_shard_params(args, variables)
        sample_fn = jax.jit(build_class_cond_sample_fn(
            model, num_steps=args.num_sampling_steps, solver=args.solver,
            cfg_scale=args.cfg_scale, latent_size=latent, in_channels=chans,
            time_shifting_factor=args.time_shifting_factor
            if args.time_shifting_factor != 1.0 else None,
        ))
        if args.num_fid_samples > 0:
            path = _sample_fid_npz(args, model, variables, sample_fn, rng)
            manifest["items"].append({"fid_npz": path, "n": args.num_fid_samples})
        else:
            t_start = time.time()
            latents = sample_fn(variables, rng, y)
            jax.block_until_ready(latents)
            _save_outputs(latents, args, manifest, [str(l) for l in labels])
            print(f"sampled {len(labels)} class-conditional images in "
                  f"{time.time() - t_start:.2f}s")
    else:
        prompts = ["a photo of an astronaut riding a horse"]
        if args.caption_path:
            if not os.path.exists(args.caption_path):
                raise SystemExit(f"error: --caption_path file not found: {args.caption_path}")
            with open(args.caption_path) as f:
                prompts = [l.strip() for l in f if l.strip()]
        if args.text_encoder and not args.debug:
            from ..codecs.text_encoders import DecoderTextEncoder

            enc = DecoderTextEncoder.from_pretrained(args.text_encoder, dtype=dtype)
            cap_feats, cap_mask = enc.encode(prompts + [""] * len(prompts))
        else:
            # debug: random caption features (the reference's --debug skips
            # checkpoint loading but still runs Gemma; offline we synthesize)
            ly = 32
            cap_dim = getattr(model, "cap_feat_dim", args.cap_feat_dim or 2048)
            cap_feats = jax.random.normal(rng, (2 * len(prompts), ly, cap_dim))
            cap_mask = jnp.ones((2 * len(prompts), ly), jnp.int32)

        for res in args.resolution:
            cat, w, h = parse_resolution(res)
            # extrapolation mechanisms (scale_factor, proportional attn)
            # engage iff the AREA exceeds train_res^2 — the same derivation
            # build_t2i_sample_fn makes internally, and numerically what the
            # reference does too (its category flag only gates quantities
            # that are neutral at train-res area: sqrt(area/train^2)=1,
            # log_base(base_seqlen)=1). The category prefix is carried for
            # manifest/naming parity only.
            do_extrap = (w * h > args.train_res**2)
            x_init = jnp.zeros((2, 4, h // 8, w // 8))
            t0 = jnp.zeros((2,))
            variables = jax.jit(model.init)(rng, x_init, t0, cap_feats[:2], cap_mask[:2])
            if args.ckpt and not args.debug:
                import orbax.checkpoint as ocp

                variables = {"params": ocp.StandardCheckpointer().restore(
                    os.path.join(os.path.abspath(args.ckpt), "ema"), variables["params"]
                )}
            variables = _maybe_shard_params(args, variables)
            bound = autocalibrate_flash_static_max(
                model, variables, cap_feats, cap_mask, width=w, height=h,
                cfg_scale=args.cfg_scale,
                time_shifting_factor=args.time_shifting_factor,
                train_res=args.train_res, scale_watershed=args.scaling_watershed,
                proportional_attn=args.proportional_attn or do_extrap,
            )
            if bound is not None:
                print(f"flash static-max calibrated: {bound:.2f}")
            sample_fn = jax.jit(build_t2i_sample_fn(
                model, width=w, height=h, num_steps=args.num_sampling_steps,
                solver=args.solver, cfg_scale=args.cfg_scale,
                time_shifting_factor=args.time_shifting_factor,
                train_res=args.train_res, scale_watershed=args.scaling_watershed,
                proportional_attn=args.proportional_attn or do_extrap,
                atol=args.atol, rtol=args.rtol,
            ))
            t_start = time.time()
            latents = sample_fn(variables, rng, cap_feats, cap_mask)
            jax.block_until_ready(latents)
            _save_outputs(latents, args, manifest, prompts, res_tag=f"{w}x{h}")
            print(f"sampled {len(prompts)} prompts at {w}x{h} in {time.time() - t_start:.2f}s")

    with open(info_path, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    return manifest


def _sample_fid_npz(args, model, variables, sample_fn, rng):
    """Batch-sample N images over uniform random classes and dump the
    ADM-evaluator npz format (`arr_0` uint8 (N, H, W, 3)) — the reference's
    ImageNet FID workflow (`Next-DiT-ImageNet/README.md:19-22` tables are
    computed by OpenAI's evaluator over such an npz). Without VAE weights the
    latents are saved instead (`arr_0` float32 (N, C, h, w))."""
    n = args.num_fid_samples
    b = max(args.batch_size, 1)
    rng_np = np.random.default_rng(args.seed)
    decode = None
    if args.vae_ckpt:
        from ..codecs.vae import decode_from_latent, load_vae

        vae, vv = load_vae(args.vae_ckpt)
        decode = jax.jit(lambda z: decode_from_latent(vae, vv, z, args.vae))

    out_batches = []
    label_batches = []
    done = 0
    while done < n:
        labels = jnp.asarray(rng_np.integers(0, model.num_classes, (b,)), jnp.int32)
        label_batches.append(np.asarray(labels, np.int64))
        latents = sample_fn(variables, jax.random.fold_in(jax.random.PRNGKey(args.seed), done),
                            labels)
        if decode is not None:
            imgs = np.asarray(decode(latents))
            imgs = np.clip((imgs + 1) / 2 * 255, 0, 255).astype(np.uint8).transpose(0, 2, 3, 1)
            out_batches.append(imgs)
        elif getattr(args, "pixel_space", False):
            imgs = np.asarray(latents, np.float32)
            imgs = np.clip((imgs + 1) / 2 * 255, 0, 255).astype(np.uint8).transpose(0, 2, 3, 1)
            out_batches.append(imgs)
        else:
            out_batches.append(np.asarray(latents, np.float32))
        done += b
        if done % max(b * 10, 1) == 0:
            print(f"fid sampling: {done}/{n}")
    arr = np.concatenate(out_batches)[:n]
    path = os.path.join(args.image_save_path, f"samples_{n}x{arr.shape[1]}x{arr.shape[2]}.npz")
    # arr_1 = class labels (the ADM evaluator's class-cond npz layout)
    np.savez(path, arr_0=arr, arr_1=np.concatenate(label_batches)[:n])
    print(f"saved FID batch to {path}")
    return path


def _save_outputs(latents, args, manifest, names: List[str], res_tag: str = ""):
    latents = np.asarray(latents, np.float32)
    if args.vae_ckpt:
        from ..codecs.vae import load_vae

        vae, vv = load_vae(args.vae_ckpt)
    for i, name in enumerate(names[: latents.shape[0]]):
        slug = "".join(c if c.isalnum() else "_" for c in name)[:64]
        if args.vae_ckpt:
            from ..codecs.vae import decode_from_latent
            from PIL import Image

            img = decode_from_latent(vae, vv, latents[i: i + 1], args.vae)[0]
            img = np.clip((np.asarray(img) + 1) / 2 * 255, 0, 255).astype(np.uint8)
            out = os.path.join(args.image_save_path, f"{slug}_{res_tag}.png")
            Image.fromarray(img.transpose(1, 2, 0)).save(out)
        elif getattr(args, "pixel_space", False):
            from PIL import Image

            img = np.clip((latents[i] + 1) / 2 * 255, 0, 255).astype(np.uint8)
            out = os.path.join(args.image_save_path, f"{slug}_{res_tag}.png")
            Image.fromarray(img.transpose(1, 2, 0)).save(out)
        else:
            out = os.path.join(args.image_save_path, f"{slug}_{res_tag}.npy")
            np.save(out, latents[i])
        manifest["items"].append({"name": name, "path": out, "resolution": res_tag,
                                  "solver": args.solver, "steps": args.num_sampling_steps,
                                  "cfg_scale": args.cfg_scale, "seed": args.seed})


if __name__ == "__main__":
    main()
