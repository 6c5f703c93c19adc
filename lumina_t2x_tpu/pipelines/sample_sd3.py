"""SD3 (MMDiT) sampler through the flow framework.

Counterpart of `lumina_next_t2i_mini/sample_sd3.py:30-140`: drives an
SD3-medium MMDiT with the mini ODE in SD3 mode — reversed time, t*1000
timestep convention, in-loop CFG over duplicated halves — then decodes with
the SD3 VAE (scale 1.5305, shift 0.0609).

The reference pulls `StableDiffusion3Pipeline` from the hub; here the
transformer weights load from a local diffusers-format `.safetensors` via
`codecs/mmdit_import.import_sd3_mmdit_weights`, and `--debug` runs the
randomly-initialized pipeline end-to-end (the reference's `--debug` idiom,
`sample.py:131-142`). Prompt encoding runs the real CLIP-L + CLIP-G (+ T5)
triple encoder (`codecs/clip_text.SD3PromptEncoder`, the TPU-native
`pipe.encode_prompt`, `sample_sd3.py:95-100`) when `--clip_l`/`--clip_g`
point at local HF model dirs; `--debug` (or absent towers) substitutes
deterministic random features of the same shape contract.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import get_model
from ..transport.mini import MiniODE

SD3_VAE_SCALE = 1.5305
SD3_VAE_SHIFT = 0.0609


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SD3 MMDiT sampler (TPU)")
    p.add_argument("--ckpt", type=str, default=None,
                   help="diffusers-format SD3 transformer .safetensors")
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--clip_l", type=str, default=None,
                   help="local HF dir for the CLIP-L text tower "
                        "(SD3 `text_encoder` subfolder)")
    p.add_argument("--clip_g", type=str, default=None,
                   help="local HF dir for the CLIP-G text tower "
                        "(SD3 `text_encoder_2` subfolder)")
    p.add_argument("--t5", type=str, default=None,
                   help="local HF dir for the T5 encoder (`text_encoder_3`); "
                        "optional — diffusers' zeros fallback applies")
    p.add_argument("--caption_path", type=str, required=True)
    p.add_argument("--image_save_path", type=str, default="samples_sd3")
    p.add_argument("--resolution", type=str, nargs="+", default=["1:1024x1024"])
    p.add_argument("--num_sampling_steps", type=int, default=28)
    p.add_argument("--solver", type=str, default="euler",
                   choices=["euler", "midpoint", "heun", "rk4"])
    p.add_argument("--cfg_scale", type=float, default=7.0)
    p.add_argument("--time_shifting_factor", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precision", type=str, default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--debug", action="store_true")
    return p.parse_args(argv)


def load_model(args, dtype):
    model = get_model("MMDiT_SD3_Medium", dtype=dtype)
    # shapes for init
    z = jnp.zeros((2, 16, 32, 32))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 77, 4096))
    pooled = jnp.zeros((2, 2048))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), z, t, ctx, pooled)["params"]
    if args.ckpt and not args.debug:
        from ..codecs.mmdit_import import import_sd3_mmdit_weights
        from ..core import load_torch_state_dict

        sd = load_torch_state_dict(args.ckpt)
        params = import_sd3_mmdit_weights(sd, n_layers=model.n_layers)
    return model, {"params": params}


def build_prompt_encoder(args, dtype=jnp.float32):
    """The CLIP-L + CLIP-G (+ T5) triple encoder: real towers with loaded
    weights when `--clip_l`/`--clip_g` point at local HF model dirs, else
    (`--debug` / towers absent) the same encode path over tiny random towers
    (`codecs/clip_text.build_sd3_prompt_encoder`)."""
    from ..codecs.clip_text import build_sd3_prompt_encoder

    return build_sd3_prompt_encoder(args.clip_l, args.clip_g, args.t5,
                                    debug=args.debug, dtype=dtype)


def main(argv=None):
    from ..core import enable_compile_cache

    enable_compile_cache()
    args = parse_args(argv)
    if not os.path.exists(args.caption_path):
        raise SystemExit(f"error: --caption_path file not found: {args.caption_path}")
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    model, variables = load_model(args, dtype)

    os.makedirs(os.path.join(args.image_save_path, "images"), exist_ok=True)
    info_path = os.path.join(args.image_save_path, "data.json")
    info = json.load(open(info_path)) if os.path.exists(info_path) else []
    collected = {f'{i["idx"]}_{i["resolution"]}' for i in info}

    with open(args.caption_path, encoding="utf-8") as f:
        captions = [line.strip() for line in f if line.strip()]

    vae_decode = None
    if args.vae_ckpt and not args.debug:
        from ..codecs.vae import load_vae

        # SD3's 16-channel VAE has no quant convs (use_quant_conv=False)
        vae, vv = load_vae(args.vae_ckpt, z_channels=16, use_quant_conv=False)
        vae_decode = jax.jit(lambda z: vae.apply(vv, z, method=vae.decode))

    prompt_encoder = build_prompt_encoder(args)
    if args.ckpt and not args.debug and not (args.clip_l and args.clip_g):
        # towers not mounted: conditioning falls back to the debug towers —
        # loud, because with real transformer weights the outputs are then
        # prompt-UNRELATED
        print("warning: --clip_l/--clip_g not given; prompts are encoded "
              "by random debug towers (images will not follow the captions). "
              "Pass the SD3 text_encoder/text_encoder_2 (and optionally "
              "--t5) dirs to sample real SD3 outputs.")

    ode = MiniODE(args.num_sampling_steps, args.solver, args.time_shifting_factor,
                  use_sd3=True)

    for res in args.resolution:
        _, wh = res.split(":")
        w, h = (int(v) for v in wh.split("x"))
        for idx, caption in enumerate(captions):
            sid = f"{idx}_{wh}"
            if sid in collected:
                continue
            # per-caption noise derived from the explicit seed: distinct
            # compositions per prompt AND reproducible runs (seed 0 included)
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), idx)
            z = jax.random.normal(rng, (1, 16, h // 8, w // 8), jnp.float32)
            z = jnp.concatenate([z, z], axis=0)
            context, pooled = prompt_encoder.encode_cfg_pair(caption)

            def model_fn(x, t):
                return model.apply(variables, x, t, context, pooled)

            samples = ode.sample(z, model_fn, cfg_scale=args.cfg_scale)[:1]
            out_path = os.path.join(args.image_save_path, "images", f"{sid}.npy")
            if vae_decode is not None:
                img = vae_decode(samples / SD3_VAE_SCALE + SD3_VAE_SHIFT)
                img = np.asarray((img + 1.0) / 2.0).clip(0.0, 1.0)
                from PIL import Image

                out_path = out_path.replace(".npy", ".png")
                Image.fromarray(
                    (img[0].transpose(1, 2, 0) * 255).astype(np.uint8)
                ).save(out_path)
            else:
                np.save(out_path, np.asarray(samples[0], np.float32))
            info.append({"idx": idx, "caption": caption, "resolution": wh,
                         "path": out_path, "solver": args.solver,
                         "num_sampling_steps": args.num_sampling_steps,
                         "cfg_scale": args.cfg_scale, "seed": args.seed})
            with open(info_path, "w") as f:
                json.dump(info, f, indent=2)
            print(f"sampled {sid}: {out_path}")


if __name__ == "__main__":
    main()
