"""Image-to-image (SDEdit-style) sampling application.

Counterpart of `lumina_next_t2i_mini/sample_img2img.py:166-191`: VAE-encode
the input image, start the ODE from `z * (1 - t0) + x1 * t0` with the
schedule truncated to [t0, 1] where t0 = 1 - strength
(`lumina_next_t2i_mini/transport.py:79-80`).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import get_model
from .sample_lib import autocalibrate_flash_static_max, build_img2img_sample_fn


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="lumina img2img (TPU)")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--model", type=str, default="NextDiT_2B_patch2")
    p.add_argument("--image_path", type=str, required=True)
    p.add_argument("--caption", type=str, default="")
    p.add_argument("--strength", type=float, default=0.6)
    p.add_argument("--num_sampling_steps", type=int, default=30)
    p.add_argument("--solver", type=str, default="midpoint")
    p.add_argument("--cfg_scale", type=float, default=4.0)
    p.add_argument("--time_shifting_factor", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image_save_path", type=str, default="img2img_out")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--precision", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--text_encoder", type=str, default=None)
    p.add_argument("--debug", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    from ..core import enable_compile_cache

    enable_compile_cache()
    args = parse_args(argv)
    os.makedirs(args.image_save_path, exist_ok=True)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    rng = jax.random.PRNGKey(args.seed)

    from PIL import Image

    from ..data.imgproc import center_crop_arr, to_latent_input

    img = center_crop_arr(Image.open(args.image_path).convert("RGB"), args.image_size)
    pixels = jnp.asarray(to_latent_input(img))[None]

    # encode to latents
    if args.vae_ckpt:
        from ..codecs.vae import encode_to_latent, load_vae

        vae, vv = load_vae(args.vae_ckpt, dtype=dtype)
        x1 = encode_to_latent(vae, vv, pixels, jax.random.fold_in(rng, 1))
    else:
        b, c, h, w = pixels.shape
        pooled = pixels.reshape(b, c, h // 8, 8, w // 8, 8).mean((3, 5))
        x1 = jnp.concatenate([pooled, pooled[:, :1]], axis=1)  # latent stand-in

    cap_feat_dim = 2048
    if args.text_encoder and not args.debug:
        from ..codecs.text_encoders import DecoderTextEncoder

        enc = DecoderTextEncoder.from_pretrained(args.text_encoder, dtype=dtype)
        cap_feats, cap_mask = enc.encode([args.caption, ""])
        cap_feat_dim = enc.hidden_size
    else:
        ly = 32
        cap_feats = jax.random.normal(rng, (2, ly, cap_feat_dim))
        cap_mask = jnp.ones((2, ly), jnp.int32)

    model = get_model(args.model, cap_feat_dim=cap_feat_dim, dtype=dtype, qk_norm=True)
    t0 = jnp.zeros((2,))
    x_pair = jnp.concatenate([x1, x1], axis=0)
    variables = jax.jit(model.init)(rng, x_pair, t0, cap_feats, cap_mask)
    if args.ckpt and not args.debug:
        import orbax.checkpoint as ocp

        variables = {"params": ocp.StandardCheckpointer().restore(
            os.path.join(os.path.abspath(args.ckpt), "ema"), variables["params"]
        )}

    autocalibrate_flash_static_max(
        model, variables, cap_feats, cap_mask,
        width=x1.shape[3] * 8, height=x1.shape[2] * 8,
        cfg_scale=args.cfg_scale,
        time_shifting_factor=args.time_shifting_factor,
    )
    sample_fn = jax.jit(build_img2img_sample_fn(
        model, strength=args.strength, num_steps=args.num_sampling_steps,
        solver=args.solver, cfg_scale=args.cfg_scale,
        time_shifting_factor=args.time_shifting_factor,
    ))
    out = sample_fn(variables, jax.random.fold_in(rng, 2), x1, cap_feats, cap_mask)
    jax.block_until_ready(out)

    if args.vae_ckpt:
        # decode to pixels (the raw output is a scaled LATENT — useless to a
        # viewer); same contract as sample.py/sample_sd3.py PNG outputs
        from PIL import Image

        from ..codecs.vae import decode_from_latent

        img = np.asarray(decode_from_latent(vae, vv, out))
        img = np.clip((img + 1.0) / 2.0, 0.0, 1.0)
        out_path = os.path.join(args.image_save_path, "img2img.png")
        Image.fromarray((img[0].transpose(1, 2, 0) * 255).astype(np.uint8)).save(out_path)
    else:
        out_path = os.path.join(args.image_save_path, "img2img.npy")
        np.save(out_path, np.asarray(out))
    with open(os.path.join(args.image_save_path, "data.json"), "w") as f:
        json.dump({"args": vars(args), "output": out_path}, f, indent=2, default=str)
    print(f"saved {out_path}")
    return out_path


if __name__ == "__main__":
    main()
