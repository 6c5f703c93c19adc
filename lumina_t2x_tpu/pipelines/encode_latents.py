"""Offline latent / caption-feature pre-encoding tool.

Pre-computes VAE latents and frozen-LM caption features for a dataset so the
training loop skips the frozen encoders entirely (the reference re-runs the
VAE and Gemma on every batch, `lumina_next_t2i/train.py:537-547` — at scale
that wastes accelerator time the denoiser could use). Output layout matches
the npy pipelines (`train_audio.npy_audio_batches` convention):

  <out>/latents/<id>.npy     float32 (C, h, w)  (or (C, T) for audio mels)
  <out>/captions/<id>.npy    float32 (L, D)
  <out>/index.json           id -> {caption, shape}
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import stable_text_seed


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="pre-encode latents + caption features")
    p.add_argument("--data_path", type=str, required=True, help="yaml meta config")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--vae", type=str, choices=["ema", "mse", "sdxl", "sd3"], default="ema")
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--text_encoder", type=str, default=None)
    p.add_argument("--max_caption_len", type=int, default=256)
    p.add_argument("--limit", type=int, default=0, help="0 = all items")
    p.add_argument("--precision", choices=["fp32", "bf16"], default="bf16")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..core import enable_compile_cache

    enable_compile_cache()
    os.makedirs(os.path.join(args.out, "latents"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "captions"), exist_ok=True)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    from ..data.dataset import MetaDataset, T2IItemProcessor
    from ..data.imgproc import generate_crop_size_list, to_latent_input, var_center_crop

    crop_list = generate_crop_size_list((args.image_size // 16) ** 2, 16)
    dataset = MetaDataset(args.data_path,
                          T2IItemProcessor(lambda im: var_center_crop(im, crop_list)))

    # VAE (random init in smoke mode)
    from ..codecs.vae import AutoencoderKL, encode_to_latent

    vae = AutoencoderKL(dtype=dtype)
    if args.vae_ckpt:
        from ..codecs.vae import load_vae

        vae, vv = load_vae(args.vae_ckpt, dtype=dtype)
    else:
        vv = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(1))

    encode = jax.jit(lambda x, rng: encode_to_latent(vae, vv, x, rng, args.vae))

    text_encoder = None
    if args.text_encoder:
        from ..codecs.text_encoders import DecoderTextEncoder

        text_encoder = DecoderTextEncoder.from_pretrained(
            args.text_encoder, dtype=dtype, max_length=args.max_caption_len
        )

    index = {}
    n = len(dataset) if args.limit == 0 else min(args.limit, len(dataset))
    rng = jax.random.PRNGKey(0)
    for i in range(n):
        img, caption = dataset[i]
        arr = to_latent_input(img)[None]
        z = np.asarray(encode(jnp.asarray(arr), jax.random.fold_in(rng, i))[0], np.float32)
        np.save(os.path.join(args.out, "latents", f"{i}.npy"), z)
        if text_encoder is not None:
            feats, mask = text_encoder.encode([caption])
            feats = np.asarray(feats[0], np.float32)[: int(np.asarray(mask[0]).sum())]
        else:
            feats = np.random.default_rng(stable_text_seed(caption)).standard_normal(
                (32, 2048)).astype(np.float32)
        np.save(os.path.join(args.out, "captions", f"{i}.npy"), feats)
        index[str(i)] = {"caption": caption, "latent_shape": list(z.shape)}
        if (i + 1) % 100 == 0:
            print(f"encoded {i + 1}/{n}")

    with open(os.path.join(args.out, "index.json"), "w") as f:
        json.dump(index, f, indent=2)
    print(f"encoded {n} items -> {args.out}")
    return args.out


if __name__ == "__main__":
    main()
