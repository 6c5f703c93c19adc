"""Visual anagrams generation + animation apps.

Counterparts of `visual_anagrams/generate.py` (two-phase multi-view illusion
sampling with 256 -> high-res upscale) and
`visual_anagrams/visual_anagrams/animate.py:48-179` (GIF morphs between
views).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import get_model
from ..models.next_dit import forward_with_cfg
from ..transport.solvers import time_shift
from .anagrams import (
    anagram_init_phase,
    anagram_upscale_phase,
    get_anagrams_views,
    tiled_decode,
    tiled_encode,
)

NEGATIVE_CAP = (
    "blurry, worst quality, low quality, normal quality, lowres, monochrome, grayscale"
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="visual anagrams (TPU)")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--model", type=str, default="NextDiT_2B_patch2")
    p.add_argument("--prompts", type=str, nargs="+", required=True)
    p.add_argument("--views", type=str, nargs="+", required=True)
    p.add_argument("--style", type=str, default="")
    p.add_argument("--save_dir", type=str, default="anagram_out")
    p.add_argument("--name", type=str, default="illusion")
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--cfg_scale", type=float, default=4.0)
    p.add_argument("--time_shifting_factor", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--base_res", type=int, default=256)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--proportional_attn", action="store_true")
    p.add_argument("--scaling_watershed", type=float, default=0.3)
    p.add_argument("--vae_ckpt", type=str, default=None,
                   help="diffusers VAE weights: decodes the saved outputs to "
                        "pixels and enables the phase-2 pixel-space upsample")
    p.add_argument("--text_encoder", type=str, default=None,
                   help="HF path of the caption LM (as in sample.py); without "
                        "it caption features are deterministic pseudo-features")
    p.add_argument("--train_res", type=int, default=1024,
                   help="the checkpoint's training resolution (RoPE scaling "
                        "reference for the phase-2 extrapolation)")
    p.add_argument("--kv_merge_ratio", type=int, default=1,
                   help="AvgPool K/V over the token grid in the upscale phase "
                        "(the fork's kv_merge trick; 1 = off, as upstream)")
    p.add_argument("--debug", action="store_true")
    return p.parse_args(argv)


def generate_anagram(model, variables, cap_feats_list, cap_mask_list, views, *,
                     base_latent: int = 32, num_steps: int = 30, cfg_scale: float = 4.0,
                     time_shifting_factor: Optional[float] = 4.0, seed: int = 0,
                     upscale_latent: Optional[int] = None,
                     vae_encode_fn=None, vae_decode_fn=None,
                     proportional_attn: bool = False, base_seqlen: Optional[int] = None,
                     scale_factor: float = 1.0, scale_watershed: float = 1.0,
                     kv_merge_ratio: int = 1, train_res: int = 1024):
    """Two-phase illusion generation (`generate.py:357-498`). Returns
    (phase-1 latents, phase-2 latents or None)."""
    rng = jax.random.PRNGKey(seed)
    ts = jnp.linspace(0.0, 1.0, num_steps)
    if time_shifting_factor:
        ts = time_shift(ts, time_shifting_factor)

    def make_fn(cap_feats, cap_mask, **extra):
        def fn(x, t):
            return forward_with_cfg(model, variables, x, t, cap_feats, cap_mask,
                                    cfg_scale, **extra)
        return fn

    # the anagrams fork replaces the proportional scale with
    # log_base(seqlen)/sqrt(d) (`visual_anagrams/models/nextdit.py:333`) and
    # optionally AvgPools K/V (`kv_merge`, off by default upstream); inert at
    # the defaults (proportional off, ratio 1), so phase 1 stays faithful
    extra = dict(
        proportional_attn=proportional_attn, base_seqlen=base_seqlen,
        scale_factor=scale_factor, scale_watershed=scale_watershed,
        attn_scale_variant="anagram", kv_merge_ratio=kv_merge_ratio,
    )
    model_fns = [make_fn(cf, cm, kv_merge_ratio=kv_merge_ratio)
                 for cf, cm in zip(cap_feats_list, cap_mask_list)]
    z = jax.random.normal(rng, (1, 4, base_latent, base_latent))
    z = jnp.concatenate([z, z], axis=0)
    phase1 = anagram_init_phase(model_fns, views, z, ts)

    if upscale_latent is None:
        return phase1[:1], None

    # Phase 2: decode -> bicubic upsample -> re-encode (tiled) -> guided loop
    assert vae_encode_fn is not None and vae_decode_fn is not None
    img = vae_decode_fn(phase1[:1])
    h = w = upscale_latent * 8
    img_up = jax.image.resize(img.astype(jnp.float32), (1, 3, h, w), method="bicubic")
    guidance = tiled_encode(vae_encode_fn, img_up)
    guidance = jnp.concatenate([guidance, guidance], axis=0)

    # derive the static-max flash bound for the long-seq upscale phase (the
    # base phase's 256-token attention lives in the single-pass kernel). The
    # probe uses the first view's captions; the +margin headroom covers the
    # other views' prompts (same encoder, same weights).
    from .sample_lib import autocalibrate_flash_static_max

    autocalibrate_flash_static_max(
        model, variables, cap_feats_list[0], cap_mask_list[0],
        width=w, height=h, cfg_scale=cfg_scale,
        time_shifting_factor=time_shifting_factor,
        scale_watershed=scale_watershed, proportional_attn=proportional_attn,
        attn_scale_variant="anagram", kv_merge_ratio=kv_merge_ratio,
    )
    # phase 2 runs at its own resolution: when it exceeds the TRAINING
    # resolution, apply the time-aware RoPE scaling every other sampling
    # path uses (`sample_lib.py` resolution_scale_factor) — phase 1's
    # sub-train-res settings must not leak into the hi-res loop
    from .sample_lib import resolution_scale_factor

    do_extrap = (h * w) > (train_res * train_res)
    extra_hi = dict(
        extra,
        scale_factor=resolution_scale_factor(w, h, train_res) if do_extrap else 1.0,
        scale_watershed=scale_watershed if do_extrap else 1.0,
        proportional_attn=proportional_attn and do_extrap,
        base_seqlen=(train_res // 16) ** 2,
    )
    model_fns_hi = [make_fn(cf, cm, **extra_hi) for cf, cm in zip(cap_feats_list, cap_mask_list)]
    z2 = jax.random.normal(jax.random.fold_in(rng, 1), (1, 4, upscale_latent, upscale_latent))
    z2 = jnp.concatenate([z2, z2], axis=0)
    phase2 = anagram_upscale_phase(model_fns_hi, views, z2, guidance, ts)
    return phase1[:1], phase2[:1]


def save_illusion(latents_or_img, views, sample_dir: str, tag: str = "",
                  pixel: bool = False):
    """Save the base image plus every viewed variant (`generate.py` /
    `utils.py:8-156`). pixel=True: input is decoded RGB in [-1, 1] (exact
    mapping); pixel=False: latents, saved as min-max channel previews (the
    no-VAE fallback)."""
    os.makedirs(sample_dir, exist_ok=True)
    arr = np.asarray(latents_or_img, np.float32)
    from PIL import Image

    def to_img(a):
        a = a[:3]
        if pixel:
            a = np.clip((a + 1.0) / 2.0, 0.0, 1.0)
        else:
            a = (a - a.min()) / (a.max() - a.min() + 1e-6)
        return Image.fromarray((a.transpose(1, 2, 0) * 255).astype(np.uint8))

    paths = []
    for i, view in enumerate(views):
        viewed = np.asarray(view.view(jnp.asarray(arr[0])))
        path = os.path.join(sample_dir, f"view_{i}{tag}.png")
        to_img(viewed).save(path)
        paths.append(path)
    return paths


def animate_two_view(img_a, img_b, save_path: str, num_frames: int = 30,
                     hold_frames: int = 10):
    """GIF morph between two views (`animate.py:48-179`): hold A, crossfade
    to B, hold B, fade back."""
    from PIL import Image

    a = np.asarray(img_a, np.float32)
    b = np.asarray(img_b, np.float32)
    frames = []
    for _ in range(hold_frames):
        frames.append(a)
    for i in range(num_frames):
        alpha = (i + 1) / num_frames
        frames.append((1 - alpha) * a + alpha * b)
    for _ in range(hold_frames):
        frames.append(b)
    for i in range(num_frames):
        alpha = (i + 1) / num_frames
        frames.append((1 - alpha) * b + alpha * a)
    pil = [Image.fromarray(np.clip(f, 0, 255).astype(np.uint8)) for f in frames]
    pil[0].save(save_path, save_all=True, append_images=pil[1:], duration=50, loop=0)
    return save_path


def main(argv=None):
    from ..core import enable_compile_cache

    enable_compile_cache()
    args = parse_args(argv)
    assert len(args.prompts) == len(args.views), "Number of prompts must match number of views"
    views = get_anagrams_views(args.views)

    dtype = jnp.bfloat16 if not args.debug else jnp.float32
    model = get_model(args.model, cap_feat_dim=2048, qk_norm=True, dtype=dtype)
    rng = jax.random.PRNGKey(args.seed)

    base_latent = args.base_res // 8
    x0 = jnp.zeros((2, 4, base_latent, base_latent))
    cap_feats_list, cap_mask_list = [], []
    if args.text_encoder:
        from ..codecs.text_encoders import DecoderTextEncoder

        enc = DecoderTextEncoder.from_pretrained(args.text_encoder, dtype=dtype)
        for p in args.prompts:
            text = f"{args.style} {p}".strip()
            feats, mask = enc.encode([text, NEGATIVE_CAP])
            cap_feats_list.append(jnp.asarray(feats))
            cap_mask_list.append(jnp.asarray(mask))
    else:
        # deterministic pseudo-features: crc32 (stable across processes —
        # python's str hash() is salted per interpreter, which would make
        # identical --seed runs produce different conditioning)
        import zlib

        ly = 32
        for p in args.prompts:
            text = f"{args.style} {p}".strip()
            feats = jnp.stack([
                jax.random.normal(
                    jax.random.fold_in(rng, zlib.crc32(t.encode()) & 0x7FFFFFFF),
                    (ly, 2048))
                for t in (text, NEGATIVE_CAP)
            ])
            cap_feats_list.append(feats)
            cap_mask_list.append(jnp.ones((2, ly), jnp.int32))

    variables = jax.jit(model.init)(rng, x0, jnp.zeros((2,)),
                                    cap_feats_list[0], cap_mask_list[0])
    if args.ckpt:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.join(os.path.abspath(args.ckpt), "ema"), variables["params"]
        )
        variables = {"params": restored}
    # Phase 2 (reference `generate.py:357-498` two-stage 256 -> 1024): needs
    # pixel-space decode/upsample/re-encode. With --vae_ckpt the real VAE is
    # used; in --debug latent stand-ins (nearest-resize decode / avg-pool
    # encode) exercise the identical flow without weights.
    upscale_latent = args.resolution // 8 if args.resolution > args.base_res else None
    vae_encode_fn = vae_decode_fn = None
    real_vae = bool(args.vae_ckpt)
    if args.vae_ckpt:
        from ..codecs.vae import decode_from_latent, encode_to_latent, load_vae

        vae, vv = load_vae(args.vae_ckpt)
        vae_decode_fn = jax.jit(lambda z: decode_from_latent(vae, vv, z))
        vae_encode_fn = jax.jit(lambda x: encode_to_latent(
            vae, vv, x, jax.random.PRNGKey(0)))
    if upscale_latent and not args.vae_ckpt:
        if args.debug:
            # latent stand-ins: exercise the identical phase-2 flow
            # (decode -> upsample -> tiled re-encode) without VAE weights
            def vae_decode_fn(z):
                return jax.image.resize(z[:, :3].astype(jnp.float32),
                                        (z.shape[0], 3, z.shape[2] * 8, z.shape[3] * 8),
                                        method="nearest")

            def vae_encode_fn(img):
                b, c, h, w = img.shape
                z = img.reshape(b, c, h // 8, 8, w // 8, 8).mean((3, 5))
                return jnp.concatenate([z, z[:, :1]], axis=1)
        else:
            # silently producing "hi-res" outputs guided by a fake VAE
            # round-trip would waste a long run; keep phase 1 only
            print("warning: --resolution > --base_res needs --vae_ckpt for the "
                  "phase-2 upsample (or --debug for the stand-in flow); "
                  "running phase 1 only")
            upscale_latent = None

    phase1, phase2 = generate_anagram(
        model, variables, cap_feats_list, cap_mask_list, views,
        base_latent=base_latent, num_steps=args.num_inference_steps,
        cfg_scale=args.cfg_scale, time_shifting_factor=args.time_shifting_factor,
        seed=args.seed, proportional_attn=args.proportional_attn,
        base_seqlen=(args.base_res // 16) ** 2,
        scale_watershed=args.scaling_watershed,
        kv_merge_ratio=args.kv_merge_ratio,
        upscale_latent=upscale_latent,
        vae_encode_fn=vae_encode_fn, vae_decode_fn=vae_decode_fn,
        train_res=args.train_res,
    )
    sample_dir = os.path.join(args.save_dir, args.name, f"{args.seed:04d}")
    if real_vae:
        # decode to pixels before saving — latent channel previews are only
        # the no-VAE fallback (phase 2 may exceed the VAE's comfortable
        # window: tile it)
        from .anagrams import tiled_decode

        phase1 = vae_decode_fn(phase1)
        if phase2 is not None:
            phase2 = tiled_decode(vae_decode_fn, phase2)
    paths = save_illusion(phase1, views, sample_dir, pixel=real_vae)
    if phase2 is not None:
        paths += save_illusion(phase2, views, sample_dir, tag="_hires", pixel=real_vae)
    print(f"saved {len(paths)} views to {sample_dir}")
    return paths


if __name__ == "__main__":
    main()
