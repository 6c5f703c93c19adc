"""Region-controlled compositional generation app.

Counterpart of `lumina_next_compositional_generation/demo.py:139-268`: N
region captions + a global caption; caption features are encoded as
`region_caps + [negative]` with the global caption pooled for adaLN; region
masks form an h_split x w_split grid inside the model forward.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import stable_text_seed

from ..models.compositional import NextDiT_2B_patch2_Compositional, forward_with_cfg
from ..transport import Sampler, create_transport

NEGATIVE_CAP = (
    "blurry, worst quality, low quality, normal quality, lowres, monochrome, grayscale"
)


def build_compositional_sample_fn(model, *, h_split_num: int, w_split_num: int,
                                  latent_h: int, latent_w: int, num_steps: int = 30,
                                  solver: str = "midpoint", cfg_scale: float = 4.0,
                                  time_shifting_factor=4.0):
    transport = create_transport("Linear", "velocity")
    sampler = Sampler(transport)
    ode_fn = sampler.sample_ode(sampling_method=solver, num_steps=num_steps,
                                time_shifting_factor=time_shifting_factor)

    def sample_fn(variables, rng, cap_feats, cap_mask, global_cap_feats, global_cap_mask):
        z = jax.random.normal(rng, (1, 4, latent_h, latent_w))
        z = jnp.concatenate([z, z], axis=0)

        def model_fn(x, t):
            return forward_with_cfg(
                model, variables, x, t, cap_feats, cap_mask, cfg_scale,
                global_cap_feats=global_cap_feats, global_cap_mask=global_cap_mask,
                h_split_num=h_split_num, w_split_num=w_split_num,
            )

        return ode_fn(z, model_fn)[:1]

    return sample_fn


def main(argv=None):
    from ..core import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="compositional generation (TPU)")
    p.add_argument("--region_prompts", type=str, nargs="+", required=True)
    p.add_argument("--global_prompt", type=str, required=True)
    p.add_argument("--h_split_num", type=int, default=1)
    p.add_argument("--w_split_num", type=int, default=4)
    p.add_argument("--resolution", type=str, default="1024x1024")
    p.add_argument("--num_sampling_steps", type=int, default=30)
    p.add_argument("--cfg_scale", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image_save_path", type=str, default="compositional_out")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)

    assert len(args.region_prompts) == args.h_split_num * args.w_split_num

    w, h = (int(v) for v in args.resolution.lower().split("x"))
    dtype = jnp.float32 if args.debug else jnp.bfloat16
    dim_kwargs = dict(cap_feat_dim=2048, dtype=dtype, qk_norm=True)
    model = NextDiT_2B_patch2_Compositional(**dim_kwargs)

    # caption features: regions + negative (`demo.py:188-204`)
    rng = jax.random.PRNGKey(args.seed)
    ly = 32
    all_caps = args.region_prompts + [NEGATIVE_CAP]
    cap_feats = jnp.stack([
        jax.random.normal(jax.random.fold_in(rng, stable_text_seed(c)), (ly, 2048))
        for c in all_caps
    ])
    cap_mask = jnp.ones((len(all_caps), ly), jnp.int32)
    gfeats = jnp.stack([
        jax.random.normal(jax.random.fold_in(rng, stable_text_seed(c)), (ly, 2048))
        for c in (args.global_prompt, NEGATIVE_CAP)
    ])
    gmask = jnp.ones((2, ly), jnp.int32)

    variables = jax.jit(
        model.init, static_argnames=("h_split_num", "w_split_num")
    )(
        rng, jnp.zeros((2, 4, h // 8, w // 8)), jnp.zeros((2,)), cap_feats, cap_mask,
        gfeats, gmask, h_split_num=args.h_split_num, w_split_num=args.w_split_num,
    )
    if args.ckpt and not args.debug:
        import orbax.checkpoint as ocp

        variables = {"params": ocp.StandardCheckpointer().restore(
            os.path.join(os.path.abspath(args.ckpt), "ema"), variables["params"]
        )}
    fn = jax.jit(build_compositional_sample_fn(
        model, h_split_num=args.h_split_num, w_split_num=args.w_split_num,
        latent_h=h // 8, latent_w=w // 8, num_steps=args.num_sampling_steps,
        cfg_scale=args.cfg_scale,
    ))
    out = fn(variables, rng, cap_feats, cap_mask, gfeats, gmask)
    jax.block_until_ready(out)
    os.makedirs(args.image_save_path, exist_ok=True)
    path = os.path.join(args.image_save_path, "compositional.npy")
    np.save(path, np.asarray(out))
    with open(os.path.join(args.image_save_path, "data.json"), "w") as f:
        json.dump({"args": vars(args), "output": path}, f, indent=2, default=str)
    print(f"saved {path}")
    return path


if __name__ == "__main__":
    main()
