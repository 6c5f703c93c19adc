"""128K-token FULL-MODEL forward on one chip (VERDICT r3 #7).

The reference claims 128K-token sequence scaling (`README.md:204`); until now
this repo backed that with a flash-attention *kernel* run at S=131072 only
(NOTES.md scale section). This drives the complete flagship NextDiT-2B
forward — patchify, RoPE grid, scanned blocks with Pallas flash attention,
final adaLN + unpatchify — at S = gh*gw = 512*256 = 131072 image tokens
(a 8192x4096 px image's latent) plus the 256-token caption branch, bf16
params on the real chip, and records tokens/step, ms/step and the compiler's
peak-HBM analysis.

Params are initialized at a tiny latent (Flax param shapes are
input-shape-independent) and reused at the 128K shape, so init cost stays
off the measurement and off HBM churn.

Drive: python exps/longcontext_forward.py [--tokens 131072] [--steps 3]
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


def grid_for_tokens(tokens: int):
    """(gh, gw) with gh*gw == tokens, as square as powers of two allow."""
    import math
    lg = int(math.log2(tokens))
    assert 2 ** lg == tokens, "--tokens must be a power of two"
    gh = 2 ** ((lg + 1) // 2)
    return gh, tokens // gh


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="NextDiT_2B_patch2")
    p.add_argument("--tokens", type=int, default=131072)
    p.add_argument("--cap_len", type=int, default=256)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--remat", action="store_true",
                   help="wrap blocks in jax.checkpoint (irrelevant for pure "
                        "forward; kept for A/B)")
    args = p.parse_args()

    from lumina_t2x_tpu.models import get_model

    model = get_model(
        args.model, cap_feat_dim=2048, qk_norm=True, dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
        attn_impl="flash" if jax.default_backend() != "cpu" else "xla",
        remat=args.remat)
    pch = model.patch_size
    gh, gw = grid_for_tokens(args.tokens)
    h, w = gh * pch, gw * pch  # latent dims

    rng = jax.random.PRNGKey(0)
    tiny = {
        "x": jnp.zeros((1, model.in_channels, 8 * pch, 8 * pch), jnp.float32),
        "t": jnp.zeros((1,), jnp.float32),
        "cap": jnp.zeros((1, args.cap_len, 2048), jnp.float32),
        "mask": jnp.ones((1, args.cap_len), jnp.int32),
    }
    variables = jax.jit(model.init)(
        {"params": rng, "label_dropout": jax.random.PRNGKey(1)},
        tiny["x"], tiny["t"], tiny["cap"], tiny["mask"])
    n_params = sum(x.size for x in jax.tree.leaves(variables))

    def fwd(v, x, t, cap, mask):
        out = model.apply(v, x, t, cap, mask)
        return jnp.sum(out.astype(jnp.float32))  # scalar readback (tunnel rule)

    jfwd = jax.jit(fwd)
    x = jax.random.normal(jax.random.fold_in(rng, 2),
                          (1, model.in_channels, h, w), jnp.float32)
    t = jnp.full((1,), 0.5, jnp.float32)
    cap = jax.random.normal(jax.random.fold_in(rng, 3),
                            (1, args.cap_len, 2048), jnp.float32)
    mask = jnp.ones((1, args.cap_len), jnp.int32)

    lowered = jfwd.lower(variables, x, t, cap, mask)
    compiled = lowered.compile()
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {"argument_gb": round(ma.argument_size_in_bytes / 2**30, 2),
               "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
               "output_gb": round(ma.output_size_in_bytes / 2**30, 2),
               "peak_gb_compiler": round(
                   (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                    + ma.output_size_in_bytes) / 2**30, 2)}
    except Exception as e:  # memory_analysis availability varies per backend
        mem = {"memory_analysis_error": str(e)[:120]}

    s0 = float(compiled(variables, x, t, cap, mask))  # warm (executes)
    times = []
    for i in range(args.steps):
        xi = jax.random.normal(jax.random.fold_in(rng, 10 + i), x.shape, x.dtype)
        t0 = time.perf_counter()
        s = float(compiled(variables, xi, t, cap, mask))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    stats = {}
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in ms:
            stats["peak_gb_device"] = round(ms["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        pass

    print(json.dumps({
        "model": args.model, "tokens": args.tokens, "grid": [gh, gw],
        "latent": [h, w], "pixels": [8 * h, 8 * w], "cap_len": args.cap_len,
        "params_m": round(n_params / 1e6, 1),
        "ms_per_step": round(dt * 1000, 1),
        "tokens_per_sec": round(args.tokens / dt),
        "finite": bool(jnp.isfinite(s0)), **mem, **stats,
    }))


if __name__ == "__main__":
    main()
