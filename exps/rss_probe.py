"""Host-RSS growth attribution for the TPU train loop (soak r4 finding).

The 1200-step soak (exps/soak_train.py, adafactor) found host RSS growing
~19 MB/step on the real chip (252 MB -> 10-15.7 GB per chunk) while the CPU
smoke soak stayed flat — so the growth is specific to the TPU/tunnel path.
This probe runs the SAME loader-fed 600M t2i step in one process and
attributes the growth:

  arm "cached": device step only (one pinned host batch, values varied) —
      isolates the jit/relay path from the data loader;
  arm "fed": full native-decode -> bucket -> feeder-thread loader;
  for each arm: RSS slope per step, tracemalloc-tracked Python delta
      (tracked ~= RSS growth -> Python-side retention; tracked << RSS ->
      native, i.e. the IFRT-proxy client or jaxlib), and whether
      gc.collect() + a settle releases it.

Drive (TPU): python exps/rss_probe.py [--steps 120]
"""

import argparse
import gc
import json
import os
import sys
import time
import tracemalloc
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lumina_t2x_tpu.core.logging import enable_compile_cache
enable_compile_cache()


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--root", default="/tmp/soak_data")
    args = p.parse_args()

    from exps.loader_fed_train import make_dataset
    from lumina_t2x_tpu.codecs.vae import AutoencoderKL, encode_to_latent
    from lumina_t2x_tpu.data import imgproc
    from lumina_t2x_tpu.models import get_model
    from lumina_t2x_tpu.pipelines import train as train_mod
    from lumina_t2x_tpu.pipelines.train_lib import (
        FusedAdamWEMA, create_train_state, make_train_step)
    from lumina_t2x_tpu.transport import create_transport

    if not os.path.exists(os.path.join(args.root, "meta.yaml")):
        make_dataset(args.root, 512)
    cfg = os.path.join(args.root, "meta.yaml")

    orig_gcsl = imgproc.generate_crop_size_list
    imgproc.generate_crop_size_list = lambda n, p, max_ratio=4.0: [(256, 256)]
    targs = types.SimpleNamespace(
        data_path=cfg, image_size=256, global_batch_size=args.batch,
        num_workers=4, caption_dropout_prob=0.0, cap_feat_dim=2048,
        global_seed=0, cache_data_on_disk=False)
    stream = train_mod.t2i_batches(targs, None)

    model = get_model("NextDiT_600M_patch2", qk_norm=True, dtype=jnp.bfloat16,
                      attn_impl="flash" if jax.default_backend() != "cpu" else "xla",
                      remat=True, remat_policy="dots_slim", cap_feat_dim=2048)
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    vae_vars = jax.jit(vae.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, 256, 256)), jax.random.PRNGKey(1))

    @jax.jit
    def encode_batch(vv, x, rng):
        return encode_to_latent(vae, vv, x, rng, "ema")

    first = next(stream)
    cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
    opt = FusedAdamWEMA(5e-4)
    enc_rng = jax.random.PRNGKey(3)
    ex = dict(first)
    ex["x"] = encode_batch(vae_vars, jnp.asarray(first["x"]), enc_rng)
    state = create_train_state(jax.random.PRNGKey(1), model, ex, opt, cond)
    step = jax.jit(make_train_step(model, create_transport(
        "Linear", "velocity", snr_type="lognorm"), opt, cond, grad_clip=2.0),
        donate_argnums=(0,))

    def run_one(st, batch, i):
        b = dict(batch)
        b["x"] = encode_batch(vae_vars, jnp.asarray(batch["x"]),
                              jax.random.fold_in(enc_rng, i))
        st, m = step(st, b, jax.random.fold_in(jax.random.PRNGKey(2), i))
        float(m["loss"])
        return st

    state = run_one(state, first, 0)  # compile
    gc.collect(); gc.freeze(); gc.set_threshold(20_000, 50, 50)

    out = {"steps_per_arm": args.steps}

    def arm(name, batch_fn, base):
        nonlocal state
        gc.collect()
        tracemalloc.start(10)
        r0, t0 = rss_mb(), time.perf_counter()
        snap0 = tracemalloc.take_snapshot()
        for i in range(args.steps):
            state = run_one(state, batch_fn(i), base + i)
        snap1 = tracemalloc.take_snapshot()
        r1 = rss_mb()
        gc.collect()
        time.sleep(2.0)
        r2 = rss_mb()
        tracked = sum(s.size_diff for s in snap1.compare_to(snap0, "lineno"))
        top = [str(s)[:160] for s in
               snap1.compare_to(snap0, "lineno")[:6]]
        tracemalloc.stop()
        out[name] = {
            "rss_mb_start": round(r0, 1), "rss_mb_end": round(r1, 1),
            "rss_mb_after_gc": round(r2, 1),
            "mb_per_step": round((r1 - r0) / args.steps, 2),
            "tracked_python_mb": round(tracked / 2**20, 1),
            "secs_per_step": round((time.perf_counter() - t0) / args.steps, 3),
            "top_tracked": top,
        }
        print(json.dumps({name: out[name]}), flush=True)

    arm("cached",
        lambda i: {**first, "x": first["x"] + np.float32(1e-4 * (i + 1))}, 1000)
    arm("fed", lambda i: next(stream), 3000)
    # second cached arm: does the fed arm's growth regime persist?
    arm("cached2",
        lambda i: {**first, "x": first["x"] + np.float32(2e-4 * (i + 1))}, 5000)

    imgproc.generate_crop_size_list = orig_gcsl
    print(json.dumps(out))


if __name__ == "__main__":
    main()
