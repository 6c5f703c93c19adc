"""Headline benchmark: 2B NextDiT text-to-image sampling throughput on TPU.

Metric (BASELINE.json): samples/sec/chip at 1024^2 for the 2B Next-DiT with a
30-step ODE (midpoint solver, CFG 4.0) — the full denoise loop compiled as one
XLA program, bf16, Pallas flash attention on TPU. Reported at the best
per-chip batch size (measured: batch 1 and batch 4; the batch-4 leg runs in a
guarded subprocess so a cold remote-compile cannot blow the bench budget) with
batch-1 per-step latency alongside.

vs_baseline derivation (the reference publishes no throughput numbers,
`BASELINE.md`): per-sample work is ~2.7 PFLOP (30 midpoint steps x 2 model
evals x CFG batch 2 x [2 * 2.3e9 params * 4096 tokens + attention] ~= 90
TFLOP/step). Reference stack on A100-80GB (312 bf16 TF/s): eager torch +
flash-attn-2 + torchdiffeq python-dispatched loop. Component estimate: cuBLAS
GEMMs at these shapes ~65-75% of peak; flash-attn-2 at head_dim 72 (padded to
128 in-kernel) ~half its d=128 efficiency on the ~20% attention FLOP share;
eagerly-launched elementwise/norm/RoPE chains and a per-step host sync
(`transport/integrators.py` odeint loop) fill the rest => end-to-end 35-45%
MFU; center 40% => 0.046 samples/sec/A100 (range 0.040-0.052).

Physical context on a 197 TF/s v5e: even at 100% MFU the per-chip ceiling vs
that denominator is 197/312/0.40 = 1.58x — the original >=2x/chip north star
would require crediting the reference <=26% MFU. The architecture tightens
the ceiling further: head_dim 72 means both attention contractions (QK^T
contracts K=72, PV outputs N=72) fill only 72/128 of the MXU's lanes, and at
4096 tokens attention is ~23% of step FLOPs, so the whole-model MFU ceiling
for ANY implementation of this architecture on this MXU geometry is
1/(0.77 + 0.23/0.5625) ~= 85%. The measured ~86% end-to-end MFU (529 ms/step,
vs_baseline 1.37) is therefore this model's speed of light on v5e — the
remaining gap to 1.58x is unreachable without changing the architecture.
>=2x holds per-dollar (see BASELINE.md).
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench runs skip the (slow) Mosaic
# compile of the flash kernels
from lumina_t2x_tpu.core.logging import enable_compile_cache
enable_compile_cache()

A100_REFERENCE_SAMPLES_PER_SEC = 0.046
V5E_CEILING_VS_BASELINE = 1.58  # 197/312/0.40: 100%-MFU v5e vs the denominator

NUM_STEPS = 30
RES = 1024
LATENT = RES // 8  # 128
# candidate larger per-chip batches, tried in order in guarded subprocesses.
# batch 4 is ~64s of device time per one-program 30-step call, past the
# tunnel/relay's execution-time limit (bisected r2: the same program at 8
# steps runs clean, batch 2 at 30 steps ~35s runs clean) — so batch >= 3
# legs drive the SAME grid in ~20s chunk calls (measure(chunk_intervals=10))
# and the B4 number is measured, not estimated. Per-sample throughput DROPS
# with batch anyway (attention FLOPs dominate and scale linearly; there is
# no under-utilization to amortize at 4096 tokens), so best_batch=1 is a
# measurement, not a fallback.
BEST_BATCH_CANDIDATES = (4, 2)
CHUNK_INTERVALS_FROM_BATCH = 3  # chunk the trajectory at this batch and up
# Per-leg subprocess timeout. r4 lesson (BENCH_r04.json rc=124): two cold
# batch legs at 480s each burned 960s and the driver killed the whole bench
# before the headline record ever printed. A WARM batch-4 leg is ~300s of
# wall (startup + calibration + compile-check + 3 x ~70s timed trajectories),
# so the cap sits at 420s; the early-emitted headline plus the global
# deadline below keep even two cold failures from destroying the artifact.
BATCH4_TIMEOUT_S = int(os.environ.get("LUMINA_BENCH_BATCH4_TIMEOUT", "420"))

# Global wall-clock deadline for the WHOLE bench run. The batch-1 headline
# leg always runs; every optional leg (batch scaling, training) first checks
# the remaining budget and prints `# skipped (deadline)` instead of starting
# a leg it cannot finish. Default is set well inside the driver's budget so
# the artifact always ends rc=0 with a parsed headline (VERDICT r4 #1).
BENCH_DEADLINE_S = float(os.environ.get("LUMINA_BENCH_DEADLINE", "1500"))
_BENCH_T0 = time.monotonic()


def _remaining() -> float:
    return BENCH_DEADLINE_S - (time.monotonic() - _BENCH_T0)


# Smoke mode (tests/test_bench_smoke.py): tiny model, few steps, CPU-friendly.
# Exercises the REAL orchestration — early headline emission, deadline
# skipping, subprocess legs — without the 2B compile.
SMOKE = os.environ.get("LUMINA_BENCH_SMOKE", "0") == "1"
if SMOKE:
    NUM_STEPS = 4
    RES = 64
    LATENT = RES // 8
    # deterministic + fast: smoke always runs on CPU (env JAX_PLATFORMS is
    # ignored under the axon sitecustomize; the config update is honored)
    jax.config.update("jax_platforms", "cpu")


def build_model_and_params():
    from lumina_t2x_tpu.models import get_model

    on_tpu = jax.default_backend() not in ("cpu",)
    if SMOKE:
        from lumina_t2x_tpu.models.next_dit import NextDiT

        model = NextDiT(patch_size=2, dim=64, n_layers=2, n_heads=4,
                        cap_feat_dim=32, qk_norm=True, dtype=jnp.bfloat16,
                        attn_impl="xla")
        rng = jax.random.PRNGKey(0)
        x0 = jax.random.normal(rng, (2, 4, 8, 8))
        cap0 = jax.random.normal(rng, (2, 8, 32))
        variables = jax.jit(model.init)(
            jax.random.fold_in(rng, 2), x0, jnp.zeros((2,)), cap0,
            jnp.ones((2, 8), jnp.int32))
        return model, variables, rng
    model = get_model(
        "NextDiT_2B_patch2", cap_feat_dim=2048, qk_norm=True,
        dtype=jnp.bfloat16, attn_impl="flash" if on_tpu else "xla",
    )
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 32, 32))
    cap0 = jax.random.normal(rng, (2, 8, 2048))
    variables = jax.jit(model.init)(
        jax.random.fold_in(rng, 2), x0, jnp.zeros((2,)), cap0, jnp.ones((2, 8), jnp.int32)
    )
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
    )
    return model, variables, rng


def measure(model, variables, batch: int, rng, runs: int = 3,
            chunk_intervals: int = 0):
    """Sampling throughput at `batch`. chunk_intervals > 0 drives the SAME
    trajectory in grid slices of that many intervals (one jit call each):
    the relay kills any single device call past ~40-60 s of execution, which
    the 30-step batch-4 program exceeds (~64 s) — chunking keeps every call
    ~20 s so the B4 number is measured, not estimated. Chunk boundaries add
    only dispatch overhead, so the result is a (slightly conservative)
    measurement of the one-program throughput."""
    from lumina_t2x_tpu.pipelines.sample_lib import (
        autocalibrate_flash_static_max, build_t2i_sample_fn)

    cap_len = 8 if SMOKE else 256
    cap_dim = model.cap_feat_dim
    cap = jax.random.normal(jax.random.fold_in(rng, 1), (2 * batch, cap_len, cap_dim))
    mask = jnp.ones((2 * batch, cap_len), jnp.int32)
    # derive the qk-norm static-max flash bound (drops the online max-reduce;
    # ~6% per step at 2B/1024^2) before the sampler traces; the batch-N
    # subprocess legs re-derive their own bound through this same call
    bound = autocalibrate_flash_static_max(
        model, variables, cap, mask, width=RES, height=RES,
        cfg_scale=4.0, time_shifting_factor=4.0)
    if bound is not None:
        print(f"# flash static-max calibrated: {bound:.2f}", file=sys.stderr)
    kw = dict(width=RES, height=RES, num_steps=NUM_STEPS, solver="midpoint",
              cfg_scale=4.0, time_shifting_factor=4.0)

    if chunk_intervals:
        ts, init_fn, chunk_fn, finalize = build_t2i_sample_fn(
            model, chunked=True, **kw)
        chunk_jit = jax.jit(chunk_fn)
        n_pts = int(ts.shape[0])
        slices = [ts[i:min(i + chunk_intervals + 1, n_pts)]
                  for i in range(0, n_pts - 1, chunk_intervals)]

        def run_once(seed_rng):
            z = init_fn(seed_rng, cap)
            for sl in slices:
                z = chunk_jit(variables, z, sl, cap, mask)
            out = finalize(z)
            # force a real device->host readback (tunnel rule: big-output
            # block_until_ready can return an async handle)
            float(jnp.sum(out[:, 0, 0, 0]))
            return out

        # compile-check both programs (full-size + remainder slice) WITHOUT
        # paying a full ~70s warmup trajectory: the timed runs below follow
        # immediately and the 420s leg cap stays honest
        z0 = init_fn(rng, cap)
        z0 = chunk_jit(variables, z0, slices[0], cap, mask)
        z0 = chunk_jit(variables, z0, slices[-1], cap, mask)
        float(jnp.sum(finalize(z0)[:, 0, 0, 0]))
        times = []
        for i in range(runs):
            t0 = time.perf_counter()
            run_once(jax.random.fold_in(rng, i))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        return batch / dt, dt, times

    sample_fn = jax.jit(build_t2i_sample_fn(model, **kw))
    out = sample_fn(variables, rng, cap, mask)
    jax.block_until_ready(out)
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        out = sample_fn(variables, jax.random.fold_in(rng, i), cap, mask)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch / dt, dt, times


def _spread_fields(prefix: str, times) -> dict:
    """min/median/spread for a list of per-run wall times (VERDICT r4 #7:
    single-shot numbers were being compared across rounds at a precision the
    tunnel's 5-8% drift doesn't support; report the spread explicitly)."""
    lo, med = min(times), statistics.median(times)
    return {
        f"{prefix}_dt_min_s": round(lo, 4),
        f"{prefix}_dt_median_s": round(med, 4),
        f"{prefix}_spread_pct": round((max(times) - lo) / lo * 100, 2),
        f"{prefix}_runs": len(times),
    }


TRAIN_LEG_TIMEOUT_S = int(os.environ.get("LUMINA_BENCH_TRAIN_TIMEOUT", "480"))

# Training-throughput legs (VERDICT r2 #2 / r3 #2), run via
# exps/train_bench_t2i.py in guarded subprocesses.
# - 2B grad: fwd+bwd+grad-norm (the d=2304 MFU question; measured r3: 40%
#   MFU vs 25-33% at 600M, so the 600M "shape limit" is beaten at d=2304).
# - 2B FULL: the complete train step (loss+bwd+clip+update+EMA) on ONE 16 GB
#   chip via FusedAdafactorEMA — factored second moments + stochastic-rounded
#   bf16 params/EMA (~9.3 GB state vs >= 18.4 GB for all-bf16 AdamW). The
#   reference needs >= 32 GPUs for this recipe
#   (`lumina_t2i/exps/5B_bs512_lr1e-4_bf16_1024px_sdxlvae.sh`).
# - 600M FULL: the reference 600M recipe shape (class-cond ImageNet 256px,
#   `Next-DiT-ImageNet/exps/600M_bs256_lr5e-4_bf16_qknorm_lognorm.sh`).
# The relay compile helper bounds what compiles: the 2B FULL step tops out
# at 2048 total tokens (256px B=8 and 512px B=2 both compile; 4096-token
# variants 256px B=16 / 512px B=4 do not); 2B grad at 4096 (256px B=16).
TRAIN_LEGS = () if SMOKE else (
    dict(model="NextDiT_2B_patch2", image_size=256, batch=16, mode="grad",
         opt="fused", param_dtype="bf16", remat="dots_slim",
         key="train_2b_fwdbwd"),
    # the flagship recipe SHAPE (VERDICT r4 #4): 2B at 1024px = 4096 tokens,
    # where the flash bwd kernels/remat/static-max earn their keep
    # (`lumina_t2i/exps/5B_bs512_lr1e-4_bf16_1024px_sdxlvae.sh` trains
    # micro-bs 2 @1024). Grad fits the relay's 4096-token compile bound;
    # the FULL 1024px leg below it is attempted and reports the relay
    # rejection gracefully if it still exceeds the helper's graph limit.
    dict(model="NextDiT_2B_patch2", image_size=1024, batch=1, mode="grad",
         opt="fused", param_dtype="bf16", remat="dots_slim",
         key="train_2b_1024_fwdbwd"),
    dict(model="NextDiT_2B_patch2", image_size=256, batch=8, mode="full",
         opt="adafactor", param_dtype="bf16", remat="dots_slim",
         key="train_2b_full"),
    dict(model="NextDiT_ImageNet_600M_patch2", image_size=256, batch=16,
         mode="full", opt="fused", param_dtype="fp32", remat="dots_slim",
         key="train_600m_full"),
    # LAST: expected to hit the relay compile-helper's graph bound (2B FULL
    # tops out at 2048 tokens; this is 4096) — keep its failure from
    # starving the legs above of deadline budget.
    dict(model="NextDiT_2B_patch2", image_size=1024, batch=2, mode="full",
         opt="adafactor", param_dtype="bf16", remat="dots_slim", microbatch=2,
         key="train_2b_1024_full"),
)


def iter_train_legs():
    """Run the training legs one at a time, yielding (leg, record) pairs as
    they complete (so the caller can re-emit the headline record after each —
    the driver artifact keeps whatever finished even if a later leg dies).
    Each leg first checks the global deadline."""
    here = os.path.dirname(os.path.abspath(__file__))
    for leg in TRAIN_LEGS:
        budget = min(TRAIN_LEG_TIMEOUT_S, _remaining() - 30)
        if budget < 60:
            print(f"# train leg {leg['key']} skipped (deadline)", file=sys.stderr)
            continue
        cmd = [sys.executable, os.path.join(here, "exps", "train_bench_t2i.py"),
               "--model", leg["model"], "--image_size", str(leg["image_size"]),
               "--batch", str(leg["batch"]), "--mode", leg["mode"],
               "--param_dtype", leg["param_dtype"],
               "--remat_policy", leg["remat"], "--opt", leg["opt"],
               "--steps", "4"]
        if leg.get("microbatch"):
            cmd += ["--microbatch", str(leg["microbatch"])]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=budget, cwd=here)
        except subprocess.TimeoutExpired:
            print(f"# train leg {leg['model']} timed out", file=sys.stderr)
            continue
        for line in proc.stdout.strip().splitlines():
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and "imgs_per_sec" in d:
                print(f"# train leg {d['model']} B{d['batch']} {d['mode']}"
                      f"({leg['opt']}): {d['imgs_per_sec']} imgs/s, "
                      f"MFU {d['mfu_vs_197tf']}", file=sys.stderr)
                yield leg, d
            elif isinstance(d, dict) and "error" in d:
                print(f"# train leg {leg['model']} failed: {d['error'][:120]}",
                      file=sys.stderr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=0,
                   help="internal: measure this batch size only and print raw json")
    p.add_argument("--skip_train", action="store_true",
                   help="skip the training-throughput legs")
    args = p.parse_args()

    model, variables, rng = build_model_and_params()

    if args.batch:
        chunk = 10 if args.batch >= CHUNK_INTERVALS_FROM_BATCH else 0
        tput, dt, times = measure(model, variables, batch=args.batch, rng=rng,
                                  chunk_intervals=chunk)
        print(json.dumps({"batch": args.batch, "tput": tput, "dt": dt,
                          "chunk_intervals": chunk, "times": times}))
        return

    tput1, dt1, times1 = measure(model, variables, batch=1, rng=rng)

    record = {
        "metric": "samples/sec/chip at 1024^2 (2B NextDiT, 30-step midpoint ODE, CFG)",
        "value": round(tput1, 4),
        "unit": "samples/sec",
        "vs_baseline": round(tput1 / A100_REFERENCE_SAMPLES_PER_SEC, 3),
        "vs_baseline_ceiling_v5e": V5E_CEILING_VS_BASELINE,
        "best_batch": 1,
        "batch1_samples_per_sec": round(tput1, 4),
        "per_step_latency_ms": round(dt1 / NUM_STEPS * 1000, 2),
        "backend": jax.default_backend(),
    }
    record.update(_spread_fields("batch1", times1))
    if SMOKE:
        record["smoke"] = True
    # Emit the headline record NOW (VERDICT r4 #1): every optional leg below
    # can die or be killed without destroying the run's perf record. The
    # driver parses the LAST JSON line, so each later re-emission of the
    # (augmented) record supersedes this one; this line is the floor.
    print(json.dumps(record), flush=True)

    # best-batch leg in a subprocess with its own timeout: a cold Mosaic/relay
    # compile of the batch-4 program cannot stall the whole bench. With the
    # persistent cache warm it finishes in ~2 min.
    tput_best, best_batch = tput1, 1
    for cand in BEST_BATCH_CANDIDATES:
        budget = min(BATCH4_TIMEOUT_S, _remaining() - 30)
        if budget < 60:
            print(f"# batch-{cand} leg skipped (deadline)", file=sys.stderr)
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--batch", str(cand)],
                capture_output=True, text=True, timeout=budget,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            print(f"# batch-{cand} leg timed out after {budget:.0f}s",
                  file=sys.stderr)
            continue
        # scan all stdout lines for the record: a stray library print after
        # the JSON must not turn a successful run into a silent fallthrough
        sub = None
        for line in proc.stdout.strip().splitlines():
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and "tput" in d:
                sub = d
        if proc.returncode == 0 and sub is not None:
            # always record the leg's number (not just when it wins) so the
            # batch-scaling datapoint survives in the bench artifact
            print(f"# batch-{cand} leg: {sub['tput']:.4f} samples/sec",
                  file=sys.stderr)
            record[f"batch{cand}_samples_per_sec"] = round(sub["tput"], 4)
            if sub.get("times"):
                record.update(_spread_fields(f"batch{cand}", sub["times"]))
            if sub["tput"] > tput_best:
                tput_best, best_batch = sub["tput"], sub["batch"]
            break  # first candidate that runs is the measurement
        print(f"# batch-{cand} leg failed: rc={proc.returncode} "
              f"stderr_tail={proc.stderr.strip().splitlines()[-1:]}",
              file=sys.stderr)

    record["value"] = round(tput_best, 4)
    record["vs_baseline"] = round(tput_best / A100_REFERENCE_SAMPLES_PER_SEC, 3)
    record["best_batch"] = best_batch
    print(json.dumps(record), flush=True)

    if not args.skip_train and (SMOKE or jax.default_backend() != "cpu"):
        opt_name = {"fused": "adamw", "optax": "adamw", "adafactor": "adafactor"}
        for leg, d in iter_train_legs():
            suffix = f"+{opt_name[leg['opt']]}+ema" if d["mode"] == "full" else ""
            # train-leg metric line, then the updated headline record — the
            # headline stays the LAST JSON line at every point in the run
            print(json.dumps({
                "metric": f"train imgs/sec/chip ({d['model']} {d['image_size']}px "
                          f"B{d['batch']} {d['mode']}{suffix})",
                "value": d["imgs_per_sec"], "unit": "imgs/sec",
                "tflops_per_sec": d["tflops_per_sec"], "mfu": d["mfu_vs_197tf"],
                "ms_per_step": d["ms_per_step"],
            }))
            record[f"{leg['key']}_imgs_per_sec"] = d["imgs_per_sec"]
            record[f"{leg['key']}_mfu"] = d["mfu_vs_197tf"]
            print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
