"""Sustained training soak on the real chip (VERDICT r3 #3).

Everything before this ran the trainer for <= ~30 steps at a time; the
reference's whole existence proof is `lumina_next_t2i/train.py:533-674`
running for 900K iters. This drives the REAL trainer CLI
(`pipelines/train.py`) for O(1000) steps against a real on-disk JPEG
dataset through the native-decode + bucketing loader, in several chunked
invocations (each `--auto_resume`s from the last checkpoint — also how a
production run survives the relay/tunnel's session windows), and validates:

  - the loss descends (the 512-image dataset is memorizable);
  - step time is flat (first-chunk steady state vs last chunk);
  - host RSS is flat (feeder threads / native decoder don't leak);
  - `--async_save` + `--keep_last` behave at real cadence (checkpoint dirs
    pruned, resume markers only on durable saves);
  - a mid-run SIGTERM checkpoints gracefully and the next chunk resumes.

The t2i bucket stream is pinned to one crop (`--pin_bucket`) so the relay
compiles ONE program; decode/crop/feeder work is unchanged (multi-bucket
compile behavior is covered by the loader tests and loader_fed_train.py).

Artifacts land in exps/artifacts/soak_<tag>/: metrics.jsonl (copied from the
run), rss.jsonl, loss_curve.svg, summary.json.

Drive: python exps/soak_train.py --total_steps 1200 --chunk_steps 200 \
           [--batch 8] [--kill_chunk 2] [--tag r4]
"""

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import threading
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def read_rss_mb(pid: int):
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        return None
    return None


def svg_line_plot(xs, ys, path, title, w=720, h=300, pad=42):
    """Dependency-free SVG polyline (no matplotlib in the image)."""
    if not xs:
        return
    x0, x1 = min(xs), max(xs) or 1
    y0, y1 = min(ys), max(ys)
    if y1 - y0 < 1e-12:
        y1 = y0 + 1.0
    sx = lambda x: pad + (x - x0) / max(x1 - x0, 1e-12) * (w - 2 * pad)
    sy = lambda y: h - pad - (y - y0) / (y1 - y0) * (h - 2 * pad)
    pts = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in zip(xs, ys))
    ticks = []
    for fy in (y0, (y0 + y1) / 2, y1):
        ticks.append(f'<text x="4" y="{sy(fy):.0f}" font-size="11" '
                     f'fill="#555">{fy:.3f}</text>')
    for fx in (x0, (x0 + x1) / 2, x1):
        ticks.append(f'<text x="{sx(fx):.0f}" y="{h - 8}" font-size="11" '
                     f'fill="#555" text-anchor="middle">{int(fx)}</text>')
    with open(path, "w") as f:
        f.write(
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}">'
            f'<rect width="{w}" height="{h}" fill="white"/>'
            f'<text x="{w // 2}" y="18" font-size="13" text-anchor="middle">{title}</text>'
            f'<polyline points="{pts}" fill="none" stroke="#1a6fb4" stroke-width="1.5"/>'
            + "".join(ticks) + "</svg>")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--total_steps", type=int, default=1200)
    p.add_argument("--chunk_steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--n_images", type=int, default=512)
    p.add_argument("--model", default="NextDiT_600M_patch2")
    p.add_argument("--kill_chunk", type=int, default=2,
                   help="send SIGTERM mid-way through this chunk index "
                        "(0-based; -1 disables)")
    p.add_argument("--kill_after_s", type=float, default=45.0)
    p.add_argument("--ckpt_every", type=int, default=100)
    p.add_argument("--keep_last", type=int, default=2)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--results_dir", default="/tmp/soak_run")
    p.add_argument("--data_dir", default="/tmp/soak_data")
    p.add_argument("--tag", default="r4")
    p.add_argument("--optimizer", choices=["fused_adamw", "adafactor"],
                   default="fused_adamw",
                   help="adafactor pairs with bf16 param stores: ~3 GB of "
                        "600M train state vs 10.5 GB fp32 AdamW — through "
                        "the tunnel relay's ~8.5 MB/s d2h, checkpoint saves "
                        "block the step loop proportionally to state size, "
                        "so the small-state optimizer is what makes a "
                        "checkpointing soak fit a session window")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke-test the harness)")
    p.add_argument("--no_h2d_diet", action="store_true",
                   help="disable the uint8/bf16 transfer diet (on by default "
                        "for soaks: 4x smaller h2d bounds the axon relay's "
                        "per-transfer native leak to ~1/4, so one process "
                        "sustains ~4x more steps on the same host budget)")
    args = p.parse_args()

    from exps.loader_fed_train import make_dataset

    if not os.path.exists(os.path.join(args.data_dir, "meta.yaml")):
        print(f"# building {args.n_images}-image JPEG dataset in {args.data_dir}",
              flush=True)
        make_dataset(args.data_dir, args.n_images)
    meta = os.path.join(args.data_dir, "meta.yaml")

    shutil.rmtree(args.results_dir, ignore_errors=True)
    exp_dir = os.path.join(args.results_dir, args.model)

    train_argv = [
        "--model", args.model, "--data_path", meta,
        "--results_dir", args.results_dir,
        "--image_size", str(args.image_size),
        "--global_batch_size", str(args.batch),
        "--pin_bucket", f"{args.image_size}x{args.image_size}",
        "--precision", "bf16", "--qk_norm", "--snr_type", "lognorm",
        "--checkpointing", "--remat_policy", "dots_slim",
        "--lr", "2e-4",
        "--log_every", str(args.log_every),
        "--ckpt_every", str(args.ckpt_every),
        "--keep_last", str(args.keep_last), "--async_save",
        "--auto_resume", "--num_workers", "4",
    ]
    if args.optimizer == "adafactor":
        train_argv += ["--optimizer", "adafactor", "--param_dtype", "bf16"]
    else:
        train_argv += ["--fused_optimizer"]
    if not args.no_h2d_diet:
        train_argv += ["--h2d_diet"]
    # child must run the trainer with the right backend even though
    # sitecustomize pins JAX_PLATFORMS: go through jax.config like the tests
    runner = ("import jax; "
              + ("jax.config.update('jax_platforms','cpu'); " if args.cpu else "")
              + "import sys; from lumina_t2x_tpu.pipelines.train import main; "
              "main(sys.argv[1:])")

    rss_log = []
    events = []
    chunk_idx = 0
    steps_done = 0
    t_start = time.time()
    while steps_done < args.total_steps:
        target = min(steps_done + args.chunk_steps, args.total_steps)
        cmd = [sys.executable, "-c", runner] + train_argv + ["--max_steps", str(target)]
        print(f"# chunk {chunk_idx}: steps -> {target}", flush=True)
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

        killer = None
        if chunk_idx == args.kill_chunk:
            def _kill():
                print(f"# SIGTERM to chunk {chunk_idx} after {args.kill_after_s}s",
                      flush=True)
                events.append({"t": time.time() - t_start, "event": "sigterm"})
                proc.send_signal(signal.SIGTERM)
            killer = threading.Timer(args.kill_after_s, _kill)
            killer.start()

        stop_rss = threading.Event()

        def _sample_rss():
            while not stop_rss.wait(5.0):
                mb = read_rss_mb(proc.pid)
                if mb is not None:
                    rss_log.append({"t": round(time.time() - t_start, 1),
                                    "chunk": chunk_idx, "rss_mb": round(mb, 1)})
        rss_thread = threading.Thread(target=_sample_rss, daemon=True)
        rss_thread.start()

        tail = []
        for line in proc.stdout:
            tail.append(line.rstrip())
            if len(tail) > 40:
                tail.pop(0)
            if "Train Loss" in line or "SIGTERM" in line or "resumed" in line \
                    or "calibrated" in line or "saved" in line or "async save" in line:
                print("  " + line.rstrip(), flush=True)
        rc = proc.wait()
        stop_rss.set()
        rss_thread.join(timeout=1)
        if killer is not None:
            killer.cancel()

        # how far did this chunk actually get?
        metrics_path = os.path.join(exp_dir, "metrics.jsonl")
        last_step = 0
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                for line in f:
                    try:
                        last_step = max(last_step, json.loads(line).get("step", 0))
                    except json.JSONDecodeError:
                        pass
        was_killed = chunk_idx == args.kill_chunk and any(
            e["event"] == "sigterm" for e in events)
        if rc != 0 and not was_killed:
            print("\n".join(tail[-20:]), file=sys.stderr)
            print(json.dumps({"soak": "FAILED", "chunk": chunk_idx, "rc": rc}))
            sys.exit(1)
        events.append({"t": time.time() - t_start, "event": "chunk_done",
                       "chunk": chunk_idx, "rc": rc, "metrics_last_step": last_step})
        # advance to the actual resume point: the newest checkpoint on disk
        # (a SIGTERM'd chunk exits rc=0 after a graceful save well short of
        # its target, and a crashed chunk resumes from its last durable save
        # — crediting `target` would silently skip a restart)
        ckpt_root = os.path.join(exp_dir, "checkpoints")
        saved = [int(d) for d in os.listdir(ckpt_root)
                 if d.isdigit()] if os.path.isdir(ckpt_root) else []
        steps_done = max(saved) if saved else steps_done
        chunk_idx += 1
        if chunk_idx > 3 * (args.total_steps // args.chunk_steps + 2):
            print(json.dumps({"soak": "FAILED", "reason": "too many chunks"}))
            sys.exit(1)

    # ---- validate + artifacts ------------------------------------------------
    from lumina_t2x_tpu.core.loss_plot import read_metrics_jsonl

    art = os.path.join(HERE, "artifacts", f"soak_{args.tag}")
    os.makedirs(art, exist_ok=True)
    metrics_path = os.path.join(exp_dir, "metrics.jsonl")
    shutil.copy(metrics_path, os.path.join(art, "metrics.jsonl"))
    with open(os.path.join(art, "rss.jsonl"), "w") as f:
        for r in rss_log:
            f.write(json.dumps(r) + "\n")

    steps, losses = read_metrics_jsonl(metrics_path)
    _, ips = read_metrics_jsonl(metrics_path, key="train/imgs_per_sec")
    svg_line_plot(steps, losses, os.path.join(art, "loss_curve.svg"),
                  f"{args.model} soak: train/loss over {steps[-1]} steps")
    if rss_log:
        svg_line_plot([r["t"] for r in rss_log], [r["rss_mb"] for r in rss_log],
                      os.path.join(art, "rss.svg"), "trainer host RSS (MB) vs wall s")

    k = max(3, len(losses) // 10)
    loss_head, loss_tail = sum(losses[:k]) / k, sum(losses[-k:]) / k
    # steady-state step time: drop each chunk's first record (compile/resume)
    ips_steady = [v for v in ips[2:] if v > 0]
    mid = len(ips_steady) // 2
    ips_a = sorted(ips_steady[:mid])[len(ips_steady[:mid]) // 2] if mid else 0
    ips_b = sorted(ips_steady[mid:])[len(ips_steady[mid:]) // 2] if mid else 0
    rss_after_warm = [r["rss_mb"] for r in rss_log if r["t"] > 120]
    rss_growth = (rss_after_warm[-1] / rss_after_warm[0] - 1) if len(rss_after_warm) > 2 else 0.0
    ckpts = sorted(os.listdir(os.path.join(exp_dir, "checkpoints")))

    summary = {
        "total_steps": steps[-1] if steps else 0,
        "chunks": chunk_idx,
        "sigterm_exercised": any(e["event"] == "sigterm" for e in events),
        "loss_first_window": round(loss_head, 4),
        "loss_last_window": round(loss_tail, 4),
        "loss_descended": loss_tail < loss_head,
        "imgs_per_sec_first_half_median": round(ips_a, 2),
        "imgs_per_sec_second_half_median": round(ips_b, 2),
        "steptime_flat": bool(ips_a and abs(ips_b - ips_a) / ips_a < 0.10),
        "rss_growth_after_warmup": round(rss_growth, 4),
        "rss_flat": abs(rss_growth) < 0.15,
        "checkpoints_on_disk": ckpts,
        "keep_last_respected": len(ckpts) <= args.keep_last + 1,
        "events": events,
        "wall_s": round(time.time() - t_start, 1),
    }
    with open(os.path.join(art, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    ok = (summary["loss_descended"] and summary["sigterm_exercised"]
          and summary["keep_last_respected"])
    print(json.dumps({"soak": "PASSED" if ok else "CHECK", **summary}))


if __name__ == "__main__":
    main()
