"""Measure the B>1 fix: ones-column vs in-kernel row-sum denominator.

Round-4 HLO diffs (`exps/artifacts/b1b2_hlo/`) pinned the B>1 per-sample
sampling regression to the flash wrapper's V ones-column concatenate
de-bitcasting at >= 3 batch rows (a materialized ~75 MB HBM copy per layer
at 2B/4k). `ops/flash_attention._denom_fused_ones` now switches the kernels
to an in-kernel VPU row-sum at >= 3 rows. This probe measures the END-TO-END
effect on the real chip: full 2B sampler at 1024^2 via `bench.py --batch N`
subprocesses (fresh process per mode — the denominator mode is read at trace
time), batch in {1, 2, 4} x mode in {ones, auto}.

Per-sample rates use each leg's own min-of-3 timing (bench.py `times`).
A sample is 2 batch rows (CFG), so B1 runs at kernel rows 2 (ones mode in
both configs — sanity leg), B2 at rows 4, B4 at rows 8.

Drive: python exps/b4_denom_probe.py [--batches 1 2 4] [--skip_ones]
Artifacts: exps/artifacts/b4_denom/summary.json
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_leg(batch: int, mode: str, timeout_s: float):
    env = dict(os.environ)
    env["LUMINA_FLASH_DENOM"] = mode
    env["LUMINA_BENCH_DEADLINE"] = "100000"  # the probe owns its own budget
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--batch", str(batch)],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO, env=env)
    except subprocess.TimeoutExpired:
        return {"batch": batch, "mode": mode, "error": f"timeout {timeout_s}s"}
    rec = None
    for line in proc.stdout.strip().splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "tput" in d:
            rec = d
    if proc.returncode != 0 or rec is None:
        return {"batch": batch, "mode": mode, "error":
                f"rc={proc.returncode} tail={proc.stderr.strip().splitlines()[-2:]}"}
    return {"batch": batch, "mode": mode, "samples_per_sec": round(rec["tput"], 5),
            "dt_min_s": round(min(rec["times"]), 3) if rec.get("times") else None,
            "chunk_intervals": rec.get("chunk_intervals"),
            "wall_s": round(time.time() - t0, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 4, 2])
    p.add_argument("--skip_ones", action="store_true",
                   help="only measure the new auto/rowsum mode")
    p.add_argument("--timeout", type=float, default=2400.0,
                   help="per-leg budget incl. a possible cold Mosaic compile")
    args = p.parse_args()

    legs = []
    for b in args.batches:
        legs.append(run_leg(b, "auto", args.timeout))
        print(json.dumps(legs[-1]), flush=True)
        if not args.skip_ones and b > 1:  # B1 is rows-2: ones in both modes
            legs.append(run_leg(b, "ones", args.timeout))
            print(json.dumps(legs[-1]), flush=True)

    by = {(l["batch"], l["mode"]): l for l in legs if "error" not in l}
    summary = {"legs": legs}
    b1 = by.get((1, "auto"))
    for b in args.batches:
        auto, ones = by.get((b, "auto")), by.get((b, "ones"))
        if auto and ones:
            summary[f"b{b}_rowsum_speedup"] = round(
                auto["samples_per_sec"] / ones["samples_per_sec"], 4)
        if auto and b1 and b > 1:
            summary[f"b{b}_vs_b1_per_sample"] = round(
                auto["samples_per_sec"] / b1["samples_per_sec"], 4)

    art = os.path.join(HERE, "artifacts", "b4_denom")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
