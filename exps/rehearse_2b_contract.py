"""Full-2B-scale released-checkpoint contract rehearsal (VERDICT r2 #4).

Real 2B weights are not mountable in this environment, but the CONTRACT is:
a `consolidated_ema.00-of-01.safetensors` in bf16 with the exact reference
key names/shapes (`lumina_next_t2i/demo.py:127-133`), converted by
`lumina convert` and sampled from on the TPU. This script rehearses that
end-to-end at real size with a synthetic dict from
`core.checkpoint.next_dit_reference_state_shapes` (itself pinned against the
reference torch module in tests/test_checkpoint_contract_2b.py):

  1. generate + save the 4.6 GB bf16 safetensors          (gen_save_s)
  2. `lumina convert` -> orbax ema layout                  (convert_s)
  3. pure orbax restore of the converted tree              (restore_s)
  4. `pipelines.sample --ckpt ... --bf16_params --qk_norm` 4-step euler
     1024^2 sample on-chip                                 (sample_s)

Run: python exps/rehearse_2b_contract.py [--workdir /tmp/rehearse_2b] [--skip N]
Prints one JSON line; record the numbers in NOTES.md.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/rehearse_2b")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--keep", action="store_true", help="keep artifacts")
    args = p.parse_args()

    import numpy as np
    import torch
    from safetensors.torch import save_file

    from lumina_t2x_tpu.core.checkpoint import next_dit_reference_state_shapes

    os.makedirs(args.workdir, exist_ok=True)
    st_path = os.path.join(args.workdir, "consolidated_ema.00-of-01.safetensors")
    jax_dir = os.path.join(args.workdir, "converted")
    out_dir = os.path.join(args.workdir, "samples")
    result = {}

    # 1. synthetic release file at real size (bf16, small-std values so the
    # forward is finite; zero-init final layer like a real early checkpoint
    # is NOT used — nonzero everywhere exercises the full numeric path)
    t0 = time.perf_counter()
    shapes = next_dit_reference_state_shapes()  # released-2B defaults
    rng = np.random.RandomState(0)
    sd = {}
    n_params = 0
    for k, shp in shapes.items():
        a = (rng.standard_normal(shp).astype(np.float32) * 0.02)
        sd[k] = torch.from_numpy(a).to(torch.bfloat16)
        n_params += a.size
    save_file(sd, st_path)
    del sd
    result["n_tensors"] = len(shapes)
    result["n_params"] = n_params
    result["safetensors_gb"] = round(os.path.getsize(st_path) / 2**30, 2)
    result["gen_save_s"] = round(time.perf_counter() - t0, 1)

    # 2. lumina convert (numpy load + import + orbax save), fresh process
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "lumina_t2x_tpu.cli.entry_point", "convert",
         st_path, jax_dir, "--direction", "to_jax"],
        capture_output=True, text=True, cwd=REPO)
    result["convert_s"] = round(time.perf_counter() - t0, 1)
    if proc.returncode != 0:
        result["convert_error"] = proc.stderr.strip().splitlines()[-3:]
        print(json.dumps(result))
        return 1
    result["orbax_gb"] = round(sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(jax_dir) for f in fs) / 2**30, 2)

    # 3. pure restore timing (the load a serving worker pays at boot)
    import orbax.checkpoint as ocp

    t0 = time.perf_counter()
    tree = ocp.PyTreeCheckpointer().restore(os.path.join(os.path.abspath(jax_dir), "ema"))
    leaves = [v for v in __import__("jax").tree.leaves(tree)]
    result["restore_s"] = round(time.perf_counter() - t0, 1)
    result["restored_dtype"] = str(leaves[0].dtype)
    result["restored_gb"] = round(sum(a.nbytes for a in leaves) / 2**30, 2)
    del tree, leaves

    # 4. sample on-chip through the real CLI (bf16 param threading at size)
    t0 = time.perf_counter()
    cap_file = os.path.join(args.workdir, "prompt.txt")
    with open(cap_file, "w") as f:
        f.write("a corgi wearing sunglasses on a beach\n")
    proc = subprocess.run(
        [sys.executable, "-m", "lumina_t2x_tpu.pipelines.sample",
         "--ckpt", jax_dir, "--bf16_params", "--qk_norm",
         "--caption_path", cap_file, "--resolution", "1:1024x1024",
         "--num_sampling_steps", str(args.steps), "--solver", "euler",
         "--image_save_path", out_dir],
        capture_output=True, text=True, cwd=REPO)
    result["sample_s"] = round(time.perf_counter() - t0, 1)
    result["sample_rc"] = proc.returncode
    if proc.returncode != 0:
        result["sample_error"] = proc.stderr.strip().splitlines()[-3:]
    else:
        outs = [f for d, _, fs in os.walk(out_dir) for f in fs
                if f.endswith((".npy", ".png"))]
        result["outputs"] = sorted(outs)[:3]

    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)
    return 0 if proc.returncode == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
