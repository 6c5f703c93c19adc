"""Execute the multi-PROCESS half of L0 once (VERDICT r4 #6).

Everything multi-chip so far ran single-process over 8 virtual devices;
`parallel/mesh.distributed_init` — the analogue of the reference's most
load-bearing code (`lumina_next_t2i/parallel.py:12-47`, torchrun
MASTER_ADDR/RANK bootstrap) — had never executed. This launches TWO real
processes, each with 4 virtual CPU devices, through
`jax.distributed.initialize` (coordinator + num_processes + process_id from
env, the JAX_COORDINATOR_ADDRESS contract `distributed_init` implements),
then on the resulting 8-device global mesh:

  - `form_global_batch` assembles rank-local batches into a global
    data-sharded array (`jax.make_array_from_process_local_data`);
  - ONE full sharded train step (TP=2 x FSDP, grad clip, AdamW, EMA) runs
    with params initialized in-jit via out_shardings (no host broadcast);
  - a CHECKPOINT saves across processes (orbax multihost collective save)
    and restores into the sharded templates, bit-exact on local shards;
  - a second step runs from the restored state.

Both ranks must print identical losses (the metrics are replicated).

Drive: python exps/multiprocess_dryrun.py            (launcher, ~2-6 min)
       python exps/multiprocess_dryrun.py --worker   (internal, per rank)
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def worker(results_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lumina_t2x_tpu.parallel.mesh import (create_mesh, distributed_init,
                                              form_global_batch)

    distributed_init()
    assert jax.process_count() == 2, f"process_count={jax.process_count()}"
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    pid = jax.process_index()

    from jax.sharding import NamedSharding, PartitionSpec as P

    from lumina_t2x_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from lumina_t2x_tpu.models.next_dit import NextDiT
    from lumina_t2x_tpu.pipelines.train_lib import (TrainState, create_optimizer,
                                                    make_sharded_train_step,
                                                    make_train_step)
    from lumina_t2x_tpu.transport import create_transport

    model = NextDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                    cap_feat_dim=32, qk_norm=True, attn_impl="xla")
    cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
    optimizer = create_optimizer(lr=1e-3, weight_decay=0.01)
    transport = create_transport("Linear", "velocity", snr_type="lognorm")

    def init_fn():
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((8, 4, 16, 16))
        t = jnp.zeros((8,))
        cap = jnp.zeros((8, 8, 32))
        m = jnp.ones((8, 8), jnp.int32)
        variables = model.init(
            {"params": rng, "label_dropout": jax.random.fold_in(rng, 1)},
            x, t, cap_feats=cap, cap_mask=m)
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=optimizer.init(params),
                          ema_params=jax.tree.map(jnp.array, params))

    mesh = create_mesh(model_parallel_size=2)
    abstract = jax.eval_shape(init_fn)
    step_fn = make_train_step(model, transport, optimizer, cond, grad_clip=2.0)
    jitted, state_sh = make_sharded_train_step(mesh, step_fn, abstract, fsdp=True)
    # params materialize directly in their (TP x FSDP) global layout — the
    # multihost analogue of place_state without any host broadcast
    state = jax.jit(init_fn, out_shardings=state_sh)()

    # rank-DISTINCT local batches -> one global data-sharded batch
    rng = np.random.RandomState(100 + pid)
    local = {"x": rng.randn(4, 4, 16, 16).astype(np.float32),
             "cap_feats": rng.randn(4, 8, 32).astype(np.float32),
             "cap_mask": np.ones((4, 8), np.int32)}
    batch = form_global_batch(mesh, local)
    assert not batch["x"].is_fully_addressable  # genuinely cross-process

    state, metrics = jitted(state, batch, jax.random.PRNGKey(7))
    loss1 = float(metrics["loss"])

    # cross-process checkpoint: every process participates in the save
    path = save_checkpoint(results_dir, 1, state)
    restored = load_checkpoint(path, state, free_placeholder=False)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data), np.asarray(sb.data))
    # resume_step scalar comes back host-local; re-place it replicated
    repl = NamedSharding(mesh, P())
    restored = restored.replace(step=jax.make_array_from_process_local_data(
        repl, np.asarray(1, np.int32)))

    restored, metrics2 = jitted(restored, batch, jax.random.PRNGKey(8))
    loss2 = float(metrics2["loss"])
    print(json.dumps({"rank": pid, "loss1": round(loss1, 6),
                      "loss2": round(loss2, 6), "ckpt": path}), flush=True)


def launch(timeout_s: float = 900.0) -> dict:
    """Spawn the 2 worker processes; return the parsed rank records."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    results_dir = tempfile.mkdtemp(prefix="mp_dryrun_")
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # no tunnel chatter in children
        env["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                         if "device_count" not in f
                         and "concurrency_optimized_scheduler" not in f)
        # sequential thunk order: see __graft_entry__.dryrun_multichip
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4"
                            " --xla_cpu_enable_concurrency_optimized_scheduler=false").strip()
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--results_dir", results_dir],
            env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    records = {}
    fail = None
    for rank, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise RuntimeError(f"rank {rank} timed out after {timeout_s}s")
        if proc.returncode != 0 and fail is None:
            fail = (rank, proc.returncode, err.strip().splitlines()[-12:])
        for line in out.strip().splitlines():
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and "rank" in d:
                records[d["rank"]] = d
    if fail is not None:
        raise RuntimeError(f"rank {fail[0]} rc={fail[1]}: {fail[2]}")
    assert sorted(records) == [0, 1], f"missing rank records: {records}"
    assert records[0]["loss1"] == records[1]["loss1"], records
    assert records[0]["loss2"] == records[1]["loss2"], records
    return records


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--results_dir", default="/tmp/mp_dryrun")
    p.add_argument("--timeout", type=float, default=900.0)
    args = p.parse_args()
    if args.worker:
        worker(args.results_dir)
        return
    records = launch(args.timeout)
    print(json.dumps({"multiprocess_dryrun": "ok", **{
        f"rank{r}": records[r] for r in records}}))


if __name__ == "__main__":
    main()
