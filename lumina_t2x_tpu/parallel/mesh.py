"""Device mesh construction.

TPU-native replacement for the reference's distributed runtime
(`lumina_next_t2i/parallel.py:12-91`): NCCL process groups + fairscale's 2-D
(model-parallel x data-parallel) mesh become a `jax.sharding.Mesh` with
('data', 'model') axes. The reference's intra-node / inter-node process-group
split (`parallel.py:54-81`) maps to axis ordering: the 'model' axis is placed
on the fastest (innermost, ICI-adjacent) devices, 'data' spans the rest —
so tensor-parallel collectives ride ICI while data-parallel gradient
reductions can cross DCN.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_MODEL = "model"


def distributed_init():
    """Multi-host bootstrap: the analogue of `distributed_init(args)`
    (`parallel.py:42-52`). Single-process environments are a no-op (the
    reference's world_size=1 "fake distributed" mode, `demo.py:84-87`).

    TPU pods / managed clusters set MEGASCALE_COORDINATOR_ADDRESS (or jax's
    own cluster autodetect applies) — bare `initialize()` handles those.
    Manual launches (incl. the 2-process CPU dryrun,
    `__graft_entry__.dryrun_multiprocess`) set JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID explicitly, mirroring torchrun's
    MASTER_ADDR/WORLD_SIZE/RANK contract the reference relies on
    (`parallel.py:12-47`)."""
    if "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
        return
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {}
    if "JAX_NUM_PROCESSES" in os.environ:
        kwargs = dict(num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                      process_id=int(os.environ["JAX_PROCESS_ID"]))
    jax.distributed.initialize(coordinator_address=addr, **kwargs)


def create_mesh(
    model_parallel_size: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    Args:
      model_parallel_size: size of the tensor-parallel axis (the reference's
        `--model_parallel_size`, `train.py:700`).
      devices: optional explicit device list (tests pass CPU devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel_size == 0, (
        f"{n} devices not divisible by model_parallel_size={model_parallel_size}"
    )
    # innermost devices (adjacent on ICI) carry the model axis
    arr = np.array(devices).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(arr, (AXIS_DATA, AXIS_MODEL))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P(AXIS_DATA))


def form_global_batch(mesh: Mesh, local_batch):
    """Assemble per-process local batches into global arrays sharded over the
    data axis (multi-host training; the analogue of the reference's per-rank
    DataLoader shards feeding FSDP, `train.py:496-520`).

    Single-process: a plain device_put with the batch sharding. Multi-host:
    each process contributes its local shard via
    `jax.make_array_from_process_local_data`.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sharding), local_batch)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        local_batch,
    )


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
