"""Parameter sharding rules: GSPMD re-design of fairscale TP + torch FSDP.

The reference encodes tensor parallelism structurally — every weight is a
fairscale `ColumnParallelLinear` / `RowParallelLinear` / `ParallelEmbedding`
(`lumina_next_t2i/models/model.py:16-17` et al.), and `grad_norm.py:10-30`
re-derives "which dim is sharded" by isinstance checks. Here the same layout
is *data*: path-pattern rules assign a PartitionSpec to each parameter —

- column-parallel kernels (wq/wk/wv/wk_y/wv_y/w1/w3, x_embedder) shard their
  output dim over the 'model' axis;
- row-parallel kernels (wo/w2) shard their input dim over 'model';
- everything else (norm scales, adaLN, gates, embedders, tokens) replicates
  over 'model';
- with fsdp=True, the remaining large kernel dim additionally shards over
  'data' — the ZeRO-3 layout of PyTorch FSDP FULL_SHARD
  (`train.py:171-204`), with XLA inserting the all-gathers per layer.

Rules right-align to the array rank, so they apply unchanged to nn.scan's
stacked (n_layers, ...) parameters.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DATA, AXIS_MODEL

# (path regex, spec for the trailing dims). Matched against '/'-joined path.
_COLUMN = ("wq", "wk", "wv", "wk_y", "wv_y", "w1", "w3")
_ROW = ("wo", "w2")

_RULES = [
    # attention / ffn column-parallel: kernel (in, out) -> shard out
    (rf"({'|'.join(_COLUMN)})/kernel$", ("fsdp", AXIS_MODEL)),
    # row-parallel: kernel (in, out) -> shard in
    (rf"({'|'.join(_ROW)})/kernel$", (AXIS_MODEL, "fsdp")),
    # token/patch embedder: column-parallel with gathered output
    (r"x_embedder/kernel$", ("fsdp", AXIS_MODEL)),
    # label embedding table (vocab, dim): shard dim like ParallelEmbedding
    (r"y_embedder/embedding$", (None, AXIS_MODEL)),
    # big adaLN projections: shard output dim, fsdp input
    (r"adaLN_modulation/kernel$", ("fsdp", AXIS_MODEL)),
    # final projection
    (r"final_layer/linear/kernel$", ("fsdp", AXIS_MODEL)),
    # everything else: replicated (biases, norm scales, gates, tokens, t/cap
    # embedder MLPs are small)
]


def spec_for_param(path: str, ndim: int, fsdp: bool = False) -> P:
    """PartitionSpec for a parameter at `path` with rank `ndim`."""
    for pattern, tail in _RULES:
        if re.search(pattern, path):
            tail = tuple(
                (AXIS_DATA if fsdp else None) if a == "fsdp" else a for a in tail
            )
            lead = (None,) * (ndim - len(tail))
            return P(*(lead + tail))
    if fsdp and ndim >= 2:
        # shard the largest trailing dim of replicated-by-TP kernels over data
        return P(*((None,) * (ndim - 1) + (AXIS_DATA,)))
    return P()


def param_shardings(mesh: Mesh, params, fsdp: bool = False):
    """NamedSharding pytree matching `params` (works on pytrees of arrays or
    of jax.ShapeDtypeStruct)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for path, leaf in flat.items():
        spec = spec_for_param(path, leaf.ndim, fsdp=fsdp)
        # drop axes that don't divide the dim evenly (tiny dims, odd vocab)
        fixed = []
        for i, axis in enumerate(spec):
            if axis is None:
                fixed.append(None)
            else:
                size = mesh.shape[axis]
                fixed.append(axis if leaf.shape[i] % size == 0 else None)
        out[path] = NamedSharding(mesh, P(*fixed) if fixed else P())
    return traverse_util.unflatten_dict(out, sep="/")


def shard_params(mesh: Mesh, params, fsdp: bool = False):
    """Device-put params onto the mesh with the rule-derived layout."""
    shardings = param_shardings(mesh, params, fsdp=fsdp)
    return jax.tree.map(lambda p, s: jax.device_put(p, s), params, shardings)


def model_parallel_dim_dict(params) -> dict:
    """Debug helper: path -> sharded dim index (or None), the analogue of
    `get_model_parallel_dim_dict` (`grad_norm.py:10-30`)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for path, leaf in flat.items():
        spec = spec_for_param(path, leaf.ndim)
        dim = None
        for i, a in enumerate(spec):
            if a == AXIS_MODEL:
                dim = i
        out[path] = dim
    return out
