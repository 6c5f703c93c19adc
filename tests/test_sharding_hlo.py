"""Collective-structure tests: inspect compiled SPMD HLO on the virtual mesh.

Execution parity (test_sharding.py) proves the sharded programs are CORRECT;
these tests pin that they are also EFFICIENT — the GSPMD partitioner emits
the expected Megatron-style collective pattern for our PartitionSpec rules
(SURVEY.md §2.1: TP = sharding annotations, FSDP = data-axis param sharding)
and no pathological resharding:

- forward under TP: row-parallel all-reduces for the attention-out and FFN
  down projections; norm statistics reduced as tiny [batch, tokens] arrays
  (XLA keeps activations dim-sharded through the norms — the
  sequence-parallel pattern, stats travel instead of activations);
- no all-to-all anywhere (nothing here is expert-parallel);
- layers are scanned, so the per-block collectives appear ONCE in HLO —
  collective count is O(1) in depth, not O(n_layers);
- train step under TP+FSDP: param all-gathers and gradient reductions
  present, still no all-to-all.

Counts are pinned with small slack: a regression that re-shards activations
per block (e.g. a PartitionSpec rule change that breaks the column->row
pairing) multiplies these numbers and fails loudly.
"""

import re

import jax
import jax.numpy as jnp

from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet
from lumina_t2x_tpu.parallel import create_mesh, shard_params
from lumina_t2x_tpu.pipelines.train_lib import (
    create_optimizer,
    create_train_state,
    make_sharded_train_step,
    make_train_step,
    place_state,
)
from lumina_t2x_tpu.transport import create_transport

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
               "collective-permute")


def collective_counts(hlo: str):
    # match sync and async-start forms (the partitioner may emit either);
    # -done ops are excluded so async pairs count once
    return {op: len(re.findall(rf"= \S+ {op}(?:-start)?\(|= \(\S+[^)]*\) {op}(?:-start)?\(", hlo))
            for op in COLLECTIVES}


def tiny_model(n_layers=2):
    return NextDiTImageNet(dim=256, n_layers=n_layers, n_heads=8, multiple_of=64,
                           num_classes=8, attn_impl="xla")


def forward_hlo(n_layers=2):
    model = tiny_model(n_layers)
    b = 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 4, 16, 16))
    t = jnp.full((b,), 0.5)
    y = jnp.arange(b) % 8
    params = model.init(jax.random.PRNGKey(0), x, t, y)["params"]
    mesh = create_mesh(model_parallel_size=2)
    sharded = shard_params(mesh, params, fsdp=True)
    fn = jax.jit(lambda p, xx, tt, yy: model.apply({"params": p}, xx, tt, yy))
    return fn.lower(sharded, x, t, y).compile().as_text()


class TestForwardCollectives:
    def test_tp2_structure(self):
        c = collective_counts(forward_hlo())
        assert c["all-to-all"] == 0
        assert c["reduce-scatter"] == 0
        # row-parallel all-reduces must exist (attention out + FFN down)
        assert c["all-reduce"] >= 2
        # observed 12 / 3 / 21 (jax 0.8 era); slack for partitioner drift,
        # but a per-block resharding regression lands far above these
        assert c["all-reduce"] <= 18, c
        assert c["all-gather"] <= 6, c
        assert c["collective-permute"] <= 30, c

    def test_collectives_constant_in_depth(self):
        """Blocks are scanned: HLO contains the block body once, so the
        collective count must NOT grow with n_layers."""
        c2 = collective_counts(forward_hlo(n_layers=2))
        c4 = collective_counts(forward_hlo(n_layers=4))
        assert c2 == c4, (c2, c4)


class TestTrainStepCollectives:
    def test_tp2_fsdp_structure(self):
        model = tiny_model()
        batch = {"x": jax.random.normal(jax.random.PRNGKey(0), (8, 4, 16, 16)),
                 "y": jnp.arange(8) % 8}
        cond = lambda b: {"y": b["y"]}
        mesh = create_mesh(model_parallel_size=2)
        transport = create_transport("Linear", "velocity", snr_type="lognorm")
        opt = create_optimizer(lr=1e-3, weight_decay=0.01)
        state = create_train_state(jax.random.PRNGKey(0), model, batch, opt, cond)
        step = make_train_step(model, transport, opt, cond, grad_clip=2.0)
        jitted, _ = make_sharded_train_step(mesh, step, state, fsdp=True)
        state = place_state(mesh, state, fsdp=True)
        hlo = jitted.lower(state, batch, jax.random.PRNGKey(42)).compile().as_text()
        c = collective_counts(hlo)
        # FSDP must gather params (fwd + bwd) and reduce grads
        assert c["all-gather"] >= 2
        assert c["all-reduce"] >= 2
        # observed 55 / 19 / 9 / 35; generous slack, still far below a
        # per-layer-resharding blowup. The all-to-alls are the partitioner
        # resharding TINY per-param tensors (biases/norm scales, <= a few
        # hundred floats each) between grad and optimizer-state layouts —
        # benign; the cap catches a large-activation all-to-all regression.
        assert c["all-gather"] <= 80, c
        assert c["all-reduce"] <= 30, c
        assert c["collective-permute"] <= 16, c
        assert c["all-to-all"] <= 50, c


class TestCollectiveDtypes:
    """Pin the wire dtypes of the train step's collectives.

    The reference's FSDP mixed precision (`lumina_next_t2i/train.py:171-204`)
    defaults to fp32 gradient reduction (`--grad_precision fp32`); our GSPMD
    program reduces gradients in fp32 too — exactness pinned here. KNOWN
    LIMIT (documented in train_lib.make_train_step): GSPMD chooses
    gather-then-convert for the FSDP param all-gathers, so they run in fp32
    where FSDP's param_dtype=bf16 would ship bf16 (2x gather bytes on the
    data axis); experiments with pre-cast trees / sharding constraints /
    optimization_barrier did not move the partitioner's choice (r2 NOTES).
    If a future jax release flips this, the count assertions below will
    flag the (welcome) change.
    """

    def _hlo(self, grad_dtype=None):
        model = tiny_model()
        batch = {"x": jax.random.normal(jax.random.PRNGKey(0), (8, 4, 16, 16)),
                 "y": jnp.arange(8) % 8}
        cond = lambda b: {"y": b["y"]}
        mesh = create_mesh(model_parallel_size=2)
        transport = create_transport("Linear", "velocity", snr_type="lognorm")
        opt = create_optimizer(lr=1e-3)
        state = create_train_state(jax.random.PRNGKey(0), model, batch, opt, cond)
        step = make_train_step(model, transport, opt, cond, grad_clip=2.0,
                               grad_dtype=grad_dtype)
        jitted, _ = make_sharded_train_step(mesh, step, state, fsdp=True)
        state = place_state(mesh, state, fsdp=True)
        return jitted.lower(state, batch, jax.random.PRNGKey(42)).compile().as_text()

    def _dtype_counts(self, hlo, op):
        counts = {}
        for line in hlo.splitlines():
            if f" {op}(" in line or f" {op}-start(" in line:
                dt = line.split("=")[1].strip().lstrip("(").split("[")[0].strip()
                counts[dt] = counts.get(dt, 0) + 1
        return counts

    def test_fp32_grad_reduce_is_exact(self):
        hlo = self._hlo(grad_dtype=None)
        ar = self._dtype_counts(hlo, "all-reduce")
        # every gradient all-reduce runs in fp32 (no silent low-precision wire)
        assert set(ar) <= {"f32", "pred", "s32"}, ar
        assert ar.get("f32", 0) >= 2, ar
