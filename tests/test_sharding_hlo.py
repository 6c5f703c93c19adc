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
import numpy as np

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


class TestGradReduceWire:
    """`make_grad_reduce_wrapper`: the bandwidth-exact bf16 gradient reduce
    (FSDP `reduce_dtype` semantics, `lumina_next_t2i/train.py:171-204`) as a
    partially-manual shard_map — manual over data, auto over model."""

    class _DetTransport:
        """Deterministic loss (no rng draws) so the GSPMD and shard_map paths
        are numerically comparable — the wrapper folds the data coordinate
        into the rngs, which changes any SAMPLED t/noise."""

        def training_losses(self, rng, model_fn, x, loss_mask=None):
            t = jnp.full((x.shape[0],), 0.5)
            pred = model_fn(x, t)
            return {"loss": jnp.mean((pred - x) ** 2, axis=(1, 2, 3))}

    def _build(self, wrapper=None, grad_dtype=None, transport=None,
               micro_batches=1):
        from lumina_t2x_tpu.pipelines.train_lib import make_grad_reduce_wrapper

        model = NextDiTImageNet(dim=256, n_layers=2, n_heads=8, multiple_of=64,
                                num_classes=8, class_dropout_prob=0.0,
                                attn_impl="xla")
        batch = {"x": jax.random.normal(jax.random.PRNGKey(0), (8, 4, 16, 16)),
                 "y": jnp.arange(8) % 8}
        cond = lambda b: {"y": b["y"]}
        mesh = create_mesh(model_parallel_size=2)
        transport = transport or self._DetTransport()
        opt = create_optimizer(lr=1e-3)
        state = create_train_state(jax.random.PRNGKey(0), model, batch, opt, cond)
        wrap = (make_grad_reduce_wrapper(mesh, reduce_dtype=wrapper)
                if wrapper is not None else None)
        step = make_train_step(model, transport, opt, cond, grad_clip=2.0,
                               grad_dtype=grad_dtype, grad_reduce_wrapper=wrap,
                               micro_batches=micro_batches)
        # sdp: params replicated over data (the wrapper's validity condition)
        jitted, _ = make_sharded_train_step(mesh, step, state, fsdp=False)
        return jitted, place_state(mesh, state, fsdp=False), batch

    def test_bf16_wire_hlo(self, tmp_path):
        """The data-axis gradient all-reduces are bf16 at the SPMD-partitioner
        output — the platform-independent wire dtype. (The FINAL CPU HLO
        re-promotes them to f32: the CPU backend's all-reduce-promotion /
        bf16 float-normalization legalization, which TPU — native bf16
        collectives — does not run. So the assertion reads the
        after_spmd-partitioning dump, not as_text().)"""
        jitted, state, batch = self._build(wrapper=jnp.bfloat16,
                                           grad_dtype=jnp.bfloat16)
        jitted.lower(state, batch, jax.random.PRNGKey(1)).compile(
            compiler_options={"xla_dump_to": str(tmp_path),
                              "xla_dump_hlo_pass_re": "spmd"})
        dumps = [p for p in tmp_path.iterdir()
                 if "after_spmd-partitioning" in p.name]
        assert dumps, sorted(p.name for p in tmp_path.iterdir())[:10]
        hlo = dumps[0].read_text()
        ar_lines = [ln for ln in hlo.splitlines()
                    if " all-reduce(" in ln or " all-reduce-start(" in ln]
        bf16_grad = [ln for ln in ar_lines if "= bf16[" in ln]
        # one bf16 reduce per (possibly XLA-combined) gradient leaf group
        assert len(bf16_grad) >= 1, ar_lines[:6]
        # and no non-scalar f32 all-reduce on the DATA axis remains: f32
        # reduces here are the model-axis activation reduces and scalar
        # loss/metric reduces. Data-axis groups stride by model size (2):
        # replica_groups like {{0,2,4,6},{1,3,5,7}} / [2,4]<=[4,2]T(1,0).
        f32_data = [ln for ln in ar_lines
                    if "= f32[" in ln and "f32[]" not in ln
                    and ("T(1,0)" in ln or "{0,2,4,6}" in ln)]
        assert not f32_data, f32_data[:3]

    def test_fp32_wire_matches_gspmd(self):
        """Same math, explicit vs implicit reduce: with an fp32 wire and a
        deterministic transport the shard_map path must reproduce the plain
        GSPMD step to fp32 tolerance."""
        key = jax.random.PRNGKey(3)
        j_ref, s_ref, batch = self._build(wrapper=None)
        j_sm, s_sm, _ = self._build(wrapper=jnp.float32)
        n_ref, m_ref = j_ref(s_ref, batch, key)
        n_sm, m_sm = j_sm(s_sm, batch, key)
        assert abs(float(m_ref["loss"]) - float(m_sm["loss"])) < 1e-5
        assert abs(float(m_ref["grad_norm"]) - float(m_sm["grad_norm"])) < 1e-4
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6),
            n_ref.params, n_sm.params)

    def test_bf16_wire_trains(self):
        """bf16 wire end-to-end: finite loss, params move, grads close to the
        fp32 wire (bf16 rounding of the reduce only)."""
        key = jax.random.PRNGKey(4)
        j16, s16, batch = self._build(wrapper=jnp.bfloat16, grad_dtype=jnp.bfloat16)
        j32, s32, _ = self._build(wrapper=jnp.float32)
        # the step donates its input state — snapshot params to host first
        before = jax.tree.map(np.asarray, s16.params)
        n16, m16 = j16(s16, batch, key)
        _, m32 = j32(s32, batch, key)
        assert int(m16["skipped"]) == 0 and np.isfinite(float(m16["loss"]))
        assert abs(float(m16["grad_norm"]) - float(m32["grad_norm"])) / (
            float(m32["grad_norm"]) + 1e-9) < 0.05
        moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(np.asarray(a) - b))),
                             n16.params, before)
        assert max(jax.tree.leaves(moved)) > 0

    def test_wire_quantizes_to_reduce_dtype(self):
        """Value-level proof the wire is bf16: per-shard gradients chosen so
        bf16 rounding is visible — the reduced gradient must match the
        round-then-sum value and must NOT match the full-precision sum."""
        from lumina_t2x_tpu.pipelines.train_lib import make_grad_reduce_wrapper

        mesh = create_mesh(model_parallel_size=2)  # data axis = 4
        n = mesh.shape["data"]

        def local_grads(params, batch, r1, r2):
            g = jnp.mean(batch) + params["w"]  # per-shard scalar offset
            return jnp.mean(batch), {"w": g}

        wrapped = jax.jit(make_grad_reduce_wrapper(
            mesh, reduce_dtype=jnp.bfloat16)(local_grads))
        # shard i (2 rows each) has mean 1.0 + (i+1)*1.5e-3 — inside bf16's
        # rounding step at 1.0 (2^-8 ≈ 3.9e-3), so bf16() floors it to 1.0
        shard_means = 1.0 + (np.arange(n) + 1) * 1.5e-3
        batch = jnp.asarray(np.repeat(shard_means, 2)[:, None] *
                            np.ones((1, 4), np.float32))
        params = {"w": jnp.zeros((4, 4), jnp.float32)}
        loss, grads = wrapped(params, batch, jax.random.PRNGKey(0),
                              jax.random.PRNGKey(1))
        got = float(np.asarray(grads["w"])[0, 0])
        unrounded = float(np.mean(shard_means))
        # the result sits ON the bf16 grid (both the cast and the reduce
        # accumulation are bf16; exact value depends on reduction order) ...
        assert got == float(jnp.asarray(got, jnp.bfloat16)), got
        assert abs(got - unrounded) < 2 * 2 ** -8, (got, unrounded)
        # ... where the full-precision mean does not: quantization happened
        assert abs(got - unrounded) > 1e-4, (got, unrounded)
        # the loss path is full precision (per-shard losses stacked, no cast)
        assert abs(float(loss) - unrounded) < 1e-6

    def test_micro_batch_accumulation_inside_wire(self):
        """no_sync semantics: micro-batch accumulation runs INSIDE the manual
        region (one reduce per step, `train.py:551-571`). With a
        deterministic transport, accumulating 2 micro-batches must equal the
        single-shot step exactly up to fp32 reduction order."""
        key = jax.random.PRNGKey(5)
        j1, s1, batch = self._build(wrapper=jnp.float32)
        j2, s2, _ = self._build(wrapper=jnp.float32, micro_batches=2)
        n1, m1 = j1(s1, batch, key)
        n2, m2 = j2(s2, batch, key)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
        assert abs(float(m1["grad_norm"]) - float(m2["grad_norm"])) < 1e-4
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6),
            n1.params, n2.params)
