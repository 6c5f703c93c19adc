"""Training-step machinery: the TPU-native core of the reference trainer
(`lumina_next_t2i/train.py:256-680`).

What maps where:
- FSDP wrapping + mixed precision (`train.py:171-204`) -> parameter sharding
  rules over the mesh (`parallel/sharding.py`) + bf16 compute dtype on the
  model with fp32 params/grads;
- TP-aware grad clipping (`grad_norm.py:10-60`) -> a plain global-norm clip:
  under GSPMD the L2 norm of the sharded grad pytree is computed with XLA
  inserting the cross-shard reductions, so no hand-written "count TP params
  once" logic is needed;
- EMA deepcopy + per-step decay (`train.py:107-118,583`) -> a sharded pytree
  updated inside the same jitted step;
- gradient accumulation with no_sync (`train.py:551-571`) -> lax.scan over
  micro-batches inside the compiled step (no sync to skip: there is exactly
  one gradient reduction either way);
- the whole step (loss, backward, clip, optimizer, EMA) is ONE jit program.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import AXIS_DATA
from ..parallel.sharding import param_shardings
from ..transport.transport import Transport


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any


def create_optimizer(lr: float = 1e-4, weight_decay: float = 0.0,
                     warmup_steps: int = 0, max_steps: Optional[int] = None):
    """AdamW matching the reference's `torch.optim.AdamW(lr, wd)`
    (`train.py:449`), with optional linear warmup."""
    if warmup_steps > 0:
        sched = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        sched = lr
    return optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=weight_decay)


class FusedAdamWEMA:
    """Single-pass AdamW + EMA: one fused read-modify-write per parameter
    tensor (reads g, m, v, p, ema; writes m, v, p, ema) with the grad-clip
    scale folded in — instead of optax's chain (clip rewrite of the grad
    tree, scale_by_adam, weight decay, lr scale, apply_updates, separate EMA
    pass), each a full HBM pass over ~2.4 GB at 600M fp32. Same math as
    `create_optimizer` (AdamW + bias correction + linear warmup); the opt
    state mirrors the no-warmup `optax.adamw` chain layout
    ``(ScaleByAdamState, EmptyState, EmptyState)`` so sharding rules and
    Orbax checkpoints are interchangeable with ``--fused_optimizer`` on or
    off (warmup runs differ: optax keeps the schedule count in a
    ScaleByScheduleState third element instead).
    """

    def __init__(self, lr: float = 1e-4, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.0, warmup_steps: int = 0):
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.weight_decay, self.warmup_steps = weight_decay, warmup_steps

    def init(self, params):
        adam = optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )
        return (adam, optax.EmptyState(), optax.EmptyState())

    def step(self, grads, params, opt_state, ema, ema_decay: float, scale,
             rng=None):
        """-> (params, opt_state, ema). `scale` is the grad-clip multiplier,
        applied inline (no scaled-grad tree is materialized). `rng` is
        accepted for interface parity with FusedAdafactorEMA (unused)."""
        del rng
        # accept the bare pre-r2 layout too (checkpoints saved before the
        # chain-tuple wrapper)
        adam = opt_state[0] if isinstance(opt_state, tuple) else opt_state
        count = adam.count + 1
        lr = self.lr
        if self.warmup_steps > 0:
            # match optax.linear_schedule's step indexing (count starts at 0
            # on the first update: lr 0 -> full lr after warmup_steps updates)
            lr = self.lr * jnp.minimum(1.0, (count - 1) / self.warmup_steps)
        b1c = 1.0 - self.b1 ** count.astype(jnp.float32)
        b2c = 1.0 - self.b2 ** count.astype(jnp.float32)

        def upd(g, p, m, v, e):
            g32 = g.astype(jnp.float32) * scale
            m2 = self.b1 * m + (1.0 - self.b1) * g32
            v2 = self.b2 * v + (1.0 - self.b2) * g32 * g32
            step_dir = (m2 / b1c) / (jnp.sqrt(v2 / b2c) + self.eps)
            p2 = p - lr * (step_dir + self.weight_decay * p)
            e2 = e * ema_decay + (1.0 - ema_decay) * p2
            return p2, m2.astype(m.dtype), v2.astype(v.dtype), e2.astype(e.dtype)

        g_l, treedef = jax.tree.flatten(grads)
        p_l = treedef.flatten_up_to(params)
        m_l = treedef.flatten_up_to(adam.mu)
        v_l = treedef.flatten_up_to(adam.nu)
        e_l = treedef.flatten_up_to(ema)
        outs = [upd(g, p, m, v, e) for g, p, m, v, e in zip(g_l, p_l, m_l, v_l, e_l)]
        new_p = jax.tree.unflatten(treedef, [o[0] for o in outs])
        new_m = jax.tree.unflatten(treedef, [o[1] for o in outs])
        new_v = jax.tree.unflatten(treedef, [o[2] for o in outs])
        new_e = jax.tree.unflatten(treedef, [o[3] for o in outs])
        new_adam = optax.ScaleByAdamState(count=count, mu=new_m, nu=new_v)
        return new_p, (new_adam, optax.EmptyState(), optax.EmptyState()), new_e


def _sr_noise_bits(key, shape):
    """uint32 noise for stochastic rounding. LUMINA_SR_PRNG selects:

    - `hash` (default): murmur3-finalizer hash of (element index ^ key) —
      a uint32 bijection per key, so the low bits are exactly uniform
      marginally, and it is pure element-wise ALU that XLA fuses INTO the
      parameter-store pass. Measured on the 2B optimizer pass (256px B8,
      one v5e): threefry costs +57 ms/step over no-SR and XLA's hardware
      RngBitGenerator +47 ms (both materialize multi-GB noise operands);
      the fused hash is free to within noise. Rounding noise needs no
      counter-based crypto guarantee — unbiasedness per store + decorrelation
      across steps (the key folds in step/leaf) is the whole requirement.
    - `threefry`: jax.random.bits — bit-reproducible with historical runs.
    - `rbg`: XLA RngBitGenerator (kept for measurement comparisons).
    """
    impl = os.environ.get("LUMINA_SR_PRNG", "hash")
    if impl in ("hash", "rbg"):
        raw = key if jnp.issubdtype(jnp.asarray(key).dtype, jnp.integer) \
            else jax.random.key_data(key)
        kd = jnp.ravel(raw).astype(jnp.uint32)
        if impl == "hash":
            n = 1
            for s in shape:
                n *= int(s)
            h = jax.lax.iota(jnp.uint32, max(n, 1)) ^ kd[0]
            # murmur3 fmix32: full-avalanche uint32 bijection
            h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
            h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
            h = h ^ (h >> 16) ^ kd[-1]
            return h.reshape(shape)
        k4 = jnp.concatenate([kd, kd ^ jnp.uint32(0x9E3779B9)])[:4]
        _, bits = jax.lax.rng_bit_generator(k4, shape, dtype=jnp.uint32)
        return bits
    return jax.random.bits(key, shape, jnp.uint32)


def _stochastic_round_bf16(x32, key):
    """Unbiased fp32 -> bf16 rounding: add uniform noise in [0, 1ulp) to the
    low 16 mantissa bits, then truncate. E[result] == x32 exactly, so tiny
    per-step updates (lr * clip ~= 1e-4 relative) that round-to-nearest would
    erase from a bf16 accumulator survive in expectation — the standard
    recipe for keeping weights/EMA in bf16 without fp32 master copies.
    Non-finite inputs are irrelevant here: the trainer's skipped-step guard
    discards any non-finite update before it is stored."""
    bits = jax.lax.bitcast_convert_type(x32.astype(jnp.float32), jnp.uint32)
    noise = _sr_noise_bits(key, x32.shape) & jnp.uint32(0xFFFF)
    hi = ((bits + noise) >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(hi, jnp.bfloat16)


class FactoredStats(struct.PyTreeNode):
    """Adafactor second-moment state: per-leaf factored row/col statistics
    (sublinear memory) or a full `v` where factoring does not apply. Mirrors
    optax's FactoredState fields so the layouts are trivially comparable;
    non-applicable slots hold shape-(1,) zeros exactly like optax so the
    three trees all share the params treedef."""
    count: jax.Array
    v_row: Any
    v_col: Any
    v: Any


class FusedAdafactorEMA:
    """Single-pass Adafactor (+EMA): sublinear optimizer memory for training
    models whose AdamW state cannot fit HBM (the 2B flagship: params+mu+nu+
    EMA is >= 18.4 GB even all-bf16, vs ~9.3 GB here with bf16 params+EMA —
    the reference needs >=32 GPUs for the same recipe,
    `lumina_t2i/exps/5B_bs512_lr1e-4_bf16_1024px_sdxlvae.sh`).

    Math matches `optax.adafactor(learning_rate=lr, min_dim_size_to_factor,
    decay_rate=0.8, multiply_by_parameter_scale=True, clipping_threshold=1.0,
    momentum=None, weight_decay_rate=wd or None)` exactly at fp32 (pinned in
    tests/test_optimizers.py), with two TPU-first deviations:

    - factored stats are ALWAYS stored fp32 (optax stores them in the param
      dtype): they are sublinear, so fp32 costs nothing and keeps the decay
      recursion exact when params are bf16;
    - when params/EMA are stored bf16, updates are written back with
      stochastic rounding (`_stochastic_round_bf16`, rng threaded from the
      train step): round-to-nearest at bf16's 8-bit mantissa would silently
      drop sub-ulp updates and stall training; stochastic rounding is
      unbiased, so the expected trajectory is the fp32 one.

    Like FusedAdamWEMA this is ONE read-modify-write pass per parameter
    tensor with the grad-clip scale and the EMA update folded in, and the
    state layout is the same 3-tuple shape `(stats, EmptyState, EmptyState)`
    so the sharding walk and checkpoint code paths are shared.
    """

    def __init__(self, lr: float = 1e-4, decay_rate: float = 0.8,
                 clipping_threshold: float = 1.0, min_dim_size_to_factor: int = 128,
                 multiply_by_parameter_scale: bool = True, eps: float = 1e-30,
                 weight_decay: float = 0.0, warmup_steps: int = 0,
                 stochastic_rounding: bool = True):
        self.lr, self.decay_rate = lr, decay_rate
        self.clipping_threshold = clipping_threshold
        self.min_dim_size_to_factor = min_dim_size_to_factor
        self.multiply_by_parameter_scale = multiply_by_parameter_scale
        self.eps, self.weight_decay = eps, weight_decay
        self.warmup_steps = warmup_steps
        self.stochastic_rounding = stochastic_rounding

    def _factored_dims(self, shape):
        """The two largest axes, both >= min_dim_size_to_factor, else None —
        optax's `_factored_dims` (stable argsort ties resolve identically)."""
        if len(shape) < 2:
            return None
        import numpy as np
        order = np.argsort(shape)
        if shape[order[-2]] < self.min_dim_size_to_factor:
            return None
        return int(order[-2]), int(order[-1])

    def init(self, params):
        def _init(p):
            fd = self._factored_dims(p.shape)
            # distinct buffers per slot: aliased placeholders would trip
            # "donated the same buffer twice" under donate_argnums
            z1 = lambda: jnp.zeros((1,), jnp.float32)
            if fd is not None:
                d1, d0 = fd
                vr = jnp.zeros(tuple(s for i, s in enumerate(p.shape) if i != d0),
                               jnp.float32)
                vc = jnp.zeros(tuple(s for i, s in enumerate(p.shape) if i != d1),
                               jnp.float32)
                return vr, vc, z1()
            return z1(), z1(), jnp.zeros(p.shape, jnp.float32)

        leaves, treedef = jax.tree.flatten(params)
        outs = [_init(p) for p in leaves]
        stats = FactoredStats(
            count=jnp.zeros((), jnp.int32),
            v_row=jax.tree.unflatten(treedef, [o[0] for o in outs]),
            v_col=jax.tree.unflatten(treedef, [o[1] for o in outs]),
            v=jax.tree.unflatten(treedef, [o[2] for o in outs]),
        )
        return (stats, optax.EmptyState(), optax.EmptyState())

    def step(self, grads, params, opt_state, ema, ema_decay: float, scale,
             rng=None):
        """-> (params, opt_state, ema); same contract as FusedAdamWEMA.step.
        `rng` drives stochastic rounding for bf16 params/EMA (optional: when
        None, bf16 stores fall back to round-to-nearest)."""
        stats = opt_state[0] if isinstance(opt_state, tuple) else opt_state
        count = stats.count + 1
        # optax `_decay_rate_pow(pre-increment count)`: t = count_new
        decay = 1.0 - count.astype(jnp.float32) ** (-self.decay_rate)
        lr = self.lr
        if self.warmup_steps > 0:
            lr = self.lr * jnp.minimum(1.0, (count - 1) / self.warmup_steps)

        def upd(i, g, p, vr, vc, v, e):
            g32 = g.astype(jnp.float32) * scale
            p32 = p.astype(jnp.float32)
            gsq = g32 * g32 + self.eps
            fd = self._factored_dims(p.shape)
            if fd is not None:
                d1, d0 = fd
                vr2 = decay * vr + (1.0 - decay) * jnp.mean(gsq, axis=d0)
                vc2 = decay * vc + (1.0 - decay) * jnp.mean(gsq, axis=d1)
                reduced_d1 = d1 - 1 if d1 > d0 else d1
                row_col_mean = jnp.mean(vr2, axis=reduced_d1, keepdims=True)
                row_factor = (vr2 / row_col_mean) ** -0.5
                col_factor = vc2 ** -0.5
                u = (g32 * jnp.expand_dims(row_factor, d0)
                     * jnp.expand_dims(col_factor, d1))
                v2 = v
            else:
                v2 = decay * v + (1.0 - decay) * gsq
                u = g32 * v2 ** -0.5
                vr2, vc2 = vr, vc
            if self.clipping_threshold is not None:
                clip_denom = jnp.maximum(
                    1.0, jnp.sqrt(jnp.mean(u * u)) / self.clipping_threshold)
                u = u / clip_denom
            u = u * lr
            if self.multiply_by_parameter_scale:
                u = u * jnp.maximum(jnp.sqrt(jnp.mean(p32 * p32)), 1e-3)
            if self.weight_decay:
                u = u + self.weight_decay * p32
            p2 = p32 - u
            e2 = e.astype(jnp.float32) * ema_decay + (1.0 - ema_decay) * p2

            def store(x32, tmpl, salt):
                if tmpl.dtype == jnp.bfloat16 and self.stochastic_rounding \
                        and rng is not None:
                    return _stochastic_round_bf16(
                        x32, jax.random.fold_in(rng, 2 * i + salt))
                return x32.astype(tmpl.dtype)

            return store(p2, p, 0), vr2, vc2, v2, store(e2, e, 1)

        g_l, treedef = jax.tree.flatten(grads)
        p_l = treedef.flatten_up_to(params)
        vr_l = treedef.flatten_up_to(stats.v_row)
        vc_l = treedef.flatten_up_to(stats.v_col)
        v_l = treedef.flatten_up_to(stats.v)
        e_l = treedef.flatten_up_to(ema)
        outs = [upd(i, *z) for i, z in enumerate(zip(g_l, p_l, vr_l, vc_l, v_l, e_l))]
        unf = lambda k: jax.tree.unflatten(treedef, [o[k] for o in outs])
        new_stats = FactoredStats(count=count, v_row=unf(1), v_col=unf(2), v=unf(3))
        return unf(0), (new_stats, optax.EmptyState(), optax.EmptyState()), unf(4)


def autocalibrate_flash_static_max_train(
    model, params, batch: Dict[str, Any],
    cond_kwargs_fn: Callable[[Dict], Dict],
    probe_ts=(0.02, 0.25, 0.5, 0.75, 0.98),
    margin: float = 8.0, spread_limit: float = 60.0, rng=None,
    path_sampler=None,
) -> Optional[float]:
    """Trainer-side static-max flash calibration (VERDICT r3 #5).

    Sampling pipelines already calibrate (`sample_lib.
    autocalibrate_flash_static_max`); this is the train-step counterpart:
    probe the model at the first batch's shapes across the t range the
    lognorm/uniform samplers cover, read the sown lse ranges, install
    `bound = max(lse) + margin` via `set_flash_static_max_train` (the
    TRAIN-only slot — a sampling-side calibration or LUMINA_FLASH_STATIC_MAX
    inference pin in the same process never applies here) so BOTH forward
    executions of a remat train step (the primal pass and the bwd recompute
    through `_fwd`) run the fixed-bound kernels.

    Train-specific caveats vs the sampling calibrator:
    - weights MOVE during training, so the bound drifts; the margin default
      is higher (8 vs 6) and the kernel's exp clamp turns any residual
      excess into bounded accuracy loss, never NaN. Each process start
      (including every `--auto_resume` chunk of a soak) re-calibrates at
      the current weights.
    - guards mirror the sampler's: returns None (leaving online-max kernels)
      when an env pin/AUTO=0 is set, the model has no qk-norm, flash is not
      the active impl, or the self-attention sequence fits the single-pass
      small-KV kernel (which computes its max for free).
    - `path_sampler` (the transport's `Transport.path_sampler`) supplies the
      xt interpolant so the probed logit distribution matches the REAL
      training distribution for VP/GVP transports too; falls back to the
      linear path when omitted (e.g. from legacy call sites).
    """
    import math
    import os

    from ..ops.attention import resolve_impl
    from ..ops.flash_attention import set_flash_static_max_train, streams_kv

    if os.environ.get("LUMINA_FLASH_STATIC_MAX_TRAIN", ""):
        return None
    if os.environ.get("LUMINA_FLASH_STATIC_MAX_AUTO", "1") == "0":
        return None
    set_flash_static_max_train(None)
    if not getattr(model, "qk_norm", False):
        return None
    if resolve_impl(getattr(model, "attn_impl", "auto")) != "flash":
        return None
    x1 = batch["x"]
    seq_len = (x1.shape[-2] // model.patch_size) * (x1.shape[-1] // model.patch_size)
    if not streams_kv(seq_len):
        return None

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, x1.shape, jnp.float32)

    def probe(t_scalar):
        t = jnp.full((x1.shape[0],), t_scalar, jnp.float32)
        if path_sampler is not None:
            xt, _ = path_sampler.interpolant(t, x0, x1)
        else:
            texp = t.reshape((-1,) + (1,) * (x1.ndim - 1))
            xt = texp * x1 + (1.0 - texp) * x0  # linear path, transport.py:141-144
        _, updates = model.apply(
            {"params": params}, xt, t, train=True,
            rngs={"label_dropout": jax.random.fold_in(rng, 1)},
            mutable=["calibration"], **cond_kwargs_fn(batch),
        )
        leaves = jax.tree_util.tree_leaves(updates)
        if not leaves:
            raise _NoTrainStreamingSites()
        mx = jnp.max(jnp.stack([jnp.max(l[..., 0]) for l in leaves]))
        mn = jnp.min(jnp.stack([jnp.min(l[..., 1]) for l in leaves]))
        return mx, mn

    os.environ["LUMINA_FLASH_CALIBRATE"] = "1"
    try:
        step = jax.jit(probe)
        gmax, gmin = -jnp.inf, jnp.inf
        for t in probe_ts:
            mx, mn = step(float(t))
            gmax = max(gmax, float(mx))
            gmin = min(gmin, float(mn))
    except _NoTrainStreamingSites:
        return None
    finally:
        os.environ.pop("LUMINA_FLASH_CALIBRATE", None)

    if not math.isfinite(gmax) or not math.isfinite(gmin) or gmax - gmin > spread_limit:
        return None
    bound = gmax + margin
    set_flash_static_max_train(bound)
    return bound


class _NoTrainStreamingSites(Exception):
    """No attention site sowed a calibration range (trace-time signal)."""


def create_train_state(rng, model, example_batch: Dict[str, Any], optimizer,
                       cond_kwargs_fn: Callable[[Dict], Dict]):
    """Initialize params / optimizer / EMA from an example batch."""
    x = example_batch["x"]
    t = jnp.zeros((x.shape[0],), jnp.float32)
    init_rngs = {"params": rng, "label_dropout": jax.random.fold_in(rng, 1)}
    variables = model.init(init_rngs, x, t, **cond_kwargs_fn(example_batch))
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        # real copy (not aliased) — the step donates its input buffers
        ema_params=jax.tree.map(jnp.array, params),
    )


def make_train_step(
    model,
    transport: Transport,
    optimizer,
    cond_kwargs_fn: Callable[[Dict], Dict],
    grad_clip: float = 2.0,
    ema_decay: float = 0.9999,
    micro_batches: int = 1,
    loss_mask_fn: Optional[Callable[[Dict], Any]] = None,
    grad_dtype=None,
    grad_reduce_wrapper: Optional[Callable] = None,
):
    """Build the (un-jitted) train step; wrap with jit/shardings via
    `make_sharded_train_step`.

    cond_kwargs_fn(batch) -> model kwargs beyond (x, t), e.g.
    {"y": batch["y"]} or {"cap_feats": ..., "cap_mask": ...}.

    grad_dtype: dtype gradients are cast to right after the backward pass —
    micro-batch ACCUMULATION runs in this dtype (the reference's
    `--grad_precision`, `lumina_next_t2i/train.py:171-204`). Wire dtypes
    (measured from compiled SPMD HLO, pinned in tests/test_sharding_hlo.py
    TestCollectiveDtypes): under plain GSPMD the data-axis gradient
    all-reduce runs in fp32 — matching the reference's default
    `--grad_precision fp32` exactly. A bandwidth-exact reduced-precision
    REDUCE is not expressible as a cast under GSPMD: the partitioner inserts
    the reduction at the grad-production dot and will not commute a user
    cast across it (verified with pre-cast param trees, sharding constraints
    and optimization_barrier — all still produced f32 collectives). The
    bf16 wire is instead provided by `make_grad_reduce_wrapper` (a
    partially-manual shard_map; pass it as `grad_reduce_wrapper`), matching
    FSDP's `reduce_dtype=bf16` semantics. Clipping, the grad-norm metric,
    and the optimizer update always run in fp32.

    grad_reduce_wrapper: optional transform of the local-gradients function
    (params, batch, drop_rng, loss_rng) -> (loss, grads); when given, IT owns
    the data-axis reduction (see `make_grad_reduce_wrapper`), otherwise the
    reduction is GSPMD's implicit fp32 all-reduce.
    """
    cast_grads = (
        (lambda g: jax.tree.map(lambda a: a.astype(grad_dtype), g))
        if grad_dtype is not None else (lambda g: g)
    )

    def compute_grads(params, batch, drop_rng, loss_rng):
        def loss_fn(p):
            def model_fn(xt, t):
                return model.apply(
                    {"params": p}, xt, t, train=True,
                    rngs={"label_dropout": drop_rng}, **cond_kwargs_fn(batch),
                )

            loss_mask = loss_mask_fn(batch) if loss_mask_fn else None
            terms = transport.training_losses(loss_rng, model_fn, batch["x"], loss_mask=loss_mask)
            return terms["loss"].mean(), terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, terms, grads

    def local_grads(params, batch, drop_rng, loss_rng):
        """(loss, grads) with micro-batch accumulation folded in. Makes no
        promise about the data-axis reduction: under plain jit GSPMD reduces
        at the backward dots (fp32); under `grad_reduce_wrapper` this body
        runs per data shard and the wrapper owns the (one) reduce — which is
        also why accumulation lives inside it, mirroring DDP no_sync
        (`lumina_next_t2i/train.py:551-571`): accumulate locally, reduce
        once."""
        if micro_batches == 1:
            loss, _, grads = compute_grads(params, batch, drop_rng, loss_rng)
            return loss, cast_grads(grads)
        # micro-batch accumulation as a scan: reshape (B, ...) ->
        # (micro, B/micro, ...) and average grads
        def slice_batch(b, i):
            return jax.tree.map(
                lambda a: a.reshape(micro_batches, -1, *a.shape[1:])[i], b
            )

        def body(carry, i):
            acc_grads, acc_loss = carry
            mb = slice_batch(batch, i)
            l, _, g = compute_grads(
                params, mb, jax.random.fold_in(drop_rng, i), jax.random.fold_in(loss_rng, i)
            )
            return (jax.tree.map(jnp.add, acc_grads, cast_grads(g)), acc_loss + l), None

        zero = jax.tree.map(
            lambda p: jnp.zeros(p.shape, grad_dtype or p.dtype), params
        )
        (grads, loss), _ = jax.lax.scan(
            body, (zero, jnp.zeros(())), jnp.arange(micro_batches)
        )
        grads = jax.tree.map(lambda g: g / micro_batches, grads)
        return loss / micro_batches, grads

    grads_fn = grad_reduce_wrapper(local_grads) if grad_reduce_wrapper else local_grads

    def train_step(state: TrainState, batch: Dict[str, Any], rng):
        step_rng = jax.random.fold_in(rng, state.step)
        drop_rng, loss_rng = jax.random.split(step_rng)
        if batch["x"].dtype == jnp.uint8:
            # --h2d_diet pixel-space path: images crossed the wire as uint8;
            # dequantize in-graph (exact inverse of apply_h2d_diet's affine)
            batch = dict(batch)
            batch["x"] = batch["x"].astype(jnp.float32) / 127.5 - 1.0
        loss, grads = grads_fn(state.params, batch, drop_rng, loss_rng)

        # norm/clip in fp32 regardless of grad_dtype: an fp16 sum-of-squares
        # overflows past ~6e4 and a resulting inf norm would zero every grad
        grad_norm = optax.global_norm(
            jax.tree.map(lambda g: g.astype(jnp.float32), grads))
        if grad_clip is not None and grad_clip > 0:
            scale = jnp.minimum(1.0, grad_clip / (grad_norm + 1e-6))
        else:
            scale = jnp.ones(())
        # non-finite guard: a NaN/inf loss or grad would corrupt params and
        # moments irrecoverably. Resolve in-graph (no host sync): the update
        # below runs with scale 0 and its results are discarded in favor of
        # the old state; `metrics["skipped"]` reports it. (The reference has
        # no such guard — a bf16 overflow NaNs the torch run permanently.)
        skipped = ~(jnp.isfinite(grad_norm) & jnp.isfinite(loss))
        scale = jnp.where(skipped, 0.0, scale)

        if isinstance(optimizer, (FusedAdamWEMA, FusedAdafactorEMA)):
            # clip scale folded into the single fused pass — no scaled-grad
            # tree is ever materialized; the rng drives stochastic rounding
            # for bf16-stored params/EMA (Adafactor only)
            params, opt_state, ema = optimizer.step(
                grads, state.params, state.opt_state, state.ema_params,
                ema_decay, scale, rng=jax.random.fold_in(step_rng, 2))
        else:
            grads = jax.tree.map(
                lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype), grads)
            if grad_dtype is not None:  # optimizer math stays in param precision
                grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + (1.0 - ema_decay) * p, state.ema_params, params
            )
        # discard the (scale-0) update entirely on a skipped step so moments,
        # Adam count and weight decay see no effect; fuses into the optimizer
        # pass as a select, no extra HBM round-trip
        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(skipped, o, n), new, old)
        new_state = state.replace(
            step=state.step + 1,
            params=keep(params, state.params),
            opt_state=keep(opt_state, state.opt_state),
            ema_params=keep(ema, state.ema_params),
        )
        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "skipped": skipped.astype(jnp.int32)}
        return new_state, metrics

    return train_step


def make_grad_reduce_wrapper(mesh, reduce_dtype=jnp.bfloat16):
    """Bandwidth-exact data-axis gradient reduction, matching the torch
    FSDP `MixedPrecision(reduce_dtype=...)` wire contract the reference
    selects with `--grad_precision` (`lumina_next_t2i/train.py:171-204`).

    GSPMD will not commute a user cast across its implicit grad all-reduce
    (see `make_train_step` docstring), so the reduce is made explicit: a
    partially-manual `jax.shard_map` — MANUAL over the data axis (the
    local-gradient body runs per data shard, then one
    `psum(bf16)` -> fp32), AUTO over the model axis (the TP sharding inside
    the model still partitions via GSPMD). Halves DP gradient wire bytes.

    Only valid when parameters are replicated over the data axis
    (`--data_parallel sdp`): under FSDP the params/grads are themselves
    data-sharded and the boundary in/out specs here would silently
    all-gather them, trading the wire win for a bigger one.

    Sampling decorrelation: GSPMD draws batch randomness (t, noise, dropout)
    from one global stream it partitions; a manual shard must fold its own
    data coordinate into the keys or every shard would sample identical
    t/noise patterns.

    Implementation note — why there is no psum inside the shard_map: XLA
    (jax 0.9 vintage) miscompiles reduced-precision collectives inside a
    PARTIALLY-manual region (the SPMD partitioner rewrites the bf16
    all-reduce's reduction region root into a `copy`, and a later pass
    aborts with "Invalid binary instruction opcode copy"; fp32 psum is
    fine, full-manual is fine). So the region emits its per-shard grads
    cast to `reduce_dtype` stacked on a new leading axis (out_spec over the
    data axis = no boundary communication), and the reduction is a plain
    `sum` in auto/GSPMD-land with an explicit `reduce_dtype` accumulator —
    which the partitioner turns into the desired reduced-precision
    all-reduce (`jnp.sum` without the dtype= would silently re-promote the
    accumulation, and the wire, to f32).
    """
    n_data = mesh.shape[AXIS_DATA]

    def wrap(local_grads):
        def body(params, batch, drop_rng, loss_rng):
            idx = jax.lax.axis_index(AXIS_DATA)
            loss, grads = local_grads(
                params, batch,
                jax.random.fold_in(drop_rng, idx), jax.random.fold_in(loss_rng, idx))
            return loss[None], jax.tree.map(
                lambda g: g.astype(reduce_dtype)[None], grads)

        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(AXIS_DATA), P(), P()),
            out_specs=(P(AXIS_DATA), P(AXIS_DATA)),
            axis_names=frozenset({AXIS_DATA}),
            check_vma=False,
        )

        def wrapped(params, batch, drop_rng, loss_rng):
            losses, stacked = sm(params, batch, drop_rng, loss_rng)
            # global-batch-mean grads = mean of the per-shard local-mean
            # grads; the cross-shard sum IS the wire (n_data-sharded axis 0)
            grads = jax.tree.map(
                lambda g: (jnp.sum(g, axis=0, dtype=reduce_dtype)
                           .astype(jnp.float32) / n_data),
                stacked)
            return jnp.mean(losses), grads

        return wrapped

    return wrap


def make_sharded_train_step(mesh, train_step, state, fsdp: bool = True):
    """jit the train step with explicit mesh shardings.

    - params/EMA/opt-state follow the TP+FSDP rules;
    - batch leaves shard their leading dim over 'data';
    - rng and metrics replicate.
    """
    p_sh = param_shardings(mesh, state.params, fsdp=fsdp)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(AXIS_DATA))
    state_sh = TrainState(step=repl, params=p_sh,
                          opt_state=_opt_state_shardings(mesh, state, p_sh), ema_params=p_sh)

    jitted = jax.jit(
        train_step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    return jitted, state_sh


def _opt_state_shardings(mesh, state, p_sh):
    """Adam moments share the param layout; Adafactor's non-factored full `v`
    leaves do too (ADVICE r4: without this branch the whole Adafactor state
    fell through to replicate-everything, duplicating full-shape v per chip
    under FSDP); factored row/col stats are sublinear so they replicate;
    scalars replicate."""
    repl = NamedSharding(mesh, P())

    def map_state(os):
        if isinstance(os, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=repl, mu=p_sh, nu=p_sh)
        if isinstance(os, FactoredStats):
            params_flat, treedef = jax.tree.flatten(state.params)
            psh_flat = jax.tree.leaves(p_sh)
            v_flat = jax.tree.leaves(os.v)
            # full-shape v (unfactored leaf) follows the param layout; the
            # (1,) placeholder it holds for factored leaves replicates
            v_sh = [s if v.shape == p.shape else repl
                    for p, s, v in zip(params_flat, psh_flat, v_flat)]
            return FactoredStats(
                count=repl,
                v_row=jax.tree.map(lambda _: repl, os.v_row),
                v_col=jax.tree.map(lambda _: repl, os.v_col),
                v=jax.tree.unflatten(treedef, v_sh),
            )
        if isinstance(os, tuple) and not hasattr(os, "_fields"):
            return tuple(map_state(o) for o in os)
        return jax.tree.map(lambda _: repl, os)

    return map_state(state.opt_state)


def place_state(mesh, state, fsdp: bool = True) -> TrainState:
    """Device-put a host TrainState onto the mesh with the rule layout."""
    p_sh = param_shardings(mesh, state.params, fsdp=fsdp)
    repl = NamedSharding(mesh, P())
    sh = TrainState(step=repl, params=p_sh,
                    opt_state=_opt_state_shardings(mesh, state, p_sh), ema_params=p_sh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, sh)
