"""SPMD pipeline parallelism (GPipe schedule) over a mesh axis.

The reference has NO pipeline parallelism (`SURVEY.md §2.1`: "Parallelism NOT
present ... no pipeline parallelism"); this is a TPU-native extension for
scaling depth across chips when tensor parallelism alone runs out of ICI
bandwidth.

Design (the standard JAX SPMD pipelining pattern, cf. the public scaling
playbooks): the layer-stacked parameters are split into S contiguous stages,
one stage per device along the `pipe` mesh axis. Inside `shard_map`, every
device runs the same program: at tick t it processes microbatch (t - stage)
— a bubble tick processes garbage and its output is masked out — then the
activations rotate stage -> stage+1 via `ppermute`. After M + S - 1 ticks,
stage S-1 has emitted all M microbatch outputs.

Total bubble fraction is (S-1)/(M+S-1); choose M >= 4*S for >80% utilization.

All control flow is a `lax.fori_loop` with static bounds — one compiled
program, no per-tick dispatch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def split_stages(stacked_params, n_stages: int):
    """Reshape layer-stacked params (L, ...) -> (S, L//S, ...).

    `stacked_params` is a pytree whose leaves carry the scan-over-layers
    leading axis (as produced by `nn.scan` in the models). The result's
    leading axis is the pipeline-stage axis to be sharded over `pipe`.
    """

    def f(x):
        l = x.shape[0]
        assert l % n_stages == 0, f"{l} layers not divisible by {n_stages} stages"
        return x.reshape(n_stages, l // n_stages, *x.shape[1:])

    return jax.tree.map(f, stacked_params)


def merge_stages(staged_params):
    """Inverse of split_stages: (S, L//S, ...) -> (L, ...)."""
    return jax.tree.map(lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), staged_params)


def gpipe_spmd(
    stage_fn: Callable,
    mesh: Mesh,
    axis: str = "pipe",
):
    """Build a pipelined apply function.

    Args:
      stage_fn: (stage_params, x, *per_mb, *broadcast) -> y. Runs ONE stage
        (its L//S layers, e.g. an inner `lax.scan`) on one microbatch. Pure.
      mesh: mesh containing `axis`.
      axis: the pipeline mesh axis name.

    Returns:
      apply(staged_params, xs, per_mb=(), broadcast=()) -> ys where
        staged_params: pytree with leading stage axis S (see split_stages),
        xs: (M, mb, ...) microbatched inputs, M microbatches,
        per_mb: tuple of pytrees whose leaves carry a leading (M, ...)
          microbatch axis — per-microbatch conditioning (e.g. adaLN input);
          each stage receives the slice matching the microbatch it is
          currently processing,
        broadcast: extra arrays passed to every stage invocation unchanged.
      The returned ys has the same (M, mb, ...) layout as xs.
    """
    n_stages = mesh.shape[axis]

    def _local(staged_params, xs, per_mb, broadcast):
        # staged_params leaves: (1, L//S, ...) — this device's stage slice.
        params = jax.tree.map(lambda x: x[0], staged_params)
        stage = jax.lax.axis_index(axis)
        m = xs.shape[0]
        ticks = m + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        ys0 = jnp.zeros_like(xs)
        state0 = jnp.zeros_like(xs[0])

        def tick(t, carry):
            state, ys = carry
            # stage 0 pulls microbatch t (clamped — bubble ticks recompute
            # the last microbatch and are masked out downstream)
            x_in = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), axis=0, keepdims=False
            )
            inp = jnp.where(stage == 0, x_in, state)
            # each stage works on microbatch (t - stage); clamp covers bubbles
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            mb_args = tuple(
                jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, mb_idx, 0, keepdims=False),
                    p,
                )
                for p in per_mb
            )
            y = stage_fn(params, inp, *mb_args, *broadcast)
            # last stage writes microbatch (t - S + 1) when valid
            out_idx = t - (n_stages - 1)
            valid = jnp.logical_and(out_idx >= 0, stage == n_stages - 1)
            w = jnp.clip(out_idx, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(ys, w, axis=0, keepdims=False)
            ys = jax.lax.dynamic_update_index_in_dim(
                ys, jnp.where(valid, y, cur), w, axis=0
            )
            state = jax.lax.ppermute(y, axis, perm)
            return state, ys

        _, ys = jax.lax.fori_loop(0, ticks, tick, (state0, ys0))
        # outputs live on the last stage; broadcast them to every member of
        # the pipe group so the result is replicated over `axis`
        ys = jax.lax.psum(
            jnp.where(stage == n_stages - 1, ys, jnp.zeros_like(ys)), axis
        )
        return ys

    from jax.experimental.shard_map import shard_map

    def apply(staged_params, xs, per_mb=(), broadcast=()):
        param_specs = jax.tree.map(lambda _: P(axis), staged_params)
        mb_specs = tuple(jax.tree.map(lambda _: P(), p) for p in per_mb)
        bcast_specs = tuple(jax.tree.map(lambda _: P(), b) for b in broadcast)
        f = shard_map(
            _local,
            mesh=mesh,
            in_specs=(param_specs, P(), mb_specs, bcast_specs),
            out_specs=P(),
            check_rep=False,
        )
        return f(staged_params, xs, per_mb, broadcast)

    return apply


def stage_shardings(mesh: Mesh, staged_params, axis: str = "pipe"):
    """NamedShardings placing each stage's slice on its pipe device."""
    return jax.tree.map(
        lambda _: NamedSharding(mesh, P(axis)), staged_params
    )
