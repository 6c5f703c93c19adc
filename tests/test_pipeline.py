"""Pipeline parallelism (GPipe SPMD schedule) tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lumina_t2x_tpu.parallel.pipeline import (
    gpipe_spmd,
    merge_stages,
    split_stages,
    stage_shardings,
)


def make_mesh(n, axis="pipe"):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), (axis,))


def toy_stack(n_layers, d, key):
    """Stacked per-layer (w, b) for y = tanh(x @ w + b)."""
    kw, kb = jax.random.split(key)
    return {
        "w": 0.5 * jax.random.normal(kw, (n_layers, d, d)),
        "b": 0.01 * jax.random.normal(kb, (n_layers, d)),
    }


def apply_layer(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def sequential_ref(params, xs):
    def one(x):
        def body(h, p):
            return apply_layer(p, h), None

        h, _ = jax.lax.scan(body, x, params)
        return h

    return jax.vmap(one)(xs)


def stage_fn(stage_params, x):
    def body(h, p):
        return apply_layer(p, h), None

    h, _ = jax.lax.scan(body, x, stage_params)
    return h


class TestSplitMerge:
    def test_roundtrip(self):
        p = toy_stack(8, 4, jax.random.PRNGKey(0))
        staged = split_stages(p, 4)
        assert staged["w"].shape == (4, 2, 4, 4)
        back = merge_stages(staged)
        np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(p["w"]))

    def test_indivisible_raises(self):
        p = toy_stack(6, 4, jax.random.PRNGKey(0))
        with pytest.raises(AssertionError):
            split_stages(p, 4)


class TestGPipe:
    @pytest.mark.parametrize("n_stages,m", [(2, 4), (4, 8), (8, 8), (4, 1)])
    def test_matches_sequential(self, n_stages, m):
        d = 8
        params = toy_stack(8, d, jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (m, 2, d))  # (M, mb, d)
        mesh = make_mesh(n_stages)
        staged = split_stages(params, n_stages)
        apply = gpipe_spmd(stage_fn, mesh, axis="pipe")
        with jax.set_mesh(mesh):
            out = apply(staged, xs)
        ref = sequential_ref(params, xs.reshape(m * 2, d).reshape(m, 2, d))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_jit_and_shardings(self):
        d = 8
        params = toy_stack(8, d, jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (8, 2, d))
        mesh = make_mesh(4)
        staged = split_stages(params, 4)
        staged = jax.device_put(staged, stage_shardings(mesh, staged))
        apply = gpipe_spmd(stage_fn, mesh)
        with jax.set_mesh(mesh):
            out = jax.jit(apply)(staged, xs)
        ref = sequential_ref(params, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gradients_flow(self):
        """Pipelined loss must differentiate w.r.t. every stage's params."""
        d = 4
        params = toy_stack(4, d, jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (4, 2, d))
        mesh = make_mesh(2)
        staged = split_stages(params, 2)
        apply = gpipe_spmd(stage_fn, mesh)

        def loss_pipe(p):
            return jnp.sum(apply(p, xs) ** 2)

        def loss_ref(p):
            return jnp.sum(sequential_ref(merge_stages(p), xs) ** 2)

        gp = jax.grad(loss_pipe)(staged)
        gr = jax.grad(loss_ref)(staged)
        for k in ("w", "b"):
            np.testing.assert_allclose(np.asarray(gp[k]), np.asarray(gr[k]),
                                       atol=1e-4, err_msg=k)
            assert np.abs(np.asarray(gp[k])).max() > 0

    def test_broadcast_args(self):
        """Extra conditioning arrays reach every stage unchanged."""
        d = 8
        params = toy_stack(8, d, jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (4, 2, d))
        cond = jax.random.normal(jax.random.PRNGKey(2), (d,))
        mesh = make_mesh(4)

        def stage_cond(stage_params, x, c):
            def body(h, p):
                return apply_layer(p, h) + c, None

            h, _ = jax.lax.scan(body, x, stage_params)
            return h

        def seq_ref(p, xs, c):
            def one(x):
                def body(h, pp):
                    return apply_layer(pp, h) + c, None

                h, _ = jax.lax.scan(body, x, p)
                return h

            return jax.vmap(one)(xs)

        staged = split_stages(params, 4)
        apply = gpipe_spmd(stage_cond, mesh)
        with jax.set_mesh(mesh):
            out = apply(staged, xs, broadcast=(cond,))
        np.testing.assert_allclose(np.asarray(out), np.asarray(seq_ref(params, xs, cond)),
                                   atol=1e-5)

    def test_per_microbatch_args(self):
        """Per-microbatch conditioning (adaLN-style) reaches the stage
        processing that microbatch."""
        d, m = 8, 8
        params = toy_stack(8, d, jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (m, 2, d))
        cond = jax.random.normal(jax.random.PRNGKey(2), (m, d))  # per microbatch
        mesh = make_mesh(4)

        def stage_cond(stage_params, x, c):
            def body(h, p):
                return apply_layer(p, h) + c[None, :], None

            h, _ = jax.lax.scan(body, x, stage_params)
            return h

        def seq_ref(p, xs, cond):
            def one(x, c):
                def body(h, pp):
                    return apply_layer(pp, h) + c[None, :], None

                h, _ = jax.lax.scan(body, x, p)
                return h

            return jax.vmap(one)(xs, cond)

        staged = split_stages(params, 4)
        apply = gpipe_spmd(stage_cond, mesh)
        with jax.set_mesh(mesh):
            out = apply(staged, xs, per_mb=(cond,))
        np.testing.assert_allclose(np.asarray(out), np.asarray(seq_ref(params, xs, cond)),
                                   atol=1e-5)


class TestGradPrecision:
    def test_bf16_grad_reduction_trains(self):
        """grad_dtype=bf16 (the reference's --grad_precision / FSDP
        MixedPrecision reduce_dtype) accumulates micro-batch grads in bf16
        and still converges on a learnable toy task."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet
        from lumina_t2x_tpu.pipelines.train_lib import (
            create_optimizer, create_train_state, make_train_step,
        )
        from lumina_t2x_tpu.transport import create_transport

        model = NextDiTImageNet(dim=32, n_layers=2, n_heads=4, multiple_of=16,
                                num_classes=4, class_dropout_prob=0.0, attn_impl="xla")
        rng = np.random.default_rng(0)
        batch = {"x": jnp.asarray(rng.standard_normal((8, 4, 8, 8)).astype(np.float32) * 0.01),
                 "y": jnp.zeros((8,), jnp.int32)}
        cond = lambda b: {"y": b["y"]}
        opt = create_optimizer(2e-3)
        state = create_train_state(jax.random.PRNGKey(0), model, batch, opt, cond)
        transport = create_transport("Linear", "velocity")
        step = jax.jit(make_train_step(model, transport, opt, cond, grad_clip=10.0,
                                       micro_batches=2, grad_dtype=jnp.bfloat16))
        losses = []
        for _ in range(20):
            state, m = step(state, batch, jax.random.PRNGKey(3))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], f"no learning: {losses[0]:.3f}->{losses[-1]:.3f}"
        assert all(np.isfinite(losses))
