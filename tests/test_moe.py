"""MoE tests: routing correctness (lossless TimeMoE vs explicit loop,
SpaceMoE dispatch/combine vs dense reference), model forwards, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.models.moe import NextDiTMoE, SpaceMoEFFN, TimeMoEFFN


def naive_moe(x_tokens, w1, w3, w2, gate_logits, k):
    """Reference semantics (`models.py:464-477`): topk -> softmax-renorm ->
    per-expert gather-apply."""
    t, d = x_tokens.shape
    e = w1.shape[0]
    out = np.zeros_like(x_tokens)
    for ti in range(t):
        logits = gate_logits[ti]
        top = np.argsort(-logits)[:k]
        w = np.exp(logits[top] - logits[top].max())
        w = w / w.sum()
        for wi, ei in zip(w, top):
            h = x_tokens[ti] @ w1[ei]
            h3 = x_tokens[ti] @ w3[ei]
            silu = h / (1 + np.exp(-h)) * h3
            out[ti] += wi * (silu @ w2[ei])
    return out


class TestTimeMoE:
    def test_matches_naive(self):
        d, e, k, b, s = 16, 4, 2, 3, 5
        layer = TimeMoEFFN(dim=d, multiple_of=8, num_experts=e, num_experts_per_tok=k)
        x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d))
        cond = jax.random.normal(jax.random.PRNGKey(1), (b, 8))
        params = layer.init(jax.random.PRNGKey(2), x, cond)
        out = layer.apply(params, x, cond)

        w1 = np.asarray(params["params"]["w1"])
        w3 = np.asarray(params["params"]["w3"])
        w2 = np.asarray(params["params"]["w2"])
        gk = np.asarray(params["params"]["gate"]["kernel"])
        logits = np.asarray(cond) @ gk  # (b, e)
        for bi in range(b):
            token_logits = np.broadcast_to(logits[bi], (s, e))
            ref = naive_moe(np.asarray(x[bi], np.float64), w1, w3, w2, token_logits, k)
            np.testing.assert_allclose(np.asarray(out[bi]), ref, atol=1e-4)

    def test_per_item_routing(self):
        """All tokens of one item must use the same experts."""
        d, e = 8, 4
        layer = TimeMoEFFN(dim=d, multiple_of=8, num_experts=e, num_experts_per_tok=1)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, d))
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
        params = layer.init(jax.random.PRNGKey(2), x, cond)
        out = layer.apply(params, x, cond)
        assert out.shape == x.shape


class TestSpaceMoE:
    def test_matches_naive_with_ample_capacity(self):
        d, e, k, b, s = 16, 4, 2, 2, 6
        layer = SpaceMoEFFN(dim=d, multiple_of=8, num_experts=e, num_experts_per_tok=k,
                            capacity_factor=float(e))  # capacity >= T: lossless
        x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d))
        params = layer.init(jax.random.PRNGKey(2), x)
        out = layer.apply(params, x)

        w1 = np.asarray(params["params"]["w1"])
        w3 = np.asarray(params["params"]["w3"])
        w2 = np.asarray(params["params"]["w2"])
        gk = np.asarray(params["params"]["gate"]["kernel"])
        xt = np.asarray(x).reshape(b * s, d)
        logits = xt @ gk
        ref = naive_moe(xt.astype(np.float64), w1, w3, w2, logits, k).reshape(b, s, d)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_capacity_drops_overflow(self):
        """With capacity_factor tiny, output degrades but stays finite."""
        layer = SpaceMoEFFN(dim=8, multiple_of=8, num_experts=2, num_experts_per_tok=1,
                            capacity_factor=0.25)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8))
        params = layer.init(jax.random.PRNGKey(1), x)
        out = layer.apply(params, x)
        assert np.all(np.isfinite(np.asarray(out)))


def tiny_moe(**kw):
    kw.setdefault("dim", 64)
    kw.setdefault("n_layers", 2)
    kw.setdefault("n_heads", 4)
    kw.setdefault("multiple_of", 16)
    kw.setdefault("num_classes", 8)
    kw.setdefault("num_experts", 4)
    kw.setdefault("attn_impl", "xla")
    return NextDiTMoE(**kw)


class TestNextDiTMoE:
    @pytest.mark.parametrize("mode,n_chunk_experts", [("time", 8), ("space", 8), ("both", 4)])
    def test_forward(self, mode, n_chunk_experts):
        model = tiny_moe(moe_mode=mode)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.array([0.3, 0.7])
        y = jnp.array([1, 5])
        params = model.init(jax.random.PRNGKey(0), x, t, y)
        out = model.apply(params, x, t, y)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_grad_flows_through_router(self):
        model = tiny_moe(moe_mode="time", scan_blocks=False, n_layers=1)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.array([0.3, 0.7])
        y = jnp.array([1, 5])
        params = model.init(jax.random.PRNGKey(0), x, t, y)

        def loss(p):
            return jnp.sum(model.apply(p, x, t, y) ** 2)

        g = jax.grad(lambda p: loss(p))(params)
        gate_g = g["params"]["layers_0"]["feed_forward"]["gate"]["kernel"]
        expert_g = g["params"]["layers_0"]["feed_forward"]["w1"]
        # at zero-init final layers output is 0; perturb instead
        params2 = jax.tree.map(
            lambda a: a + 0.02 * np.random.RandomState(0).standard_normal(a.shape).astype(np.float32),
            params,
        )
        g2 = jax.grad(lambda p: loss(p))(params2)
        assert np.any(np.asarray(g2["params"]["layers_0"]["feed_forward"]["w1"]) != 0)

    def test_train_step(self):
        from lumina_t2x_tpu.pipelines.train_lib import (
            create_optimizer,
            create_train_state,
            make_train_step,
        )
        from lumina_t2x_tpu.transport import create_transport

        model = tiny_moe(moe_mode="both")
        batch = {
            "x": jax.random.normal(jax.random.PRNGKey(0), (4, 4, 16, 16)),
            "y": jnp.arange(4) % 8,
        }
        cond = lambda b: {"y": b["y"]}
        opt = create_optimizer(1e-3)
        state = create_train_state(jax.random.PRNGKey(0), model, batch, opt, cond)
        transport = create_transport("Linear", "velocity", snr_type="lognorm")
        step = make_train_step(model, transport, opt, cond)
        state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))


class TestExpertParallel:
    def test_ep_matches_unsharded(self):
        """Expert-parallel SpaceMoE under a mesh must match the unsharded
        result exactly."""
        from lumina_t2x_tpu.parallel import create_mesh

        mesh = create_mesh(model_parallel_size=4)
        d, e, k = 16, 4, 2
        ref_layer = SpaceMoEFFN(dim=d, multiple_of=8, num_experts=e,
                                num_experts_per_tok=k, capacity_factor=4.0)
        ep_layer = SpaceMoEFFN(dim=d, multiple_of=8, num_experts=e,
                               num_experts_per_tok=k, capacity_factor=4.0,
                               ep_axis="model")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, d))
        params = ref_layer.init(jax.random.PRNGKey(1), x)
        ref = ref_layer.apply(params, x)
        with jax.set_mesh(mesh):
            out = jax.jit(lambda p, xx: ep_layer.apply(p, xx))(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestMoESamplerPipeline:
    def test_tiny_moe_through_class_cond_sampler(self):
        """MoE models route through the class-conditional sampler pipeline
        (reference `Next-DiT-MoE` shares `sample.py` with the ImageNet
        models); pins the end-to-end CFG + ODE path for NextDiTMoE."""
        from lumina_t2x_tpu.pipelines.sample_lib import build_class_cond_sample_fn

        model = tiny_moe(moe_mode="time")
        rng = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, 4, 8, 8))
        variables = model.init(rng, x0, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))
        fn = jax.jit(build_class_cond_sample_fn(model, num_steps=2, latent_size=8))
        out = fn(variables, rng, jnp.array([3]))
        assert out.shape == (1, 4, 8, 8)
        assert np.all(np.isfinite(np.asarray(out)))
