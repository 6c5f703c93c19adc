"""Fused AdamW+EMA and selective-remat coverage (fast set)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _tree_allclose(a, b, **kw):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw),
                 a, b)


class TestFusedAdamWEMA:
    def _setup(self):
        rng = np.random.RandomState(0)
        params = {"w": jnp.asarray(rng.randn(8, 4), jnp.float32),
                  "b": {"x": jnp.asarray(rng.randn(4), jnp.float32)}}
        grads = jax.tree.map(lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32) * 3.0,
                             params)
        ema = jax.tree.map(lambda p: p + 0.1, params)
        return params, grads, ema

    def test_matches_optax_adamw_plus_ema(self):
        from lumina_t2x_tpu.pipelines.train_lib import FusedAdamWEMA

        lr, wd, decay, clip = 1e-3, 0.02, 0.999, 1.0
        params, grads, ema = self._setup()

        ref_opt = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=wd)
        ref_state = ref_opt.init(params)
        fused = FusedAdamWEMA(lr, weight_decay=wd)
        f_state = fused.init(params)

        rp, re = params, ema
        fp, fe = params, ema
        for step in range(3):
            gn = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip / (gn + 1e-6))
            clipped = jax.tree.map(lambda g: g * scale, grads)
            updates, ref_state = ref_opt.update(clipped, ref_state, rp)
            rp = optax.apply_updates(rp, updates)
            re = jax.tree.map(lambda e, p: e * decay + (1 - decay) * p, re, rp)

            fp, f_state, fe = fused.step(grads, fp, f_state, fe, decay, scale)
            grads = jax.tree.map(lambda g: g * 0.7 + 0.01, grads)

        _tree_allclose(fp, rp, rtol=1e-6, atol=1e-7)
        _tree_allclose(fe, re, rtol=1e-6, atol=1e-7)

    def test_warmup(self):
        from lumina_t2x_tpu.pipelines.train_lib import FusedAdamWEMA

        params, grads, ema = self._setup()
        fused = FusedAdamWEMA(1.0, weight_decay=0.0, warmup_steps=10)
        st = fused.init(params)
        # optax.linear_schedule indexing: first update sees count=0 -> lr 0
        p1, st, _ = fused.step(grads, params, st, ema, 0.999, jnp.ones(()))
        delta = float(jnp.max(jnp.abs(p1["w"] - params["w"])))
        assert delta == 0.0
        # second update: lr = 1/10 -> |delta| ~ 0.1 (adam step direction is
        # ~unit magnitude)
        p2, st, _ = fused.step(grads, p1, st, ema, 0.999, jnp.ones(()))
        delta = float(jnp.max(jnp.abs(p2["w"] - p1["w"])))
        assert 0.05 < delta < 0.15

    def test_opt_state_layout_matches_optax(self):
        """Checkpoints must be interchangeable across --fused_optimizer:
        FusedAdamWEMA's opt state has the same pytree structure as the
        no-warmup optax.adamw chain state."""
        from lumina_t2x_tpu.pipelines.train_lib import (FusedAdamWEMA,
                                                        create_optimizer)

        params, _, _ = self._setup()
        fused_st = FusedAdamWEMA(1e-3).init(params)
        optax_st = create_optimizer(1e-3).init(params)
        assert (jax.tree.structure(fused_st) == jax.tree.structure(optax_st))

    def test_fused_in_train_step(self):
        """End-to-end train step with FusedAdamWEMA matches the optax path."""
        from lumina_t2x_tpu.models.next_dit import NextDiT
        from lumina_t2x_tpu.pipelines.train_lib import (
            FusedAdamWEMA,
            create_optimizer,
            create_train_state,
            make_train_step,
        )
        from lumina_t2x_tpu.transport import create_transport

        model = NextDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                        cap_feat_dim=32, qk_norm=True, attn_impl="xla")
        batch = {
            "x": jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16)),
            "cap_feats": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32)),
            "cap_mask": jnp.ones((2, 8), jnp.int32),
        }
        cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
        transport = create_transport("Linear", "velocity")

        opt_ref = create_optimizer(lr=1e-3)
        s_ref = create_train_state(jax.random.PRNGKey(0), model, batch, opt_ref, cond)
        step_ref = jax.jit(make_train_step(model, transport, opt_ref, cond, grad_clip=1.0))
        s_ref, m_ref = step_ref(s_ref, batch, jax.random.PRNGKey(7))

        opt_f = FusedAdamWEMA(lr=1e-3)
        s_f = create_train_state(jax.random.PRNGKey(0), model, batch, opt_f, cond)
        step_f = jax.jit(make_train_step(model, transport, opt_f, cond, grad_clip=1.0))
        s_f, m_f = step_f(s_f, batch, jax.random.PRNGKey(7))

        np.testing.assert_allclose(float(m_f["loss"]), float(m_ref["loss"]), rtol=1e-6)
        _tree_allclose(s_f.params, s_ref.params, rtol=2e-5, atol=2e-6)
        _tree_allclose(s_f.ema_params, s_ref.ema_params, rtol=2e-5, atol=2e-6)


class TestNonFiniteGuard:
    def _setup(self, optimizer):
        from lumina_t2x_tpu.models.next_dit import NextDiT
        from lumina_t2x_tpu.pipelines.train_lib import (create_train_state,
                                                        make_train_step)
        from lumina_t2x_tpu.transport import create_transport

        model = NextDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                        cap_feat_dim=32, qk_norm=True, attn_impl="xla")
        batch = {
            "x": jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16)),
            "cap_feats": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32)),
            "cap_mask": jnp.ones((2, 8), jnp.int32),
        }
        cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
        transport = create_transport("Linear", "velocity")
        state = create_train_state(jax.random.PRNGKey(0), model, batch, optimizer, cond)
        step = jax.jit(make_train_step(model, transport, optimizer, cond, grad_clip=1.0))
        return state, step, batch

    def _run(self, optimizer):
        state, step, batch = self._setup(optimizer)
        bad = dict(batch, x=batch["x"].at[0, 0, 0, 0].set(jnp.nan))
        s1, m1 = step(state, bad, jax.random.PRNGKey(7))
        assert int(m1["skipped"]) == 1
        # params / moments / EMA unchanged; step counter still advances
        _tree_allclose(s1.params, state.params, rtol=0)
        _tree_allclose(s1.opt_state, state.opt_state, rtol=0)
        _tree_allclose(s1.ema_params, state.ema_params, rtol=0)
        assert int(s1.step) == int(state.step) + 1
        # a clean batch then updates normally
        s2, m2 = step(s1, batch, jax.random.PRNGKey(8))
        assert int(m2["skipped"]) == 0
        assert bool(jnp.isfinite(m2["loss"]))
        changed = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                               s2.params, s1.params)
        assert max(jax.tree.leaves(changed)) > 0

    def test_skips_nan_batch_optax(self):
        from lumina_t2x_tpu.pipelines.train_lib import create_optimizer

        self._run(create_optimizer(1e-3))

    def test_skips_nan_batch_fused(self):
        from lumina_t2x_tpu.pipelines.train_lib import FusedAdamWEMA

        self._run(FusedAdamWEMA(1e-3))


class TestRematPolicy:
    def test_dots_policy_matches_full_and_none(self):
        from lumina_t2x_tpu.models.next_dit import NextDiT
        from lumina_t2x_tpu.pipelines.train_lib import (
            create_optimizer, create_train_state, make_train_step)
        from lumina_t2x_tpu.transport import create_transport

        batch = {
            "x": jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16)),
            "cap_feats": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32)),
            "cap_mask": jnp.ones((2, 8), jnp.int32),
        }
        cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
        transport = create_transport("Linear", "velocity")
        opt = create_optimizer(lr=1e-3)

        losses, norms = [], []
        for remat, policy in ((False, "dots"), (True, "dots"), (True, "full"),
                              (True, "dots_slim")):
            model = NextDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                            cap_feat_dim=32, qk_norm=True, attn_impl="xla",
                            remat=remat, remat_policy=policy)
            state = create_train_state(jax.random.PRNGKey(0), model, batch, opt, cond)
            step = jax.jit(make_train_step(model, transport, opt, cond, grad_clip=1.0))
            state, m = step(state, batch, jax.random.PRNGKey(7))
            losses.append(float(m["loss"]))
            norms.append(float(m["grad_norm"]))
        np.testing.assert_allclose(losses, losses[0], rtol=1e-6)
        np.testing.assert_allclose(norms, norms[0], rtol=1e-5)

    def test_dots_slim_saves_fewer_residuals(self):
        """The slim policy must recompute the expanding FFN up-projections:
        its saved-residual criterion rejects a dim->hidden dot and accepts
        the square/contracting ones."""
        import types

        from lumina_t2x_tpu.models.layers import _dots_slim_policy

        prim = types.SimpleNamespace(name="dot_general")

        def dims(lc, rc):
            return {"dimension_numbers": ((lc, rc), ((), ()))}

        def aval(shape):
            return types.SimpleNamespace(shape=shape)

        tok = 64
        # qkv / attn-out projection (dim -> dim): saved
        assert _dots_slim_policy(prim, aval((tok, 96)), aval((96, 96)), **dims((1,), (0,)))
        # FFN up-projection (dim -> hidden, expanding): recomputed
        assert not _dots_slim_policy(prim, aval((tok, 96)), aval((96, 256)), **dims((1,), (0,)))
        # FFN down-projection (hidden -> dim, contracting): saved
        assert _dots_slim_policy(prim, aval((tok, 256)), aval((256, 96)), **dims((1,), (0,)))
        # non-dot primitives are never saved by this policy
        assert not _dots_slim_policy(types.SimpleNamespace(name="exp"), aval((tok,)))
