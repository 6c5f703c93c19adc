"""FusedAdafactorEMA: optax cross-parity, stochastic rounding, bf16 training.

The sublinear-memory optimizer exists so the 2B flagship's FULL train step
(update + EMA + clip) fits one 16 GB chip — the reference's AdamW recipe needs
>=32 GPUs for the same model (`lumina_t2i/exps/5B_bs512_lr1e-4_bf16_1024px_
sdxlvae.sh`). Math is pinned against optax.adafactor (the public reference
implementation of Shazeer & Stern 2018) at fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lumina_t2x_tpu.pipelines.train_lib import (FusedAdafactorEMA,
                                                _stochastic_round_bf16)


def _tree_allclose(a, b, **kw):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), **kw), a, b)


def _setup():
    rng = np.random.RandomState(0)
    # one factored 2-D leaf, one non-factored 1-D leaf, one factored 3-D
    # leaf (factoring picks the two largest axes: 6 and 5)
    params = {"w": jnp.asarray(rng.randn(8, 6), jnp.float32),
              "b": jnp.asarray(rng.randn(6), jnp.float32),
              "k": jnp.asarray(rng.randn(3, 6, 5), jnp.float32)}
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32) * 2.0, params)
    ema = jax.tree.map(lambda p: p + 0.1, params)
    return params, grads, ema


class TestFusedAdafactorEMA:
    def test_matches_optax_adafactor_plus_ema(self):
        lr, wd, decay, clip = 3e-3, 0.01, 0.999, 1.0
        params, grads, ema = _setup()

        ref_opt = optax.adafactor(
            learning_rate=lr, min_dim_size_to_factor=4, decay_rate=0.8,
            multiply_by_parameter_scale=True, clipping_threshold=1.0,
            momentum=None, weight_decay_rate=wd)
        ref_state = ref_opt.init(params)
        fused = FusedAdafactorEMA(lr, min_dim_size_to_factor=4,
                                  weight_decay=wd, stochastic_rounding=False)
        f_state = fused.init(params)

        rp, re = params, ema
        fp, fe = params, ema
        for step in range(4):
            gn = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip / (gn + 1e-6))
            clipped = jax.tree.map(lambda g: g * scale, grads)
            updates, ref_state = ref_opt.update(clipped, ref_state, rp)
            rp = optax.apply_updates(rp, updates)
            re = jax.tree.map(lambda e, p: e * decay + (1 - decay) * p, re, rp)

            fp, f_state, fe = fused.step(grads, fp, f_state, fe, decay, scale)
            grads = jax.tree.map(lambda g: g * 0.7 + 0.01, grads)

        _tree_allclose(fp, rp, rtol=1e-5, atol=1e-6)
        _tree_allclose(fe, re, rtol=1e-5, atol=1e-6)

    def test_factored_state_is_sublinear(self):
        params, _, _ = _setup()
        st = FusedAdafactorEMA(1e-3, min_dim_size_to_factor=4).init(params)
        stats = st[0]
        # (8,6): d0 = largest axis (size 8) is dropped from v_row
        assert stats.v_row["w"].shape == (6,)
        assert stats.v_col["w"].shape == (8,)
        assert stats.v["w"].shape == (1,)          # full v not allocated
        assert stats.v["b"].shape == (6,)          # 1-D leaf: full v
        assert stats.v_row["b"].shape == (1,)
        # 3-D leaf: two largest axes (6, 5) factored; v_row drops the
        # largest axis (index of 6), v_col drops the second-largest (5)
        assert stats.v_row["k"].shape == (3, 5)
        assert stats.v_col["k"].shape == (3, 6)
        # stats are fp32 regardless of param dtype
        for leaf in jax.tree.leaves((stats.v_row, stats.v_col, stats.v)):
            assert leaf.dtype == jnp.float32

    def test_layout_is_three_tuple(self):
        """Same 3-tuple envelope as FusedAdamWEMA so sharding walks and
        checkpoint code treat both fused optimizers uniformly."""
        params, _, _ = _setup()
        st = FusedAdafactorEMA(1e-3).init(params)
        assert isinstance(st, tuple) and len(st) == 3
        assert isinstance(st[1], optax.EmptyState)

    def test_warmup(self):
        params, grads, ema = _setup()
        fused = FusedAdafactorEMA(1.0, min_dim_size_to_factor=4,
                                  warmup_steps=10, stochastic_rounding=False)
        st = fused.init(params)
        p1, st, _ = fused.step(grads, params, st, ema, 0.999, jnp.ones(()))
        assert float(jnp.max(jnp.abs(p1["w"] - params["w"]))) == 0.0
        p2, st, _ = fused.step(grads, p1, st, ema, 0.999, jnp.ones(()))
        assert float(jnp.max(jnp.abs(p2["w"] - p1["w"]))) > 0.0


class TestStochasticRounding:
    def test_exact_values_pass_through(self):
        x = jnp.asarray([1.0, -2.5, 0.0, 0.15625], jnp.float32)  # bf16-exact
        for seed in range(3):
            out = _stochastic_round_bf16(x, jax.random.PRNGKey(seed))
            np.testing.assert_array_equal(np.asarray(out, np.float32),
                                          np.asarray(x))

    def test_unbiased_between_neighbors(self):
        # x sits 25% of the way from bf16(1.0) to the next bf16 value
        # (1.0 + 2^-7, 7 mantissa bits): E[SR(x)] must equal x, round-to-
        # nearest would give 1.0 always
        ulp = 2.0 ** -7
        x = jnp.full((4096,), 1.0 + 0.25 * ulp, jnp.float32)
        out = _stochastic_round_bf16(x, jax.random.PRNGKey(0))
        vals = np.asarray(out, np.float32)
        assert set(np.unique(vals)) <= {np.float32(1.0), np.float32(1.0 + ulp)}
        frac_up = float((vals == np.float32(1.0 + ulp)).mean())
        assert 0.20 < frac_up < 0.30  # 4096 draws: ~6 sigma bounds
        np.testing.assert_allclose(vals.mean(), 1.0 + 0.25 * ulp, atol=ulp / 50)

    def test_alternate_prng_impls(self, monkeypatch):
        """The default noise source is the fused murmur3 hash (free on the 2B
        optimizer pass — threefry/rbg cost +57/+47 ms there materializing
        noise operands); `threefry` and `rbg` stay selectable. All impls must
        give exactness on representable values and unbiasedness between
        neighbors."""
        ulp = 2.0 ** -7
        for impl in ("rbg", "threefry"):
            monkeypatch.setenv("LUMINA_SR_PRNG", impl)
            x = jnp.asarray([1.0, -2.5, 0.0, 0.15625], jnp.float32)
            out = _stochastic_round_bf16(x, jax.random.PRNGKey(3))
            np.testing.assert_array_equal(np.asarray(out, np.float32),
                                          np.asarray(x))
            xm = jnp.full((4096,), 1.0 + 0.25 * ulp, jnp.float32)
            vals = np.asarray(
                _stochastic_round_bf16(xm, jax.random.PRNGKey(0)), np.float32)
            assert set(np.unique(vals)) <= {np.float32(1.0),
                                            np.float32(1.0 + ulp)}
            assert 0.20 < float((vals == np.float32(1.0 + ulp)).mean()) < 0.30

    def test_sub_ulp_accumulation_survives(self):
        """The reason SR exists: adding 1/16 ulp 1024 times to a bf16
        accumulator must advance it (~64 ulps in expectation); round-to-
        nearest leaves it exactly at 1.0 forever."""
        ulp = 2.0 ** -7
        acc_sr = jnp.asarray(1.0, jnp.bfloat16)
        acc_rn = jnp.asarray(1.0, jnp.bfloat16)
        key = jax.random.PRNGKey(1)
        for i in range(1024):
            x = acc_sr.astype(jnp.float32) + ulp / 16
            acc_sr = _stochastic_round_bf16(x, jax.random.fold_in(key, i))[()]
            acc_rn = (acc_rn.astype(jnp.float32) + ulp / 16).astype(jnp.bfloat16)
        assert float(acc_rn) == 1.0
        gained = (float(acc_sr) - 1.0) / ulp
        assert 40 < gained < 90  # E=64 ulps, binomial-ish spread


class TestAdafactorTrainStep:
    def _build(self, param_dtype, optimizer):
        from lumina_t2x_tpu.models.next_dit import NextDiT
        from lumina_t2x_tpu.pipelines.train_lib import (create_train_state,
                                                        make_train_step)
        from lumina_t2x_tpu.transport import create_transport

        model = NextDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                        cap_feat_dim=32, qk_norm=True, attn_impl="xla",
                        param_dtype=param_dtype)
        batch = {
            "x": jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16)),
            "cap_feats": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32)),
            "cap_mask": jnp.ones((2, 8), jnp.int32),
        }
        cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
        transport = create_transport("Linear", "velocity")
        state = create_train_state(jax.random.PRNGKey(0), model, batch,
                                   optimizer, cond)
        step = jax.jit(make_train_step(model, transport, optimizer, cond,
                                       grad_clip=1.0))
        return state, step, batch

    def test_bf16_params_with_stochastic_rounding(self):
        state, step, batch = self._build(
            jnp.bfloat16, FusedAdafactorEMA(1e-2))
        # the big matmul weights are bf16 (norm/gate vectors stay fp32 by
        # design — they are sublinear memory)
        biggest = max(jax.tree.leaves(state.params), key=lambda l: l.size)
        assert biggest.dtype == jnp.bfloat16
        p0 = state.params
        for i in range(3):
            state, m = step(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(7), i))
            assert bool(jnp.isfinite(m["loss"])), f"step {i} loss not finite"
        moved = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                               - b.astype(jnp.float32)))),
            state.params, p0)))
        assert moved > 0
        # EMA mirrors the param dtypes and stays finite
        jax.tree.map(lambda e, p: None if e.dtype == p.dtype else 1 / 0,
                     state.ema_params, state.params)
        for leaf in jax.tree.leaves(state.ema_params):
            assert bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32))))

    def test_nonfinite_guard_skips(self):
        state, step, batch = self._build(jnp.float32, FusedAdafactorEMA(1e-2))
        bad = dict(batch, x=batch["x"].at[0, 0, 0, 0].set(jnp.nan))
        s1, m1 = step(state, bad, jax.random.PRNGKey(7))
        assert int(m1["skipped"]) == 1
        _tree_allclose(s1.params, state.params, rtol=0)
        _tree_allclose(s1.opt_state, state.opt_state, rtol=0)

    def test_learns_synthetic_task(self):
        """Loss descends over 25 steps on a learnable target — the adafactor
        analogue of the AdamW learning test (same tiny model/task family)."""
        state, step, batch = self._build(
            jnp.bfloat16, FusedAdafactorEMA(3e-2))
        losses = []
        for i in range(25):
            state, m = step(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(7), i))
            losses.append(float(m["loss"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
