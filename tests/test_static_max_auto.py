"""Static-max flash-kernel auto-calibration (VERDICT r1 item 4b).

The streaming flash kernel can replace its online max-reduce with a fixed
bound (`LUMINA_FLASH_STATIC_MAX`), but the bound is weight/data dependent, so
the sampling pipelines *measure* it: a short probe trajectory under
`LUMINA_FLASH_CALIBRATE=1` sows each streaming call site's log-sum-exp range
(`flash_lse_range`; lse >= rowmax always), and the bound is max(lse)+margin
(`sample_lib.autocalibrate_flash_static_max`). These tests pin:
- the lse range probe against a direct softmax reference;
- end-to-end: calibrated static-max sampling equals online-max sampling;
- every bail-out guard (env pinned, auto off, no qk-norm, short sequences).
"""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# `ops/__init__` re-exports the `flash_attention` FUNCTION, shadowing the
# submodule attribute — resolve the module itself for monkeypatching.
fa = importlib.import_module("lumina_t2x_tpu.ops.flash_attention")


def _ref_lse_rows(q, k, kv_mask, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    s = jnp.where(kv_mask[:, None, None, :] != 0, s, -jnp.inf)
    return jax.scipy.special.logsumexp(s, axis=-1)  # (B, H, Sq)


class TestFlashLseRange:
    def test_matches_direct_logsumexp(self):
        rng = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (2, 40, 2, 64))
        k = jax.random.normal(kk, (2, 37, 2, 64))
        v = jax.random.normal(kv, (2, 37, 2, 64))
        mask = jnp.ones((2, 37), jnp.int32).at[:, 30:].set(0)
        scale = 0.17
        got = fa.flash_lse_range(q, k, v, mask, scale)
        ref = _ref_lse_rows(q, k, mask, scale)
        np.testing.assert_allclose(float(got[0]), float(jnp.max(ref)), rtol=1e-5)
        np.testing.assert_allclose(float(got[1]), float(jnp.min(ref)), rtol=1e-5)
        assert float(got[0]) >= float(got[1])

    def test_default_mask_and_scale(self):
        rng = jax.random.PRNGKey(1)
        q = jax.random.normal(rng, (1, 16, 2, 32))
        k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 16, 2, 32))
        v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 16, 2, 32))
        got = fa.flash_lse_range(q, k, v)
        ref = _ref_lse_rows(q, k, jnp.ones((1, 16), jnp.int32), 32**-0.5)
        np.testing.assert_allclose(float(got[0]), float(jnp.max(ref)), rtol=1e-5)


def _tiny_t2i_setup(qk_norm=True):
    from lumina_t2x_tpu.models.next_dit import NextDiT

    model = NextDiT(patch_size=2, dim=32, n_layers=2, n_heads=4, multiple_of=16,
                    qk_norm=qk_norm, cap_feat_dim=16, attn_impl="flash")
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 4, 8, 8))
    cap = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 16))
    cap_mask = jnp.ones((2, 8), jnp.int32)
    variables = model.init(rng, x0, jnp.zeros((2,)), cap, cap_mask)
    # break the zero-init final layer so trajectories are non-trivial
    variables = jax.tree.map(
        lambda a: jnp.where(jnp.all(a == 0), 0.02 * jnp.ones_like(a), a)
        if a.ndim >= 1 else a, variables)
    return model, variables, cap, cap_mask


@pytest.mark.slow
class TestAutocalibrate:
    @pytest.fixture(autouse=True)
    def _clean_env(self, monkeypatch):
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX", raising=False)
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX_AUTO", raising=False)
        monkeypatch.delenv("LUMINA_FLASH_CALIBRATE", raising=False)
        fa.set_flash_static_max(None)
        yield
        os.environ.pop("LUMINA_FLASH_STATIC_MAX", None)
        os.environ.pop("LUMINA_FLASH_CALIBRATE", None)
        fa.set_flash_static_max(None)

    def test_calibrated_sampling_matches_online(self, monkeypatch):
        from lumina_t2x_tpu.pipelines.sample_lib import (
            autocalibrate_flash_static_max, build_t2i_sample_fn)

        # 16-token latents must take the streaming kernel for the bound to bite
        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 8)
        model, variables, cap, cap_mask = _tiny_t2i_setup()

        fn = jax.jit(build_t2i_sample_fn(model, width=64, height=64, num_steps=4))
        ref = fn(variables, jax.random.PRNGKey(7), cap, cap_mask)

        bound = autocalibrate_flash_static_max(
            model, variables, cap, cap_mask, width=64, height=64,
            num_probe_steps=2)
        assert bound is not None and np.isfinite(bound)
        # first-class install: module setting, NOT the env var
        assert fa.get_flash_static_max() == bound
        assert "LUMINA_FLASH_STATIC_MAX" not in os.environ
        # calibration must not leak the probe flag
        assert "LUMINA_FLASH_CALIBRATE" not in os.environ

        # fresh trace reads the setting at trace time (part of the cache key)
        fn2 = jax.jit(build_t2i_sample_fn(model, width=64, height=64, num_steps=4))
        got = fn2(variables, jax.random.PRNGKey(7), cap, cap_mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_guards(self, monkeypatch):
        from lumina_t2x_tpu.pipelines.sample_lib import autocalibrate_flash_static_max

        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 8)
        model, variables, cap, cap_mask = _tiny_t2i_setup()

        # explicit env bound wins
        monkeypatch.setenv("LUMINA_FLASH_STATIC_MAX", "12.0")
        assert autocalibrate_flash_static_max(
            model, variables, cap, cap_mask, width=64, height=64) is None
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX")

        # kill switch
        monkeypatch.setenv("LUMINA_FLASH_STATIC_MAX_AUTO", "0")
        assert autocalibrate_flash_static_max(
            model, variables, cap, cap_mask, width=64, height=64) is None
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX_AUTO")

        # short sequences use the single-pass kernel — nothing to calibrate
        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 1024)
        assert autocalibrate_flash_static_max(
            model, variables, cap, cap_mask, width=64, height=64) is None
        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 8)

        # no qk-norm -> logits unbounded -> stay online
        model_nq, variables_nq, cap2, cap_mask2 = _tiny_t2i_setup(qk_norm=False)
        assert autocalibrate_flash_static_max(
            model_nq, variables_nq, cap2, cap_mask2, width=64, height=64) is None

        assert "LUMINA_FLASH_STATIC_MAX" not in os.environ
        assert fa.get_flash_static_max() is None


@pytest.mark.slow
class TestStaticMaxTrainingPath:
    """r4: the custom_vjp forward (`_fwd` -> `_flash_kernel_res_static_max`)
    honors the calibrated bound, its LSE residual keeps the backward exact,
    and the trainer-side calibrator installs/bails correctly."""

    @pytest.fixture(autouse=True)
    def _clean_env(self, monkeypatch):
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX", raising=False)
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX_TRAIN", raising=False)
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX_AUTO", raising=False)
        monkeypatch.delenv("LUMINA_FLASH_CALIBRATE", raising=False)
        fa.set_flash_static_max(None)
        fa.set_flash_static_max_train(None)
        yield
        os.environ.pop("LUMINA_FLASH_STATIC_MAX", None)
        os.environ.pop("LUMINA_FLASH_STATIC_MAX_TRAIN", None)
        os.environ.pop("LUMINA_FLASH_CALIBRATE", None)
        fa.set_flash_static_max(None)
        fa.set_flash_static_max_train(None)

    def test_vjp_matches_online(self, monkeypatch):
        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 8)
        rng = jax.random.PRNGKey(3)
        kq, kk, kv, kw = jax.random.split(rng, 4)
        q = jax.random.normal(kq, (1, 64, 2, 32))
        k = jax.random.normal(kk, (1, 64, 2, 32))
        v = jax.random.normal(kv, (1, 64, 2, 32))
        w = jax.random.normal(kw, (1, 64, 2, 32))
        mask = jnp.ones((1, 64), jnp.int32).at[:, 50:].set(0)

        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, mask) * w)

        ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

        bound = float(fa.flash_lse_range(q, k, v, mask)[0]) + 6.0
        fa.set_flash_static_max_train(bound)
        got_l, got_g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
        for g_ref, g_got in zip(ref_g, got_g):
            np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                       rtol=1e-4, atol=1e-5)

    def test_inference_bound_does_not_leak_into_training(self, monkeypatch):
        """ADVICE r4: a sampling-side calibration (or inference env pin) in
        the same process must NOT apply to the custom_vjp training forward —
        the train path only honors its own slot/env pin."""
        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 8)
        fa.set_flash_static_max(7.5)
        monkeypatch.setenv("LUMINA_FLASH_STATIC_MAX", "7.5")
        assert fa._static_max_bound() == 7.5
        assert fa._static_max_bound(train=True) is None
        monkeypatch.setenv("LUMINA_FLASH_STATIC_MAX_TRAIN", "9.25")
        assert fa._static_max_bound(train=True) == 9.25
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX_TRAIN")
        fa.set_flash_static_max_train(10.0)
        assert fa._static_max_bound(train=True) == 10.0
        assert fa._static_max_bound() == 7.5

    def test_trainer_autocalibration_and_step_parity(self, monkeypatch):
        from lumina_t2x_tpu.pipelines.train_lib import (
            FusedAdamWEMA, autocalibrate_flash_static_max_train,
            create_train_state, make_train_step)
        from lumina_t2x_tpu.transport import create_transport

        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 8)
        model, variables, cap, cap_mask = _tiny_t2i_setup()
        batch = {"x": jax.random.normal(jax.random.PRNGKey(9), (2, 4, 8, 8)),
                 "cap_feats": cap, "cap_mask": cap_mask}
        cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}

        transport = create_transport("Linear", "velocity")
        opt = FusedAdamWEMA(1e-3)
        state = create_train_state(jax.random.PRNGKey(1), model, batch, opt, cond)
        step = make_train_step(model, transport, opt, cond)
        ref_state, ref_m = step(state, batch, jax.random.PRNGKey(2))

        bound = autocalibrate_flash_static_max_train(
            model, state.params, batch, cond)
        assert bound is not None and np.isfinite(bound)
        assert fa.get_flash_static_max(train=True) == bound
        # the train calibrator must not touch the inference slot
        assert fa.get_flash_static_max() is None
        assert "LUMINA_FLASH_CALIBRATE" not in os.environ

        got_state, got_m = step(state, batch, jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(got_m["loss"]), float(ref_m["loss"]),
                                   rtol=2e-5)
        np.testing.assert_allclose(float(got_m["grad_norm"]),
                                   float(ref_m["grad_norm"]), rtol=2e-4)

    def test_trainer_calibration_guards(self, monkeypatch):
        from lumina_t2x_tpu.pipelines.train_lib import (
            autocalibrate_flash_static_max_train)

        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 8)
        model, variables, cap, cap_mask = _tiny_t2i_setup()
        batch = {"x": jax.random.normal(jax.random.PRNGKey(9), (2, 4, 8, 8)),
                 "cap_feats": cap, "cap_mask": cap_mask}
        cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
        params = variables["params"]

        monkeypatch.setenv("LUMINA_FLASH_STATIC_MAX_TRAIN", "12.0")
        assert autocalibrate_flash_static_max_train(model, params, batch, cond) is None
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX_TRAIN")

        monkeypatch.setenv("LUMINA_FLASH_STATIC_MAX_AUTO", "0")
        assert autocalibrate_flash_static_max_train(model, params, batch, cond) is None
        monkeypatch.delenv("LUMINA_FLASH_STATIC_MAX_AUTO")

        # short sequences: single-pass kernel, nothing to calibrate
        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 1024)
        assert autocalibrate_flash_static_max_train(model, params, batch, cond) is None
        monkeypatch.setattr(fa, "_SMALL_KV_MAX", 8)

        model_nq, variables_nq, cap2, cap_mask2 = _tiny_t2i_setup(qk_norm=False)
        batch2 = {"x": batch["x"], "cap_feats": cap2, "cap_mask": cap_mask2}
        assert autocalibrate_flash_static_max_train(
            model_nq, variables_nq["params"], batch2, cond) is None
        assert fa.get_flash_static_max(train=True) is None
