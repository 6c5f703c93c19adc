"""Checkpoint subsystem tests: save/resume round-trip, auto-resume, init_from
shape-mismatch skip, torch-weight import/export round-trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.core.checkpoint import (
    checkpoint_dir,
    export_next_dit_weights,
    find_auto_resume,
    import_next_dit_weights,
    init_from,
    load_checkpoint,
    load_model_args,
    save_checkpoint,
    save_safetensors,
    load_torch_state_dict,
)
from lumina_t2x_tpu.models.next_dit import NextDiT
from lumina_t2x_tpu.pipelines.train_lib import (
    create_optimizer,
    create_train_state,
    make_train_step,
)
from lumina_t2x_tpu.transport import create_transport


def tiny_model(**kw):
    kw.setdefault("dim", 64)
    kw.setdefault("n_layers", 2)
    kw.setdefault("n_heads", 4)
    kw.setdefault("multiple_of", 16)
    kw.setdefault("cap_feat_dim", 32)
    kw.setdefault("attn_impl", "xla")
    return NextDiT(**kw)


def make_state(model):
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16)),
        "cap_feats": jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32)),
        "cap_mask": jnp.ones((2, 7), jnp.int32),
    }
    cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
    opt = create_optimizer(1e-3)
    state = create_train_state(jax.random.PRNGKey(0), model, batch, opt, cond)
    return state, batch, cond, opt


class TestCheckpointRoundTrip:
    def test_save_load(self, tmp_path):
        model = tiny_model()
        state, batch, cond, opt = make_state(model)
        transport = create_transport("Linear", "velocity")
        step_fn = make_train_step(model, transport, opt, cond)
        state, _ = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))

        path = save_checkpoint(str(tmp_path), int(state.step), state,
                               model_args={"model": "tiny", "dim": 64})
        fresh, _, _, _ = make_state(model)
        restored = load_checkpoint(path, fresh)
        assert int(restored.step) == 1
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
        for a, b in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(restored.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
        assert load_model_args(path)["dim"] == 64

    def test_auto_resume_picks_latest(self, tmp_path):
        model = tiny_model()
        state, *_ = make_state(model)
        save_checkpoint(str(tmp_path), 5, state)
        save_checkpoint(str(tmp_path), 12, state)
        found = find_auto_resume(str(tmp_path))
        assert found is not None and found.endswith("0000012")

    def test_auto_resume_none(self, tmp_path):
        assert find_auto_resume(str(tmp_path)) is None

    def test_init_from_drops_mismatched(self, tmp_path):
        model = tiny_model()
        state, *_ = make_state(model)
        path = save_checkpoint(str(tmp_path), 0, state)

        bigger = tiny_model(cap_feat_dim=48)  # cap-related shapes change
        state2, *_ = make_state_capdim(bigger, 48)
        merged = init_from(path, state2.params, stream="model")
        # matching keys copied
        np.testing.assert_allclose(
            np.asarray(merged["x_embedder"]["kernel"]),
            np.asarray(state.params["x_embedder"]["kernel"]),
        )
        # mismatched keys keep the fresh init
        assert merged["cap_embedder"]["proj"]["kernel"].shape[0] == 48


def make_state_capdim(model, cap_dim):
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16)),
        "cap_feats": jax.random.normal(jax.random.PRNGKey(1), (2, 7, cap_dim)),
        "cap_mask": jnp.ones((2, 7), jnp.int32),
    }
    cond = lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
    opt = create_optimizer(1e-3)
    state = create_train_state(jax.random.PRNGKey(0), model, batch, opt, cond)
    return state, batch, cond, opt


class TestAsyncSaver:
    def test_async_save_round_trip_and_marker_deferral(self, tmp_path):
        from lumina_t2x_tpu.core.checkpoint import AsyncCheckpointSaver

        model = tiny_model()
        state, batch, cond, opt = make_state(model)
        transport = create_transport("Linear", "velocity")
        step_fn = jax.jit(make_train_step(model, transport, opt, cond))
        state, _ = step_fn(state, batch, jax.random.PRNGKey(0))

        saver = AsyncCheckpointSaver()
        path = saver.save(str(tmp_path), 1, state, model_args={"dim": 64})
        # the completion marker is deferred: until wait(), auto-resume must
        # not see the (possibly still-committing) checkpoint
        assert not os.path.exists(os.path.join(path, "resume_step.txt"))
        assert find_auto_resume(str(tmp_path)) is None

        # a second save finalizes the first; train on (donated buffers) in
        # between to prove the step/save overlap is safe
        snap1 = jax.tree.map(np.asarray, state.params)
        state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
        saver.save(str(tmp_path), 2, state, model_args={"dim": 64})
        assert os.path.exists(os.path.join(path, "resume_step.txt"))
        saver.close()
        assert find_auto_resume(str(tmp_path)).endswith("0000002")

        fresh, *_ = make_state(model)
        r1 = load_checkpoint(path, fresh)
        assert int(r1.step) == 1
        for a, b in zip(jax.tree.leaves(snap1), jax.tree.leaves(r1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
        fresh2, *_ = make_state(model)
        r2 = load_checkpoint(checkpoint_dir(str(tmp_path), 2), fresh2)
        assert int(r2.step) == 2
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(r2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
        assert load_model_args(path)["dim"] == 64

    def test_trainer_async_save_flag(self, tmp_path):
        """The --async_save CLI path writes resumable checkpoints (the mid-run
        one finalized by the next save, the final one by close())."""
        from lumina_t2x_tpu import models as m
        from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet
        from lumina_t2x_tpu.pipelines import train as train_mod

        name = "NextDiT_ImageNet_600M_patch2"
        orig = m.MODELS[name]
        m.MODELS[name] = lambda **kw: NextDiTImageNet(
            **{**dict(dim=32, n_layers=2, n_heads=4, multiple_of=16,
                      num_classes=16, attn_impl="xla"),
               **{k: v for k, v in kw.items() if k not in ("remat",)}})
        try:
            train_mod.main([
                "--model", name, "--data_path", "synthetic://8x8",
                "--max_steps", "2", "--global_batch_size", "8",
                "--log_every", "1", "--ckpt_every", "1", "--async_save",
                "--precision", "fp32", "--results_dir", str(tmp_path),
            ])
        finally:
            m.MODELS[name] = orig
        exp_dir = os.path.join(str(tmp_path), name)
        found = find_auto_resume(exp_dir)
        assert found is not None and found.endswith("0000002")
        assert os.path.exists(os.path.join(exp_dir, "checkpoints", "0000001",
                                           "resume_step.txt"))
        assert load_model_args(found)["async_save"] is True


class TestRetention:
    def test_sync_keep_last(self, tmp_path):
        model = tiny_model()
        state, *_ = make_state(model)
        for s in (1, 2, 3):
            save_checkpoint(str(tmp_path), s, state, keep_last=2)
        base = tmp_path / "checkpoints"
        assert sorted(os.listdir(base)) == ["0000002", "0000003"]
        assert find_auto_resume(str(tmp_path)).endswith("0000003")

    def test_async_prunes_only_complete(self, tmp_path):
        from lumina_t2x_tpu.core.checkpoint import AsyncCheckpointSaver

        model = tiny_model()
        state, *_ = make_state(model)
        saver = AsyncCheckpointSaver(keep_last=1)
        saver.save(str(tmp_path), 1, state)
        saver.save(str(tmp_path), 2, state)  # finalizes + prunes vs #1
        base = tmp_path / "checkpoints"
        # step 2 is still pending (no marker) so it is never pruned; step 1
        # was the only complete one and keep_last=1 retains it
        assert (base / "0000001" / "resume_step.txt").exists()
        assert not (base / "0000002" / "resume_step.txt").exists()
        saver.close()  # finalizes #2, prunes #1
        assert sorted(os.listdir(base)) == ["0000002"]
        fresh, *_ = make_state(model)
        assert int(load_checkpoint(find_auto_resume(str(tmp_path)), fresh).step) == 2

    def test_prune_disabled_by_default(self, tmp_path):
        from lumina_t2x_tpu.core.checkpoint import prune_checkpoints

        model = tiny_model()
        state, *_ = make_state(model)
        for s in (1, 2):
            save_checkpoint(str(tmp_path), s, state)
        assert prune_checkpoints(str(tmp_path), 0) == []
        assert sorted(os.listdir(tmp_path / "checkpoints")) == ["0000001", "0000002"]


class TestTorchImport:
    def _fake_torch_sd(self, dim=64, n_layers=2, n_heads=4, cap_dim=32, multiple_of=16):
        """Construct a reference-shaped state dict with random numpy values."""
        rng = np.random.RandomState(0)
        head_dim = dim // n_heads
        hidden = int(2 * 4 * dim / 3)
        hidden = multiple_of * ((hidden + multiple_of - 1) // multiple_of)
        cond = min(dim, 1024)
        sd = {}

        def lin(name, i, o, bias=True):
            sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
            if bias:
                sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.02

        lin("x_embedder", 4 * 4, dim)
        sd["pad_token"] = rng.randn(dim).astype(np.float32)
        lin("t_embedder.mlp.0", 256, cond)
        lin("t_embedder.mlp.2", cond, cond)
        sd["cap_embedder.0.weight"] = np.ones(cap_dim, np.float32)
        sd["cap_embedder.0.bias"] = np.zeros(cap_dim, np.float32)
        lin("cap_embedder.1", cap_dim, cond)
        lin("final_layer.linear", dim, 4 * 8)
        lin("final_layer.adaLN_modulation.1", cond, dim)
        for i in range(n_layers):
            pre = f"layers.{i}"
            lin(f"{pre}.adaLN_modulation.1", cond, 4 * dim)
            for nrm in ("attention_norm1", "attention_norm2", "ffn_norm1", "ffn_norm2"):
                sd[f"{pre}.{nrm}.weight"] = np.ones(dim, np.float32)
            sd[f"{pre}.attention_y_norm.weight"] = np.ones(cap_dim, np.float32)
            lin(f"{pre}.attention.wq", dim, dim, bias=False)
            lin(f"{pre}.attention.wk", dim, dim, bias=False)
            lin(f"{pre}.attention.wv", dim, dim, bias=False)
            lin(f"{pre}.attention.wo", dim, dim, bias=False)
            lin(f"{pre}.attention.wk_y", cap_dim, dim, bias=False)
            lin(f"{pre}.attention.wv_y", cap_dim, dim, bias=False)
            sd[f"{pre}.attention.gate"] = np.zeros(n_heads, np.float32)
            lin(f"{pre}.feed_forward.w1", dim, hidden, bias=False)
            lin(f"{pre}.feed_forward.w2", hidden, dim, bias=False)
            lin(f"{pre}.feed_forward.w3", dim, hidden, bias=False)
        return sd

    def test_import_runs_forward(self):
        sd = self._fake_torch_sd()
        params = import_next_dit_weights(sd, n_layers=2, scan_layers=True)
        model = tiny_model()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 0.5)
        cap = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
        mask = jnp.ones((2, 7), jnp.int32)
        # structure must match a fresh init exactly
        ref = model.init(jax.random.PRNGKey(0), x, t, cap, mask)["params"]
        assert jax.tree.structure(jax.tree.map(np.shape, params)) == jax.tree.structure(
            jax.tree.map(np.shape, ref)
        )
        for k_imported, k_ref in zip(
            sorted(jax.tree.leaves(jax.tree.map(np.shape, params))),
            sorted(jax.tree.leaves(jax.tree.map(np.shape, ref))),
        ):
            assert k_imported == k_ref
        out = model.apply({"params": params}, x, t, cap, mask)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_export_round_trip(self):
        sd = self._fake_torch_sd()
        params = import_next_dit_weights(sd, n_layers=2, scan_layers=True)
        back = export_next_dit_weights(params, scan_layers=True)
        for k in sd:
            np.testing.assert_allclose(back[k], sd[k], atol=0, err_msg=k)

    def test_safetensors_round_trip(self, tmp_path):
        sd = self._fake_torch_sd()
        p = str(tmp_path / "w.safetensors")
        save_safetensors(sd, p)
        loaded = load_torch_state_dict(p)
        np.testing.assert_allclose(loaded["x_embedder.weight"], sd["x_embedder.weight"])


class TestFlagDiTImport:
    def _fake_flag_dit_sd(self, dim=64, n_layers=2, n_heads=4, cap_dim=32,
                          multiple_of=16, qk_norm=True):
        rng = np.random.RandomState(0)
        hidden = int(2 * 4 * dim / 3)
        hidden = multiple_of * ((hidden + multiple_of - 1) // multiple_of)
        cond = min(dim, 1024)
        sd = {}

        def lin(name, i, o, bias=True):
            sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
            if bias:
                sd[f"{name}.bias"] = np.zeros(o, np.float32)

        lin("x_embedder", 4 * 4, dim)
        sd["eol_token"] = rng.randn(dim).astype(np.float32) * 0.02
        sd["pad_token"] = rng.randn(dim).astype(np.float32)  # skipped
        lin("t_embedder.mlp.0", 256, cond)
        lin("t_embedder.mlp.2", cond, cond)
        sd["cap_embedder.0.weight"] = np.ones(cap_dim, np.float32)
        sd["cap_embedder.0.bias"] = np.zeros(cap_dim, np.float32)
        lin("cap_embedder.1", cap_dim, cond)
        lin("final_layer.linear", dim, 4 * 8)
        lin("final_layer.adaLN_modulation.1", cond, 2 * dim)
        for i in range(n_layers):
            pre = f"layers.{i}"
            lin(f"{pre}.adaLN_modulation.1", cond, 6 * dim)
            sd[f"{pre}.attention_norm.weight"] = np.ones(dim, np.float32)
            sd[f"{pre}.ffn_norm.weight"] = np.ones(dim, np.float32)
            sd[f"{pre}.attention_y_norm.weight"] = np.ones(cap_dim, np.float32)
            for nm in ("wq", "wk", "wv", "wo"):
                lin(f"{pre}.attention.{nm}", dim, dim, bias=False)
            for nm in ("wk_y", "wv_y"):
                lin(f"{pre}.attention.{nm}", cap_dim, dim, bias=False)
            sd[f"{pre}.attention.gate"] = np.zeros(n_heads, np.float32)
            if qk_norm:
                for nm, d in (("q_norm", dim), ("k_norm", dim), ("ky_norm", dim)):
                    sd[f"{pre}.attention.{nm}.weight"] = np.ones(d, np.float32)
                    sd[f"{pre}.attention.{nm}.bias"] = np.zeros(d, np.float32)
            lin(f"{pre}.feed_forward.w1", dim, hidden, bias=False)
            lin(f"{pre}.feed_forward.w2", hidden, dim, bias=False)
            lin(f"{pre}.feed_forward.w3", dim, hidden, bias=False)
        return sd

    def test_import_structure_and_forward(self):
        from lumina_t2x_tpu.core.checkpoint import import_flag_dit_weights
        from lumina_t2x_tpu.models.flag_dit import FlagDiT

        sd = self._fake_flag_dit_sd()
        params = import_flag_dit_weights(sd, n_layers=2, scan_layers=True)
        model = FlagDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                        cap_feat_dim=32, qk_norm=True, attn_impl="xla")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 0.5)
        cap = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
        mask = jnp.ones((2, 7), jnp.int32)
        ref = model.init(jax.random.PRNGKey(2), x, t, cap, mask)["params"]
        ref_shapes = jax.tree.map(np.shape, ref)
        got_shapes = jax.tree.map(np.shape, params)
        assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
        assert ref_shapes == got_shapes
        out = model.apply({"params": params}, x, t, cap, mask)
        assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))
