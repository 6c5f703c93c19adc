"""End-to-end smoke tests — the §7 minimum slice and the app surface.

Mirrors the reference's quality-control style (SURVEY.md §4): `--debug`
random-weight pipeline runs, short synthetic training with loss decrease,
sampler-level CFG trajectories."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestMinimumSlice:
    """BASELINE config 1: class-conditional sampling with the midpoint solver."""

    def test_class_cond_sampling_e2e(self):
        from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet
        from lumina_t2x_tpu.pipelines.sample_lib import build_class_cond_sample_fn

        model = NextDiTImageNet(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                                num_classes=10, attn_impl="xla")
        labels = jnp.array([1, 7])
        x0 = jnp.zeros((1, 4, 8, 8))
        variables = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)), labels[:1])
        fn = jax.jit(build_class_cond_sample_fn(
            model, num_steps=8, solver="midpoint", cfg_scale=4.0, latent_size=8,
        ))
        out = fn(variables, jax.random.PRNGKey(1), labels)
        assert out.shape == (2, 4, 8, 8)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_training_reduces_loss_on_learnable_task(self):
        """Short synthetic training run: loss must clearly decrease."""
        from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet
        from lumina_t2x_tpu.pipelines.train_lib import (
            create_optimizer, create_train_state, make_train_step,
        )
        from lumina_t2x_tpu.transport import create_transport

        model = NextDiTImageNet(dim=32, n_layers=2, n_heads=4, multiple_of=16,
                                num_classes=4, class_dropout_prob=0.0, attn_impl="xla")
        rng = np.random.default_rng(0)
        data = rng.standard_normal((8, 4, 8, 8)).astype(np.float32) * 0.01  # near-zero data
        batch = {"x": jnp.asarray(data), "y": jnp.zeros((8,), jnp.int32)}
        cond = lambda b: {"y": b["y"]}
        opt = create_optimizer(2e-3)
        state = create_train_state(jax.random.PRNGKey(0), model, batch, opt, cond)
        transport = create_transport("Linear", "velocity")
        step = jax.jit(make_train_step(model, transport, opt, cond, grad_clip=10.0))
        losses = []
        for i in range(30):
            state, m = step(state, batch, jax.random.PRNGKey(3))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]:.3f}->{losses[-1]:.3f}"


class TestTrainApp:
    def test_synthetic_training_runs(self, tmp_path):
        from lumina_t2x_tpu.pipelines.train import main

        state = main([
            "--model", "NextDiT_ImageNet_600M_patch2",
            "--data_path", "synthetic://8x8",
            "--results_dir", str(tmp_path),
            "--global_batch_size", "8",
            "--max_steps", "3",
            "--log_every", "1",
            "--ckpt_every", "3",
            "--lr", "1e-4",
            "--precision", "fp32",
        ] + _tiny_overrides())
        assert int(state.step) == 3
        ckpt = tmp_path / "NextDiT_ImageNet_600M_patch2" / "checkpoints" / "0000003"
        assert ckpt.exists()
        assert (ckpt / "model_args.json").exists()

    def test_profile_steps_writes_trace(self, tmp_path):
        """--profile_steps captures a jax.profiler trace (SURVEY.md §5: a
        capability the reference lacks — it only wall-clock-logs)."""
        from lumina_t2x_tpu.pipelines.train import main

        main([
            "--model", "NextDiT_ImageNet_600M_patch2",
            "--data_path", "synthetic://8x8",
            "--results_dir", str(tmp_path),
            "--global_batch_size", "8",
            "--max_steps", "3",
            "--log_every", "1",
            "--ckpt_every", "100",
            "--precision", "fp32",
            "--profile_steps", "1",
        ] + _tiny_overrides())
        trace_dir = tmp_path / "NextDiT_ImageNet_600M_patch2" / "trace"
        assert trace_dir.exists()
        assert list(trace_dir.rglob("*.xplane.pb")), "no xplane trace written"

    def test_sigterm_checkpoints_and_exits(self, tmp_path):
        """Preemption safety: SIGTERM mid-run -> checkpoint at the next step
        boundary + clean return; --auto_resume continues from it."""
        import os
        import signal
        import threading

        from lumina_t2x_tpu.pipelines.train import main

        argv = [
            "--model", "NextDiT_ImageNet_600M_patch2",
            "--data_path", "synthetic://8x8",
            "--results_dir", str(tmp_path),
            "--global_batch_size", "8",
            "--max_steps", "200",
            "--log_every", "50",
            "--ckpt_every", "200",
            "--precision", "fp32",
        ] + _tiny_overrides()
        timer = threading.Timer(1.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
        timer.start()
        try:
            state = main(argv)
        finally:
            timer.cancel()
        stopped = int(state.step)
        assert stopped < 200, "SIGTERM did not stop the run early"
        ckpts = tmp_path / "NextDiT_ImageNet_600M_patch2" / "checkpoints"
        assert (ckpts / f"{stopped:07d}").exists()
        state = main(argv + ["--auto_resume"])
        assert int(state.step) > stopped

    def test_resume(self, tmp_path):
        from lumina_t2x_tpu.pipelines.train import main

        argv = [
            "--model", "NextDiT_ImageNet_600M_patch2",
            "--data_path", "synthetic://8x8",
            "--results_dir", str(tmp_path),
            "--global_batch_size", "8",
            "--max_steps", "2",
            "--log_every", "1",
            "--ckpt_every", "2",
            "--precision", "fp32",
        ] + _tiny_overrides()
        main(argv)
        argv[argv.index("--max_steps") + 1] = "4"
        state = main(argv + ["--auto_resume"])
        assert int(state.step) == 4


def _tiny_overrides():
    """Shrink the registry 600M model for CI speed via monkeypatched registry."""
    # the train app reads the registry; patch a tiny config under the same name
    from lumina_t2x_tpu import models as m
    from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet

    m.MODELS["NextDiT_ImageNet_600M_patch2"] = lambda **kw: NextDiTImageNet(
        **{**dict(dim=32, n_layers=2, n_heads=4, multiple_of=16, num_classes=16,
                  attn_impl="xla"), **{k: v for k, v in kw.items() if k not in ("remat",)}}
    )
    return []


class TestSampleApp:
    def test_debug_class_cond(self, tmp_path):
        _tiny_overrides()
        from lumina_t2x_tpu.pipelines.sample import main

        manifest = main([
            "--model", "NextDiT_ImageNet_600M_patch2",
            "--labels", "1,2",
            "--resolution", "1:64x64",
            "--num_sampling_steps", "4",
            "--image_save_path", str(tmp_path / "out"),
            "--precision", "fp32",
            "--debug",
        ])
        assert len(manifest["items"]) == 2
        assert (tmp_path / "out" / "data.json").exists()
        for item in manifest["items"]:
            assert os.path.exists(item["path"])

    def test_debug_class_cond_model_parallel(self, tmp_path):
        """--model_parallel_size 2 shards the restored params TP over the
        virtual mesh and the jitted sampler matches the unsharded output
        (reference: lumina_t2i/sample.py MP sampling)."""
        import numpy as np

        _tiny_overrides()
        from lumina_t2x_tpu.pipelines.sample import main

        argv = [
            "--model", "NextDiT_ImageNet_600M_patch2",
            "--labels", "1,2",
            "--resolution", "1:64x64",
            "--num_sampling_steps", "4",
            "--precision", "fp32",
            "--debug",
        ]
        ref = main(argv + ["--image_save_path", str(tmp_path / "ref")])
        mp = main(argv + ["--image_save_path", str(tmp_path / "mp"),
                          "--model_parallel_size", "2"])
        for a, b in zip(ref["items"], mp["items"]):
            np.testing.assert_allclose(np.load(a["path"]), np.load(b["path"]),
                                       atol=2e-5)

    def test_debug_t2i(self, tmp_path):
        from lumina_t2x_tpu import models as m
        from lumina_t2x_tpu.models.next_dit import NextDiT

        m.MODELS["NextDiT_2B_patch2"] = lambda **kw: NextDiT(
            **{**dict(dim=32, n_layers=2, n_heads=4, multiple_of=16),
               **{k: v for k, v in kw.items() if k != "remat"}}
        )
        from lumina_t2x_tpu.pipelines.sample import main

        prompts = tmp_path / "prompts.txt"
        prompts.write_text("a cat\n")
        manifest = main([
            "--model", "NextDiT_2B_patch2",
            "--caption_path", str(prompts),
            "--resolution", "1:64x64",
            "--num_sampling_steps", "4",
            "--image_save_path", str(tmp_path / "out"),
            "--precision", "fp32",
            "--train_res", "64",
            "--debug",
        ])
        assert len(manifest["items"]) == 1


class TestCLI:
    def test_infer_default_subcommand(self, tmp_path):
        """`lumina "prompt" out/` without naming a subcommand."""
        from click.testing import CliRunner

        from lumina_t2x_tpu import models as m
        from lumina_t2x_tpu.cli.entry_point import main
        from lumina_t2x_tpu.models.next_dit import NextDiT

        m.MODELS["NextDiT_2B_patch2"] = lambda **kw: NextDiT(
            **{**dict(dim=32, n_layers=2, n_heads=4, multiple_of=16),
               **{k: v for k, v in kw.items() if k != "remat"}}
        )
        cfg = tmp_path / "settings.yaml"
        cfg.write_text(json.dumps([{
            "infer": {"resolution": "64x64", "num_sampling_steps": 2, "solver": "euler",
                      "cfg_scale": 4.0, "t_shift": 4, "seed": 0, "scaling_watershed": 0.3,
                      "proportional_attn": False},
        }]))
        runner = CliRunner()
        res = runner.invoke(main, ["a dog", str(tmp_path / "out"), "-c", str(cfg), "--debug"])
        assert res.exit_code == 0, res.output
        assert (tmp_path / "out" / "data.json").exists()

    def test_convert_roundtrip(self, tmp_path):
        from click.testing import CliRunner

        from lumina_t2x_tpu.cli.entry_point import main
        from tests.test_checkpoint import TestTorchImport

        sd = TestTorchImport()._fake_torch_sd()
        from lumina_t2x_tpu.core.checkpoint import save_safetensors

        src = str(tmp_path / "ref.safetensors")
        save_safetensors(sd, src)
        runner = CliRunner()
        res = runner.invoke(main, ["convert", src, str(tmp_path / "jax_ckpt"),
                                   "--n_layers", "2"])
        assert res.exit_code == 0, res.output
        res2 = runner.invoke(main, ["convert", str(tmp_path / "jax_ckpt"),
                                    str(tmp_path / "back.safetensors"),
                                    "--direction", "to_safetensors"])
        assert res2.exit_code == 0, res2.output
        from lumina_t2x_tpu.core.checkpoint import load_torch_state_dict

        back = load_torch_state_dict(str(tmp_path / "back.safetensors"))
        np.testing.assert_allclose(back["x_embedder.weight"], sd["x_embedder.weight"])


class TestFIDSampling:
    def test_fid_npz_dump(self, tmp_path):
        _tiny_overrides()
        from lumina_t2x_tpu.pipelines.sample import main

        main([
            "--model", "NextDiT_ImageNet_600M_patch2",
            "--labels", "0",
            "--resolution", "1:64x64",
            "--num_sampling_steps", "2",
            "--image_save_path", str(tmp_path),
            "--precision", "fp32",
            "--num_fid_samples", "5",
            "--batch_size", "2",
            "--debug",
        ])
        import glob

        files = glob.glob(str(tmp_path / "samples_5x*.npz"))
        assert files, "npz not written"
        arr = np.load(files[0])["arr_0"]
        assert arr.shape[0] == 5


class TestFlagDiTImageNetSampler:
    def test_class_cond_sampler_routes_y_by_keyword(self, tmp_path):
        """Class-cond Flag-DiT shares the text model's signature
        (x, t, cap_feats=None, ..., y=None): the sampler/CFG must pass y by
        keyword or labels silently land in cap_feats (regression: crashed
        with a broadcast error)."""
        from lumina_t2x_tpu import models as m
        from lumina_t2x_tpu.models.flag_dit import FlagDiT

        m.MODELS["FlagDiT_ImageNet_600M_patch2"] = lambda **kw: FlagDiT(
            patch_size=2, dim=32, n_layers=1, n_heads=4, multiple_of=16,
            num_classes=8, use_eol_token=False, attn_impl="xla",
            **{k: v for k, v in kw.items() if k in ("qk_norm",)})
        from lumina_t2x_tpu.pipelines.sample import main

        manifest = main([
            "--model", "FlagDiT_ImageNet_600M_patch2",
            "--labels", "2,5",
            "--resolution", "1:32x32",
            "--num_sampling_steps", "2",
            "--image_save_path", str(tmp_path / "out"),
            "--precision", "fp32",
            "--debug",
        ])
        assert len(manifest["items"]) == 2
