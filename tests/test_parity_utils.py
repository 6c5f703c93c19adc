"""Tests for parity utilities (grad_norm API, data_reader, loss scraper) and
the DreamBooth trainer."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from lumina_t2x_tpu.core.loss_plot import compare_runs, read_metrics_jsonl, scrape_log
from lumina_t2x_tpu.data.data_reader import read_general, set_client
from lumina_t2x_tpu.parallel.grad_norm import (
    calculate_l2_grad_norm,
    clip_grad_norm,
    get_model_parallel_dim_dict,
    scale_grad,
)


class TestGradNorm:
    def test_l2_norm(self):
        grads = {"a": jnp.ones((2, 2)), "b": jnp.ones((3,))}
        np.testing.assert_allclose(float(calculate_l2_grad_norm(grads)), np.sqrt(7), rtol=1e-6)

    def test_scale(self):
        g = scale_grad({"a": jnp.ones(3)}, 0.5)
        np.testing.assert_allclose(np.asarray(g["a"]), 0.5)

    def test_clip(self):
        grads = {"a": jnp.full((4,), 10.0)}
        clipped, norm = clip_grad_norm(grads, 1.0)
        np.testing.assert_allclose(float(norm), 20.0)
        np.testing.assert_allclose(float(calculate_l2_grad_norm(clipped)), 1.0, rtol=1e-4)

    def test_mp_dim_dict(self):
        params = {"layers": {"attention": {"wq": {"kernel": jnp.zeros((4, 8))},
                                           "wo": {"kernel": jnp.zeros((8, 4))}}}}
        d = get_model_parallel_dim_dict(params)
        assert d["layers/attention/wq/kernel"] == 1
        assert d["layers/attention/wo/kernel"] == 0


class TestDataReader:
    def test_local(self, tmp_path):
        p = tmp_path / "f.bin"
        p.write_bytes(b"hello")
        assert read_general(str(p)).read() == b"hello"
        assert read_general(f"file://{p}").read() == b"hello"

    def test_client_hook(self):
        set_client(lambda url: b"remote:" + url.encode())
        assert read_general("s3://bucket/key").read() == b"remote:s3://bucket/key"
        set_client(None) if False else None

    def test_no_client_raises(self):
        import lumina_t2x_tpu.data.data_reader as dr

        dr._CLIENT = None
        with pytest.raises(RuntimeError):
            read_general("s3://nope")


class TestLossScraper:
    def test_scrape_log(self, tmp_path):
        log = tmp_path / "log.txt"
        log.write_text(
            "[ts] (step=0000100) Train Loss: 0.5123, Train Grad Norm: 1.0, imgs/sec: 5\n"
            "[ts] junk line\n"
            "[ts] (step=0000200) Train Loss: 0.4000, Train Grad Norm: 0.9, imgs/sec: 5\n"
        )
        steps, losses = scrape_log(str(log))
        assert steps == [100, 200]
        np.testing.assert_allclose(losses, [0.5123, 0.4])

    def test_jsonl_and_compare(self, tmp_path):
        d = tmp_path / "run1"
        d.mkdir()
        with open(d / "metrics.jsonl", "w") as f:
            f.write(json.dumps({"step": 1, "train/loss": 0.9}) + "\n")
            f.write(json.dumps({"step": 2, "train/loss": 0.8}) + "\n")
        out = compare_runs({"run1": str(d)})
        assert out["run1"] == ([1, 2], [0.9, 0.8])


class TestDreamBooth:
    def test_short_run_with_prior(self, tmp_path):
        inst = tmp_path / "inst"
        cls = tmp_path / "cls"
        inst.mkdir(); cls.mkdir()
        for i in range(2):
            Image.new("RGB", (64, 64), (200, 10 * i, 0)).save(inst / f"{i}.png")
            Image.new("RGB", (64, 64), (0, 200, 10 * i)).save(cls / f"{i}.png")

        from lumina_t2x_tpu import models as m
        from lumina_t2x_tpu.models.next_dit import NextDiT
        from lumina_t2x_tpu.pipelines.dreambooth import main

        m.MODELS["NextDiT_2B_patch2"] = lambda **kw: NextDiT(
            **{**dict(dim=32, n_layers=1, n_heads=4, multiple_of=16),
               **{k: v for k, v in kw.items() if k != "remat"}}
        )
        state = main([
            "--instance_data_dir", str(inst),
            "--class_data_dir", str(cls),
            "--instance_prompt", "a photo of sks dog",
            "--class_prompt", "a photo of a dog",
            "--with_prior_preservation",
            "--resolution", "64",
            "--max_train_steps", "3",
            "--cap_feat_dim", "16",
            "--precision", "fp32",
            "--output_dir", str(tmp_path / "out"),
        ])
        assert int(state.step) == 3
        assert (tmp_path / "out" / "checkpoints" / "0000003").exists()
        # the 'ema' stream (what every sampler restores) must carry the
        # fine-tuned weights: with the default ema_decay=0 it tracks params
        # exactly — never the random init
        import jax as _jax
        import numpy as _np

        _jax.tree.map(
            lambda e, q: _np.testing.assert_array_equal(_np.asarray(e), _np.asarray(q)),
            state.ema_params, state.params)

    def test_sd3_mode_with_prior(self, tmp_path):
        """SD3/MMDiT DreamBooth: (context, pooled) conditioning through the
        real triple-encoder path (debug towers), 16-ch latents, the SD3
        timestep/sign loss bridge — the `train_dreambooth_sd3.py`
        counterpart run end-to-end."""
        inst = tmp_path / "inst3"
        cls = tmp_path / "cls3"
        inst.mkdir(); cls.mkdir()
        for i in range(2):
            Image.new("RGB", (64, 64), (200, 10 * i, 0)).save(inst / f"{i}.png")
            Image.new("RGB", (64, 64), (0, 200, 10 * i)).save(cls / f"{i}.png")

        from lumina_t2x_tpu import models as m
        from lumina_t2x_tpu.models.mmdit import MMDiT
        from lumina_t2x_tpu.pipelines.dreambooth import main

        m.MODELS["MMDiT_SD3_Medium"] = lambda **kw: MMDiT(
            patch_size=2, in_channels=16, dim=32, n_layers=2, n_heads=2,
            **{k: v for k, v in kw.items() if k not in ("remat",)})
        state = main([
            "--model", "MMDiT_SD3_Medium",
            "--instance_data_dir", str(inst),
            "--class_data_dir", str(cls),
            "--instance_prompt", "a photo of sks dog",
            "--class_prompt", "a photo of a dog",
            "--with_prior_preservation",
            "--resolution", "64",
            "--max_train_steps", "2",
            "--precision", "fp32",
            "--output_dir", str(tmp_path / "out3"),
        ])
        assert int(state.step) == 2
        assert (tmp_path / "out3" / "checkpoints" / "0000002").exists()

    def test_prior_flag_requires_class_data(self, tmp_path):
        inst = tmp_path / "inst2"
        inst.mkdir()
        Image.new("RGB", (64, 64)).save(inst / "0.png")
        from lumina_t2x_tpu.pipelines.dreambooth import main

        with pytest.raises(ValueError, match="class_data_dir"):
            main(["--instance_data_dir", str(inst),
                  "--instance_prompt", "a photo of sks dog",
                  "--with_prior_preservation",
                  "--resolution", "64", "--max_train_steps", "1",
                  "--cap_feat_dim", "16", "--precision", "fp32",
                  "--output_dir", str(tmp_path / "out2")])
