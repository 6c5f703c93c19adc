"""Tests for the anagrams app, audio app, and structured captions."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.pipelines.anagrams_app import (
    animate_two_view,
    generate_anagram,
    save_illusion,
)
from lumina_t2x_tpu.pipelines.audio_app import (
    GenSamples,
    natural_to_structured,
    save_wav,
)


class TestAnagramsApp:
    def test_generate_anagram_tiny(self, tmp_path):
        from lumina_t2x_tpu.models.next_dit import NextDiT
        from lumina_t2x_tpu.pipelines.anagrams import get_anagrams_views

        model = NextDiT(dim=32, n_layers=1, n_heads=4, multiple_of=16,
                        cap_feat_dim=16, attn_impl="xla")
        views = get_anagrams_views(["identity", "rotate_180"])
        rng = jax.random.PRNGKey(0)
        caps = [jax.random.normal(jax.random.fold_in(rng, i), (2, 4, 16)) for i in range(2)]
        masks = [jnp.ones((2, 4), jnp.int32)] * 2
        variables = model.init(rng, jnp.zeros((2, 4, 8, 8)), jnp.zeros((2,)),
                               caps[0], masks[0])
        phase1, phase2 = generate_anagram(
            model, variables, caps, masks, views, base_latent=8, num_steps=3,
        )
        assert phase1.shape == (1, 4, 8, 8)
        assert phase2 is None
        paths = save_illusion(phase1, views, str(tmp_path))
        assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    def test_animate(self, tmp_path):
        a = np.zeros((16, 16, 3), np.uint8)
        b = np.full((16, 16, 3), 255, np.uint8)
        out = animate_two_view(a, b, str(tmp_path / "m.gif"), num_frames=4, hold_frames=2)
        assert os.path.exists(out)


class TestStructuredCaptions:
    def test_single_event(self):
        s = natural_to_structured("a dog barking")
        assert s == "<a dog barking& all>"

    def test_sequence(self):
        s = natural_to_structured("train passing followed by short honks")
        assert s == "<train passing& start>@<short honks& end>"

    def test_three_events(self):
        s = natural_to_structured("rain, thunder, then wind")
        parts = s.split("@")
        assert len(parts) == 3
        assert "start" in parts[0] and "mid" in parts[1] and "end" in parts[2]

    def test_llm_hook(self):
        s = natural_to_structured("x", llm_fn=lambda c: "<custom& all>")
        assert s == "<custom& all>"


class TestAudioApp:
    def test_save_wav(self, tmp_path):
        path = save_wav(np.sin(np.linspace(0, 100, 1600)), str(tmp_path / "t.wav"))
        assert os.path.getsize(path) > 3000

    def test_main_debug(self, tmp_path):
        from lumina_t2x_tpu.pipelines.audio_app import main

        out = main([
            "--task", "music", "--prompt", "upbeat jazz",
            "--output_dir", str(tmp_path), "--num_steps", "2",
            "--latent_length", "16", "--debug",
        ])
        assert os.path.exists(out)


class TestCompositionalApp:
    def test_main_debug(self, tmp_path, monkeypatch):
        import lumina_t2x_tpu.pipelines.compositional_app as ca
        from lumina_t2x_tpu.models.compositional import NextDiTCompositional

        monkeypatch.setattr(
            ca, "NextDiT_2B_patch2_Compositional",
            lambda **kw: NextDiTCompositional(
                **{**dict(dim=32, n_layers=1, n_heads=4, multiple_of=16),
                   **{k: v for k, v in kw.items()}}
            ),
        )
        out = ca.main([
            "--region_prompts", "a cat", "a dog",
            "--global_prompt", "two animals",
            "--h_split_num", "1", "--w_split_num", "2",
            "--resolution", "64x64",
            "--num_sampling_steps", "2",
            "--image_save_path", str(tmp_path),
            "--debug",
        ])
        assert os.path.exists(out)


class TestEncodeLatents:
    def test_encode_tool(self, tmp_path):
        import json as _json

        from PIL import Image as _Image

        from lumina_t2x_tpu.pipelines.encode_latents import main

        imgdir = tmp_path / "imgs"
        imgdir.mkdir()
        ann = []
        for i in range(3):
            p = imgdir / f"{i}.png"
            _Image.new("RGB", (64, 64), (i * 50, 20, 20)).save(p)
            ann.append({"path": str(p), "prompt": f"img {i}"})
        annfile = tmp_path / "ann.json"
        annfile.write_text(_json.dumps(ann))
        cfg = tmp_path / "data.yaml"
        cfg.write_text(_json.dumps({"META": [{"path": str(annfile)}]}))

        out = main([
            "--data_path", str(cfg), "--out", str(tmp_path / "enc"),
            "--image_size", "64", "--precision", "fp32", "--limit", "3",
        ])
        assert os.path.exists(os.path.join(out, "latents", "0.npy"))
        assert os.path.exists(os.path.join(out, "captions", "2.npy"))
        idx = _json.loads(open(os.path.join(out, "index.json")).read())
        assert len(idx) == 3
        z = np.load(os.path.join(out, "latents", "0.npy"))
        assert z.shape[0] == 4  # latent channels


class TestSampleSD3:
    def test_main_debug(self, tmp_path, monkeypatch):
        """sample_sd3 CLI end-to-end with a tiny MMDiT: reversed-time SD3 ODE,
        in-loop CFG, manifest + skip-resume."""
        from lumina_t2x_tpu.models.mmdit import MMDiT
        from lumina_t2x_tpu.pipelines import sample_sd3

        monkeypatch.setattr(
            sample_sd3, "get_model",
            lambda name, **kw: MMDiT(patch_size=2, in_channels=16, dim=32,
                                     n_layers=2, n_heads=2, **kw),
        )
        cap = tmp_path / "caps.txt"
        cap.write_text("a cat\na dog\n")
        out = tmp_path / "out"
        sample_sd3.main([
            "--caption_path", str(cap), "--image_save_path", str(out),
            "--resolution", "1:64x64", "--num_sampling_steps", "2",
            "--debug", "--precision", "fp32",
        ])
        import json

        info = json.load(open(out / "data.json"))
        assert len(info) == 2
        a = np.load(info[0]["path"])
        assert a.shape == (16, 8, 8) and np.isfinite(a).all()
        # skip-resume: rerun adds nothing
        sample_sd3.main([
            "--caption_path", str(cap), "--image_save_path", str(out),
            "--resolution", "1:64x64", "--num_sampling_steps", "2",
            "--debug", "--precision", "fp32",
        ])
        assert len(json.load(open(out / "data.json"))) == 2
