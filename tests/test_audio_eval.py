"""CLAP-score eval harness (`eval/audio_eval.py`) + the text tower's
sentence-level `embed` (CLS + projection + L2 norm, `CLAP/clap.py:68-72`)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from lumina_t2x_tpu.eval.audio_eval import (clap_eval_directory, clap_scores,
                                            read_wav, write_report)
from test_clap_audio import _rand_sd


def _audio_encoder(rng):
    from lumina_t2x_tpu.codecs.clap_audio import (CLAPAudioEncoder,
                                                  import_clap_audio_weights)

    return CLAPAudioEncoder(import_clap_audio_weights(
        _rand_sd(rng), sample_rate=8000, window_size=256, hop_size=80,
        mel_bins=64, fmin=50, fmax=4000), duration=1.0)


class _FakeTextModel:
    """Deterministic per-prompt hidden states (the CLS row varies with the
    first token id) standing in for the HF base (offline)."""

    def __init__(self, dim=33):
        self.dim = dim

    def __call__(self, input_ids, attention_mask):
        rows = []
        for seq in np.asarray(input_ids):
            r = np.random.RandomState(int(seq[0]) + 1)
            rows.append(r.normal(0, 1, (len(seq), self.dim)).astype(np.float32))

        class Out:
            last_hidden_state = jnp.asarray(np.stack(rows))

        return Out()


class _FakeTok:
    def __call__(self, texts, truncation=True, max_length=77,
                 padding="max_length", return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            seq = [(ord(c) % 250) + 1 for c in t][:max_length] or [1]
            ids[i, :len(seq)] = seq
            mask[i, :len(seq)] = 1

        class Out:
            pass

        o = Out()
        o.input_ids, o.attention_mask = ids, mask
        return o


def _text_encoder(rng, d_in=33, d_proj=96):
    from lumina_t2x_tpu.codecs.text_encoders import CLAPTextEncoder

    proj = {
        "linear1": {"kernel": rng.normal(0, 0.1, (d_in, d_proj)).astype(np.float32)},
        "linear2": {"kernel": rng.normal(0, 0.1, (d_proj, d_proj)).astype(np.float32)},
        "layer_norm": {"scale": np.ones(d_proj, np.float32),
                       "bias": np.zeros(d_proj, np.float32)},
    }
    return CLAPTextEncoder(_FakeTextModel(d_in), _FakeTok(), proj, max_length=16)


class TestTextEmbed:
    def test_embed_is_normalized_and_prompt_dependent(self):
        rng = np.random.RandomState(0)
        enc = _text_encoder(rng)
        e = np.asarray(enc.embed(["rain on a roof", "zebra drum solo"]))
        assert e.shape == (2, 96)
        np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)
        assert np.abs(e[0] - e[1]).max() > 1e-3

    def test_embed_requires_projection(self):
        from lumina_t2x_tpu.codecs.text_encoders import CLAPTextEncoder

        enc = CLAPTextEncoder(_FakeTextModel(), _FakeTok(), None)
        with pytest.raises(ValueError):
            enc.embed(["x"])


class TestWavIO:
    def test_round_trip(self, tmp_path):
        from lumina_t2x_tpu.pipelines.audio_app import save_wav

        rng = np.random.RandomState(1)
        wav = np.clip(rng.normal(0, 0.3, 4000), -1, 1).astype(np.float32)
        p = save_wav(wav, str(tmp_path / "a.wav"), sample_rate=8000)
        back, sr = read_wav(p)
        assert sr == 8000 and back.shape == wav.shape
        # writer scales by 32767 and truncates, reader divides by 32768:
        # worst case one quantization unit + the scale ratio
        np.testing.assert_allclose(back, wav, atol=2.0 / 32767)


class TestClapEval:
    def test_directory_report(self, tmp_path):
        from lumina_t2x_tpu.pipelines.audio_app import save_wav

        rng = np.random.RandomState(2)
        audio_enc = _audio_encoder(rng)
        text_enc = _text_encoder(rng)
        prompts = ["rain", "drums", "speech"]
        for i in range(3):
            save_wav(np.clip(rng.normal(0, 0.2, 8000), -1, 1),
                     str(tmp_path / f"{i}.wav"), sample_rate=8000)
        pfile = tmp_path / "prompts.txt"
        pfile.write_text("\n".join(prompts) + "\n")
        report = clap_eval_directory(text_enc, audio_enc, str(tmp_path),
                                     str(pfile), batch_size=2)
        assert report["n"] == 3 and len(report["per_file"]) == 3
        scores = np.array(list(report["per_file"].values()))
        assert np.all(np.abs(scores) <= 1.0 + 1e-5)
        assert abs(report["mean_clap_score"] - scores.mean()) < 1e-6
        out = write_report(report, str(tmp_path / "clap.json"))
        assert os.path.exists(out)

    def test_matched_embedding_scores_one(self, tmp_path):
        """A wav whose audio embedding is compared against ITSELF as the
        'text' embedding scores exactly 1 — pins the cosine semantics."""
        from lumina_t2x_tpu.codecs.clap_audio import clap_score

        rng = np.random.RandomState(3)
        audio_enc = _audio_encoder(rng)
        wav = np.clip(rng.normal(0, 0.2, 8000), -1, 1).astype(np.float32)
        emb = np.asarray(audio_enc.embed(wav, sr=8000))
        np.testing.assert_allclose(np.asarray(clap_score(emb, emb)), 1.0, atol=1e-5)

    def test_length_mismatch_raises(self, tmp_path):
        rng = np.random.RandomState(4)
        with pytest.raises(ValueError):
            clap_scores(_text_encoder(rng), _audio_encoder(rng),
                        ["a.wav"], ["p1", "p2"])
