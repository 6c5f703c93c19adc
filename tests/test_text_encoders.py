"""Text encoder wrapper tests with tiny randomly-initialized HF Flax models
(no network egress in this environment)."""

import numpy as np
import pytest

from lumina_t2x_tpu.codecs.text_encoders import (
    DecoderTextEncoder,
    T5TextEncoder,
    apply_empty_prompt_dropout,
    tokenize_prompts,
)


@pytest.fixture(scope="module")
def tiny_gemma():
    from transformers import FlaxGemmaModel, GemmaConfig, GPT2Tokenizer

    cfg = GemmaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8, max_position_embeddings=64,
    )
    model = FlaxGemmaModel(cfg)

    # byte-level tokenizer substitute (offline): simple whitespace->ids
    class FakeTok:
        padding_side = "right"
        pad_token_id = 0

        def __call__(self, texts, padding=True, pad_to_multiple_of=8, max_length=256,
                     truncation=True, return_tensors="np"):
            ids = [[(ord(c) % 255) + 1 for c in t][:max_length] or [1] for t in texts]
            maxlen = max(len(i) for i in ids)
            if pad_to_multiple_of:
                maxlen = (maxlen + pad_to_multiple_of - 1) // pad_to_multiple_of * pad_to_multiple_of
            input_ids = np.zeros((len(ids), maxlen), np.int32)
            mask = np.zeros((len(ids), maxlen), np.int32)
            for r, seq in enumerate(ids):
                input_ids[r, : len(seq)] = seq
                mask[r, : len(seq)] = 1

            class Out:
                pass

            o = Out()
            o.input_ids = input_ids
            o.attention_mask = mask
            return o

    return DecoderTextEncoder(model, FakeTok(), max_length=64)


class TestEmptyPromptDropout:
    def test_no_dropout(self):
        out = apply_empty_prompt_dropout(["a", "b"], 0.0)
        assert out == ["a", "b"]

    def test_full_dropout(self):
        out = apply_empty_prompt_dropout(["a", "b"], 1.0)
        assert out == ["", ""]

    def test_multi_caption_eval_takes_first(self):
        out = apply_empty_prompt_dropout([["x", "y"]], 0.0, is_train=False)
        assert out == ["x"]


class TestDecoderTextEncoder:
    def test_hidden_states_minus_2(self, tiny_gemma):
        feats, mask = tiny_gemma.encode(["hello world", "a"])
        assert feats.ndim == 3 and feats.shape[0] == 2
        assert feats.shape[2] == tiny_gemma.hidden_size == 32
        assert mask.shape == feats.shape[:2]
        # pad-to-multiple-of-8
        assert feats.shape[1] % 8 == 0

    def test_features_differ_between_prompts(self, tiny_gemma):
        f1, _ = tiny_gemma.encode(["hello"])
        f2, _ = tiny_gemma.encode(["world"])
        assert not np.allclose(np.asarray(f1), np.asarray(f2))

    def test_empty_prompt_encodes(self, tiny_gemma):
        feats, mask = tiny_gemma.encode([""])
        assert np.all(np.isfinite(np.asarray(feats)))


class TestCLAPExtraction:
    def test_projection_math(self):
        import jax.numpy as jnp

        from lumina_t2x_tpu.codecs.text_encoders import clap_projection

        d_in, d_out = 8, 4
        rng = np.random.RandomState(0)
        params = {
            "linear1": {"kernel": rng.randn(d_in, d_out).astype(np.float32)},
            "linear2": {"kernel": rng.randn(d_out, d_out).astype(np.float32)},
            "layer_norm": {"scale": np.ones(d_out, np.float32),
                           "bias": np.zeros(d_out, np.float32)},
        }
        x = rng.randn(2, 3, d_in).astype(np.float32)
        out = clap_projection(jnp.asarray(x), params)
        # torch-reference math
        import torch
        import torch.nn.functional as F

        e1 = torch.from_numpy(x) @ torch.from_numpy(params["linear1"]["kernel"])
        e2 = F.gelu(e1) @ torch.from_numpy(params["linear2"]["kernel"])
        ref = F.layer_norm(e1 + e2, (d_out,)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_extract_caption_weights(self):
        from lumina_t2x_tpu.codecs.text_encoders import extract_clap_caption_weights

        sd = {
            "caption_encoder.base.embeddings.word_embeddings.weight": np.zeros((10, 4)),
            "caption_encoder.projection.linear1.weight": np.ones((4, 8)),
            "caption_encoder.projection.layer_norm.weight": np.ones(4),
            "caption_encoder.projection.layer_norm.bias": np.zeros(4),
            "caption_encoder.projection.linear2.weight": np.ones((4, 4)),
            "audio_encoder.base.conv.weight": np.zeros((3, 3)),  # must be ignored
        }
        base, proj = extract_clap_caption_weights(sd)
        assert "embeddings.word_embeddings.weight" in base
        assert not any("audio" in k for k in base)
        assert proj["linear1"]["kernel"].shape == (8, 4)  # transposed
        assert proj["layer_norm"]["scale"].shape == (4,)
