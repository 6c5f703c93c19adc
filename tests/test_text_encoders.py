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


class TestTorchCrossParity:
    def test_gemma_flax_matches_torch_reference_recipe(self, tiny_gemma, tmp_path):
        """The flax encode() path equals the reference's own torch recipe
        (`lumina_next_t2i/train.py:218-248`: AutoModel + output_hidden_states
        + hidden_states[-2]) with identical weights — transformers' torch
        GemmaModel is the exact class the reference runs, instantiated here
        from the flax checkpoint (no network). This pins the convention chain
        (right-pad ids -> [-2] features) at the implementation level; only
        real released weights remain untested (docs/validation.md step 1)."""
        import torch
        from transformers import GemmaModel
        from transformers.modeling_flax_pytorch_utils import (
            load_flax_weights_in_pytorch_model,
        )

        # from_pretrained(from_flax=True) meta-inits the torch model in this
        # transformers build and crashes in .item(); convert the live params
        # with the same underlying utility instead.
        torch_model = GemmaModel(tiny_gemma.model.config)
        load_flax_weights_in_pytorch_model(torch_model, tiny_gemma.model.params)
        torch_model.eval()

        prompts = ["a corgi wearing sunglasses", "low-poly render", ""]
        feats, mask = tiny_gemma.encode(prompts)

        ids_np, mask_np = tokenize_prompts(tiny_gemma.tokenizer, prompts, tiny_gemma.max_length)
        with torch.no_grad():
            out = torch_model(
                input_ids=torch.from_numpy(ids_np).long(),
                attention_mask=torch.from_numpy(mask_np).long(),
                output_hidden_states=True,
            )
        ref = out.hidden_states[-2].numpy()

        assert feats.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(mask), mask_np)
        # compare on the attended positions (pad rows may differ under
        # different mask conventions but are masked out downstream)
        m = mask_np[..., None].astype(bool)
        diff = np.abs(np.asarray(feats, np.float32) - ref)[np.broadcast_to(m, ref.shape)]
        assert float(diff.max()) < 5e-4, float(diff.max())


    def test_llama_flax_matches_torch(self, tmp_path):
        """Same cross-check for the 5B Flag-DiT's LLaMA path
        (`lumina_t2i/train.py:277-280`: AutoModelForCausalLM().get_decoder(),
        hidden_states[-2])."""
        import torch
        from transformers import FlaxLlamaModel, LlamaConfig, LlamaModel
        from transformers.modeling_flax_pytorch_utils import (
            load_flax_weights_in_pytorch_model,
        )

        cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=4, max_position_embeddings=64)
        flax_model = FlaxLlamaModel(cfg)
        torch_model = LlamaModel(cfg)
        load_flax_weights_in_pytorch_model(torch_model, flax_model.params)
        torch_model.eval()

        ids = np.array([[5, 9, 17, 33, 2, 0, 0, 0], [7, 7, 7, 1, 1, 1, 1, 1]], np.int32)
        mask = (ids != 0).astype(np.int32)
        ours = np.asarray(flax_model(input_ids=ids, attention_mask=mask,
                                     output_hidden_states=True).hidden_states[-2])
        with torch.no_grad():
            ref = torch_model(input_ids=torch.from_numpy(ids).long(),
                              attention_mask=torch.from_numpy(mask).long(),
                              output_hidden_states=True).hidden_states[-2].numpy()
        m = np.broadcast_to(mask[..., None].astype(bool), ref.shape)
        assert float(np.abs(ours - ref)[m].max()) < 5e-4

    def test_t5_flax_matches_torch(self):
        """FLAN-T5 music conditioning path (`modules.py:25-62`: T5 encoder
        last_hidden_state over max_length padding)."""
        import torch
        from transformers import FlaxT5EncoderModel, T5Config, T5EncoderModel
        from transformers.modeling_flax_pytorch_utils import (
            load_flax_weights_in_pytorch_model,
        )

        cfg = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                       num_layers=2, num_heads=4)
        flax_model = FlaxT5EncoderModel(cfg)
        torch_model = T5EncoderModel(cfg)
        load_flax_weights_in_pytorch_model(torch_model, flax_model.params)
        torch_model.eval()

        ids = np.array([[4, 8, 15, 16, 23, 42, 0, 0]], np.int32)
        mask = (ids != 0).astype(np.int32)
        ours = np.asarray(flax_model(input_ids=ids, attention_mask=mask).last_hidden_state)
        with torch.no_grad():
            ref = torch_model(input_ids=torch.from_numpy(ids).long(),
                              attention_mask=torch.from_numpy(mask).long()
                              ).last_hidden_state.numpy()
        m = np.broadcast_to(mask[..., None].astype(bool), ref.shape)
        assert float(np.abs(ours - ref)[m].max()) < 5e-4


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
