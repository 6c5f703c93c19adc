"""Frozen text encoders (Gemma / LLaMA / T5 / CLAP-text) for conditioning.

Behavior parity with the reference's prompt encoding
(`lumina_next_t2i/train.py:217-248,300-319`, `sample.py:23-53`):

- caption features = `hidden_states[-2]` (second-to-last layer) of the
  decoder-only LM;
- tokenization: right padding, pad-to-multiple-of-8, max_length 256,
  truncation;
- `proportion_empty_prompts` caption dropout replaces captions with "" before
  encoding (CFG training);
- frozen at train time. The reference wraps the LM in intra-node FSDP
  (`train.py:149-168`) to bound all-gather latency; here the LM params are
  sharded over the mesh by the same GSPMD rules as the denoiser and XLA
  schedules the gathers.

Models are HuggingFace *Flax* classes (weights load from local HF caches /
checkpoint dirs — this environment has no network egress, so tests run tiny
randomly-initialized configs).
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def apply_empty_prompt_dropout(prompts: Sequence[str], proportion_empty_prompts: float,
                               is_train: bool = True, rng: Optional[random.Random] = None) -> List[str]:
    """Caption selection + empty-prompt CFG dropout (`train.py:218-227`)."""
    r = rng or random
    captions = []
    for caption in prompts:
        if r.random() < proportion_empty_prompts:
            captions.append("")
        elif isinstance(caption, str):
            captions.append(caption)
        elif isinstance(caption, (list, np.ndarray)):
            captions.append(r.choice(list(caption)) if is_train else caption[0])
        else:
            # loud failure (`train.py:226-227`): silently dropping the item
            # would shrink the caption list and misalign text with images
            raise ValueError(f"Caption column should contain either strings "
                             f"or lists of strings, got {type(caption)}")
    return captions


def tokenize_prompts(tokenizer, captions: Sequence[str], max_length: int = 256):
    """Reference tokenization recipe (`train.py:229-237`)."""
    out = tokenizer(
        list(captions),
        padding=True,
        pad_to_multiple_of=8,
        max_length=max_length,
        truncation=True,
        return_tensors="np",
    )
    return out.input_ids, out.attention_mask


class DecoderTextEncoder:
    """hidden_states[-2] features from a Flax decoder LM (Gemma-2B for
    NextDiT, LLaMA-2-7B for the 5B Flag-DiT)."""

    def __init__(self, model, tokenizer, max_length: int = 256):
        self.model = model
        self.tokenizer = tokenizer
        self.max_length = max_length
        if hasattr(tokenizer, "padding_side"):
            tokenizer.padding_side = "right"

    @classmethod
    def from_pretrained(cls, name_or_path: str = "google/gemma-2b", dtype=jnp.bfloat16,
                        max_length: int = 256):
        from transformers import AutoTokenizer, FlaxAutoModel

        tokenizer = AutoTokenizer.from_pretrained(name_or_path)
        model = FlaxAutoModel.from_pretrained(name_or_path, dtype=dtype)
        return cls(model, tokenizer, max_length)

    @property
    def hidden_size(self) -> int:
        return self.model.config.hidden_size

    def encode(self, prompts: Sequence[str], proportion_empty_prompts: float = 0.0,
               is_train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (cap_feats (B, L, D), cap_mask (B, L))."""
        captions = apply_empty_prompt_dropout(prompts, proportion_empty_prompts, is_train)
        input_ids, attention_mask = tokenize_prompts(self.tokenizer, captions, self.max_length)
        outputs = self.model(
            input_ids=input_ids, attention_mask=attention_mask, output_hidden_states=True
        )
        cap_feats = outputs.hidden_states[-2]
        return jnp.asarray(cap_feats), jnp.asarray(attention_mask)


class T5TextEncoder:
    """FLAN-T5 encoder features (`lumina_music/models/encoders/modules.py:25-62`)."""

    def __init__(self, model, tokenizer, max_length: int = 77):
        self.model = model
        self.tokenizer = tokenizer
        self.max_length = max_length

    @classmethod
    def from_pretrained(cls, name_or_path: str = "google/flan-t5-large", dtype=jnp.float32,
                        max_length: int = 77):
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        tokenizer = AutoTokenizer.from_pretrained(name_or_path)
        model = FlaxT5EncoderModel.from_pretrained(name_or_path, dtype=dtype)
        return cls(model, tokenizer, max_length)

    def encode(self, prompts: Sequence[str]):
        batch = self.tokenizer(
            list(prompts), truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        out = self.model(input_ids=batch.input_ids, attention_mask=batch.attention_mask)
        return jnp.asarray(out.last_hidden_state), jnp.asarray(batch.attention_mask)


def clap_projection(x, params, eps: float = 1e-5):
    """CLAP Projection head (`CLAP/clap.py:12-25`, eval mode):
    LayerNorm(linear1(x) + linear2(gelu(linear1(x))))."""


    e1 = x @ params["linear1"]["kernel"]
    e2 = jax.nn.gelu(e1, approximate=False) @ params["linear2"]["kernel"]
    h = (e1 + e2).astype(jnp.float32)
    mu = h.mean(-1, keepdims=True)
    var = ((h - mu) ** 2).mean(-1, keepdims=True)
    normed = (h - mu) * jax.lax.rsqrt(var + eps)
    return normed * params["layer_norm"]["scale"] + params["layer_norm"]["bias"]


def extract_clap_caption_weights(clap_state_dict):
    """Split a CLAP checkpoint's `caption_encoder.*` tensors
    (`FrozenCLAPFLANEmbedder`, `modules.py:122-126`) into (base HF text-model
    state dict, flax projection params)."""
    base, proj = {}, {}
    for key, val in clap_state_dict.items():
        if not key.startswith("caption_encoder."):
            continue
        sub = key[len("caption_encoder."):]
        arr = np.asarray(val, np.float32)
        if sub.startswith("base."):
            base[sub[len("base."):]] = arr
        elif sub.startswith("projection."):
            name = sub[len("projection."):]
            if name == "linear1.weight":
                proj.setdefault("linear1", {})["kernel"] = arr.T
            elif name == "linear2.weight":
                proj.setdefault("linear2", {})["kernel"] = arr.T
            elif name == "layer_norm.weight":
                proj.setdefault("layer_norm", {})["scale"] = arr
            elif name == "layer_norm.bias":
                proj.setdefault("layer_norm", {})["bias"] = arr
    return base, proj


class CLAPTextEncoder:
    """CLAP text tower + projection (`lumina_audio/models/encoders/CLAP/clap.py:56-71`):
    an HF text model followed by the CLAP Projection head; features =
    projection(last_hidden_state) (`modules.py:109-110`), used jointly with
    T5 for structured-caption audio conditioning."""

    def __init__(self, model, tokenizer, projection_params=None, max_length: int = 77,
                 score_max_length: int = 100):
        self.model = model
        self.tokenizer = tokenizer
        self.projection_params = projection_params
        self.max_length = max_length
        # Scoring uses the reference scorer's longer budget
        # (`CLAPWrapper.preprocess_text` text_len=100, CLAPWrapper.py:149),
        # distinct from the 77-token conditioning path.
        self.score_max_length = score_max_length

    @classmethod
    def from_clap_checkpoint(cls, ckpt_path: str, flax_text_model, tokenizer,
                             max_length: int = 77):
        """Load the caption-encoder branch out of a CLAP checkpoint
        (`modules.py:122-126`): `flax_text_model` is the (architecture-matching)
        HF Flax text model to receive the base weights."""
        import torch
        from transformers.modeling_flax_pytorch_utils import (
            convert_pytorch_state_dict_to_flax,
        )

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        base_np, proj = extract_clap_caption_weights(
            {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        )
        pt_state = {k: torch.from_numpy(np.asarray(v)) for k, v in base_np.items()}
        flax_params = convert_pytorch_state_dict_to_flax(pt_state, flax_text_model)
        flax_text_model.params = flax_params
        return cls(flax_text_model, tokenizer, proj, max_length)

    def encode(self, prompts: Sequence[str]):
        batch = self.tokenizer(
            list(prompts), truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        out = self.model(input_ids=batch.input_ids, attention_mask=batch.attention_mask)
        feats = jnp.asarray(out.last_hidden_state)
        if self.projection_params is not None:
            feats = clap_projection(feats, jax.tree.map(jnp.asarray, self.projection_params))
        return feats, jnp.asarray(batch.attention_mask)

    def embed(self, prompts: Sequence[str]) -> jnp.ndarray:
        """Sentence-level CLAP text embedding for SCORING (vs `encode`, the
        per-token conditioning path): projection of the CLS token, then
        L2-normalized (`CLAP/clap.py:68-72` `out[:, 0, :]`;
        `CLAPWrapper.py:163-170` normalization). Pairs with
        `clap_audio.CLAPAudioEncoder.embed` / `clap_score`."""
        if self.projection_params is None:
            raise ValueError("CLAP scoring needs the projection head "
                             "(load via from_clap_checkpoint)")
        batch = self.tokenizer(
            list(prompts), truncation=True, max_length=self.score_max_length,
            padding="max_length", return_tensors="np",
        )
        out = self.model(input_ids=batch.input_ids, attention_mask=batch.attention_mask)
        cls = jnp.asarray(out.last_hidden_state)[:, 0, :]
        proj = clap_projection(cls, jax.tree.map(jnp.asarray, self.projection_params))
        return proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)
