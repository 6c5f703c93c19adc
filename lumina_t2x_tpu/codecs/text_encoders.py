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


class CLAPTextEncoder:
    """CLAP text tower + projection (`lumina_audio/models/encoders/CLAP/clap.py`):
    a (Ro)BERTa-family text model followed by a learned projection, used
    jointly with T5 for structured-caption audio conditioning."""

    def __init__(self, model, tokenizer, projection=None, max_length: int = 77):
        self.model = model
        self.tokenizer = tokenizer
        self.projection = projection
        self.max_length = max_length

    def encode(self, prompts: Sequence[str]):
        batch = self.tokenizer(
            list(prompts), truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        out = self.model(input_ids=batch.input_ids, attention_mask=batch.attention_mask)
        feats = jnp.asarray(out.last_hidden_state)
        if self.projection is not None:
            feats = feats @ self.projection
        return feats, jnp.asarray(batch.attention_mask)
