"""CLIP text towers (L and G) + the SD3 triple prompt encoder.

The reference encodes SD3 prompts through diffusers'
`StableDiffusion3Pipeline.encode_prompt` (`lumina_next_t2i_mini/
sample_sd3.py:95-100`): CLIP-L and CLIP-G penultimate hidden states are
concatenated on the feature dim, zero-padded to the T5 width, and stacked
with the T5 sequence; the pooled pair is the concatenated projected EOS
embeddings. This module is the TPU-native counterpart: a Flax CLIP text
transformer (matching HF `CLIPTextModelWithProjection` numerics — causal
mask, pre-LN blocks, quick_gelu/gelu activations, EOS pooling, bias-free
text projection), an HF state-dict importer, and `SD3PromptEncoder`
implementing the exact diffusers combination recipe (including the
zeros-for-T5 fallback diffusers uses when `text_encoder_3=None`).

Parity: `tests/test_clip_text_parity.py` pins the full tower against an
inline torch transcription of HF's CLIPTextTransformer at a tiny config.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# HF config subsets for the two SD3 towers (openai/clip-vit-large-patch14 and
# laion/CLIP-ViT-bigG-14; both ship eos_token_id=2 in their configs, which in
# HF selects argmax pooling — the real EOT token 49407 is the largest id)
CLIP_L_CONFIG = dict(hidden=768, n_layers=12, n_heads=12, intermediate=3072,
                     projection_dim=768, hidden_act="quick_gelu")
CLIP_G_CONFIG = dict(hidden=1280, n_layers=32, n_heads=20, intermediate=5120,
                     projection_dim=1280, hidden_act="gelu")


def _act(name: str):
    if name == "quick_gelu":  # x * sigmoid(1.702 x), HF ACT2FN["quick_gelu"]
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        # HF "gelu" is the erf form; the tanh forms differ by <3e-4 which is
        # inside every consumer's tolerance, but keep erf for exactness
        return lambda x: jax.nn.gelu(x, approximate=(name != "gelu"))
    raise ValueError(f"unsupported CLIP hidden_act: {name}")


class CLIPTextTower(nn.Module):
    """HF `CLIPTextModelWithProjection`-equivalent text transformer.

    `__call__(input_ids) -> dict` with:
      - `penultimate`: hidden_states[-2] (input of the last block) — the
        feature SD3 conditions on (diffusers `clip_skip=None` path);
      - `last_hidden`: final_layer_norm(last block output);
      - `pooled`: `last_hidden` at the EOS position;
      - `projected`: `text_projection(pooled)` — the SD3 pooled feature.
    """

    vocab_size: int = 49408
    hidden: int = 768
    n_layers: int = 12
    n_heads: int = 12
    intermediate: int = 3072
    max_positions: int = 77
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    eos_token_id: int = 2
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b, L = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden, name="token_embedding",
                       dtype=self.dtype)(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (self.max_positions, self.hidden))
        x = tok + pos[None, :L].astype(self.dtype)

        # causal mask only: diffusers feeds the CLIP towers no padding mask
        # (sd3 pipeline `_get_clip_prompt_embeds`), and HF builds the causal
        # triangle internally
        causal = jnp.tril(jnp.ones((L, L), bool))
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
        act = _act(self.hidden_act)
        head_dim = self.hidden // self.n_heads
        scale = head_dim ** -0.5

        penultimate = x
        for i in range(self.n_layers):
            penultimate = x  # hidden_states[-2] == input of the LAST block
            h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             name=f"layers_{i}_ln1")(x)
            q = nn.Dense(self.hidden, dtype=self.dtype, name=f"layers_{i}_q")(h)
            k = nn.Dense(self.hidden, dtype=self.dtype, name=f"layers_{i}_k")(h)
            v = nn.Dense(self.hidden, dtype=self.dtype, name=f"layers_{i}_v")(h)
            q = q.reshape(b, L, self.n_heads, head_dim)
            k = k.reshape(b, L, self.n_heads, head_dim)
            v = v.reshape(b, L, self.n_heads, head_dim)
            # 77-token sequences: one fused XLA softmax-matmul pair beats any
            # streaming kernel here (whole KV fits VMEM; see ops/flash small-KV
            # rationale) — plain einsum attention in fp32 logits
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
            logits = jnp.where(causal[None, None], logits, neg)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, L, self.hidden)
            x = x + nn.Dense(self.hidden, dtype=self.dtype,
                             name=f"layers_{i}_out")(attn)
            h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             name=f"layers_{i}_ln2")(x)
            h = nn.Dense(self.intermediate, dtype=self.dtype,
                         name=f"layers_{i}_fc1")(h)
            h = act(h)
            x = x + nn.Dense(self.hidden, dtype=self.dtype,
                             name=f"layers_{i}_fc2")(h)

        last_hidden = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                                   name="final_ln")(x)
        # EOS pooling, HF modeling_clip semantics: configs with the legacy
        # eos_token_id=2 use argmax over ids (EOT 49407 is the max id); newer
        # configs take the FIRST position equal to eos_token_id
        if self.eos_token_id == 2:
            pool_idx = jnp.argmax(input_ids, axis=-1)
        else:
            pool_idx = jnp.argmax((input_ids == self.eos_token_id).astype(jnp.int32),
                                  axis=-1)
        pooled = last_hidden[jnp.arange(b), pool_idx]
        projected = nn.Dense(self.projection_dim, use_bias=False,
                             dtype=self.dtype, name="text_projection")(pooled)
        return {"penultimate": penultimate, "last_hidden": last_hidden,
                "pooled": pooled, "projected": projected}


def import_clip_text_weights(sd: Dict[str, np.ndarray], n_layers: int) -> Dict:
    """HF `CLIPTextModelWithProjection` state dict -> CLIPTextTower params.

    Accepts both the bare `text_model.*` naming and diffusers' subfolder
    export (same names). Linear weights transpose (torch stores (out, in));
    the projection has no bias.
    """
    def a(name):
        return np.asarray(sd[name], np.float32)

    def lin(name):
        out = {"kernel": a(f"{name}.weight").T}
        if f"{name}.bias" in sd:
            out["bias"] = a(f"{name}.bias")
        return out

    def ln(name):
        return {"scale": a(f"{name}.weight"), "bias": a(f"{name}.bias")}

    p: Dict[str, Any] = {
        "token_embedding": {
            "embedding": a("text_model.embeddings.token_embedding.weight")},
        "position_embedding": a("text_model.embeddings.position_embedding.weight"),
        "final_ln": ln("text_model.final_layer_norm"),
        "text_projection": {"kernel": a("text_projection.weight").T},
    }
    for i in range(n_layers):
        pre = f"text_model.encoder.layers.{i}"
        p[f"layers_{i}_ln1"] = ln(f"{pre}.layer_norm1")
        p[f"layers_{i}_q"] = lin(f"{pre}.self_attn.q_proj")
        p[f"layers_{i}_k"] = lin(f"{pre}.self_attn.k_proj")
        p[f"layers_{i}_v"] = lin(f"{pre}.self_attn.v_proj")
        p[f"layers_{i}_out"] = lin(f"{pre}.self_attn.out_proj")
        p[f"layers_{i}_ln2"] = ln(f"{pre}.layer_norm2")
        p[f"layers_{i}_fc1"] = lin(f"{pre}.mlp.fc1")
        p[f"layers_{i}_fc2"] = lin(f"{pre}.mlp.fc2")
    return p


def load_clip_text_tower(path: str, dtype=jnp.float32) -> Tuple[CLIPTextTower, Dict, Any]:
    """Load (tower, variables, tokenizer) from a local HF model directory
    (config.json + pytorch/safetensors weights + tokenizer files) — the
    layout `StableDiffusion3Pipeline` subfolders `text_encoder`/
    `text_encoder_2` ship."""
    import json
    import os

    from ..core import load_torch_state_dict

    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    tower = CLIPTextTower(
        vocab_size=cfg["vocab_size"], hidden=cfg["hidden_size"],
        n_layers=cfg["num_hidden_layers"], n_heads=cfg["num_attention_heads"],
        intermediate=cfg["intermediate_size"],
        max_positions=cfg["max_position_embeddings"],
        projection_dim=cfg.get("projection_dim", cfg["hidden_size"]),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        eos_token_id=cfg.get("eos_token_id", 2),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5), dtype=dtype)
    weights = None
    for cand in ("model.safetensors", "pytorch_model.bin",
                 "model.fp16.safetensors"):
        fp = os.path.join(path, cand)
        if os.path.exists(fp):
            weights = load_torch_state_dict(fp)
            break
    if weights is None:
        raise FileNotFoundError(f"no model weights found under {path}")
    params = import_clip_text_weights(weights, tower.n_layers)
    tokenizer = None
    try:
        from transformers import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(path)
    except Exception:
        pass  # tokenizer files absent: caller must pass ids directly
    return tower, {"params": params}, tokenizer


class DebugHashTokenizer:
    """Deterministic prompt -> token-ids stand-in for environments without
    tokenizer files (zero-egress CI): CLIP-shaped output — BOS, per-word
    hashed ids, then EOS(=vocab-1, the max id) padding, so the REAL towers,
    causal attention, and argmax EOS pooling all execute on prompt-sensitive
    ids. Stable across processes (`utils.stable_text_seed`)."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size, self.max_length = vocab_size, max_length

    def __call__(self, texts: Sequence[str], padding="max_length",
                 max_length: Optional[int] = None, truncation: bool = True,
                 return_tensors: str = "np"):
        from types import SimpleNamespace

        from ..utils import stable_text_seed

        L = max_length or self.max_length
        eos, bos = self.vocab_size - 1, self.vocab_size - 2
        ids = np.full((len(texts), L), eos, np.int32)
        for i, text in enumerate(texts):
            ids[i, 0] = bos
            words = text.split()[: L - 2]
            for j, w in enumerate(words):
                ids[i, 1 + j] = 1 + stable_text_seed(w) % (self.vocab_size - 3)
        return SimpleNamespace(input_ids=ids)


class SD3PromptEncoder:
    """diffusers `StableDiffusion3Pipeline.encode_prompt`, TPU-native.

    Combination recipe (diffusers pipeline_stable_diffusion_3.py):
      clip = concat([CLIP_L.hidden[-2], CLIP_G.hidden[-2]], -1)   # (B,77,2048)
      clip = zero-pad last dim to the T5 width (4096)
      seq  = concat([clip, T5.last_hidden], -2)                   # (B,77+256,4096)
      pooled = concat([CLIP_L.projected, CLIP_G.projected], -1)   # (B,2048)
    With no T5 mounted, diffusers substitutes ZEROS of shape
    (B, t5_max_len, joint_dim) — mirrored here so CLIP-only deployments
    still honor prompts.
    """

    def __init__(self, clip_l, clip_l_vars, tokenizer_l,
                 clip_g, clip_g_vars, tokenizer_g,
                 t5_encoder=None, t5_max_len: int = 256,
                 joint_dim: int = 4096, clip_max_len: int = 77):
        self.clip_l, self.clip_l_vars = clip_l, clip_l_vars
        self.clip_g, self.clip_g_vars = clip_g, clip_g_vars
        self.tok_l, self.tok_g = tokenizer_l, tokenizer_g
        self.t5 = t5_encoder
        self.t5_max_len, self.joint_dim = t5_max_len, joint_dim
        self.clip_max_len = clip_max_len
        self._apply_l = jax.jit(clip_l.apply)
        self._apply_g = jax.jit(clip_g.apply)

    def _tokenize(self, tok, prompts: Sequence[str]) -> np.ndarray:
        out = tok(list(prompts), padding="max_length",
                  max_length=self.clip_max_len, truncation=True,
                  return_tensors="np")
        return out.input_ids

    def encode(self, prompts: Sequence[str],
               ids_l: Optional[np.ndarray] = None,
               ids_g: Optional[np.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (prompt_embeds (B, 77+t5_len, joint_dim), pooled (B, 2*proj))."""
        if ids_l is None:
            ids_l = self._tokenize(self.tok_l, prompts)
        if ids_g is None:
            ids_g = self._tokenize(self.tok_g, prompts)
        out_l = self._apply_l(self.clip_l_vars, jnp.asarray(ids_l))
        out_g = self._apply_g(self.clip_g_vars, jnp.asarray(ids_g))
        clip = jnp.concatenate([out_l["penultimate"], out_g["penultimate"]],
                               axis=-1)
        pooled = jnp.concatenate([out_l["projected"], out_g["projected"]],
                                 axis=-1)
        if self.t5 is not None:
            t5_embeds, _ = self.t5.encode(list(prompts))
            t5_embeds = jnp.asarray(t5_embeds)
        else:
            t5_embeds = jnp.zeros((clip.shape[0], self.t5_max_len,
                                   self.joint_dim), clip.dtype)
        pad = t5_embeds.shape[-1] - clip.shape[-1]
        if pad < 0:
            raise ValueError("T5 width below CLIP concat width")
        clip = jnp.pad(clip, ((0, 0), (0, 0), (0, pad)))
        return jnp.concatenate([clip, t5_embeds], axis=-2), pooled

    def encode_cfg_pair(self, prompt: str, negative: str = ""
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[uncond; cond] stacking used by the SD3 sampler
        (`sample_sd3.py:99-102`)."""
        ctx, pooled = self.encode([negative, prompt])
        return ctx, pooled


def build_sd3_prompt_encoder(clip_l: Optional[str] = None,
                             clip_g: Optional[str] = None,
                             t5: Optional[str] = None,
                             debug: bool = False,
                             dtype=jnp.float32) -> SD3PromptEncoder:
    """The SD3 triple encoder for pipelines (`sample_sd3`, `dreambooth`).

    With both CLIP dirs and not `debug`: real towers with loaded weights
    (+ optional T5). Otherwise the SAME `SD3PromptEncoder` code path over
    tiny deterministically-seeded random towers and the hash tokenizer, so
    debug/CI runs exercise the real encode machinery (tokenize, causal
    towers, EOS pooling, L⊕G concat, zero-pad, zeros-T5, pooled pair) with
    prompt-sensitive reproducible features."""
    if clip_l and clip_g and not debug:
        tower_l, vars_l, tok_l = load_clip_text_tower(clip_l, dtype=dtype)
        tower_g, vars_g, tok_g = load_clip_text_tower(clip_g, dtype=dtype)
        t5_enc = None
        if t5:
            from .text_encoders import T5TextEncoder

            t5_enc = T5TextEncoder.from_pretrained(t5, max_length=256)
        return SD3PromptEncoder(tower_l, vars_l, tok_l, tower_g, vars_g,
                                tok_g, t5_encoder=t5_enc)

    def tiny(seed, act):
        # projection 1024 each so the pooled pair is the real 2048
        tower = CLIPTextTower(hidden=64, n_layers=2, n_heads=4,
                              intermediate=128, projection_dim=1024,
                              hidden_act=act)
        variables = jax.jit(tower.init)(jax.random.PRNGKey(seed),
                                        jnp.zeros((1, 77), jnp.int32))
        return tower, variables

    tower_l, vars_l = tiny(0, "quick_gelu")
    tower_g, vars_g = tiny(1, "gelu")
    tok = DebugHashTokenizer()
    return SD3PromptEncoder(tower_l, vars_l, tok, tower_g, vars_g, tok,
                            t5_encoder=None)
