"""Numeric cross-parity for the CLIP text towers (`codecs/clip_text.py`)
against an inline torch transcription of HF `CLIPTextModelWithProjection` —
the encoders diffusers' `StableDiffusion3Pipeline.encode_prompt` runs for the
reference's SD3/mini pipeline (`lumina_next_t2i_mini/sample_sd3.py:95-100`).

transformers' torch CLIP cannot be instantiated weight-compatibly at a tiny
config without downloads, so (mirroring `test_mmdit_parity.py`) the torch
side is a faithful transcription of `CLIPTextTransformer`: token+position
embeddings, pre-LN blocks with causal attention, quick_gelu/gelu MLPs,
final LayerNorm, EOS pooling (both the legacy argmax and the explicit
eos-token variants), and the bias-free text projection. Weights export under
the exact HF state-dict names and import via `import_clip_text_weights`.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from lumina_t2x_tpu.codecs.clip_text import (  # noqa: E402
    CLIPTextTower,
    SD3PromptEncoder,
    import_clip_text_weights,
)

VOCAB, DIM, LAYERS, HEADS, INTER, MAXPOS, PROJ = 50, 32, 3, 4, 64, 16, 24


class TorchCLIPLayer(tnn.Module):
    def __init__(self, act):
        super().__init__()
        self.layer_norm1 = tnn.LayerNorm(DIM)
        self.q_proj = tnn.Linear(DIM, DIM)
        self.k_proj = tnn.Linear(DIM, DIM)
        self.v_proj = tnn.Linear(DIM, DIM)
        self.out_proj = tnn.Linear(DIM, DIM)
        self.layer_norm2 = tnn.LayerNorm(DIM)
        self.fc1 = tnn.Linear(DIM, INTER)
        self.fc2 = tnn.Linear(INTER, DIM)
        self.act = act

    def forward(self, x, causal):
        b, L, _ = x.shape
        h = self.layer_norm1(x)
        hd = DIM // HEADS
        # HF CLIPAttention: q scaled BEFORE the matmul
        q = self.q_proj(h).view(b, L, HEADS, hd).transpose(1, 2) * hd ** -0.5
        k = self.k_proj(h).view(b, L, HEADS, hd).transpose(1, 2)
        v = self.v_proj(h).view(b, L, HEADS, hd).transpose(1, 2)
        logits = q @ k.transpose(-1, -2) + causal
        probs = logits.softmax(dim=-1)
        attn = (probs @ v).transpose(1, 2).reshape(b, L, DIM)
        x = x + self.out_proj(attn)
        h = self.layer_norm2(x)
        return x + self.fc2(self.act(self.fc1(h)))


class TorchCLIPText(tnn.Module):
    def __init__(self, hidden_act="quick_gelu"):
        super().__init__()
        act = ((lambda t: t * torch.sigmoid(1.702 * t))
               if hidden_act == "quick_gelu" else F.gelu)
        self.token_embedding = tnn.Embedding(VOCAB, DIM)
        self.position_embedding = tnn.Embedding(MAXPOS, DIM)
        self.layers = tnn.ModuleList([TorchCLIPLayer(act) for _ in range(LAYERS)])
        self.final_layer_norm = tnn.LayerNorm(DIM)
        self.text_projection = tnn.Linear(DIM, PROJ, bias=False)

    def forward(self, ids, eos_token_id=2):
        L = ids.shape[1]
        x = self.token_embedding(ids) + self.position_embedding.weight[None, :L]
        causal = torch.full((L, L), torch.finfo(torch.float32).min).triu(1)
        hidden_states = [x]
        for layer in self.layers:
            x = layer(x, causal)
            hidden_states.append(x)
        last = self.final_layer_norm(x)
        if eos_token_id == 2:
            idx = ids.argmax(dim=-1)
        else:
            idx = (ids == eos_token_id).int().argmax(dim=-1)
        pooled = last[torch.arange(ids.shape[0]), idx]
        return {"penultimate": hidden_states[-2], "last_hidden": last,
                "pooled": pooled, "projected": self.text_projection(pooled)}

    def hf_state_dict(self):
        sd = {
            "text_model.embeddings.token_embedding.weight":
                self.token_embedding.weight,
            "text_model.embeddings.position_embedding.weight":
                self.position_embedding.weight,
            "text_model.final_layer_norm.weight": self.final_layer_norm.weight,
            "text_model.final_layer_norm.bias": self.final_layer_norm.bias,
            "text_projection.weight": self.text_projection.weight,
        }
        for i, layer in enumerate(self.layers):
            pre = f"text_model.encoder.layers.{i}"
            for src, dst in (("layer_norm1", "layer_norm1"),
                             ("layer_norm2", "layer_norm2"),
                             ("q_proj", "self_attn.q_proj"),
                             ("k_proj", "self_attn.k_proj"),
                             ("v_proj", "self_attn.v_proj"),
                             ("out_proj", "self_attn.out_proj"),
                             ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
                mod = getattr(layer, src)
                sd[f"{pre}.{dst}.weight"] = mod.weight
                if mod.bias is not None:
                    sd[f"{pre}.{dst}.bias"] = mod.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def _make_ids(b=2, L=12, seed=3, eos=VOCAB - 1):
    """token ids with an in-sequence EOS (= the max id, like CLIP's EOT) and
    EOS padding after it, matching CLIP tokenizer output shape."""
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, VOCAB - 2, (b, L))
    for r, text_len in enumerate(rng.randint(3, L - 1, b)):
        ids[r, text_len:] = eos
    return ids.astype(np.int32)


@pytest.mark.parametrize("hidden_act", ["quick_gelu", "gelu"])
def test_tower_matches_torch(hidden_act):
    tm = TorchCLIPText(hidden_act)
    _randomize(tm)
    ids = _make_ids()
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids).long())

    tower = CLIPTextTower(vocab_size=VOCAB, hidden=DIM, n_layers=LAYERS,
                          n_heads=HEADS, intermediate=INTER,
                          max_positions=MAXPOS, projection_dim=PROJ,
                          hidden_act=hidden_act)
    params = import_clip_text_weights(tm.hf_state_dict(), LAYERS)
    got = tower.apply({"params": params}, jnp.asarray(ids))
    for key in ("penultimate", "last_hidden", "pooled", "projected"):
        np.testing.assert_allclose(
            np.asarray(got[key]), ref[key].numpy(), atol=2e-4,
            err_msg=f"{key} mismatch ({hidden_act})")


def test_explicit_eos_pooling_matches_torch():
    """eos_token_id != 2 selects the FIRST eos position, not argmax."""
    tm = TorchCLIPText()
    _randomize(tm, seed=1)
    eos = 7  # small id: argmax would pick a different position
    rng = np.random.RandomState(0)
    ids = rng.randint(10, VOCAB - 2, (2, 10))
    ids[0, 4] = eos
    ids[1, 8] = eos
    ids = ids.astype(np.int32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids).long(), eos_token_id=eos)
    tower = CLIPTextTower(vocab_size=VOCAB, hidden=DIM, n_layers=LAYERS,
                          n_heads=HEADS, intermediate=INTER,
                          max_positions=MAXPOS, projection_dim=PROJ,
                          eos_token_id=eos)
    params = import_clip_text_weights(tm.hf_state_dict(), LAYERS)
    got = tower.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got["projected"]),
                               ref["projected"].numpy(), atol=2e-4)


def test_sd3_prompt_encoder_combination():
    """The diffusers combination recipe: L⊕G on features, zero-pad to the
    joint width, zeros-for-T5 fallback, pooled pair, CFG stacking order."""
    towers, variables = [], []
    for seed in (0, 1):
        tm = TorchCLIPText()
        _randomize(tm, seed)
        towers.append(CLIPTextTower(
            vocab_size=VOCAB, hidden=DIM, n_layers=LAYERS, n_heads=HEADS,
            intermediate=INTER, max_positions=MAXPOS, projection_dim=PROJ))
        variables.append({"params": import_clip_text_weights(
            tm.hf_state_dict(), LAYERS)})

    enc = SD3PromptEncoder(towers[0], variables[0], None,
                           towers[1], variables[1], None,
                           t5_encoder=None, t5_max_len=6, joint_dim=96,
                           clip_max_len=12)
    ids = _make_ids(b=2)
    ctx, pooled = enc.encode(["a", "b"], ids_l=ids, ids_g=ids)
    assert ctx.shape == (2, 12 + 6, 96)
    assert pooled.shape == (2, 2 * PROJ)
    # zero pad beyond 2*DIM on the CLIP rows; zero T5 rows
    np.testing.assert_array_equal(np.asarray(ctx[:, :12, 2 * DIM:]), 0.0)
    np.testing.assert_array_equal(np.asarray(ctx[:, 12:, :]), 0.0)
    # per-tower features land in their slots
    out_l = towers[0].apply(variables[0], jnp.asarray(ids))
    out_g = towers[1].apply(variables[1], jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ctx[:, :12, :DIM]),
                               np.asarray(out_l["penultimate"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ctx[:, :12, DIM:2 * DIM]),
                               np.asarray(out_g["penultimate"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pooled[:, :PROJ]),
                               np.asarray(out_l["projected"]), atol=1e-6)
