"""Numeric cross-parity for the SD3/MMDiT family (`models/mmdit.py` +
`codecs/mmdit_import.py`) against an inline torch transcription of diffusers'
`SD3Transformer2DModel` — the module the reference actually runs
(`lumina_next_t2i_mini/sample_sd3.py:33-116`, `train_dreambooth_sd3.py:25,466`).

diffusers is not installed in this image, so (mirroring `test_inception.py`)
the torch side below is a faithful transcription of the published
architecture: `PatchEmbed` (conv + scaled/center-cropped sincos buffer),
`CombinedTimestepTextProjEmbeddings`, `JointTransformerBlock` with
`AdaLayerNormZero`/`AdaLayerNormContinuous`, the joint attention processor
(with SD3.5 qk RMSNorm, eps=1e-6), gelu-tanh FeedForward, and the final
AdaLayerNormContinuous + proj_out + unpatchify. Weights are randomized,
exported under the exact diffusers state-dict names, imported via
`import_sd3_mmdit_weights`, and full-model outputs must agree — covering the
qkv packing, the (scale,shift)<->(shift,scale) swap, the dual-stream wiring,
the positional-table convention, and the patchify layouts.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

# tiny-but-structured config: 3 layers so blocks {0,1} are dual-stream and
# block 2 is context_pre_only; qk_norm on; non-square-trivial crop
DIM, HEADS, LAYERS = 64, 4, 3
CTX_DIM, POOLED_DIM = 24, 16
PATCH, IN_CH = 2, 4
POS_MAX, POS_BASE = 12, 4


# ---------------------------------------------------------------------------
# torch side: transcription of diffusers (names match the state dict exactly)
# ---------------------------------------------------------------------------


def get_1d_sincos(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos(embed_dim, grid_size, base_size):
    """diffusers `get_2d_sincos_pos_embed`: note `np.meshgrid(grid_w, grid_h)`
    puts the W coordinates in grid[0], which feeds the FIRST half."""
    grid_h = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size)
    grid_w = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size)
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # (grid^2, D)


class PatchEmbed(tnn.Module):
    def __init__(self, patch_size, in_channels, embed_dim, pos_embed_max_size, base_size):
        super().__init__()
        self.patch_size = patch_size
        self.pos_embed_max_size = pos_embed_max_size
        self.proj = tnn.Conv2d(in_channels, embed_dim, kernel_size=patch_size, stride=patch_size)
        pe = get_2d_sincos(embed_dim, pos_embed_max_size, base_size)
        self.register_buffer("pos_embed", torch.from_numpy(pe).float().unsqueeze(0), persistent=True)

    def cropped_pos_embed(self, height, width):
        height = height // self.patch_size
        width = width // self.patch_size
        top = (self.pos_embed_max_size - height) // 2
        left = (self.pos_embed_max_size - width) // 2
        spatial = self.pos_embed.reshape(1, self.pos_embed_max_size, self.pos_embed_max_size, -1)
        spatial = spatial[:, top : top + height, left : left + width, :]
        return spatial.reshape(1, -1, spatial.shape[-1])

    def forward(self, latent):
        h, w = latent.shape[-2:]
        out = self.proj(latent).flatten(2).transpose(1, 2)
        return out + self.cropped_pos_embed(h, w)


def get_timestep_embedding(timesteps, embedding_dim):
    """flip_sin_to_cos=True, downscale_freq_shift=0, scale=1 (SD3 Timesteps)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(10000) * torch.arange(half_dim, dtype=torch.float32)
    exponent = exponent / half_dim
    emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TimestepEmbedding(tnn.Module):
    def __init__(self, in_channels, time_embed_dim):
        super().__init__()
        self.linear_1 = tnn.Linear(in_channels, time_embed_dim)
        self.linear_2 = tnn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        return self.linear_2(F.silu(self.linear_1(sample)))


class CombinedTimestepTextProjEmbeddings(tnn.Module):
    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.timestep_embedder = TimestepEmbedding(256, embedding_dim)
        self.text_embedder = TimestepEmbedding(pooled_projection_dim, embedding_dim)

    def forward(self, timestep, pooled_projection):
        t = self.timestep_embedder(get_timestep_embedding(timestep, 256))
        return t + self.text_embedder(pooled_projection)


class RMSNorm(tnn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.weight = tnn.Parameter(torch.ones(dim))

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + self.eps) * self.weight


class AdaLayerNormZero(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = tnn.Linear(dim, 6 * dim)
        self.norm = tnn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        emb = self.linear(F.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = emb.chunk(6, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormContinuous(tnn.Module):
    def __init__(self, dim, cond_dim):
        super().__init__()
        self.linear = tnn.Linear(cond_dim, 2 * dim)
        self.norm = tnn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        emb = self.linear(F.silu(emb))
        scale, shift = torch.chunk(emb, 2, dim=1)  # diffusers: (scale, shift)
        return self.norm(x) * (1 + scale)[:, None] + shift[:, None]


class GELUProj(tnn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = tnn.Linear(dim_in, dim_out)

    def forward(self, x):
        return F.gelu(self.proj(x), approximate="tanh")


class FeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.ModuleList([GELUProj(dim, dim * mult), tnn.Identity(), tnn.Linear(dim * mult, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class JointAttention(tnn.Module):
    def __init__(self, dim, heads, context_pre_only):
        super().__init__()
        self.heads = heads
        self.context_pre_only = context_pre_only
        hd = dim // heads
        self.to_q = tnn.Linear(dim, dim)
        self.to_k = tnn.Linear(dim, dim)
        self.to_v = tnn.Linear(dim, dim)
        self.add_q_proj = tnn.Linear(dim, dim)
        self.add_k_proj = tnn.Linear(dim, dim)
        self.add_v_proj = tnn.Linear(dim, dim)
        self.norm_q = RMSNorm(hd)
        self.norm_k = RMSNorm(hd)
        self.norm_added_q = RMSNorm(hd)
        self.norm_added_k = RMSNorm(hd)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim), tnn.Identity()])
        if not context_pre_only:
            self.to_add_out = tnn.Linear(dim, dim)

    def forward(self, hidden_states, encoder_hidden_states):
        b, s, _ = hidden_states.shape
        hd = self.to_q.out_features // self.heads

        def heads_view(x):
            return x.view(b, -1, self.heads, hd).transpose(1, 2)

        q = self.norm_q(heads_view(self.to_q(hidden_states)))
        k = self.norm_k(heads_view(self.to_k(hidden_states)))
        v = heads_view(self.to_v(hidden_states))
        qc = self.norm_added_q(heads_view(self.add_q_proj(encoder_hidden_states)))
        kc = self.norm_added_k(heads_view(self.add_k_proj(encoder_hidden_states)))
        vc = heads_view(self.add_v_proj(encoder_hidden_states))
        # diffusers order: [sample; context]
        q = torch.cat([q, qc], dim=2)
        k = torch.cat([k, kc], dim=2)
        v = torch.cat([v, vc], dim=2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, -1, self.heads * hd)
        hs, ctx = out[:, :s], out[:, s:]
        hs = self.to_out[0](hs)
        if not self.context_pre_only:
            ctx = self.to_add_out(ctx)
        return hs, ctx


class JointTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, context_pre_only):
        super().__init__()
        self.context_pre_only = context_pre_only
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = (
            AdaLayerNormContinuous(dim, dim) if context_pre_only else AdaLayerNormZero(dim)
        )
        self.attn = JointAttention(dim, heads, context_pre_only)
        self.norm2 = tnn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)
        if not context_pre_only:
            self.norm2_context = tnn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
            self.ff_context = FeedForward(dim)

    def forward(self, hidden_states, encoder_hidden_states, temb):
        norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(hidden_states, temb)
        if self.context_pre_only:
            norm_c = self.norm1_context(encoder_hidden_states, temb)
        else:
            norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
                encoder_hidden_states, temb
            )
        attn_out, ctx_attn_out = self.attn(norm_h, norm_c)
        hidden_states = hidden_states + gate_msa.unsqueeze(1) * attn_out
        norm_h = self.norm2(hidden_states) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        hidden_states = hidden_states + gate_mlp.unsqueeze(1) * self.ff(norm_h)
        if self.context_pre_only:
            return hidden_states, None
        encoder_hidden_states = encoder_hidden_states + c_gate_msa.unsqueeze(1) * ctx_attn_out
        norm_c = self.norm2_context(encoder_hidden_states) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp.unsqueeze(1) * self.ff_context(norm_c)
        return hidden_states, encoder_hidden_states


class SD3Transformer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.pos_embed = PatchEmbed(PATCH, IN_CH, DIM, POS_MAX, POS_BASE)
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(DIM, POOLED_DIM)
        self.context_embedder = tnn.Linear(CTX_DIM, DIM)
        self.transformer_blocks = tnn.ModuleList(
            [JointTransformerBlock(DIM, HEADS, i == LAYERS - 1) for i in range(LAYERS)]
        )
        self.norm_out = AdaLayerNormContinuous(DIM, DIM)
        self.proj_out = tnn.Linear(DIM, PATCH * PATCH * IN_CH)

    def forward(self, latent, timestep, context, pooled):
        h, w = latent.shape[-2:]
        x = self.pos_embed(latent)
        temb = self.time_text_embed(timestep, pooled)
        c = self.context_embedder(context)
        for blk in self.transformer_blocks:
            x, c = blk(x, c, temb)
        x = self.norm_out(x, temb)
        x = self.proj_out(x)
        gh, gw = h // PATCH, w // PATCH
        x = x.reshape(latent.shape[0], gh, gw, PATCH, PATCH, IN_CH)
        x = torch.einsum("nhwpqc->nchpwq", x)
        return x.reshape(latent.shape[0], IN_CH, h, w)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _randomized_torch_model():
    torch.manual_seed(0)
    model = SD3Transformer().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * (0.05 if p.ndim > 1 else 0.02))
    return model


def _jax_model():
    from lumina_t2x_tpu.models.mmdit import MMDiT

    return MMDiT(patch_size=PATCH, in_channels=IN_CH, dim=DIM, n_layers=LAYERS,
                 n_heads=HEADS, context_dim=CTX_DIM, pooled_dim=POOLED_DIM,
                 qk_norm=True, pos_embed_max_size=POS_MAX, pos_embed_base_size=POS_BASE)


def test_full_model_parity():
    """Randomized weights through both stacks: <=2e-4 agreement end-to-end."""
    from lumina_t2x_tpu.codecs.mmdit_import import import_sd3_mmdit_weights

    tm = _randomized_torch_model()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_sd3_mmdit_weights(sd, n_layers=LAYERS,
                                      pos_embed_max_size=POS_MAX,
                                      pos_embed_base_size=POS_BASE)

    rng = np.random.RandomState(1)
    lat = rng.standard_normal((2, IN_CH, 8, 8)).astype(np.float32)
    t = np.array([17.0, 999.0], np.float32)
    ctx = rng.standard_normal((2, 7, CTX_DIM)).astype(np.float32)
    pooled = rng.standard_normal((2, POOLED_DIM)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(lat), torch.from_numpy(t),
                 torch.from_numpy(ctx), torch.from_numpy(pooled)).numpy()
    got = np.asarray(_jax_model().apply({"params": params}, jnp.asarray(lat),
                                        jnp.asarray(t), jnp.asarray(ctx),
                                        jnp.asarray(pooled)))
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_non_square_crop_parity():
    """Center-crop origin for gh != gw (8x12 latent -> 4x6 window of the
    12x12 table) — pins the crop arithmetic and the w-first half order."""
    from lumina_t2x_tpu.codecs.mmdit_import import import_sd3_mmdit_weights

    tm = _randomized_torch_model()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_sd3_mmdit_weights(sd, n_layers=LAYERS,
                                      pos_embed_max_size=POS_MAX,
                                      pos_embed_base_size=POS_BASE)
    rng = np.random.RandomState(2)
    lat = rng.standard_normal((1, IN_CH, 8, 12)).astype(np.float32)
    t = np.array([400.0], np.float32)
    ctx = rng.standard_normal((1, 5, CTX_DIM)).astype(np.float32)
    pooled = rng.standard_normal((1, POOLED_DIM)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(lat), torch.from_numpy(t),
                 torch.from_numpy(ctx), torch.from_numpy(pooled)).numpy()
    got = np.asarray(_jax_model().apply({"params": params}, jnp.asarray(lat),
                                        jnp.asarray(t), jnp.asarray(ctx),
                                        jnp.asarray(pooled)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_pos_embed_buffer_cross_check():
    """The importer verifies a present `pos_embed.pos_embed` buffer against
    the recomputed table, and rejects a convention drift loudly."""
    from lumina_t2x_tpu.codecs.mmdit_import import import_sd3_mmdit_weights

    tm = _randomized_torch_model()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    assert "pos_embed.pos_embed" in sd  # persistent buffer exported

    # h-first (wrong-convention) table must be rejected
    bad = dict(sd)
    buf = sd["pos_embed.pos_embed"].reshape(POS_MAX, POS_MAX, DIM)
    bad["pos_embed.pos_embed"] = np.ascontiguousarray(
        buf.transpose(1, 0, 2)).reshape(1, POS_MAX * POS_MAX, DIM)
    with pytest.raises(ValueError, match="pos_embed"):
        import_sd3_mmdit_weights(bad, n_layers=LAYERS, pos_embed_max_size=POS_MAX,
                                 pos_embed_base_size=POS_BASE)


def test_timestep_embedding_convention():
    """flip_sin_to_cos=True / downscale_freq_shift=0 == our cos-then-sin."""
    from lumina_t2x_tpu.models.layers import timestep_embedding

    t = np.array([0.0, 1.0, 17.0, 500.0, 999.0], np.float32)
    ref = get_timestep_embedding(torch.from_numpy(t), 256).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray(t), 256))
    # fp32 exp() of the frequency table rounds differently across backends
    np.testing.assert_allclose(got, ref, atol=5e-5)
