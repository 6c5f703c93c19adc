"""1-D mel-spectrogram VAE for audio / music latents.

TPU-native re-design of `lumina_music/models/autoencoder1d.py:23-871` (the
"Make-An-Audio 2" KL autoencoder, duplicated in lumina_audio): treats the
80-bin mel spectrogram as channels over time (B, mel_bins, T) and compresses
to (B, z_channels, T / 2^(levels-1)):

- ResnetBlock1D: GroupNorm-32 / SiLU / Conv1d(k, pad k//2) pairs with 1x1 or
  k-sized shortcut (`autoencoder1d.py:202-251`);
- AttnBlock1D: single-head temporal attention at the bottleneck
  (`autoencoder1d.py:254-286`);
- Downsample1D: stride-2 conv with (0,1) asymmetric pad; Upsample1D:
  nearest-2x + conv (`autoencoder1d.py:289-318`);
- double_z moments + quant/post-quant 1x1 convs (`autoencoder1d.py:39-41`).

A VQ variant (`VQModel`) exists in the reference; the KL model is what the
shipped audio/music checkpoints use.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .vae import DiagonalGaussian


class ResnetBlock1D(nn.Module):
    out_ch: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        k = self.kernel_size
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = nn.Conv(self.out_ch, (k,), padding=k // 2, dtype=self.dtype, name="conv1")(nn.silu(h))
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = nn.Conv(self.out_ch, (k,), padding=k // 2, dtype=self.dtype, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1,), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock1D(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        b, t, c = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = nn.Conv(c, (1,), dtype=self.dtype, name="q")(h)
        k = nn.Conv(c, (1,), dtype=self.dtype, name="k")(h)
        v = nn.Conv(c, (1,), dtype=self.dtype, name="v")(h)
        attn = jax.nn.softmax(
            jnp.einsum("btc,bsc->bts", q, k, preferred_element_type=jnp.float32)
            / jnp.sqrt(c).astype(jnp.float32),
            axis=-1,
        )
        out = jnp.einsum("bts,bsc->btc", attn.astype(v.dtype), v)
        return x + nn.Conv(c, (1,), dtype=self.dtype, name="proj_out")(out)


class Downsample1D(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3,), strides=2, padding="VALID", dtype=self.dtype,
                       name="conv")(x)


class Upsample1D(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        x = jnp.repeat(x, 2, axis=1)
        return nn.Conv(c, (3,), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder1D(nn.Module):
    """`autoencoder1d.py:321-438`. `down_layers` lists the levels that
    downsample (the maa2 music VAE only downsamples level 0 — total rate 2);
    None keeps the legacy default of every level but the last. `attn_layers`
    lists levels that get one AttnBlock1D after each res block (the shipped
    configs set [3], out of range — i.e. no per-level attention; the
    bottleneck mid attention is unconditional, as in the reference)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 20
    double_z: bool = True
    use_mid_attn: bool = True
    attn_layers: Sequence[int] = ()
    down_layers: Sequence[int] | None = None
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, mel)
        ks = self.kernel_size
        downs = (tuple(range(len(self.ch_mult) - 1)) if self.down_layers is None
                 else tuple(self.down_layers))
        h = nn.Conv(self.ch, (ks,), padding=ks // 2, dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock1D(self.ch * mult, kernel_size=ks, dtype=self.dtype,
                                  name=f"down_{i}_block_{j}")(h)
                if i in self.attn_layers:
                    h = AttnBlock1D(dtype=self.dtype, name=f"down_{i}_attn_{j}")(h)
            if i in downs:
                h = Downsample1D(dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock1D(h.shape[-1], kernel_size=ks, dtype=self.dtype, name="mid_block_1")(h)
        if self.use_mid_attn:
            h = AttnBlock1D(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock1D(h.shape[-1], kernel_size=ks, dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_c, (ks,), padding=ks // 2, dtype=self.dtype, name="conv_out")(nn.silu(h))


class Decoder1D(nn.Module):
    """`autoencoder1d.py:439-548`. Upsamples at levels {d+1 for d in
    down_layers}. Reference quirk kept exactly: the decoder's mid and
    per-level res blocks do NOT receive the configured kernel_size — they
    use the ResnetBlock1D default of 3 (`autoencoder1d.py:480-505`) — while
    conv_in/conv_out do."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    out_channels: int = 80
    use_mid_attn: bool = True
    attn_layers: Sequence[int] = ()
    down_layers: Sequence[int] | None = None
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):  # (B, t, z)
        ks = self.kernel_size
        ups = (tuple(range(1, len(self.ch_mult))) if self.down_layers is None
               else tuple(d + 1 for d in self.down_layers))
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (ks,), padding=ks // 2, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock1D(block_in, dtype=self.dtype, name="mid_block_1")(h)
        if self.use_mid_attn:
            h = AttnBlock1D(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock1D(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i, mult in reversed(list(enumerate(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock1D(self.ch * mult, dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
                if i in self.attn_layers:
                    h = AttnBlock1D(dtype=self.dtype, name=f"up_{i}_attn_{j}")(h)
            if i in ups:
                h = Upsample1D(dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        return nn.Conv(self.out_channels, (ks,), padding=ks // 2, dtype=self.dtype,
                       name="conv_out")(nn.silu(h))


class VectorQuantizer(nn.Module):
    """Codebook quantizer for the VQ variant (`autoencoder1d.py` VQModel):
    nearest-codebook lookup with straight-through gradients and the standard
    commitment loss."""

    n_embed: int = 1024
    embed_dim: int = 20
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        """z: (B, T, embed_dim) -> (z_q, indices, vq_loss)."""
        # symmetric U(-1/n, 1/n) matching torch's `uniform_(-1/n, 1/n)`
        # (flax's nn.initializers.uniform samples [0, scale) — all positive,
        # which would bias a from-scratch codebook into one orthant)
        codebook = self.param(
            "embedding",
            lambda key, shape, dtype: jax.random.uniform(
                key, shape, dtype, -1.0 / self.n_embed, 1.0 / self.n_embed),
            (self.n_embed, self.embed_dim), jnp.float32,
        )
        zf = z.astype(jnp.float32)
        d = (
            jnp.sum(zf**2, axis=-1, keepdims=True)
            - 2.0 * zf @ codebook.T
            + jnp.sum(codebook**2, axis=-1)[None, None, :]
        )
        idx = jnp.argmin(d, axis=-1)  # (B, T)
        z_q = codebook[idx]
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - zf) ** 2) * self.beta + jnp.mean(
            (z_q - jax.lax.stop_gradient(zf)) ** 2
        )
        z_q = zf + jax.lax.stop_gradient(z_q - zf)  # straight-through
        return z_q.astype(z.dtype), idx, loss


class VQModel1D(nn.Module):
    """VQ variant of the 1-D autoencoder (`autoencoder1d.py` VQModel)."""

    mel_bins: int = 80
    embed_dim: int = 20
    n_embed: int = 1024
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 20
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder1D(self.ch, self.ch_mult, self.num_res_blocks,
                                 self.z_channels, False, dtype=self.dtype)
        self.decoder = Decoder1D(self.ch, self.ch_mult, self.num_res_blocks,
                                 self.mel_bins, dtype=self.dtype)
        self.quant_conv = nn.Conv(self.embed_dim, (1,), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1,), dtype=self.dtype,
                                       name="post_quant_conv")
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim)

    def encode(self, x):
        h = self.encoder(x.transpose(0, 2, 1))
        h = self.quant_conv(h)
        z_q, idx, loss = self.quantize(h)
        return z_q.transpose(0, 2, 1), idx, loss

    def decode(self, z_q):
        h = self.post_quant_conv(z_q.transpose(0, 2, 1))
        return self.decoder(h).transpose(0, 2, 1)

    def __call__(self, x):
        z_q, idx, loss = self.encode(x)
        return self.decode(z_q), idx, loss


class AutoencoderKL1D(nn.Module):
    """(B, mel_bins, T) <-> (B, embed_dim, T / 2^(levels-1))."""

    mel_bins: int = 80
    embed_dim: int = 20
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 20
    attn_layers: Sequence[int] = ()
    down_layers: Sequence[int] | None = None
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder1D(self.ch, self.ch_mult, self.num_res_blocks,
                                 self.z_channels, True, attn_layers=self.attn_layers,
                                 down_layers=self.down_layers,
                                 kernel_size=self.kernel_size, dtype=self.dtype)
        self.decoder = Decoder1D(self.ch, self.ch_mult, self.num_res_blocks,
                                 self.mel_bins, attn_layers=self.attn_layers,
                                 down_layers=self.down_layers,
                                 kernel_size=self.kernel_size, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1,), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1,), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode_moments(self, x):
        """x: (B, mel, T) -> (B, 2*embed, t)."""
        h = self.encoder(x.transpose(0, 2, 1))
        return self.quant_conv(h).transpose(0, 2, 1)

    def decode(self, z):
        """z: (B, embed, t) -> (B, mel, T)."""
        h = self.post_quant_conv(z.transpose(0, 2, 1))
        return self.decoder(h).transpose(0, 2, 1)

    def __call__(self, x, rng):
        moments = self.encode_moments(x)
        posterior = DiagonalGaussian(moments, axis=1)
        z = posterior.sample(rng)
        return self.decode(z), posterior


def _conv1d(sd, name):
    """torch Conv1d (out, in, k) -> flax Conv kernel (k, in, out)."""
    out = {"kernel": sd[f"{name}.weight"].transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _gn1d(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _resnet1d(sd, pre):
    out = {
        "norm1": _gn1d(sd, f"{pre}.norm1"),
        "conv1": _conv1d(sd, f"{pre}.conv1"),
        "norm2": _gn1d(sd, f"{pre}.norm2"),
        "conv2": _conv1d(sd, f"{pre}.conv2"),
    }
    if f"{pre}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv1d(sd, f"{pre}.nin_shortcut")
    return out


def _attn1d(sd, pre):
    return {
        "norm": _gn1d(sd, f"{pre}.norm"),
        "q": _conv1d(sd, f"{pre}.q"),
        "k": _conv1d(sd, f"{pre}.k"),
        "v": _conv1d(sd, f"{pre}.v"),
        "proj_out": _conv1d(sd, f"{pre}.proj_out"),
    }


def import_autoencoder_kl_1d_weights(sd, ch_mult: Sequence[int] = (1, 2, 4),
                                     num_res_blocks: int = 2,
                                     attn_layers: Sequence[int] = (),
                                     down_layers: Sequence[int] | None = None):
    """Map a reference/Make-An-Audio-2 1-D `AutoencoderKL` state dict
    (`lumina_music/models/autoencoder1d.py:23-121`, CompVis naming:
    `encoder.down.{i}.block.{j}` / `mid.block_1` / `up.{i}` ...) onto our
    `AutoencoderKL1D` param tree. Accepts both a bare autoencoder state dict
    and an LDM checkpoint (`first_stage_model.` prefix is stripped)."""
    if any(k.startswith("first_stage_model.") for k in sd):
        sd = {k[len("first_stage_model."):]: v for k, v in sd.items()
              if k.startswith("first_stage_model.")}
    n_levels = len(ch_mult)
    downs = (tuple(range(n_levels - 1)) if down_layers is None else tuple(down_layers))
    ups = tuple(d + 1 for d in downs)

    enc = {"conv_in": _conv1d(sd, "encoder.conv_in")}
    for i in range(n_levels):
        for j in range(num_res_blocks):
            enc[f"down_{i}_block_{j}"] = _resnet1d(sd, f"encoder.down.{i}.block.{j}")
            if i in attn_layers:
                enc[f"down_{i}_attn_{j}"] = _attn1d(sd, f"encoder.down.{i}.attn.{j}")
        if i in downs:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv1d(sd, f"encoder.down.{i}.downsample.conv")}
    enc["mid_block_1"] = _resnet1d(sd, "encoder.mid.block_1")
    enc["mid_attn_1"] = _attn1d(sd, "encoder.mid.attn_1")
    enc["mid_block_2"] = _resnet1d(sd, "encoder.mid.block_2")
    enc["norm_out"] = _gn1d(sd, "encoder.norm_out")
    enc["conv_out"] = _conv1d(sd, "encoder.conv_out")

    dec = {"conv_in": _conv1d(sd, "decoder.conv_in")}
    dec["mid_block_1"] = _resnet1d(sd, "decoder.mid.block_1")
    dec["mid_attn_1"] = _attn1d(sd, "decoder.mid.attn_1")
    dec["mid_block_2"] = _resnet1d(sd, "decoder.mid.block_2")
    for i in range(n_levels):
        for j in range(num_res_blocks + 1):
            dec[f"up_{i}_block_{j}"] = _resnet1d(sd, f"decoder.up.{i}.block.{j}")
            if i in attn_layers:
                dec[f"up_{i}_attn_{j}"] = _attn1d(sd, f"decoder.up.{i}.attn.{j}")
        if i in ups:
            dec[f"up_{i}_upsample"] = {"conv": _conv1d(sd, f"decoder.up.{i}.upsample.conv")}
    dec["norm_out"] = _gn1d(sd, "decoder.norm_out")
    dec["conv_out"] = _conv1d(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv1d(sd, "quant_conv"),
        "post_quant_conv": _conv1d(sd, "post_quant_conv"),
    }


def import_vq_model_1d_weights(sd, ch_mult: Sequence[int] = (1, 2, 4),
                               num_res_blocks: int = 2,
                               attn_layers: Sequence[int] = (),
                               down_layers: Sequence[int] | None = None):
    """Map a 1-D `VQModel` state dict (`lumina_music/models/
    autoencoder1d.py:551-580` — CompVis encoder/decoder naming plus the
    taming `quantize.embedding.weight` codebook) onto `VQModel1D`. The
    encoder/decoder/quant-conv mapping is shared with the KL importer (the
    reference builds both variants from the same Encoder1D/Decoder1D);
    parity of those blocks is pinned by `tests/test_audio_parity.py`.
    NOTE: upstream's VQModel is not instantiable as shipped (its taming
    VectorQuantizer import is commented out, `autoencoder1d.py:10`), so this
    covers checkpoints produced by a working taming install."""
    base = import_autoencoder_kl_1d_weights(sd, ch_mult, num_res_blocks,
                                            attn_layers, down_layers)
    base["quantize"] = {"embedding": sd["quantize.embedding.weight"]}
    return base


def make_an_audio_2_vae(**overrides) -> AutoencoderKL1D:
    """The shipped Make-An-Audio-2 mel-VAE configuration the reference's
    trained audio/music checkpoints use
    (`lumina_music/configs/lumina-text2music.yaml:43-65`): 80 mel bins,
    ch=384, ch_mult (1,2,4), k=5, downsample only at level 0 (rate 2),
    attn_layers [3] = no per-level attention, z=20 double_z."""
    cfg = dict(mel_bins=80, embed_dim=20, ch=384, ch_mult=(1, 2, 4),
               num_res_blocks=2, z_channels=20, attn_layers=(), down_layers=(0,),
               kernel_size=5)
    cfg.update(overrides)
    return AutoencoderKL1D(**cfg)
