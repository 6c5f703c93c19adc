"""SD / SDXL VAE (AutoencoderKL) — flax port + diffusers weight importer.

The reference loads `diffusers.AutoencoderKL` for image<->latent transcoding
(`lumina_next_t2i/train.py:434-445`, decode `sample.py:237-240`) with the
scale/shift table {"sdxl": 0.13025, "sd3": 1.5305 (+0.0609 shift),
"ema"/"mse": 0.18215} (`train.py:537-544`). This is a from-scratch flax
implementation of the same architecture (CompVis KL-VAE: GroupNorm-32/SiLU
ResNet blocks, single-head mid attention, stride-2 asym-pad downsampling,
nearest-2x upsampling), NHWC inside for TPU conv efficiency, NCHW at the API
boundary to match the reference's conventions.

`import_autoencoder_kl_weights` maps a diffusers-format state dict
(encoder.down_blocks.*, mid_block.*, decoder.up_blocks.*, quant_conv, ...)
onto this module's tree so reference release VAEs load directly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VAE_SCALE = {"ema": 0.18215, "mse": 0.18215, "sdxl": 0.13025, "sd3": 1.5305}
VAE_SHIFT = {"ema": 0.0, "mse": 0.0, "sdxl": 0.0, "sd3": 0.0609}


class DiagonalGaussian:
    """VAE posterior (`lumina_music/models/distributions/distributions.py`)."""

    def __init__(self, moments, axis=-1):
        self.mean, logvar = jnp.split(moments, 2, axis=axis)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng):
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self):
        return 0.5 * jnp.sum(self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
                             axis=tuple(range(1, self.mean.ndim)))


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(nn.silu(h))
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention at the bottleneck."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="group_norm")(x)
        flat = hidden.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(flat)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(flat)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(flat)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
            / jnp.sqrt(c).astype(jnp.float32),
            axis=-1,
        )
        out = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(b, h, w, c)


class Downsample(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # asymmetric (0,1,0,1) pad then stride-2 valid conv (diffusers Downsample2D)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_ch, (3, 3), strides=2, padding="VALID", dtype=self.dtype,
                       name="conv")(x)


class Upsample(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            out_ch = self.ch * mult
            for j in range(self.num_res_blocks):
                h = ResnetBlock(out_ch, dtype=self.dtype, name=f"down_{i}_block_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample(out_ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_c, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(nn.silu(h))


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i, mult in reversed(list(enumerate(self.ch_mult))):
            out_ch = self.ch * mult
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(out_ch, dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(
            nn.silu(h)
        )


class AutoencoderKL(nn.Module):
    """KL-VAE; NCHW in/out like the torch reference."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    out_channels: int = 3
    # SD/SDXL VAEs wrap the latents in 1x1 quant convs; SD3's does not
    # (diffusers use_quant_conv=False / use_post_quant_conv=False)
    use_quant_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.ch, self.ch_mult, self.num_res_blocks,
                               self.z_channels, True, self.dtype)
        self.decoder = Decoder(self.ch, self.ch_mult, self.num_res_blocks,
                               self.z_channels, self.out_channels, self.dtype)
        if self.use_quant_conv:
            self.quant_conv = nn.Conv(2 * self.z_channels, (1, 1), dtype=self.dtype,
                                      name="quant_conv")
            self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype,
                                           name="post_quant_conv")

    def encode_moments(self, x):
        """x: (B, 3, H, W) in [-1, 1] -> moments (B, 2z, H/8, W/8)."""
        h = self.encoder(x.transpose(0, 2, 3, 1))
        moments = self.quant_conv(h) if self.use_quant_conv else h
        return moments.transpose(0, 3, 1, 2)

    def decode(self, z):
        """z: (B, z, h, w) -> (B, 3, H, W)."""
        h = z.transpose(0, 2, 3, 1)
        if self.use_quant_conv:
            h = self.post_quant_conv(h)
        return self.decoder(h).transpose(0, 3, 1, 2)

    def __call__(self, x, rng):
        moments = self.encode_moments(x)
        posterior = DiagonalGaussian(moments, axis=1)
        z = posterior.sample(rng)
        return self.decode(z), posterior


def encode_to_latent(vae: AutoencoderKL, variables, x, rng, vae_type: str = "ema"):
    """Sampled, scaled latent as in training (`train.py:537-544`)."""
    moments = vae.apply(variables, x, method=vae.encode_moments)
    z = DiagonalGaussian(moments, axis=1).sample(rng)
    return (z - VAE_SHIFT[vae_type]) * VAE_SCALE[vae_type]


def decode_from_latent(vae: AutoencoderKL, variables, z, vae_type: str = "ema"):
    """Inverse scaling + decode (`sample.py:237-240`)."""
    z = z / VAE_SCALE[vae_type] + VAE_SHIFT[vae_type]
    return vae.apply(variables, z, method=vae.decode)


# ---------------------------------------------------------------------------
# diffusers-format weight import
# ---------------------------------------------------------------------------


def _conv(sd, name):
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{name}.bias"]}


def _dense_from_conv_or_linear(sd, name):
    w = sd[f"{name}.weight"]
    if w.ndim == 4:  # 1x1 conv
        w = w[:, :, 0, 0]
    return {"kernel": w.T, "bias": sd[f"{name}.bias"]}


def _gn_params(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _resnet(sd, pre, has_shortcut):
    out = {
        "norm1": _gn_params(sd, f"{pre}.norm1"),
        "conv1": _conv(sd, f"{pre}.conv1"),
        "norm2": _gn_params(sd, f"{pre}.norm2"),
        "conv2": _conv(sd, f"{pre}.conv2"),
    }
    if has_shortcut:
        out["conv_shortcut"] = _conv(sd, f"{pre}.conv_shortcut")
    return out


def _attn(sd, pre):
    return {
        "group_norm": _gn_params(sd, f"{pre}.group_norm"),
        "to_q": _dense_from_conv_or_linear(sd, f"{pre}.to_q"),
        "to_k": _dense_from_conv_or_linear(sd, f"{pre}.to_k"),
        "to_v": _dense_from_conv_or_linear(sd, f"{pre}.to_v"),
        "to_out": _dense_from_conv_or_linear(sd, f"{pre}.to_out.0"),
    }


def import_autoencoder_kl_weights(sd, ch_mult: Sequence[int] = (1, 2, 4, 4),
                                  num_res_blocks: int = 2, ch: int = 128):
    """Map a diffusers AutoencoderKL state dict onto our param tree."""
    enc, dec = {}, {}
    enc["conv_in"] = _conv(sd, "encoder.conv_in")
    prev = ch
    for i, mult in enumerate(ch_mult):
        out_ch = ch * mult
        for j in range(num_res_blocks):
            pre = f"encoder.down_blocks.{i}.resnets.{j}"
            enc[f"down_{i}_block_{j}"] = _resnet(sd, pre, has_shortcut=(prev != out_ch and j == 0))
            prev = out_ch
        if i != len(ch_mult) - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    enc["mid_block_1"] = _resnet(sd, "encoder.mid_block.resnets.0", False)
    enc["mid_attn_1"] = _attn(sd, "encoder.mid_block.attentions.0")
    enc["mid_block_2"] = _resnet(sd, "encoder.mid_block.resnets.1", False)
    enc["norm_out"] = _gn_params(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec["conv_in"] = _conv(sd, "decoder.conv_in")
    dec["mid_block_1"] = _resnet(sd, "decoder.mid_block.resnets.0", False)
    dec["mid_attn_1"] = _attn(sd, "decoder.mid_block.attentions.0")
    dec["mid_block_2"] = _resnet(sd, "decoder.mid_block.resnets.1", False)
    block_in = ch * ch_mult[-1]
    prev = block_in
    # diffusers up_blocks run from deepest (index 0) to shallowest; our names
    # use the encoder-level index i (deepest = len-1)
    for bi, i in enumerate(reversed(range(len(ch_mult)))):
        out_ch = ch * ch_mult[i]
        for j in range(num_res_blocks + 1):
            pre = f"decoder.up_blocks.{bi}.resnets.{j}"
            dec[f"up_{i}_block_{j}"] = _resnet(sd, pre, has_shortcut=(prev != out_ch and j == 0))
            prev = out_ch
        if i != 0:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv")
            }
    dec["norm_out"] = _gn_params(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        # absent on SD3-family VAEs (use_quant_conv=False)
        **({"quant_conv": _conv(sd, "quant_conv"),
            "post_quant_conv": _conv(sd, "post_quant_conv")}
           if "quant_conv.weight" in sd else {}),
    }


def load_vae(vae_ckpt: str, **vae_kwargs):
    """Build an AutoencoderKL and import diffusers-format weights.

    Single home for the load-VAE idiom used by every pipeline (sampler,
    img2img, SD3, dreambooth, encode_latents, anagrams). Returns
    (vae, variables) ready for `encode_to_latent` / `decode_from_latent`.
    """
    from ..core.checkpoint import load_torch_state_dict

    vae = AutoencoderKL(**vae_kwargs)
    variables = {"params": import_autoencoder_kl_weights(load_torch_state_dict(vae_ckpt))}
    return vae, variables
