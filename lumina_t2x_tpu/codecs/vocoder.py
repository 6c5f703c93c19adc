"""BigVGAN vocoder (mel -> waveform) for audio / music synthesis.

TPU-native re-design of the reference's BigVGAN generator
(`lumina_music/models/vocoder/bigvgan/models.py:34-512` + `alias_free_torch/*`,
duplicated in lumina_audio):

- Snake / SnakeBeta activations with per-channel learned (log-scale)
  frequency: x + (1/beta) sin^2(alpha x) (`activations.py` in the reference
  tree);
- alias-free activation: 2x FIR upsample -> snake -> 2x FIR downsample with
  kaiser-windowed sinc filters (`alias_free_torch/{filter,resample}.py`) —
  implemented as depthwise convolutions;
- AMP blocks: two stacks of dilated convs with activations between
  (`models.py:34-150`), transposed-conv upsampling, conv_pre/conv_post, tanh
  output (`models.py:~200-300`);
- the discriminators (MPD/MRD) exist in the reference but are unused at
  inference (`SURVEY.md §2.4`); training a vocoder is out of scope here too.

Inference wrapper `VocoderBigVGAN` mirrors `models.py:492+`.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass FIR (`alias_free_torch/filter.py`)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    return (f / f.sum()).astype(np.float32)


def _depthwise_fir(x, fir: np.ndarray, stride: int = 1, pad: int = 0):
    """x: (B, T, C); depthwise 1-D convolution with a shared FIR. The kernel
    follows x's dtype — lax conv requires matching lhs/rhs dtypes, so a
    float32 kernel would reject bf16 activations (dtype=bf16 inference)."""
    c = x.shape[-1]
    kernel = (jnp.asarray(fir, x.dtype)[:, None, None]
              * jnp.ones((1, 1, c), x.dtype))  # (K, 1, C)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=[(pad, pad)],
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=c,
    )


def upsample2_fir(x, kernel_size: int = 12):
    """Replicate-pad, zero-stuff 2x, low-pass — numerically identical to the
    reference's `UpSample1d` (`alias_free_torch/resample.py:10-31`: replicate
    pad k/2-1, conv_transpose stride 2, crop pad*2+(k-2)/2 per side). The
    transpose-conv + crop collapses to a VALID correlation of the stuffed
    signal at offset 2*(k/2-1) + (k-2)/2 - (k-1) (even kernels are
    symmetric)."""
    b, t, c = x.shape
    pad = kernel_size // 2 - 1
    xe = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    stuffed = jnp.zeros((b, 2 * (t + 2 * pad), c), x.dtype).at[:, ::2].set(xe)
    fir = 2 * kaiser_sinc_filter1d(0.25, 0.3, kernel_size)
    off = 2 * pad + (kernel_size - 2) // 2 - (kernel_size - 1)
    return _depthwise_fir(stuffed, fir, pad=0)[:, off : off + 2 * t]


def downsample2_fir(x, kernel_size: int = 12):
    """Replicate-pad (k/2-1, k/2) then stride-2 low-pass — identical to the
    reference's `DownSample1d`/`LowPassFilter1d`
    (`alias_free_torch/filter.py:61-95`)."""
    fir = kaiser_sinc_filter1d(0.25, 0.3, kernel_size)
    pl, pr = kernel_size // 2 - 1, kernel_size // 2
    xe = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)), mode="edge")
    return _depthwise_fir(xe, fir, stride=2, pad=0)


class SnakeBeta(nn.Module):
    """x + (1/beta) sin^2(alpha x), per-channel log-scale alpha/beta."""

    channels: int
    alpha_logscale: bool = True

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (self.channels,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.channels,), jnp.float32)
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        xf = x.astype(jnp.float32)
        out = xf + (1.0 / (beta + 1e-9)) * jnp.sin(alpha * xf) ** 2
        return out.astype(x.dtype)


class AliasFreeSnake(nn.Module):
    """up2 -> snake -> down2 anti-aliased activation."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = upsample2_fir(x)
        h = SnakeBeta(self.channels, name="snake")(h)
        return downsample2_fir(h)


class AMPBlock(nn.Module):
    """Anti-aliased multi-periodicity block (`models.py:34-150`), variant 1:
    dilated conv stack with alias-free snake activations."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = AliasFreeSnake(self.channels, name=f"act1_{i}")(x)
            h = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                        padding=d * (self.kernel_size - 1) // 2, dtype=self.dtype,
                        name=f"convs1_{i}")(h)
            h = AliasFreeSnake(self.channels, name=f"act2_{i}")(h)
            h = nn.Conv(self.channels, (self.kernel_size,), padding=(self.kernel_size - 1) // 2,
                        dtype=self.dtype, name=f"convs2_{i}")(h)
            x = x + h
        return x


class BigVGAN(nn.Module):
    """mel (B, mel_bins, T) -> waveform (B, T * prod(rates))."""

    mel_bins: int = 80
    upsample_rates: Sequence[int] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        x = mel.transpose(0, 2, 1)  # (B, T, mel)
        x = nn.Conv(self.upsample_initial_channel, (7,), padding=3, dtype=self.dtype,
                    name="conv_pre")(x)
        ch = self.upsample_initial_channel
        for i, (rate, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = ch // 2
            # SAME padding => output length = input * rate (matches torch's
            # ConvTranspose1d(padding=(k-rate)//2) length arithmetic)
            x = nn.ConvTranspose(ch, (k,), strides=(rate,), padding="SAME",
                                 dtype=self.dtype, name=f"ups_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                out = AMPBlock(ch, rk, tuple(rd), dtype=self.dtype,
                               name=f"resblocks_{i}_{j}")(x)
                acc = out if acc is None else acc + out
            x = acc / len(self.resblock_kernel_sizes)
        x = AliasFreeSnake(ch, name="activation_post")(x)
        x = nn.Conv(1, (7,), padding=3, dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


def _wn_weight(sd, name):
    """Reconstruct a torch weight_norm'd weight: w = g * v / ||v|| with the
    norm over all dims but 0 (torch's default dim=0). Falls back to a plain
    `.weight` key for checkpoints saved after remove_weight_norm."""
    if f"{name}.weight" in sd:
        return sd[f"{name}.weight"]
    g, v = sd[f"{name}.weight_g"], sd[f"{name}.weight_v"]
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=tuple(range(1, v.ndim)),
                                                   keepdims=True))
    return (g * v / norm).astype(np.float32)


def _wn_conv1d(sd, name):
    w = _wn_weight(sd, name)  # torch Conv1d (out, in, k) -> flax (k, in, out)
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _wn_conv_transpose1d(sd, name):
    # torch ConvTranspose1d (in, out, k) -> flax ConvTranspose (k, in, out),
    # TIME-FLIPPED: torch's transposed conv convolves (adjoint of its
    # correlation) while flax's correlates (verified numerically vs torch).
    w = _wn_weight(sd, name)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _snake(sd, name):
    return {"snake": {"alpha": sd[f"{name}.alpha"], "beta": sd[f"{name}.beta"]}}


def import_bigvgan_weights(sd, upsample_rates: Sequence[int] = (4, 4, 2, 2, 2, 2),
                           resblock_kernel_sizes: Sequence[int] = (3, 7, 11),
                           resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3):
    """Map a reference BigVGAN generator state dict
    (`lumina_music/models/vocoder/bigvgan/models.py:194-287`, snakebeta
    activation, weight-norm'd convs) onto our `BigVGAN` param tree. Accepts a
    raw `best_netG.pt`-style dict (optionally nested under "generator")."""
    if "generator" in sd and isinstance(sd["generator"], dict):
        sd = sd["generator"]
    nk = len(resblock_kernel_sizes)
    params = {
        "conv_pre": _wn_conv1d(sd, "conv_pre"),
        "conv_post": _wn_conv1d(sd, "conv_post"),
        "activation_post": _snake(sd, "activation_post.act"),
    }
    for i in range(len(upsample_rates)):
        params[f"ups_{i}"] = _wn_conv_transpose1d(sd, f"ups.{i}.0")
        for j in range(nk):
            n = i * nk + j
            block = {}
            for d in range(len(resblock_dilation_sizes[j])):
                block[f"convs1_{d}"] = _wn_conv1d(sd, f"resblocks.{n}.convs1.{d}")
                block[f"convs2_{d}"] = _wn_conv1d(sd, f"resblocks.{n}.convs2.{d}")
                block[f"act1_{d}"] = _snake(sd, f"resblocks.{n}.activations.{2 * d}.act")
                block[f"act2_{d}"] = _snake(sd, f"resblocks.{n}.activations.{2 * d + 1}.act")
            params[f"resblocks_{i}_{j}"] = block
    return params


class VocoderBigVGAN:
    """Inference wrapper (`models.py:492+`): mel spectrogram -> waveform."""

    def __init__(self, model: BigVGAN, variables):
        self.model = model
        self.variables = variables
        self._apply = jax.jit(lambda v, mel: model.apply(v, mel))

    @classmethod
    def create(cls, rng=None, mel_bins: int = 80, **kwargs):
        model = BigVGAN(mel_bins=mel_bins, **kwargs)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = model.init(rng, jnp.zeros((1, mel_bins, 16)))
        return cls(model, variables)

    @classmethod
    def from_torch_checkpoint(cls, ckpt_path: str, mel_bins: int = 80, **kwargs):
        """Load the reference's trained vocoder (`best_netG.pt`,
        `models.py:492-503`) into the flax generator."""
        from ..core.checkpoint import load_torch_state_dict

        sd = load_torch_state_dict(ckpt_path)
        model = BigVGAN(mel_bins=mel_bins, **kwargs)
        params = import_bigvgan_weights(
            sd, upsample_rates=model.upsample_rates,
            resblock_kernel_sizes=model.resblock_kernel_sizes,
            resblock_dilation_sizes=model.resblock_dilation_sizes,
        )
        return cls(model, {"params": params})

    def vocode(self, mel):
        if mel.ndim == 2:
            mel = mel[None]
        return np.asarray(self._apply(self.variables, jnp.asarray(mel)))
