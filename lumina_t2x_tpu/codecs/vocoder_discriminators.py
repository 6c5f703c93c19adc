"""BigVGAN discriminators (MPD + MRD) and GAN losses — vocoder fine-tuning.

Closes the last vocoder-capability gap vs the reference
(`lumina_music/models/vocoder/bigvgan/models.py:289-492`): the generator
(`codecs/vocoder.BigVGAN`) has inference parity; these are the adversarial
judges needed to fine-tune it. TPU-first choices:

- Weight norm is computed in-graph (`WNConv`): params are (v, g) and the
  effective kernel g * v/||v|| is re-derived each call — the torch
  `weight_norm` hook semantics, but as a pure function so it jits and
  differentiates with no parametrization state.
- Layout is NHWC/NWC throughout (TPU conv-friendly); importers transpose
  from torch's NCHW/OIHW (`weight_v`/`weight_g` pairs).
- The MRD front end reuses the rfft framing from `clap_audio.stft_power`
  with a RECTANGULAR window and center=False + (n_fft-hop)/2 reflect pad —
  matching the reference's `torch.stft(window=None)` quirk
  (`models.py:419-427`) exactly, not the hann one might expect.

Defaults (`mpd_reshapes` [2,3,5,7,11], `resolutions`
[[1024,120,600],[2048,240,1200],[512,50,240]], channel mult 1) are the
BigVGAN-base values the reference's config omits.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1  # models.py:21


class WNConv(nn.Module):
    """Weight-normalized conv (1d or 2d by kernel rank): w = g * v / ||v||,
    norm over all axes but the output channel (torch weight_norm dim=0)."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] = None
    padding: Sequence[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, in_ch, self.features)  # HWIO
        v = self.param("v", nn.initializers.lecun_normal(), kshape, jnp.float32)
        g = self.param("g", lambda _: jnp.sqrt(
            jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=tuple(range(v.ndim - 1)))),
            )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(v ** 2, axis=tuple(range(v.ndim - 1)), keepdims=True))
        w = v / jnp.maximum(norm, 1e-12) * g
        nd = len(self.kernel_size)
        dn = ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NWC", "WIO", "NWC")
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=self.strides or (1,) * nd,
            padding=list(self.padding) if self.padding is not None else "SAME",
            dimension_numbers=dn)
        return y + b


class PeriodDiscriminator(nn.Module):
    """DiscriminatorP (`models.py:289-349`): fold time into (time/period,
    period) and run strided (5,1) convs down the time axis."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channel_mult: float = 1.0

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x: (B, T) or (B, T, 1) waveform
        if x.ndim == 2:
            x = x[..., None]
        b, t, _ = x.shape
        if t % self.period:
            pad = self.period - t % self.period
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
            t += pad
        x = x.reshape(b, t // self.period, self.period, 1)  # NHWC

        fmap = []
        m = self.channel_mult
        pad_k = (self.kernel_size * 1 - 1) // 2  # get_padding(5, 1) == 2
        widths = [int(32 * m), int(128 * m), int(512 * m), int(1024 * m)]
        for i, ch in enumerate(widths):
            x = WNConv(ch, (self.kernel_size, 1), (self.stride, 1),
                       ((pad_k, pad_k), (0, 0)), name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = WNConv(int(1024 * m), (self.kernel_size, 1), (1, 1),
                   ((2, 2), (0, 0)), name="conv4")(x)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = WNConv(1, (3, 1), (1, 1), ((1, 1), (0, 0)), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class ResolutionDiscriminator(nn.Module):
    """DiscriminatorR (`models.py:373-428`): STFT magnitude (rectangular
    window, center=False) -> (3,9) convs striding the time axis."""

    resolution: Tuple[int, int, int]  # (n_fft, hop, win_length)
    channel_mult: float = 1.0

    def spectrogram(self, x):
        n_fft, hop, win = self.resolution
        pad = (n_fft - hop) // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (x.shape[-1] - n_fft) // hop
        # torch.stft CENTERS the win_length window inside the n_fft frame:
        # the rectangular window selects win samples at offset (n_fft-win)//2
        # of each frame (zero elsewhere — padding position only shifts phase,
        # magnitude is unaffected)
        off = (n_fft - win) // 2
        idx = hop * jnp.arange(n_frames)[:, None] + off + jnp.arange(win)[None, :]
        frames = x[:, idx]
        if win < n_fft:
            frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_fft - win)))
        return jnp.abs(jnp.fft.rfft(frames.astype(jnp.float32), axis=-1))  # (B,T,F)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        if x.ndim == 3:
            x = x[..., 0]
        mag = self.spectrogram(x)
        # reference layout is (B, 1, F, T): kernel dim 3 spans FREQ, 9 spans
        # TIME and the (1,2) stride halves TIME -> NHWC as (B, F, T, 1)
        x = mag.transpose(0, 2, 1)[..., None]
        fmap = []
        ch = int(32 * self.channel_mult)
        specs = [((3, 9), (1, 1)), ((3, 9), (1, 2)), ((3, 9), (1, 2)),
                 ((3, 9), (1, 2)), ((3, 3), (1, 1))]
        for i, (k, s) in enumerate(specs):
            pad = ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))
            x = WNConv(ch, k, s, pad, name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = WNConv(1, (3, 3), (1, 1), ((1, 1), (1, 1)), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """`models.py:352-371` over mpd_reshapes."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channel_mult: float = 1.0

    @nn.compact
    def __call__(self, y, y_hat):
        scores_r, scores_g, fmaps_r, fmaps_g = [], [], [], []
        for p in self.periods:
            d = PeriodDiscriminator(p, channel_mult=self.channel_mult,
                                    name=f"p{p}")
            sr, fr = d(y)
            sg, fg = d(y_hat)
            scores_r.append(sr); fmaps_r.append(fr)
            scores_g.append(sg); fmaps_g.append(fg)
        return scores_r, scores_g, fmaps_r, fmaps_g


class MultiResolutionDiscriminator(nn.Module):
    """`models.py:430-455` over STFT resolutions."""

    resolutions: Sequence[Tuple[int, int, int]] = (
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240))
    channel_mult: float = 1.0

    @nn.compact
    def __call__(self, y, y_hat):
        scores_r, scores_g, fmaps_r, fmaps_g = [], [], [], []
        for res in self.resolutions:
            d = ResolutionDiscriminator(tuple(res), channel_mult=self.channel_mult,
                                        name=f"r{res[0]}")
            sr, fr = d(y)
            sg, fg = d(y_hat)
            scores_r.append(sr); fmaps_r.append(fr)
            scores_g.append(sg); fmaps_g.append(fg)
        return scores_r, scores_g, fmaps_r, fmaps_g


# -- GAN losses (`models.py:458-492`) ----------------------------------------


def feature_loss(fmaps_r, fmaps_g):
    # real-branch fmaps are stop-gradiented: the reference only ever uses
    # this in the GENERATOR step (models.py:458-464), where torch's
    # undetached rl grads land in discriminator .grad buffers that the next
    # zero_grad discards — here we skip computing them at all
    loss = 0.0
    for fr, fg in zip(fmaps_r, fmaps_g):
        for rl, gl in zip(fr, fg):
            loss += jnp.mean(jnp.abs(jax.lax.stop_gradient(rl) - gl))
    return loss * 2.0


def discriminator_loss(scores_r, scores_g):
    loss, r_losses, g_losses = 0.0, [], []
    for dr, dg in zip(scores_r, scores_g):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg ** 2)
        loss += r + g
        r_losses.append(r); g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(scores_g):
    loss, per = 0.0, []
    for dg in scores_g:
        l = jnp.mean((1.0 - dg) ** 2)
        per.append(l)
        loss += l
    return loss, per


# -- torch-checkpoint import --------------------------------------------------


def _wn_pair(sd, name, conv2d=True):
    v = np.asarray(sd[f"{name}.weight_v"], np.float32)
    g = np.asarray(sd[f"{name}.weight_g"], np.float32)
    b = np.asarray(sd[f"{name}.bias"], np.float32)
    # torch OIHW -> HWIO; weight_g is (O, 1, 1, 1) -> (O,)
    v = v.transpose(2, 3, 1, 0) if conv2d else v.transpose(2, 1, 0)
    return {"v": v, "g": g.reshape(-1), "bias": b}


def import_mpd_weights(state_dict, periods: Sequence[int] = (2, 3, 5, 7, 11)):
    """torch `MultiPeriodDiscriminator.state_dict()` -> flax params
    (`discriminators.{i}.convs.{j}` / `.conv_post` layout)."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state_dict.items()}
    params = {}
    for i, p in enumerate(periods):
        blk = {}
        for j in range(5):
            blk[f"conv{j}"] = _wn_pair(sd, f"discriminators.{i}.convs.{j}")
        blk["conv_post"] = _wn_pair(sd, f"discriminators.{i}.conv_post")
        params[f"p{p}"] = blk
    return {"params": params}


def import_mrd_weights(state_dict, resolutions: Sequence[Tuple[int, int, int]] = (
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240))):
    """torch `MultiResolutionDiscriminator.state_dict()` -> flax params."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state_dict.items()}
    params = {}
    for i, res in enumerate(resolutions):
        blk = {}
        for j in range(5):
            blk[f"conv{j}"] = _wn_pair(sd, f"discriminators.{i}.convs.{j}")
        blk["conv_post"] = _wn_pair(sd, f"discriminators.{i}.conv_post")
        params[f"r{res[0]}"] = blk
    return {"params": params}
