"""Numeric cross-parity for the 2-D image VAE (`codecs/vae.py` +
`import_autoencoder_kl_weights`) against an inline torch transcription of
diffusers' `AutoencoderKL` — the module the reference actually runs for
image<->latent transcoding (`lumina_next_t2i/train.py:434-445`, decode
`sample.py:237-240`; SD3 variant `lumina_next_t2i_mini/sample_sd3.py`).

diffusers is not installed in this image, so (mirroring `test_mmdit_parity.py`
and `test_inception.py`) the torch side below is a faithful transcription of
the published architecture: ResnetBlock2D (GroupNorm-32 eps=1e-6 / SiLU /
conv, 1x1 conv_shortcut on channel change), the single-head mid `Attention`
(group_norm + linear q/k/v/out, residual add), `Downsample2D` (asymmetric
(0,1,0,1) pad + stride-2 VALID conv), `Upsample2D` (nearest-2x + conv),
`Encoder`/`Decoder` with their mid blocks, and the 1x1 quant/post_quant
convs. Weights are randomized, exported under the exact diffusers state-dict
names, imported via `import_autoencoder_kl_weights`, and encode-moments /
decode outputs must agree to <=2e-4 — covering GroupNorm eps, attention
scale, the asymmetric downsample padding, transposed conv kernel layouts,
the up-block channel schedule, and the NCHW<->NHWC boundary transposes, for
both the 4-ch quant-conv (SD/SDXL) and 16-ch no-quant-conv (SD3) geometries.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from lumina_t2x_tpu.codecs.vae import (  # noqa: E402
    AutoencoderKL,
    import_autoencoder_kl_weights,
)

# tiny-but-structured configs: channels stay multiples of 32 (GroupNorm-32)
SD_CFG = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
              use_quant_conv=True)
SD3_CFG = dict(ch=32, ch_mult=(1, 2, 4), num_res_blocks=1, z_channels=16,
               use_quant_conv=False)


# ---------------------------------------------------------------------------
# torch side: transcription of diffusers (names match the state dict exactly)
# ---------------------------------------------------------------------------


class TResnet(tnn.Module):
    """diffusers ResnetBlock2D (output_scale_factor=1, no time emb)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TAttn(tnn.Module):
    """diffusers Attention as configured by the VAE mid block: one head
    (attention_head_dim == channels), linear projections, residual add."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        hidden = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(hidden), self.to_k(hidden), self.to_v(hidden)
        attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        out = self.to_out[0](attn @ v)
        return res + out.transpose(1, 2).view(b, c, h, w)


class TDown(tnn.Module):
    """Downsample2D: F.pad (0,1,0,1) then stride-2 conv with padding=0."""

    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUp(tnn.Module):
    """Upsample2D: nearest-2x interpolate then 3x3 conv."""

    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TDownBlock(tnn.Module):
    def __init__(self, cin, cout, nres, add_down):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(cin if j == 0 else cout, cout) for j in range(nres)]
        )
        self.downsamplers = tnn.ModuleList([TDown(cout)]) if add_down else None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class TUpBlock(tnn.Module):
    def __init__(self, cin, cout, nres, add_up):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(cin if j == 0 else cout, cout) for j in range(nres + 1)]
        )
        self.upsamplers = tnn.ModuleList([TUp(cout)]) if add_up else None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class TMid(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = tnn.ModuleList([TResnet(c, c), TResnet(c, c)])
        self.attentions = tnn.ModuleList([TAttn(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TEncoder(tnn.Module):
    def __init__(self, ch, ch_mult, nres, z, double_z=True):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, ch, 3, padding=1)
        blocks, prev = [], ch
        for i, mult in enumerate(ch_mult):
            out = ch * mult
            blocks.append(TDownBlock(prev, out, nres, i != len(ch_mult) - 1))
            prev = out
        self.down_blocks = tnn.ModuleList(blocks)
        self.mid_block = TMid(prev)
        self.conv_norm_out = tnn.GroupNorm(32, prev, eps=1e-6)
        self.conv_out = tnn.Conv2d(prev, 2 * z if double_z else z, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TDecoder(tnn.Module):
    def __init__(self, ch, ch_mult, nres, z, out_channels=3):
        super().__init__()
        rev = [ch * m for m in reversed(ch_mult)]
        self.conv_in = tnn.Conv2d(z, rev[0], 3, padding=1)
        self.mid_block = TMid(rev[0])
        blocks, prev = [], rev[0]
        for bi, out in enumerate(rev):
            blocks.append(TUpBlock(prev, out, nres, bi != len(rev) - 1))
            prev = out
        self.up_blocks = tnn.ModuleList(blocks)
        self.conv_norm_out = tnn.GroupNorm(32, prev, eps=1e-6)
        self.conv_out = tnn.Conv2d(prev, out_channels, 3, padding=1)

    def forward(self, z):
        x = self.mid_block(self.conv_in(z))
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TAutoencoderKL(tnn.Module):
    def __init__(self, ch, ch_mult, num_res_blocks, z_channels, use_quant_conv):
        super().__init__()
        self.encoder = TEncoder(ch, ch_mult, num_res_blocks, z_channels)
        self.decoder = TDecoder(ch, ch_mult, num_res_blocks, z_channels)
        if use_quant_conv:
            self.quant_conv = tnn.Conv2d(2 * z_channels, 2 * z_channels, 1)
            self.post_quant_conv = tnn.Conv2d(z_channels, z_channels, 1)
        else:
            self.quant_conv = self.post_quant_conv = None

    def encode_moments(self, x):
        h = self.encoder(x)
        return self.quant_conv(h) if self.quant_conv is not None else h

    def decode(self, z):
        if self.post_quant_conv is not None:
            z = self.post_quant_conv(z)
        return self.decoder(z)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _pair(cfg, seed=0):
    torch.manual_seed(seed)
    tm = TAutoencoderKL(cfg["ch"], cfg["ch_mult"], cfg["num_res_blocks"],
                        cfg["z_channels"], cfg["use_quant_conv"]).eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn_like(p) * (0.05 if p.ndim > 1 else 0.02))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_autoencoder_kl_weights(
        sd, ch_mult=cfg["ch_mult"], num_res_blocks=cfg["num_res_blocks"],
        ch=cfg["ch"])
    jm = AutoencoderKL(ch=cfg["ch"], ch_mult=cfg["ch_mult"],
                       num_res_blocks=cfg["num_res_blocks"],
                       z_channels=cfg["z_channels"],
                       use_quant_conv=cfg["use_quant_conv"])
    return tm, jm, {"params": params}


@pytest.mark.parametrize("cfg,name", [(SD_CFG, "sd"), (SD3_CFG, "sd3")])
def test_encode_moments_parity(cfg, name):
    """encoder + quant_conv end-to-end on randomized weights, <=2e-4."""
    tm, jm, variables = _pair(cfg)
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm.encode_moments(torch.from_numpy(x)).numpy()
    got = np.asarray(jm.apply(variables, jnp.asarray(x),
                              method=jm.encode_moments))
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("cfg,name", [(SD_CFG, "sd"), (SD3_CFG, "sd3")])
def test_decode_parity(cfg, name):
    """post_quant_conv + decoder end-to-end on randomized weights, <=2e-4."""
    tm, jm, variables = _pair(cfg, seed=3)
    down = 2 ** (len(cfg["ch_mult"]) - 1)
    rng = np.random.RandomState(2)
    z = rng.standard_normal(
        (2, cfg["z_channels"], 16 // down, 16 // down)).astype(np.float32)
    with torch.no_grad():
        ref = tm.decode(torch.from_numpy(z)).numpy()
    got = np.asarray(jm.apply(variables, jnp.asarray(z), method=jm.decode))
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_non_square_parity():
    """H != W through both paths — pins the NCHW<->NHWC transposes, the
    asymmetric downsample pad orientation, and the upsample H/W order."""
    tm, jm, variables = _pair(SD_CFG, seed=5)
    rng = np.random.RandomState(4)
    x = rng.uniform(-1, 1, (1, 3, 16, 24)).astype(np.float32)
    with torch.no_grad():
        ref_m = tm.encode_moments(torch.from_numpy(x)).numpy()
        ref_d = tm.decode(torch.from_numpy(ref_m[:, :SD_CFG["z_channels"]])).numpy()
    got_m = np.asarray(jm.apply(variables, jnp.asarray(x),
                                method=jm.encode_moments))
    np.testing.assert_allclose(got_m, ref_m, atol=2e-4, rtol=2e-4)
    got_d = np.asarray(jm.apply(
        variables, jnp.asarray(ref_m[:, :SD_CFG["z_channels"]]),
        method=jm.decode))
    np.testing.assert_allclose(got_d, ref_d, atol=2e-4, rtol=2e-4)


def test_odd_spatial_downsample_parity():
    """Odd H/W makes the (0,1,0,1) asymmetric pad load-bearing: a symmetric
    or (1,0,1,0) pad produces a different grid alignment. 15x17 input."""
    tm, jm, variables = _pair(SD_CFG, seed=7)
    rng = np.random.RandomState(6)
    x = rng.uniform(-1, 1, (1, 3, 15, 17)).astype(np.float32)
    with torch.no_grad():
        ref = tm.encode_moments(torch.from_numpy(x)).numpy()
    got = np.asarray(jm.apply(variables, jnp.asarray(x),
                              method=jm.encode_moments))
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)
