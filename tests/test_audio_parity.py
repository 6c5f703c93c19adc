"""Cross-parity for the audio stack codecs: run the reference's own torch
modules (read-only from /root/reference, CPU fp32) with identical weights
next to our flax implementations.

- 1-D mel VAE (`lumina_music/models/autoencoder1d.py:23-121`) at the real
  Make-An-Audio-2 structural config (kernel_size=5, down_layers=[0]).
- BigVGAN vocoder (`lumina_music/models/vocoder/bigvgan/models.py`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref_music_module, state_dict_numpy  # noqa: E402


def test_bigvgan_parity():
    import jax.numpy as jnp

    from lumina_t2x_tpu.codecs.vocoder import BigVGAN, import_bigvgan_weights

    ref = load_ref_music_module("lumina_music", "vocoder.bigvgan.models")

    class _H(dict):
        __getattr__ = dict.__getitem__

    mel, rates, ks = 16, [2, 2], [4, 4]
    rbk, rbd = [3, 7], [[1, 3, 5], [1, 3, 5]]
    h = _H(num_mels=mel, upsample_rates=rates, upsample_kernel_sizes=ks,
           upsample_initial_channel=32, resblock="1", resblock_kernel_sizes=rbk,
           resblock_dilation_sizes=rbd, activation="snakebeta", snake_logscale=True)
    tmodel = ref.BigVGAN(h).float().eval()
    # nudge the snake parameters off their all-zeros init so the activation
    # shape is exercised, not just the identity region
    g = torch.Generator().manual_seed(13)
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if name.endswith((".alpha", ".beta")):
                p.copy_(torch.randn(p.shape, generator=g) * 0.3)

    params = import_bigvgan_weights(state_dict_numpy(tmodel), upsample_rates=rates,
                                    resblock_kernel_sizes=rbk,
                                    resblock_dilation_sizes=rbd)
    jmodel = BigVGAN(mel_bins=mel, upsample_rates=tuple(rates),
                     upsample_kernel_sizes=tuple(ks), upsample_initial_channel=32,
                     resblock_kernel_sizes=tuple(rbk),
                     resblock_dilation_sizes=tuple(tuple(d) for d in rbd))

    rng = np.random.RandomState(14)
    x = rng.randn(2, mel, 20).astype(np.float32)
    with torch.no_grad():
        t_wav = tmodel(torch.from_numpy(x)).numpy()  # (B, 1, T*4)
    j_wav = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x)))
    assert j_wav.shape == (2, 80)
    np.testing.assert_allclose(j_wav, t_wav[:, 0], atol=5e-4, rtol=2e-3)


def test_vae1d_parity_maa2_structure():
    import jax
    import jax.numpy as jnp

    from lumina_t2x_tpu.codecs.vae1d import (
        AutoencoderKL1D,
        import_autoencoder_kl_1d_weights,
    )

    ref = load_ref_music_module("lumina_music", "autoencoder1d")
    mel, z, embed, ch, ch_mult, nrb, ks = 16, 4, 4, 32, (1, 2), 2, 5
    ddconfig = dict(
        double_z=True, in_channels=mel, out_ch=mel, z_channels=z, kernel_size=ks,
        ch=ch, ch_mult=list(ch_mult), num_res_blocks=nrb, attn_layers=[3],
        down_layers=[0], dropout=0.0,
    )
    tmodel = ref.AutoencoderKL(
        embed_dim=embed, ddconfig=ddconfig,
        lossconfig={"target": "torch.nn.Identity"},
    ).float().eval()

    params = import_autoencoder_kl_1d_weights(
        state_dict_numpy(tmodel), ch_mult=ch_mult, num_res_blocks=nrb,
        attn_layers=(), down_layers=(0,),
    )
    jmodel = AutoencoderKL1D(mel_bins=mel, embed_dim=embed, ch=ch, ch_mult=ch_mult,
                             num_res_blocks=nrb, z_channels=z, attn_layers=(),
                             down_layers=(0,), kernel_size=ks)

    rng = np.random.RandomState(12)
    x = rng.randn(2, mel, 24).astype(np.float32)  # (B, mel, T)
    with torch.no_grad():
        posterior = tmodel.encode(torch.from_numpy(x))
        t_moments = posterior.parameters.numpy()  # (B, 2*embed, t)
        t_rec = tmodel.decode(posterior.mode()).numpy()

    j_moments = np.asarray(jax.jit(
        lambda p, a: jmodel.apply(p, a, method=jmodel.encode_moments)
    )({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(j_moments, t_moments, atol=2e-4, rtol=2e-3)

    mean = j_moments[:, : j_moments.shape[1] // 2]
    j_rec = np.asarray(jax.jit(
        lambda p, a: jmodel.apply(p, a, method=jmodel.decode)
    )({"params": params}, jnp.asarray(mean)))
    assert j_rec.shape == t_rec.shape == x.shape
    np.testing.assert_allclose(j_rec, t_rec, atol=5e-4, rtol=2e-3)


def test_make_an_audio_2_vae_config():
    """The factory must pin the shipped maa2 structural config
    (`lumina_music/configs/lumina-text2music.yaml:49-65`)."""
    from lumina_t2x_tpu.codecs.vae1d import make_an_audio_2_vae

    vae = make_an_audio_2_vae()
    assert (vae.mel_bins, vae.embed_dim, vae.ch, tuple(vae.ch_mult)) == (80, 20, 384, (1, 2, 4))
    assert (vae.num_res_blocks, vae.z_channels, vae.kernel_size) == (2, 20, 5)
    assert tuple(vae.down_layers) == (0,) and tuple(vae.attn_layers) == ()
    # downsample rate: only level 0 halves T
    assert 2 ** len(vae.down_layers) == 2
