"""CLAP audio tower parity (`codecs/clap_audio.py`) vs an inline torch
transcription of the reference Cnn14 + front end
(`lumina_audio/models/encoders/CLAP/audio.py`, `clap.py`, `CLAPWrapper.py`)
— the same proven pattern as tests/test_inception.py / test_mmdit_parity.py:
the torch side is hand-written here from the reference's math, weights are
random, and the import path (OIHW->HWIO, folded eval batch norm, transposed
linears) must reproduce it numerically.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp


def _rand_sd(rng):
    """Random torch-layout CLAP audio_encoder state dict at REDUCED widths
    (mel 64 kept — bn0 is mel-sized; channels cut 8x for test speed)."""
    import torch

    chans = [8, 16, 32, 64, 128, 256]
    sd = {}

    def bn(prefix, n):
        sd[f"{prefix}.weight"] = torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32))
        sd[f"{prefix}.bias"] = torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32))
        sd[f"{prefix}.running_mean"] = torch.from_numpy(rng.normal(0, 0.2, n).astype(np.float32))
        sd[f"{prefix}.running_var"] = torch.from_numpy(rng.uniform(0.5, 2.0, n).astype(np.float32))

    bn("audio_encoder.base.bn0", 64)
    cin = 1
    for i, c in enumerate(chans, start=1):
        blk = f"audio_encoder.base.conv_block{i}"
        sd[f"{blk}.conv1.weight"] = torch.from_numpy(
            rng.normal(0, 0.1, (c, cin, 3, 3)).astype(np.float32))
        sd[f"{blk}.conv2.weight"] = torch.from_numpy(
            rng.normal(0, 0.1, (c, c, 3, 3)).astype(np.float32))
        bn(f"{blk}.bn1", c)
        bn(f"{blk}.bn2", c)
        cin = c
    d_in, d_proj, classes = 256, 96, 17
    sd["audio_encoder.base.fc1.weight"] = torch.from_numpy(
        rng.normal(0, 0.05, (d_in, chans[-1])).astype(np.float32))
    sd["audio_encoder.base.fc1.bias"] = torch.from_numpy(
        rng.normal(0, 0.05, d_in).astype(np.float32))
    sd["audio_encoder.base.fc_audioset.weight"] = torch.from_numpy(
        rng.normal(0, 0.05, (classes, d_in)).astype(np.float32))
    sd["audio_encoder.base.fc_audioset.bias"] = torch.from_numpy(
        rng.normal(0, 0.05, classes).astype(np.float32))
    sd["audio_encoder.projection.linear1.weight"] = torch.from_numpy(
        rng.normal(0, 0.05, (d_proj, d_in)).astype(np.float32))
    sd["audio_encoder.projection.linear2.weight"] = torch.from_numpy(
        rng.normal(0, 0.05, (d_proj, d_proj)).astype(np.float32))
    sd["audio_encoder.projection.layer_norm.weight"] = torch.from_numpy(
        rng.uniform(0.5, 1.5, d_proj).astype(np.float32))
    sd["audio_encoder.projection.layer_norm.bias"] = torch.from_numpy(
        rng.normal(0, 0.1, d_proj).astype(np.float32))
    sd["logit_scale"] = torch.tensor(float(np.log(1 / 0.07)))
    return sd


def _torch_cnn14(sd, mel_db):
    """Inline transcription of Cnn14.forward eval path (audio.py:167-199),
    starting from the (B, 1, T, mel) log-mel (front end checked separately)."""
    import torch
    import torch.nn.functional as F

    def bn(x, prefix, dims):
        g = sd[f"{prefix}.weight"].reshape(dims)
        b = sd[f"{prefix}.bias"].reshape(dims)
        rm = sd[f"{prefix}.running_mean"].reshape(dims)
        rv = sd[f"{prefix}.running_var"].reshape(dims)
        return (x - rm) / torch.sqrt(rv + 1e-5) * g + b

    x = mel_db.transpose(1, 3)  # (B, mel, T, 1)
    x = bn(x, "audio_encoder.base.bn0", (1, -1, 1, 1))
    x = x.transpose(1, 3)  # (B, 1, T, mel)
    for i in range(1, 7):
        blk = f"audio_encoder.base.conv_block{i}"
        x = F.relu(bn(F.conv2d(x, sd[f"{blk}.conv1.weight"], padding=1),
                      f"{blk}.bn1", (1, -1, 1, 1)))
        x = F.relu(bn(F.conv2d(x, sd[f"{blk}.conv2.weight"], padding=1),
                      f"{blk}.bn2", (1, -1, 1, 1)))
        if i < 6:
            x = F.avg_pool2d(x, kernel_size=(2, 2))
    x = torch.mean(x, dim=3)  # over mel
    x = torch.max(x, dim=2)[0] + torch.mean(x, dim=2)  # over time
    x = F.relu(F.linear(x, sd["audio_encoder.base.fc1.weight"],
                        sd["audio_encoder.base.fc1.bias"]))
    clipwise = torch.sigmoid(F.linear(x, sd["audio_encoder.base.fc_audioset.weight"],
                                      sd["audio_encoder.base.fc_audioset.bias"]))
    return x, clipwise


def _torch_projection(sd, x):
    """CLAP Projection head (clap.py:12-24, eval: dropout off)."""
    import torch.nn.functional as F

    e1 = F.linear(x, sd["audio_encoder.projection.linear1.weight"])
    e2 = F.linear(F.gelu(e1), sd["audio_encoder.projection.linear2.weight"])
    return F.layer_norm(e1 + e2, e1.shape[-1:],
                        sd["audio_encoder.projection.layer_norm.weight"],
                        sd["audio_encoder.projection.layer_norm.bias"])


class TestCnn14Parity:
    def test_tower_matches_torch(self):
        import torch

        from lumina_t2x_tpu.codecs.clap_audio import (cnn14_embedding,
                                                      import_clap_audio_weights)

        rng = np.random.RandomState(0)
        sd = _rand_sd(rng)
        params = import_clap_audio_weights(sd)
        mel = rng.normal(-20, 10, (2, 1, 96, 64)).astype(np.float32)
        with torch.no_grad():
            ref_emb, ref_clip = _torch_cnn14(sd, torch.from_numpy(mel))
        emb, clip = cnn14_embedding(params["cnn14"], jnp.asarray(mel[:, 0]))
        np.testing.assert_allclose(np.asarray(emb), ref_emb.numpy(), atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(clip), ref_clip.numpy(), atol=2e-5, rtol=2e-4)

    def test_projection_and_normalized_embed(self):
        import torch

        from lumina_t2x_tpu.codecs.clap_audio import import_clap_audio_weights
        from lumina_t2x_tpu.codecs.text_encoders import clap_projection

        rng = np.random.RandomState(1)
        sd = _rand_sd(rng)
        params = import_clap_audio_weights(sd)
        x = rng.normal(0, 1, (3, 256)).astype(np.float32)
        with torch.no_grad():
            ref = _torch_projection(sd, torch.from_numpy(x)).numpy()
        out = np.asarray(clap_projection(jnp.asarray(x), params["projection"]))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
        assert params["logit_scale"] == pytest.approx(1 / 0.07, rel=1e-5)


class TestFrontEnd:
    def test_stft_power_matches_torch_stft(self):
        """torch.stft with hann/center/reflect is the exact semantics
        torchlibrosa's conv-STFT implements (CLAP/audio.py:130-139)."""
        import torch

        from lumina_t2x_tpu.codecs.clap_audio import hann_window, stft_power

        rng = np.random.RandomState(2)
        x = rng.normal(0, 0.3, (2, 3200)).astype(np.float32)
        n_fft, hop = 256, 80
        with torch.no_grad():
            ref = torch.stft(torch.from_numpy(x), n_fft, hop_length=hop,
                             window=torch.hann_window(n_fft), center=True,
                             pad_mode="reflect", return_complex=True)
            ref_pow = (ref.abs() ** 2).transpose(1, 2).numpy()  # (B, T, F)
        out = np.asarray(stft_power(jnp.asarray(x), n_fft, hop,
                                    jnp.asarray(hann_window(n_fft))))
        assert out.shape == ref_pow.shape == (2, 3200 // hop + 1, n_fft // 2 + 1)
        np.testing.assert_allclose(out, ref_pow, atol=1e-3, rtol=1e-4)

    def test_mel_filterbank_librosa_semantics(self):
        """Slaney filterbank invariants (librosa.filters.mel defaults):
        triangular peaks at successive mel centers, slaney area norm,
        full band coverage, and an independently-computed small case."""
        from lumina_t2x_tpu.codecs.clap_audio import (_hz_to_mel, _mel_to_hz,
                                                      mel_filterbank)

        sr, n_fft, n_mels, fmin, fmax = 44100, 1024, 64, 50.0, 14000.0
        fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # (freq, mel)
        assert fb.shape == (n_fft // 2 + 1, n_mels)
        assert fb.min() >= 0
        # scale anchors (Slaney): 1 kHz -> 15, linear below
        assert _hz_to_mel(1000.0) == pytest.approx(15.0)
        assert _hz_to_mel(500.0) == pytest.approx(7.5)
        assert _mel_to_hz(_hz_to_mel(4321.0)) == pytest.approx(4321.0, rel=1e-9)
        # each filter's peak frequency bin sits at (or next to) its mel center
        fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
        centers = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))[1:-1]
        peak_hz = fftfreqs[np.argmax(fb, axis=0)]
        bin_hz = sr / n_fft
        assert np.all(np.abs(peak_hz - centers) <= bin_hz)
        # slaney normalization: peak amplitude == 2 / (upper - lower) within
        # discretization error
        lo = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))[:-2]
        hi = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))[2:]
        dense = [m for m in range(n_mels) if (hi[m] - lo[m]) > 4 * bin_hz]
        assert len(dense) >= 30  # most of the 64 filters span >=4 bins
        # slaney normalization: each triangle has unit area (peak 2/(hi-lo)
        # over base (hi-lo)); the FFT-bin Riemann sum approaches 1 for
        # filters wide enough to be well sampled
        areas = fb.sum(axis=0) * bin_hz
        np.testing.assert_allclose(areas[dense], 1.0, rtol=0.1)

    def test_logmel_is_power_to_db(self):
        from lumina_t2x_tpu.codecs.clap_audio import logmel

        x = np.zeros((1, 3200), np.float32)  # silence -> amin floor
        out = np.asarray(logmel(jnp.asarray(x), sr=16000, n_fft=256, hop=80,
                                n_mels=16, fmin=50, fmax=8000))
        np.testing.assert_allclose(out, 10 * np.log10(1e-10), atol=1e-4)


class TestPreprocessAndScore:
    def test_tile_or_crop(self):
        from lumina_t2x_tpu.codecs.clap_audio import tile_or_crop

        w = np.arange(10, dtype=np.float32)
        out = tile_or_crop(w, 25, start=0)
        np.testing.assert_array_equal(out, np.tile(w, 3)[:25])  # repeat path
        out = tile_or_crop(np.arange(100, dtype=np.float32), 30, start=7)
        np.testing.assert_array_equal(out, np.arange(7, 37, dtype=np.float32))

    def test_resample_pure_tone(self):
        """A 440 Hz tone resampled 16 kHz -> 44.1 kHz stays a 440 Hz tone."""
        from lumina_t2x_tpu.codecs.clap_audio import resample_waveform

        sr_in, sr_out, f0 = 16000, 44100, 440.0
        t_in = np.arange(int(sr_in * 0.5)) / sr_in
        x = np.sin(2 * np.pi * f0 * t_in).astype(np.float32)[None]
        y = np.asarray(resample_waveform(jnp.asarray(x), sr_in, sr_out))[0]
        n = y.shape[0]
        assert abs(n - int(0.5 * sr_out)) <= 2
        t_out = np.arange(n) / sr_out
        ref = np.sin(2 * np.pi * f0 * t_out)
        interior = slice(200, n - 200)  # skip filter edge transients
        assert np.max(np.abs(y[interior] - ref[interior])) < 5e-3

    def test_similarity_and_score(self):
        from lumina_t2x_tpu.codecs.clap_audio import clap_score, clap_similarity

        rng = np.random.RandomState(3)
        a = rng.normal(0, 1, (4, 8)).astype(np.float32)
        t = rng.normal(0, 1, (3, 8)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        t /= np.linalg.norm(t, axis=-1, keepdims=True)
        sim = np.asarray(clap_similarity(jnp.asarray(t), jnp.asarray(a),
                                         logit_scale=2.0))
        assert sim.shape == (4, 3)  # (n_audio, n_text), CLAPWrapper.py:193-197
        np.testing.assert_allclose(sim, 2.0 * a @ t.T, atol=1e-5)
        s = np.asarray(clap_score(jnp.asarray(a[:3]), jnp.asarray(a[:3])))
        np.testing.assert_allclose(s, 1.0, atol=1e-5)

    def test_end_to_end_embed_shape(self):
        from lumina_t2x_tpu.codecs.clap_audio import (CLAPAudioEncoder,
                                                      import_clap_audio_weights)

        rng = np.random.RandomState(4)
        sd = _rand_sd(rng)
        # tiny geometry: 1 s at 8 kHz clips, small fft
        enc = CLAPAudioEncoder(import_clap_audio_weights(
            sd, sample_rate=8000, window_size=256, hop_size=80, mel_bins=64,
            fmin=50, fmax=4000), duration=1.0)
        wave = rng.normal(0, 0.1, 6000).astype(np.float32)  # short: tiled
        emb = np.asarray(enc.embed(wave, sr=8000))
        assert emb.shape == (1, 96)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
