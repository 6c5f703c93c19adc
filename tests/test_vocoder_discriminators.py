"""BigVGAN discriminator parity (`codecs/vocoder_discriminators.py`) vs an
inline torch transcription of the reference
(`lumina_music/models/vocoder/bigvgan/models.py:289-492`): weight-normalized
convs with random (v, g, bias), the period fold, the rectangular-window
center=False STFT, and the three GAN losses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _wn_weight(v, g):
    import torch

    norm = torch.linalg.vector_norm(v, dim=tuple(range(1, v.ndim)), keepdim=True)
    return v / norm.clamp_min(1e-12) * g


def _rand_p_sd(rng, period_count=1, mult=0.25):
    """Random DiscriminatorP weight_norm tensors at reduced width."""
    import torch

    chans = [int(32 * mult), int(128 * mult), int(512 * mult),
             int(1024 * mult), int(1024 * mult)]
    sd = {}
    cin = 1
    for j, c in enumerate(chans):
        k = (5, 1)
        sd[f"convs.{j}.weight_v"] = torch.from_numpy(
            rng.normal(0, 0.1, (c, cin, *k)).astype(np.float32))
        sd[f"convs.{j}.weight_g"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, (c, 1, 1, 1)).astype(np.float32))
        sd[f"convs.{j}.bias"] = torch.from_numpy(
            rng.normal(0, 0.05, c).astype(np.float32))
        cin = c
    sd["conv_post.weight_v"] = torch.from_numpy(
        rng.normal(0, 0.1, (1, cin, 3, 1)).astype(np.float32))
    sd["conv_post.weight_g"] = torch.from_numpy(
        rng.uniform(0.5, 1.5, (1, 1, 1, 1)).astype(np.float32))
    sd["conv_post.bias"] = torch.from_numpy(rng.normal(0, 0.05, 1).astype(np.float32))
    return sd


def _torch_discriminator_p(sd, x, period, stride=3):
    """models.py:331-349 with eval-path weight norm."""
    import torch
    import torch.nn.functional as F

    b, c, t = x.shape
    if t % period:
        x = F.pad(x, (0, period - t % period), "reflect")
        t = x.shape[-1]
    x = x.view(b, c, t // period, period)
    fmap = []
    strides = [(stride, 1)] * 4 + [(1, 1)]
    pads = [(2, 0)] * 5
    for j in range(5):
        w = _wn_weight(sd[f"convs.{j}.weight_v"], sd[f"convs.{j}.weight_g"])
        x = F.conv2d(x, w, sd[f"convs.{j}.bias"], stride=strides[j], padding=pads[j])
        x = F.leaky_relu(x, 0.1)
        fmap.append(x)
    w = _wn_weight(sd["conv_post.weight_v"], sd["conv_post.weight_g"])
    x = F.conv2d(x, w, sd["conv_post.bias"], padding=(1, 0))
    fmap.append(x)
    return torch.flatten(x, 1, -1), fmap


def _rand_r_sd(rng, mult=0.25):
    import torch

    c = int(32 * mult)
    sd = {}
    shapes = [(c, 1, 3, 9), (c, c, 3, 9), (c, c, 3, 9), (c, c, 3, 9), (c, c, 3, 3)]
    for j, shp in enumerate(shapes):
        sd[f"convs.{j}.weight_v"] = torch.from_numpy(
            rng.normal(0, 0.1, shp).astype(np.float32))
        sd[f"convs.{j}.weight_g"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, (shp[0], 1, 1, 1)).astype(np.float32))
        sd[f"convs.{j}.bias"] = torch.from_numpy(
            rng.normal(0, 0.05, shp[0]).astype(np.float32))
    sd["conv_post.weight_v"] = torch.from_numpy(
        rng.normal(0, 0.1, (1, c, 3, 3)).astype(np.float32))
    sd["conv_post.weight_g"] = torch.from_numpy(
        rng.uniform(0.5, 1.5, (1, 1, 1, 1)).astype(np.float32))
    sd["conv_post.bias"] = torch.from_numpy(rng.normal(0, 0.05, 1).astype(np.float32))
    return sd


def _torch_discriminator_r(sd, x, resolution):
    """models.py:395-428: rectangular-window center=False STFT + convs."""
    import torch
    import torch.nn.functional as F

    n_fft, hop, win = resolution
    x = F.pad(x, ((n_fft - hop) // 2, (n_fft - hop) // 2), mode="reflect")
    x = x.squeeze(1)
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop, win_length=win,
                      center=False, return_complex=True)
    x = spec.abs().unsqueeze(1)  # (B, 1, F, T)
    fmap = []
    pads = [(1, 4), (1, 4), (1, 4), (1, 4), (1, 1)]
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    for j in range(5):
        w = _wn_weight(sd[f"convs.{j}.weight_v"], sd[f"convs.{j}.weight_g"])
        x = F.conv2d(x, w, sd[f"convs.{j}.bias"], stride=strides[j], padding=pads[j])
        x = F.leaky_relu(x, 0.1)
        fmap.append(x)
    w = _wn_weight(sd["conv_post.weight_v"], sd["conv_post.weight_g"])
    x = F.conv2d(x, w, sd["conv_post.bias"], padding=(1, 1))
    fmap.append(x)
    return torch.flatten(x, 1, -1), fmap


class TestPeriodDiscriminator:
    @pytest.mark.parametrize("period,t", [(3, 300), (5, 303)])  # 303: pad path
    def test_matches_torch(self, period, t):
        import torch

        from lumina_t2x_tpu.codecs.vocoder_discriminators import (
            PeriodDiscriminator, import_mpd_weights)

        rng = np.random.RandomState(period)
        sd = _rand_p_sd(rng)
        x = rng.normal(0, 0.3, (2, 1, t)).astype(np.float32)
        with torch.no_grad():
            ref_score, ref_fmap = _torch_discriminator_p(
                {k: torch.as_tensor(v) for k, v in sd.items()},
                torch.from_numpy(x), period)

        flat = import_mpd_weights({f"discriminators.0.{k}": v for k, v in sd.items()},
                                  periods=(period,))
        params = {"params": flat["params"][f"p{period}"]}
        d = PeriodDiscriminator(period, channel_mult=0.25)
        score, fmap = d.apply(params, jnp.asarray(x[:, 0]))
        np.testing.assert_allclose(np.asarray(score), ref_score.numpy(),
                                   atol=2e-4, rtol=2e-4)
        assert len(fmap) == len(ref_fmap) == 6
        for ours, ref in zip(fmap, ref_fmap):
            # ours NHWC, torch NCHW
            np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                                       ref.numpy(), atol=2e-4, rtol=2e-4)


class TestResolutionDiscriminator:
    @pytest.mark.parametrize("res", [(128, 32, 128), (256, 40, 120)])  # win<n_fft
    def test_matches_torch(self, res):
        import torch

        from lumina_t2x_tpu.codecs.vocoder_discriminators import (
            ResolutionDiscriminator, import_mrd_weights)

        rng = np.random.RandomState(res[0])
        sd = _rand_r_sd(rng)
        x = rng.normal(0, 0.3, (2, 1, 1600)).astype(np.float32)
        with torch.no_grad():
            ref_score, ref_fmap = _torch_discriminator_r(
                {k: torch.as_tensor(v) for k, v in sd.items()},
                torch.from_numpy(x), res)

        flat = import_mrd_weights({f"discriminators.0.{k}": v for k, v in sd.items()},
                                  resolutions=(res,))
        params = {"params": flat["params"][f"r{res[0]}"]}
        d = ResolutionDiscriminator(res, channel_mult=0.25)
        score, fmap = d.apply(params, jnp.asarray(x[:, 0]))
        np.testing.assert_allclose(np.asarray(score), ref_score.numpy(),
                                   atol=3e-3, rtol=2e-3)  # fft accumulation
        for ours, ref in zip(fmap, ref_fmap):
            # ours (B, F, T, C) NHWC -> (B, C, F, T) = torch NCHW
            np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                                       ref.numpy(), atol=3e-3, rtol=2e-3)


class TestLossesAndEnsembles:
    def test_losses_match_reference_formulas(self):
        from lumina_t2x_tpu.codecs.vocoder_discriminators import (
            discriminator_loss, feature_loss, generator_loss)

        rng = np.random.RandomState(0)
        dr = [jnp.asarray(rng.normal(0.9, 0.1, (2, 7)).astype(np.float32))]
        dg = [jnp.asarray(rng.normal(0.1, 0.1, (2, 7)).astype(np.float32))]
        loss, rl, gl = discriminator_loss(dr, dg)
        assert float(loss) == pytest.approx(
            float(np.mean((1 - np.asarray(dr[0])) ** 2) + np.mean(np.asarray(dg[0]) ** 2)),
            rel=1e-6)
        g, per = generator_loss(dg)
        assert float(g) == pytest.approx(float(np.mean((1 - np.asarray(dg[0])) ** 2)), rel=1e-6)
        fr = [[jnp.ones((2, 3)), jnp.zeros((2, 3))]]
        fg = [[jnp.zeros((2, 3)), jnp.zeros((2, 3))]]
        assert float(feature_loss(fr, fg)) == pytest.approx(2.0)

    def test_multi_discriminators_run_and_train(self):
        """MPD+MRD over a real generator-style setup: scores come out per
        discriminator, and one LSGAN grad step moves the disc params."""
        import optax

        from lumina_t2x_tpu.codecs.vocoder_discriminators import (
            MultiPeriodDiscriminator, MultiResolutionDiscriminator,
            discriminator_loss)

        rng = np.random.RandomState(1)
        y = jnp.asarray(rng.normal(0, 0.3, (2, 512)).astype(np.float32))
        y_hat = jnp.asarray(rng.normal(0, 0.3, (2, 512)).astype(np.float32))
        mpd = MultiPeriodDiscriminator(periods=(2, 3), channel_mult=0.125)
        mrd = MultiResolutionDiscriminator(resolutions=((128, 32, 128),),
                                           channel_mult=0.125)
        pvars = mpd.init(jax.random.PRNGKey(0), y, y_hat)
        rvars = mrd.init(jax.random.PRNGKey(1), y, y_hat)

        def dloss(pv, rv):
            sr_p, sg_p, _, _ = mpd.apply(pv, y, y_hat)
            sr_r, sg_r, _, _ = mrd.apply(rv, y, y_hat)
            lp, _, _ = discriminator_loss(sr_p, sg_p)
            lr, _, _ = discriminator_loss(sr_r, sg_r)
            return lp + lr

        loss, grads = jax.value_and_grad(dloss, argnums=(0, 1))(pvars, rvars)
        assert np.isfinite(float(loss))
        gnorm = float(optax.global_norm(grads))
        assert gnorm > 0
