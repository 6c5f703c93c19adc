"""Audio/music subsystem tests: FlagDiT-1D, CFM math, 1-D VAE, BigVGAN
pieces, LDM scaffold utilities, end-to-end tiny generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.codecs.vae1d import AutoencoderKL1D
from lumina_t2x_tpu.codecs.vocoder import (
    BigVGAN,
    SnakeBeta,
    VocoderBigVGAN,
    downsample2_fir,
    kaiser_sinc_filter1d,
    upsample2_fir,
)
from lumina_t2x_tpu.models.flag_dit_1d import FlagDiT1D
from lumina_t2x_tpu.pipelines.audio import (
    ddim_sample,
    extract_into_tensor,
    generate_audio,
    get_obj_from_str,
    instantiate_from_config,
    lambda_linear_schedule,
    make_beta_schedule,
    make_ddim_timesteps,
)
from lumina_t2x_tpu.transport.cfm import CFM


def tiny_dit1d(**kw):
    kw.setdefault("in_channels", 20)
    kw.setdefault("context_dim", 32)
    kw.setdefault("hidden_size", 64)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 4)
    kw.setdefault("multiple_of", 16)
    kw.setdefault("attn_impl", "xla")
    return FlagDiT1D(**kw)


class TestFlagDiT1D:
    def test_forward_shape(self):
        model = tiny_dit1d()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 16))
        t = jnp.array([100.0, 500.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
        params = model.init(jax.random.PRNGKey(0), x, t, ctx)
        out = model.apply(params, x, t, ctx)
        assert out.shape == x.shape

    def test_zero_init_output(self):
        """FlagDiTv2 zero-init: output exactly zero at init."""
        model = tiny_dit1d()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 20, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32))
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([10.0]), ctx)
        out = model.apply(params, x, jnp.array([10.0]), ctx)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_context_changes_output(self):
        model = tiny_dit1d()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 20, 8))
        c1 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32))
        c2 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32))
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([10.0]), c1)
        params = jax.tree.map(
            lambda a: a + 0.02 * np.random.RandomState(0).standard_normal(a.shape).astype(np.float32),
            params,
        )
        o1 = model.apply(params, x, jnp.array([10.0]), c1)
        o2 = model.apply(params, x, jnp.array([10.0]), c2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestCFM:
    def test_interpolant_endpoints(self):
        """x_t at t=N is x1; at t=0 it is x0 (sigma_min-shrunk)."""
        cfm = CFM(sigma_min=1e-4, num_timesteps=1000)
        x1 = jnp.ones((2, 3, 4))

        captured = {}

        def model_fn(x_noisy, t):
            captured["x"] = x_noisy
            return jnp.zeros_like(x_noisy)

        out = cfm.p_losses(jax.random.PRNGKey(0), model_fn, x1, t=jnp.array([1000, 1000]))
        np.testing.assert_allclose(np.asarray(captured["x"]), np.asarray(x1), atol=1e-3)

    def test_loss_of_oracle_is_zero(self):
        cfm = CFM()
        x1 = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 8))
        # oracle velocity needs x0; check E||ut||^2 magnitude for zero model
        out = cfm.p_losses(jax.random.PRNGKey(0), lambda x, t: jnp.zeros_like(x), x1)
        assert 1.0 < float(out["loss"]) < 3.5  # E||x1 - x0||^2 = 2 per coord

    def test_sample_zero_field_is_identityish(self):
        cfm = CFM()
        out = cfm.sample(jax.random.PRNGKey(0), lambda x, t: jnp.zeros_like(x), (1, 2, 4),
                         num_steps=5)
        assert out.shape == (1, 2, 4)

    def test_sample_cfg_matches_manual_guidance(self):
        cfm = CFM()
        cond = jnp.ones((1, 3, 2))
        uncond = jnp.zeros((1, 3, 2))

        def model_fn(x, t, ctx):
            # velocity = mean of context -> cond rows 1, uncond rows 0
            return jnp.ones_like(x) * ctx.mean(axis=(1, 2), keepdims=True)[:, :, None][..., 0]

        out = cfm.sample_cfg(jax.random.PRNGKey(0), model_fn, (1, 4, 8), cond, uncond,
                             guidance_scale=3.0, num_steps=3)
        # guided velocity = 0 + 3*(1-0) = 3 everywhere; x(1) = x0 + 3
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0) + 3.0, atol=1e-4)

    def test_t_start_truncation(self):
        cfm = CFM()
        x_lat = jnp.zeros((1, 2, 2))
        out = cfm.sample(jax.random.PRNGKey(0), lambda x, t: jnp.ones_like(x), (1, 2, 2),
                         num_steps=5, t_start=2, x_latent=x_lat)
        # remaining time = 1 - 2/4 = 0.5 -> x = 0.5
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


class TestVAE1D:
    def test_shapes(self):
        vae = AutoencoderKL1D(mel_bins=16, embed_dim=4, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, z_channels=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32))
        variables = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
        m = vae.apply(variables, x, method=vae.encode_moments)
        assert m.shape == (1, 8, 16)  # one downsample
        rec = vae.apply(variables, m[:, :4], method=vae.decode)
        assert rec.shape == (1, 16, 32)


class TestVocoder:
    def test_fir_dc_gain(self):
        f = kaiser_sinc_filter1d(0.25, 0.3, 12)
        np.testing.assert_allclose(f.sum(), 1.0, atol=1e-6)

    def test_up_down_roundtrip_preserves_lowfreq(self):
        t = np.arange(128)
        x = np.sin(2 * np.pi * t / 64).astype(np.float32)[None, :, None]
        y = downsample2_fir(upsample2_fir(jnp.asarray(x)))
        err = np.abs(np.asarray(y)[0, 20:-20, 0] - x[0, 20:-20, 0]).max()
        assert err < 0.05

    def test_snake_zero_alpha_is_identity_plus_sin2(self):
        layer = SnakeBeta(4)
        x = jnp.ones((1, 8, 4))
        params = layer.init(jax.random.PRNGKey(0), x)
        out = layer.apply(params, x)
        # alpha=beta=e^0=1: x + sin^2(x)
        np.testing.assert_allclose(np.asarray(out), 1 + np.sin(1.0) ** 2, atol=1e-5)

    def test_generator_upsamples(self):
        voc = BigVGAN(mel_bins=8, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
                      upsample_initial_channel=32, resblock_kernel_sizes=(3,),
                      resblock_dilation_sizes=((1, 3),))
        mel = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
        variables = voc.init(jax.random.PRNGKey(1), mel)
        wav = voc.apply(variables, mel)
        assert wav.shape == (1, 64)  # 16 * 2 * 2
        assert np.abs(np.asarray(wav)).max() <= 1.0

    def test_wrapper(self):
        voc = VocoderBigVGAN.create(mel_bins=8, upsample_rates=(2,),
                                    upsample_kernel_sizes=(4,),
                                    upsample_initial_channel=16,
                                    resblock_kernel_sizes=(3,),
                                    resblock_dilation_sizes=((1,),))
        wav = voc.vocode(np.zeros((8, 8), np.float32))
        assert wav.shape == (1, 16)


class TestLDMScaffold:
    def test_beta_schedules(self):
        for s in ("linear", "cosine", "sqrt_linear", "sqrt"):
            betas = make_beta_schedule(s, 100)
            assert betas.shape == (100,)
            assert (betas >= 0).all() and (betas <= 1).all()

    def test_ddim_timesteps(self):
        ts = make_ddim_timesteps("uniform", 10, 1000)
        assert len(ts) == 10 and ts[0] == 1

    def test_extract_into_tensor(self):
        a = np.arange(10, dtype=np.float32)
        out = extract_into_tensor(a, jnp.array([2, 5]), (2, 3, 4))
        assert out.shape == (2, 1, 1)
        assert float(out[1, 0, 0]) == 5.0

    def test_ddim_sampler_runs(self):
        out = ddim_sample(jax.random.PRNGKey(0), lambda x, t: jnp.zeros_like(x),
                          (1, 2, 4, 4), num_steps=5)
        assert out.shape == (1, 2, 4, 4)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_instantiate_from_config(self):
        obj = instantiate_from_config(
            {"target": "lumina_t2x_tpu.transport.cfm.CFM", "params": {"sigma_min": 0.001}}
        )
        assert obj.sigma_min == 0.001

    def test_lambda_linear_schedule(self):
        f = lambda_linear_schedule(10, 0.0, 1.0, 0.001, 100)
        assert float(f(0)) < 0.01
        np.testing.assert_allclose(float(f(10)), 0.9, atol=0.05)

    def test_lambda_linear_schedule_cycles_match_reference(self):
        """Multi-cycle semantics vs a direct transliteration of the
        reference's LambdaLinearScheduler (`models/lr_scheduler.py:85-104`)."""
        wu, fmn, fmx, fst, cl = [10, 5], [0.1, 0.0], [1.0, 0.5], [0.01, 0.2], [100, 50]
        cum = np.cumsum([0] + cl)

        def ref(n):
            cycle = next(i for i, c in enumerate(cum[1:]) if n <= c)
            n = n - cum[cycle]
            if n < wu[cycle]:
                return (fmx[cycle] - fst[cycle]) / wu[cycle] * n + fst[cycle]
            return fmn[cycle] + (fmx[cycle] - fmn[cycle]) * (cl[cycle] - n) / cl[cycle]

        f = lambda_linear_schedule(wu, fmn, fmx, fst, cl)
        for n in [0, 3, 9, 10, 11, 60, 99, 100, 101, 104, 105, 106, 130, 149]:
            np.testing.assert_allclose(float(f(n)), ref(n), rtol=1e-6,
                                       err_msg=f"step {n}")


class TestEndToEnd:
    def test_generate_audio_tiny(self):
        model = tiny_dit1d()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), ctx)

        def denoiser_fn(xx, tt, cc):
            return model.apply(params, xx, tt, cc)

        vae = AutoencoderKL1D(mel_bins=16, embed_dim=20, ch=32, ch_mult=(1,),
                              num_res_blocks=1, z_channels=20)
        vv = vae.init(jax.random.PRNGKey(2),
                      jnp.zeros((1, 16, 8)), jax.random.PRNGKey(3))
        vae_decode = lambda z: vae.apply(vv, z, method=vae.decode)

        mel, wav = generate_audio(
            jax.random.PRNGKey(4), denoiser_fn, vae_decode, None,
            cond=ctx[:1], uncond=ctx[1:], latent_shape=(1, 20, 8),
            guidance_scale=3.0, num_steps=3,
        )
        assert mel.shape == (1, 16, 8)
        assert np.all(np.isfinite(np.asarray(mel)))


class TestVQModel1D:
    def test_roundtrip_shapes_and_loss(self):
        from lumina_t2x_tpu.codecs.vae1d import VQModel1D

        vq = VQModel1D(mel_bins=16, embed_dim=4, n_embed=32, ch=32, ch_mult=(1, 2),
                       num_res_blocks=1, z_channels=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
        variables = vq.init(jax.random.PRNGKey(1), x)
        rec, idx, loss = vq.apply(variables, x)
        assert rec.shape == x.shape
        assert idx.shape == (2, 16)  # one downsample
        assert float(loss) >= 0

    def test_straight_through_gradient(self):
        from lumina_t2x_tpu.codecs.vae1d import VectorQuantizer

        vq = VectorQuantizer(n_embed=8, embed_dim=4)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 4))
        params = vq.init(jax.random.PRNGKey(1), z)

        def f(zz):
            z_q, _, _ = vq.apply(params, zz)
            return jnp.sum(z_q**2)

        g = jax.grad(f)(z)
        assert np.any(np.asarray(g) != 0)  # straight-through passes grads

    def test_vq_importer_structure(self):
        """`import_vq_model_1d_weights` maps a CompVis/taming-named VQModel
        state dict (incl. `quantize.embedding.weight`) onto a param tree the
        flax module accepts; the codebook round-trips exactly. Encoder/
        decoder numeric parity is pinned by the KL test (same blocks); the
        reference's own VQModel cannot instantiate as shipped (taming import
        commented out, `autoencoder1d.py:10`), so the state-dict names are
        synthesized here."""
        from lumina_t2x_tpu.codecs.vae1d import (VQModel1D,
                                                 import_vq_model_1d_weights)

        mel, z, embed, ch, ch_mult, nrb = 16, 4, 4, 32, (1, 2), 1
        vq = VQModel1D(mel_bins=mel, embed_dim=embed, n_embed=32, ch=ch,
                       ch_mult=ch_mult, num_res_blocks=nrb, z_channels=z)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, mel, 32))
        init = vq.init(jax.random.PRNGKey(1), x)["params"]

        rng = np.random.RandomState(7)

        def conv_sd(sd, name, p):
            sd[f"{name}.weight"] = rng.randn(*np.asarray(
                p["kernel"]).transpose(2, 1, 0).shape).astype(np.float32) * 0.05
            if "bias" in p:
                sd[f"{name}.bias"] = rng.randn(*p["bias"].shape).astype(np.float32)

        def gn_sd(sd, name, p):
            sd[f"{name}.weight"] = rng.randn(*p["scale"].shape).astype(np.float32)
            sd[f"{name}.bias"] = rng.randn(*p["bias"].shape).astype(np.float32)

        def walk(sd, flax_name, torch_name, p):
            if "kernel" in p:
                conv_sd(sd, torch_name, p)
            elif "scale" in p:
                gn_sd(sd, torch_name, p)
            else:
                for k, v in p.items():
                    walk(sd, k, f"{torch_name}.{k}", v)

        sd = {}
        for half, tpre in (("encoder", "encoder"), ("decoder", "decoder")):
            for k, v in init[half].items():
                # flax name down_0_block_1 -> torch down.0.block.1, etc.
                parts = k.split("_")
                if parts[0] in ("down", "up"):
                    tname = f"{tpre}." + ".".join(parts)
                elif parts[0] == "mid":
                    tname = f"{tpre}.mid.{'_'.join(parts[1:])}"
                else:
                    tname = f"{tpre}.{k}"
                walk(sd, k, tname, v)
        conv_sd(sd, "quant_conv", init["quant_conv"])
        conv_sd(sd, "post_quant_conv", init["post_quant_conv"])
        sd["quantize.embedding.weight"] = rng.randn(32, embed).astype(np.float32)

        params = import_vq_model_1d_weights(sd, ch_mult=ch_mult,
                                            num_res_blocks=nrb,
                                            attn_layers=(), down_layers=(0,))
        np.testing.assert_array_equal(params["quantize"]["embedding"],
                                      sd["quantize.embedding.weight"])
        rec, idx, loss = vq.apply({"params": params}, x)
        assert rec.shape == x.shape and np.isfinite(np.asarray(rec)).all()
        # the imported codebook actually drives quantization
        assert int(np.asarray(idx).max()) < 32


class TestAudioTrainer:
    def test_synthetic_training_runs(self, tmp_path):
        from lumina_t2x_tpu.pipelines.train_audio import main

        state = main([
            "--task", "music",
            "--data_path", "synthetic://",
            "--results_dir", str(tmp_path),
            "--latent_channels", "8", "--latent_length", "16",
            "--context_dim", "16", "--context_len", "4",
            "--hidden_size", "32", "--depth", "1", "--num_heads", "4",
            "--global_batch_size", "8",
            "--max_steps", "2", "--log_every", "1", "--ckpt_every", "2",
            "--precision", "fp32",
        ])
        assert int(state.step) == 2
        assert (tmp_path / "music" / "checkpoints" / "0000002").exists()

    def test_async_save_and_retention(self, tmp_path):
        from lumina_t2x_tpu.pipelines.train_audio import main

        main([
            "--task", "music",
            "--data_path", "synthetic://",
            "--results_dir", str(tmp_path),
            "--latent_channels", "8", "--latent_length", "16",
            "--context_dim", "16", "--context_len", "4",
            "--hidden_size", "32", "--depth", "1", "--num_heads", "4",
            "--global_batch_size", "8",
            "--max_steps", "3", "--log_every", "1", "--ckpt_every", "1",
            "--precision", "fp32", "--async_save", "--keep_last", "1",
        ])
        base = tmp_path / "music" / "checkpoints"
        assert sorted(p.name for p in base.iterdir()) == ["0000003"]
        assert (base / "0000003" / "resume_step.txt").exists()

    def test_npy_data_pipeline(self, tmp_path):
        import numpy as np

        from lumina_t2x_tpu.pipelines.train_audio import npy_audio_batches, parse_args

        (tmp_path / "latents").mkdir()
        (tmp_path / "captions").mkdir()
        for i in range(3):
            np.save(tmp_path / "latents" / f"{i}.npy",
                    np.random.randn(8, 10).astype(np.float32))
            np.save(tmp_path / "captions" / f"{i}.npy",
                    np.random.randn(3, 16).astype(np.float32))
        args = parse_args([
            "--data_path", str(tmp_path), "--latent_channels", "8",
            "--latent_length", "16", "--context_dim", "16", "--context_len", "4",
            "--global_batch_size", "4",
        ])
        batch = next(npy_audio_batches(args))
        assert batch["x"].shape == (4, 8, 16)  # padded to latent_length
        assert batch["context"].shape == (4, 4, 16)
