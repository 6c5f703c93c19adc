"""VAE tests: shapes, posterior math, scale table, round-trip smoke, and
diffusers-format weight import structure match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.codecs.vae import (
    VAE_SCALE,
    VAE_SHIFT,
    AutoencoderKL,
    DiagonalGaussian,
    decode_from_latent,
    encode_to_latent,
    import_autoencoder_kl_weights,
)


def tiny_vae():
    return AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)


class TestShapes:
    def test_encode_decode_shapes(self):
        vae = tiny_vae()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
        variables = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
        moments = vae.apply(variables, x, method=vae.encode_moments)
        assert moments.shape == (1, 8, 16, 16)  # one downsample (2 levels)
        z = DiagonalGaussian(moments, axis=1).mode()
        assert z.shape == (1, 4, 16, 16)
        rec = vae.apply(variables, z, method=vae.decode)
        assert rec.shape == (1, 3, 32, 32)

    def test_full_sd_shape_factor8(self):
        vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 64, 64))
        variables = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
        m = vae.apply(variables, x, method=vae.encode_moments)
        assert m.shape == (1, 8, 8, 8)  # 64 / 2^3


class TestPosterior:
    def test_mode_is_mean(self):
        m = jnp.concatenate([jnp.ones((1, 4, 2, 2)), jnp.zeros((1, 4, 2, 2))], axis=1)
        post = DiagonalGaussian(m, axis=1)
        np.testing.assert_allclose(np.asarray(post.mode()), 1.0)

    def test_sample_statistics(self):
        m = jnp.concatenate([jnp.zeros((1, 4, 16, 16)), jnp.zeros((1, 4, 16, 16))], axis=1)
        post = DiagonalGaussian(m, axis=1)
        s = post.sample(jax.random.PRNGKey(0))
        assert abs(float(s.mean())) < 0.1
        assert abs(float(s.std()) - 1.0) < 0.1

    def test_kl_zero_for_standard_normal(self):
        m = jnp.zeros((2, 8, 4, 4))
        post = DiagonalGaussian(m, axis=1)
        np.testing.assert_allclose(np.asarray(post.kl()), 0.0, atol=1e-6)


class TestScaleTable:
    def test_reference_values(self):
        assert VAE_SCALE["ema"] == VAE_SCALE["mse"] == 0.18215
        assert VAE_SCALE["sdxl"] == 0.13025
        assert VAE_SCALE["sd3"] == 1.5305 and VAE_SHIFT["sd3"] == 0.0609

    def test_latent_round_trip_scaling(self):
        vae = tiny_vae()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
        variables = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
        z = encode_to_latent(vae, variables, x, jax.random.PRNGKey(3), "sd3")
        rec = decode_from_latent(vae, variables, z, "sd3")
        assert rec.shape == x.shape


class TestWeightImport:
    def _fake_diffusers_sd(self, ch=32, ch_mult=(1, 2), num_res=1, z=4):
        rng = np.random.RandomState(0)
        sd = {}

        def conv(name, i, o, k=3):
            sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.02
            sd[f"{name}.bias"] = np.zeros(o, np.float32)

        def gn(name, c):
            sd[f"{name}.weight"] = np.ones(c, np.float32)
            sd[f"{name}.bias"] = np.zeros(c, np.float32)

        def lin(name, i, o):
            sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
            sd[f"{name}.bias"] = np.zeros(o, np.float32)

        def resnet(pre, i, o, shortcut):
            gn(f"{pre}.norm1", i)
            conv(f"{pre}.conv1", i, o)
            gn(f"{pre}.norm2", o)
            conv(f"{pre}.conv2", o, o)
            if shortcut:
                conv(f"{pre}.conv_shortcut", i, o, k=1)

        def attn(pre, c):
            gn(f"{pre}.group_norm", c)
            for p in ("to_q", "to_k", "to_v"):
                lin(f"{pre}.{p}", c, c)
            lin(f"{pre}.to_out.0", c, c)

        conv("encoder.conv_in", 3, ch)
        prev = ch
        for i, mult in enumerate(ch_mult):
            out = ch * mult
            for j in range(num_res):
                resnet(f"encoder.down_blocks.{i}.resnets.{j}", prev if j == 0 else out, out,
                       shortcut=(prev != out and j == 0))
            prev = out
            if i != len(ch_mult) - 1:
                conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", out, out)
        top = ch * ch_mult[-1]
        resnet("encoder.mid_block.resnets.0", top, top, False)
        attn("encoder.mid_block.attentions.0", top)
        resnet("encoder.mid_block.resnets.1", top, top, False)
        gn("encoder.conv_norm_out", top)
        conv("encoder.conv_out", top, 2 * z)
        conv("quant_conv", 2 * z, 2 * z, k=1)
        conv("post_quant_conv", z, z, k=1)
        conv("decoder.conv_in", z, top)
        resnet("decoder.mid_block.resnets.0", top, top, False)
        attn("decoder.mid_block.attentions.0", top)
        resnet("decoder.mid_block.resnets.1", top, top, False)
        prev = top
        for bi, i in enumerate(reversed(range(len(ch_mult)))):
            out = ch * ch_mult[i]
            for j in range(num_res + 1):
                resnet(f"decoder.up_blocks.{bi}.resnets.{j}", prev if j == 0 else out, out,
                       shortcut=(prev != out and j == 0))
                prev = out
            if i != 0:
                conv(f"decoder.up_blocks.{bi}.upsamplers.0.conv", out, out)
        gn("decoder.conv_norm_out", ch * ch_mult[0])
        conv("decoder.conv_out", ch * ch_mult[0], 3)
        return sd

    def test_import_structure_matches_and_runs(self):
        sd = self._fake_diffusers_sd()
        params = import_autoencoder_kl_weights(sd, ch_mult=(1, 2), num_res_blocks=1, ch=32)
        vae = tiny_vae()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
        ref = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))["params"]

        ref_shapes = jax.tree.map(np.shape, ref)
        got_shapes = jax.tree.map(np.shape, params)
        assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes), (
            f"structure mismatch:\n{sorted(jax.tree_util.tree_flatten_with_path(ref_shapes)[0] == 0)}"
        )
        assert ref_shapes == got_shapes

        rec = vae.apply({"params": params}, x, jax.random.PRNGKey(3))[0]
        assert rec.shape == x.shape
        assert np.all(np.isfinite(np.asarray(rec)))
