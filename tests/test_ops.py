"""Kernel/op parity tests: RoPE vs complex-arithmetic reference, RMSNorm vs
numpy, masked SDPA vs naive softmax, Pallas flash attention (interpret mode)
vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.ops import (
    apply_rope,
    attention,
    default_attn_scale,
    flash_attention,
    layer_norm,
    proportional_attn_scale,
    rms_norm,
    rope_angles_1d,
    rope_angles_2d,
    rope_angles_2d_timeaware,
    sdpa,
)


# ---------------------------------------------------------------------------
# Independent complex-number reference (the reference repo's formulation,
# re-derived in numpy): freqs_cis = exp(i * pos * freq), rotation by complex
# multiply over channel pairs.
# ---------------------------------------------------------------------------


def np_freqs_cis_1d(dim, end, theta=10000.0, rope_scaling_factor=1.0, ntk_factor=1.0):
    theta = theta * ntk_factor
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    t = np.arange(end, dtype=np.float64) / rope_scaling_factor
    return np.exp(1j * np.outer(t, freqs))


def np_freqs_cis_2d(dim, end, theta=10000.0, linear_factor=1.0, ntk_factor=1.0):
    """Mirror of the reference's complex precompute (`model.py:952-961`):
    note the trailing-singleton cat + flatten INTERLEAVES h/w frequencies."""
    theta = theta * ntk_factor
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4].astype(np.float64) / dim)) / linear_factor
    t = np.arange(end, dtype=np.float64)
    fc = np.exp(1j * np.outer(t, freqs))  # (end, dim/4)
    h = np.broadcast_to(fc[:, None, :, None], (end, end, dim // 4, 1))
    w = np.broadcast_to(fc[None, :, :, None], (end, end, dim // 4, 1))
    return np.concatenate([h, w], axis=-1).reshape(end, end, dim // 2)


def np_apply_rope(x, freqs_cis):
    """x: (B, S, H, D); freqs_cis: (S, D/2) complex."""
    xc = x.astype(np.float64).reshape(*x.shape[:-1], -1, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    out = xc * freqs_cis[None, :, None, :]
    return np.stack([out.real, out.imag], axis=-1).reshape(x.shape)


class TestRope:
    def test_1d_matches_complex_reference(self):
        D, S = 16, 12
        angles = rope_angles_1d(D, jnp.arange(S))
        ref = np_freqs_cis_1d(D, S)
        np.testing.assert_allclose(np.exp(1j * np.asarray(angles)), ref, atol=1e-6)

    def test_1d_ntk_and_linear_scaling(self):
        D, S = 16, 12
        angles = rope_angles_1d(D, jnp.arange(S), ntk_factor=2.5, linear_factor=3.0)
        ref = np_freqs_cis_1d(D, S, rope_scaling_factor=3.0, ntk_factor=2.5)
        np.testing.assert_allclose(np.exp(1j * np.asarray(angles)), ref, atol=1e-6)

    def test_2d_matches_complex_reference(self):
        D, E = 8, 6
        angles = rope_angles_2d(D, E, E)
        ref = np_freqs_cis_2d(D, E)
        np.testing.assert_allclose(np.exp(1j * np.asarray(angles)), ref, atol=1e-6)

    def test_2d_axis_factorization(self):
        """Interleaved layout: even slots follow the row index, odd slots the
        column index."""
        D = 8
        a = np.asarray(rope_angles_2d(D, 5, 7))
        np.testing.assert_allclose(a[3, 0, 0::2], a[3, 4, 0::2], atol=1e-7)
        np.testing.assert_allclose(a[0, 2, 1::2], a[4, 2, 1::2], atol=1e-7)

    def test_apply_rope_matches_complex_multiply(self):
        B, S, H, D = 2, 10, 3, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
        angles = rope_angles_1d(D, jnp.arange(S))
        out = apply_rope(x, angles)
        ref = np_apply_rope(np.asarray(x), np_freqs_cis_1d(D, S))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_apply_rope_norm_preserving(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 32))
        angles = rope_angles_1d(32, jnp.arange(8))
        out = apply_rope(x, angles)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            atol=1e-5,
        )

    def test_apply_rope_bf16_island(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 16), jnp.bfloat16)
        out = apply_rope(x, rope_angles_1d(16, jnp.arange(8)))
        assert out.dtype == jnp.bfloat16

    def test_apply_rope_preserves_3d_rank(self):
        """Docstring contract: x is (..., seq, n_heads, head_dim) — a 3-D
        (seq, n_heads, head_dim) input must come back 3-D, not with a
        broadcast leading batch axis."""
        S, H, D = 10, 3, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (S, H, D))
        angles = rope_angles_1d(D, jnp.arange(S))
        out = apply_rope(x, angles)
        assert out.shape == (S, H, D)
        ref = apply_rope(x[None], angles)[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_timeaware_watershed_switch(self):
        """Below the watershed: linear scaling; above: NTK scaling
        (`model.py:944-951`)."""
        D, E = 8, 4
        lo = rope_angles_2d_timeaware(D, E, E, scale_factor=2.0, scale_watershed=0.3, timestep=0.1)
        hi = rope_angles_2d_timeaware(D, E, E, scale_factor=2.0, scale_watershed=0.3, timestep=0.9)
        ref_lo = np_freqs_cis_2d(D, E, linear_factor=2.0, ntk_factor=1.0)
        ref_hi = np_freqs_cis_2d(D, E, linear_factor=1.0, ntk_factor=2.0)
        np.testing.assert_allclose(np.exp(1j * np.asarray(lo)), ref_lo, atol=1e-6)
        np.testing.assert_allclose(np.exp(1j * np.asarray(hi)), ref_hi, atol=1e-6)

    def test_timeaware_traced_timestep(self):
        """The watershed switch must work on a traced scalar inside jit."""

        @jax.jit
        def f(t):
            return rope_angles_2d_timeaware(8, 4, 4, scale_factor=2.0, scale_watershed=0.3, timestep=t)

        np.testing.assert_allclose(np.asarray(f(0.1)), np.asarray(f(0.2)), atol=1e-7)
        assert not np.allclose(np.asarray(f(0.1)), np.asarray(f(0.9)))

    def test_per_item_angles_batch(self):
        B, S, H, D = 2, 6, 2, 8
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
        a0 = rope_angles_1d(D, jnp.arange(S))
        angles = jnp.stack([a0, a0 * 2.0])
        out = apply_rope(x, angles)
        ref0 = apply_rope(x[:1], a0)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0[0]), atol=1e-6)


class TestNorms:
    def test_rms_norm_matches_numpy(self):
        x = np.random.RandomState(0).randn(4, 7, 32).astype(np.float32)
        w = np.random.RandomState(1).rand(32).astype(np.float32)
        eps = 1e-5
        expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + eps) * w
        out = rms_norm(jnp.asarray(x), jnp.asarray(w), eps)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_rms_norm_bf16_fp32_island(self):
        x = jnp.full((2, 128), 3.0, jnp.bfloat16)
        out = rms_norm(x, jnp.ones(128))
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32), 1.0, rtol=1e-2)

    def test_layer_norm_no_affine(self):
        x = np.random.RandomState(0).randn(3, 16).astype(np.float32)
        out = layer_norm(jnp.asarray(x))
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out), (x - mu) / np.sqrt(var + 1e-6), atol=1e-5)

    def test_layer_norm_affine(self):
        x = np.random.RandomState(0).randn(3, 16).astype(np.float32)
        w = np.random.RandomState(1).rand(16).astype(np.float32)
        b = np.random.RandomState(2).rand(16).astype(np.float32)
        out = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(out), (x - mu) / np.sqrt(var + 1e-6) * w + b, atol=1e-5
        )


def naive_attention(q, k, v, kv_mask=None, scale=None):
    q, k, v = np.asarray(q, np.float64), np.asarray(k, np.float64), np.asarray(v, np.float64)
    b, sq, hq, d = q.shape
    _, sk, hkv, _ = k.shape
    rep = hq // hkv
    k = np.repeat(k, rep, axis=2)
    v = np.repeat(v, rep, axis=2)
    scale = scale if scale is not None else 1.0 / np.sqrt(d)
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if kv_mask is not None:
        logits = np.where(np.asarray(kv_mask, bool)[:, None, None, :], logits, -1e9)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


class TestSDPA:
    def test_matches_naive(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 4, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 4, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 4, 16))
        np.testing.assert_allclose(np.asarray(sdpa(q, k, v)), naive_attention(q, k, v), atol=1e-5)

    def test_gqa(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 8, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 2, 16))
        np.testing.assert_allclose(np.asarray(sdpa(q, k, v)), naive_attention(q, k, v), atol=1e-5)

    def test_key_mask(self):
        """Masked keys must not influence the output at all."""
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 2, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 2, 8))
        mask = jnp.array([[1, 1, 1, 1, 1, 0, 0, 0]])
        out_masked = sdpa(q, k, v, kv_mask=mask)
        out_trunc = sdpa(q, k[:, :5], v[:, :5])
        np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc), atol=1e-5)

    def test_custom_scale(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 2, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 2, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 2, 8))
        s = proportional_attn_scale(4096, 1024, 8)
        np.testing.assert_allclose(
            np.asarray(sdpa(q, k, v, scale=s)), naive_attention(q, k, v, scale=s), atol=1e-5
        )

    def test_cross_attention_shape(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 13, 4, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 13, 4, 16))
        assert sdpa(q, k, v).shape == (2, 64, 4, 16)

    def test_proportional_scale_values(self):
        assert abs(proportional_attn_scale(1024, 1024, 64) - default_attn_scale(64)) < 1e-9
        assert proportional_attn_scale(4096, 1024, 64) > default_attn_scale(64)


class TestFlashAttention:
    """Pallas kernel in interpret mode vs the XLA path."""

    def test_matches_sdpa(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 130, 2, 32))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 130, 2, 32))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 130, 2, 32))
        out = flash_attention(q, k, v)
        ref = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_mask(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 2, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 100, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 100, 2, 16))
        mask = jnp.zeros((2, 100), jnp.int32).at[:, :77].set(1)
        out = flash_attention(q, k, v, kv_mask=mask)
        ref = sdpa(q, k, v, kv_mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_gqa(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 8, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 2, 16))
        out = flash_attention(q, k, v)
        ref = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_custom_scale(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 2, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 2, 16))
        s = proportional_attn_scale(4096, 1024, 16)
        out = flash_attention(q, k, v, scale=s)
        ref = sdpa(q, k, v, scale=s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_grad_flows(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 2, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 2, 8))

        g_flash = jax.grad(lambda qq: flash_attention(qq, k, v).sum())(q)
        g_ref = jax.grad(lambda qq: sdpa(qq, k, v).sum())(q)
        np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_ref), atol=2e-3)

    def test_attention_dispatcher_cpu(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 8))
        out = attention(q, q, q, impl="auto")
        assert out.shape == q.shape


class TestAnagramAttentionTricks:
    def test_anagram_scale_formula(self):
        from lumina_t2x_tpu.ops.attention import anagram_attn_scale

        import math
        assert abs(anagram_attn_scale(4096, 1024, 64) - math.log(4096, 1024) / 8) < 1e-9

    def test_pool_kv_identity_ratio1(self):
        from lumina_t2x_tpu.ops.attention import pool_kv_2d

        k = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 8))
        k2, v2 = pool_kv_2d(k, k, 4, 4, 1)
        np.testing.assert_allclose(np.asarray(k2), np.asarray(k))

    def test_pool_kv_downsamples(self):
        from lumina_t2x_tpu.ops.attention import pool_kv_2d

        k = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1, 1)
        k2, _ = pool_kv_2d(k, k, 4, 4, 2)
        assert k2.shape == (1, 4, 1, 1)
        # first pooled cell = mean of grid[(0,0),(0,1),(1,0),(1,1)] = mean(0,1,4,5)
        np.testing.assert_allclose(float(k2[0, 0, 0, 0]), 2.5)

    def test_pooled_attention_runs(self):
        from lumina_t2x_tpu.ops.attention import pool_kv_2d, sdpa

        q = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 2, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 2, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 2, 8))
        kp, vp = pool_kv_2d(k, v, 8, 8, 2)
        out = sdpa(q, kp, vp)
        assert out.shape == q.shape


class TestFlashBackwardKernels:
    """Fused Pallas backward vs XLA-autodiff gradients (interpret mode)."""

    def _grads(self, fn, q, k, v):
        def loss(qq, kk, vv):
            w = jnp.sin(jnp.arange(np.prod(q.shape), dtype=jnp.float32)).reshape(q.shape)
            return jnp.sum(fn(qq, kk, vv) * w)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def test_dq_dk_dv_match_sdpa(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 96, 4, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 4, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 96, 4, 16))
        gf = self._grads(lambda a, b, c: flash_attention(a, b, c), q, k, v)
        gr = self._grads(lambda a, b, c: sdpa(a, b, c), q, k, v)
        for a, b, name in zip(gf, gr, "q k v".split()):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                       err_msg=f"d{name}")

    def test_bwd_with_mask(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 2, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 2, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 2, 8))
        mask = jnp.zeros((1, 64), jnp.int32).at[:, :40].set(1)
        gf = self._grads(lambda a, b, c: flash_attention(a, b, c, kv_mask=mask), q, k, v)
        gr = self._grads(lambda a, b, c: sdpa(a, b, c, kv_mask=mask), q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
        # masked keys receive zero dk/dv
        np.testing.assert_allclose(np.asarray(gf[1][:, 40:]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gf[2][:, 40:]), 0.0, atol=1e-6)

    def test_fused_single_sweep_matches_two_kernel(self):
        """_flash_bwd_fused_impl (one sweep, dQ via per-kv-block partials +
        XLA sum) must match _flash_bwd_impl (separate dQ and dK/dV kernels)
        across multiple kv AND q blocks, GQA, and a masked tail."""
        from lumina_t2x_tpu.ops.flash_attention import (
            _flash_bwd_fused_impl, _flash_bwd_impl, _flash_fwd_res_impl)

        q = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 4, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 384, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 384, 2, 16))
        g = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 4, 16))
        mask = jnp.ones((2, 384), jnp.int32).at[1, 300:].set(0)
        out, lse = _flash_fwd_res_impl(q, k, v, mask, 0.25, 128, 128)
        a = _flash_bwd_fused_impl(q, k, v, mask, out, lse, g, 0.25, 128, 128)
        b = _flash_bwd_impl(q, k, v, mask, out, lse, g, 0.25, 128, 128)
        for x, y, name in zip(a, b, "q k v".split()):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5,
                                       err_msg=f"d{name}")

    def test_bwd_gqa_group_sum(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 2, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 2, 8))
        gf = self._grads(lambda a, b, c: flash_attention(a, b, c), q, k, v)
        gr = self._grads(lambda a, b, c: sdpa(a, b, c), q, k, v)
        assert gf[1].shape == k.shape
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    def test_bwd_custom_scale(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 2, 8))
        s = 0.37
        gf = self._grads(lambda a, b, c: flash_attention(a, b, c, scale=s), q, q, q)
        gr = self._grads(lambda a, b, c: sdpa(a, b, c, scale=s), q, q, q)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    def test_fwd_res_lse_values(self):
        from lumina_t2x_tpu.ops.flash_attention import _flash_fwd_res_impl

        q = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 2, 8))
        mask = jnp.ones((1, 32), jnp.int32)
        out, lse = _flash_fwd_res_impl(q, q, q, mask, 0.35355, 32, 32)
        # reference lse
        logits = np.einsum("bqhd,bkhd->bhqk", np.asarray(q, np.float64),
                           np.asarray(q, np.float64)) * 0.35355
        ref_lse = np.log(np.exp(logits).sum(-1))  # (b, h, q)
        np.testing.assert_allclose(np.asarray(lse[..., 0]), ref_lse, atol=1e-4)


class TestFlashKernelDispatch:
    """Dispatch between the single-pass small-KV kernel (Sk <= _SMALL_KV_MAX
    == 1024) and the online-softmax streaming kernel, plus the static-max
    opt-in."""

    def test_small_kv_path_selected(self, monkeypatch):
        import importlib

        fa = importlib.import_module("lumina_t2x_tpu.ops.flash_attention")
        calls = {}
        orig = fa._flash_small_kv_impl

        def spy(*a, **kw):
            calls["small"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(fa, "_flash_small_kv_impl", spy)
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 2, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 2, 16))
        fa.flash_attention(q, k, k)
        assert calls.get("small")
        calls.clear()
        k2 = jax.random.normal(jax.random.PRNGKey(2), (1, 1100, 2, 16))
        out = fa.flash_attention(q, k2, k2)
        assert not calls.get("small")  # > _SMALL_KV_MAX -> streaming kernel
        ref = sdpa(q, k2, k2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_large_kv_multi_block_matches_sdpa(self):
        """The streaming fused-sum kernel (_flash_kernel_fused_sum) across
        SEVERAL kv blocks vs sdpa. Goes through _flash_attention_fwd_impl
        with explicit small blocks: the public API sends Sk <= 1024 to the
        single-pass kernel, and the default block_k (2048) would otherwise
        cover this whole KV in one block — either way the multi-block
        denominator rescale (acc[:, d] *= alpha) would go untested."""
        from lumina_t2x_tpu.ops.flash_attention import _flash_attention_fwd_impl

        q = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 2, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 1280, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 1280, 2, 16))
        mask = jnp.ones((1, 1280), jnp.int32).at[:, 1200:].set(0)
        out = _flash_attention_fwd_impl(q, k, v, mask, 0.25, 128, 256)
        ref = sdpa(q, k, v, kv_mask=mask, scale=0.25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_small_kv_gqa_mask_scale(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 80, 8, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 2, 16))
        mask = jnp.ones((2, 48), jnp.int32).at[1, 30:].set(0)
        s = proportional_attn_scale(4096, 1024, 16)
        out = flash_attention(q, k, v, kv_mask=mask, scale=s)
        ref = sdpa(q, k, v, kv_mask=mask, scale=s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_fully_masked_rows_finite(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 2, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 2, 16))
        mask = jnp.zeros((1, 32), jnp.int32)
        out = flash_attention(q, k, k, kv_mask=mask)
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    def test_static_max_env(self, monkeypatch):
        """LUMINA_FLASH_STATIC_MAX drops the online max; results must match
        the default kernel for bounded logits (docstring contract). The bound
        is a static jit argument (part of the cache key), so both variants can
        run at identical block sizes without stale-cache aliasing."""
        import importlib

        fa = importlib.import_module("lumina_t2x_tpu.ops.flash_attention")
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 640, 2, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 640, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 640, 2, 16))
        mask = jnp.ones((1, 640), jnp.int32).at[:, 600:].set(0)
        ref = fa._flash_attention_fwd_impl(q, k, v, mask, 0.25, 128, 128)
        out = fa._flash_attention_fwd_impl(q, k, v, mask, 0.25, 128, 128,
                                           static_max=8.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
        # env plumbing: the public dispatch reads the bound per call
        assert fa._static_max_bound() is None
        monkeypatch.setenv("LUMINA_FLASH_STATIC_MAX", "8.0")
        assert fa._static_max_bound() == 8.0

    @pytest.mark.parametrize("static_max", [None, 8.0])
    def test_rowsum_denominator_matches_ones(self, monkeypatch, static_max):
        """At >= 3 batch rows the kernels switch to the in-kernel VPU
        row-sum denominator (no V ones-column concat — the B>1 regression
        fix); both modes and both kernel families must agree with sdpa and
        with each other."""
        import importlib

        fa = importlib.import_module("lumina_t2x_tpu.ops.flash_attention")
        b = 4
        q = jax.random.normal(jax.random.PRNGKey(0), (b, 640, 2, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, 640, 2, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, 640, 2, 16))
        mask = jnp.ones((b, 640), jnp.int32).at[:, 600:].set(0)

        assert fa._denom_fused_ones(2) and not fa._denom_fused_ones(4)
        monkeypatch.setenv("LUMINA_FLASH_DENOM", "ones")
        assert fa._denom_fused_ones(4)
        monkeypatch.setenv("LUMINA_FLASH_DENOM", "rowsum")
        assert not fa._denom_fused_ones(1)
        monkeypatch.delenv("LUMINA_FLASH_DENOM")
        # explicit static fused_ones: part of the jit cache key, so both
        # modes genuinely execute in one process
        ones = fa._flash_attention_fwd_impl(q, k, v, mask, 0.25, 128, 128,
                                            static_max=static_max,
                                            fused_ones=True)
        rowsum = fa._flash_attention_fwd_impl(q, k, v, mask, 0.25, 128, 128,
                                              static_max=static_max,
                                              fused_ones=False)
        np.testing.assert_allclose(np.asarray(rowsum), np.asarray(ones),
                                   atol=2e-3)
        ref = sdpa(q, k, v, kv_mask=mask, scale=0.25)
        np.testing.assert_allclose(np.asarray(rowsum), np.asarray(ref), atol=2e-3)

        # residual family: out AND lse agree between modes
        o1, l1 = fa._flash_fwd_res_impl(q, k, v, mask, 0.25, 128, 128,
                                        static_max=static_max, fused_ones=True)
        o2, l2 = fa._flash_fwd_res_impl(q, k, v, mask, 0.25, 128, 128,
                                        static_max=static_max, fused_ones=False)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-3)
        np.testing.assert_allclose(np.asarray(l2[:, :, :640, 0]),
                                   np.asarray(l1[:, :, :640, 0]),
                                   atol=2e-3, rtol=1e-4)


class TestFlashCrossAttention:
    """Sq != Sk (caption cross-attention shapes) through the Pallas kernel."""

    def test_cross_shapes_match_sdpa(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 4, 16))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 4, 16))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 4, 16))
        mask = jnp.ones((2, 24), jnp.int32).at[:, 17:].set(0)
        out = flash_attention(q, k, v, kv_mask=mask)
        ref = sdpa(q, k, v, kv_mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_cross_backward(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 4, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 4, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 4, 8))
        gf = jax.grad(lambda kk: flash_attention(q, kk, v).sum())(k)
        gr = jax.grad(lambda kk: sdpa(q, kk, v).sum())(k)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-3)

    def test_cross_gqa(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 48, 8, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 2, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 2, 8))
        out = flash_attention(q, k, v)
        ref = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


class TestFusedRopeFlashAttention:
    """flash_attention_rope(q, k, v, angles) must equal
    flash_attention(apply_rope(q), apply_rope(k), v) exactly."""

    def _inputs(self, s=96, h=4, d=16, hkv=None):
        hkv = hkv or h
        q = jax.random.normal(jax.random.PRNGKey(0), (2, s, h, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, s, hkv, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, s, hkv, d))
        angles = rope_angles_1d(d, jnp.arange(s))
        return q, k, v, angles

    def test_forward_parity(self):
        from lumina_t2x_tpu.ops.flash_attention import flash_attention_rope

        q, k, v, angles = self._inputs()
        out = flash_attention_rope(q, k, v, angles)
        ref = flash_attention(apply_rope(q, angles), apply_rope(k, angles), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_forward_parity_2d_angles_and_mask(self):
        from lumina_t2x_tpu.ops.flash_attention import flash_attention_rope

        q, k, v, _ = self._inputs(s=64, d=8)
        angles = rope_angles_2d(8, 8, 8).reshape(64, 4)
        mask = jnp.ones((2, 64), jnp.int32).at[:, 50:].set(0)
        out = flash_attention_rope(q, k, v, angles, kv_mask=mask)
        ref = sdpa(apply_rope(q, angles), apply_rope(k, angles), v, kv_mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_gqa(self):
        from lumina_t2x_tpu.ops.flash_attention import flash_attention_rope

        q, k, v, angles = self._inputs(s=64, h=8, d=8, hkv=2)
        out = flash_attention_rope(q, k, v, angles)
        ref = sdpa(apply_rope(q, angles), apply_rope(k, angles), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_gradients(self):
        from lumina_t2x_tpu.ops.flash_attention import flash_attention_rope

        q, k, v, angles = self._inputs(s=32, d=8)
        w = jnp.sin(jnp.arange(np.prod(q.shape), dtype=jnp.float32)).reshape(q.shape)

        def loss_fused(qq, kk, vv):
            return jnp.sum(flash_attention_rope(qq, kk, vv, angles) * w)

        def loss_ref(qq, kk, vv):
            return jnp.sum(sdpa(apply_rope(qq, angles), apply_rope(kk, angles), vv) * w)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                       err_msg=f"d{name}")

    def test_traced_scale_folds_into_q(self):
        """Under nn.remat, python-float attn_scale args become 0-d tracers;
        flash_attention must fold such a scale into q instead of failing on
        float(tracer)."""
        from lumina_t2x_tpu.ops.flash_attention import flash_attention

        q, k, v, _ = self._inputs(s=64, d=8)

        @jax.jit
        def f(q, k, v, s):
            return flash_attention(q, k, v, scale=s)

        out = f(q, k, v, jnp.float32(0.21))
        ref = sdpa(q, k, v, scale=0.21)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_rotate_q_only_cross_attn(self):
        """rotate_k=False: q rotated in-kernel, caption keys untouched —
        matches sdpa(apply_rope(q), yk, yv) with a shorter KV length."""
        from lumina_t2x_tpu.ops.flash_attention import flash_attention_rope

        q, _, _, angles = self._inputs(s=96, h=4, d=16)
        yk = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 4, 16))
        yv = jax.random.normal(jax.random.PRNGKey(4), (2, 24, 4, 16))
        y_mask = jnp.ones((2, 24), jnp.int32).at[1, 10:].set(0)
        out = flash_attention_rope(q, yk, yv, angles, kv_mask=y_mask, rotate_k=False)
        ref = sdpa(apply_rope(q, angles), yk, yv, kv_mask=y_mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    def test_rotate_q_only_gradients(self):
        from lumina_t2x_tpu.ops.flash_attention import flash_attention_rope

        q, _, _, angles = self._inputs(s=32, d=8)
        yk = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 4, 8))
        yv = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 4, 8))
        w = jnp.cos(jnp.arange(np.prod(q.shape), dtype=jnp.float32)).reshape(q.shape)

        def loss_fused(qq, kk, vv):
            return jnp.sum(flash_attention_rope(qq, kk, vv, angles, rotate_k=False) * w)

        def loss_ref(qq, kk, vv):
            return jnp.sum(sdpa(apply_rope(qq, angles), kk, vv) * w)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, yk, yv)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, yk, yv)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                       err_msg=f"d{name}")
