"""Model tests: shapes, jit, zero-init identity properties, CFG behavior,
variable-aspect list path, scan vs loop equivalence."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.models import get_model
from lumina_t2x_tpu.models.flag_dit import FlagDiT
from lumina_t2x_tpu.models.next_dit import NextDiT, forward_with_cfg
from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet
from lumina_t2x_tpu.models.next_dit_imagenet import forward_with_cfg as forward_with_cfg_imagenet


def tiny_next_dit(**kw):
    kw.setdefault("dim", 64)
    kw.setdefault("n_layers", 2)
    kw.setdefault("n_heads", 4)
    kw.setdefault("multiple_of", 16)
    kw.setdefault("cap_feat_dim", 32)
    kw.setdefault("attn_impl", "xla")
    return NextDiT(**kw)


def tiny_imagenet(**kw):
    kw.setdefault("dim", 64)
    kw.setdefault("n_layers", 2)
    kw.setdefault("n_heads", 4)
    kw.setdefault("multiple_of", 16)
    kw.setdefault("num_classes", 10)
    kw.setdefault("attn_impl", "xla")
    return NextDiTImageNet(**kw)


def make_inputs(b=2, c=4, h=16, w=16, ly=7, cap_dim=32):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (b, c, h, w))
    t = jnp.linspace(0.1, 0.9, b)
    cap = jax.random.normal(jax.random.PRNGKey(1), (b, ly, cap_dim))
    mask = jnp.ones((b, ly), jnp.int32).at[:, 5:].set(0)
    return x, t, cap, mask


class TestNextDiT:
    def test_forward_shape(self):
        model = tiny_next_dit()
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        out = model.apply(params, x, t, cap, mask)
        assert out.shape == x.shape  # learn_sigma keeps first in_channels

    def test_no_learn_sigma(self):
        model = tiny_next_dit(learn_sigma=False)
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        assert model.apply(params, x, t, cap, mask).shape == x.shape

    def test_zero_init_gives_zero_output(self):
        """adaLN gates and final layer are zero-init: at init, the final
        projection is exactly zero (`model.py:639-655`)."""
        model = tiny_next_dit()
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        out = model.apply(params, x, t, cap, mask)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_jit_forward(self):
        model = tiny_next_dit()
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        out = jax.jit(lambda p, xx, tt: model.apply(p, xx, tt, cap, mask))(params, x, t)
        assert out.shape == x.shape

    def test_flash_fused_rope_matches_xla(self, monkeypatch):
        """attn_impl='flash' with LUMINA_FUSE_ROPE=1 (fused-rope Pallas path;
        interpret mode on CPU) must match attn_impl='xla' given identical
        randomized parameters — covers both self-attn (rotate q+k) and
        cross-attn (rotate q only)."""
        monkeypatch.setenv("LUMINA_FUSE_ROPE", "1")
        mf = tiny_next_dit(attn_impl="flash")
        mx = tiny_next_dit(attn_impl="xla")
        x, t, cap, mask = make_inputs()
        params = mx.init(jax.random.PRNGKey(0), x, t, cap, mask)
        # randomize: zero-init gates/final layer would otherwise hide attention
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        params = jax.tree.unflatten(
            treedef,
            [0.05 * jax.random.normal(kk, l.shape, l.dtype)
             if jnp.issubdtype(l.dtype, jnp.floating) else l
             for kk, l in zip(keys, leaves)],
        )
        of = mf.apply(params, x, t, cap, mask)
        ox = mx.apply(params, x, t, cap, mask)
        np.testing.assert_allclose(np.asarray(of), np.asarray(ox), atol=2e-3)

    def test_kv_merge_attention_equivalence(self):
        """Attention with kv_pool_grid/kv_merge_ratio must equal manual
        rope -> pool_kv_2d -> sdpa (the fork's kv_merge,
        `visual_anagrams/models/nextdit.py:342-358`)."""
        import flax.linen as fnn

        from lumina_t2x_tpu.models.layers import Attention
        from lumina_t2x_tpu.ops.attention import pool_kv_2d, sdpa
        from lumina_t2x_tpu.ops.rope import apply_rope, rope_angles_2d

        gh = gw = 8
        s, dim, heads = gh * gw, 64, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (2, s, dim))
        angles = rope_angles_2d(dim // heads, gh, gw).reshape(s, (dim // heads) // 2)
        mask = jnp.ones((2, s), jnp.int32)

        merged = Attention(dim=dim, n_heads=heads, attn_impl="xla",
                           kv_pool_grid=(gh, gw), kv_merge_ratio=2)
        plain = Attention(dim=dim, n_heads=heads, attn_impl="xla")
        params = plain.init(jax.random.PRNGKey(1), x, mask, angles)
        out = merged.apply(params, x, mask, angles)

        # manual reference: reuse the projections via a plain sdpa recompute
        wq = params["params"]["wq"]["kernel"]
        wk = params["params"]["wk"]["kernel"]
        wv = params["params"]["wv"]["kernel"]
        wo = params["params"]["wo"]["kernel"]
        hd = dim // heads
        xq = apply_rope((x @ wq).reshape(2, s, heads, hd), angles)
        xk = apply_rope((x @ wk).reshape(2, s, heads, hd), angles)
        xv = (x @ wv).reshape(2, s, heads, hd)
        pk, pv = pool_kv_2d(xk, xv, gh, gw, 2)
        ref = sdpa(xq, pk, pv).reshape(2, s, dim) @ wo
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        # and it must differ from the unmerged attention
        base = plain.apply(params, x, mask, angles)
        assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-3

    def test_kv_merge_and_anagram_scale_forward(self):
        """NextDiT forward accepts kv_merge_ratio + attn_scale_variant and
        keeps output shape; anagram scale differs from proportional."""
        model = tiny_next_dit()
        x, t, cap, mask = make_inputs(h=32, w=32)
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        out = model.apply(params, x, t, cap, mask, kv_merge_ratio=2,
                          proportional_attn=True, base_seqlen=64,
                          attn_scale_variant="anagram")
        assert out.shape == x.shape

    def test_scan_vs_loop_same_params_structure_output(self):
        """scan_blocks=True and False must produce identical outputs when the
        per-layer parameters match."""
        ms = tiny_next_dit(scan_blocks=True)
        ml = tiny_next_dit(scan_blocks=False)
        x, t, cap, mask = make_inputs()
        ps = ms.init(jax.random.PRNGKey(0), x, t, cap, mask)

        # convert stacked scan params -> per-layer params
        import flax

        flat = flax.traverse_util.flatten_dict(ps["params"])
        out = {}
        n_layers = ms.n_layers
        for k, v in flat.items():
            if k[0] == "layers":
                for i in range(n_layers):
                    out[(f"layers_{i}",) + k[1:]] = v[i]
            else:
                out[k] = v
        pl = {"params": flax.traverse_util.unflatten_dict(out)}

        o1 = ms.apply(ps, x, t, cap, mask)
        o2 = ml.apply(pl, x, t, cap, mask)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def test_gqa(self):
        model = tiny_next_dit(n_kv_heads=2)
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        assert model.apply(params, x, t, cap, mask).shape == x.shape

    def test_qk_norm(self):
        model = tiny_next_dit(qk_norm=True)
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        assert model.apply(params, x, t, cap, mask).shape == x.shape

    def test_img_sizes_list_path(self):
        """Variable-aspect batch: items smaller than the bucket must give the
        same result as running them alone at their native size."""
        model = tiny_next_dit()
        b, c, h, w = 2, 4, 16, 16
        x, t, cap, mask = make_inputs(b, c, h, w)
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)

        # item 0 native 8x16 placed in a 16x16 bucket (zero padded)
        x_small = x[:1, :, :8, :]
        x_padded = jnp.zeros((1, c, h, w)).at[:, :, :8, :].set(x_small)
        batch = jnp.concatenate([x_padded, x[1:]], axis=0)

        out = model.apply(params, batch, t, cap, mask, img_sizes=[(8, 16), (16, 16)])
        out_native = model.apply(params, x_small, t[:1], cap[:1], mask[:1])
        np.testing.assert_allclose(
            np.asarray(out[0, :, :8, :]), np.asarray(out_native[0]), atol=1e-4
        )
        # the padded region of item 0 must be exactly zero
        np.testing.assert_allclose(np.asarray(out[0, :, 8:, :]), 0.0, atol=1e-6)
        # item 1 (full size) must match the tensor path
        out_full = model.apply(params, x, t, cap, mask)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out_full[1]), atol=1e-4)

    def test_forward_with_cfg(self):
        model = tiny_next_dit()
        x, t, cap, mask = make_inputs(b=4)
        params = model.init(jax.random.PRNGKey(0), x[:1], t[:1], cap[:1], mask[:1])
        out = forward_with_cfg(model, params, x, t, cap, mask, cfg_scale=4.0)
        assert out.shape == x.shape
        # rows [0:2] and [2:4] must be identical (duplicated halves)
        np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(out[2:]), atol=1e-6)

    def test_time_aware_rope_changes_output(self):
        model = tiny_next_dit()
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        # perturb params so output is nonzero
        params = jax.tree.map(lambda a: a + 0.02, params)
        o1 = model.apply(params, x, t, cap, mask,
                         rope_timestep=0.1, scale_factor=2.0, scale_watershed=0.3)
        o2 = model.apply(params, x, t, cap, mask,
                         rope_timestep=0.9, scale_factor=2.0, scale_watershed=0.3)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_proportional_attn(self):
        model = tiny_next_dit()
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        out = model.apply(params, x, t, cap, mask, proportional_attn=True, base_seqlen=32)
        assert out.shape == x.shape

    def test_bf16_compute(self):
        model = tiny_next_dit(dtype=jnp.bfloat16)
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        out = model.apply(params, x, t, cap, mask)
        assert out.dtype == jnp.float32  # output cast back


class TestNextDiTImageNet:
    def test_forward_shape(self):
        model = tiny_imagenet()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.array([0.3, 0.7])
        y = jnp.array([1, 5])
        params = model.init(jax.random.PRNGKey(0), x, t, y)
        assert model.apply(params, x, t, y).shape == x.shape

    def test_label_dropout_maps_to_null_class(self):
        model = tiny_imagenet(class_dropout_prob=1.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.array([0.3, 0.7])
        params = model.init(
            {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
            x, t, jnp.array([1, 5]), train=True,
        )
        params = jax.tree.map(lambda a: a + 0.02, params)
        # with p=1 dropout, any two labels give identical (null-class) output
        o1 = model.apply(params, x, t, jnp.array([1, 5]), train=True,
                         rngs={"label_dropout": jax.random.PRNGKey(2)})
        o2 = model.apply(params, x, t, jnp.array([3, 9]), train=True,
                         rngs={"label_dropout": jax.random.PRNGKey(2)})
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    def test_force_drop_ids(self):
        model = tiny_imagenet()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.array([0.3, 0.7])
        y = jnp.array([1, 5])
        params = model.init(jax.random.PRNGKey(0), x, t, y)
        params = jax.tree.map(lambda a: a + 0.02, params)
        o_forced = model.apply(params, x, t, y, force_drop_ids=jnp.array([1, 1]))
        o_null = model.apply(params, x, t, jnp.array([model.num_classes] * 2))
        np.testing.assert_allclose(np.asarray(o_forced), np.asarray(o_null), atol=1e-6)

    def test_cfg(self):
        model = tiny_imagenet()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 16, 16))
        t = jnp.full((4,), 0.5)
        y = jnp.array([1, 2, 10, 10])  # null class for uncond rows
        params = model.init(jax.random.PRNGKey(0), x[:1], t[:1], y[:1])
        out = forward_with_cfg_imagenet(model, params, x, t, y, cfg_scale=4.0)
        assert out.shape == x.shape

    def test_rope_ntk_scaling_changes_output(self):
        model = tiny_imagenet()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
        t = jnp.array([0.5])
        y = jnp.array([0])
        params = model.init(jax.random.PRNGKey(0), x, t, y)
        # structured (non-uniform) perturbation so positional info survives
        params = jax.tree.map(
            lambda a: a + 0.05 * jnp.sin(jnp.arange(a.size, dtype=jnp.float32)).reshape(a.shape),
            params,
        )
        o1 = model.apply(params, x, t, y)
        o2 = model.apply(params, x, t, y, ntk_factor=4.0)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestFlagDiT:
    def test_text_variant_shape(self):
        model = FlagDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                        cap_feat_dim=32, attn_impl="xla")
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        assert model.apply(params, x, t, cap, mask).shape == x.shape

    def test_eol_token_present(self):
        model = FlagDiT(dim=64, n_layers=1, n_heads=4, multiple_of=16,
                        cap_feat_dim=32, attn_impl="xla")
        x, t, cap, mask = make_inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask)
        assert "eol_token" in params["params"]

    def test_imagenet_variant(self):
        model = FlagDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                        num_classes=1000, use_eol_token=False, attn_impl="xla")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.array([0.3, 0.7])
        y = jnp.array([1, 5])
        params = model.init(jax.random.PRNGKey(0), x, t, y=y)
        assert model.apply(params, x, t, y=y).shape == x.shape
        assert "eol_token" not in params["params"]

    def test_registry(self):
        with pytest.raises(KeyError):
            get_model("NoSuchModel")
        m = get_model("NextDiT_2B_patch2", cap_feat_dim=2048)
        assert isinstance(m, NextDiT)
        assert m.dim == 2304 and m.n_layers == 24


class TestParamCounts:
    def test_2b_config_param_count(self):
        """NextDiT_2B_patch2 at full width must land near 2B params
        (reference `model.py:994-995` with Gemma cap_feat_dim=2048)."""
        model = get_model("NextDiT_2B_patch2", cap_feat_dim=2048, scan_blocks=False)
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 4, 64, 64)), jnp.zeros((1,)),
                jnp.zeros((1, 8, 2048)), jnp.ones((1, 8), jnp.int32),
            )
        )
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
        assert 1.5e9 < n < 2.5e9, f"param count {n/1e9:.2f}B out of range"


class TestMMDiT:
    def _tiny(self):
        from lumina_t2x_tpu.models.mmdit import MMDiT

        return MMDiT(patch_size=2, in_channels=4, dim=32, n_layers=2, n_heads=4,
                     context_dim=16, pooled_dim=8)

    def _inputs(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        t = jnp.array([100.0, 900.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        pooled = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
        return x, t, ctx, pooled

    def test_forward_shape(self):
        model = self._tiny()
        x, t, ctx, pooled = self._inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, ctx, pooled)
        out = model.apply(params, x, t, ctx, pooled)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_zero_init_final(self):
        model = self._tiny()
        x, t, ctx, pooled = self._inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, ctx, pooled)
        np.testing.assert_allclose(np.asarray(model.apply(params, x, t, ctx, pooled)), 0.0,
                                   atol=1e-6)

    def test_context_affects_output(self):
        model = self._tiny()
        x, t, ctx, pooled = self._inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, ctx, pooled)
        params = jax.tree.map(
            lambda a: a + 0.02 * np.random.RandomState(0).standard_normal(a.shape).astype(np.float32),
            params,
        )
        o1 = model.apply(params, x, t, ctx, pooled)
        o2 = model.apply(params, x, t, ctx * 2.0, pooled)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_with_sd3_ode(self):
        """MMDiT + MiniODE(use_sd3=True) end-to-end sampling."""
        from lumina_t2x_tpu.transport.mini import MiniODE

        model = self._tiny()
        x, t, ctx, pooled = self._inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, ctx, pooled)
        ctx2 = jnp.concatenate([jnp.zeros_like(ctx[:1]), ctx[:1]], axis=0)  # uncond, cond
        pooled2 = jnp.concatenate([jnp.zeros_like(pooled[:1]), pooled[:1]], axis=0)

        def model_fn(xx, tt):
            return model.apply(params, xx, tt, ctx2, pooled2)

        ode = MiniODE(num_steps=3, use_sd3=True, time_shifting_factor=3.0)
        out = ode.sample(jnp.zeros((2, 4, 8, 8)), model_fn, cfg_scale=5.0)
        assert out.shape == (2, 4, 8, 8)
        assert np.all(np.isfinite(np.asarray(out)))


class TestMMDiTImport:
    def test_synthetic_sd3_state_dict_import(self):
        from lumina_t2x_tpu.codecs.mmdit_import import import_sd3_mmdit_weights
        from lumina_t2x_tpu.models.mmdit import MMDiT

        dim, n_layers, heads, ctx, pooled, p, cin = 32, 2, 4, 16, 8, 2, 4
        rng = np.random.RandomState(0)
        sd = {}

        def lin(name, i, o, bias=True):
            sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
            if bias:
                sd[f"{name}.bias"] = np.zeros(o, np.float32)

        sd["pos_embed.proj.weight"] = rng.randn(dim, cin, p, p).astype(np.float32) * 0.02
        sd["pos_embed.proj.bias"] = np.zeros(dim, np.float32)
        lin("context_embedder", ctx, dim)
        lin("time_text_embed.timestep_embedder.linear_1", 256, dim)
        lin("time_text_embed.timestep_embedder.linear_2", dim, dim)
        lin("time_text_embed.text_embedder.linear_1", pooled, dim)
        lin("time_text_embed.text_embedder.linear_2", dim, dim)
        lin("norm_out.linear", dim, 2 * dim)
        lin("proj_out", dim, p * p * cin)
        hd = dim // heads
        for i in range(n_layers):
            pre = f"transformer_blocks.{i}"
            lin(f"{pre}.norm1.linear", dim, 6 * dim)
            last = i == n_layers - 1
            lin(f"{pre}.norm1_context.linear", dim, 2 * dim if last else 6 * dim)
            for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
                lin(f"{pre}.attn.{nm}", dim, dim)
            for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
                sd[f"{pre}.attn.{nm}.weight"] = np.ones(hd, np.float32)
            lin(f"{pre}.attn.to_out.0", dim, dim)
            lin(f"{pre}.ff.net.0.proj", dim, 4 * dim)
            lin(f"{pre}.ff.net.2", 4 * dim, dim)
            if not last:
                lin(f"{pre}.attn.to_add_out", dim, dim)
                lin(f"{pre}.ff_context.net.0.proj", dim, 4 * dim)
                lin(f"{pre}.ff_context.net.2", 4 * dim, dim)

        # distinct halves so the AdaLayerNormContinuous (scale, shift) ->
        # (shift, scale) swap is value-pinned, not just shape-checked
        sd["norm_out.linear.bias"] = np.arange(2 * dim, dtype=np.float32)
        last_pre = f"transformer_blocks.{n_layers - 1}"
        sd[f"{last_pre}.norm1_context.linear.bias"] = np.arange(
            2 * dim, dtype=np.float32) + 100.0

        params = import_sd3_mmdit_weights(sd, n_layers=n_layers)

        # diffusers packs (scale, shift); our modules split (shift, scale):
        # the imported bias must have the halves exchanged
        np.testing.assert_array_equal(
            params["final_adaLN"]["bias"],
            np.concatenate([np.arange(dim, 2 * dim), np.arange(0, dim)]))
        np.testing.assert_array_equal(
            params[f"blocks_{n_layers - 1}"]["c_adaLN"]["bias"],
            np.concatenate([np.arange(dim, 2 * dim), np.arange(0, dim)]) + 100.0)
        # 6-chunk AdaLayerNormZero blocks copy straight through (no swap)
        np.testing.assert_array_equal(
            params["blocks_0"]["c_adaLN"]["bias"],
            sd["transformer_blocks.0.norm1_context.linear.bias"])

        model = MMDiT(patch_size=p, in_channels=cin, dim=dim, n_layers=n_layers,
                      n_heads=heads, context_dim=ctx, pooled_dim=pooled)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, cin, 8, 8))
        t = jnp.array([500.0])
        c = jax.random.normal(jax.random.PRNGKey(1), (1, 5, ctx))
        pl = jax.random.normal(jax.random.PRNGKey(2), (1, pooled))
        ref = model.init(jax.random.PRNGKey(3), x, t, c, pl)["params"]

        ref_shapes = jax.tree.map(np.shape, ref)
        got_shapes = jax.tree.map(np.shape, params)
        assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
        assert ref_shapes == got_shapes
        out = model.apply({"params": params}, x, t, c, pl)
        assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))


class TestParamDtype:
    """param_dtype=bf16 stores weights half-size (how 5B/7B fit one chip);
    norm weights stay fp32 (the fp32-island set) and defaults are unchanged."""

    def test_bf16_params_init_and_forward(self):
        from lumina_t2x_tpu.models.next_dit import NextDiT

        model = NextDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                        cap_feat_dim=32, dtype=jnp.bfloat16,
                        param_dtype=jnp.bfloat16, attn_impl="xla")
        x = jnp.zeros((1, 4, 16, 16))
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 8, 32)), jnp.ones((1, 8), jnp.int32))
        v = model.init(jax.random.PRNGKey(0), *args)
        big = [p for p in jax.tree.leaves(v) if p.size > 1000]
        assert big and all(p.dtype == jnp.bfloat16 for p in big)
        flat = flax.traverse_util.flatten_dict(v["params"], sep="/")
        norm_w = [v_ for k, v_ in flat.items() if "norm" in k and k.endswith("weight")]
        assert norm_w and all(p.dtype == jnp.float32 for p in norm_w)
        out = model.apply(v, *args)
        assert np.all(np.isfinite(np.asarray(out, np.float32)))

    def test_default_param_dtype_is_fp32(self):
        from lumina_t2x_tpu.models.next_dit import NextDiT

        model = NextDiT(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                        cap_feat_dim=32, dtype=jnp.bfloat16, attn_impl="xla")
        x = jnp.zeros((1, 4, 16, 16))
        v = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                       jnp.zeros((1, 8, 32)), jnp.ones((1, 8), jnp.int32))
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(v))
