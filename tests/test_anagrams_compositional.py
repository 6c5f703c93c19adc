"""Tests for visual-anagrams views/solvers/tiled VAE and the compositional
region-attention model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.pipelines.anagrams import (
    VIEW_MAP,
    anagram_init_phase,
    anagram_upscale_phase,
    get_anagrams_views,
    get_tile_views,
    midpoint_delta,
    tiled_decode,
    tiled_encode,
)


INVERTIBLE_VIEWS = [
    "identity", "flip", "rotate_cw", "rotate_ccw", "rotate_180", "negate",
    "skew", "patch_permute", "pixel_permute", "inner_circle", "square_hinge",
    "jigsaw",
]
# factorized-diffusion views: view = identity, inverse = component projection
FACTORIZED_VIEWS = [
    "grayscale", "color", "low_pass", "high_pass",
    "triple_low_pass", "triple_medium_pass", "triple_high_pass",
]


class TestViews:
    @pytest.mark.parametrize("name", INVERTIBLE_VIEWS)
    def test_invertibility(self, name):
        view = VIEW_MAP[name]()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32))
        out = view.inverse_view(view.view(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_views_actually_transform(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32))
        for name in INVERTIBLE_VIEWS:
            if name == "identity":
                continue
            out = VIEW_MAP[name]().view(x)
            assert not np.allclose(np.asarray(out), np.asarray(x)), name

    @pytest.mark.parametrize("name", FACTORIZED_VIEWS)
    def test_factorized_views(self, name):
        """view = identity (`view_hybrid.py:48-50`); inverse only touches the
        first 3 channels and extracts a non-trivial component."""
        view = VIEW_MAP[name]()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32))
        np.testing.assert_allclose(np.asarray(view.view(x)), np.asarray(x))
        p = view.inverse_view(x)
        np.testing.assert_allclose(np.asarray(p[3:]), np.asarray(x[3:]))  # untouched
        assert not np.allclose(np.asarray(p[:3]), np.asarray(x[:3]))
        # grayscale/color are true projections: idempotent
        if name in ("grayscale", "color"):
            np.testing.assert_allclose(
                np.asarray(view.inverse_view(p)), np.asarray(p), atol=1e-6
            )

    def test_triple_bands_sum_to_signal(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64))
        lp = VIEW_MAP["triple_low_pass"]().inverse_view(x)
        mp = VIEW_MAP["triple_medium_pass"]().inverse_view(x)
        hp = VIEW_MAP["triple_high_pass"]().inverse_view(x)
        total = np.asarray(lp[:3]) + np.asarray(mp[:3]) + np.asarray(hp[:3])
        np.testing.assert_allclose(total, np.asarray(x[:3]), atol=1e-4)

    def test_gray_plus_color_is_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16))
        g = VIEW_MAP["grayscale"]().inverse_view(x)
        c = VIEW_MAP["color"]().inverse_view(x)
        np.testing.assert_allclose(np.asarray(g[:3] + c[:3]), np.asarray(x[:3]), atol=1e-6)

    def test_scale_view(self):
        """view = identity, inverse scales first 3 ch (`view_scale.py:1-11`)."""
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16))
        v = VIEW_MAP["scale"]()
        np.testing.assert_allclose(np.asarray(v.view(x)), np.asarray(x))
        out = v.inverse_view(x)
        np.testing.assert_allclose(np.asarray(out[:3]), 0.5 * np.asarray(x[:3]))
        np.testing.assert_allclose(np.asarray(out[3:]), np.asarray(x[3:]))

    def test_white_balance_round_trip(self):
        """inverse(view(x)) == x on the first 3 channels
        (`view_white_balance.py:41-46`)."""
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16))
        v = VIEW_MAP["white_balance_failure"]()
        out = v.inverse_view(v.view(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_blur_failure_view(self):
        """view = down/up-sample blur, inverse = pass-through
        (`view_blur.py:38-50`)."""
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 64, 64))
        v = VIEW_MAP["blur_failure"]()
        blurred = v.view(x)
        assert blurred.shape == x.shape
        assert not np.allclose(np.asarray(blurred), np.asarray(x))
        # blur removes energy from a zero-mean noise image
        assert float(jnp.var(blurred)) < float(jnp.var(x))
        np.testing.assert_allclose(np.asarray(v.inverse_view(x)), np.asarray(x))

    @pytest.mark.parametrize("name", ["motion", "motion_res"])
    def test_motion_blur_views(self, name):
        """inverse applies (or subtracts) the diagonal eye(size)/size kernel on
        the first 3 channels (`view_motion.py:25-47,67-89`)."""
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 64, 64))
        v = VIEW_MAP[name]()
        np.testing.assert_allclose(np.asarray(v.view(x)), np.asarray(x))
        out = v.inverse_view(x)
        np.testing.assert_allclose(np.asarray(out[3:]), np.asarray(x[3:]))
        # manual reference conv for one interior pixel: size = 7*(64//64)=7 (odd)
        xa = np.asarray(x, np.float64)
        manual = np.mean([xa[0, 30 + d, 30 + d] for d in range(-3, 4)])
        if name == "motion":
            np.testing.assert_allclose(np.asarray(out[0, 30, 30]), manual, atol=1e-4)
        else:
            np.testing.assert_allclose(
                np.asarray(out[0, 30, 30]), xa[0, 30, 30] - manual, atol=1e-4
            )
        # motion + motion_res inverses sum to the identity on the first 3 ch
        other = VIEW_MAP["motion_res" if name == "motion" else "motion"]()
        total = np.asarray(out[:3]) + np.asarray(other.inverse_view(x)[:3])
        np.testing.assert_allclose(total, np.asarray(x[:3]), atol=1e-4)

    def test_inner_circle_failure(self):
        """Bilinear disk rotation; at 90 degrees the bilinear samples land on
        grid points so view∘inverse is exact in the disk interior
        (`view_inner_circle.py:61-145`)."""
        x = jax.random.normal(jax.random.PRNGKey(4), (3, 32, 32))
        v = VIEW_MAP["inner_circle_failure"](angle=90.0)
        out = v.view(x)
        assert not np.allclose(np.asarray(out), np.asarray(x))
        # outside the disk (radius 12): untouched
        np.testing.assert_allclose(np.asarray(out[:, 0, :]), np.asarray(x[:, 0, :]))
        rt = v.inverse_view(out)
        # interior of the disk round-trips exactly at 90 degrees
        np.testing.assert_allclose(
            np.asarray(rt[:, 12:20, 12:20]), np.asarray(x[:, 12:20, 12:20]), atol=1e-5
        )
        # default angle (135) is lossy but shape-preserving
        v135 = VIEW_MAP["inner_circle_failure"]()
        assert v135.inverse_view(v135.view(x)).shape == x.shape

    def test_factory(self):
        views = get_anagrams_views(["identity", "rotate_cw", "jigsaw"])
        assert len(views) == 3
        with pytest.raises(NotImplementedError):
            get_anagrams_views(["no_such_view"])


class TestAnagramSolvers:
    def test_midpoint_delta_matches_solver_order(self):
        f = lambda x, t: -x
        y0 = jnp.ones((2, 3))
        d = midpoint_delta(f, 0.0, 0.5, y0)
        # exact: y(0.5) - y(0) = exp(-.5) - 1; midpoint error O(dt^3)
        np.testing.assert_allclose(float(d[0, 0]), np.exp(-0.5) - 1, atol=2e-2)

    def test_init_phase_identity_view_matches_plain_ode(self):
        """With a single identity view, phase-1 must equal a plain midpoint
        integration."""
        from lumina_t2x_tpu.transport.solvers import odeint_fixed

        drift = lambda x, t: -x  # t is (B,)
        fn = lambda x, t: drift(x, t)
        z = jnp.ones((2, 4, 8, 8))
        ts = jnp.linspace(0.0, 1.0, 9)
        out = anagram_init_phase([fn], [VIEW_MAP["identity"]()], z, ts)
        ref = odeint_fixed(lambda x, t: -x, z, ts, method="midpoint")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_init_phase_two_views_runs(self):
        fn = lambda x, t: -x
        views = get_anagrams_views(["identity", "rotate_180"])
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        out = anagram_init_phase([fn, fn], views, z, jnp.linspace(0, 1, 5))
        assert out.shape == z.shape and np.all(np.isfinite(np.asarray(out)))

    def test_upscale_phase_runs(self):
        fn = lambda x, t: -x
        views = get_anagrams_views(["identity"])
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
        guidance = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
        out = anagram_upscale_phase([fn], views, z, guidance, jnp.linspace(0, 1, 5))
        assert out.shape == z.shape and np.all(np.isfinite(np.asarray(out)))


class TestTiledVAE:
    def test_tile_views_cover(self):
        views = get_tile_views(256, 1024, window_size=128, stride=64)
        cover = np.zeros((256, 1024))
        for hs, he, ws, we in views:
            cover[hs:he, ws:we] += 1
        assert (cover > 0).all()

    def test_tiled_identity_encode_decode(self):
        """With fn = average-pool/upsample stand-ins, tiling + overlap
        averaging must reproduce the global op."""
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 64, 128))

        def fake_encode(patch):  # 8x downsample, 4 channels
            b, c, h, w = patch.shape
            pooled = patch.reshape(b, c, h // 8, 8, w // 8, 8).mean((3, 5))
            return jnp.concatenate([pooled, pooled[:, :1]], axis=1)

        lat = tiled_encode(fake_encode, x, window=32, stride=16)
        ref = fake_encode(x)
        np.testing.assert_allclose(np.asarray(lat), np.asarray(ref), atol=1e-5)

    def test_tiled_decode_shape(self):
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 64))

        def fake_decode(patch):
            b, c, h, w = patch.shape
            up = jnp.repeat(jnp.repeat(patch[:, :3], 8, axis=2), 8, axis=3)
            return up

        img = tiled_decode(fake_decode, z, window=8, stride=4)
        assert img.shape == (1, 3, 128, 512)


class TestCompositional:
    def _model(self):
        from lumina_t2x_tpu.models.compositional import NextDiTCompositional

        return NextDiTCompositional(dim=64, n_layers=2, n_heads=4, multiple_of=16,
                                    cap_feat_dim=32, attn_impl="xla")

    def _inputs(self, num_regions=4):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 0.5)
        num_y = num_regions + 1  # region captions + negative
        cap = jax.random.normal(jax.random.PRNGKey(1), (num_y, 7, 32))
        mask = jnp.ones((num_y, 7), jnp.int32)
        gcap = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 32))
        gmask = jnp.ones((2, 7), jnp.int32)
        return x, t, cap, mask, gcap, gmask

    def test_forward_shapes(self):
        model = self._model()
        x, t, cap, mask, gcap, gmask = self._inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask, gcap, gmask,
                            h_split_num=2, w_split_num=2)
        out = model.apply(params, x, t, cap, mask, gcap, gmask, h_split_num=2, w_split_num=2)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_region_mask_layout(self):
        from lumina_t2x_tpu.models.compositional import build_region_mask

        m = np.asarray(build_region_mask(5, 8, 8, 2, 2)).reshape(5, 8, 8)
        # last region attends everywhere (`model.py:884`)
        assert m[-1].all()
        # region 0 = top-left quadrant
        assert m[0][:4, :4].all() and not m[0][4:, :].any()
        # quirky region_id formula: (h+1)*(w+1)-1 -> region 3 = bottom-right
        assert m[3][4:, 4:].all()

    def test_cfg_wrapper(self):
        from lumina_t2x_tpu.models.compositional import forward_with_cfg

        model = self._model()
        x, t, cap, mask, gcap, gmask = self._inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cap, mask, gcap, gmask)
        out = forward_with_cfg(model, params, x, t, cap, mask, cfg_scale=4.0,
                               global_cap_feats=gcap, global_cap_mask=gmask,
                               h_split_num=2, w_split_num=2)
        assert out.shape == x.shape


class TestAnagramAppTwoStage:
    def test_cli_runs_phase2(self, tmp_path):
        """--resolution > --base_res must wire phase 2 (decode -> bicubic
        upsample -> tiled re-encode -> guided loop) and save _hires views;
        in --debug latent stand-ins replace the VAE but the flow is
        identical (reference `generate.py:357-498`)."""
        from lumina_t2x_tpu import models as m
        from lumina_t2x_tpu.models.next_dit import NextDiT

        m.MODELS["NextDiT_600M_patch2"] = lambda **kw: NextDiT(
            **{**dict(dim=32, n_layers=1, n_heads=4, multiple_of=16),
               **{k: v for k, v in kw.items() if k != "remat"}}
        )
        from lumina_t2x_tpu.pipelines.anagrams_app import main

        paths = main([
            "--model", "NextDiT_600M_patch2",
            "--prompts", "a cat", "a dog",
            "--views", "identity", "flip",
            "--save_dir", str(tmp_path),
            "--num_inference_steps", "2",
            "--base_res", "64", "--resolution", "128",
            "--debug",
        ])
        hires = [p for p in paths if "_hires" in p]
        assert len(hires) == 2
        import numpy as np
        from PIL import Image

        base = Image.open([p for p in paths if "_hires" not in p][0])
        hi = Image.open(hires[0])
        assert hi.size == (16, 16) and base.size == (8, 8)  # latent previews
