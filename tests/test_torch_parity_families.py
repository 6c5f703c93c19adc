"""Gold-standard cross-parity for every remaining model family: run the
reference's own torch code (read-only, CPU, fp32 SDPA fallback — see
tests/ref_loader.py) with identical weights next to our flax models and
require matching outputs (<=2e-4).

Families covered here (NextDiT-mini lives in test_torch_parity.py):
- Flag-DiT 5B-style text model, incl. [eol] token + NTK rope extrapolation
  (`lumina_t2i/models/model.py:665-991`)
- Next-DiT-ImageNet SandwichNorm2 / PFRMSNorm (`Next-DiT-ImageNet/models/models.py`)
- Next-DiT-MoE block (`Next-DiT-MoE/models/models2.py`)
- FlagDiT-1D music backbone (`lumina_music/models/diffusion/flag_large_dit.py`)
- Compositional region attention (`lumina_next_compositional_generation/models/model.py`)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_ref_module, randomize_zero_params, state_dict_numpy  # noqa: E402


# -- Flag-DiT (lumina_t2i 5B text backbone) ---------------------------------


@pytest.fixture(scope="module")
def torch_flag_dit_cls():
    return load_ref_module("lumina_t2i", "model").DiT_Llama


@pytest.mark.parametrize("qk_norm", [False, True])
def test_flag_dit_text_parity(torch_flag_dit_cls, qk_norm):
    import jax.numpy as jnp

    from lumina_t2x_tpu.core.checkpoint import import_flag_dit_weights
    from lumina_t2x_tpu.models.flag_dit import FlagDiT

    dim, n_layers, n_heads, cap_dim = 64, 2, 4, 32
    tmodel = torch_flag_dit_cls(
        patch_size=2, in_channels=4, dim=dim, n_layers=n_layers, n_heads=n_heads,
        multiple_of=16, norm_eps=1e-5, learn_sigma=True, qk_norm=qk_norm,
        cap_feat_dim=cap_dim,
    ).float().eval()
    randomize_zero_params(tmodel, seed=0)
    params = import_flag_dit_weights(state_dict_numpy(tmodel), n_layers=n_layers,
                                     scan_layers=True)

    jmodel = FlagDiT(patch_size=2, in_channels=4, dim=dim, n_layers=n_layers,
                     n_heads=n_heads, multiple_of=16, norm_eps=1e-5, learn_sigma=True,
                     qk_norm=qk_norm, cap_feat_dim=cap_dim, attn_impl="xla")

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([0.25, 0.75], np.float32)
    cap = rng.randn(2, 9, cap_dim).astype(np.float32)
    mask = np.ones((2, 9), np.int32)
    mask[:, 7:] = 0

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(cap), torch.from_numpy(mask)).numpy()
    j_out = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(cap), jnp.asarray(mask)))
    assert t_out.shape == j_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)


# -- Next-DiT-ImageNet (SandwichNorm2 / PFRMSNorm) --------------------------


@pytest.fixture(scope="module")
def torch_imagenet_dit_cls():
    return load_ref_module("Next-DiT-ImageNet", "models").DiT_Llama


@pytest.mark.parametrize("qk_norm", [False, True])
def test_imagenet_sandwichnorm2_parity(torch_imagenet_dit_cls, qk_norm):
    import jax.numpy as jnp

    from lumina_t2x_tpu.core.checkpoint import import_next_dit_imagenet_weights
    from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet

    dim, n_layers, n_heads, n_classes = 64, 2, 4, 10
    tmodel = torch_imagenet_dit_cls(
        patch_size=2, in_channels=4, dim=dim, n_layers=n_layers, n_heads=n_heads,
        multiple_of=16, norm_eps=1e-5, num_classes=n_classes, learn_sigma=True,
        qk_norm=qk_norm,
    ).float().eval()
    randomize_zero_params(tmodel, seed=4)
    params = import_next_dit_imagenet_weights(state_dict_numpy(tmodel),
                                              n_layers=n_layers, scan_layers=True)

    jmodel = NextDiTImageNet(patch_size=2, in_channels=4, dim=dim, n_layers=n_layers,
                             n_heads=n_heads, multiple_of=16, norm_eps=1e-5,
                             num_classes=n_classes, learn_sigma=True, qk_norm=qk_norm,
                             attn_impl="xla")
    rng = np.random.RandomState(5)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([0.2, 0.9], np.float32)
    y = np.array([3, 7], np.int64)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)).numpy()
    j_out = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(y)))
    assert t_out.shape == j_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)


# -- Next-DiT-MoE (time + space experts, "Both" variant) --------------------


def test_moe_both_parity():
    import jax.numpy as jnp

    from lumina_t2x_tpu.core.checkpoint import import_next_dit_moe_weights
    from lumina_t2x_tpu.models.moe import NextDiTMoE

    ref = load_ref_module("Next-DiT-MoE", "models2")
    dim, n_layers, n_heads, n_classes, n_exp = 64, 2, 4, 10, 4
    tmodel = ref.DiT_Llama(
        patch_size=2, in_channels=4, dim=dim, n_layers=n_layers, n_heads=n_heads,
        multiple_of=16, norm_eps=1e-5, num_classes=n_classes, learn_sigma=True,
        qk_norm=True,
    ).float().eval()
    randomize_zero_params(tmodel, seed=6)
    params = import_next_dit_moe_weights(state_dict_numpy(tmodel), n_layers=n_layers,
                                         scan_layers=True)

    # capacity_factor = num_experts: capacity == all assignments, so the
    # static-capacity dispatch provably drops nothing and must equal the
    # reference's dense gather loop.
    jmodel = NextDiTMoE(patch_size=2, in_channels=4, dim=dim, n_layers=n_layers,
                        n_heads=n_heads, multiple_of=16, norm_eps=1e-5,
                        num_classes=n_classes, learn_sigma=True, qk_norm=True,
                        moe_mode="both", num_experts=n_exp, num_experts_per_tok=2,
                        capacity_factor=float(n_exp), attn_impl="xla")
    rng = np.random.RandomState(7)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([0.3, 0.8], np.float32)
    y = np.array([1, 9], np.int64)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)).numpy()
    j_out = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(y)))
    assert t_out.shape == j_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)


# -- FlagDiT-1D (music/audio temporal backbone) -----------------------------


@pytest.mark.parametrize("qk_norm", [False, True])
def test_flag_dit_1d_parity(qk_norm):
    import jax.numpy as jnp

    from lumina_t2x_tpu.core.checkpoint import import_flag_dit_1d_weights
    from lumina_t2x_tpu.models.flag_dit_1d import FlagDiT1D

    ref = load_ref_module("lumina_music", "diffusion.flag_large_dit")
    c_in, ctx_dim, hidden, depth, heads = 8, 24, 64, 2, 4
    tmodel = ref.FlagDiT(
        in_channels=c_in, context_dim=ctx_dim, hidden_size=hidden, depth=depth,
        num_heads=heads, max_len=64, multiple_of=16, norm_eps=1e-5, qk_norm=qk_norm,
    ).float().eval()
    randomize_zero_params(tmodel, seed=8)
    params = import_flag_dit_1d_weights(state_dict_numpy(tmodel), depth=depth,
                                        scan_layers=True)

    jmodel = FlagDiT1D(in_channels=c_in, context_dim=ctx_dim, hidden_size=hidden,
                       depth=depth, num_heads=heads, max_len=64, multiple_of=16,
                       norm_eps=1e-5, qk_norm=qk_norm, attn_impl="xla")
    rng = np.random.RandomState(9)
    x = rng.randn(2, c_in, 40).astype(np.float32)
    t = np.array([0.4, 0.6], np.float32)
    ctx = rng.randn(2, 7, ctx_dim).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(ctx)).numpy()
    j_out = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(ctx)))
    assert t_out.shape == j_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)


# -- Compositional (region-masked caption cross-attention) ------------------


def test_compositional_region_attention_parity():
    import jax.numpy as jnp

    from lumina_t2x_tpu.core.checkpoint import import_next_dit_weights
    from lumina_t2x_tpu.models.compositional import NextDiTCompositional

    ref = load_ref_module("lumina_next_compositional_generation", "model")
    dim, n_layers, n_heads, cap_dim = 64, 2, 4, 32
    tmodel = ref.NextDiT(
        patch_size=2, in_channels=4, dim=dim, n_layers=n_layers, n_heads=n_heads,
        multiple_of=16, norm_eps=1e-5, learn_sigma=True, qk_norm=True,
        cap_feat_dim=cap_dim,
    ).float().eval()
    randomize_zero_params(tmodel, seed=10)
    params = import_next_dit_weights(state_dict_numpy(tmodel), n_layers=n_layers,
                                     scan_layers=True)

    jmodel = NextDiTCompositional(patch_size=2, in_channels=4, dim=dim,
                                  n_layers=n_layers, n_heads=n_heads, multiple_of=16,
                                  norm_eps=1e-5, learn_sigma=True, qk_norm=True,
                                  cap_feat_dim=cap_dim, attn_impl="xla")
    rng = np.random.RandomState(11)
    h_split, w_split = 2, 2
    num_y = h_split * w_split + 1  # region captions + trailing negative
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([0.5, 0.5], np.float32)
    cap = rng.randn(num_y, 6, cap_dim).astype(np.float32)
    cap_mask = np.ones((num_y, 6), np.int32)
    cap_mask[:, 5:] = 0
    gcap = rng.randn(2, 6, cap_dim).astype(np.float32)
    gmask = np.ones((2, 6), np.int32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cap),
                       torch.from_numpy(cap_mask), torch.from_numpy(gcap),
                       torch.from_numpy(gmask), h_split_num=h_split,
                       w_split_num=w_split).numpy()
    j_out = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(cap), jnp.asarray(cap_mask),
                                    jnp.asarray(gcap), jnp.asarray(gmask),
                                    h_split_num=h_split, w_split_num=w_split))
    assert t_out.shape == j_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)


def test_flag_dit_ntk_extrapolation_parity(torch_flag_dit_cls):
    """NTK-factor + linear rope scaling path (`model.py:924-960`: theta is
    multiplied by ntk_factor, positions divided by rope_scaling_factor)."""
    import jax.numpy as jnp

    from lumina_t2x_tpu.core.checkpoint import import_flag_dit_weights
    from lumina_t2x_tpu.models.flag_dit import FlagDiT

    dim, n_layers, n_heads, cap_dim = 64, 1, 4, 32
    tmodel = torch_flag_dit_cls(
        patch_size=2, in_channels=4, dim=dim, n_layers=n_layers, n_heads=n_heads,
        multiple_of=16, cap_feat_dim=cap_dim, rope_scaling_factor=2.0, ntk_factor=4.0,
    ).float().eval()
    randomize_zero_params(tmodel, seed=2)
    params = import_flag_dit_weights(state_dict_numpy(tmodel), n_layers=n_layers,
                                     scan_layers=True)
    jmodel = FlagDiT(patch_size=2, in_channels=4, dim=dim, n_layers=n_layers,
                     n_heads=n_heads, multiple_of=16, cap_feat_dim=cap_dim,
                     attn_impl="xla")
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([0.5], np.float32)
    cap = rng.randn(1, 6, cap_dim).astype(np.float32)
    mask = np.ones((1, 6), np.int32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(cap), torch.from_numpy(mask)).numpy()
    j_out = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(cap), jnp.asarray(mask),
                                    rope_scaling_factor=2.0, ntk_factor=4.0))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)
