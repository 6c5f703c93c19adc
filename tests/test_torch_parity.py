"""Cross-implementation numerical parity: run the *reference's own torch
model* (lumina_next_t2i_mini NextDiT, SDPA fallback path) next to our flax
NextDiT with identical weights and inputs, and require matching outputs.

This executes the reference code read-only from /root/reference (skipped when
the mount is absent); flash_attn is stubbed since the fp32 SDPA fallback
(`nextdit.py:328-372`) never touches it.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference/lumina_next_t2i_mini"


@pytest.fixture(scope="module")
def torch_next_dit_cls():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference mount not available")
    # stub the CUDA-only imports the fallback path never calls
    for name in ("flash_attn", "flash_attn.bert_padding", "apex"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["flash_attn"].flash_attn_varlen_func = None
    bp = sys.modules["flash_attn.bert_padding"]
    bp.index_first_axis = bp.pad_input = bp.unpad_input = None
    # the reference hardcodes .cuda() in precompute_freqs_cis; run on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REFERENCE)
    try:
        from models.nextdit import NextDiT as TorchNextDiT
    finally:
        sys.path.pop(0)
    return TorchNextDiT


@pytest.mark.parametrize("qk_norm", [False, True])
def test_forward_parity(torch_next_dit_cls, qk_norm):
    import jax
    import jax.numpy as jnp

    from lumina_t2x_tpu.core.checkpoint import import_next_dit_weights
    from lumina_t2x_tpu.models.next_dit import NextDiT

    dim, n_layers, n_heads, cap_dim = 64, 2, 4, 32
    tmodel = torch_next_dit_cls(
        patch_size=2, in_channels=4, dim=dim, n_layers=n_layers, n_heads=n_heads,
        multiple_of=16, norm_eps=1e-5, learn_sigma=True, qk_norm=qk_norm,
        cap_feat_dim=cap_dim, use_flash_attn=False,
    ).float().eval()

    # randomize the zero-init layers so parity is meaningful everywhere
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)

    sd = {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
    params = import_next_dit_weights(sd, n_layers=n_layers, scan_layers=True)

    jmodel = NextDiT(
        patch_size=2, in_channels=4, dim=dim, n_layers=n_layers, n_heads=n_heads,
        multiple_of=16, norm_eps=1e-5, learn_sigma=True, qk_norm=qk_norm,
        cap_feat_dim=cap_dim, attn_impl="xla",
    )

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([0.25, 0.75], np.float32)
    cap = rng.randn(2, 9, cap_dim).astype(np.float32)
    mask = np.ones((2, 9), np.int32)
    mask[:, 7:] = 0

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(cap), torch.from_numpy(mask.astype(np.int32)),
        ).numpy()

    j_out = np.asarray(jmodel.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cap),
        jnp.asarray(mask),
    ))

    assert t_out.shape == j_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)


def test_freqs_cis_parity(torch_next_dit_cls):
    """2-D RoPE table parity against the reference's complex precompute."""
    import jax.numpy as jnp

    from lumina_t2x_tpu.ops.rope import rope_angles_2d_timeaware

    t_freqs = torch_next_dit_cls.precompute_freqs_cis(
        16, 8, scale_factor=2.0, scale_watershed=0.3, timestep=0.1
    ).numpy()  # (8, 8, 8) complex
    angles = rope_angles_2d_timeaware(16, 8, 8, scale_factor=2.0, scale_watershed=0.3,
                                      timestep=0.1)
    ours = np.exp(1j * np.asarray(angles))
    np.testing.assert_allclose(ours, t_freqs, atol=1e-5)


def test_forward_parity_gqa(torch_next_dit_cls):
    """GQA config (n_kv_heads < n_heads) must also match."""
    import jax.numpy as jnp

    from lumina_t2x_tpu.core.checkpoint import import_next_dit_weights
    from lumina_t2x_tpu.models.next_dit import NextDiT

    dim, n_layers, n_heads, n_kv, cap_dim = 64, 2, 8, 2, 32
    tmodel = torch_next_dit_cls(
        patch_size=2, in_channels=4, dim=dim, n_layers=n_layers, n_heads=n_heads,
        n_kv_heads=n_kv, multiple_of=16, learn_sigma=True, qk_norm=True,
        cap_feat_dim=cap_dim, use_flash_attn=False,
    ).float().eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for _, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    sd = {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
    params = import_next_dit_weights(sd, n_layers=n_layers, scan_layers=True)

    jmodel = NextDiT(patch_size=2, in_channels=4, dim=dim, n_layers=n_layers,
                     n_heads=n_heads, n_kv_heads=n_kv, multiple_of=16,
                     learn_sigma=True, qk_norm=True, cap_feat_dim=cap_dim,
                     attn_impl="xla")
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([0.1, 0.6], np.float32)
    cap = rng.randn(2, 8, cap_dim).astype(np.float32)
    mask = np.ones((2, 8), np.int32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(cap), torch.from_numpy(mask)).numpy()
    j_out = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(cap), jnp.asarray(mask)))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)


def test_forward_parity_resolution_extrapolation(torch_next_dit_cls):
    """scale_factor + watershed RoPE path parity (the torch model bakes the
    scaled freqs at construction via precompute_freqs_cis)."""
    import jax.numpy as jnp

    from lumina_t2x_tpu.core.checkpoint import import_next_dit_weights
    from lumina_t2x_tpu.models.next_dit import NextDiT

    dim, n_layers, n_heads, cap_dim = 64, 1, 4, 32
    # timestep default 1.0 with watershed 1.0 -> NTK branch with factor 2
    tmodel = torch_next_dit_cls(
        patch_size=2, in_channels=4, dim=dim, n_layers=n_layers, n_heads=n_heads,
        multiple_of=16, cap_feat_dim=cap_dim, use_flash_attn=False, scale_factor=2.0,
    ).float().eval()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for _, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    sd = {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
    params = import_next_dit_weights(sd, n_layers=n_layers, scan_layers=True)

    jmodel = NextDiT(patch_size=2, in_channels=4, dim=dim, n_layers=n_layers,
                     n_heads=n_heads, multiple_of=16, cap_feat_dim=cap_dim,
                     attn_impl="xla")
    rng = np.random.RandomState(4)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([0.5], np.float32)
    cap = rng.randn(1, 6, cap_dim).astype(np.float32)
    mask = np.ones((1, 6), np.int32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(cap), torch.from_numpy(mask)).numpy()
    j_out = np.asarray(jmodel.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cap),
        jnp.asarray(mask), rope_timestep=1.0, scale_factor=2.0, scale_watershed=1.0,
    ))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=2e-3)
