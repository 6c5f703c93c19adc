"""Released-checkpoint contract (VERDICT r2 #4, rehearsable half).

The 2B release is a `consolidated_ema.00-of-01.safetensors` whose keys are
the reference NextDiT torch module names (`lumina_next_t2i/demo.py:127-133`).
`core.checkpoint.next_dit_reference_state_shapes` encodes that contract as a
name->shape manifest; these tests pin it against the reference's OWN torch
module (loaded via `ref_loader`, CUDA deps stubbed) so the manifest cannot
drift, then drive the full import/export path on a manifest-generated
synthetic dict, including a bf16 safetensors file (the release precision the
numpy loader cannot represent). The full-2B-scale on-TPU rehearsal lives in
`exps/rehearse_2b_contract.py`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lumina_t2x_tpu.core.checkpoint import (
    export_next_dit_weights,
    import_next_dit_weights,
    load_torch_state_dict,
    next_dit_reference_state_shapes,
    save_safetensors,
)

TINY = dict(dim=64, n_layers=2, n_heads=4, cap_feat_dim=32, qk_norm=True,
            in_channels=4, patch_size=2, multiple_of=16)


def synthetic_state_dict(shapes, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    return {k: (rng.standard_normal(v).astype(np.float32) * 0.02).astype(dtype)
            for k, v in shapes.items()}


@pytest.mark.slow
def test_manifest_matches_reference_module():
    """Key set AND shapes must equal the reference torch module's state_dict
    (same config) — the manifest is a transcription, this pins it."""
    torch = pytest.importorskip("torch")
    from ref_loader import load_ref_module

    ref = load_ref_module("lumina_next_t2i")
    tmodel = ref.NextDiT(
        patch_size=TINY["patch_size"], in_channels=TINY["in_channels"],
        dim=TINY["dim"], n_layers=TINY["n_layers"], n_heads=TINY["n_heads"],
        multiple_of=TINY["multiple_of"], qk_norm=TINY["qk_norm"],
        cap_feat_dim=TINY["cap_feat_dim"],
    )
    ref_shapes = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    ours = next_dit_reference_state_shapes(**TINY)
    assert set(ours) == set(ref_shapes), (
        f"missing={sorted(set(ref_shapes) - set(ours))[:6]} "
        f"extra={sorted(set(ours) - set(ref_shapes))[:6]}")
    for k in ref_shapes:
        assert ours[k] == ref_shapes[k], (k, ours[k], ref_shapes[k])


@pytest.mark.slow
def test_manifest_2b_defaults_import_and_roundtrip():
    """Manifest defaults (= released 2B) at tiny scale: synthetic dict ->
    import -> our model tree (exact structure + shapes) -> export -> same
    key set and shapes back."""
    from lumina_t2x_tpu.models.next_dit import NextDiT

    shapes = next_dit_reference_state_shapes(**TINY)
    sd = synthetic_state_dict(shapes)
    params = import_next_dit_weights(sd, n_layers=TINY["n_layers"])

    model = NextDiT(patch_size=2, in_channels=4, dim=TINY["dim"],
                    n_layers=TINY["n_layers"], n_heads=TINY["n_heads"],
                    multiple_of=TINY["multiple_of"], qk_norm=True,
                    cap_feat_dim=TINY["cap_feat_dim"])
    x = jnp.zeros((1, 4, 8, 8))
    cap = jnp.zeros((1, 8, TINY["cap_feat_dim"]))
    ref_tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), cap,
                           jnp.ones((1, 8), jnp.int32)))["params"]
    got_shapes = jax.tree.map(np.shape, params)
    want_shapes = jax.tree.map(lambda a: tuple(a.shape), ref_tree)
    assert got_shapes == want_shapes

    # forward runs with the imported tree
    out = model.apply({"params": params}, x, jnp.zeros((1,)), cap,
                      jnp.ones((1, 8), jnp.int32))
    assert out.shape == (1, 4, 8, 8) and bool(jnp.all(jnp.isfinite(out)))

    back = export_next_dit_weights(params)
    assert set(back) == set(shapes)
    for k in shapes:
        assert tuple(back[k].shape) == shapes[k], k
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6)


@pytest.mark.slow
def test_bf16_safetensors_release_precision(tmp_path):
    """A bf16 .safetensors (release precision) loads end-to-end: either via
    ml_dtypes' numpy bfloat16 (this image) or the torch-reader fallback in
    `load_torch_state_dict` (plain-numpy environments)."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    from lumina_t2x_tpu.models.next_dit import NextDiT

    shapes = next_dit_reference_state_shapes(**TINY)
    sd32 = synthetic_state_dict(shapes, seed=1)
    path = str(tmp_path / "consolidated_ema.00-of-01.safetensors")
    save_file({k: torch.from_numpy(v).to(torch.bfloat16) for k, v in sd32.items()}, path)

    loaded = load_torch_state_dict(path)
    assert set(loaded) == set(shapes)
    for k in shapes:
        assert loaded[k].dtype in (np.float32, jnp.bfloat16.dtype), loaded[k].dtype
        assert tuple(loaded[k].shape) == shapes[k]
    # values survive the bf16 round-trip to bf16 resolution
    np.testing.assert_allclose(np.asarray(loaded["pad_token"], np.float32),
                               sd32["pad_token"], atol=2e-4, rtol=1e-2)
    params = import_next_dit_weights(loaded, n_layers=TINY["n_layers"])
    model = NextDiT(patch_size=2, in_channels=4, dim=TINY["dim"],
                    n_layers=TINY["n_layers"], n_heads=TINY["n_heads"],
                    multiple_of=TINY["multiple_of"], qk_norm=True,
                    cap_feat_dim=TINY["cap_feat_dim"])
    out = model.apply({"params": params}, jnp.zeros((1, 4, 8, 8)),
                      jnp.zeros((1,)), jnp.zeros((1, 8, TINY["cap_feat_dim"])),
                      jnp.ones((1, 8), jnp.int32))
    assert out.shape == (1, 4, 8, 8) and bool(jnp.all(jnp.isfinite(out)))
